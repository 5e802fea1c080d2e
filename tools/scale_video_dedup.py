#!/usr/bin/env python
"""10x scale receipt for the video dedup family (r11 registrations,
VERDICT r10 rec 6).

Runs q_dedup_video_dhash / q_dedup_video_exact at sf0.1 (5k docs → 10k
videos incl. mutants, 2-4 frames each) and at the tools/make_sf1.py 10x
replication (/tmp/sf1 — text verbatim under fresh ids, so every video
gains 9 exact-container clones: perceptual pair output grows
clique-quadratically while the frame-aligned banded join stays keyed;
exact pairs grow the same way through the fingerprint equi-join).
Warm min-of-3, noop sink, local[32].

Usage: python tools/scale_video_dedup.py  # → perf/scale_video_dedup_r11.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import SparkSession

    import etl_demos_spark.workload  # noqa: F401
    import etl_demos_spark.workload_ext as ext
    from etl_demos_spark.session import configure_runtime

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("scale-video-dedup")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "32g")
        .getOrCreate()
    )
    configure_runtime(spark)

    out: dict = {
        "round": 11,
        "what": (
            "10x scale receipt for q_dedup_video_dhash/q_dedup_video_exact "
            "(warm min-of-3, noop sink, local[32]; /tmp/sf1 = make_sf1 "
            "replication: text verbatim -> every video gains 9 exact "
            "clones, so pair output grows clique-quadratically by "
            "construction while the frame-aligned banded join / "
            "fingerprint equi-join stays keyed)."
        ),
        "results": {},
    }
    queries = {
        "q_dedup_video_dhash": ext.q_dedup_video_dhash,
        "q_dedup_video_exact": ext.q_dedup_video_exact,
    }
    for name, q in queries.items():
        res = {}
        for sf_name, sf_dir in (("sf0.1", "/root/testdata/sf0.1"), ("sf1", "/tmp/sf1")):
            if not os.path.isdir(sf_dir):
                res[sf_name] = {"skipped": f"{sf_dir} missing"}
                continue
            q(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
            times = []
            for _ in range(3):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                q(spark, sf_dir).write.format("noop").mode("overwrite").save()
                times.append(time.perf_counter() - t0)
            res[sf_name] = {
                "wall_min3": round(min(times), 3),
                "rows": q(spark, sf_dir).count(),
            }
        if "wall_min3" in res.get("sf1", {}):
            res["time_ratio_10x"] = round(
                res["sf1"]["wall_min3"] / res["sf0.1"]["wall_min3"], 2
            )
        out["results"][name] = res

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "perf",
        "scale_video_dedup_r11.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
