#!/usr/bin/env python
"""10x scale receipt for the r10 multimodal decode/incremental queries
(q_dedup_image_incremental, q_audio_features, q_video_meta) — the
companion to scale_image_dedup.py, same protocol: warm min-of-3, noop
sink, local[32], sf0.1 vs the tools/make_sf1.py replication.

All three are decode-pass-shaped (mapInPandas over per-doc payloads;
the incremental adds banded store probes), so the expectation is the
family norm: ~3-4x wall for 10x data as scheduling floors amortize,
with nothing driver-side.

Usage: python tools/scale_multimodal.py  # → perf/scale_multimodal_r10.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import SparkSession

    import etl_demos_spark.workload as w
    import etl_demos_spark.workload_ext  # noqa: F401
    from etl_demos_spark.session import configure_runtime

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("scale-multimodal")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "32g")
        .getOrCreate()
    )
    configure_runtime(spark)

    out: dict = {
        "round": 10,
        "what": (
            "10x scale receipt for the r10 multimodal decode/incremental "
            "queries (warm min-of-3, noop sink, local[32]; /tmp/sf1 = "
            "make_sf1 replication). All decode-pass-shaped; the "
            "incremental adds banded signature-store probes."
        ),
        "results": {},
    }
    for name in ("q_dedup_image_incremental", "q_audio_features", "q_video_meta"):
        fn = w.REGISTRY[name].fn
        res = {}
        for sf_name, sf_dir in (("sf0.1", "/root/testdata/sf0.1"), ("sf1", "/tmp/sf1")):
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
            times = []
            for _ in range(3):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                times.append(time.perf_counter() - t0)
            res[sf_name] = {
                "wall_min3": round(min(times), 3),
                "rows": fn(spark, sf_dir).count(),
            }
        res["time_ratio_10x"] = round(
            res["sf1"]["wall_min3"] / res["sf0.1"]["wall_min3"], 2
        )
        out["results"][name] = res

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "perf",
        "scale_multimodal_r10.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
