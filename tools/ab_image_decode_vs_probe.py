#!/usr/bin/env python
"""Decode-vs-probe cost split for the perceptual image family
(VERDICT r10 rec 4).

The claim to measure: at scale the family's bottleneck is the
pure-Python pixel decode inside mapInPandas, NOT the banded signature
join — so a persisted signature store (decode once → 16 bytes/image)
turns every re-run into a probe that skips the dominant cost.

Measures, at sf0.1 and the tools/make_sf1.py 10x replication:
  decode_wall  — write_image_signature_store (one decode pass -> parquet)
  probe_wall   — pairs_from_signature_store (banded join only, no decode)
  e2e_wall     — image_near_dup_pairs (decode + join every run: the
                 path a store-less re-run pays)
Pin: probe output == e2e output (exact set equality via two-sided
subtract), so the split changes nothing about results.

Usage: python tools/ab_image_decode_vs_probe.py
       # → perf/ab_image_decode_vs_probe_r11.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _min3(fn) -> float:
    fn()  # warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return round(min(times), 3)


def main() -> None:
    from pyspark.sql import SparkSession

    import etl_demos_spark.workload  # noqa: F401
    import etl_demos_spark.workload_ext as ext
    from etl_demos_spark.operators import image_dedup as idp
    from etl_demos_spark.session import configure_runtime

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("ab-image-decode-vs-probe")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "32g")
        .getOrCreate()
    )
    configure_runtime(spark)

    out: dict = {
        "round": 11,
        "what": (
            "decode-vs-probe wall split for perceptual image dedup "
            "(warm min-of-3, noop sink, local[32]). decode_wall = one "
            "signature-store build (decode pass + parquet write); "
            "probe_wall = banded pair join from the store (no decode); "
            "e2e_wall = decode+join every run. Store path output "
            "pinned identical to the decode path (two-sided subtract)."
        ),
        "results": {},
    }
    for sf_name, sf_dir in (("sf0.1", "/root/testdata/sf0.1"), ("sf1", "/tmp/sf1")):
        if not os.path.isdir(sf_dir):
            out["results"][sf_name] = {"skipped": f"{sf_dir} missing"}
            continue
        corpus = ext._planted_image_corpus(spark, sf_dir)
        store = f"/tmp/imgsig_{sf_name}"

        decode_wall = _min3(
            lambda: idp.write_image_signature_store(corpus, store)
        )
        probe_wall = _min3(
            lambda: idp.pairs_from_signature_store(spark, store, "dhash", 4)
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        e2e_wall = _min3(
            lambda: idp.image_near_dup_pairs(corpus, "dhash", 4)
            .write.format("noop")
            .mode("overwrite")
            .save()
        )

        probe = idp.pairs_from_signature_store(spark, store, "dhash", 4)
        e2e = idp.image_near_dup_pairs(corpus, "dhash", 4)
        pinned = (
            probe.subtract(e2e).count() == 0
            and e2e.subtract(probe).count() == 0
        )
        out["results"][sf_name] = {
            "n_images": corpus.count(),
            "decode_wall_min3": decode_wall,
            "probe_wall_min3": probe_wall,
            "e2e_wall_min3": e2e_wall,
            "decode_share_of_e2e": round(
                max(e2e_wall - probe_wall, 0.0) / e2e_wall, 3
            ),
            "rerun_speedup_store_vs_e2e": round(e2e_wall / probe_wall, 2),
            "output_pinned_identical": pinned,
        }

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "perf",
        "ab_image_decode_vs_probe_r11.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
