"""Shared harness for the SIG_IMPL A/B tools (ab_minhash_sig.py /
ab_simhash_sig.py): identical-output gate, warm-up, interleaved timed
sweeps, knob restore, JSON assembly — one copy, so a methodology fix
lands in both adjudications."""

from __future__ import annotations

import json
import statistics
import time


def run_sig_ab(
    spark, stages, collect_keys, sweeps: int, extra: dict,
    impls: tuple[str, str] = ("codegen", "arrow"),
) -> str:
    """A/B two `dedup.SIG_IMPL` values (default codegen vs arrow) over
    ``stages`` ({name: () -> DataFrame}). ``collect_keys`` maps each
    stage name to a row->hashable projection used for the
    identical-output gate. Returns the result JSON line; always
    restores the module default."""
    from etl_demos_spark.operators import dedup
    default = dedup.SIG_IMPL
    try:
        outs = {}
        for impl in impls:
            dedup.SIG_IMPL = impl
            outs[impl] = {
                sname: sorted(collect_keys[sname](r) for r in fn().collect())
                for sname, fn in stages.items()
            }
        assert outs[impls[0]] == outs[impls[1]], "variants disagree — A/B void"

        runs: dict[str, list[float]] = {}
        for impl in impls:  # warm-up
            dedup.SIG_IMPL = impl
            for fn in stages.values():
                fn().write.format("noop").mode("overwrite").save()
        for _ in range(sweeps):
            for impl in impls:
                dedup.SIG_IMPL = impl
                for sname, fn in stages.items():
                    spark.catalog.clearCache()
                    t0 = time.perf_counter()
                    fn().write.format("noop").mode("overwrite").save()
                    runs.setdefault(f"{sname}:{impl}", []).append(
                        time.perf_counter() - t0
                    )
    finally:
        dedup.SIG_IMPL = default

    return json.dumps(
        {
            "sweeps": sweeps,
            **extra,
            "identical_output": True,
            "min": {k: round(min(v), 3) for k, v in runs.items()},
            "median": {
                k: round(statistics.median(v), 3) for k, v in runs.items()
            },
            "all": {k: [round(x, 3) for x in v] for k, v in runs.items()},
        }
    )
