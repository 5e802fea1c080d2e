#!/usr/bin/env python
"""Runnable example: event analytics — the funnel family end to end.

    python examples/event_analytics.py [sf_dir]

events → first-occurrence funnel (view → click → purchase) →
conversion latency via the temporal pattern join ("view followed by
purchase within 2h", EVERY view paired with its first qualifying
purchase — what the funnel can't express) → gap sessionization →
Markov next-event transitions → the Structured Streaming twin of the
pattern join, asserted equal to the batch result on the same events.

All through the Engine facade (engine.Events) so the surface is
discoverable from one import; each method delegates to its operator
module, where the scale notes live.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F

from etl_demos_spark.data import load_table
from etl_demos_spark.engine import Engine
from etl_demos_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("event-analytics")
    spark.sparkContext.setLogLevel("ERROR")

    eng = Engine(spark)
    ev = eng.events(load_table(spark, sf_dir, "events"))

    # 1. first-occurrence funnel: how many users reach each stage in order
    funnel = ev.funnel("view", "click", "purchase").collect()
    stages = {r["step"]: r["n_users"] for r in funnel}
    print("funnel:", stages)
    assert stages["view"] >= stages["click"] >= stages["purchase"]

    # 2. conversion latency: EVERY view paired with its first purchase
    #    within 2h (one row per matched view, not per user)
    resp = ev.first_response("view", "purchase", within="2 hours")
    lat = resp.select(
        F.avg(
            (F.unix_micros(F.col("b_ts").cast("timestamp"))
             - F.unix_micros(F.col("a_ts").cast("timestamp"))) / 1e6
        ).alias("avg_latency_s"),
        F.count(F.lit(1)).alias("n_pairs"),
    ).collect()[0]
    print(f"view→purchase pairs: {lat['n_pairs']}, "
          f"avg latency {lat['avg_latency_s']:.1f}s")
    assert lat["n_pairs"] > 0

    # 3. sessionization: gap-based sessions per user
    sess = ev.sessionize(gap="30 minutes")
    n_sessions = sess.select("user_id", "session_seq").distinct().count()
    print("sessions:", n_sessions)

    # 4. next-event transition matrix (first-order Markov)
    trans = ev.transitions().orderBy(F.desc("c_trans")).limit(3).collect()
    for r in trans:
        print(f"transition {r['cur']}→{r['nxt']}: "
              f"n={r['c_trans']} p={r['p_trans']}")

    # 5. streaming twin of (2): same events as an ordered file stream,
    #    asserted equal to the batch join (the operator's contract)
    batch_pairs = {
        (r["user_id"], r["a_ts"], r["b_ts"]) for r in resp.collect()
    }
    with tempfile.TemporaryDirectory() as tmp:
        src = f"{tmp}/src"
        ordered = ev.df.select("user_id", "event_type", "ts").orderBy("ts")
        ordered.coalesce(1).write.parquet(src)
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .parquet(src)
        )
        out = ev.first_response_stream(
            stream, "view", "purchase", within="2 hours"
        )
        q = (
            out.writeStream.format("memory")
            .queryName("ex_resp_stream")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        # drain, don't awaitTermination: availableNow + the stateful
        # operator's ProcessingTimeTimeout keeps scheduling timeout-check
        # batches, so the query may never self-terminate; completeness
        # is a finished 0-input batch (see drain_available_now)
        from etl_demos_spark.streaming.stateful import drain_available_now

        if not drain_available_now(q, 180):
            q.stop()
            raise TimeoutError(
                "stream did not drain in 180s — partial output, batch "
                "comparison would be meaningless"
            )
        q.stop()
        stream_pairs = {
            (r["user_id"], r["a_ts"], r["b_ts"])
            for r in spark.sql("SELECT * FROM ex_resp_stream").collect()
        }
    assert stream_pairs == batch_pairs, "stream and batch twins disagree"
    print(f"streaming twin matches batch: {len(stream_pairs)} pairs")
    return 0


if __name__ == "__main__":
    sys.exit(main())
