"""Example app — LIVE conversion attribution on an event stream, and
the barrier-flush pattern that makes a finite replay agree with batch
EXACTLY.

The full-fidelity attributed sessionizer
(streaming/windows.py sessionize_stream_attributed) emits each closed
session with its first-touch event type and conversion flag; a
downstream aggregation reproduces the events_session_attribution
registry query on a live stream. Two lessons for a 100 TB/day user:

  1. Sessions close on the EVENT-TIME watermark, so a finite replay
     (backfill, availableNow) leaves every user's LAST session open —
     the watermark never advances past it. The fix is the BARRIER
     row: one synthetic far-future event appended after the real data
     advances the global watermark and flushes every open session.
     Exclude the barrier user from the report. With the barrier, the
     streaming report equals the batch query EXACTLY — asserted here.

  2. State stays bounded regardless of history: one open-session
     tuple per LIVE user (closed sessions leave state immediately),
     which is what lets the same query run unchanged on an unbounded
     production stream.

Run: python examples/streaming_attribution.py [sf_dir]
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from thundercats_spark.queries import load
from thundercats_spark.queries.analytics11 import events_session_attribution
from thundercats_spark.session import get_spark
from thundercats_spark.streaming.windows import (
    run_available_now_to_memory,
    sessionize_stream_attributed,
)

BARRIER_USER = -1


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("streaming-attribution")
    spark.sparkContext.setLogLevel("ERROR")

    # ---- stage the stream source: real events + one barrier file
    ev = load(spark, sf_dir, "events")["events"].select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    stage = tempfile.mkdtemp(prefix="attr_stream_")
    src = os.path.join(stage, "events")
    os.makedirs(src)
    ev.write.mode("overwrite").parquet(os.path.join(stage, "base"))
    for k, f in enumerate(
        sorted(glob.glob(os.path.join(stage, "base", "part-*.parquet")))
    ):
        dst = os.path.join(src, f"data{k:04d}.parquet")
        shutil.copy(f, dst)
        os.utime(dst, (1_700_000_000 + k, 1_700_000_000 + k))
    max_ts = ev.agg(F.max("ts")).first()[0]
    barrier = spark.createDataFrame(
        [(10**12, max_ts, BARRIER_USER, "barrier", 0.0)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    ).withColumn("ts", F.col("ts") + F.expr("INTERVAL 365 DAYS"))
    barrier.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(stage, "bar")
    )
    bf = glob.glob(os.path.join(stage, "bar", "part-*.parquet"))[0]
    dst = os.path.join(src, "zzzz-barrier.parquet")
    shutil.copy(bf, dst)
    os.utime(dst, (1_800_000_000, 1_800_000_000))  # delivered last

    # ---- the streaming pipeline
    stream = spark.readStream.schema(ev.schema).option(
        "maxFilesPerTrigger", 4
    ).parquet(src)
    # staged parquet may surface TIMESTAMP_NTZ, which watermarks
    # reject; session tz is pinned UTC so the LTZ cast is the fixed
    # naive==UTC mapping (the _events_stream precedent)
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    sessions = sessionize_stream_attributed(
        stream, gap_ms=30 * 60 * 1000, watermark="1 hour",
        convert_type="purchase",
    )
    closed = run_available_now_to_memory(sessions, "append")
    report = (
        closed.where(F.col("user_id") != BARRIER_USER)
        .groupBy("first_touch")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum("converted").cast("long").alias("n_converted"),
        )
        .select(
            "first_touch", "n_sessions", "n_converted",
            (F.col("n_converted").cast("double") / F.col("n_sessions"))
            .alias("conversion_rate"),
        )
        .orderBy("first_touch")
    )
    stream_rows = [tuple(r) for r in report.collect()]
    print("streaming first-touch attribution (barrier-flushed):")
    for r in stream_rows:
        print(f"  {r[0]:10s} sessions={r[1]:6d} converted={r[2]:6d} "
              f"rate={r[3]:.4f}")

    # ---- the batch registry query over the same events: must agree
    batch_rows = [
        tuple(r)
        for r in events_session_attribution(spark, sf_dir).collect()
    ]
    assert stream_rows == batch_rows, (
        f"stream != batch\n{stream_rows}\n{batch_rows}"
    )
    print("== batch registry query agrees exactly "
          f"({len(batch_rows)} first-touch types)")

    n_open_without_barrier = (
        closed.where(F.col("user_id") != BARRIER_USER).count()
    )
    print(f"closed sessions: {n_open_without_barrier} — every user's "
          "final session included ONLY because the barrier advanced "
          "the watermark; drop the barrier and each live user holds "
          "one open session in state (bounded, eventually flushed)")
    shutil.rmtree(stage, ignore_errors=True)


if __name__ == "__main__":
    main()
