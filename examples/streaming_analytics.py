"""Example app — STREAMING + BATCH product analytics over the events
table, composing the wave-9 surfaces. The lesson a 100 TB user needs:
the stateful streaming operators produce EXACTLY the batch answers
(not approximations), so a pipeline can serve the same metric from a
live stream and a nightly batch job and reconcile them row-for-row —
and the reconciliation below does exactly that, in-process:

  1. Daily engagement from the STREAM: windowed_agg (state-store
     aggregation) over an availableNow file source — then proven
     equal, in total AND per cell, to the batch groupBy twin.
  2. View→click attribution from the STREAM: the dual-watermark
     stream-stream interval join — every emitted pair verified
     in-window, and the pair count reconciled against the batch
     self-join.
  3. Trailing-7-day active users from the BATCH side: the exact
     sliding COUNT(DISTINCT) both engines lack natively
     (sliding_distinct_users, bounded contribution intervals), with
     the WAU >= DAU invariant checked per (type, day) — plus the
     window_days lever shown at 14 days.

Run: python examples/streaming_analytics.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from thundercats_spark.queries import load
from thundercats_spark.queries.analytics6 import (
    batch_view_click_pairs,
    events_stream_stream_join,
    events_stream_window_agg,
    sliding_distinct_users,
)
from thundercats_spark.session import get_spark


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("streaming-analytics")
    spark.sparkContext.setLogLevel("ERROR")
    ev = load(spark, sf_dir, "events")["events"]

    # -- 1. streaming daily engagement == batch daily engagement -------
    # the REGISTERED query (oracle-checked every round), not a copy of
    # its body — the reconciliation below demonstrates that exact query
    live = events_stream_window_agg(spark, sf_dir)
    batch = (
        ev.groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("double")
            .alias("total_value"),
        )
    )
    live_rows = {(r.day, r.event_type): (r.n_events, r.total_value)
                 for r in live.collect()}
    batch_rows = {(r.day, r.event_type): (r.n_events, r.total_value)
                  for r in batch.collect()}
    assert live_rows == batch_rows, "stream/batch daily engagement diverged"
    n_total = sum(v[0] for v in live_rows.values())
    assert n_total == ev.count(), "stream agg lost or duplicated events"
    print(f"1. stream==batch daily engagement: {len(live_rows)} cells, "
          f"{n_total} events reconciled exactly")

    # -- 2. streaming attribution pairs, verified + reconciled ---------
    pairs = events_stream_stream_join(spark, sf_dir)
    pr = pairs.collect()
    assert all(0 <= r.secs_to_click <= 3600 for r in pr), "pair out of window"
    n_batch_pairs = batch_view_click_pairs(ev).count()
    assert len(pr) == n_batch_pairs, (len(pr), n_batch_pairs)
    print(f"2. stream-stream attribution: {len(pr)} pairs, all in-window, "
          f"count == batch self-join")

    # -- 3. exact WAU (and the window_days lever) vs DAU ---------------
    wau = {
        (r.event_type, r.day): r.users_7d
        for r in sliding_distinct_users(ev).collect()
    }
    dau = {
        (r.event_type, r.day): r.users_7d
        for r in sliding_distinct_users(ev, window_days=1).collect()
    }
    biwk = {
        (r.event_type, r.day): r.users_7d
        for r in sliding_distinct_users(ev, window_days=14).collect()
    }
    assert set(wau) == set(dau) == set(biwk)  # same per-type day spine
    assert all(dau[k] <= wau[k] <= biwk[k] for k in wau), (
        "distinct-user counts must be monotone in the window length"
    )
    peak = max(wau.items(), key=lambda kv: (kv[1], kv[0]))
    print(f"3. WAU exact on {len(wau)} (type, day) cells, "
          f"DAU<=WAU<=14d everywhere; peak {peak[0]}: {peak[1]} users")

    spark.stop()
    print("streaming_analytics: OK")


if __name__ == "__main__":
    main()
