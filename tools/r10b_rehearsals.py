"""Round-10 second-tranche scale rehearsals: replication-invariance
pins for the five wave-12 statistics, merged into
tools/scale_stats.json like every prior round. Replication invariance
is the strongest correctness-at-scale check available for a
distribution statistic: build a corpus exactly k x the base with known
structure and assert the statistic's EXACT contractual response —
counts scale by k, distribution shapes don't move at all.

1. ``sweepline_x10`` — x10 orders/lineitem (disjoint order keys, same
   dates): every month's peak open count multiplies EXACTLY 10x while
   the change-day count is invariant (the same boundary days carry
   10x the delta mass). The running sum stays boundary-bucketed.
2. ``pareto_x10`` — x10 customers (disjoint keys, same revenues): the
   decile revenue SHARES and cumulative Lorenz curve are invariant
   (each decile holds 10x the customers of the same revenue profile).
   The base is trimmed to a multiple-of-10 customer count first —
   NTILE's remainder rule makes the per-decile counts non-comparable
   otherwise (see the inline note; the sf0.1 first run caught it).
3. ``transitions_x10`` — x10 users (disjoint ids, same sequences):
   transition counts scale 10x, row probabilities invariant.
4. ``anomaly_x10`` — x10 users on the SAME days: daily counts scale
   10x, so dev and sqrt(n*m2) both scale 10x and every z-score — and
   the integer membership decision — is invariant. The flagged set
   must be IDENTICAL.
5. ``vocab_overlap_x10`` — x10 documents (same sources): the distinct
   vocabulary per source is unchanged, so the ENTIRE pair report is
   row-for-row identical.

Usage: python tools/r10b_rehearsals.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from thundercats_spark.queries import load  # noqa: E402
from thundercats_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STATS = os.path.join(REPO, "tools", "scale_stats.json")
TMP = "/tmp/r10b_replicas"


def _replicate(df, times: int, offset_cols: dict):
    """k-fold union with disjoint keys: each ``offset_cols`` column is
    shifted by i * span per replica (span = max + 1 of the base)."""
    spans = {
        c: df.agg(F.max(c)).first()[0] + 1 for c in offset_cols
    }
    reps = None
    for i in range(times):
        r = df
        for c in offset_cols:
            r = r.withColumn(c, F.col(c) + F.lit(i * spans[c]))
        reps = r if reps is None else reps.unionByName(r)
    return reps


def _write(df, name: str, table: str) -> str:
    d = os.path.join(TMP, name)
    df.write.mode("overwrite").parquet(f"{d}/{table}.parquet")
    return d


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("r10b-rehearsals")
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(TMP, ignore_errors=True)
    out: dict = {}

    from thundercats_spark.queries.analytics9 import (
        customer_revenue_pareto,
        doc_source_vocab_overlap,
        events_daily_anomaly,
        events_type_transitions,
        orders_backlog_sweepline,
    )

    t = load(spark, sf_dir, "orders", "lineitem", "events", "documents")

    # ---- 1. sweep line: peaks x10, change days invariant
    base = {r["month"]: (r["peak_open_orders"], r["n_change_days"])
            for r in orders_backlog_sweepline(spark, sf_dir).collect()}
    ox = _replicate(t["orders"], 10, {"o_orderkey": 1})
    lx = _replicate(t["lineitem"], 10, {"l_orderkey": 1})
    d = os.path.join(TMP, "sweep")
    ox.write.mode("overwrite").parquet(f"{d}/orders.parquet")
    lx.write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
    t0 = time.time()
    big = {r["month"]: (r["peak_open_orders"], r["n_change_days"])
           for r in orders_backlog_sweepline(spark, d).collect()}
    secs = round(time.time() - t0, 2)
    assert set(base) == set(big)
    for mo, (pk, ncd) in base.items():
        assert big[mo] == (10 * pk, ncd), (mo, base[mo], big[mo])
    out["sweepline_x10"] = {
        "months": len(base), "x10_secs": secs,
        "note": ("peak open orders EXACTLY 10x per month, change-day "
                 "count invariant — delta mass scales, boundary set "
                 "doesn't; running sum stays boundary-bucketed"),
    }

    # ---- 2. pareto: shares/Lorenz invariant, counts x10
    # The invariance is EXACT only when the base customer count C is a
    # multiple of 10: otherwise NTILE's remainder rule sizes the base
    # deciles unevenly while the 10x corpus (10C % 10 == 0) is even,
    # and boundary customers migrate between deciles. Trim the base to
    # the smallest 10*floor(C/10) custkeys first; within-tie boundary
    # exchanges in the big corpus then swap only equal-revenue
    # customers, leaving every decile's revenue identical. (sf0.01
    # passes untrimmed by luck — its C is divisible by 10; sf0.1's is
    # not, which this rehearsal's first run caught.)
    ckeys = sorted(
        r[0] for r in t["orders"].select("o_custkey").distinct().collect()
    )
    cut = ckeys[len(ckeys) // 10 * 10 - 1]
    base_orders = t["orders"].where(F.col("o_custkey") <= cut)
    bd = _write(base_orders, "pareto_base", "orders")
    base = {r["decile"]: r for r in
            customer_revenue_pareto(spark, bd).collect()}
    px = _replicate(base_orders, 10, {"o_orderkey": 1, "o_custkey": 1})
    d = _write(px, "pareto", "orders")
    t0 = time.time()
    big = {r["decile"]: r for r in
           customer_revenue_pareto(spark, d).collect()}
    secs = round(time.time() - t0, 2)
    assert set(base) == set(big)
    for dec, b in base.items():
        g = big[dec]
        assert g["n_customers"] == 10 * b["n_customers"]
        assert abs(g["revenue"] - 10 * b["revenue"]) < 1e-6 * b["revenue"]
        assert abs(g["revenue_share"] - b["revenue_share"]) < 1e-12
        assert abs(g["cum_share"] - b["cum_share"]) < 1e-12
    out["pareto_x10"] = {
        "x10_secs": secs,
        "note": ("decile shares and the Lorenz curve INVARIANT under "
                 "10x customer replication (distribution is "
                 "scale-free); counts and revenue exactly 10x. Base "
                 "trimmed to a multiple-of-10 customer count first: "
                 "NTILE's remainder rule makes per-decile counts "
                 "non-comparable otherwise (the sf0.1 first run "
                 "caught this)"),
    }

    # ---- 3. transitions: counts x10, probabilities invariant
    base = {(r["from_type"], r["to_type"]): (r["n"], r["p"]) for r in
            events_type_transitions(spark, sf_dir).collect()}
    ex = _replicate(t["events"], 10, {"user_id": 1, "event_id": 1})
    d = _write(ex, "events", "events")
    t0 = time.time()
    big = {(r["from_type"], r["to_type"]): (r["n"], r["p"]) for r in
           events_type_transitions(spark, d).collect()}
    tr_secs = round(time.time() - t0, 2)
    assert set(base) == set(big)
    for k, (n, p) in base.items():
        assert big[k][0] == 10 * n and abs(big[k][1] - p) < 1e-12
    out["transitions_x10"] = {
        "pairs": len(base), "x10_secs": tr_secs,
        "note": ("transition matrix probabilities INVARIANT under 10x "
                 "user replication; counts exactly 10x"),
    }

    # ---- 4. anomaly: flagged set identical, z invariant
    base = {(r["event_type"], r["day"]): r["z"] for r in
            events_daily_anomaly(spark, sf_dir).collect()}
    t0 = time.time()
    big = {(r["event_type"], r["day"]): r["z"] for r in
           events_daily_anomaly(spark, d).collect()}
    an_secs = round(time.time() - t0, 2)
    assert set(base) == set(big), "flagged set moved under replication"
    for k, z in base.items():
        assert abs(big[k] - z) < 1e-6, (k, z, big[k])
    out["anomaly_x10"] = {
        "flagged": len(base), "x10_secs": an_secs,
        "note": ("z-scores and the integer |z|>=2 membership are "
                 "INVARIANT under 10x same-day replication (dev and "
                 "sqrt(n*m2) both scale 10x)"),
    }

    # ---- 5. vocab overlap: report row-for-row identical
    base = {(r["src_a"], r["src_b"]): (r["vocab_a"], r["vocab_b"],
                                       r["common"], r["jaccard"])
            for r in doc_source_vocab_overlap(spark, sf_dir).collect()}
    dx = _replicate(t["documents"], 10, {"doc_id": 1})
    d = _write(dx, "docs", "documents")
    t0 = time.time()
    big = {(r["src_a"], r["src_b"]): (r["vocab_a"], r["vocab_b"],
                                      r["common"], r["jaccard"])
           for r in doc_source_vocab_overlap(spark, d).collect()}
    vo_secs = round(time.time() - t0, 2)
    assert base == big, "vocab overlap changed under doc replication"
    out["vocab_overlap_x10"] = {
        "pairs": len(base), "x10_secs": vo_secs,
        "note": ("pair report IDENTICAL under 10x document "
                 "replication — distinct vocabulary per source is "
                 "unchanged; only the pre-distinct explode pays the "
                 "10x"),
    }

    data = {}
    if os.path.exists(STATS):
        with open(STATS) as f:
            data = json.load(f)
    data.update(out)
    with open(STATS, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)
    print(json.dumps(out))
    shutil.rmtree(TMP, ignore_errors=True)


if __name__ == "__main__":
    main()
