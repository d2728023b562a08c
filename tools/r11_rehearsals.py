"""Round-11 scale rehearsals: replication-invariance pins for the
wave-14 statistics, merged into tools/scale_stats.json like every
prior round. Each pin replicates the base corpus k-fold with KNOWN
structure and asserts the statistic's exact contractual response.

1. ``r11_gini_x10`` — x10 customers (disjoint keys, same order-count
   profile): Gini is EXACTLY replication-invariant in real arithmetic
   — with the n² pair-count formulation, MD = Σ|xi−xj|/n² is
   unchanged when every value appears k times (each pair difference
   appears k² times over (kn)² pairs). Asserted to 1e-12 (the two
   engines' edge divisions see different integers).
2. ``r11_zipf_x10`` — x10 documents (same text): every frequency
   x10 shifts ln f by exactly ln 10 — slope and r² invariant,
   intercept +ln 10 (to the ROUND(6) contract).
3. ``r11_diversity_x10`` — x10 documents: entropy is EXACTLY
   invariant (H(10k) = ln(10N) − Σ10k·ln(10k)/10N = H(k) — the
   identity telescopes), TTR divides by exactly 10, vocab unchanged.
4. ``r11_dim_stats_x10`` — x10 embeddings (disjoint vec_ids): per-dim
   mean and population variance invariant (same multiset, k times).
5. ``r11_vocab_growth_append`` — append a SECOND corpus of entirely
   new words at higher doc_ids: every pre-existing bucket row is
   IDENTICAL (the curve is append-only — history never recomputes),
   new buckets' new_types equals their vocabulary.
6. ``r11_winsorized_x10`` — x10 events (disjoint ids, same values):
   disc percentiles are quantile-invariant under multiset
   replication, so the whole report is row-identical.
7. ``r11_ship_lag_x10`` — x10 orders+lineitem (disjoint orderkeys):
   n_items x10, avg/p50/p90 lag invariant.
8. ``r11_attribution_x10`` — x10 users (disjoint ids, same event
   sequences): sessions and conversions x10, rates bit-identical
   (10a/10b and a/b round to the same double).
9. ``r11_lateral_topk_orders_x10`` — x10 orders per customer: every
   revenue exactly x10, ranking and names unchanged.

Usage: python tools/r11_rehearsals.py [sf_dir]
"""

from __future__ import annotations

import json
import math
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
TMP = "/tmp/r11_replicas"


def _replicate(df, times: int, offset_cols: dict):
    spans = {c: df.agg(F.max(c)).first()[0] + 1 for c in offset_cols}
    reps = None
    for i in range(times):
        r = df
        for c in offset_cols:
            r = r.withColumn(c, F.col(c) + F.lit(i * spans[c]))
        reps = r if reps is None else reps.unionByName(r)
    return reps


def _dir(name: str) -> str:
    return os.path.join(TMP, name)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("r11-rehearsals")
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(TMP, ignore_errors=True)
    out: dict = {}

    from thundercats_spark.queries.analytics11 import (
        customer_order_gini,
        doc_token_diversity_by_source,
        doc_vocab_growth,
        doc_zipf_slope,
        embedding_dim_stats,
        events_session_attribution,
        events_value_winsorized,
        nation_top_customers_lateral,
        orders_ship_lag_profile,
    )

    t = load(spark, sf_dir, "orders", "lineitem", "events",
             "documents", "embeddings", "customer", "nation")

    # ---- docs x10 (same text, disjoint doc_ids): zipf + diversity
    d = _dir("docs10")
    _replicate(t["documents"], 10, {"doc_id": 1}).write.mode(
        "overwrite").parquet(f"{d}/documents.parquet")
    zb = doc_zipf_slope(spark, sf_dir).collect()[0]
    t0 = time.time()
    zx = doc_zipf_slope(spark, d).collect()[0]
    z_secs = round(time.time() - t0, 2)
    assert zx.n_ranks == zb.n_ranks
    assert abs(zx.slope - zb.slope) <= 2e-6, (zb.slope, zx.slope)
    assert abs(zx.r2 - zb.r2) <= 2e-6
    assert abs((zx.intercept - zb.intercept) - math.log(10)) <= 2e-6
    out["r11_zipf_x10"] = {
        "slope": zb.slope, "x10_secs": z_secs,
        "note": ("slope and r2 invariant under 10x doc replication; "
                 "intercept shifts by exactly ln 10 (every frequency "
                 "x10, ranks unchanged)"),
    }

    db = {r.source: r for r in
          doc_token_diversity_by_source(spark, sf_dir).collect()}
    t0 = time.time()
    dx = {r.source: r for r in
          doc_token_diversity_by_source(spark, d).collect()}
    dv_secs = round(time.time() - t0, 2)
    assert set(db) == set(dx)
    for s, b in db.items():
        x = dx[s]
        assert x.n_tokens == 10 * b.n_tokens
        assert x.vocab == b.vocab
        assert x.entropy == b.entropy, (s, b.entropy, x.entropy)
        assert abs(x.ttr - b.ttr / 10) < 1e-15
    out["r11_diversity_x10"] = {
        "sources": len(db), "x10_secs": dv_secs,
        "note": ("entropy EXACTLY invariant (identity telescopes "
                 "under k-fold counts), vocab unchanged, TTR /10"),
    }

    # ---- vocab growth: append an all-new-word corpus → prefix frozen
    base_rows = [tuple(r) for r in
                 doc_vocab_growth(spark, sf_dir).collect()]
    max_id = t["documents"].agg(F.max("doc_id")).first()[0]
    start = ((max_id // 50) + 1) * 50  # next empty bucket boundary
    fresh = spark.createDataFrame(
        [(start + i, f"zz{i}a zz{i}b", "en", "synthetic", 10)
         for i in range(100)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = _dir("docs_append")
    t["documents"].unionByName(fresh).write.mode("overwrite").parquet(
        f"{d}/documents.parquet")
    app_rows = [tuple(r) for r in doc_vocab_growth(spark, d).collect()]
    assert app_rows[:len(base_rows)] == base_rows, \
        "history recomputed under append"
    tail = app_rows[len(base_rows):]
    assert sum(r[3] for r in tail) == 200  # 2 new types per new doc
    assert app_rows[-1][4] == base_rows[-1][4] + 200
    out["r11_vocab_growth_append"] = {
        "base_buckets": len(base_rows), "appended_docs": 100,
        "note": ("every pre-existing bucket row IDENTICAL after "
                 "appending an all-new-word corpus — the curve is "
                 "append-only; new types land only in new buckets"),
    }

    # ---- embeddings x10: per-dim stats invariant
    eb = [tuple(r) for r in embedding_dim_stats(spark, sf_dir).collect()]
    d = _dir("emb10")
    _replicate(t["embeddings"], 10, {"vec_id": 1}).write.mode(
        "overwrite").parquet(f"{d}/embeddings.parquet")
    t0 = time.time()
    ex = [tuple(r) for r in embedding_dim_stats(spark, d).collect()]
    e_secs = round(time.time() - t0, 2)
    assert len(eb) == len(ex)
    for b, x in zip(eb, ex):
        assert x[0] == b[0] and x[1] == 10 * b[1]
        assert abs(x[2] - b[2]) <= 2e-6 and abs(x[3] - b[3]) <= 2e-6
    out["r11_dim_stats_x10"] = {
        "dims": len(eb), "x10_secs": e_secs,
        "note": "per-dim mean/variance invariant under 10x replication",
    }

    # ---- customers x10: gini invariant (n² pair formulation)
    gb = {r.segment: r for r in
          customer_order_gini(spark, sf_dir).collect()}
    d = _dir("cust10")
    cx = _replicate(t["customer"], 10, {"c_custkey": 1})
    # orders follow their replicated customer: shift o_custkey by the
    # same span per replica, disjoint orderkeys
    cspan = t["customer"].agg(F.max("c_custkey")).first()[0] + 1
    ospan = t["orders"].agg(F.max("o_orderkey")).first()[0] + 1
    reps = None
    for i in range(10):
        r = (t["orders"]
             .withColumn("o_custkey", F.col("o_custkey") + F.lit(i * cspan))
             .withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * ospan)))
        reps = r if reps is None else reps.unionByName(r)
    cx.write.mode("overwrite").parquet(f"{d}/customer.parquet")
    reps.write.mode("overwrite").parquet(f"{d}/orders.parquet")
    t0 = time.time()
    gx = {r.segment: r for r in customer_order_gini(spark, d).collect()}
    g_secs = round(time.time() - t0, 2)
    assert set(gb) == set(gx)
    for s, b in gb.items():
        x = gx[s]
        assert x.n_customers == 10 * b.n_customers
        assert x.total_orders == 10 * b.total_orders
        assert abs(x.gini - b.gini) <= 1e-12, (s, b.gini, x.gini)
    out["r11_gini_x10"] = {
        "segments": len(gb), "x10_secs": g_secs,
        "note": ("Gini exactly replication-invariant (mean absolute "
                 "difference over n² pairs is unchanged when every "
                 "value appears k times)"),
    }

    # ---- lateral top-k: x10 orders per customer → revenue x10, same ranking
    lb = [(r.nation, r.customer, r.revenue, r.rnk) for r in
          nation_top_customers_lateral(spark, sf_dir).collect()]
    d = _dir("ord10")
    _replicate(t["orders"], 10, {"o_orderkey": 1}).write.mode(
        "overwrite").parquet(f"{d}/orders.parquet")
    t["customer"].write.mode("overwrite").parquet(f"{d}/customer.parquet")
    t["nation"].write.mode("overwrite").parquet(f"{d}/nation.parquet")
    lx = [(r.nation, r.customer, r.revenue, r.rnk) for r in
          nation_top_customers_lateral(spark, d).collect()]
    assert [(n, c, k) for n, c, _, k in lb] == \
           [(n, c, k) for n, c, _, k in lx]
    for (_, _, rb, _), (_, _, rx, _) in zip(lb, lx):
        # the DECIMAL sum is exactly 10x; the double SURFACE may
        # differ from 10*double(base) by an ulp (two different exact
        # decimals, each correctly rounded)
        assert abs(rx - 10 * rb) <= 1e-9 * abs(rx), (rb, rx)
    out["r11_lateral_topk_orders_x10"] = {
        "rows": len(lb),
        "note": ("10x orders per customer scales every revenue "
                 "EXACTLY 10x (decimal sums); ranking and names "
                 "unchanged"),
    }

    # ---- ship lag x10: profile invariant, counts x10
    sb = {r.priority: tuple(r) for r in
          orders_ship_lag_profile(spark, sf_dir).collect()}
    lx10 = _replicate(t["lineitem"], 10, {"l_orderkey": 1})
    # reuse ord10's replicated orders (same orderkey span arithmetic)
    assert t["lineitem"].agg(F.max("l_orderkey")).first()[0] + 1 == ospan
    d2 = _dir("lag10")
    _replicate(t["orders"], 10, {"o_orderkey": 1}).write.mode(
        "overwrite").parquet(f"{d2}/orders.parquet")
    lx10.write.mode("overwrite").parquet(f"{d2}/lineitem.parquet")
    t0 = time.time()
    sx = {r.priority: tuple(r) for r in
          orders_ship_lag_profile(spark, d2).collect()}
    s_secs = round(time.time() - t0, 2)
    assert set(sb) == set(sx)
    for p, b in sb.items():
        x = sx[p]
        assert x[1] == 10 * b[1]            # n_items
        assert x[2] == b[2]                 # avg exact (10a/10b)
        assert x[3:] == b[3:]               # disc percentiles
    out["r11_ship_lag_x10"] = {
        "priorities": len(sb), "x10_secs": s_secs,
        "note": ("lag profile invariant under 10x replication; disc "
                 "percentiles are quantile-exact on the multiset"),
    }

    # ---- events x10 by user: attribution counts x10, rates identical
    ab = {r.first_touch: tuple(r) for r in
          events_session_attribution(spark, sf_dir).collect()}
    d = _dir("ev10")
    _replicate(t["events"], 10, {"user_id": 1, "event_id": 1}).write.mode(
        "overwrite").parquet(f"{d}/events.parquet")
    t0 = time.time()
    ax = {r.first_touch: tuple(r) for r in
          events_session_attribution(spark, d).collect()}
    a_secs = round(time.time() - t0, 2)
    assert set(ab) == set(ax)
    for ft, b in ab.items():
        x = ax[ft]
        assert x[1] == 10 * b[1] and x[2] == 10 * b[2]
        assert x[3] == b[3]  # 10a/10b rounds to the same double
    out["r11_attribution_x10"] = {
        "first_touch_types": len(ab), "x10_secs": a_secs,
        "note": ("sessions and conversions x10 under user "
                 "replication, conversion rates bit-identical"),
    }

    # ---- winsorized x10: whole report row-identical except n
    wb = {r.event_type: tuple(r) for r in
          events_value_winsorized(spark, sf_dir).collect()}
    wx = {r.event_type: tuple(r) for r in
          events_value_winsorized(spark, d).collect()}
    assert set(wb) == set(wx)
    for et, b in wb.items():
        x = wx[et]
        assert x[1] == 10 * b[1]
        assert (x[3], x[4]) == (b[3], b[4])  # disc boundaries exact
        # means: (10·S)/(10·n) is the same REAL value but the decimal
        # sum surfaces through a different double cast — ulp tolerance
        assert abs(x[2] - b[2]) <= 1e-12 * abs(b[2]), (et, b[2], x[2])
        assert abs(x[5] - b[5]) <= 1e-12 * abs(b[5]), (et, b[5], x[5])
    out["r11_winsorized_x10"] = {
        "types": len(wb),
        "note": ("disc clip boundaries and both means invariant "
                 "under 10x replication — quantiles are multiset "
                 "shape, not size"),
    }

    data = {}
    if os.path.exists(STATS):
        with open(STATS) as f:
            data = json.load(f)
    data.update(out)
    with open(STATS, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)
    print(json.dumps(out, indent=1))
    shutil.rmtree(TMP, ignore_errors=True)


if __name__ == "__main__":
    main()
