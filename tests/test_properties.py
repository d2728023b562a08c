"""Property-based tests (hypothesis): operator invariants checked
against naive in-Python models on randomized small inputs."""

from datetime import datetime, timedelta

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

def spark_round(x: float, scale: int = 6) -> float:
    """Model Spark's F.round EXACTLY: BigDecimal HALF_UP over the
    double's shortest repr. Python's round() is banker's half-even —
    at an exact .5 boundary of the target scale the two differ by one
    ulp of that scale (hypothesis caught 19/20 and 17/128 at scale 6,
    r08). Every model of a Spark-rounded value must use this."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-scale)
    return float(Decimal(repr(x)).quantize(q, ROUND_HALF_UP))


SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def event_rows(draw):
    n = draw(st.integers(2, 25))
    rows = []
    for i in range(n):
        user = draw(st.integers(1, 3))
        offset_min = draw(st.integers(0, 600))
        rows.append((user, datetime(2024, 1, 1) + timedelta(minutes=offset_min), i))
    return rows


@given(event_rows())
@settings(**SETTINGS)
def test_sessionize_matches_naive(spark, rows):
    from thundercats_spark.operators.sessionize import sessionize

    df = spark.createDataFrame(rows, "user_id int, ts timestamp, event_id int")
    got = {
        (r["user_id"], r["event_id"]): r["session_id"]
        for r in sessionize(df, gap_minutes=30, order_cols=["event_id"]).collect()
    }
    # naive model
    by_user = {}
    for u, ts, eid in sorted(rows, key=lambda r: (r[0], r[1], r[2])):
        by_user.setdefault(u, []).append((ts, eid))
    for u, evs in by_user.items():
        sess = 0
        prev = None
        for ts, eid in evs:
            if prev is None or (ts - prev).total_seconds() > 1800:
                sess += 1
            prev = ts
            assert got[(u, eid)] == sess, (u, eid, rows)


@given(event_rows(), event_rows())
@settings(**SETTINGS)
def test_asof_matches_naive(spark, left_rows, right_rows):
    from thundercats_spark.operators.asof import asof_join

    left = spark.createDataFrame(left_rows, "k int, t timestamp, lid int")
    right = spark.createDataFrame(
        [(u, ts, float(i)) for u, ts, i in right_rows], "k int, rt timestamp, v double"
    )
    out = asof_join(left, right, "k", "k", "t", "rt", keep_unmatched=True)
    got = {r["lid"]: r["v"] for r in out.collect()}
    for k, t, lid in left_rows:
        cands = [(ts, i) for (u, ts, i) in right_rows if u == k and ts <= t]
        expect = float(max(cands)[1]) if cands else None
        assert got[lid] == expect, (k, t, lid)


@given(st.lists(st.text(alphabet="ab ", min_size=0, max_size=30), min_size=1, max_size=12))
@settings(**SETTINGS)
def test_dedup_exact_partition_property(spark, texts):
    """Survivors+copies partition the input: Σ n_copies == n_rows, and
    every survivor is the min id of its normalized-text class."""
    from thundercats_spark.operators.dedup import dedup_exact

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup_exact(df, "text", "doc_id").collect()
    assert sum(r["n_copies"] for r in out) == len(texts)
    classes = {}
    for i, t in rows:
        classes.setdefault(t.lower().strip(), []).append(i)
    expect_survivors = {min(v) for v in classes.values()}
    assert {r["doc_id"] for r in out} == expect_survivors


@given(
    st.lists(
        st.lists(st.floats(-1, 1, allow_nan=False, width=32), min_size=4, max_size=4),
        min_size=2,
        max_size=10,
    )
)
@settings(**SETTINGS)
def test_cosine_matches_python(spark, vecs):
    import math

    from thundercats_spark.functions.vectors import cosine

    # skip zero vectors (cosine undefined)
    vecs = [v for v in vecs if math.sqrt(sum(x * x for x in v)) > 1e-6]
    if len(vecs) < 2:
        return
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "id long, v array<double>"
    )
    q = vecs[0]
    qcol = F.array(*[F.lit(float(x)) for x in q])
    got = {r["id"]: r["c"] for r in df.select("id", cosine(F.col("v"), qcol).alias("c")).collect()}
    for i, v in enumerate(vecs):
        dot = sum(a * b for a, b in zip(v, q))
        expect = dot / (
            math.sqrt(sum(a * a for a in v)) * math.sqrt(sum(b * b for b in q))
        )
        assert abs(got[i] - expect) < 1e-9


@st.composite
def word_docs(draw):
    """Two small doc sets over a tiny vocabulary — dense enough that
    Jaccard collisions and near-misses both occur."""
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"]

    def mk(ids):
        docs = []
        for i in ids:
            n = draw(st.integers(3, 10))
            words = [draw(st.sampled_from(vocab)) for _ in range(n)]
            docs.append((i, " ".join(words)))
        return docs

    na, nb = draw(st.integers(1, 5)), draw(st.integers(1, 5))
    return mk(range(na)), mk(range(100, 100 + nb))


def _shingles(text, n=3):
    toks = text.split()
    if len(toks) < n:
        return {text}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


@given(word_docs())
@settings(**SETTINGS)
def test_ngram_jaccard_join_matches_naive(spark, doc_sets):
    """R-S PPJoin == brute-force cross Jaccard (recall AND precision
    1.0): the prefix + length filters must lose nothing."""
    from thundercats_spark.operators.dedup import ngram_jaccard_join

    a_rows, b_rows = doc_sets
    a = spark.createDataFrame(a_rows, "doc_id long, text string")
    b = spark.createDataFrame(b_rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_join(a, b, threshold=0.5).collect()
    }
    expect = {}
    for ia, ta in a_rows:
        for ib, tb in b_rows:
            sa, sb = _shingles(ta), _shingles(tb)
            j = len(sa & sb) / len(sa | sb)
            if j >= 0.5:
                expect[(ia, ib)] = j
    assert set(got) == set(expect), (a_rows, b_rows)
    for k, v in expect.items():
        assert abs(got[k] - v) < 1e-12, (k, v, got[k])


@st.composite
def chunk_case(draw):
    n = draw(st.integers(0, 40))
    chunk = draw(st.integers(1, 12))
    overlap = draw(st.integers(0, chunk - 1))
    return n, chunk, overlap


@given(chunk_case())
@settings(**SETTINGS)
def test_chunk_documents_matches_naive(spark, case):
    from thundercats_spark.operators.curation import chunk_documents

    n, chunk, overlap = case
    text = " ".join(f"w{i}" for i in range(n))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = {
        r["chunk_id"]: (r["chunk_text"], r["chunk_n_tokens"])
        for r in chunk_documents(df, chunk, overlap).collect()
    }
    # naive model: starts at multiples of stride below max(n-overlap, 1)
    toks = text.split() if text else []
    stride = chunk - overlap
    want = {}
    if toks:
        for cid, s in enumerate(range(0, max(n - overlap, 1), stride)):
            w = toks[s : s + chunk]
            want[cid] = (" ".join(w), len(w))
    assert got == want
    # coverage: the windows jointly cover every token exactly
    covered = set()
    for cid in want:
        s = cid * stride
        covered |= set(range(s, min(s + chunk, n)))
    assert covered == set(range(n))


@st.composite
def budget_rows(draw):
    n = draw(st.integers(1, 40))
    rows = []
    for i in range(n):
        grp = draw(st.sampled_from(["a", "b", "c"]))
        score = float(draw(st.integers(0, 6)))  # heavy ties on purpose
        toks = draw(st.integers(0, 20))
        rows.append((i, grp, score, toks))
    budget = draw(st.integers(0, 120))
    return rows, budget


@given(budget_rows())
@settings(**SETTINGS)
def test_grouped_token_budget_matches_naive(spark, case):
    from thundercats_spark.operators.curation import select_token_budget_grouped

    rows, budget = case
    df = spark.createDataFrame(
        rows, "doc_id long, source string, score double, toks long"
    )
    got = {
        (r["source"], r["doc_id"])
        for r in select_token_budget_grouped(
            df, budget, F.col("score"), group_col="source",
            token_col=F.col("toks"), n_buckets=4, ids_only=True,
        ).collect()
    }
    want = set()
    for g in {r[1] for r in rows}:
        cum = 0
        for i, grp, score, toks in sorted(
            (r for r in rows if r[1] == g), key=lambda r: (-r[2], r[0])
        ):
            cum += toks
            if cum <= budget:
                want.add((g, i))
    assert got == want


# --------------------------------------------------------------------------
# round-4 kernels: quantization, BPE, temperature fractions
# --------------------------------------------------------------------------


@st.composite
def float_vectors(draw):
    n = draw(st.integers(1, 6))
    dim = draw(st.integers(1, 8))
    return [
        [draw(st.floats(-100, 100, width=32, allow_nan=False)) for _ in range(dim)]
        for _ in range(n)
    ]


@given(float_vectors())
@settings(**SETTINGS)
def test_quantize_error_bound_property(spark, vecs):
    from thundercats_spark.operators.embeddings import (
        dequantize_embeddings,
        quantize_embeddings,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )
    q = quantize_embeddings(df)
    back = {r["vec_id"]: r["embedding"] for r in dequantize_embeddings(q).collect()}
    scales = {r["vec_id"]: r["q_scale"] for r in q.collect()}
    ints = {r["vec_id"]: r["q"] for r in q.collect()}
    for i, v in enumerate(vecs):
        s = scales[i]
        assert all(abs(x) <= 127 for x in ints[i])
        for orig, approx in zip(v, back[i]):
            assert abs(float(orig) - float(approx)) <= s / 2 + 1e-6


@given(st.lists(st.text(alphabet="abcde", min_size=1, max_size=8), min_size=1, max_size=20))
@settings(**SETTINGS)
def test_bpe_lossless_any_corpus(spark, words):
    from thundercats_spark.functions.bpe import (
        END_OF_WORD,
        bpe_encode_word,
        bpe_train_from_counts,
        merge_ranks,
    )
    from collections import Counter

    counts = list(Counter(words).items())
    ranks = merge_ranks(bpe_train_from_counts(counts, n_merges=30))
    for w in words + ["unseen", "xyz"]:
        assert "".join(bpe_encode_word(w, ranks)) == w + END_OF_WORD


@given(
    st.dictionaries(
        st.sampled_from(["a", "b", "c", "d"]),
        st.integers(0, 10_000),
        min_size=1,
        max_size=4,
    ),
    st.floats(0.5, 50, allow_nan=False),
)
@settings(**SETTINGS)
def test_temperature_fractions_properties(spark, counts, temp):
    from thundercats_spark.operators.curation import temperature_keep_fractions

    fr = temperature_keep_fractions(counts, temp)
    pos = {s: c for s, c in counts.items() if c > 0}
    assert set(fr) == set(pos)
    for s, f in fr.items():
        assert 0.0 < f <= 1.0
    if pos:
        # some source is always kept in full (the smoothing target's
        # anchor): the smallest for T >= 1 (flattening), the largest
        # for T < 1 (sharpening — alpha-sampling's other regime)
        smallest = min(pos, key=lambda s: (pos[s], s))
        largest = max(pos, key=lambda s: (pos[s], s))
        anchor = smallest if temp >= 1.0 else largest
        assert fr[anchor] == 1.0
        if temp >= 1.0:
            # flattening: larger sources never keep a larger fraction
            for s in pos:
                if pos[s] >= pos[smallest]:
                    assert fr[s] <= fr[smallest] + 1e-12
        else:
            # sharpening: smaller sources never keep a larger fraction
            for s in pos:
                if pos[s] <= pos[largest]:
                    assert fr[s] <= fr[largest] + 1e-12


@given(
    st.integers(1, 300),  # group size n
    st.integers(1, 12),   # k buckets
)
@settings(**SETTINGS)
def test_ntile_from_rn_matches_python_model(spark, n, k):
    """ntile_from_rn must reproduce SQL NTILE(k) exactly for any
    (group size, bucket count): the first n%k buckets hold n//k+1
    rows, the rest n//k — checked against the direct Python model,
    all in integer arithmetic."""
    from thundercats_spark.operators.ranking import ntile_from_rn

    df = spark.range(1, n + 1).withColumnRenamed("id", "rn")
    got = {
        r["rn"]: r["t"]
        for r in df.select(
            "rn", ntile_from_rn(F.col("rn"), F.lit(n), k).alias("t")
        ).collect()
    }
    q, r = divmod(n, k)
    expect, rn = {}, 1
    for b in range(1, k + 1):
        size = q + (1 if b <= r else 0)
        for _ in range(size):
            expect[rn] = b
            rn += 1
    assert got == expect


@st.composite
def png_case(draw):
    w = draw(st.integers(1, 24))
    h = draw(st.integers(1, 16))
    channels = draw(st.sampled_from([1, 2, 3, 4]))
    filter_type = draw(st.integers(0, 4))
    seed = draw(st.integers(0, 2**31 - 1))
    return w, h, channels, filter_type, seed


@given(png_case())
@settings(**SETTINGS)
def test_png_roundtrip_property(case):
    """encode_png -> decode_png is pixel-exact for any size, channel
    count, and per-row filter type (no Spark involved — the codec is
    pure bytes)."""
    import numpy as np

    from thundercats_spark.multimodal.binary import decode_png, encode_png

    w, h, channels, filter_type, seed = case
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w * channels), dtype=np.uint8)
    got = decode_png(encode_png(w, h, px, channels=channels, filter_type=filter_type))
    assert got is not None
    gw, gh, mode, vec = got
    assert (gw, gh, mode) == (w, h, "PNG")
    assert np.array_equal(vec.reshape(h, w * channels).astype(np.uint8), px)


@st.composite
def zorder_case(draw):
    k = draw(st.integers(1, 3))
    bounds = {}
    for c in range(k):
        bs = sorted(
            set(draw(st.lists(st.integers(-50, 50), min_size=1, max_size=12)))
        )
        bounds[f"c{c}"] = [float(b) for b in bs]
    n = draw(st.integers(1, 25))
    rows = [
        tuple(float(draw(st.integers(-60, 60))) for _ in range(k))
        for _ in range(n)
    ]
    return bounds, rows


@given(zorder_case())
@settings(**SETTINGS)
def test_zorder_expr_matches_python_model(spark, case):
    """zorder_expr == the obvious pure-Python Morton model (bisect
    bucket + bit interleave) on arbitrary boundaries and values —
    one Spark job evaluates every row of the example at once."""
    from bisect import bisect_right

    from thundercats_spark.physical.layout import zorder_expr

    bounds, rows = case
    cols = list(bounds)
    k = len(cols)
    max_bits = max(max(1, len(bounds[c]).bit_length()) for c in cols)

    def model(row):
        z = 0
        for ci, c in enumerate(cols):
            b = bisect_right(bounds[c], row[ci])
            for j in range(max_bits):
                z |= ((b >> j) & 1) << (j * k + (k - 1 - ci))
        return z

    df = spark.createDataFrame(
        rows, ", ".join(f"{c} double" for c in cols)
    )
    got = [
        r["z"] for r in df.select(zorder_expr(bounds).alias("z")).collect()
    ]
    assert sorted(got) == sorted(model(r) for r in rows)
    # the curve is order-preserving per column: raising one coordinate
    # never lowers z when the others are fixed at bucket 0
    lo = tuple(-60.0 for _ in cols)
    probe = [lo] + [
        tuple(60.0 if i == j else -60.0 for i in range(k)) for j in range(k)
    ]
    zs = [model(r) for r in probe]
    assert all(z >= zs[0] for z in zs[1:])


@given(
    st.lists(st.integers(0, 300), min_size=1, max_size=40),
    st.lists(st.integers(1, 64), min_size=1, max_size=4, unique=True),
)
@settings(**SETTINGS)
def test_packing_efficiency_matches_model(spark, toks, lens):
    import math

    from thundercats_spark.operators.curation import packing_efficiency_report

    df = spark.createDataFrame([(t,) for t in toks], "t long")
    got = {
        r["seq_len"]: r
        for r in packing_efficiency_report(
            df, seq_lens=lens, token_col=F.col("t")
        ).collect()
    }
    assert set(got) == set(lens)
    for L in lens:
        full = sum(t // L for t in toks)
        rem = sum(t % L for t in toks)
        nrem = sum(1 for t in toks if t % L)
        r = got[L]
        assert r["n_docs"] == len(toks) and r["total_tokens"] == sum(toks)
        assert r["full_chunks"] == full and r["remainder_tokens"] == rem
        assert r["n_remainders"] == nrem
        assert r["min_seqs"] == full + math.ceil(rem / L)
        assert r["max_seqs"] == full + nrem
        for col, seqs in (("min_padding_frac", r["min_seqs"]),
                          ("max_padding_frac", r["max_seqs"])):
            want = 0.0 if seqs == 0 else spark_round(1 - sum(toks) / (seqs * L))
            assert abs(r[col] - want) < 1e-9, (L, col)


@given(
    st.lists(st.tuples(st.integers(1, 5), st.integers(1, 30)),
             min_size=1, max_size=8),
    st.integers(1, 64),
)
@settings(**SETTINGS)
def test_key_skew_matches_model(spark, dist, p):
    import math

    from thundercats_spark.operators.skew import key_skew_report

    # dist: (key, count) pairs; duplicate keys merge in the model
    model = {}
    for k, c in dist:
        model[k] = model.get(k, 0) + c
    rows = [(k,) for k, c in model.items() for _ in range(c)]
    df = spark.createDataFrame(rows, "k int")
    total = sum(model.values())
    got = key_skew_report(df, ["k"], n_partitions=p, top=1000).collect()
    assert len(got) == len(model)
    # ordered by n desc then key asc
    order = [(-r["n"], r["k"]) for r in got]
    assert order == sorted(order)
    for r in got:
        n = model[r["k"]]
        assert r["n"] == n
        assert abs(r["share"] - spark_round(n / total)) < 1e-9
        assert r["suggested_salt"] == math.ceil(n * p / total)


# ---------------------------------------------------------------------------
# Wave-9 operators (r08): sliding-window exact distinct vs a brute-force
# model; grouped OLS closed forms vs numpy's independent lstsq solver.
# ---------------------------------------------------------------------------


@st.composite
def sliding_activity(draw):
    n = draw(st.integers(1, 28))
    rows = [
        (
            draw(st.sampled_from(["a", "b"])),
            draw(st.integers(1, 4)),
            draw(st.integers(0, 24)),
        )
        for _ in range(n)
    ]
    return rows, draw(st.integers(1, 9))


@given(sliding_activity())
@settings(**SETTINGS)
def test_sliding_distinct_matches_model(spark, data):
    """The contribution-interval algorithm equals the O(days x users)
    brute force for ANY activity pattern and window length — including
    duplicate (type, user, day) rows, which must collapse to one."""
    from thundercats_spark.queries.analytics6 import sliding_distinct_users

    rows, wd = data
    ev = spark.createDataFrame(
        [
            (t, u, datetime(2024, 1, 1 + d, 8, 30))
            for t, u, d in rows
        ],
        "event_type string, user_id long, ts timestamp",
    )
    got = {
        (r.event_type, r.day): r.users_7d
        for r in sliding_distinct_users(ev, window_days=wd).collect()
    }
    model = {}
    by_type = {}
    for t, u, d in rows:
        by_type.setdefault(t, set()).add((u, d))
    for t, act in by_type.items():
        days = [d for _, d in act]
        for d in range(min(days), max(days) + 1):
            users = {u for u, a in act if d - wd + 1 <= a <= d}
            key = (t, f"2024-01-{d + 1:02d}")
            model[key] = len(users)
    assert got == model


@st.composite
def brand_xy(draw):
    n = draw(st.integers(1, 15))
    # cents-integral values: exact under DECIMAL(12,2), like the real
    # l_quantity / l_extendedprice columns
    rows = [
        (
            draw(st.integers(1, 5000)) / 100,
            draw(st.integers(1, 2_000_000)) / 100,
        )
        for _ in range(n)
    ]
    return rows


@given(brand_xy())
@settings(**SETTINGS)
def test_brand_regression_matches_numpy(spark, rows):
    """Two-oracle property. (1) BIT-EXACT vs a Python replica of the
    exact pipeline (decimal sums → the same IEEE closed forms →
    spark_round): this is what the DuckDB oracle computes, so it must
    match to the last bit — including the near-degenerate cases where
    double rounding leaves var_x a hair off zero and the 'slope' is
    numerical noise (BOTH engines produce the identical noise; NULL
    appears only when var_x lands on exactly 0.0). (2) When the
    system is well-conditioned, the values also agree with numpy's
    INDEPENDENT lstsq/corrcoef solvers — guarding against the replica
    and the query sharing a wrong formula."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np

    from thundercats_spark.queries.analytics6 import brand_price_regression

    li = spark.createDataFrame(
        [(1, x, y) for x, y in rows],
        "l_partkey long, l_quantity double, l_extendedprice double",
    )
    part = spark.createDataFrame([(1, "B")], "p_partkey long, p_brand string")
    r = brand_price_regression(li, part).collect()[0]

    cent = Decimal("0.01")
    dx = [Decimal(repr(x)).quantize(cent, ROUND_HALF_UP) for x, _ in rows]
    dy = [Decimal(repr(y)).quantize(cent, ROUND_HALF_UP) for _, y in rows]
    n = float(len(rows))
    sx, sy = float(sum(dx)), float(sum(dy))
    sxy = float(sum(a * b for a, b in zip(dx, dy)))
    sxx = float(sum(a * a for a in dx))
    syy = float(sum(b * b for b in dy))
    cov = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy

    if var_x == 0.0:
        assert r.slope is None and r.intercept is None
    else:
        slope = cov / var_x
        assert r.slope == spark_round(slope)
        assert r.intercept == spark_round((sy - slope * sx) / n)
    denom = math.sqrt(max(var_x * var_y, 0.0))
    if denom == 0.0:
        assert r.corr_qty_price is None
    else:
        assert r.corr_qty_price == spark_round(cov / denom)

    # independent-solver cross-check on well-conditioned inputs only
    # (near-degenerate var is pure rounding noise — replica-exact
    # above, meaningless to compare across algorithms)
    if n >= 2 and var_x > 1e-6 * max(1.0, n * sxx):
        xs = np.array([float(v) for v in dx])
        ys = np.array([float(v) for v in dy])
        a = np.vstack([xs, np.ones(len(xs))]).T
        np_slope, np_icpt = np.linalg.lstsq(a, ys, rcond=None)[0]
        # RELATIVE tolerance: near the conditioning gate both solvers
        # carry error ~ eps * kappa^2, which scales with the estimate
        # itself (review r08: a 2e5-magnitude slope can differ by more
        # than an absolute 5e-5 between QR and the normal equations)
        assert abs(r.slope - np_slope) < 5e-5 * max(1.0, abs(np_slope)), (
            r.slope, np_slope,
        )
        assert abs(r.intercept - np_icpt) < 5e-3 * max(1.0, abs(np_icpt)), (
            r.intercept, np_icpt,
        )
        if var_y > 1e-6 * max(1.0, n * syy):
            corr = float(np.corrcoef(xs, ys)[0, 1])
            assert abs(r.corr_qty_price - corr) < 5e-5


@st.composite
def scd2_observations(draw):
    """Random per-key observation streams: few keys, few dates (forcing
    same-day ties), few attr values (forcing both runs AND returns to
    earlier values)."""
    n = draw(st.integers(1, 24))
    rows = []
    for i in range(n):
        key = draw(st.integers(1, 3))
        day = draw(st.integers(0, 9))
        attr = draw(st.sampled_from(["A", "B", "C"]))
        # observation id doubles as the tiebreak — unique by construction
        rows.append((key, i, datetime(2024, 1, 1) + timedelta(days=day), attr))
    return rows


@given(scd2_observations())
@settings(**SETTINGS)
def test_scd2_intervals_matches_naive(spark, rows):
    """scd2_intervals vs a pure-Python gaps-and-islands fold over the
    (ts, tiebreak)-sorted stream: same segments, same [valid_from,
    valid_to) chaining, same open tail, same observation counts —
    including same-day ties broken by the tiebreak key and values
    returning after a gap (which must open a NEW segment)."""
    from thundercats_spark.queries.analytics7 import scd2_intervals

    df = spark.createDataFrame(
        rows, "k long, ok long, ts timestamp, attr string"
    )
    got = [
        tuple(r)
        for r in scd2_intervals(
            df, key="k", ts="ts", attr="attr", tiebreak="ok"
        ).collect()
    ]

    # naive model
    from collections import defaultdict

    by_key = defaultdict(list)
    for k, ok, ts, attr in rows:
        by_key[k].append((ts, ok, attr))
    expected = []
    for k in sorted(by_key):
        segs = []  # (value, valid_from_ts, n_obs)
        for ts, ok, attr in sorted(by_key[k]):
            if not segs or segs[-1][0] != attr:
                segs.append([attr, ts, 1])
            else:
                segs[-1][2] += 1
        for i, (attr, vf, n_obs) in enumerate(segs):
            vt = (
                segs[i + 1][1].strftime("%Y-%m-%d")
                if i + 1 < len(segs)
                else "9999-12-31"
            )
            expected.append(
                (k, i + 1, attr, vf.strftime("%Y-%m-%d"), vt, n_obs)
            )
    assert got == expected, (got, expected)


@given(st.data())
@settings(**SETTINGS)
def test_scd2_apply_batch_random_splits(spark, data):
    """Property: for random observation streams split at a random day
    boundary (prefix ≤ D < suffix), the incremental SCD2 merge equals
    the full rebuild over all observations."""
    from thundercats_spark.queries.analytics7 import (
        scd2_apply_batch,
        scd2_intervals,
    )

    n = data.draw(st.integers(4, 24))
    rows = []
    for i in range(n):
        k = data.draw(st.integers(1, 3))
        day = data.draw(st.integers(0, 9))
        a = data.draw(st.sampled_from(["A", "B"]))
        rows.append((k, i, datetime(2024, 1, 1) + timedelta(days=day), a))
    cut = data.draw(st.integers(0, 9))
    cutoff = datetime(2024, 1, 1) + timedelta(days=cut)
    prefix = [r for r in rows if r[2] <= cutoff]
    suffix = [r for r in rows if r[2] > cutoff]
    if not prefix or not suffix:
        return
    schema = "k long, ok long, ts timestamp, attr string"
    build = lambda rs: scd2_intervals(  # noqa: E731
        spark.createDataFrame(rs, schema),
        key="k", ts="ts", attr="attr", tiebreak="ok", with_last_seen=True,
    )
    got = {
        tuple(r)
        for r in scd2_apply_batch(
            build(prefix), spark.createDataFrame(suffix, schema),
            key="k", ts="ts", attr="attr", tiebreak="ok",
        ).collect()
    }
    want = {tuple(r) for r in build(rows).collect()}
    assert got == want


@st.composite
def random_dag_edges(draw):
    """Random DAG family (VERDICT r09 #8: widen beyond the hand-built
    shapes and the one seeded 6-layer DAG): nodes get a random
    topological order and every edge points child → earlier-positioned
    parent, so acyclicity holds by construction while density, depth,
    fan-out, fan-in, forest-ness, and multi-root structure all vary
    freely. At least one node has no parent (a root exists)."""
    n = draw(st.integers(3, 14))
    nodes = list(range(n))  # position IS the topological order
    edges = set()
    n_edges = draw(st.integers(1, min(24, n * (n - 1) // 2)))
    for _ in range(n_edges):
        c = draw(st.integers(1, n - 1))
        p = draw(st.integers(0, c - 1))
        edges.add((nodes[c], nodes[p]))
    return sorted(edges)


@given(random_dag_edges())
@settings(**SETTINGS)
def test_dag_operators_match_brute_force_on_random_dags(spark, edges):
    """Both DAG closure operators — squaring (dag_reachability) and
    level propagation (dag_root_labels), two entirely different cost
    models — equal the Python DFS model's (node, root, min_depth,
    max_depth) labels on arbitrary random DAGs."""
    from tests.test_hierarchy import _brute_reachability
    from thundercats_spark.operators.hierarchy import (
        dag_reachability,
        dag_root_labels,
    )

    model = _brute_reachability(edges)
    df = spark.createDataFrame(edges, "child long, parent long")
    sq = {tuple(r) for r in dag_reachability(df, "child", "parent").collect()}
    assert sq == model
    lv = {tuple(r) for r in dag_root_labels(df, "child", "parent").collect()}
    assert lv == model


@st.composite
def order_intervals(draw):
    n = draw(st.integers(1, 8))
    orders, items = [], []
    for ok in range(1, n + 1):
        od = draw(st.integers(0, 40))
        orders.append((ok, datetime(2024, 1, 1) + timedelta(days=od)))
        for li in range(draw(st.integers(1, 3))):
            sd = draw(st.integers(0, 50))
            items.append((ok, datetime(2024, 1, 1) + timedelta(days=sd)))
    return orders, items


@given(order_intervals())
@settings(**SETTINGS)
def test_backlog_sweepline_matches_python_model(spark, tmp_path, data):
    """The distributed sweep line (delta agg + global_running_sum +
    month peak) equals a sequential Python sweep over the same
    half-open [orderdate, last_ship + 1) intervals — including orders
    whose shipments predate the order date (negative-length intervals
    still contribute their +1/-1 boundary pair)."""
    from collections import defaultdict

    orders, items = data
    spark.createDataFrame(orders, "o_orderkey long, o_orderdate timestamp") \
        .write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    spark.createDataFrame(items, "l_orderkey long, l_shipdate timestamp") \
        .write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")

    last_ship = {}
    for ok, sd in items:
        last_ship[ok] = max(last_ship.get(ok, sd), sd)
    deltas = defaultdict(int)
    for ok, od in orders:
        deltas[od.date()] += 1
        deltas[(last_ship[ok] + timedelta(days=1)).date()] -= 1
    expect, open_now = {}, 0
    for day in sorted(deltas):
        open_now += deltas[day]
        mo = day.strftime("%Y-%m")
        peak, ncd = expect.get(mo, (None, 0))
        expect[mo] = (open_now if peak is None else max(peak, open_now),
                      ncd + 1)

    from thundercats_spark.queries.analytics9 import orders_backlog_sweepline

    got = {r["month"]: (r["peak_open_orders"], r["n_change_days"])
           for r in orders_backlog_sweepline(spark, str(tmp_path)).collect()}
    assert got == expect


@given(st.lists(st.tuples(st.integers(1, 12), st.integers(1, 400)),
                min_size=1, max_size=25))
@settings(**SETTINGS)
def test_revenue_pareto_matches_python_model(spark, tmp_path, rows):
    """The distributed NTILE decile report equals a sequential Python
    model of SQL NTILE (rev DESC, custkey ASC; first n%10 buckets one
    row larger) with exact quarter-dollar revenues."""
    orders = [(i, ck, cents * 0.25) for i, (ck, cents) in enumerate(rows)]
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_totalprice double"
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")

    from collections import defaultdict
    from decimal import Decimal

    rev = defaultdict(Decimal)
    for ck, cents in rows:
        rev[ck] += Decimal(cents) * Decimal("0.25")
    ranked = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))
    n, k = len(ranked), 10
    sizes = [(n // k) + (1 if b < n % k else 0) for b in range(k)]
    expect, pos, total = {}, 0, sum(rev.values())
    cum = Decimal(0)
    for b, size in enumerate(sizes, start=1):
        if size == 0:
            continue
        chunk = ranked[pos:pos + size]
        pos += size
        drev = sum(r for _, r in chunk)
        cum += drev
        expect[b] = (len(chunk), float(drev),
                     float(drev) / float(total), float(cum) / float(total))

    from thundercats_spark.queries.analytics9 import customer_revenue_pareto

    got = {r["decile"]: (r["n_customers"], r["revenue"],
                         r["revenue_share"], r["cum_share"])
           for r in customer_revenue_pareto(spark, str(tmp_path)).collect()}
    assert set(got) == set(expect)
    for d in expect:
        assert got[d][0] == expect[d][0] and got[d][1] == expect[d][1]
        assert abs(got[d][2] - expect[d][2]) < 1e-12
        assert abs(got[d][3] - expect[d][3]) < 1e-12


def test_scd2_reserved_column_names_raise(spark):
    """ADVICE r11: keeping the caller's tiebreak attribute through the
    flagged frame (the r11 sort-elision) means caller columns literally
    named 'chg' or 'seg' would collide with the internal helper columns
    — the operator must refuse loudly, for any of the four roles."""
    import pytest

    from thundercats_spark.operators.scd2 import scd2_intervals

    df = spark.createDataFrame(
        [(1, 5, datetime(2024, 1, 1), "A")],
        "k long, chg long, ts timestamp, seg string",
    )
    with pytest.raises(ValueError, match="chg"):
        scd2_intervals(df, key="k", ts="ts", attr="seg", tiebreak="chg")
    with pytest.raises(ValueError, match="seg"):
        scd2_intervals(df, key="k", ts="ts", attr="seg", tiebreak="k")
