"""Source-mix measurement, rebalancing, decontamination, splits."""

import pyspark.sql.functions as F
import pytest

from thundercats_spark.operators.curation import (
    rebalance_fractions,
    rebalance_to_mix,
    source_mix,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_source_mix_fractions_sum_to_one(docs):
    rows = source_mix(docs, "source").collect()
    assert abs(sum(r["fraction"] for r in rows) - 1.0) < 1e-12
    assert sum(r["n_docs"] for r in rows) == docs.count()


def test_rebalance_fractions_math():
    fr = rebalance_fractions({"a": 100, "b": 50}, {"a": 0.5, "b": 0.5})
    assert fr == {"a": 0.5, "b": 1.0}  # b is the binding source
    # unnormalized targets are normalized
    fr2 = rebalance_fractions({"a": 100, "b": 50}, {"a": 1, "b": 1})
    assert fr2 == fr
    # dropping a source entirely
    fr3 = rebalance_fractions({"a": 10, "b": 10}, {"a": 1.0})
    assert fr3 == {"a": 1.0} and "b" not in fr3


def test_rebalance_to_mix_deterministic_and_directional(docs):
    sources = [r["source"] for r in docs.select("source").distinct().collect()]
    target = {s: 1.0 / len(sources) for s in sources}
    out1 = rebalance_to_mix(docs, target, seed=11)
    out2 = rebalance_to_mix(docs, target, seed=11)
    ids1 = sorted(r["doc_id"] for r in out1.select("doc_id").collect())
    ids2 = sorted(r["doc_id"] for r in out2.select("doc_id").collect())
    assert ids1 == ids2  # seeded Bernoulli reproduces
    # mix moved toward uniform: max-min spread shrinks or stays
    before = {r["source"]: r["n_docs"] for r in source_mix(docs).collect()}
    after = {r["source"]: r["n_docs"] for r in source_mix(out1).collect()}
    spread_before = max(before.values()) - min(before.values())
    spread_after = max(after.values()) - min(after.values())
    assert spread_after <= max(spread_before, 1)


def test_decontaminate_flag_and_filter(spark):
    from thundercats_spark.operators.curation import decontaminate

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota"),  # contains the 8-gram
            (2, "totally different words with no overlap at all here"),
            (3, "short doc"),  # < 8 tokens -> no grams
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in decontaminate(corpus, bench, n=8).collect()}
    assert out[1]["contaminated"] and out[1]["n_contaminated"] >= 1
    assert not out[2]["contaminated"] and out[2]["n_contaminated"] == 0
    assert not out[3]["contaminated"]
    kept = decontaminate(corpus, bench, n=8, mode="filter")
    assert sorted(r["doc_id"] for r in kept.collect()) == [2, 3]
    assert "n_contaminated" not in kept.columns


def test_corpus_split_deterministic_stratified(docs):
    from thundercats_spark.operators.curation import corpus_split

    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = corpus_split(docs, w)
    b = corpus_split(docs, w)
    rows_a = {r["doc_id"]: r["split"] for r in a.select("doc_id", "split").collect()}
    rows_b = {r["doc_id"]: r["split"] for r in b.select("doc_id", "split").collect()}
    assert rows_a == rows_b  # hash split: no randomness at all
    # every row assigned, proportions roughly honored
    n = docs.count()
    counts = {r["split"]: r["c"] for r in a.groupBy("split").agg(F.count(F.lit(1)).alias("c")).collect()}
    assert sum(counts.values()) == n
    assert counts["train"] > counts.get("val", 0) and counts["train"] > counts.get("test", 0)
    # repartitioning must not move rows between splits
    c = corpus_split(docs.repartition(7), w)
    rows_c = {r["doc_id"]: r["split"] for r in c.select("doc_id", "split").collect()}
    assert rows_c == rows_a


def test_quality_funnel_monotone(docs):
    from thundercats_spark.operators.curation import quality_funnel

    gates = [
        ("nonempty", F.length("text") > 0),
        ("min_chars", F.length("text") >= 100),
        ("impossible", F.length("text") < 0),
    ]
    rows = quality_funnel(docs, gates).orderBy("stage_idx").collect()
    ns = [r["n_pass"] for r in rows]
    assert ns[0] >= ns[1] >= ns[2]  # cumulative gates can only shrink
    assert ns[0] == docs.where(F.length("text") > 0).count()
    assert ns[2] == 0
    assert [r["stage"] for r in rows] == ["nonempty", "min_chars", "impossible"]


def test_pack_sequences_budget_and_determinism(spark):
    from thundercats_spark.operators.curation import pack_sequences

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(50 + i % 37))) for i in range(200)],
        "doc_id long, text string",
    )
    packed = pack_sequences(docs, budget=256, n_groups=4)
    rows = packed.select("doc_id", "pack_group", "pack_seq", "n_tokens").collect()
    assert len(rows) == 200  # every doc assigned
    # within each group, pack_seq starts at 0 and is contiguous
    by_group = {}
    for r in rows:
        by_group.setdefault(r["pack_group"], []).append(r)
    for g, rs in by_group.items():
        seqs = sorted({r["pack_seq"] for r in rs})
        assert seqs == list(range(len(seqs))), g
        # every pack except the group's last holds >= budget tokens of
        # coverage: the NEXT pack exists only once cum tokens crossed it
        rs_sorted = sorted(rs, key=lambda r: r["doc_id"])
        cum = 0
        for r in rs_sorted:
            assert r["pack_seq"] == cum // 256
            cum += r["n_tokens"]
    # deterministic under physical repartitioning
    again = {
        (r["doc_id"], r["pack_group"], r["pack_seq"])
        for r in pack_sequences(docs.repartition(13), budget=256, n_groups=4)
        .select("doc_id", "pack_group", "pack_seq")
        .collect()
    }
    assert again == {(r["doc_id"], r["pack_group"], r["pack_seq"]) for r in rows}


def test_remove_boilerplate_lines(spark):
    from thundercats_spark.operators.curation import (
        boilerplate_lines,
        remove_boilerplate_lines,
    )

    header = "COMMON HEADER"
    docs = spark.createDataFrame(
        [(i, f"{header}\nbody text {i}\nunique line {i * 7}") for i in range(20)]
        + [(99, "all original\ncontent here")],
        "doc_id long, text string",
    )
    boiler = boilerplate_lines(docs, min_docs=10).collect()
    assert len(boiler) == 1 and boiler[0]["n_docs"] == 20
    out = {r["doc_id"]: r["text"] for r in remove_boilerplate_lines(docs, min_docs=10).collect()}
    assert len(out) == 21
    assert out[0] == "body text 0\nunique line 0"  # header gone, order kept
    assert out[99] == "all original\ncontent here"  # untouched
    assert all(header not in t for t in out.values())


def test_epoch_shuffle_deterministic_permutations(spark):
    from thundercats_spark.operators.curation import epoch_shuffle

    df = spark.range(500).withColumnRenamed("id", "doc_id")
    e1 = [r["doc_id"] for r in epoch_shuffle(df, 1, n_partitions=4).collect()]
    e1b = [r["doc_id"] for r in epoch_shuffle(df.repartition(9), 1, n_partitions=4).collect()]
    e2 = [r["doc_id"] for r in epoch_shuffle(df, 2, n_partitions=4).collect()]
    assert sorted(e1) == list(range(500))  # a permutation
    assert e1 == e1b  # reproducible regardless of input layout
    assert e1 != e2  # epochs differ
    assert e1 != list(range(500))  # actually shuffled


def test_calibrate_threshold_keeps_requested_fraction(spark):
    from thundercats_spark.operators.curation import calibrate_threshold

    df = spark.range(10000).select((F.col("id") % 1000).cast("double").alias("sc"))
    cut = calibrate_threshold(df, F.col("sc"), keep_frac=0.3)
    kept = df.where(F.col("sc") >= cut).count() / 10000
    assert 0.28 <= kept <= 0.32
    # degenerate fractions clamp sanely
    assert calibrate_threshold(df, F.col("sc"), 1.0) == 0.0


def test_temperature_mix():
    from thundercats_spark.operators.curation import temperature_mix

    counts = {"big": 9000, "small": 1000}
    nat = temperature_mix(counts, 1.0)
    assert nat["big"] == pytest.approx(0.9) and nat["small"] == pytest.approx(0.1)
    warm = temperature_mix(counts, 3.0)
    assert 0.1 < warm["small"] < 0.5  # upweighted but not dominant
    hot = temperature_mix(counts, 1000.0)
    assert abs(hot["small"] - 0.5) < 0.01  # T->inf approaches uniform
    with pytest.raises(ValueError):
        temperature_mix(counts, 0)


def test_sample_per_group_exact_counts(spark):
    from thundercats_spark.operators.curation import sample_per_group

    df = spark.createDataFrame(
        [(i, "big" if i < 50 else "small") for i in range(55)], ["doc_id", "source"]
    )
    out = sample_per_group(df, k=10, group_col="source", key_col="doc_id")
    counts = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # exactly k from the big group, the whole small group (5 < k)
    assert counts == {"big": 10, "small": 5}
    # deterministic under repartitioning
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in sample_per_group(df.repartition(7), 10, "source", "doc_id").collect()
    )
    assert a == b


def test_leakage_safe_split_groups_cotravel(spark):
    from thundercats_spark.operators.curation import (
        corpus_split,
        corpus_split_leakage_safe,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(40)], ["doc_id", "text"]
    )
    # dup graph: {0,1,2} chained, {10,11}, everything else singleton
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], ["id_a", "id_b"]
    )
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = corpus_split_leakage_safe(docs, pairs, w, "doc_id").collect()
    by_id = {r["doc_id"]: r for r in out}
    assert len(by_id) == 40
    # connected docs share rep AND split
    assert {by_id[i]["group_rep"] for i in (0, 1, 2)} == {0}
    assert len({by_id[i]["split"] for i in (0, 1, 2)}) == 1
    assert by_id[10]["group_rep"] == by_id[11]["group_rep"] == 10
    assert by_id[10]["split"] == by_id[11]["split"]
    # singletons: rep is own id, and the split equals the per-row hash
    # split (same bucket rule) — leakage-safety changes nothing for them
    plain = {r["doc_id"]: r["split"] for r in corpus_split(docs, w, "doc_id").collect()}
    for i in range(3, 10):
        assert by_id[i]["group_rep"] == i
        assert by_id[i]["split"] == plain[i]
    # deterministic across recomputation
    out2 = corpus_split_leakage_safe(docs, pairs, w, "doc_id").collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_decontaminate_fuzzy_flag_and_filter(spark):
    from thundercats_spark.operators.curation import decontaminate_fuzzy

    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta iota"),  # near-dup of bench
            (3, "one two three four five six seven eight nine"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(900, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    flagged = decontaminate_fuzzy(corpus, bench, threshold=0.5).collect()
    by_id = {r["doc_id"]: r for r in flagged}
    assert by_id[1]["contaminated"] and by_id[1]["max_jaccard"] == 1.0
    assert by_id[2]["contaminated"] and 0.5 <= by_id[2]["max_jaccard"] < 1.0
    assert not by_id[3]["contaminated"] and by_id[3]["n_bench_matches"] == 0
    kept = decontaminate_fuzzy(corpus, bench, threshold=0.5, mode="filter")
    assert sorted(r["doc_id"] for r in kept.collect()) == [3]
    assert "n_bench_matches" not in kept.columns


def test_select_token_budget_equals_naive_cumsum(spark, sf_dir):
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from thundercats_spark.functions.text_analysis import token_count
    from thundercats_spark.operators.curation import select_token_budget

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    budget = 10_000
    got = {
        (r["doc_id"], r["n_tokens"])
        for r in select_token_budget(
            docs, budget, F.col("n_chars").cast("double"), ids_only=True
        ).collect()
    }
    # naive single-window reference (fine at test scale)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    naive = {
        (r["doc_id"], r["n_tokens"])
        for r in docs.select(
            "doc_id",
            F.col("n_chars").cast("double").alias("score"),
            token_count(F.col("text")).cast("long").alias("n_tokens"),
        )
        .withColumn("cum", F.sum("n_tokens").over(w))
        .where(F.col("cum") <= budget)
        .collect()
    }
    assert got == naive and 0 < len(got) < docs.count()
    # degenerate budgets
    assert select_token_budget(
        docs, 0, F.col("n_chars").cast("double"), ids_only=True
    ).count() == 0
    assert select_token_budget(
        docs, 10**12, F.col("n_chars").cast("double"), ids_only=True
    ).count() == docs.count()
    # full-row mode returns the surviving input rows
    full = select_token_budget(docs, budget, F.col("n_chars").cast("double"))
    assert full.count() == len(got) and "text" in full.columns

def test_select_token_budget_recursion_guard(spark, sf_dir):
    """An oversized boundary bucket is re-bucketed recursively rather
    than single-partition sorted; output must stay identical to the
    default (and therefore to the naive cumsum the test above pins)."""
    import pyspark.sql.functions as F

    from thundercats_spark.operators.curation import select_token_budget

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    budget, score = 10_000, F.col("n_chars").cast("double")
    base = {
        (r["doc_id"], r["n_tokens"])
        for r in select_token_budget(docs, budget, score, ids_only=True).collect()
    }
    # max_exact_rows far below the ~1/8-corpus bucket size forces the
    # recursive re-bucket of every boundary bucket down to the leaves
    recursed = {
        (r["doc_id"], r["n_tokens"])
        for r in select_token_budget(
            docs, budget, score, ids_only=True, n_buckets=8, max_exact_rows=5
        ).collect()
    }
    assert recursed == base and base


def test_select_token_budget_injected_prep_builds_inertly(spark, sf_dir):
    """With boundaries + bucket_totals injected, the final plan builds
    with zero driver actions, and the physical plan contains no global
    sort — only the boundary bucket's window sorts."""
    import pyspark.sql.functions as F

    from thundercats_spark.operators.curation import select_token_budget

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tracker = spark.sparkContext.statusTracker()
    jobs_before = len(tracker.getJobIdsForGroup() or [])
    out = select_token_budget(
        docs, 10_000, F.col("n_chars").cast("double"), ids_only=True,
        boundaries=[100.0, 500.0, 900.0],
        bucket_totals={0: 4000, 1: 4000, 2: 4000, 3: 4000},
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert len(tracker.getJobIdsForGroup() or []) == jobs_before
    # exactly one sort: the boundary-bucket window's partition-local one
    assert "TakeOrdered" not in plan
    assert plan.count("Sort ") <= 1, plan


def test_select_token_budget_grouped_equals_naive_per_group(spark, sf_dir):
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from thundercats_spark.functions.text_analysis import token_count
    from thundercats_spark.operators.curation import select_token_budget_grouped

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    budget, score = 700, F.col("n_chars").cast("double")
    got = {
        (r["source"], r["doc_id"], r["n_tokens"])
        for r in select_token_budget_grouped(
            docs, budget, score, group_col="source", ids_only=True
        ).collect()
    }
    w = Window.partitionBy("source").orderBy(F.desc("score"), F.asc("doc_id")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    naive = {
        (r["source"], r["doc_id"], r["n_tokens"])
        for r in docs.select(
            "source",
            "doc_id",
            F.col("n_chars").cast("double").alias("score"),
            token_count(F.col("text")).cast("long").alias("n_tokens"),
        )
        .withColumn("cum", F.sum("n_tokens").over(w))
        .where(F.col("cum") <= budget)
        .collect()
    }
    assert got == naive and 0 < len(got) < docs.count()
    # every source respects its own quota
    by_src = {}
    for s, _, n in got:
        by_src[s] = by_src.get(s, 0) + n
    assert all(v <= budget for v in by_src.values()) and len(by_src) > 1


def test_select_token_budget_grouped_dict_budgets(spark, sf_dir):
    import pyspark.sql.functions as F

    from thundercats_spark.operators.curation import select_token_budget_grouped

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    score = F.col("n_chars").cast("double")
    # only two sources get a budget; src1 generous, src2 tight;
    # every other source is absent from the map -> dropped entirely
    out = select_token_budget_grouped(
        docs, {"src1": 10**9, "src2": 300}, score, group_col="source", ids_only=True
    ).collect()
    srcs = {r["source"] for r in out}
    assert srcs == {"src1", "src2"}
    n1 = sum(r["n_tokens"] for r in out if r["source"] == "src1")
    n2 = sum(r["n_tokens"] for r in out if r["source"] == "src2")
    assert n2 <= 300 < n1
    assert len([r for r in out if r["source"] == "src1"]) == docs.where(
        F.col("source") == "src1"
    ).count()  # generous budget keeps the whole source
    # full-row mode returns surviving input rows
    full = select_token_budget_grouped(
        docs, {"src1": 10**9, "src2": 300}, score, group_col="source"
    )
    assert full.count() == len(out) and "text" in full.columns


def test_chunk_documents_semantics(spark):
    from thundercats_spark.operators.curation import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(10))),  # 10 tokens
            (2, "a b c"),                               # shorter than one chunk
            (3, ""),                                    # empty -> no chunks
            (4, "   "),                                 # whitespace-only -> none
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, chunk_tokens=4, overlap=2)
    rows = {
        (r["doc_id"], r["chunk_id"]): (r["chunk_text"], r["chunk_n_tokens"])
        for r in out.collect()
    }
    # doc 1: starts 0,2,4,6 (stride 2) — windows stop once the end is
    # covered, so no redundant trailing window at 8
    assert rows[(1, 0)] == ("t0 t1 t2 t3", 4)
    assert rows[(1, 1)] == ("t2 t3 t4 t5", 4)
    assert rows[(1, 3)] == ("t6 t7 t8 t9", 4)
    assert rows[(2, 0)] == ("a b c", 3)
    assert {k[0] for k in rows} == {1, 2}  # empty docs emit nothing
    assert len([k for k in rows if k[0] == 1]) == 4
    # a length not landing on the stride leaves a SHORT final window
    nine = spark.createDataFrame(
        [(9, " ".join(f"t{i}" for i in range(9)))], "doc_id long, text string"
    )
    short = {
        r["chunk_id"]: (r["chunk_text"], r["chunk_n_tokens"])
        for r in chunk_documents(nine, 4, overlap=2).collect()
    }
    assert short[3] == ("t6 t7 t8", 3)
    # no overlap case: exact partition of the token stream
    flat = (
        chunk_documents(docs.where(F.col("doc_id") == 1), 4, overlap=0)
        .orderBy("chunk_id")
        .collect()
    )
    assert " ".join(r["chunk_text"] for r in flat) == " ".join(
        f"t{i}" for i in range(10)
    )
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, 4, overlap=4)
    with pytest.raises(ValueError, match="chunk_tokens"):
        chunk_documents(docs, 0)


def test_chunk_documents_no_shuffle(spark, sf_dir):
    """Chunking is a narrow map: the physical plan must contain no
    exchange at all."""
    from thundercats_spark.operators.curation import chunk_documents

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        chunk_documents(docs, 64, overlap=16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_select_token_budget_grouped_recursion_guard(spark, sf_dir):
    """Oversized per-group boundary buckets are re-bucketed recursively
    rather than window-sorted; output must equal the default plan
    (and therefore the naive per-group cumsum pinned above)."""
    import pyspark.sql.functions as F

    from thundercats_spark.operators.curation import select_token_budget_grouped

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    budget, score = 700, F.col("n_chars").cast("double")
    base = {
        (r["source"], r["doc_id"], r["n_tokens"])
        for r in select_token_budget_grouped(
            docs, budget, score, group_col="source", ids_only=True
        ).collect()
    }
    recursed = {
        (r["source"], r["doc_id"], r["n_tokens"])
        for r in select_token_budget_grouped(
            docs, budget, score, group_col="source", ids_only=True,
            n_buckets=4, max_exact_rows=2,
        ).collect()
    }
    assert recursed == base and base


def test_token_budget_null_rows_excluded(spark):
    """A null score or null text/token count is unrankable: the row is
    excluded from selection (it can't compete for budget) instead of
    landing in an arbitrary bucket or NULLing the driver's per-bucket
    sums. Null text also emits no chunks."""
    import pyspark.sql.functions as F

    from thundercats_spark.operators.curation import (
        chunk_documents,
        select_token_budget,
        select_token_budget_grouped,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d", 4.0), (2, None, 3.0), (3, "e f", None), (4, "g h i", 2.0)],
        "doc_id long, text string, score double",
    )
    got = sorted(
        r["doc_id"]
        for r in select_token_budget(
            docs, 100, F.col("score"), ids_only=True
        ).collect()
    )
    assert got == [1, 4]
    gotg = sorted(
        r["doc_id"]
        for r in select_token_budget_grouped(
            docs.withColumn("src", F.lit("s")), 100, F.col("score"),
            group_col="src", ids_only=True,
        ).collect()
    )
    assert gotg == [1, 4]
    chunks = {r["doc_id"] for r in chunk_documents(docs, 2).collect()}
    assert chunks == {1, 3, 4}  # null text emits nothing


def test_repeat_corpus_factors(spark):
    from thundercats_spark.operators.curation import repeat_corpus

    docs = spark.createDataFrame(
        [(i, f"s{i % 3}", f"doc {i}") for i in range(300)],
        "doc_id long, source string, text string",
    )
    out = repeat_corpus(docs, {"s0": 3.0, "s1": 1.5, "s2": 0.0})
    rows = out.groupBy("source").count().collect()
    counts = {r["source"]: r["count"] for r in rows}
    assert counts["s0"] == 300  # exactly 3 epochs of 100 docs
    assert "s2" not in counts  # factor 0 drops the source
    assert 100 < counts["s1"] < 200  # 1 full + ~half an extra epoch
    # each doc's copy count is n or 0; epochs are 0..n-1 contiguous
    per_doc = {}
    for r in out.select("doc_id", "epoch").collect():
        per_doc.setdefault(r["doc_id"], []).append(r["epoch"])
    assert all(sorted(v) == list(range(len(v))) for v in per_doc.values())
    # deterministic: same selection on a repartitioned input
    again = repeat_corpus(docs.repartition(7), {"s0": 3.0, "s1": 1.5, "s2": 0.0})
    assert {
        (r["doc_id"], r["epoch"]) for r in again.select("doc_id", "epoch").collect()
    } == {(r["doc_id"], r["epoch"]) for r in out.select("doc_id", "epoch").collect()}
    # scalar factor applies to every source; empty dict is an error
    n_all = repeat_corpus(docs, 2.0).count()
    assert n_all == 600
    with pytest.raises(ValueError, match="factors"):
        repeat_corpus(docs, {})
    # plan stays narrow: no exchange
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_corpus_drift_report(spark):
    from thundercats_spark.operators.curation import corpus_drift

    a = spark.createDataFrame(
        [(1, "s0", "w1 w2"), (2, "s0", "w1"), (3, "s1", "w1 w2 w3")],
        "doc_id long, source string, text string",
    )
    b = spark.createDataFrame(
        [(4, "s0", "w1 w2 w3 w4"), (5, "s2", "w1")],
        "doc_id long, source string, text string",
    )
    rows = {r["source"]: r for r in corpus_drift(a, b).collect()}
    assert rows["s0"]["n_docs_a"] == 2 and rows["s0"]["n_docs_b"] == 1
    assert rows["s0"]["n_tokens_a"] == 3 and rows["s0"]["n_tokens_b"] == 4
    # vanished source: full-magnitude negative delta
    assert rows["s1"]["n_docs_b"] == 0 and rows["s1"]["frac_b"] == 0.0
    assert abs(rows["s1"]["frac_delta"] + 1 / 3) < 1e-15
    # appeared source: full-magnitude positive delta
    assert rows["s2"]["n_docs_a"] == 0 and rows["s2"]["frac_delta"] == 0.5
    # fractions in each snapshot sum to 1
    assert abs(sum(r["frac_a"] for r in rows.values()) - 1.0) < 1e-12
    assert abs(sum(r["frac_b"] for r in rows.values()) - 1.0) < 1e-12


def test_materialize_packed_sequences(spark):
    """The materialized sequences must realize pack_sequences'
    concat-and-chunk policy exactly: per group, docs concatenate in id
    order and slice every `budget` tokens; all sequences are full
    except each group's last; tokens are conserved in order."""
    import pyspark.sql.functions as F

    from thundercats_spark.functions.text_analysis import token_ids
    from thundercats_spark.operators.curation import materialize_packed_sequences

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}_{j}" for j in range(7 + i % 5))) for i in range(40)],
        "doc_id long, text string",
    )
    out = materialize_packed_sequences(
        docs, budget=16, n_groups=1, vocab_size=1024
    ).collect()
    seqs = {r["pack_seq"]: list(r["ids"]) for r in out}
    # reference: concatenate all docs in id order, slice every 16
    flat = []
    for r in docs.select(
        "doc_id", token_ids(F.col("text"), 1024).alias("ids")
    ).orderBy("doc_id").collect():
        flat.extend(r["ids"])
    want = {
        s: flat[s * 16 : (s + 1) * 16] for s in range((len(flat) + 15) // 16)
    }
    assert seqs == want
    # every sequence full except the last
    lens = [r["n_tokens"] for r in sorted(out, key=lambda r: r["pack_seq"])]
    assert all(n == 16 for n in lens[:-1]) and 0 < lens[-1] <= 16
    # multi-group: token totals conserved, per-seq budget bound holds
    out4 = materialize_packed_sequences(docs, budget=16, n_groups=4).collect()
    assert sum(r["n_tokens"] for r in out4) == len(flat)
    assert all(r["n_tokens"] <= 16 for r in out4)


# --------------------------------------------------------------------------
# snapshot integrity: manifest + diff
# --------------------------------------------------------------------------


def test_corpus_manifest_is_order_and_partition_independent(spark, sf_dir):
    from thundercats_spark.operators.curation import corpus_manifest

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = [tuple(r) for r in corpus_manifest(d).collect()]
    shuffled = [
        tuple(r)
        for r in corpus_manifest(
            d.repartition(17).sortWithinPartitions(F.desc("doc_id"))
        ).collect()
    ]
    assert base == shuffled
    # and any content change flips the checksum for exactly that source
    tweaked = d.withColumn(
        "text",
        F.when(F.col("doc_id") == 3, F.concat(F.col("text"), F.lit("!"))).otherwise(
            F.col("text")
        ),
    )
    src3 = d.where(F.col("doc_id") == 3).first()["source"]
    after = {r["source"]: r["content_xor"] for r in corpus_manifest(tweaked).collect()}
    before = {r["source"]: r["content_xor"] for r in corpus_manifest(d).collect()}
    assert after[src3] != before[src3]
    assert all(after[s] == before[s] for s in before if s != src3)


def test_corpus_diff_categories(spark):
    from thundercats_spark.operators.curation import corpus_diff

    a = spark.createDataFrame(
        [(1, "same"), (2, "will change"), (3, "gone")], "doc_id long, text string"
    )
    b = spark.createDataFrame(
        [(1, "same"), (2, "did change"), (4, "new")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r["status"] for r in corpus_diff(a, b).collect()}
    assert rows == {2: "changed", 3: "removed", 4: "added"}  # 1 (unchanged) excluded


def test_sample_to_fractions_clamps_tiny_positive_fraction(spark):
    """A positive keep-fraction below 1/buckets must keep ~1/buckets of
    the source, not silently drop it — regression for the floor-to-zero
    threshold under extreme source skew."""
    from thundercats_spark.operators.curation import sample_to_fractions

    df = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), F.lit("big").alias("source")
    )
    out = sample_to_fractions(
        df, {"big": 1e-6, "absent": 0.5}, buckets=1000
    )
    n = out.count()
    # threshold clamps to 1 of 1000 buckets -> ~2 of 2000 rows survive
    assert 0 < n < 50
    # exact zero still means drop
    assert sample_to_fractions(df, {"big": 0.0}, buckets=1000).count() == 0


def test_decontamination_report_per_item_counts(spark):
    """Per-benchmark-item leakage QA: exact doc/gram hit counts per
    eval item, zero rows for clean items, min_hits raising the bar."""
    from thundercats_spark.operators.curation import decontamination_report

    bench = spark.createDataFrame(
        [
            (100, "alpha beta gamma delta epsilon zeta eta theta"),
            (101, "one two three four five six seven eight nine"),
            (102, "clean item with completely unshared benchmark tokens x y"),
        ],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # hits item 100's single 8-gram
            (1, "alpha beta gamma delta epsilon zeta eta theta iota"),
            # also hits item 100 (same 8-gram), so 100 has 2 docs
            (2, "pad alpha beta gamma delta epsilon zeta eta theta"),
            # hits item 101's both 8-grams
            (3, "one two three four five six seven eight nine ten"),
            (4, "totally different words with no overlap at all here"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_docs_hit"], r["n_shared_grams"])
        for r in decontamination_report(corpus, bench, n=8).collect()
    }
    assert out[100] == (2, 1)   # one shared 8-gram, found in two docs
    assert out[101] == (1, 2)   # both of its 8-grams in one doc
    assert out[102] == (0, 0)   # clean item still reported
    # raising min_hits drops item 100's single-gram matches
    strict = {
        r["doc_id"]: r["n_docs_hit"]
        for r in decontamination_report(corpus, bench, n=8, min_hits=2).collect()
    }
    assert strict[100] == 0 and strict[101] == 1


def test_packing_efficiency_report_hand_computed(spark):
    from thundercats_spark.operators.curation import packing_efficiency_report

    # token counts 5, 5, 12 at L=4: full chunks 1+1+3=5, remainders
    # 1, 1, 0 -> remainder_tokens 2, n_remainders 2
    docs = spark.createDataFrame(
        [(1, "a a a a a"), (2, "b b b b b"), (3, " ".join("c" * 1 for _ in range(12)))],
        "doc_id long, text string",
    )
    r = {
        row["seq_len"]: row
        for row in packing_efficiency_report(docs, seq_lens=[4, 100]).collect()
    }
    at4 = r[4]
    assert at4["n_docs"] == 3 and at4["total_tokens"] == 22
    assert at4["full_chunks"] == 5 and at4["remainder_tokens"] == 2
    assert at4["n_remainders"] == 2
    assert at4["min_seqs"] == 6  # 5 full + ceil(2/4)=1
    assert at4["max_seqs"] == 7  # 5 full + 2 unpacked remainders
    assert at4["min_padding_frac"] == round(1 - 22 / (6 * 4), 6)
    assert at4["max_padding_frac"] == round(1 - 22 / (7 * 4), 6)
    # L=100: everything is remainder; perfect packing needs 1 seq
    at100 = r[100]
    assert at100["full_chunks"] == 0 and at100["min_seqs"] == 1
    assert at100["max_seqs"] == 3

    with pytest.raises(ValueError, match="non-empty"):
        packing_efficiency_report(docs, seq_lens=[])
    with pytest.raises(ValueError, match="positive"):
        packing_efficiency_report(docs, seq_lens=[0])


def test_assign_balanced_shards_equal_weights(spark):
    from thundercats_spark.operators.curation import assign_balanced_shards

    df = spark.createDataFrame([(i, 1) for i in range(80)], "doc_id long, w int")
    out = assign_balanced_shards(df, 8, "w").collect()
    sizes = {}
    for r in out:
        sizes[r["shard"]] = sizes.get(r["shard"], 0) + 1
    # unit weights, k | n -> perfectly equal shards
    assert sizes == {i: 10 for i in range(8)}
    # deterministic across invocations
    again = {
        r["doc_id"]: r["shard"]
        for r in assign_balanced_shards(df, 8, "w").collect()
    }
    assert again == {r["doc_id"]: r["shard"] for r in out}


def test_assign_balanced_shards_mass_balance_and_bounds(spark):
    from thundercats_spark.operators.curation import assign_balanced_shards

    # skewed weights incl. zeros and one giant
    rows = [(i, (i * 13) % 29) for i in range(300)] + [(1000, 500)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    out = assign_balanced_shards(df, 4, "w").collect()
    total = sum(w for _, w in rows)
    mass = {}
    for r in out:
        assert 0 <= r["shard"] < 4
        mass[r["shard"]] = mass.get(r["shard"], 0) + r["w"]
    assert len(out) == len(rows)
    ideal = total / 4
    maxw = 500
    # each contiguous cut deviates from ideal by < max row weight
    assert all(abs(m - ideal) < maxw + 1 for m in mass.values()), mass
    # all-zero weights: everything lands in shard 0, no div-by-zero
    z = spark.createDataFrame([(1, 0), (2, 0)], "doc_id long, w long")
    zo = assign_balanced_shards(z, 4, "w").collect()
    assert all(r["shard"] == 0 for r in zo)

    with pytest.raises(ValueError, match="positive"):
        assign_balanced_shards(df, 0, "w")


def test_assign_balanced_shards_rejects_bad_weights(spark):
    from thundercats_spark.operators.curation import assign_balanced_shards

    frac = spark.createDataFrame([(1, 0.9), (2, 0.8)], "doc_id long, w double")
    with pytest.raises(ValueError, match="integral"):
        assign_balanced_shards(frac, 4, "w")
    neg = spark.createDataFrame([(1, 5), (2, -3)], "doc_id long, w long")
    with pytest.raises(ValueError, match="negative"):
        assign_balanced_shards(neg, 4, "w")


def test_assign_balanced_shards_rejects_column_collisions(spark):
    """ADVICE r06: a caller frame already holding a helper name
    (__ord/__w/__cum/__tot) or the out_col must raise loudly — the
    staging withColumns would silently replace it and the final drop
    would delete the caller's data."""
    from thundercats_spark.operators.curation import assign_balanced_shards

    base = [(1, 5, "x"), (2, 3, "y")]
    for bad in ("__ord", "__w", "__cum", "__tot", "shard"):
        df = spark.createDataFrame(base, f"doc_id long, w long, `{bad}` string")
        with pytest.raises(ValueError, match="already exist"):
            assign_balanced_shards(df, 4, "w")
    # a custom out_col colliding with a real column raises too
    df = spark.createDataFrame(base, "doc_id long, w long, bucket string")
    with pytest.raises(ValueError, match="already exist"):
        assign_balanced_shards(df, 4, "w", out_col="bucket")


def test_materialize_packed_sequences_long_docs_span_many_sequences(spark):
    """r11 piece-based assembly: a doc longer than 2x the budget
    contributes full middle pieces — exact equality with the
    concat-and-chunk reference must hold when one doc spans 4+
    sequences and when a piece starts mid-sequence."""
    import pyspark.sql.functions as F

    from thundercats_spark.functions.text_analysis import token_ids
    from thundercats_spark.operators.curation import materialize_packed_sequences

    # token counts 3, 70, 5, 40, 1: doc 1 spans >4 sequences of 16
    sizes = [3, 70, 5, 40, 1]
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}_{j}" for j in range(sz)))
         for i, sz in enumerate(sizes)],
        "doc_id long, text string",
    )
    out = materialize_packed_sequences(
        docs, budget=16, n_groups=1, vocab_size=512
    ).collect()
    seqs = {r["pack_seq"]: list(r["ids"]) for r in out}
    flat = []
    for r in docs.select(
        "doc_id", token_ids(F.col("text"), 512).alias("ids")
    ).orderBy("doc_id").collect():
        flat.extend(r["ids"])
    want = {
        s: flat[s * 16 : (s + 1) * 16] for s in range((len(flat) + 15) // 16)
    }
    assert seqs == want
