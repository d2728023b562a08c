"""Repeated-span detection (operators/spans.py): exact semantics on a
hand-built corpus, short-doc exclusion, and hash-vs-text agreement."""

from pyspark.sql import functions as F

from thundercats_spark.operators.spans import (
    repeated_spans,
    span_dup_fraction,
    span_hash_stream,
)

# Ten shared words embedded in two otherwise-different documents, a
# third document repeating the block twice, and one unique document.
BLOCK = "one two three four five six seven eight nine ten"


def _corpus(spark):
    rows = [
        (1, f"alpha {BLOCK} beta"),
        (2, f"gamma delta {BLOCK}"),
        (3, f"{BLOCK} epsilon {BLOCK}"),
        (4, "eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"),
        (5, "too short to have spans"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_repeated_spans_exact(spark):
    out = repeated_spans(_corpus(spark), span_words=10, min_docs=2, top_k=None)
    rows = {r["span"]: (r["n_docs"], r["n_occ"]) for r in out.collect()}
    # The shared block appears in docs 1,2,3 — doc 3 twice → 4 occurrences.
    assert rows[BLOCK] == (3, 4)
    # Every reported span must genuinely be in >= 2 docs.
    assert all(nd >= 2 for nd, _ in rows.values())
    # Shifted spans overlapping the block only co-occur where context
    # matches; "alpha one ... nine" exists in doc 1 only → absent.
    assert f"alpha {BLOCK.rsplit(' ', 1)[0]}" not in rows


def test_span_dup_fraction_exact(spark):
    out = span_dup_fraction(_corpus(spark), span_words=10, min_docs=2)
    rows = {r["doc_id"]: r for r in out.collect()}
    # doc 5 (< 10 words) contributes no spans at all
    assert 5 not in rows
    # doc 4 has exactly one span, unique → fraction 0
    assert rows[4]["n_spans"] == 1 and rows[4]["dup_frac"] == 0.0
    # doc 1: words = alpha + 10 + beta = 12 → 3 spans; only the pure
    # block span is shared (docs 2/3 lack the alpha/beta context)
    assert rows[1]["n_spans"] == 3 and rows[1]["n_dup"] == 1
    assert abs(rows[1]["dup_frac"] - 1 / 3) < 1e-12
    # doc 3: 21 words → 12 spans; the block occurs at 2 positions and
    # every other span straddles "epsilon" → 2 duplicated positions
    assert rows[3]["n_spans"] == 12 and rows[3]["n_dup"] == 2


def test_hash_stream_matches_text_spans(spark, sf_dir):
    """The 8-byte phase-1 stream must be a bijection of the text spans
    (per position) on real data — same total count and same per-doc
    counts as a direct text enumeration."""
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    hashed = span_hash_stream(df, "text", "doc_id", span_words=10)
    words = F.split(F.trim(F.col("text")), r"\s+")
    direct = (
        df.select(F.col("doc_id").alias("id"), words.alias("__w"))
        .where(F.size("__w") >= 10)
        .select(
            "id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(__w) - 9), "
                    "i -> array_join(slice(__w, i, 10), ' '))"
                )
            ).alias("span"),
        )
    )
    got = {r["id"]: r["n"] for r in hashed.groupBy("id").agg(F.count("*").alias("n")).collect()}
    want = {r["id"]: r["n"] for r in direct.groupBy("id").agg(F.count("*").alias("n")).collect()}
    assert got == want and sum(got.values()) > 0
    # distinct hashes == distinct spans (no collisions on this corpus)
    assert (
        hashed.select("span_h").distinct().count()
        == direct.select("span").distinct().count()
    )


def test_epoch_shuffle_key_override(spark):
    from thundercats_spark.operators.curation import epoch_shuffle

    df = spark.range(100).withColumnRenamed("id", "doc_id")
    key = F.md5(F.col("doc_id").cast("string"))
    a = [r["doc_id"] for r in epoch_shuffle(df, 0, key=key, n_partitions=4).collect()]
    b = [r["doc_id"] for r in epoch_shuffle(df.repartition(7), 0, key=key, n_partitions=4).collect()]
    assert a == b and a != sorted(a)


def test_remove_repeated_spans_exact(spark):
    from thundercats_spark.operators.spans import remove_repeated_spans

    out = remove_repeated_spans(_corpus(spark), span_words=10, min_docs=2)
    rows = {r["doc_id"]: r for r in out.collect()}
    # canonical occurrence is doc 1 (smallest (doc, pos)) → untouched
    assert rows[1]["clean_text"] == f"alpha {BLOCK} beta"
    assert rows[1]["n_removed"] == 0
    # doc 2 loses the block (positions 3..12), keeps its prefix
    assert rows[2]["clean_text"] == "gamma delta"
    assert rows[2]["n_removed"] == 10
    # doc 3 loses both occurrences, keeping only the middle word
    assert rows[3]["clean_text"] == "epsilon"
    assert rows[3]["n_removed"] == 20
    # unique and too-short docs pass through whole
    assert rows[4]["n_removed"] == 0 and rows[5]["n_removed"] == 0
    assert rows[5]["clean_text"] == "too short to have spans"


def test_canonical_occurrence_survives_overlapping_removals(spark):
    """Regression: removing span X's non-canonical occurrence must not
    delete the canonical occurrence of an overlapping span Y — without
    protection, 'c d' would survive in NO document here."""
    from thundercats_spark.operators.spans import remove_repeated_spans

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "b c d"), (3, "c d e")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["clean_text"]
        for r in remove_repeated_spans(df, span_words=2, min_docs=2).collect()
    }
    assert out[1] == "a b c"  # canonical 'b c' untouched
    assert out[2] == "c d"    # canonical 'c d' protected; 'b c' copy cut
    assert out[3] == "e"      # non-canonical 'c d' removed
    # every duplicated span survives exactly once across the corpus
    assert "b c" in out[1] and "c d" in out[2]
