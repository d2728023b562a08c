"""Text-analysis column functions (pure JVM expressions)."""

import pyspark.sql.functions as F

from thundercats_spark.functions import text_analysis as T


def _one(spark, text, col):
    return spark.createDataFrame([(text,)], "t string").select(col.alias("o")).first()["o"]


def test_token_count(spark):
    assert _one(spark, "a b  c", T.token_count(F.col("t"))) == 3
    assert _one(spark, "  ", T.token_count(F.col("t"))) == 0
    assert _one(spark, "one", T.token_count(F.col("t"))) == 1


def test_bpe_estimate_monotone(spark):
    short = _one(spark, "hi", T.bpe_token_estimate(F.col("t")))
    long = _one(spark, "internationalization considerations", T.bpe_token_estimate(F.col("t")))
    assert long > short >= 1


def test_stopword_ratio(spark):
    assert _one(spark, "the cat", T.stopword_ratio(F.col("t"))) == 0.5
    assert _one(spark, "", T.stopword_ratio(F.col("t"))) == 0.0


def test_punct_alpha_ratio(spark):
    assert _one(spark, "ab!!", T.punct_ratio(F.col("t"))) == 0.5
    assert _one(spark, "ab12", T.alpha_ratio(F.col("t"))) == 0.5


def test_quality_score_bounds(spark):
    for text in ["", "the a of and", "x" * 1000, "!!!???"]:
        q = _one(spark, text, T.quality_score(F.col("t")))
        assert 0.0 <= q <= 1.0, (text, q)


def test_lang_id(spark):
    assert _one(spark, "the cat sat of the mat", T.lang_id(F.col("t"))) == "en"
    assert _one(spark, "der hund ist nicht da und", T.lang_id(F.col("t"))) == "de"
    assert _one(spark, "el perro es la casa que", T.lang_id(F.col("t"))) == "es"
    assert _one(spark, "le chien est dans les pour", T.lang_id(F.col("t"))) == "fr"
    assert _one(spark, "这是中文文本", T.lang_id(F.col("t"))) == "zh"
    assert _one(spark, "zzz qqq www", T.lang_id(F.col("t"))) == "und"


def test_fingerprints(spark):
    a = _one(spark, "hello world", T.doc_fingerprint(F.col("t")))
    b = _one(spark, "  HELLO WORLD ", T.doc_fingerprint(F.col("t")))
    c = _one(spark, "hello worlds", T.doc_fingerprint(F.col("t")))
    assert a == b != c


def test_fingerprint_poly_matches_python(spark):
    text = "spark"
    expected = 0
    for ch in text:
        expected = (expected * 31 + ord(ch)) % 2147483647
    assert _one(spark, text, T.doc_fingerprint_poly(F.col("t"))) == expected


def test_pii_counts_and_scrub(spark):
    text = "mail me at foo.bar+1@example.com or see https://ex.io/x?q=1 call +1 (555) 123-4567 ok"
    counts = {k: _one(spark, text, c) for k, c in T.pii_counts(F.col("t")).items()}
    assert counts == {"email": 1, "url": 1, "phone": 1}
    clean = _one(spark, text, T.pii_scrub(F.col("t")))
    assert "<EMAIL>" in clean and "<URL>" in clean and "<PHONE>" in clean
    assert "example.com" not in clean and "555" not in clean
    # clean text is a fixpoint: scrubbing again changes nothing
    assert _one(spark, clean, T.pii_scrub(F.col("t"))) == clean


def test_word_ngram_hashes_tracks_string_grams(spark):
    # r11: decontamination hashes token-hash slices instead of building
    # n-gram strings. Equal grams must map to equal hashes and distinct
    # grams to distinct hashes (on this corpus), so every consumer that
    # only compares hashes is unchanged; null/short/empty text edge
    # behavior must match word_ngrams exactly.
    import pyspark.sql.functions as F

    from thundercats_spark.functions import text_analysis as T

    df = spark.createDataFrame(
        [("a b c d e",), ("a b a b a b",), ("a b",), ("",), (None,),
         ("  x y z  ",)],
        "t string",
    )
    rows = df.select(
        F.array_distinct(T.word_ngrams(F.col("t"), 3)).alias("s"),
        F.array_distinct(T.word_ngram_hashes(F.col("t"), 3)).alias("h"),
    ).collect()
    for r in rows:
        if r["s"] is None:
            assert r["h"] is None
        else:
            # same distinct-gram cardinality == equal-iff-equal hashing
            assert len(r["s"]) == len(r["h"])
    # cross-row consistency: the same gram text hashes identically in
    # different rows (the decontamination join's correctness condition)
    two = spark.createDataFrame(
        [("q w e r t",), ("z z q w e",)], "t string"
    ).select(F.explode(T.word_ngram_hashes(F.col("t"), 3)).alias("h"))
    vals = [r["h"] for r in two.collect()]
    # "q w e" appears in both rows -> exactly one shared hash value
    assert len(vals) == 6 and len(set(vals)) == 5
