"""LLM-training-data pipeline queries (SURVEY.md §2.3) over the
``documents`` and ``embeddings`` tables — dedup, similarity search, and
text analysis, each with a DuckDB oracle where SQL can express it.

Cross-engine exactness notes:
- Jaccard = int/int division → bit-identical, no rounding needed.
- Cosine = 64-element fold; error ≈ 1e-13 ≪ round(6) granularity.
- Quality/ratio scores: per-row rational arithmetic, round(6).
- MinHash/SimHash signatures use xxhash64 (Spark-specific) → those are
  rows-only checks; their CORRECTNESS oracle is the exact n-gram
  Jaccard / brute-force cosine queries, cross-checked in pytest.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from thundercats_spark.functions import text_analysis as T
from thundercats_spark.operators import dedup, similarity
from thundercats_spark.queries import load, register

# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

DEDUP_EXACT_SQL = """
WITH g AS (
  SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
  FROM documents GROUP BY lower(TRIM(text))
)
SELECT doc_id, n_copies FROM g
"""


@register("dedup_exact", DEDUP_EXACT_SQL)
def dedup_exact_q(spark, sf_dir):
    d = load(spark, sf_dir, "documents")["documents"]
    # ids_only: the query projects just (doc_id, n_copies), so skip the
    # join-back — one shuffle, one scan.
    return dedup.dedup_exact(d, "text", "doc_id", ids_only=True)


# --------------------------------------------------------------------------
# Dedup provenance: every collapsed document mapped to its surviving
# representative. The synthetic corpus has no FULL-text duplicates, so
# the registered identity is a 40-char normalized prefix (23 real
# groups at sf0.01) — exercising the custom-key lineage path a URL- or
# title-keyed production run would use. Only (id, 8-byte fp) ever
# shuffles; text stays in the scan stage.
# --------------------------------------------------------------------------

DEDUP_LINEAGE_SQL = """
WITH g AS (
  SELECT doc_id,
         MIN(doc_id) OVER (
           PARTITION BY SUBSTR(LOWER(TRIM(text)), 1, 40)) AS kept_id,
         COUNT(*) OVER (
           PARTITION BY SUBSTR(LOWER(TRIM(text)), 1, 40)) AS group_size
  FROM documents
)
SELECT doc_id, kept_id, group_size FROM g WHERE group_size >= 2
"""


@register("corpus_dedup_lineage", DEDUP_LINEAGE_SQL)
def corpus_dedup_lineage_q(spark, sf_dir):
    d = load(spark, sf_dir, "documents")["documents"]
    prefix_key = F.substring(F.lower(F.trim(F.col("text"))), 1, 40)
    return dedup.dedup_lineage(
        d, "text", "doc_id", dups_only=True, key=prefix_key
    )


# --------------------------------------------------------------------------
# exact n-gram Jaccard near-dup pairs (inverted index)
# --------------------------------------------------------------------------

NGRAM_JACCARD_SQL = r"""
WITH sh AS (
  SELECT doc_id,
         list_transform(
           list_distinct([array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks)-1)]),
           s -> hash(s)
         ) AS shingles
  FROM (SELECT doc_id, regexp_split_to_array(TRIM(text), '\s+') AS toks FROM documents)
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       len(list_intersect(a.shingles, b.shingles)) * 1.0 /
       (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))) AS jaccard
FROM sh a JOIN sh b
  ON a.doc_id < b.doc_id
 AND 2 * least(len(a.shingles), len(b.shingles)) >= greatest(len(a.shingles), len(b.shingles))
WHERE len(list_intersect(a.shingles, b.shingles)) * 1.0 /
      (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))) >= 0.5
"""


@register("ngram_jaccard_pairs", NGRAM_JACCARD_SQL)
def ngram_jaccard_q(spark, sf_dir):
    d = load(spark, sf_dir, "documents")["documents"]
    return dedup.ngram_jaccard_pairs(d, "text", "doc_id", n=3, threshold=0.5)


# --------------------------------------------------------------------------
# MinHash-LSH near-dup pairs — rows-only (xxhash64 not in DuckDB);
# recall vs the exact query is pytest-verified.
# --------------------------------------------------------------------------


@register("dedup_minhash_lsh", None)
def dedup_minhash_q(spark, sf_dir):
    d = load(spark, sf_dir, "documents")["documents"]
    return dedup.minhash_lsh_pairs(d, "text", "doc_id", threshold=0.5).orderBy(
        "id_a", "id_b"
    )


@register("dedup_simhash", None)
def dedup_simhash_q(spark, sf_dir):
    d = load(spark, sf_dir, "documents")["documents"]
    return dedup.simhash_pairs(d, "text", "doc_id", max_hamming=3).orderBy("id_a", "id_b")


# --------------------------------------------------------------------------
# embedding near-dup pairs + ANN top-k
# --------------------------------------------------------------------------

EMB_PAIRS_SQL = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(
         list_reduce(list_transform(list_zip(a.embedding, b.embedding),
                                    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)),
                     (x, y) -> x + y)
         / (sqrt(list_reduce(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x,y) -> x+y))
          * sqrt(list_reduce(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x,y) -> x+y))),
         6) AS cos
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE ROUND(
         list_reduce(list_transform(list_zip(a.embedding, b.embedding),
                                    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)),
                     (x, y) -> x + y)
         / (sqrt(list_reduce(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x,y) -> x+y))
          * sqrt(list_reduce(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x,y) -> x+y))),
         6) >= 0.45
"""


@register("dedup_embedding_cosine", EMB_PAIRS_SQL)
def dedup_embedding_cosine_q(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")["embeddings"]
    return similarity.cosine_pairs_bruteforce(e, threshold=0.45)


ANN_TOPK_SQL = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id,
       ROUND(
         list_reduce(list_transform(list_zip(e.embedding, q.qv),
                                    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)),
                     (x, y) -> x + y)
         / (sqrt(list_reduce(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x,y) -> x+y))
          * sqrt(list_reduce(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x,y) -> x+y))),
         6) AS cos
FROM embeddings e, q
WHERE e.vec_id <> 0
ORDER BY cos DESC, e.vec_id
LIMIT 10
"""


@register("ann_bruteforce_topk", ANN_TOPK_SQL)
def ann_topk_q(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")["embeddings"]
    qv = [float(x) for x in e.where(F.col("vec_id") == 0).select("embedding").first()[0]]
    return similarity.ann_topk_bruteforce(
        e.where(F.col("vec_id") != 0), qv, k=10
    )


@register("ann_lsh_topk", None)
def ann_lsh_topk_q(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")["embeddings"]
    qv = [float(x) for x in e.where(F.col("vec_id") == 0).select("embedding").first()[0]]
    return similarity.ann_topk_lsh(e.where(F.col("vec_id") != 0), qv, k=10)


@register("ann_ivf_topk", None)
def ann_ivf_topk_q(spark, sf_dir):
    """IVF coarse-quantizer ANN: Lloyd-trained centroids, nprobe-cell
    probe, exact rerank (rows-only check; recall is pytest-gated)."""
    e = load(spark, sf_dir, "embeddings")["embeddings"]
    qv = [float(x) for x in e.where(F.col("vec_id") == 0).select("embedding").first()[0]]
    return similarity.ann_topk_ivf(
        e.where(F.col("vec_id") != 0), qv, k=10, n_clusters=8, nprobe=3
    )


def _cached_index_dir(
    kind: str,
    sf_dir: str,
    table: str = "embeddings",
    recipe: str = "exclude-vec0",
) -> tuple[str, bool]:
    """Deterministic per-(sf_dir, kind) index location under the system
    temp dir, so repeated driver/pytest invocations reuse one build
    instead of littering fresh mkdtemp dirs and re-charging index
    construction to a query meant to showcase the cheap pruned probe.
    The build is fully seeded, so any run reproduces the same index.
    "Built" = the meta file's _SUCCESS marker exists (the meta is the
    LAST artifact each builder writes). ``table``/``recipe`` identify
    the source table fingerprinted into the tag and the build
    parameters (the ANN indexes build from embeddings minus vec 0; the
    BPE artifact builds from documents)."""
    import glob
    import hashlib
    import os
    import tempfile

    # Tag = sf_dir + a fingerprint of the source parquet files
    # (name/size/mtime) + the build recipe: regenerated data or a
    # changed build filter gets a FRESH cache dir instead of silently
    # probing a stale index built from old rows.
    files = sorted(glob.glob(os.path.join(sf_dir, f"{table}.parquet", "*")))
    stamp = [(os.path.basename(f), os.path.getsize(f), int(os.path.getmtime(f)))
             for f in files]
    tag = hashlib.md5(
        f"{sf_dir.rstrip('/')}|{recipe}|{stamp}".encode()
    ).hexdigest()[:12]
    idx = os.path.join(tempfile.gettempdir(), f"tc_idx_cache_{tag}", kind)
    built = os.path.exists(os.path.join(idx + "_meta", "_SUCCESS"))
    return idx, built


def _publish_index(idx: str, build_fn) -> None:
    """Build into a per-process dir, then atomically rename into the
    shared cache slot — two processes racing the build can't interleave
    writes into one directory; the loser discards its copy and uses the
    winner's. The meta dir (with _SUCCESS, the 'built' marker) is
    renamed LAST, preserving the marker-is-final invariant."""
    import glob as _glob
    import os
    import shutil

    tmp = f"{idx}.b{os.getpid()}"
    os.makedirs(os.path.dirname(idx), exist_ok=True)
    build_fn(tmp)
    # move every artifact the builder wrote (index dir + any siblings
    # like _centroids), the _meta dir (the 'built' marker) LAST
    siblings = sorted(
        p for p in _glob.glob(tmp + "*") if not p.endswith("_meta")
    ) + [tmp + "_meta"]
    for src in siblings:
        if not os.path.exists(src):
            continue
        dst = idx + src[len(tmp):]
        try:
            os.rename(src, dst)
        except OSError:
            shutil.rmtree(src, ignore_errors=True)  # lost the race


@register("ann_indexed_topk", ANN_TOPK_SQL)
def ann_indexed_topk_q(spark, sf_dir):
    """Persisted-IVF-index ANN: build the __cluster-partitioned index
    once per (sf_dir) into a deterministic cache path, probe it with a
    partition-pruned scan. Probing all cells makes it exact, so the
    brute-force oracle applies; the pruning plan (PartitionFilters,
    nprobe < n_clusters) is pytest-gated in tests/test_similarity.py."""
    e = load(spark, sf_dir, "embeddings")["embeddings"]
    qv = [float(x) for x in e.where(F.col("vec_id") == 0).select("embedding").first()[0]]
    idx, built = _cached_index_dir("ivf", sf_dir)
    if not built:
        _publish_index(
            idx,
            lambda d: similarity.ann_index_build(
                e.where(F.col("vec_id") != 0), d, n_clusters=8
            ),
        )
    return similarity.ann_topk_indexed(spark, idx, qv, k=10, nprobe=8)


@register("ann_lsh_indexed", None)
def ann_lsh_indexed_q(spark, sf_dir):
    """Persisted-LSH-index ANN: build the __sig-partitioned index once
    per (sf_dir) into a deterministic cache path, probe the multiprobe
    bucket set with a partition-pruned scan (rows-only check —
    approximate by design; identity with the per-query LSH path and the
    PartitionFilters plan are pytest-gated in tests/test_similarity.py)."""
    e = load(spark, sf_dir, "embeddings")["embeddings"]
    qv = [float(x) for x in e.where(F.col("vec_id") == 0).select("embedding").first()[0]]
    idx, built = _cached_index_dir("lsh", sf_dir)
    if not built:
        _publish_index(
            idx,
            lambda d: similarity.ann_lsh_index_build(e.where(F.col("vec_id") != 0), d),
        )
    return similarity.ann_topk_lsh_indexed(spark, idx, qv, k=10)


# --------------------------------------------------------------------------
# text analysis
# --------------------------------------------------------------------------

TOKEN_STATS_SQL = r"""
SELECT doc_id,
       CASE WHEN TRIM(text) = '' THEN 0
            ELSE len(regexp_split_to_array(TRIM(text), '\s+')) END
         AS n_tokens,
       length(text) AS n_chars_measured
FROM documents
"""


@register("text_token_stats", TOKEN_STATS_SQL)
def text_token_stats(spark, sf_dir):
    d = load(spark, sf_dir, "documents")["documents"]
    return d.select(
        "doc_id",
        T.token_count(F.col("text")).alias("n_tokens"),
        F.length("text").alias("n_chars_measured"),
    )


# quality = 0.4*len_sat + 0.3*(1-punct_ratio) + 0.3*stopword_ratio, round 6
QUALITY_SQL = r"""
WITH t AS (
  SELECT doc_id, text,
         regexp_split_to_array(TRIM(text), '\s+') AS toks,
         length(text) AS n
  FROM documents
)
SELECT doc_id,
  ROUND(
    0.4 * (LEAST(n, 500) / 500.0)
  + 0.3 * (1.0 - CASE WHEN n > 0
        THEN (n - length(regexp_replace(text, '[^\w\s]', '', 'g'))) / n
        ELSE 0.0 END)
  + 0.3 * (CASE WHEN len(toks) > 0
        THEN len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','that','it','for'))) / len(toks)
        ELSE 0.0 END),
  6) AS quality
FROM t
"""


@register("text_quality_score", QUALITY_SQL)
def text_quality_q(spark, sf_dir):
    d = load(spark, sf_dir, "documents")["documents"]
    return d.select(
        "doc_id", F.round(T.quality_score(F.col("text")), 6).alias("quality")
    )


LANG_ID_SQL = r"""
WITH t AS (
  SELECT doc_id,
         regexp_split_to_array(TRIM(text), '\s+') AS toks,
         regexp_matches(text, '[一-鿿]') AS has_cjk
  FROM documents
), s AS (
  SELECT doc_id, has_cjk,
    len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','that','it','for')))   AS s_en,
    len(list_filter(toks, x -> x IN ('der','die','das','und','ist','nicht','ein','eine','zu','mit'))) AS s_de,
    len(list_filter(toks, x -> x IN ('el','la','los','las','de','que','y','es','en','un')))     AS s_es,
    len(list_filter(toks, x -> x IN ('le','la','les','des','et','est','une','dans','que','pour'))) AS s_fr
  FROM t
)
SELECT doc_id,
  CASE WHEN has_cjk THEN 'zh'
       WHEN s_en > 0 AND s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
       WHEN s_de > 0 AND s_de >= s_es AND s_de >= s_fr THEN 'de'
       WHEN s_es > 0 AND s_es >= s_fr THEN 'es'
       WHEN s_fr > 0 THEN 'fr'
       ELSE 'und' END AS lang_pred
FROM s
"""


@register("text_lang_id", LANG_ID_SQL)
def text_lang_id_q(spark, sf_dir):
    d = load(spark, sf_dir, "documents")["documents"]
    return d.select("doc_id", T.lang_id(F.col("text")).alias("lang_pred"))


# Polynomial rolling fingerprint — engine-portable recurrence
# h = (h*31 + codepoint) mod (2^31-1); DuckDB replays it exactly.
FINGERPRINT_SQL = """
SELECT doc_id,
  list_reduce(
    list_prepend(CAST(0 AS BIGINT),
      list_transform(range(1, length(text) + 1),
                     i -> CAST(unicode(text[i]) AS BIGINT))),
    (acc, c) -> (acc * 31 + c) % 2147483647
  ) AS fingerprint
FROM documents
"""


@register("doc_fingerprint", FINGERPRINT_SQL)
def doc_fingerprint_q(spark, sf_dir):
    from thundercats_spark.operators.dedup import ensure_parallelism

    d = load(spark, sf_dir, "documents")["documents"]
    # the rolling-hash char fold is the heaviest per-row expression in
    # the registry — widen a single-file input first (per-row output,
    # partitioning-invariant; no-op on wide inputs)
    return ensure_parallelism(d.select("doc_id", "text")).select(
        "doc_id", T.doc_fingerprint_poly(F.col("text")).alias("fingerprint")
    )


# --------------------------------------------------------------------------
# End-to-end training-data pipeline: quality filter → language bucket →
# exact dedup → per-source rollup. The composition showcase — every
# stage is a pure column expression or a single-shuffle operator, so the
# whole pipeline is scan → filter (pushable) → one hash shuffle → agg.
# --------------------------------------------------------------------------

PIPELINE_SQL = r"""
WITH q AS (
  SELECT doc_id, source, text,
    0.4 * (LEAST(length(text), 500) / 500.0)
  + 0.3 * (1.0 - CASE WHEN length(text) > 0
        THEN (length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g'))) / length(text)
        ELSE 0.0 END)
  + 0.3 * (CASE WHEN len(regexp_split_to_array(TRIM(text), '\s+')) > 0
        THEN len(list_filter(regexp_split_to_array(TRIM(text), '\s+'),
                 x -> x IN ('the','a','of','and','to','in','is','that','it','for')))
             / len(regexp_split_to_array(TRIM(text), '\s+'))
        ELSE 0.0 END) AS quality
  FROM documents
), filtered AS (
  SELECT * FROM q WHERE quality >= 0.5
), dedup AS (
  SELECT MIN(doc_id) AS doc_id FROM filtered GROUP BY lower(TRIM(text))
)
SELECT f.source, COUNT(*) AS n_docs, ROUND(AVG(f.quality), 6) AS avg_quality
FROM filtered f JOIN dedup d ON f.doc_id = d.doc_id
GROUP BY f.source
ORDER BY f.source
"""


@register("llm_clean_pipeline", PIPELINE_SQL)
def llm_clean_pipeline(spark, sf_dir):
    d = load(spark, sf_dir, "documents")["documents"]
    scored = d.select(
        "doc_id", "source", "text", T.quality_score(F.col("text")).alias("quality")
    ).where(F.col("quality") >= 0.5)
    survivors = dedup.dedup_exact(scored, "text", "doc_id")
    return (
        survivors.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("quality"), 6).alias("avg_quality"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Exact transitive dedup groups: connected components over the exact
# Jaccard pair graph (iterative min-label propagation — the
# non-SQL-expressible op made verifiable via a recursive-CTE oracle).
# --------------------------------------------------------------------------

COMPONENTS_SQL = r"""
WITH RECURSIVE
sh AS (
  SELECT doc_id,
         list_transform(
           list_distinct([array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks)-1)]),
           s -> hash(s)
         ) AS shingles
  FROM (SELECT doc_id, regexp_split_to_array(TRIM(text), '\s+') AS toks FROM documents)
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sh a JOIN sh b
  ON a.doc_id < b.doc_id
 AND 2 * least(len(a.shingles), len(b.shingles)) >= greatest(len(a.shingles), len(b.shingles))
  WHERE len(list_intersect(a.shingles, b.shingles)) * 1.0 /
        (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))) >= 0.5
),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
walk(id, comp) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
  UNION
  SELECT e.a, w.comp FROM edges e JOIN walk w ON e.b = w.id
)
SELECT id, MIN(comp) AS component FROM walk GROUP BY id ORDER BY id
"""


@register("dedup_connected_groups", COMPONENTS_SQL)
def dedup_connected_groups(spark, sf_dir):
    from thundercats_spark.operators.components import connected_components

    d = load(spark, sf_dir, "documents")["documents"]
    pairs = dedup.ngram_jaccard_pairs(d, "text", "doc_id", n=3, threshold=0.5)
    return connected_components(pairs).orderBy("id")


# --------------------------------------------------------------------------
# Corpus-statistics quality: per-doc mean bigram log-probability
# --------------------------------------------------------------------------

BIGRAM_LP_SQL = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(TRIM(text), '\s+') AS t FROM documents
), bg AS (
  SELECT doc_id, unnest([t[i] || ' ' || t[i+1] FOR i IN range(1, len(t))]) AS bg
  FROM toks
  WHERE len(t) >= 2
), counts AS (
  SELECT bg, COUNT(*) AS c FROM bg GROUP BY bg
), total AS (
  SELECT SUM(c) AS t FROM counts
)
SELECT b.doc_id,
       COUNT(*) AS n_bigrams,
       ROUND(AVG(ln(c * 1.0 / t)), 6) AS avg_logprob
FROM bg b JOIN counts USING (bg), total
GROUP BY b.doc_id
"""


@register("doc_bigram_logprob", BIGRAM_LP_SQL)
def doc_bigram_logprob(spark, sf_dir):
    d = load(spark, sf_dir, "documents")["documents"]
    return dedup.corpus_bigram_logprob(d, "text", "doc_id")


REPETITION_SQL = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(TRIM(text), '\s+') AS w FROM documents
),
grams AS (
  SELECT doc_id, w,
         CASE WHEN len(w) < 2 THEN []::VARCHAR[]
              ELSE list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]) END AS bg
  FROM toks
)
SELECT doc_id,
       CASE WHEN len(w) = 0 THEN 0.0
            ELSE CAST(len(list_distinct(w)) AS DOUBLE) / len(w) END AS distinct_word_ratio,
       CASE WHEN len(bg) = 0 THEN 0.0
            ELSE CAST(len(bg) - len(list_distinct(bg)) AS DOUBLE) / len(bg) END
         AS dup_bigram_fraction
FROM grams
ORDER BY doc_id
"""


@register("doc_repetition_score", REPETITION_SQL)
def doc_repetition_score(spark, sf_dir):
    """Gopher-style repetition/diversity signals, JVM-expression-only —
    runs at scan speed with no shuffle (extends the quality family of
    reference preprocess/Text.scala)."""
    d = load(spark, sf_dir, "documents")["documents"]
    return d.select(
        "doc_id",
        T.distinct_word_ratio(F.col("text")).alias("distinct_word_ratio"),
        T.duplicate_ngram_fraction(F.col("text"), 2).alias("dup_bigram_fraction"),
    ).orderBy("doc_id")


SOURCE_MIX_SQL = """
SELECT source, COUNT(*) AS n_docs,
       CAST(COUNT(*) AS DOUBLE) / (SELECT COUNT(*) FROM documents) AS fraction
FROM documents GROUP BY source ORDER BY source
"""


@register("doc_source_mix", SOURCE_MIX_SQL)
def doc_source_mix(spark, sf_dir):
    from thundercats_spark.operators.curation import source_mix

    d = load(spark, sf_dir, "documents")["documents"]
    return source_mix(d, "source")


# --------------------------------------------------------------------------
# Benchmark decontamination: training docs sharing word 8-grams with an
# eval set (here: source 'src0' stands in as the benchmark).
# --------------------------------------------------------------------------

DECONTAMINATE_SQL = r"""
WITH toks AS (
  SELECT doc_id, source, regexp_split_to_array(TRIM(text), '\s+') AS t FROM documents
), grams AS (
  SELECT doc_id, source,
         list_distinct([array_to_string(t[i:i+7], ' ') FOR i IN range(1, len(t)-6)]) AS gs
  FROM toks WHERE len(t) >= 8
), bench AS (
  SELECT DISTINCT unnest(gs) AS g FROM grams WHERE source = 'src0'
), hits AS (
  SELECT c.doc_id, CAST(COUNT(DISTINCT c.g) AS BIGINT) AS n
  FROM (SELECT doc_id, unnest(gs) AS g FROM grams WHERE source <> 'src0') c
  JOIN bench USING (g) GROUP BY c.doc_id
)
SELECT d.doc_id, COALESCE(h.n, 0) AS n_contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
WHERE d.source <> 'src0'
ORDER BY d.doc_id
"""


@register("doc_decontaminate", DECONTAMINATE_SQL)
def doc_decontaminate_q(spark, sf_dir):
    from thundercats_spark.operators.curation import decontaminate

    d = load(spark, sf_dir, "documents")["documents"]
    bench = d.where(F.col("source") == "src0")
    corpus = d.where(F.col("source") != "src0")
    out = decontaminate(corpus, bench, "text", "doc_id", n=8)
    return out.select(
        "doc_id", F.col("n_contaminated").cast("long").alias("n_contaminated")
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# Deterministic stratified corpus split (train/val/test by md5 bucket)
# --------------------------------------------------------------------------

SPLIT_SQL = """
WITH b AS (
  SELECT source,
         ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || 'split'), 1, 6))::BIGINT % 10000 AS bk
  FROM documents
)
SELECT CASE WHEN bk < 8000 THEN 'train' WHEN bk < 9000 THEN 'val' ELSE 'test' END AS split,
       source, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM b GROUP BY 1, 2 ORDER BY split, source
"""


@register("corpus_split_stratified", SPLIT_SQL)
def corpus_split_q(spark, sf_dir):
    from thundercats_spark.operators.curation import corpus_split

    d = load(spark, sf_dir, "documents")["documents"]
    out = corpus_split(d, {"train": 0.8, "val": 0.1, "test": 0.1}, "doc_id")
    return (
        out.groupBy("split", "source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("split", "source")
    )


# --------------------------------------------------------------------------
# Fuzzy decontamination: near-dup (not just exact-n-gram) benchmark
# matches, via the EXACT cross-frame PPJoin — oracle = brute-force
# cross Jaccard in DuckDB.
# --------------------------------------------------------------------------

DECONTAM_FUZZY_SQL = r"""
WITH sh AS (
  SELECT doc_id, source,
         list_transform(
           list_distinct([array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks)-1)]),
           s -> hash(s)
         ) AS shingles
  FROM (SELECT doc_id, source, regexp_split_to_array(TRIM(text), '\s+') AS toks FROM documents)
),
j AS (
  SELECT c.doc_id,
         len(list_intersect(c.shingles, b.shingles)) * 1.0 /
         (len(c.shingles) + len(b.shingles) - len(list_intersect(c.shingles, b.shingles))) AS jac
  FROM sh c JOIN sh b
  ON c.source <> 'src0' AND b.source = 'src0'
 AND 2 * least(len(c.shingles), len(b.shingles)) >= greatest(len(c.shingles), len(b.shingles))
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bench_matches, MAX(jac) AS max_jaccard
FROM j WHERE jac >= 0.5 GROUP BY doc_id ORDER BY doc_id
"""


@register("doc_decontaminate_fuzzy", DECONTAM_FUZZY_SQL)
def doc_decontaminate_fuzzy_q(spark, sf_dir):
    from thundercats_spark.operators.curation import decontaminate_fuzzy

    d = load(spark, sf_dir, "documents")["documents"]
    bench = d.where(F.col("source") == "src0")
    corpus = d.where(F.col("source") != "src0")
    out = decontaminate_fuzzy(corpus, bench, "text", "doc_id", n=3, threshold=0.5)
    return (
        out.where(F.col("contaminated"))
        .select("doc_id", F.col("n_bench_matches").cast("long").alias("n_bench_matches"), "max_jaccard")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Leakage-safe split: near-duplicate groups co-travel — no test doc has
# a near-dup in train. Oracle = the recursive-CTE component labeling
# (as COMPONENTS_SQL) + the same md5 bucket rule on the group rep.
# --------------------------------------------------------------------------

SPLIT_LEAKAGE_SQL = r"""
WITH RECURSIVE
sh AS (
  SELECT doc_id,
         list_transform(
           list_distinct([array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks)-1)]),
           s -> hash(s)
         ) AS shingles
  FROM (SELECT doc_id, regexp_split_to_array(TRIM(text), '\s+') AS toks FROM documents)
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sh a JOIN sh b
  ON a.doc_id < b.doc_id
 AND 2 * least(len(a.shingles), len(b.shingles)) >= greatest(len(a.shingles), len(b.shingles))
  WHERE len(list_intersect(a.shingles, b.shingles)) * 1.0 /
        (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))) >= 0.5
),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
walk(id, comp) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
  UNION
  SELECT e.a, w.comp FROM edges e JOIN walk w ON e.b = w.id
),
comp AS (
  SELECT id, MIN(comp) AS component FROM walk GROUP BY id
),
rep AS (
  SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS group_rep
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
),
b AS (
  SELECT doc_id, group_rep,
         ('0x' || substring(md5(CAST(group_rep AS VARCHAR) || 'split'), 1, 6))::BIGINT % 10000 AS bk
  FROM rep
)
SELECT doc_id, CAST(group_rep AS BIGINT) AS group_rep,
       CASE WHEN bk < 8000 THEN 'train' WHEN bk < 9000 THEN 'val' ELSE 'test' END AS split
FROM b ORDER BY doc_id
"""


@register("corpus_split_leakage_safe", SPLIT_LEAKAGE_SQL)
def corpus_split_leakage_safe_q(spark, sf_dir):
    from thundercats_spark.operators.curation import corpus_split_leakage_safe

    d = load(spark, sf_dir, "documents")["documents"]
    pairs = dedup.ngram_jaccard_pairs(d, "text", "doc_id", n=3, threshold=0.5)
    out = corpus_split_leakage_safe(
        d, pairs, {"train": 0.8, "val": 0.1, "test": 0.1}, "doc_id"
    )
    return out.select(
        "doc_id", F.col("group_rep").cast("long").alias("group_rep"), "split"
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# PII scrubbing: per-kind match counts + scrubbed length (the patterns
# are engine-portable; real data would swap in stricter validators)
# --------------------------------------------------------------------------

PII_SQL = r"""
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
  CAST(len(regexp_extract_all(text, 'https?://[^\s]+')) AS BIGINT) AS n_url,
  CAST(len(regexp_extract_all(text, '\+?[0-9][0-9()\- ]{6,}[0-9]')) AS BIGINT) AS n_phone,
  length(
    regexp_replace(
      regexp_replace(
        regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        'https?://[^\s]+', '<URL>', 'g'),
      '\+?[0-9][0-9()\- ]{6,}[0-9]', '<PHONE>', 'g')
  ) AS clean_len
FROM documents ORDER BY doc_id
"""


@register("doc_pii_scrub", PII_SQL)
def doc_pii_scrub_q(spark, sf_dir):
    d = load(spark, sf_dir, "documents")["documents"]
    counts = T.pii_counts(F.col("text"))
    return d.select(
        "doc_id",
        counts["email"].cast("long").alias("n_email"),
        counts["url"].cast("long").alias("n_url"),
        counts["phone"].cast("long").alias("n_phone"),
        F.length(T.pii_scrub(F.col("text"))).alias("clean_len"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# Batch ANN: exact top-k for a set of query vectors in one job
# --------------------------------------------------------------------------

ANN_BATCH_SQL = """
WITH q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id <= 4),
d AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id > 4),
scored AS (
  SELECT q.q_id, d.vec_id,
    ROUND(
      list_reduce(list_transform(list_zip(d.embedding, q.qv),
                                 p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)),
                  (x, y) -> x + y)
      / (sqrt(list_reduce(list_transform(d.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x,y) -> x+y))
       * sqrt(list_reduce(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x,y) -> x+y))),
      6) AS cos
  FROM d CROSS JOIN q
)
SELECT q_id, vec_id, cos,
       CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS BIGINT) AS rank
FROM scored
QUALIFY rank <= 5
ORDER BY q_id, rank
"""


@register("ann_batch_topk", ANN_BATCH_SQL)
def ann_batch_topk_q(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")["embeddings"]
    qs = e.where(F.col("vec_id") <= 4).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    data = e.where(F.col("vec_id") > 4)
    out = similarity.ann_batch_topk(data, qs, k=5, q_id_col="q_id")
    return out.select(
        "q_id", "vec_id", "cos", F.col("rank").cast("long").alias("rank")
    ).orderBy("q_id", "rank")


# --------------------------------------------------------------------------
# Quality-gate funnel: survivors of each successive gate, one pass
# --------------------------------------------------------------------------

FUNNEL_SQL = r"""
WITH t AS (
  SELECT length(text) AS n, regexp_split_to_array(TRIM(text), '\s+') AS w FROM documents
), g AS (
  SELECT n, w,
         CASE WHEN len(w) < 2 THEN []::VARCHAR[]
              ELSE list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]) END AS bg
  FROM t
), flags AS (
  SELECT (n >= 100) AS g0,
         (len(w) >= 20) AS g1,
         (CASE WHEN len(w) = 0 THEN 0.0 ELSE CAST(len(list_distinct(w)) AS DOUBLE) / len(w) END >= 0.5) AS g2,
         (CASE WHEN len(bg) = 0 THEN 0.0 ELSE CAST(len(bg) - len(list_distinct(bg)) AS DOUBLE) / len(bg) END <= 0.2) AS g3
  FROM g
), agg AS (
  SELECT CAST(SUM(CASE WHEN g0 THEN 1 ELSE 0 END) AS BIGINT) AS p0,
         CAST(SUM(CASE WHEN g0 AND g1 THEN 1 ELSE 0 END) AS BIGINT) AS p1,
         CAST(SUM(CASE WHEN g0 AND g1 AND g2 THEN 1 ELSE 0 END) AS BIGINT) AS p2,
         CAST(SUM(CASE WHEN g0 AND g1 AND g2 AND g3 THEN 1 ELSE 0 END) AS BIGINT) AS p3
  FROM flags
)
SELECT CAST(0 AS BIGINT) AS stage_idx, 'min_chars' AS stage, p0 AS n_pass FROM agg
UNION ALL SELECT 1, 'min_tokens', p1 FROM agg
UNION ALL SELECT 2, 'distinct_words', p2 FROM agg
UNION ALL SELECT 3, 'low_repetition', p3 FROM agg
ORDER BY stage_idx
"""


@register("doc_quality_funnel", FUNNEL_SQL)
def doc_quality_funnel_q(spark, sf_dir):
    from thundercats_spark.operators.curation import quality_funnel

    d = load(spark, sf_dir, "documents")["documents"]
    gates = [
        ("min_chars", F.length("text") >= 100),
        ("min_tokens", T.token_count(F.col("text")) >= 20),
        ("distinct_words", T.distinct_word_ratio(F.col("text")) >= 0.5),
        ("low_repetition", T.duplicate_ngram_fraction(F.col("text"), 2) <= 0.2),
    ]
    return quality_funnel(d, gates).orderBy("stage_idx")


# --------------------------------------------------------------------------
# Dedup with a retention policy: keep the most word-diverse copy per
# duplicate cluster (ties -> min doc_id) instead of blindly the min id
# --------------------------------------------------------------------------

KEEP_BEST_SQL = r"""
WITH s AS (
  SELECT doc_id, lower(TRIM(text)) AS k,
         len(list_distinct(regexp_split_to_array(TRIM(text), '\s+'))) * 1.0 /
         len(regexp_split_to_array(TRIM(text), '\s+')) AS sc
  FROM documents
), r AS (
  SELECT doc_id, sc,
         COUNT(*) OVER (PARTITION BY k) AS n_copies,
         ROW_NUMBER() OVER (PARTITION BY k ORDER BY sc DESC, doc_id) AS rn
  FROM s
)
SELECT doc_id, CAST(n_copies AS BIGINT) AS n_copies, ROUND(sc, 6) AS best_score
FROM r WHERE rn = 1 ORDER BY doc_id
"""


@register("dedup_keep_best", KEEP_BEST_SQL)
def dedup_keep_best_q(spark, sf_dir):
    d = load(spark, sf_dir, "documents")["documents"]
    out = dedup.dedup_keep_best(
        d, T.distinct_word_ratio(F.col("text")), "text", "doc_id", ids_only=True
    )
    return out.select(
        "doc_id",
        "n_copies",
        F.round("best_score", 6).alias("best_score"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# Sequence packing: concat-and-chunk docs into 2048-token training
# sequences, 64 parallel hash-bucketed streams; per-pack fill summary
# --------------------------------------------------------------------------

PACK_SQL = r"""
WITH t AS (
  SELECT doc_id,
         ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || 'pack'), 1, 6))::BIGINT % 64 AS g,
         len(regexp_split_to_array(TRIM(text), '\s+')) AS tok
  FROM documents
), c AS (
  SELECT g, doc_id, tok,
         SUM(tok) OVER (PARTITION BY g ORDER BY doc_id) AS cum
  FROM t
)
SELECT CAST(g AS INTEGER) AS pack_group,
       CAST(FLOOR((cum - tok) / 2048.0) AS BIGINT) AS pack_seq,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(tok) AS BIGINT) AS n_tokens
FROM c GROUP BY 1, 2 ORDER BY pack_group, pack_seq
"""


@register("corpus_pack_sequences", PACK_SQL)
def corpus_pack_sequences_q(spark, sf_dir):
    from thundercats_spark.operators.curation import pack_sequences

    d = load(spark, sf_dir, "documents")["documents"]
    packed = pack_sequences(d, budget=2048, n_groups=64)
    return (
        packed.groupBy("pack_group", "pack_seq")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .orderBy("pack_group", "pack_seq")
    )


# --------------------------------------------------------------------------
# SemDeDup-style semantic dedup — rows-only (k-means quantizer is not
# SQL-expressible); exactness vs the brute-force pair rule is pinned in
# tests/test_similarity.py (n_clusters=1 == brute; planted-dup recall).
# --------------------------------------------------------------------------


@register("dedup_semantic", None)
def dedup_semantic_q(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")["embeddings"]
    out = similarity.semantic_dedup(e, threshold=0.45, n_clusters=8)
    return out.select("vec_id").orderBy("vec_id")


# --------------------------------------------------------------------------
# MinHash via one-permutation hashing — rows-only (xxhash64 sketch);
# recall vs exact Jaccard pinned in tests/test_dedup.py.
# --------------------------------------------------------------------------


@register("dedup_minhash_oph", None)
def dedup_minhash_oph_q(spark, sf_dir):
    d = load(spark, sf_dir, "documents")["documents"]
    return dedup.minhash_lsh_pairs(d, "text", "doc_id", threshold=0.5, method="oph")


# --------------------------------------------------------------------------
# Exact repeated-span detection (substring-level duplication):
# cross-doc duplicated word spans + per-doc duplicated-span ratio.
# Spark plan is hash-first (operators/spans.py); the oracle re-derives
# the same spans from text in SQL, so the comparison is exact.
# --------------------------------------------------------------------------

REPEATED_SPANS_SQL = r"""
WITH words AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
), spans AS (
  SELECT doc_id, array_to_string(list_slice(w, i, i + 9), ' ') AS span
  FROM words, UNNEST(generate_series(1, len(w) - 9)) AS t(i)
  WHERE len(w) >= 10
)
SELECT span, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occ
FROM spans GROUP BY span HAVING COUNT(DISTINCT doc_id) >= 2
ORDER BY n_docs DESC, n_occ DESC, span LIMIT 100
"""


@register("doc_repeated_spans", REPEATED_SPANS_SQL)
def doc_repeated_spans_q(spark, sf_dir):
    from thundercats_spark.operators.spans import repeated_spans

    d = load(spark, sf_dir, "documents")["documents"]
    return repeated_spans(d, "text", "doc_id", span_words=10, min_docs=2, top_k=100)


SPAN_DUP_FRACTION_SQL = r"""
WITH words AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
), spans AS (
  SELECT doc_id, array_to_string(list_slice(w, i, i + 9), ' ') AS span
  FROM words, UNNEST(generate_series(1, len(w) - 9)) AS t(i)
  WHERE len(w) >= 10
), dup AS (
  SELECT span FROM spans GROUP BY span HAVING COUNT(DISTINCT doc_id) >= 2
)
SELECT s.doc_id,
       COUNT(*) AS n_spans,
       CAST(SUM(CASE WHEN d.span IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       CAST(SUM(CASE WHEN d.span IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS dup_frac
FROM spans s LEFT JOIN dup d USING (span)
GROUP BY s.doc_id ORDER BY s.doc_id
"""


@register("doc_span_dup_fraction", SPAN_DUP_FRACTION_SQL)
def doc_span_dup_fraction_q(spark, sf_dir):
    from thundercats_spark.operators.spans import span_dup_fraction

    d = load(spark, sf_dir, "documents")["documents"]
    return span_dup_fraction(d, "text", "doc_id", span_words=10, min_docs=2).orderBy("doc_id")


# --------------------------------------------------------------------------
# Deterministic epoch shuffle, oracle-checkable via an md5 key (the
# operator's default key is xxhash64 — Spark-only; md5 exists in both
# engines, exercising the same repartitionByRange + in-partition sort
# path with a cross-engine-computable permutation).
# --------------------------------------------------------------------------

SHUFFLE_ORDER_SQL = """
SELECT doc_id,
       CAST(ROW_NUMBER() OVER (ORDER BY md5(doc_id::VARCHAR || ':7'), doc_id) AS BIGINT)
         AS shuffle_pos
FROM documents ORDER BY doc_id
"""


@register("corpus_shuffle_order", SHUFFLE_ORDER_SQL)
def corpus_shuffle_order_q(spark, sf_dir):
    from pyspark.sql import Window

    from thundercats_spark.operators.curation import epoch_shuffle

    d = load(spark, sf_dir, "documents")["documents"].select("doc_id")
    key = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":7")))
    shuffled = epoch_shuffle(d, epoch=7, key=key, n_partitions=8)
    # Global position for the oracle check: single-partition window is
    # the check's cost, not the operator's (training readers consume
    # the partition-ordered output directly).
    w = Window.orderBy(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":7"))), "doc_id")
    return (
        shuffled.withColumn("shuffle_pos", F.row_number().over(w).cast("long"))
        .orderBy("doc_id")
    )


REMOVE_SPANS_SQL = r"""
WITH words AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
), tok AS (
  SELECT doc_id, i AS p, w[i] AS word
  FROM words, UNNEST(generate_series(1, len(w))) AS t(i)
), occ AS (
  SELECT doc_id, i AS pos, array_to_string(list_slice(w, i, i + 9), ' ') AS span
  FROM words, UNNEST(generate_series(1, len(w) - 9)) AS t(i)
  WHERE len(w) >= 10
), dupspan AS (
  SELECT span FROM occ GROUP BY span HAVING COUNT(DISTINCT doc_id) >= 2
), docc AS (
  SELECT o.doc_id, o.pos,
         ROW_NUMBER() OVER (PARTITION BY o.span ORDER BY o.doc_id, o.pos) AS rn
  FROM occ o JOIN dupspan USING (span)
), protected AS (
  -- canonical occurrences' positions are never removed (mirrors the
  -- operator's canonical-span protection)
  SELECT DISTINCT doc_id, pos + i AS p
  FROM docc, UNNEST(generate_series(0, 9)) AS t(i) WHERE rn = 1
), covered AS (
  SELECT DISTINCT d.doc_id, d.pos + i AS p
  FROM docc d, UNNEST(generate_series(0, 9)) AS t(i)
  WHERE d.rn > 1
    AND NOT EXISTS (SELECT 1 FROM protected pr
                    WHERE pr.doc_id = d.doc_id AND pr.p = d.pos + i)
)
SELECT t.doc_id,
       COALESCE(string_agg(CASE WHEN c.p IS NULL THEN t.word END, ' ' ORDER BY t.p), '')
         AS clean_text,
       CAST(COUNT(c.p) AS BIGINT) AS n_removed
FROM tok t LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.p = c.p
GROUP BY t.doc_id ORDER BY t.doc_id
"""


@register("doc_remove_repeated_spans", REMOVE_SPANS_SQL)
def doc_remove_repeated_spans_q(spark, sf_dir):
    from thundercats_spark.operators.spans import remove_repeated_spans

    d = load(spark, sf_dir, "documents")["documents"]
    return remove_repeated_spans(d, "text", "doc_id", span_words=10, min_docs=2).orderBy("doc_id")


# --------------------------------------------------------------------------
# Deterministic per-group sampling: exactly k docs per source, md5-keyed
# so the selection is reproducible in any engine.
# --------------------------------------------------------------------------

SAMPLE_PER_GROUP_SQL = """
SELECT source, doc_id FROM (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY md5(doc_id::VARCHAR || ':sample'), doc_id
         ) AS rk
  FROM documents
) WHERE rk <= 20 ORDER BY source, doc_id
"""


@register("corpus_sample_per_source", SAMPLE_PER_GROUP_SQL)
def corpus_sample_per_source_q(spark, sf_dir):
    from thundercats_spark.operators.curation import sample_per_group

    d = load(spark, sf_dir, "documents")["documents"]
    out = sample_per_group(d, k=20, group_col="source", key_col="doc_id")
    return out.select("source", "doc_id").orderBy("source", "doc_id")


# --------------------------------------------------------------------------
# token-budget corpus selection
# --------------------------------------------------------------------------

# Empty/whitespace-only docs: DuckDB's regexp_split_to_array('') yields
# [''] (1 token) but the Spark path's token_count gives 0 — the CASE
# guard keeps the two in agreement if the corpus ever contains empty docs.
TOKEN_BUDGET_SQL = r"""
WITH scored AS (
  SELECT doc_id,
         CAST(n_chars AS DOUBLE) AS score,
         CASE WHEN TRIM(text) = '' THEN 0
              ELSE len(regexp_split_to_array(TRIM(text), '\s+')) END AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, n_tokens, score,
         SUM(n_tokens) OVER (ORDER BY score DESC, doc_id ASC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM scored
)
SELECT doc_id, n_tokens, score FROM c WHERE cum <= 10000
"""


@register("corpus_token_budget", TOKEN_BUDGET_SQL)
def corpus_token_budget_q(spark, sf_dir):
    """Greedy best-first selection under a 10k-token budget, ranked by
    document length (score = n_chars, ties by id). The two-pass bucketed
    plan must equal the oracle's naive global cumsum exactly."""
    from thundercats_spark.operators.curation import select_token_budget

    d = load(spark, sf_dir, "documents")["documents"]
    return select_token_budget(
        d, 10_000, F.col("n_chars").cast("double"), ids_only=True
    )


# Per-source budgets (data mixing): same empty-doc guard as
# TOKEN_BUDGET_SQL; the window partitions by source.
TOKEN_BUDGET_GROUPED_SQL = r"""
WITH scored AS (
  SELECT doc_id, source,
         CAST(n_chars AS DOUBLE) AS score,
         CASE WHEN TRIM(text) = '' THEN 0
              ELSE len(regexp_split_to_array(TRIM(text), '\s+')) END AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, source, n_tokens, score,
         SUM(n_tokens) OVER (PARTITION BY source
                             ORDER BY score DESC, doc_id ASC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM scored
)
SELECT doc_id, source, n_tokens, score FROM c WHERE cum <= 700
"""


@register("corpus_token_budget_per_source", TOKEN_BUDGET_GROUPED_SQL)
def corpus_token_budget_per_source_q(spark, sf_dir):
    """Grouped budget selection: every source keeps its best docs under
    a 700-token quota — the data-mixing shape. The bucketed grouped plan
    must equal the oracle's per-source cumsum exactly."""
    from thundercats_spark.operators.curation import select_token_budget_grouped

    d = load(spark, sf_dir, "documents")["documents"]
    return select_token_budget_grouped(
        d, 700, F.col("n_chars").cast("double"), group_col="source", ids_only=True
    )


# Sliding token-window chunking: Spark slice/list_slice are both
# 1-based inclusive; the start set is every multiple of the stride
# below max(n - overlap, 1) in BOTH engines (Spark: inclusive sequence
# to the last multiple <= bound-1; DuckDB: exclusive range to bound).
CHUNK_SQL = r"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(TRIM(text), '\s+') AS toks
  FROM documents WHERE TRIM(text) <> ''
), s AS (
  SELECT doc_id, toks, len(toks) AS n FROM t
)
SELECT s.doc_id,
       CAST(u.st / 48 AS INT) AS chunk_id,
       CAST(least(u.st + 64, s.n) - u.st AS INT) AS n_tokens,
       array_to_string(list_slice(s.toks, u.st + 1, least(u.st + 64, s.n)), ' ')
         AS chunk_text
FROM s, UNNEST(range(0, greatest(s.n - 16, 1), 48)) AS u(st)
ORDER BY doc_id, chunk_id
"""


@register("doc_chunk_windows", CHUNK_SQL)
def doc_chunk_windows_q(spark, sf_dir):
    """64-token windows with 16-token overlap (stride 48) over every
    document — one row per window, short final window kept."""
    from thundercats_spark.operators.curation import chunk_documents

    d = load(spark, sf_dir, "documents")["documents"]
    out = chunk_documents(d, 64, overlap=16)
    return out.select(
        "doc_id",
        "chunk_id",
        F.col("chunk_n_tokens").alias("n_tokens"),
        "chunk_text",
    ).orderBy("doc_id", "chunk_id")


# Data-repetition factors: the md5 bucket matches split_bucket exactly
# (same expression family as SPLIT_SQL), so which docs receive the
# fractional extra epoch is engine-identical.
REPEAT_SQL = """
WITH f AS (
  SELECT * FROM (VALUES ('src1', 2.5), ('src2', 1.0), ('src3', 0.4)) AS t(source, f)
), d AS (
  SELECT doc_id, dd.source,
         CAST(FLOOR(f.f) AS INT)
         + CASE WHEN ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || 'repeat'), 1, 6))::BIGINT
                     % 10000 / 10000.0 < f.f - FLOOR(f.f)
                THEN 1 ELSE 0 END AS n
  FROM documents dd JOIN f USING (source)
)
SELECT doc_id, source, CAST(u.e AS INT) AS epoch
FROM d, UNNEST(range(0, n)) AS u(e)
WHERE n > 0
ORDER BY doc_id, epoch
"""


@register("corpus_repeat_epochs", REPEAT_SQL)
def corpus_repeat_epochs_q(spark, sf_dir):
    """Per-source epoch repetition: src1 x2.5, src2 x1, src3 x0.4,
    every other source dropped — deterministic fractional epochs."""
    from thundercats_spark.operators.curation import repeat_corpus

    d = load(spark, sf_dir, "documents")["documents"]
    out = repeat_corpus(d, {"src1": 2.5, "src2": 1.0, "src3": 0.4})
    return out.select("doc_id", "source", "epoch").orderBy("doc_id", "epoch")


# Snapshot drift: docs split by id parity stand in for two corpus
# snapshots. Fractions are single IEEE divisions of exact ints in both
# engines -> bit-identical.
DRIFT_SQL = r"""
WITH toks AS (
  SELECT doc_id, source,
         CASE WHEN TRIM(text) = '' THEN 0
              ELSE len(regexp_split_to_array(TRIM(text), '\s+')) END AS tok
  FROM documents
), a AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs_a,
         CAST(SUM(tok) AS BIGINT) AS n_tokens_a
  FROM toks WHERE doc_id % 2 = 0 GROUP BY source
), b AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs_b,
         CAST(SUM(tok) AS BIGINT) AS n_tokens_b
  FROM toks WHERE doc_id % 2 = 1 GROUP BY source
), j AS (
  SELECT COALESCE(a.source, b.source) AS source,
         COALESCE(n_docs_a, 0) AS n_docs_a, COALESCE(n_docs_b, 0) AS n_docs_b,
         COALESCE(n_tokens_a, 0) AS n_tokens_a, COALESCE(n_tokens_b, 0) AS n_tokens_b
  FROM a FULL JOIN b ON a.source = b.source
), t AS (
  SELECT CAST(SUM(n_docs_a) AS BIGINT) AS ta, CAST(SUM(n_docs_b) AS BIGINT) AS tb FROM j
)
SELECT source, n_docs_a, n_docs_b, n_tokens_a, n_tokens_b,
       n_docs_a * 1.0 / ta AS frac_a,
       n_docs_b * 1.0 / tb AS frac_b,
       n_docs_b * 1.0 / tb - n_docs_a * 1.0 / ta AS frac_delta
FROM j, t ORDER BY source
"""


@register("corpus_drift_report", DRIFT_SQL)
def corpus_drift_report_q(spark, sf_dir):
    """Per-source drift between the even-id and odd-id halves of the
    corpus (two stand-in snapshots)."""
    from thundercats_spark.operators.curation import corpus_drift

    d = load(spark, sf_dir, "documents")["documents"]
    return corpus_drift(
        d.where(F.col("doc_id") % 2 == 0), d.where(F.col("doc_id") % 2 == 1)
    ).orderBy("source")


# Materialized training sequences: the md5 token-id and pack-bucket
# expressions are the same engine-portable family as split_bucket, so
# the full text -> ids -> concat-and-chunk realization is
# engine-identical. ids compare as a space-joined string (array-vs-list
# encodings differ between engines; the string is unambiguous).
PACKED_SEQ_SQL = r"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN TRIM(text) = '' THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array(TRIM(text), '\s+') END AS toks
  FROM documents
), ids AS (
  SELECT doc_id,
         ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || 'pack'), 1, 6))::BIGINT % 4 AS pack_group,
         list_transform(toks, tk ->
           ('0x' || substring(md5(tk || 'tok'), 1, 6))::BIGINT % 65536) AS tid,
         len(toks) AS n
  FROM t
), off AS (
  SELECT doc_id, pack_group, tid,
         SUM(n) OVER (PARTITION BY pack_group ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n AS start
  FROM ids WHERE n > 0  -- token-less docs contribute nothing
), stream AS (
  SELECT pack_group, off.start + u.p - 1 AS gpos, off.tid[u.p] AS tok
  FROM off, UNNEST(range(1, len(off.tid) + 1)) AS u(p)
)
SELECT CAST(pack_group AS INT) AS pack_group,
       CAST(gpos // 128 AS BIGINT) AS pack_seq,
       string_agg(CAST(tok AS VARCHAR), ' ' ORDER BY gpos) AS ids_str,
       CAST(COUNT(*) AS INT) AS n_tokens
FROM stream
GROUP BY 1, 2
ORDER BY pack_group, pack_seq
"""


@register("corpus_packed_sequences", PACKED_SEQ_SQL)
def corpus_packed_sequences_q(spark, sf_dir):
    """Materialized 128-token training sequences over 4 hash groups
    with the portable md5 hash vocabulary."""
    from thundercats_spark.operators.curation import materialize_packed_sequences

    d = load(spark, sf_dir, "documents")["documents"]
    out = materialize_packed_sequences(d, budget=128, n_groups=4)
    return out.select(
        F.col("pack_group").cast("int").alias("pack_group"),
        "pack_seq",
        F.concat_ws(" ", "ids").alias("ids_str"),
        F.col("n_tokens").cast("int").alias("n_tokens"),
    ).orderBy("pack_group", "pack_seq")
