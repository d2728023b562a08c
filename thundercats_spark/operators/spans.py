"""Exact repeated-span detection: cross-document substring duplication.

The curation signal behind "exact substring deduplication" in modern
pretraining pipelines (Lee et al. 2022, "Deduplicating Training Data
Makes Language Models Better"; used by RefinedWeb/SlimPajama): find
word-level spans of length L that occur in >= ``min_docs`` distinct
documents, and score each document by the fraction of its spans that
are corpus-duplicated. Unlike MinHash (whole-doc near-dup), this
catches boilerplate/licence blocks/templated fragments embedded in
otherwise-distinct documents.

Scale shape (the reason this is two-phase):

1. **Hash stream** — every (doc, position) span is reduced to an
   8-byte ``xxhash64`` inside a SQL higher-order function, so the
   exploded stream that shuffles is ``(id, long)`` — span text never
   leaves the scan stage. O(words) rows, O(1) bytes each.
2. **Survivor re-aggregation** — only hashes seen in >= ``min_docs``
   docs come back for an exact, text-keyed recount. The second
   shuffle carries text for *duplicated* spans only (a small fraction
   of the corpus), and re-grouping by the span text makes the final
   counts exact even under (astronomically unlikely) hash collisions.

A reference-free extension: the reference engine has no substring-level
dedup; this extends its dedup family (see operators/dedup.py) with the
span-level member a 100 TB training-data pipeline needs.

Materialization caveat (ADVICE r11): the three consumers below
``localCheckpoint(eager=True)`` the occurrence stream once per
invocation so its tokenize+slice-hash explode runs ONE pass instead of
2-3 (measured r11; ReuseExchange provably cannot fire — the pruned
subtrees diverge). Two consequences to know at cluster scale:
(a) the checkpoint runs a job AT OPERATOR-CALL TIME (the call is no
longer fully lazy), and (b) localCheckpoint blocks are NON-RELIABLE —
an executor loss (or dynamic-allocation reclaim) fails the job instead
of recomputing lineage. On long-lived clusters with dynamic allocation,
either disable reclaim for the job or swap the localCheckpoint for
``spark.checkpoint()`` on reliable storage; the pinned stream is
O(total words) × 20 bytes, far below the corpus the operators scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from thundercats_spark.operators.dedup import ensure_parallelism


def _words(text_col: str):
    return F.split(F.trim(F.col(text_col)), r"\s+")


def span_hash_stream(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_words: int = 10,
) -> DataFrame:
    """(id, span_h) for every word-level span of length ``span_words``
    (stride 1). Spans are hashed to 64 bits inside the projection —
    the output stream is fixed-width and cheap to shuffle. Documents
    shorter than ``span_words`` words contribute no rows."""
    hashes = F.expr(
        f"transform(sequence(1, size(__w) - {span_words} + 1), "
        f"i -> xxhash64(array_join(slice(__w, i, {span_words}), ' ')))"
    )
    return (
        ensure_parallelism(df)
        .select(F.col(id_col).alias("id"), _words(text_col).alias("__w"))
        .where(F.size("__w") >= span_words)
        .select("id", F.explode(hashes).alias("span_h"))
    )


def repeated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_words: int = 10,
    min_docs: int = 2,
    top_k: int | None = 100,
) -> DataFrame:
    """Spans of ``span_words`` words appearing in >= ``min_docs``
    distinct documents: (span, n_docs, n_occ), most-duplicated first
    (ties broken by span text for a total order).

    Phase 1 finds candidate hashes with a fixed-width shuffle; phase 2
    recounts the survivors keyed by the actual text, so results are
    exact — a hash collision can only add a candidate, never corrupt a
    count."""
    # ONE materialized occurrence stream feeds both the duplicate-hash
    # aggregate and the survivor selection: consuming it from two
    # lineage branches would re-run the tokenize + slice-hash explode
    # per branch (measured r11: two ~10 cpuSec passes over identical
    # data; exchange sharing cannot fire because column pruning gives
    # the two branches different subtrees). Executor-local blocks,
    # O(words) fixed-width rows, released with the frame — the same
    # trade part_affinity_lift makes for its fact-grade distinct.
    occ = span_occurrence_stream(
        df, text_col, id_col, span_words
    ).localCheckpoint(eager=True)
    dup_h = (
        occ.groupBy("span_h")
        .agg(F.count_distinct("id").alias("nd"))
        .where(F.col("nd") >= min_docs)
        .select("span_h")
    )
    # Survivor selection runs on the 8-byte OCCURRENCE stream
    # (id, pos, span_h) — joining the text-carrying stream against
    # dup_h would drag O(words x span_words) span text through the
    # shuffle when the survivor set outgrows a broadcast. The span text
    # is re-sliced afterwards, from only the documents that contain a
    # duplicated span. (No broadcast hints: both survivor sets are
    # data-dependent; AQE promotes to BHJ when one actually fits.)
    surv_occ = occ.join(dup_h, "span_h", "leftsemi")
    docs_w = (
        ensure_parallelism(df)
        .select(F.col(id_col).alias("id"), _words(text_col).alias("__w"))
        .join(surv_occ.select("id").distinct(), "id", "leftsemi")
    )
    survivors = surv_occ.join(docs_w, "id").select(
        "id",
        F.array_join(
            F.slice(F.col("__w"), F.col("pos"), span_words), " "
        ).alias("span"),
    )
    out = (
        survivors.groupBy("span")
        .agg(
            F.count_distinct("id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occ"),
        )
        .where(F.col("n_docs") >= min_docs)
        .orderBy(F.desc("n_docs"), F.desc("n_occ"), F.asc("span"))
    )
    return out.limit(top_k) if top_k is not None else out


def span_dup_fraction(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_words: int = 10,
    min_docs: int = 2,
) -> DataFrame:
    """Per-document duplicated-span ratio: (doc_id, n_spans, n_dup,
    dup_frac) where ``n_dup`` counts span positions whose span occurs
    in >= ``min_docs`` distinct documents. The standard "how much of
    this page is boilerplate someone else also has" gate — filter with
    ``dup_frac >= cutoff`` or feed ``calibrate_threshold``.

    Entirely hash-keyed (both the per-doc stream and the duplicate set
    are 8-byte columns); exactness rests on xxhash64 over the span
    text, where a collision is ~2^-64 per span pair. Documents shorter
    than ``span_words`` words have no spans and are omitted."""
    # one materialized hash stream for both consumers (see
    # repeated_spans — two lineage branches would re-run the explode)
    hashes = span_hash_stream(
        df, text_col, id_col, span_words
    ).localCheckpoint(eager=True)
    dup_h = (
        hashes.groupBy("span_h")
        .agg(F.count_distinct("id").alias("nd"))
        .where(F.col("nd") >= min_docs)
        .select("span_h", F.lit(1).alias("__dup"))
    )
    return (
        hashes.join(dup_h, "span_h", "left")
        .groupBy(F.col("id").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.coalesce(F.col("__dup"), F.lit(0))).cast("long").alias("n_dup"),
        )
        .select(
            id_col,
            "n_spans",
            "n_dup",
            (F.col("n_dup").cast("double") / F.col("n_spans")).alias("dup_frac"),
        )
        # no decorative global sort (see remove_repeated_spans note)
    )


def span_occurrence_stream(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_words: int = 10,
) -> DataFrame:
    """(id, pos, span_h) — like ``span_hash_stream`` but keeping the
    1-based start position of each span, for occurrence-level ops."""
    hashes = F.expr(
        f"transform(sequence(1, size(__w) - {span_words} + 1), "
        f"i -> xxhash64(array_join(slice(__w, i, {span_words}), ' ')))"
    )
    return (
        ensure_parallelism(df)
        .select(F.col(id_col).alias("id"), _words(text_col).alias("__w"))
        .where(F.size("__w") >= span_words)
        .select("id", F.posexplode(hashes).alias("pos0", "span_h"))
        .select("id", (F.col("pos0") + 1).alias("pos"), "span_h")
    )


def remove_repeated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_words: int = 10,
    min_docs: int = 2,
) -> DataFrame:
    """Exact substring deduplication (Lee et al. 2022): for every span
    duplicated across >= ``min_docs`` documents, keep ONE canonical
    occurrence (the lexicographically smallest (doc, position)) and cut
    the words covered by every other occurrence. Returns one row per
    document: (id, clean_text, n_removed) — overlapping removals are
    unioned at the position level, and a fully-duplicated document
    comes back as the empty string, ready for a length gate.

    Whitespace is normalized (words are re-joined with single spaces),
    matching the tokenizer used for detection.

    Scale shape: detection and removal planning run entirely on
    ``(id, pos, span_h)`` triples — fixed-width, shuffle-cheap. Text
    shuffles exactly once, in the final per-document rebuild (inherent:
    the operator rewrites documents). Covered positions are exploded
    per removal (O(span_words) ints each); for very long spans an
    interval-merge would be cheaper, at these L values explode wins."""
    # materialized once: dup and removals both consume it (see
    # repeated_spans)
    occ = span_occurrence_stream(
        df, text_col, id_col, span_words
    ).localCheckpoint(eager=True)
    dup = (
        occ.groupBy("span_h")
        .agg(
            F.count_distinct("id").alias("nd"),
            F.min(F.struct("id", "pos")).alias("canon"),
        )
        .where(F.col("nd") >= min_docs)
        .select("span_h", "canon")
    )
    removals = (
        occ.join(dup, "span_h")
        .where(
            (F.col("id") != F.col("canon.id")) | (F.col("pos") != F.col("canon.pos"))
        )
        .select("id", "pos")
    )
    # positions belonging to a CANONICAL occurrence are protected:
    # without this, removing span X's non-canonical occurrence can
    # cover the canonical occurrence of an overlapping span Y in the
    # same document, deleting every copy of Y from the corpus (the
    # 'keep ONE canonical occurrence' contract would silently break —
    # counterexample pinned in tests/test_spans.py).
    protected = dup.select(
        F.col("canon.id").alias("id"),
        F.explode(
            F.sequence(F.col("canon.pos"), F.col("canon.pos") + F.lit(span_words - 1))
        ).alias("p"),
    ).distinct()
    covered = (
        removals.select(
            "id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(span_words - 1))
            ).alias("p"),
        )
        .distinct()
        .join(protected, ["id", "p"], "left_anti")
    )
    tok = (
        ensure_parallelism(df)
        .select(F.col(id_col).alias("id"), F.posexplode(_words(text_col)).alias("p0", "word"))
        .select("id", (F.col("p0") + 1).alias("p"), "word")
    )
    marked = tok.join(covered.withColumn("__c", F.lit(1)), ["id", "p"], "left")
    # collect_list drops the null structs (covered positions), so one
    # grouped pass yields both the rebuilt text and the removal count.
    return (
        marked.groupBy(F.col("id").alias(id_col))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("__c").isNull(), F.struct("p", "word"))
                        )
                    ),
                    lambda s: s["word"],
                ),
                " ",
            ).alias("clean_text"),
            F.count(F.col("__c")).cast("long").alias("n_removed"),
        )
        # no decorative global sort: at corpus scale a terminal orderBy
        # adds a full range-partition shuffle no consumer needs —
        # callers that want ordered output sort the (small) result
    )
