"""Byte-pair-encoding tokenizer training and encoding over a corpus.

The standard industrial split of work (Sennrich et al. 2016; the HF
`tokenizers` trainer does the same): the CORPUS-scale part — building
the distinct-word frequency table — is a distributed aggregation, and
the merge-learning loop then runs over that table, which is vocabulary-
sized, not corpus-sized (capped at ``top_n`` words; beyond the cap the
frequency tail contributes almost nothing to merge counts). At 100 TB
the word-count agg is one shuffle on (word, partial count); the text
itself never moves.

Encoding applies the learned merge ranks with the GPT-2 merge-by-rank
algorithm inside an Arrow-batched Pandas UDF (a designed Python
boundary, like the MinHash signature kernel): merges broadcast with the
closure, per-batch word memoization makes the common case a dict hit.

``functions/text_analysis.bpe_token_estimate`` remains the zero-cost
pure-JVM proxy; this module is the real thing for when the vocabulary
must be learned and shipped.
"""

from __future__ import annotations

import re
from collections import Counter, defaultdict

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END_OF_WORD = "▁"  # sentencepiece-style marker, appended per word

# Pre-tokenization whitespace, matching the Java-regex \s class the
# corpus word_counts split uses (text_analysis.tokens): ASCII whitespace
# ONLY. Python's str.split() would also split on Unicode spaces (NBSP,
# ideographic space), segmenting words differently at encode time than
# the trainer saw them.
_WS_RE = re.compile(r"[ \t\n\x0b\f\r]+")


def _pre_tokenize(text: str) -> list[str]:
    return [w for w in _WS_RE.split(text) if w]


# --------------------------------------------------------------------------
# corpus-scale: distinct-word frequency table
# --------------------------------------------------------------------------


def _word_counts_build(
    df: DataFrame, text_col: str, top_n: int
) -> tuple[DataFrame, DataFrame]:
    """``word_counts`` with the persisted vocabulary aggregate exposed:
    returns ``(result, cached_handle)`` so a consumer that materializes
    the result ONCE (``bpe_train``'s collect) can ``unpersist`` the
    handle afterwards instead of pinning a vocabulary-sized cache entry
    per trainer invocation for the session lifetime (review finding
    r05 — the same per-invocation cache-leak class as q15). Selection
    algorithm documented on ``word_counts``."""
    from thundercats_spark.functions.text_analysis import tokens

    counts = (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    ).persist()
    # distinct-frequency histogram: sum over rows of 1/n distinct values
    # means at most ~sqrt(2 * total_tokens) rows — driver-safe always.
    hist = sorted(
        (
            (r["n"], r["k"])
            for r in counts.groupBy("n").agg(F.count(F.lit(1)).alias("k")).collect()
        ),
        key=lambda t: -t[0],
    )
    cum = 0
    thresh, before = None, 0
    for n_val, k in hist:
        if cum + k >= top_n:
            thresh, before = n_val, cum
            break
        cum += k
    if thresh is None:
        return counts, counts  # vocabulary fits entirely within top_n
    kept = counts.where(F.col("n") > thresh)
    boundary = (
        counts.where(F.col("n") == thresh)
        .orderBy(F.asc("word"))
        .limit(top_n - before)
    )
    return kept.unionByName(boundary), counts


def word_counts(df: DataFrame, text_col: str = "text", top_n: int = 1_000_000) -> DataFrame:
    """(word, n) for the ``top_n`` most frequent whitespace words,
    selected by (count desc, word asc) — fully deterministic. ONE
    corpus explode + partial-agg shuffle: the vocabulary aggregate is
    persisted, so the histogram pass and the returned filter both read
    the vocabulary-sized cache, never the corpus again (plan
    construction runs that job eagerly — a build-time operator, like
    the index builders; the cache is vocabulary-sized, LRU-evicted).
    The result is the trainer's working set, bounded by vocabulary,
    not corpus size. The returned frame's lineage reads the cached
    aggregate, so the cache entry stays live as long as the frame —
    one-shot consumers that only need the collected rows should use
    ``bpe_train`` (which releases the cache) or ``_word_counts_build``
    directly.

    The top-n cut never global-sorts the vocabulary (the old
    row_number window put the whole distinct-word table on ONE
    partition): instead the exact distinct-FREQUENCY histogram —
    at most O(sqrt(total tokens)) rows, trivially collectable at any
    corpus size — picks the threshold count t on the driver, every
    word with n > t is kept by a scan filter, and only the n == t tie
    bucket is ordered (TakeOrdered per-partition heap, no sort
    partition) to fill the remainder. Same selection as the window
    formulation (equality test-pinned)."""
    result, _counts = _word_counts_build(df, text_col, top_n)
    return result


# --------------------------------------------------------------------------
# driver-side: merge learning over the (word, count) table
# --------------------------------------------------------------------------


def _pair_stats(vocab: dict[tuple[str, ...], int]) -> Counter:
    pairs: Counter = Counter()
    for symbols, n in vocab.items():
        for a, b in zip(symbols, symbols[1:]):
            pairs[(a, b)] += n
    return pairs


def _merge_word(symbols: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out = []
    i = 0
    merged = pair[0] + pair[1]
    while i < len(symbols):
        if i < len(symbols) - 1 and symbols[i] == pair[0] and symbols[i + 1] == pair[1]:
            out.append(merged)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return tuple(out)


def bpe_train_from_counts(
    counts: list[tuple[str, int]], n_merges: int = 1000
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a (word, count) table.
    Deterministic: the best pair each round is (max count, then
    lexicographically smallest) — no dict-order dependence. Stops early
    when no pair repeats.

    Incremental stats (the Sennrich learn_bpe optimization): a
    pair→word-index inverted index makes each merge touch only the
    words that actually CONTAIN the winning pair, re-counting just
    their adjacencies — instead of rescanning the whole vocabulary
    per merge (O(merges × vocab), which crawls at 100k+ words and
    30k merges). Equivalence with the naive rescan is test-pinned."""
    agg: dict[tuple[str, ...], int] = defaultdict(int)
    for word, n in counts:
        agg[tuple(word) + (END_OF_WORD,)] += n
    words: list[tuple[str, ...]] = list(agg.keys())
    freqs: list[int] = [agg[w] for w in words]

    import heapq

    pairs: Counter = Counter()
    where: dict[tuple[str, str], set[int]] = defaultdict(set)
    for i, symbols in enumerate(words):
        for p in zip(symbols, symbols[1:]):
            pairs[p] += freqs[i]
            where[p].add(i)

    # best-pair selection via a lazy-invalidation heap: every count
    # change pushes a fresh (-count, pair) entry; stale entries are
    # discarded at pop time by checking against the live Counter. Heap
    # order (-count, pair) IS the deterministic tie-break rule, so the
    # winner is identical to the naive full scan (equivalence-pinned).
    heap: list[tuple[int, tuple[str, str]]] = [
        (-n, p) for p, n in pairs.items()
    ]
    heapq.heapify(heap)

    def touch(p: tuple[str, str]) -> None:
        n = pairs.get(p)
        if n:
            heapq.heappush(heap, (-n, p))

    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges and heap:
        neg, pair = heapq.heappop(heap)
        if pairs.get(pair) != -neg:
            continue  # stale entry — a newer count was pushed
        if -neg < 2:
            break
        merges.append(pair)
        for i in list(where.get(pair, ())):
            old, n = words[i], freqs[i]
            changed = set()
            for p in zip(old, old[1:]):  # retract the word's contributions
                pairs[p] -= n
                changed.add(p)
                if pairs[p] <= 0:
                    del pairs[p]
                s = where.get(p)
                if s is not None:
                    s.discard(i)
                    if not s:
                        del where[p]
            new = _merge_word(old, pair)
            words[i] = new
            for p in zip(new, new[1:]):  # re-add under the merged form
                pairs[p] += n
                changed.add(p)
                where[p].add(i)
            for p in changed:
                touch(p)
    return merges


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 1000,
    top_n: int = 1_000_000,
) -> list[tuple[str, str]]:
    """End-to-end: distributed word-count table -> driver merge loop.
    The collect is bounded by ``top_n`` (the standard trainer working
    set), never by corpus rows. The vocabulary aggregate cached during
    selection is RELEASED once the collect lands — repeated trainer
    invocations in one session leave no cached frames behind
    (unpersist-after-consume, test-pinned)."""
    result, counts = _word_counts_build(df, text_col, top_n)
    try:
        rows = result.collect()
    finally:
        counts.unpersist()
    return bpe_train_from_counts([(r["word"], r["n"]) for r in rows], n_merges)


# --------------------------------------------------------------------------
# encoding: merge-by-rank (GPT-2 algorithm)
# --------------------------------------------------------------------------


def merge_ranks(merges: list[tuple[str, str]]) -> dict[tuple[str, str], int]:
    return {pair: i for i, pair in enumerate(merges)}


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges in learned-rank order until no learned pair
    remains — the canonical greedy BPE segmentation."""
    symbols = list(word) + [END_OF_WORD]
    while len(symbols) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(symbols, symbols[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        symbols[best_i : best_i + 2] = [symbols[best_i] + symbols[best_i + 1]]
    return symbols


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize every document with the learned merges: whitespace
    pre-tokenization, then merge-by-rank per word. Arrow-batched Pandas
    UDF with per-batch word memoization — on natural text the word
    cache hits >95%, so the per-row cost is a dict lookup. The merges
    list ships once per executor via the closure (vocabularies are
    ~100 KB-scale)."""
    from pyspark.sql.functions import pandas_udf

    ranks = merge_ranks(merges)

    @pandas_udf("array<string>")
    def encode(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def enc_doc(t):
            if t is None:
                return []
            out = []
            for w in _pre_tokenize(t):
                got = cache.get(w)
                if got is None:
                    got = cache[w] = bpe_encode_word(w, ranks)
                out.extend(got)
            return out

        return texts.map(enc_doc)

    return df.withColumn(out_col, encode(F.col(text_col)))


def bpe_token_count(
    df: DataFrame, merges: list[tuple[str, str]], text_col: str = "text"
) -> DataFrame:
    return bpe_encode(df, merges, text_col, "__toks").withColumn(
        "bpe_token_count", F.size("__toks")
    ).drop("__toks")


# --------------------------------------------------------------------------
# tokenizer artifact: persist/restore the merge list
# --------------------------------------------------------------------------


def bpe_save(spark, merges: list[tuple[str, str]], path: str) -> None:
    """Persist the learned merge list as a tiny rank-ordered parquet
    artifact — the tokenizer the training pipeline ships alongside the
    packed sequences, restorable on any Hadoop-visible filesystem (same
    artifact discipline as the ANN index metadata). One file; the
    vocabulary is ~100 KB-scale at any corpus size."""
    spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, left string, right string",
    ).coalesce(1).write.mode("overwrite").parquet(path)


def bpe_load(spark, path: str) -> list[tuple[str, str]]:
    """Restore a merge list saved with ``bpe_save``. Rank order IS the
    algorithm (merges apply lowest-rank-first), so a gap or duplicate
    in the persisted ranks means a corrupt artifact — fail loudly
    rather than tokenize differently than the training run did."""
    rows = spark.read.parquet(path).orderBy("rank").collect()
    if [r["rank"] for r in rows] != list(range(len(rows))):
        raise ValueError(
            f"BPE artifact at {path!r} has non-contiguous ranks — corrupt "
            "or partially written; rebuild with bpe_save"
        )
    return [(r["left"], r["right"]) for r in rows]


def bpe_fertility(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    group_col: str | None = None,
) -> DataFrame:
    """Tokenizer QA report — the numbers a training team checks before
    committing to a vocabulary: per group (e.g. per lang/source),
    ``tokens_per_word`` (fertility — how many BPE tokens a whitespace
    word costs; high fertility on a language means the vocab
    under-serves it), ``char_token_frac`` (fraction of emitted tokens
    that are single characters — the fallback tail of words the merges
    never learned), and token/doc totals.

    One encode pass (the Arrow kernel) + one tiny group agg — the
    report is group-cardinality-sized at any corpus scale."""
    from thundercats_spark.functions.text_analysis import tokens

    enc = bpe_encode(df, merges, text_col)
    grp = (F.col(group_col) if group_col else F.lit("all")).alias("group")
    per_doc = enc.select(
        grp,
        F.size("bpe_tokens").alias("__nt"),
        F.size(tokens(F.col(text_col))).alias("__nw"),
        F.size(
            F.filter("bpe_tokens", lambda t: F.length(t) <= 1)
        ).alias("__nc"),
    )
    return per_doc.groupBy("group").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__nt").alias("total_tokens"),
        F.round(
            F.sum("__nt") / F.greatest(F.sum("__nw"), F.lit(1)).cast("double"), 6
        ).alias("tokens_per_word"),
        F.round(
            F.sum("__nc") / F.greatest(F.sum("__nt"), F.lit(1)).cast("double"), 6
        ).alias("char_token_frac"),
    )
