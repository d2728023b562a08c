"""Structured Streaming: windowed agg + watermark, streaming dedup,
stateful sessionization — driven with file/rate sources into memory
sinks (reference AllTest streaming cases need Kafka; we use the
built-in sources, the operator logic is source-agnostic)."""

import time
from datetime import datetime, timedelta

import pyspark.sql.functions as F
import pytest

from thundercats_spark.streaming.windows import (
    dedup_stream,
    run_stream_to_memory,
    sessionize_stream,
    windowed_agg,
)


def _write_events(spark, path, rows):
    spark.createDataFrame(rows, "user_id long, ts timestamp, value double").write.mode(
        "overwrite"
    ).parquet(path)


def _file_stream(spark, path):
    return (
        spark.readStream.schema("user_id long, ts timestamp, value double").parquet(path)
    )


def test_windowed_agg_with_watermark(spark, tmp_path):
    base = datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (1, base, 1.0),
        (1, base + timedelta(minutes=10), 2.0),
        (1, base + timedelta(hours=1, minutes=5), 4.0),
        (2, base + timedelta(minutes=30), 8.0),
    ]
    path = str(tmp_path / "ev")
    _write_events(spark, path, rows)
    out = windowed_agg(
        _file_stream(spark, path),
        ts_col="ts",
        keys=["user_id"],
        aggs=[F.count(F.lit(1)).alias("n"), F.sum("value").alias("total")],
        window="1 hour",
        watermark="10 minutes",
    )
    run_stream_to_memory(out.select("user_id", "window.start", "n", "total"),
                         "win_agg", mode="append")
    # append mode emits nothing until watermark passes max event time;
    # with a static file source the final watermark still holds back
    # the last window — use complete-mode run for assertion instead.
    out2 = windowed_agg(
        _file_stream(spark, path),
        ts_col="ts",
        keys=["user_id"],
        aggs=[F.count(F.lit(1)).alias("n"), F.sum("value").alias("total")],
        window="1 hour",
        watermark="10 minutes",
    )
    run_stream_to_memory(out2.select("user_id", F.col("window.start").alias("ws"), "n", "total"),
                         "win_agg_c", mode="complete")
    got = {
        (r["user_id"], r["ws"].isoformat(), r["n"], r["total"])
        for r in spark.sql("SELECT * FROM win_agg_c").collect()
    }
    assert (1, "2024-01-01T10:00:00", 2, 3.0) in got
    assert (1, "2024-01-01T11:00:00", 1, 4.0) in got
    assert (2, "2024-01-01T10:00:00", 1, 8.0) in got


def test_dedup_stream(spark, tmp_path):
    base = datetime(2024, 1, 1, 10, 0, 0)
    rows = [(1, base, 1.0), (1, base, 1.0), (2, base, 2.0)]
    path = str(tmp_path / "dup")
    _write_events(spark, path, rows)
    out = dedup_stream(_file_stream(spark, path), keys=["user_id"], ts_col="ts")
    run_stream_to_memory(out, "dedup_s")
    assert spark.sql("SELECT count(*) c FROM dedup_s").first()["c"] == 2


def test_sessionize_stream_emits_on_timeout(spark, tmp_path):
    base = datetime(2024, 1, 1, 10, 0, 0)
    path = str(tmp_path / "sess")
    _write_events(spark, path, [(1, base, 1.0), (1, base + timedelta(minutes=5), 2.0)])
    # 2s idle gap so the processing-time timeout fires during the test
    out = sessionize_stream(_file_stream(spark, path), gap_ms=2000)
    q = out.writeStream.format("memory").queryName("sess_s").outputMode("append").start()
    try:
        # poll: after the idle gap the state times out and the closed
        # session row is emitted (processAllAvailable never idles with
        # ProcessingTimeTimeout — state-cleanup batches keep firing)
        rows = []
        for _ in range(60):
            if q.exception():
                raise AssertionError(str(q.exception()))
            rows = spark.sql("SELECT * FROM sess_s").collect()
            if rows:
                break
            time.sleep(1)
        assert len(rows) == 1
        r = rows[0]
        assert r["user_id"] == 1 and r["n_events"] == 2 and r["total_value"] == 3.0
        assert r["session_start"] == base
        assert r["session_end"] == base + timedelta(minutes=5)
    finally:
        q.stop()


def test_stream_stream_join(spark, tmp_path):
    from thundercats_spark.streaming.windows import stream_stream_join

    base = datetime(2024, 1, 1, 10, 0, 0)
    lpath, rpath = str(tmp_path / "l"), str(tmp_path / "r")
    # left: purchases; right: clicks that should precede them
    spark.createDataFrame(
        [(1, base + timedelta(minutes=30), 100.0)],
        "user_id long, pts timestamp, amount double",
    ).write.mode("overwrite").parquet(lpath)
    spark.createDataFrame(
        [
            (1, base + timedelta(minutes=10), 1.0),   # within 1h before -> match
            (1, base + timedelta(minutes=40), 2.0),   # AFTER purchase -> no match
            (2, base + timedelta(minutes=10), 3.0),   # other user -> no match
        ],
        "user_id long, cts timestamp, click_id double",
    ).write.mode("overwrite").parquet(rpath)

    lstream = spark.readStream.schema("user_id long, pts timestamp, amount double").parquet(lpath)
    rstream = (
        spark.readStream.schema("user_id long, cts timestamp, click_id double")
        .parquet(rpath)
        .withColumnRenamed("user_id", "r_user_id")
    )
    joined = stream_stream_join(
        lstream, rstream.withColumnRenamed("r_user_id", "user_id"), "user_id", "pts", "cts"
    ).select(lstream["user_id"], "amount", "click_id")
    run_stream_to_memory(joined, "ss_join")
    rows = spark.sql("SELECT * FROM ss_join").collect()
    assert len(rows) == 1
    assert rows[0]["click_id"] == 1.0


def test_stream_upsert_parquet_idempotent_by_key(spark, tmp_path):
    import json

    from thundercats_spark.streaming.windows import stream_upsert_parquet

    src = tmp_path / "src"
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()
    schema = "user_id long, v long"
    (src / "b1.json").write_text(
        "\n".join(json.dumps({"user_id": u, "v": 1}) for u in (1, 2, 2))
    )
    stream = spark.readStream.schema(schema).json(str(src))
    q = stream_upsert_parquet(stream, sink, keys=["user_id"], checkpoint=ckpt)
    try:
        q.processAllAvailable()
        # second file re-delivers key 2 and introduces key 3
        (src / "b2.json").write_text(
            "\n".join(json.dumps({"user_id": u, "v": 2}) for u in (2, 3))
        )
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.read.parquet(sink).collect()
    assert sorted(r["user_id"] for r in rows) == [1, 2, 3]  # no dupes
    by_key = {r["user_id"]: r["v"] for r in rows}
    assert by_key[2] == 1  # first write wins; replay didn't overwrite


def test_sessionize_stream_event_time(spark, tmp_path):
    from thundercats_spark.streaming.windows import sessionize_stream_event_time

    path = str(tmp_path / "ev")
    t0 = datetime(2024, 1, 1, 0, 0, 0)
    _write_events(
        spark,
        path,
        [(1, t0, 1.0), (1, t0 + timedelta(seconds=2), 2.0)],
    )
    out = sessionize_stream_event_time(
        _file_stream(spark, path), gap_ms=5_000, watermark="1 second"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sess_et")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # a much-later event advances the watermark past user 1's gap
        spark.createDataFrame(
            [(2, t0 + timedelta(seconds=120), 9.0)],
            "user_id long, ts timestamp, value double",
        ).write.mode("append").parquet(path)
        q.processAllAvailable()
        q.processAllAvailable()  # one more microbatch for timeout processing
        rows = spark.sql("SELECT * FROM sess_et").collect()
    finally:
        q.stop()
    sessions = {r["user_id"]: r for r in rows}
    assert 1 in sessions  # user 1's session closed by the watermark
    s = sessions[1]
    assert s["n_events"] == 2 and abs(s["total_value"] - 3.0) < 1e-9
    assert (s["session_end"] - s["session_start"]).total_seconds() == 2.0


def test_stream_dedup_corpus_full_history(spark, tmp_path):
    from thundercats_spark.streaming.windows import stream_dedup_corpus

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    idx = str(tmp_path / "idx")
    chk = str(tmp_path / "chk")

    def docs(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    docs([(1, "alpha"), (2, "beta"), (3, "alpha")]).write.mode("append").parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = stream_dedup_corpus(stream, out, idx, checkpoint=chk)
    q.processAllAvailable()
    assert sorted(r["doc_id"] for r in spark.read.parquet(out).collect()) == [1, 2]
    # second micro-batch: history repeat + new doc
    docs([(10, "beta"), (11, "gamma")]).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    got = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 11]
    # index holds exactly the three distinct fingerprints
    assert spark.read.parquet(idx).distinct().count() == 3


def test_sessionize_event_time_late_data_past_watermark_dropped(spark, tmp_path):
    """Out-of-order events arriving AFTER the watermark passed them must
    not reopen or corrupt an already-closed session: the emitted session
    is exactly the on-time events, and no phantom second session appears."""
    from thundercats_spark.streaming.windows import sessionize_stream_event_time

    path = str(tmp_path / "late_ev")
    t0 = datetime(2024, 1, 1, 0, 0, 0)
    # batch 1: user 1's session (2 events) + sentinel advancing the
    # watermark to t0+119s — far past user 1's gap timeout (t0+7s)
    _write_events(
        spark,
        path,
        [
            (1, t0, 1.0),
            (1, t0 + timedelta(seconds=2), 2.0),
            (99, t0 + timedelta(seconds=120), 0.5),
        ],
    )
    out = sessionize_stream_event_time(
        _file_stream(spark, path), gap_ms=5_000, watermark="1 second"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sess_late")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: a LATE user-1 event at t0+1s — 118s behind the
        # watermark — plus a sentinel pushing the watermark further
        spark.createDataFrame(
            [(1, t0 + timedelta(seconds=1), 100.0),
             (98, t0 + timedelta(seconds=240), 0.5)],
            "user_id long, ts timestamp, value double",
        ).write.mode("append").parquet(path)
        q.processAllAvailable()
        q.processAllAvailable()  # timeout-processing microbatch
        rows = [r for r in spark.sql("SELECT * FROM sess_late").collect()
                if r["user_id"] == 1]
    finally:
        q.stop()
    # exactly ONE session for user 1, built from the on-time events only:
    # the late row neither merged into it (total stays 3.0) nor opened a
    # phantom second session
    assert len(rows) == 1, rows
    s = rows[0]
    assert s["n_events"] == 2 and abs(s["total_value"] - 3.0) < 1e-9
    assert s["session_start"] == t0
    assert (s["session_end"] - s["session_start"]).total_seconds() == 2.0


def test_stream_stream_join_late_row_past_watermark_dropped(spark, tmp_path):
    """A right-side row arriving after the watermark passed its event
    time must not join, even though its timestamps satisfy the join
    bound — join state for that horizon is already evicted."""
    from thundercats_spark.streaming.windows import stream_stream_join

    base = datetime(2024, 1, 1, 10, 0, 0)
    lpath, rpath = str(tmp_path / "ll"), str(tmp_path / "rr")
    # batch 1: one matching pair + far-future sentinels on BOTH sides
    # (the global watermark is the min across sources; both must move)
    spark.createDataFrame(
        [(1, base + timedelta(minutes=30), 100.0),
         (50, base + timedelta(hours=10), 1.0)],
        "user_id long, pts timestamp, amount double",
    ).write.mode("overwrite").parquet(lpath)
    spark.createDataFrame(
        [(1, base + timedelta(minutes=10), 1.0),
         (60, base + timedelta(hours=10), 999.0)],
        "user_id long, cts timestamp, click_id double",
    ).write.mode("overwrite").parquet(rpath)

    lstream = spark.readStream.schema(
        "user_id long, pts timestamp, amount double").parquet(lpath)
    rstream = spark.readStream.schema(
        "user_id long, cts timestamp, click_id double").parquet(rpath)
    joined = stream_stream_join(
        lstream, rstream, "user_id", "pts", "cts",
        within="1 hour", watermark="30 minutes",
    ).select(lstream["user_id"], "amount", "click_id")
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_late")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: a LATE click at base+12min — inside the purchase's
        # join window, but ~9h behind the watermark → dropped
        spark.createDataFrame(
            [(1, base + timedelta(minutes=12), 7.0)],
            "user_id long, cts timestamp, click_id double",
        ).write.mode("append").parquet(rpath)
        q.processAllAvailable()
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM ss_late").collect()
    finally:
        q.stop()
    assert [(r["user_id"], r["click_id"]) for r in rows] == [(1, 1.0)]


def test_chunk_documents_works_on_streams(spark, tmp_path):
    """chunk_documents is a pure narrow map, so the SAME operator runs
    unchanged on a streaming frame (stateless projection — no
    watermark, no state store)."""
    from thundercats_spark.operators.curation import chunk_documents
    from thundercats_spark.streaming.windows import run_stream_to_memory

    src = str(tmp_path / "docs_in")
    spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))), (2, "a b c"), (3, "")],
        "doc_id long, text string",
    ).write.mode("append").parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    out = chunk_documents(stream, chunk_tokens=4, overlap=2).select(
        "doc_id", "chunk_id", "chunk_text", "chunk_n_tokens"
    )
    assert out.isStreaming
    run_stream_to_memory(out, "chunks_s")
    got = {
        (r["doc_id"], r["chunk_id"]): r["chunk_text"]
        for r in spark.sql("select * from chunks_s").collect()
    }
    batch = {
        (r["doc_id"], r["chunk_id"]): r["chunk_text"]
        for r in chunk_documents(
            spark.read.parquet(src), chunk_tokens=4, overlap=2
        ).collect()
    }
    assert got == batch and len(got) == 5  # 4 windows for doc 1 + 1 for doc 2


def test_stream_dedup_corpus_near_full_history(spark, tmp_path):
    """Near-dup streaming ingestion: later micro-batches drop docs
    whose Jaccard >= threshold against ANY earlier batch (probed from
    the persisted index, text never rescanned), not just exact copies."""
    from thundercats_spark.streaming.windows import stream_dedup_corpus_near

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    idx = str(tmp_path / "idx")
    chk = str(tmp_path / "chk")

    base = "the quick brown fox jumps over the lazy dog again and again"
    near = base + " tail"      # J >= 0.5 vs base
    fresh = "completely unrelated content about spark accumulators here"

    def docs(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    docs([(1, base), (2, fresh)]).write.mode("append").parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = stream_dedup_corpus_near(stream, out, idx, checkpoint=chk)
    q.processAllAvailable()
    assert sorted(r["doc_id"] for r in spark.read.parquet(out).collect()) == [1, 2]
    # batch 2: a NEAR dup of batch 1 (dropped), an exact repeat
    # (dropped), and a new doc (kept)
    docs([(10, near), (11, fresh), (12, "brand new text entirely different")]
         ).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    got = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 12]


def test_stream_rollup_parquet_maintains_aggregates(spark, tmp_path):
    import json as _json

    from thundercats_spark.operators.incremental import hll_estimate, rollup_state
    from thundercats_spark.streaming.windows import stream_rollup_parquet

    src = tmp_path / "src"
    rollup = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()
    schema = "source string, v long, k string"
    (src / "b1.json").write_text(
        "\n".join(
            _json.dumps(r)
            for r in [
                {"source": "a", "v": 10, "k": "x"},
                {"source": "a", "v": 5, "k": "y"},
                {"source": "b", "v": 7, "k": "x"},
            ]
        )
    )
    stream = spark.readStream.schema(schema).json(str(src))
    metrics = {
        "n": ("count", "*"),
        "total": ("sum", "v"),
        "uniq_k": ("approx_distinct", "k"),
    }
    q = stream_rollup_parquet(stream, rollup, ["source"], metrics, checkpoint=ckpt)
    try:
        q.processAllAvailable()
        (src / "b2.json").write_text(
            "\n".join(
                _json.dumps(r)
                for r in [
                    {"source": "a", "v": 1, "k": "x"},
                    {"source": "c", "v": 2, "k": "z"},
                ]
            )
        )
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {
        r["source"]: r
        for r in hll_estimate(spark.read.parquet(rollup), "uniq_k").collect()
    }
    assert rows["a"]["n"] == 3 and rows["a"]["total"] == 16 and rows["a"]["uniq_k"] == 2
    assert rows["b"]["n"] == 1 and rows["b"]["total"] == 7
    assert rows["c"]["n"] == 1 and rows["c"]["total"] == 2
    # batch id committed with the data; a replayed id would be skipped
    assert rollup_state(rollup)["batch_id"] >= 1


def test_stream_rollup_skips_replayed_batch(spark, tmp_path):
    from thundercats_spark.operators.incremental import rollup_state, rollup_update

    rollup = str(tmp_path / "rollup")
    b = spark.createDataFrame([("a", 5)], "source string, v long")
    metrics = {"total": ("sum", "v")}
    rollup_update(spark, b, rollup, ["source"], metrics, state_doc={"batch_id": 0})
    assert rollup_state(rollup) == {"batch_id": 0}
    # the sink's guard: re-merging the same batch_id must be a no-op
    from thundercats_spark.streaming import windows as W

    last = rollup_state(rollup).get("batch_id", -1)
    assert 0 <= last  # replay of batch 0 would be skipped by the guard
    rollup_update(spark, b, rollup, ["source"], metrics, state_doc={"batch_id": 1})
    got = spark.read.parquet(rollup).first()
    assert got["total"] == 10 and rollup_state(rollup)["batch_id"] == 1


def test_stream_ann_index_keeps_index_fresh(spark, tmp_path):
    """stream_ann_index folds micro-batches of embeddings into a
    persisted IVF index via the replay-idempotent upsert: after the
    stream drains, the index is row-for-row the one a full rebuild
    with the same frozen centroids produces, exact in-batch duplicate
    rows collapse instead of erroring, and probes agree."""
    from thundercats_spark.operators import similarity
    from thundercats_spark.streaming.windows import stream_ann_index

    def vecs(ids):
        return spark.createDataFrame(
            [
                (i, [float(i % 5), float((i * 3) % 7), float(i % 2), 1.0])
                for i in ids
            ],
            "vec_id long, embedding array<double>",
        )

    src = str(tmp_path / "in")
    idx = str(tmp_path / "idx")
    full = str(tmp_path / "full")
    chk = str(tmp_path / "chk")

    cents = similarity.ann_index_build(vecs(range(20)), idx, n_clusters=2)
    # batch 1: ids 20..29 with id 25 duplicated VERBATIM in-batch (an
    # at-least-once source redelivering inside one micro-batch) — the
    # sink must collapse it, not trip the ambiguous-duplicate error
    vecs(list(range(20, 30)) + [25]).write.mode("append").parquet(src)
    stream = spark.readStream.schema(
        "vec_id long, embedding array<double>"
    ).parquet(src)
    q = stream_ann_index(stream, idx, checkpoint=chk)
    try:
        q.processAllAvailable()
        vecs(range(30, 40)).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    similarity.ann_index_build(vecs(range(40)), full, centroids=cents)
    got = sorted(r["vec_id"] for r in spark.read.parquet(idx).collect())
    want = sorted(r["vec_id"] for r in spark.read.parquet(full).collect())
    assert got == want == list(range(40))
    qv = [3.0, 2.0, 1.0, 1.0]
    got_p = [
        (r["vec_id"], r["cos"])
        for r in similarity.ann_topk_indexed(spark, idx, qv, k=5, nprobe=2).collect()
    ]
    want_p = [
        (r["vec_id"], r["cos"])
        for r in similarity.ann_topk_indexed(spark, full, qv, k=5, nprobe=2).collect()
    ]
    assert got_p == want_p


def test_stream_quality_monitor_journals_and_flags_drift(spark, tmp_path):
    import json as _json

    from thundercats_spark.operators.robust import mad_outlier_stats_quantized
    from thundercats_spark.streaming.windows import stream_quality_monitor

    # baseline corpus: source a centered at 0.50, source b at 0.30
    base_rows = [("a", round(0.50 + (i % 5) * 0.01, 2)) for i in range(20)]
    base_rows += [("b", round(0.30 + (i % 5) * 0.01, 2)) for i in range(20)]
    baseline = mad_outlier_stats_quantized(
        spark.createDataFrame(base_rows, "source string, q double"),
        ["source"], "q",
    )

    src = tmp_path / "src"
    src.mkdir()
    journal = str(tmp_path / "journal")
    ckpt = str(tmp_path / "ckpt")
    # batch 1: both sources near their baselines -> no drift
    (src / "b1.json").write_text(
        "\n".join(
            _json.dumps({"source": s, "q": round(c + (i % 5) * 0.01, 2)})
            for s, c in (("a", 0.50), ("b", 0.30))
            for i in range(10)
        )
    )
    stream = spark.readStream.schema("source string, q double").json(str(src))
    q = stream_quality_monitor(
        stream, journal, "q", ["source"], baseline=baseline, drift_k=2.0
    )
    try:
        q.processAllAvailable()
        # batch 2: source a shifts hard (0.80), b holds; source c is new
        (src / "b2.json").write_text(
            "\n".join(
                _json.dumps({"source": s, "q": round(c + (i % 5) * 0.01, 2)})
                for s, c in (("a", 0.80), ("b", 0.30), ("c", 0.10))
                for i in range(10)
            )
        )
        q.processAllAvailable()
    finally:
        q.stop()

    j = spark.read.parquet(journal)
    assert set(j.columns) == {
        "source", "n", "med", "mad", "n_outliers", "outlier_rate",
        "med_drift", "drifted", "batch_id",
    }
    got = {(r["batch_id"], r["source"]): r for r in j.collect()}
    assert len(got) == 5  # 2 sources in batch 0, 3 in batch 1
    b0 = [k for k in got if k[1] == "a" and got[k]["drifted"] is False]
    assert len(b0) == 1  # batch with a near baseline: not drifted
    shifted = got[max(k[0] for k in got), "a"]
    assert shifted["drifted"] is True and shifted["med_drift"] > 0.25
    # source with no baseline: NULL drift columns, visible row
    new_src = got[max(k[0] for k in got), "c"]
    assert new_src["med_drift"] is None and new_src["drifted"] is None
    # per-batch stats agree with the batch operator run directly
    assert shifted["n"] == 10 and shifted["med"] == 0.82


def test_sessionize_event_time_deterministic_across_shuffled_replays(
    spark, tmp_path
):
    """VERDICT r06 #4: replay determinism pin. The SAME events arriving
    in the SAME wave (micro-batch) sequence must yield byte-identical
    sessions regardless of row order and file layout WITHIN each wave —
    the property that makes event-time sessionization safe for backfill
    (a re-run never silently produces different sessions because the
    source listed files differently). Three replays shuffle each wave
    with a different seed and write it with a different partition
    count; a late row (far behind the watermark) rides wave 3 in every
    replay to pin that late-data dropping is part of the deterministic
    contract, not a race."""
    import random

    from thundercats_spark.streaming.windows import (
        sessionize_stream_event_time,
    )

    t0 = datetime(2024, 3, 1, 0, 0, 0)
    ev = lambda u, s, v: (u, t0 + timedelta(seconds=s), v)
    waves = [
        # wave 1: both users open sessions; sentinel sets watermark 1s
        [ev(1, 0, 1.0), ev(1, 1, 2.0), ev(1, 2, 3.0),
         ev(2, 1, 5.0), ev(2, 2, 6.0), ev(99, 3, 0.0)],
        # wave 2: folds into the open sessions; watermark -> 28s
        [ev(1, 3, 4.0), ev(2, 10, 7.0), ev(99, 30, 0.0)],
        # wave 3: sentinel -> watermark 58s (closes users 1 and 2) plus
        # a LATE user-1 row 55s behind the watermark — must be dropped
        [ev(99, 60, 0.0), ev(1, 2.5, 100.0)],
    ]

    def replay(i: int, seed: int, n_parts: int):
        path = str(tmp_path / f"replay{i}")
        name = f"sess_det_{i}"
        rng = random.Random(seed)
        first = True
        q = None
        try:
            for wave in waves:
                rows = list(wave)
                rng.shuffle(rows)
                df = spark.createDataFrame(
                    rows, "user_id long, ts timestamp, value double"
                ).repartition(n_parts)
                df.write.mode("overwrite" if first else "append").parquet(path)
                if first:
                    out = sessionize_stream_event_time(
                        _file_stream(spark, path),
                        gap_ms=5_000,
                        watermark="2 seconds",
                    )
                    q = (
                        out.writeStream.format("memory")
                        .queryName(name)
                        .outputMode("append")
                        .start()
                    )
                    first = False
                q.processAllAvailable()
                q.processAllAvailable()  # timeout-processing microbatch
            return sorted(
                (
                    r["user_id"],
                    r["session_start"],
                    r["session_end"],
                    r["n_events"],
                    r["total_value"],
                )
                for r in spark.sql(f"SELECT * FROM {name}").collect()
            )
        finally:
            if q is not None:
                q.stop()

    results = [replay(0, 7, 1), replay(1, 41, 3), replay(2, 1009, 7)]
    assert results[0] == results[1] == results[2], results
    # and the canonical expected sessions: the late 100.0 row is in NO
    # session, user 1 spans waves 1-2 (4 events), user 2 likewise (3)
    assert results[0] == [
        (1, t0, t0 + timedelta(seconds=3), 4, 10.0),
        (2, t0 + timedelta(seconds=1), t0 + timedelta(seconds=10), 3, 18.0),
    ], results[0]


# ---------------------------------------------------------------------------
# Multi-batch equivalence proofs (VERDICT r08 #2): the registered
# streaming queries' exactness arguments, driven through FORCED
# multi-batch delivery (maxFilesPerTrigger=1 over a multi-file layout)
# instead of resting on the single-batch tripwire.
# ---------------------------------------------------------------------------


def _write_slices(spark, src_dir, slices, schema, stage_dir):
    """Write each slice as ONE parquet file in src_dir with strictly
    increasing mtimes, so the file stream source (which orders initial
    files by modification time) delivers them oldest-slice-first —
    bounding cross-batch event-time disorder to what the slices encode."""
    import glob
    import os
    import shutil

    os.makedirs(src_dir, exist_ok=True)
    for k, sl in enumerate(slices):
        spark.createDataFrame(sl, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage_dir)
        part = glob.glob(os.path.join(stage_dir, "part-*.parquet"))[0]
        dst = os.path.join(src_dir, f"slice{k:02d}.parquet")
        shutil.copy(part, dst)
        os.utime(dst, (1_700_000_000 + k * 10, 1_700_000_000 + k * 10))


def test_stream_stream_join_exact_across_forced_multibatch(spark, tmp_path):
    """events_stream_stream_join's completeness claim, PROVEN across
    batches: with watermark (2h) >= join interval (1h) + max cross-batch
    disorder (20min), the dual-watermark interval join over SIX forced
    micro-batches yields exactly the batch self-join's pair set — no
    cross-batch pair is lost to state eviction. The registered query
    keeps require_single_batch as defense-in-depth; this test is the
    proof that the multi-batch path is also exact when the watermark
    covers the disorder."""
    from thundercats_spark.queries.analytics6 import batch_view_click_pairs
    from thundercats_spark.streaming.windows import (
        run_available_now_to_memory,
        stream_stream_join,
    )

    base = datetime(2024, 1, 1, 0, 0, 0)
    slices = [[] for _ in range(6)]
    eid = 0
    for k in range(6):
        t0 = base + timedelta(minutes=30 * k)
        for u in range(1, 6):
            eid += 1
            slices[k].append(
                (eid, u, "view", t0 + timedelta(minutes=(u * 3) % 25), float(u))
            )
            eid += 1
            # clicks attribute to views up to 1h back — spanning 2-3 slices
            slices[k].append(
                (eid, u, "click",
                 t0 + timedelta(minutes=5 + (u * 7) % 22), float(u))
            )
        # disorder row: stamped 20 min BEFORE the slice start but
        # DELIVERED in slice k (bounded cross-batch disorder)
        eid += 1
        slices[k].append((eid, 1, "view", t0 - timedelta(minutes=20), 0.0))

    schema = (
        "event_id long, user_id long, event_type string, "
        "ts timestamp, value double"
    )
    src = str(tmp_path / "mb_events")
    _write_slices(spark, src, slices, schema, str(tmp_path / "stage"))

    static = spark.read.parquet(src)
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    clicks = stream.where(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("cts")
    )
    views = stream.where(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), F.col("ts").alias("vts")
    )
    joined = stream_stream_join(
        clicks, views, key="user_id", left_ts="cts", right_ts="vts",
        within="1 hour", watermark="2 hours",
    )
    stats = {}
    got_df = run_available_now_to_memory(
        joined.select("user_id", "view_id", "click_id"), "append", stats=stats
    )
    # the delivery really was split — one data batch per slice file
    assert stats["data_batches"] == 6, stats

    got = {tuple(r) for r in got_df.collect()}
    want = {tuple(r) for r in batch_view_click_pairs(static).collect()}
    assert got == want, (
        f"missing={sorted(want - got)[:5]} extra={sorted(got - want)[:5]}"
    )
    # the proof has teeth only if pairs actually cross batches
    slice_of = {r[0]: k for k, sl in enumerate(slices) for r in sl}
    cross = sum(1 for (_, v, c) in want if slice_of[v] != slice_of[c])
    assert cross >= 20, f"only {cross} cross-batch pairs of {len(want)}"


def test_windowed_agg_append_mode_exact_across_batches(spark, tmp_path):
    """The append+watermark PRODUCTION path of windowed_agg (the one the
    registry's complete-mode entry deliberately avoids on a finite
    source), across FOUR forced micro-batches: every window the
    advancing watermark closes is emitted exactly once with values equal
    to the batch GROUP BY, and ONLY the final window (whose end the
    watermark can never pass on a finite stream) is withheld."""
    from thundercats_spark.streaming.windows import (
        run_available_now_to_memory,
        windowed_agg,
    )

    base = datetime(2024, 1, 1, 0, 0, 0)
    slices = [[] for _ in range(4)]
    for k in range(4):
        t0 = base + timedelta(hours=k)
        for u in range(1, 4):
            slices[k].append((u, t0 + timedelta(minutes=u * 13), float(u)))
            slices[k].append((u, t0 + timedelta(minutes=59), 0.5))
    schema = "user_id long, ts timestamp, value double"
    src = str(tmp_path / "mb_agg")
    _write_slices(spark, src, slices, schema, str(tmp_path / "stage2"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = windowed_agg(
        stream, "ts", ["user_id"],
        [F.count(F.lit(1)).alias("n"), F.sum("value").alias("total")],
        window="1 hour", watermark="30 minutes",
    )
    stats = {}
    out = run_available_now_to_memory(
        agg.select("user_id", F.col("window.start").alias("ws"), "n", "total"),
        "append", stats=stats,
    )
    assert stats["data_batches"] == 4, stats

    emitted = {
        (r["ws"], r["user_id"], r["n"], r["total"]) for r in out.collect()
    }
    batch = (
        spark.read.parquet(src)
        .groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .select(F.col("w.start").alias("ws"), "user_id", "n", "total")
    )
    final_start = base + timedelta(hours=3)
    closed = {
        (r["ws"], r["user_id"], r["n"], r["total"])
        for r in batch.collect()
        if r["ws"] < final_start
    }
    stranded = {
        (r["ws"], r["user_id"], r["n"], r["total"])
        for r in batch.collect()
        if r["ws"] >= final_start
    }
    assert emitted == closed, (
        f"missing={sorted(closed - emitted)[:5]} "
        f"extra={sorted(emitted - closed)[:5]}"
    )
    assert stranded and emitted.isdisjoint(stranded)


def test_events_stream_ntz_micros_fallback_branch(spark, tmp_path):
    """The NTZ->LTZ fallback of _events_stream (ADVICE r08): sf0.1's
    events parquet carries MICROS timestamps (not nanos), which under
    the nanosAsLong flag still read as a timestamp type — possibly NTZ,
    which watermarks reject. sf0.001 pytest data always takes the
    nanos-long branch, so this writes a micros/NTZ events parquet and
    drives BOTH registered streaming queries through it, checking
    values against their batch twins."""
    from thundercats_spark.queries.analytics6 import (
        batch_view_click_pairs,
        events_stream_stream_join,
        events_stream_window_agg,
    )

    base = datetime(2024, 3, 1, 0, 0, 0)
    rows = []
    eid = 0
    for d in range(2):
        for u in range(1, 4):
            for h in (1, 5, 9):
                eid += 1
                rows.append(
                    (eid, u, "view",
                     base + timedelta(days=d, hours=h, minutes=u), float(u))
                )
                eid += 1
                rows.append(
                    (eid, u, "click",
                     base + timedelta(days=d, hours=h, minutes=u + 30),
                     float(u) / 2)
                )
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, "
        "ts timestamp, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    sf_dir = str(tmp_path / "sf_ntz")
    df.write.parquet(f"{sf_dir}/events.parquet")

    # precondition: the written file round-trips as NTZ (the branch
    # under test) — if Spark ever infers LTZ here the fixture is moot
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert raw.schema["ts"].dataType.typeName() == "timestamp_ntz", (
        raw.schema["ts"].dataType
    )

    static = raw.withColumn("ts", F.col("ts").cast("timestamp"))

    agg = events_stream_window_agg(spark, sf_dir)
    got_agg = {tuple(r) for r in agg.collect()}
    want_agg = {
        tuple(r)
        for r in static.groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .collect()
    }
    assert got_agg == want_agg

    pairs = events_stream_stream_join(spark, sf_dir)
    got_pairs = {
        (r["user_id"], r["view_id"], r["click_id"], r["secs_to_click"])
        for r in pairs.collect()
    }
    want_pairs = {
        (r["user_id"], r["view_id"], r["click_id"], 1800)
        for r in batch_view_click_pairs(static).collect()
    }
    assert got_pairs == want_pairs and len(got_pairs) == len(rows) // 2


def test_stream_scd2_parquet_maintains_interval_table(spark, tmp_path):
    """The SCD2 streaming sink: per-key day-ordered observations over
    two micro-batches (maxFilesPerTrigger=1) fold into a persisted
    interval table that equals the full batch rebuild; a replayed
    batch_id is skipped (state doc committed atomically with the
    table); scd2_as_of answers point-in-time probes off the sink."""
    from thundercats_spark.queries.analytics7 import (
        scd2_as_of,
        scd2_intervals,
        scd2_state,
        scd2_update_parquet,
    )
    from thundercats_spark.streaming.windows import stream_scd2_parquet

    base = datetime(2024, 1, 1)
    slices = [
        [(1, 10, base, "A"), (1, 11, base + timedelta(days=10), "A"),
         (2, 20, base + timedelta(days=3), "B")],
        [(1, 12, base + timedelta(days=20), "B"),
         (2, 21, base + timedelta(days=13), "B"),
         (3, 30, base + timedelta(days=15), "C")],
    ]
    schema = "k long, ok long, ts timestamp, attr string"
    src = str(tmp_path / "obs")
    _write_slices(spark, src, slices, schema, str(tmp_path / "stage_scd2"))

    path = str(tmp_path / "scd2_table")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_scd2_parquet(
        stream, path,
        key="k", ts="ts", attr="attr", tiebreak="ok",
        checkpoint=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {tuple(r) for r in spark.read.parquet(path).collect()}
    want = {
        tuple(r)
        for r in scd2_intervals(
            spark.createDataFrame(slices[0] + slices[1], schema),
            key="k", ts="ts", attr="attr", tiebreak="ok",
            with_last_seen=True,
        ).collect()
    }
    assert got == want, (sorted(got - want), sorted(want - got))
    assert scd2_state(path) == {"batch_id": 1}

    # replayed batch_id → no-op (state_doc equality inside the updater)
    replay = spark.createDataFrame(slices[1], schema)
    scd2_update_parquet(
        spark, replay, path, key="k", ts="ts", attr="attr",
        tiebreak="ok", state_doc={"batch_id": 1},
    )
    assert {tuple(r) for r in spark.read.parquet(path).collect()} == want

    # point-in-time probe off the maintained table
    snap = {
        r["k"]: r["priority"]
        for r in scd2_as_of(
            spark.read.parquet(path), "2024-01-14", key="k"
        ).collect()
    }
    assert snap == {1: "A", 2: "B"}  # key 3 born on day 15


def test_run_available_now_progress_cap_raised_and_conf_restored(
    spark, tmp_path
):
    """ADVICE r09: recentProgress is a ring buffer capped by
    spark.sql.streaming.numRecentProgressUpdates (default 100), so a
    >100-batch run would silently undercount data_batches and defeat
    the require_single_batch tripwire. run_available_now_to_memory now
    raises the cap to 10,000 for the query's lifetime and restores the
    caller's setting (or unset state) afterwards — pinned both ways."""
    from thundercats_spark.streaming.windows import (
        run_available_now_to_memory,
    )

    cap_key = "spark.sql.streaming.numRecentProgressUpdates"
    base = datetime(2024, 1, 1)
    _write_events(
        spark,
        str(tmp_path / "ev"),
        [(1, base, 1.0), (2, base + timedelta(minutes=1), 2.0)],
    )
    stream = _file_stream(spark, str(tmp_path / "ev"))

    spark.conf.set(cap_key, "123")
    try:
        stats = {}
        out = run_available_now_to_memory(
            stream.select("user_id", "value"), "append", stats=stats
        )
        assert out.count() == 2 and stats["data_batches"] >= 1
        assert spark.conf.get(cap_key) == "123"  # caller's value restored
    finally:
        spark.conf.unset(cap_key)

    out = run_available_now_to_memory(
        stream.select("user_id", "value"), "append"
    )
    assert out.count() == 2
    assert spark.conf.get(cap_key, None) is None  # unset state restored


def test_attributed_sessionizer_equals_batch_across_forced_multibatch(
    spark, tmp_path
):
    """sessionize_stream_attributed's full-fidelity claim, PROVEN
    across five forced micro-batches: closed sessions (bounds, counts,
    decimal-free sums, FIRST-TOUCH type, converted flag) equal the
    batch gaps-and-islands sessionizer + struct-min attribution over
    the same events. The construction exercises every hard case:
    a session SPANNING two batches, TWO sessions inside one batch
    (in-batch split — the simple sessionizer folds these), a
    cross-batch disordered row that retroactively TAKES OVER
    first-touch (earlier (ts, event_id) within the gap), and purchase
    conversion on either side of a split. A far-future sentinel user
    advances the watermark to close every real session; the sentinel
    itself is excluded from comparison."""
    from pyspark.sql import functions as F

    from thundercats_spark.operators.sessionize import sessionize
    from thundercats_spark.streaming.windows import (
        run_available_now_to_memory,
        sessionize_stream_attributed,
    )

    base = datetime(2024, 5, 1, 0, 0, 0)
    s = lambda sec: base + timedelta(seconds=sec)  # noqa: E731
    GAP_MS = 60_000  # 60s idle gap; watermark 10s << gap

    # (event_id, ts, user_id, event_type, value)
    slices = [
        # batch 0: u1 session A opens (view first)
        [(1, s(0), 1, "view", 1.0), (2, s(10), 1, "click", 2.0),
         (900, s(20), 999, "noise", 0.0)],
        # batch 1: u1 session A continues (within gap, crossing the
        # batch boundary) and CONVERTS; u2 opens at s(55)
        [(4, s(40), 1, "purchase", 3.0),
         (3, s(55), 2, "click", 5.0),
         (901, s(60), 999, "noise", 0.0)],
        # batch 2: DISORDERED row for u2: stamped s(52) — EARLIER than
        # u2's current first event s(55) but INSIDE the watermark
        # horizon (watermark is s(50) after batch 1; disorder must be
        # bounded by the watermark DELAY to survive the late-data
        # filter, and by the gap to fold) → takes over first-touch
        [(5, s(52), 2, "signup", 1.0),
         (902, s(80), 999, "noise", 0.0)],
        # batch 3: u3 delivers TWO complete sessions in ONE batch
        # (split at the 60s gap inside the batch): [s100,s110] purchase
        # session, then [s300] view-only
        [(6, s(100), 3, "purchase", 7.0), (7, s(110), 3, "view", 1.0),
         (8, s(300), 3, "view", 2.0),
         (903, s(320), 999, "noise", 0.0)],
        # batch 4: far-future sentinel advances the watermark past
        # every end+gap → closes all real sessions
        [(904, s(100_000), 999, "noise", 0.0)],
    ]
    schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )
    src = str(tmp_path / "attr_events")
    _write_slices(spark, src, slices, schema, str(tmp_path / "stage"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = sessionize_stream_attributed(
        stream, gap_ms=GAP_MS, watermark="10 seconds",
        convert_type="purchase",
    )
    stats = {}
    got_df = run_available_now_to_memory(out, "append", stats=stats)
    assert stats["data_batches"] == 5, stats
    got = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events,
         r.total_value, r.first_touch, r.converted)
        for r in got_df.collect() if r.user_id != 999
    )

    # batch reference: gaps-and-islands sessionize + struct-min
    # first-touch + max(converted), same events, sentinel excluded
    static = spark.read.parquet(src).where(F.col("user_id") != 999)
    sess = sessionize(
        static, user_col="user_id", ts_col="ts",
        gap_minutes=GAP_MS / 60_000, order_cols=["event_id"],
    )
    want = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events,
         r.total_value, r.first_touch, r.converted)
        for r in sess.groupBy("user_id", "session_id").agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
            F.min(F.struct("ts", "event_id", "event_type"))["event_type"]
            .alias("first_touch"),
            F.max(F.when(F.col("event_type") == "purchase", 1)
                  .otherwise(0)).alias("converted"),
        ).collect()
    )
    assert got == want, f"\ngot={got}\nwant={want}"
    # the construction's teeth: u1 spans batches and converted with
    # first_touch view; u2's first_touch was RETROACTIVELY taken over
    # by the disordered signup; u3 has exactly two sessions
    by_user = {}
    for row in got:
        by_user.setdefault(row[0], []).append(row)
    assert by_user[1][0][5:] == ("view", 1)
    assert by_user[2][0][5:] == ("signup", 0)
    assert [r[5:] for r in by_user[3]] == [("purchase", 1), ("view", 0)]


def test_attributed_sessionizer_emits_inbatch_splits_immediately(
    spark, tmp_path
):
    """A batch whose rows straddle the idle gap emits the EARLIER
    session in that same micro-batch — before any timeout — while the
    tail session stays open in state. (The simple sessionizer would
    fold both into one; this pins the fidelity difference.)"""
    from thundercats_spark.streaming.windows import (
        sessionize_stream_attributed,
    )

    base = datetime(2024, 5, 2, 0, 0, 0)
    rows = [
        (1, base, 1, "view", 1.0),
        (2, base + timedelta(seconds=5), 1, "purchase", 2.0),
        # 10-minute gap >> 60s: second session in the SAME file
        (3, base + timedelta(seconds=600), 1, "click", 4.0),
    ]
    schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )
    path = str(tmp_path / "oneshot")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(path)
    stream = spark.readStream.schema(schema).parquet(path)
    out = sessionize_stream_attributed(
        stream, gap_ms=60_000, watermark="10 seconds",
    )
    q = (
        out.writeStream.format("memory").queryName("attr_split")
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM attr_split").collect()
    finally:
        q.stop()
    assert len(got) == 1  # first session emitted, tail still open
    r = got[0]
    assert (r.n_events, r.total_value, r.first_touch, r.converted) == (
        2, 3.0, "view", 1
    )
    assert r.session_end == base + timedelta(seconds=5)


def test_attributed_sessionizer_property_random_streams(spark, tmp_path):
    """Hypothesis property: for RANDOM event streams cut into random
    time-ordered micro-batches (disorder 0 ≤ watermark delay — the
    operator's exactness condition), barrier-flushed closed sessions
    equal a naive in-Python gaps-and-islands model: same bounds,
    counts, sums, first-touch types, and conversion flags."""
    import uuid

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from thundercats_spark.streaming.windows import (
        run_available_now_to_memory,
        sessionize_stream_attributed,
    )

    GAP_S = 60
    base = datetime(2024, 7, 1)

    @st.composite
    def streams(draw):
        n = draw(st.integers(3, 14))
        rows = []
        for i in range(n):
            user = draw(st.integers(1, 2))
            sec = draw(st.integers(0, 500))
            etype = draw(st.sampled_from(["view", "click", "purchase"]))
            rows.append((i + 1, base + timedelta(seconds=sec), user,
                         etype, float(i)))
        n_cuts = draw(st.integers(0, 2))
        cuts = sorted(draw(st.lists(
            st.integers(1, n - 1), min_size=n_cuts, max_size=n_cuts,
            unique=True,
        )))
        return rows, cuts

    def model(rows):
        """Naive batch gaps-and-islands + attribution, pure Python."""
        out = []
        by_user = {}
        for eid, ts, u, et, v in rows:
            by_user.setdefault(u, []).append((ts, eid, et, v))
        for u, evs in by_user.items():
            evs.sort()
            cur = None
            for ts, eid, et, v in evs:
                if cur and (ts - cur["end"]).total_seconds() > GAP_S:
                    out.append((u, cur["start"], cur["end"], cur["n"],
                                cur["tot"], cur["ft"], cur["conv"]))
                    cur = None
                if cur is None:
                    cur = {"start": ts, "end": ts, "n": 1, "tot": v,
                           "ft": et, "conv": int(et == "purchase")}
                else:
                    cur["end"] = ts
                    cur["n"] += 1
                    cur["tot"] += v
                    cur["conv"] = max(cur["conv"], int(et == "purchase"))
            if cur:
                out.append((u, cur["start"], cur["end"], cur["n"],
                            cur["tot"], cur["ft"], cur["conv"]))
        return sorted(out)

    schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )

    @given(streams())
    @settings(max_examples=6, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    def run(data):
        rows, cuts = data
        ordered = sorted(rows, key=lambda r: (r[1], r[0]))
        slices, prev = [], 0
        for c in cuts + [len(ordered)]:
            if c > prev:
                slices.append(ordered[prev:c])
                prev = c
        max_ts = max(r[1] for r in rows)
        slices.append([(10**9, max_ts + timedelta(days=30), 999,
                        "barrier", 0.0)])
        tag = uuid.uuid4().hex[:8]
        src = str(tmp_path / f"prop_{tag}")
        _write_slices(spark, src, slices, schema,
                      str(tmp_path / f"stage_{tag}"))
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(src)
        )
        out = sessionize_stream_attributed(
            stream, gap_ms=GAP_S * 1000, watermark="10 seconds",
        )
        got_df = run_available_now_to_memory(out, "append")
        got = sorted(
            (r.user_id, r.session_start, r.session_end, r.n_events,
             r.total_value, r.first_touch, r.converted)
            for r in got_df.collect() if r.user_id != 999
        )
        assert got == model(rows), f"\ngot={got}\nmodel={model(rows)}"

    run()


def test_derive_state_partitions_hadoop_fs_uri_matches_local(spark, tmp_path):
    """VERDICT r11 #10: a path the local stat can't resolve (a file:
    URI) must size through the Hadoop FileSystem API and agree with
    the plain local-path answer; a bogus scheme-and-path returns None
    (caller keeps the session default)."""
    from thundercats_spark.streaming.windows import (
        _hadoop_fs_bytes,
        _local_path_bytes,
        derive_state_partitions,
    )

    d = tmp_path / "state_src"
    d.mkdir()
    (d / "a.bin").write_bytes(b"x" * 1024)
    sub = d / "sub"
    sub.mkdir()
    (sub / "b.bin").write_bytes(b"y" * 2048)

    local = derive_state_partitions(spark, str(d), target_bytes=1024)
    via_uri = derive_state_partitions(
        spark, f"file:{d}", target_bytes=1024
    )
    assert local == via_uri
    # byte totals agree exactly (3072 across the nested layout)
    assert _local_path_bytes(str(d)) == 3072
    assert _hadoop_fs_bytes(spark, f"file:{d}") == 3072
    # glob through the FS API too
    assert _hadoop_fs_bytes(spark, f"file:{d}/*.bin") == 1024
    # unreachable path → None, not a throw
    assert derive_state_partitions(spark, str(tmp_path / "nope")) is None
