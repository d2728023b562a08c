"""Custom operators: as-of join + sessionize semantics on literal data."""

from datetime import datetime

import pyspark.sql.functions as F

from thundercats_spark.operators.asof import asof_join
from thundercats_spark.operators.sessionize import sessionize


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_basic(spark):
    trades = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:05"), "t1"), (1, _ts("2024-01-01 10:00:20"), "t2"),
         (2, _ts("2024-01-01 10:00:10"), "t3")],
        "sym int, t timestamp, trade string",
    )
    quotes = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), 100.0), (1, _ts("2024-01-01 10:00:10"), 101.0),
         (2, _ts("2024-01-01 10:00:30"), 200.0)],
        "sym int, qt timestamp, px double",
    )
    out = asof_join(trades, quotes, "sym", "sym", "t", "qt").collect()
    got = {r["trade"]: r["px"] for r in out}
    # t1 at 10:00:05 → quote 10:00:00; t2 at 10:00:20 → quote 10:00:10;
    # t3 has no quote at/before 10:00:10 → dropped
    assert got == {"t1": 100.0, "t2": 101.0}


def test_asof_equal_ts_included(spark):
    left = spark.createDataFrame([(1, _ts("2024-01-01 10:00:10"), "x")], "k int, t timestamp, tag string")
    right = spark.createDataFrame([(1, _ts("2024-01-01 10:00:10"), 5.0)], "k int, rt timestamp, v double")
    out = asof_join(left, right, "k", "k", "t", "rt").collect()
    assert len(out) == 1 and out[0]["v"] == 5.0


def test_asof_keep_unmatched(spark):
    left = spark.createDataFrame([(1, _ts("2024-01-01 09:00:00"), "early")], "k int, t timestamp, tag string")
    right = spark.createDataFrame([(1, _ts("2024-01-01 10:00:00"), 5.0)], "k int, rt timestamp, v double")
    assert asof_join(left, right, "k", "k", "t", "rt").count() == 0
    kept = asof_join(left, right, "k", "k", "t", "rt", keep_unmatched=True).collect()
    assert len(kept) == 1 and kept[0]["v"] is None


def test_asof_single_shuffle(spark):
    left = spark.createDataFrame([(1, _ts("2024-01-01 10:00:05"), "a")], "k int, t timestamp, tag string")
    right = spark.createDataFrame([(1, _ts("2024-01-01 10:00:00"), 1.0)], "k int, rt timestamp, v double")
    plan = asof_join(left, right, "k", "k", "t", "rt")._jdf.queryExecution().executedPlan().toString()
    # union formulation: no join operator at all, exactly one window exchange
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_sessionize(spark):
    ev = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00")),
            (1, _ts("2024-01-01 10:10:00")),   # same session (10 min gap)
            (1, _ts("2024-01-01 11:00:00")),   # new session (50 min gap)
            (2, _ts("2024-01-01 10:00:00")),
        ],
        "user_id int, ts timestamp",
    )
    out = sessionize(ev, gap_minutes=30).collect()
    got = {(r["user_id"], r["ts"].isoformat()): r["session_id"] for r in out}
    assert got[(1, "2024-01-01T10:00:00")] == 1
    assert got[(1, "2024-01-01T10:10:00")] == 1
    assert got[(1, "2024-01-01T11:00:00")] == 2
    assert got[(2, "2024-01-01T10:00:00")] == 1


def test_sessionize_gap_boundary_inclusive(spark):
    # exactly 30:00.000000 gap stays in-session (<=)
    ev = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00")), (1, _ts("2024-01-01 10:30:00"))],
        "user_id int, ts timestamp",
    )
    out = sessionize(ev, gap_minutes=30).select(F.max("session_id").alias("m")).first()
    assert out["m"] == 1


def test_connected_components_chain(spark):
    from thundercats_spark.operators.components import connected_components

    # chain 1-2-3-4 plus isolated pair 10-11: transitivity needs >1 hop
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    out = {r["id"]: r["component"] for r in connected_components(edges).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_converges_deep_chain(spark):
    from thundercats_spark.operators.components import connected_components

    n = 20  # diameter 20 → exercises checkpointing + multiple rounds
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    out = {r["id"]: r["component"] for r in connected_components(edges).collect()}
    assert set(out.values()) == {0}


def test_connected_components_reliable_checkpoint(spark, tmp_path):
    """reliable=True cuts lineage via fault-tolerant checkpoint() files
    in the checkpoint dir (restartable long dedup runs), same answer."""
    from thundercats_spark.operators.components import connected_components

    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    out = {
        r["id"]: r["component"]
        for r in connected_components(edges, reliable=True).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}
    ckpts = list((tmp_path / "ckpt").rglob("*"))
    assert ckpts, "reliable mode must write checkpoint files"


def test_dedup_groups_transitive(spark):
    from thundercats_spark.operators.components import dedup_groups

    docs = spark.createDataFrame(
        [(i, f"text{i}") for i in range(6)], "doc_id long, text string"
    )
    # 0~1, 1~2 (transitive trio); 4~5; 3 alone
    pairs = spark.createDataFrame([(0, 1), (1, 2), (4, 5)], "id_a long, id_b long")
    out = dedup_groups(docs, pairs).collect()
    kept = {r["doc_id"]: r["group_size"] for r in out}
    # greedy min-id would also keep 2 here; the trio proves transitivity
    assert kept == {0: 3, 3: 1, 4: 2}


def test_resample_ffill(spark):
    from thundercats_spark.operators.resample import resample_ffill

    ev = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:15:00"), 1.0),
            (1, _ts("2024-01-01 13:45:00"), 5.0),
            (2, _ts("2024-01-01 10:30:00"), 9.0),
        ],
        "user_id int, ts timestamp, value double",
    )
    out = resample_ffill(ev, "user_id", "ts", "value", step="1 hour")
    got = {(r["user_id"], r["grid_ts"].isoformat()): r["value"] for r in out.collect()}
    # user 1: grid 10:00..13:00; 10:00 precedes the first obs → null
    assert got[(1, "2024-01-01T10:00:00")] is None
    assert got[(1, "2024-01-01T11:00:00")] == 1.0
    assert got[(1, "2024-01-01T12:00:00")] == 1.0
    assert got[(1, "2024-01-01T13:00:00")] == 1.0
    assert (1, "2024-01-01T14:00:00") not in got  # grid ends at trunc(max)
    # user 2's only grid point (10:00) precedes its first obs (10:30):
    # as-of semantics → unfilled
    assert got[(2, "2024-01-01T10:00:00")] is None
