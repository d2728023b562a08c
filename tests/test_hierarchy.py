"""hierarchy_paths: pointer-doubling forest closure
(operators/hierarchy.py). Pins exactness vs a driver-side model walk,
the log2 iteration bound on a deep chain, and the loud contracts
(cycles, NULL links, multi-parent children)."""

import pytest

from thundercats_spark.operators.hierarchy import hierarchy_paths


def _model(edges):
    parent = dict(edges)

    def walk(n):
        d = 0
        while n in parent:
            n = parent[n]
            d += 1
        return n, d

    nodes = set(parent) | set(parent.values())
    return {n: walk(n) for n in nodes}


def test_forest_exact_vs_model(spark):
    # two trees + a chain, mixed fan-out
    edges = [
        (2, 1), (3, 1), (4, 2), (5, 2), (6, 4),   # tree rooted at 1
        (20, 10), (21, 20), (22, 21), (23, 22),   # chain rooted at 10
    ]
    df = spark.createDataFrame(edges, "child long, parent long")
    got = {
        r["node"]: (r["root_key"], r["depth"])
        for r in hierarchy_paths(df, "child", "parent").collect()
    }
    assert got == _model(edges)


def test_deep_chain_converges_in_log_iterations(spark):
    """A 512-deep chain must converge in ceil(log2(512)) + a couple
    iterations — the pointer-doubling contract. max_iters=12 would be
    exceeded by any O(depth) formulation (512 steps)."""
    n = 512
    edges = [(i, i - 1) for i in range(1, n + 1)]
    df = spark.createDataFrame(edges, "child long, parent long")
    out = hierarchy_paths(df, "child", "parent", max_iters=12)
    rows = {r["node"]: (r["root_key"], r["depth"]) for r in out.collect()}
    assert rows[n] == (0, n)
    assert rows[0] == (0, 0)
    assert rows[1] == (0, 1)
    assert len(rows) == n + 1


def test_cycle_raises_loudly(spark):
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (9, 1)], "child long, parent long"
    )
    with pytest.raises(RuntimeError, match="CYCLE"):
        hierarchy_paths(df, "child", "parent", max_iters=8)


def test_null_link_raises(spark):
    df = spark.createDataFrame(
        [(2, 1), (3, None)], "child long, parent long"
    )
    with pytest.raises(ValueError, match="NULL"):
        hierarchy_paths(df, "child", "parent")


def test_multi_parent_raises(spark):
    df = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 1)], "child long, parent long"
    )
    with pytest.raises(ValueError, match="DAG"):
        hierarchy_paths(df, "child", "parent")


def test_custom_column_names_and_string_keys(spark):
    df = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("z", "a")], "kid string, boss string"
    )
    got = {
        r["node"]: (r["root_key"], r["depth"])
        for r in hierarchy_paths(df, "kid", "boss").collect()
    }
    assert got == {
        "a": ("a", 0), "b": ("a", 1), "c": ("a", 2), "z": ("a", 1),
    }


def test_self_loop_is_a_cycle_not_a_root(spark):
    """A self-loop edge also satisfies node == anc — the root test must
    additionally require d == 0, or a length-1 cycle converges
    'successfully' with depth 1."""
    df = spark.createDataFrame(
        [(1, 1), (2, 1)], "child long, parent long"
    )
    with pytest.raises(RuntimeError, match="CYCLE"):
        hierarchy_paths(df, "child", "parent", max_iters=6)


def test_duplicate_edge_rows_get_their_own_message(spark):
    """Review r08: an exact-duplicate (child, parent) row is a valid
    forest with a caller-side fix (.distinct()) — it must not be
    misdiagnosed as a multi-parent DAG."""
    df = spark.createDataFrame(
        [(2, 1), (2, 1), (3, 1)], "child long, parent long"
    )
    with pytest.raises(ValueError, match="duplicate edge"):
        hierarchy_paths(df, "child", "parent")
