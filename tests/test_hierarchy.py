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


# ---------------------------------------------------------------------------
# dag_reachability (VERDICT r08 #7): the multi-parent case.
# ---------------------------------------------------------------------------


def _brute_reachability(edges):
    """Python model: DFS over the child→parent DAG computing, per node,
    every reachable ancestor's min/max path length (roots = nodes with
    no parent; each root also maps to itself at 0/0)."""
    from collections import defaultdict

    parents = defaultdict(list)
    nodes = set()
    for c, p in edges:
        parents[c].append(p)
        nodes.update((c, p))
    roots = {n for n in nodes if n not in parents}

    memo = {}

    def anc(n):  # {ancestor: (min_d, max_d)} for paths of length >= 1
        if n in memo:
            return memo[n]
        out = {}
        for p in parents.get(n, ()):
            cand = {p: (1, 1)}
            for a, (lo, hi) in anc(p).items():
                cand[a] = (lo + 1, hi + 1)
            for a, (lo, hi) in cand.items():
                if a in out:
                    out[a] = (min(out[a][0], lo), max(out[a][1], hi))
                else:
                    out[a] = (lo, hi)
        memo[n] = out
        return out

    expected = set()
    for n in nodes:
        for a, (lo, hi) in anc(n).items():
            if a in roots:
                expected.add((n, a, lo, hi))
    for r in roots:
        expected.add((r, r, 0, 0))
    return expected


def test_dag_diamond_min_max_depths(spark):
    """Diamond d→{b,c}→a plus a shortcut d→a: min path 1, max path 2 —
    the multi-parent shape hierarchy_paths rejects, solved exactly."""
    from thundercats_spark.operators.hierarchy import dag_reachability

    edges = [(4, 2), (4, 3), (2, 1), (3, 1), (4, 1)]
    df = spark.createDataFrame(edges, "child long, parent long")
    stats = {}
    got = {
        tuple(r)
        for r in dag_reachability(df, "child", "parent", stats=stats).collect()
    }
    assert got == _brute_reachability(edges)
    # the shortcut makes node 4's (min, max) = (1, 2) to root 1
    assert (4, 1, 1, 2) in got
    assert stats["iterations"] <= 3


def test_dag_matches_brute_force_on_random_layered_dag(spark):
    """Model equality on a seeded random layered DAG (6 layers × 5
    nodes, each node wired to 1-3 random parents in earlier layers) —
    multi-root, multi-path, uneven depths."""
    import random

    from thundercats_spark.operators.hierarchy import dag_reachability

    rng = random.Random(42)
    layers = [[f"L{i}N{j}" for j in range(5)] for i in range(6)]
    edges = []
    for i in range(1, 6):
        for n in layers[i]:
            above = [m for lay in layers[:i] for m in lay]
            for p in rng.sample(above, rng.randint(1, 3)):
                edges.append((n, p))
    edges = sorted(set(edges))
    df = spark.createDataFrame(edges, "child string, parent string")
    stats = {}
    got = {
        tuple(r)
        for r in dag_reachability(df, "child", "parent", stats=stats).collect()
    }
    assert got == _brute_reachability(edges)
    # depth <= 5 → ceil(log2(5)) + fixpoint-confirm rounds
    assert stats["iterations"] <= 4


def test_dag_forest_parity_with_hierarchy_paths(spark):
    """On a plain forest the DAG operator degenerates to
    hierarchy_paths exactly, with min == max == depth."""
    from thundercats_spark.operators.hierarchy import (
        dag_reachability,
        hierarchy_paths,
    )

    edges = [(2, 1), (3, 1), (4, 2), (5, 4), (7, 6)]
    df = spark.createDataFrame(edges, "child long, parent long")
    forest = {
        (r["node"], r["root_key"], r["depth"], r["depth"])
        for r in hierarchy_paths(df, "child", "parent").collect()
    }
    dag = {tuple(r) for r in dag_reachability(df, "child", "parent").collect()}
    assert dag == forest


def test_dag_log_iterations_on_deep_chain(spark):
    """A 100-deep chain converges in ~log2(100) squaring rounds, not
    100 — the telemetry pin mirroring the forest operator's."""
    from thundercats_spark.operators.hierarchy import dag_reachability

    df = spark.createDataFrame(
        [(i + 1, i) for i in range(100)], "child long, parent long"
    )
    stats = {}
    got = dag_reachability(df, "child", "parent", stats=stats)
    rows = {r["node"]: r for r in got.collect()}
    assert rows[100]["root_key"] == 0
    assert rows[100]["min_depth"] == rows[100]["max_depth"] == 100
    assert len(rows) == 101  # every node + the root self-row
    assert stats["iterations"] <= 8  # ceil(log2(100)) + fixpoint confirm

    # roots_only=False reports the FULL pair closure (chain: n*(n+1)/2)
    full = dag_reachability(
        spark.createDataFrame(
            [(i + 1, i) for i in range(10)], "child long, parent long"
        ),
        "child", "parent", roots_only=False,
    )
    assert full.count() == 10 * 11 // 2


def test_dag_cycle_and_guards_raise_loudly(spark):
    """Cycles hit the max_iters tripwire naming the cause; NULL links
    and duplicate edges reuse the forest operator's loud contract."""
    import pytest

    from thundercats_spark.operators.hierarchy import dag_reachability

    cyc = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "child long, parent long"
    )
    with pytest.raises(RuntimeError, match="CYCLE"):
        dag_reachability(cyc, "child", "parent", max_iters=6)

    nul = spark.createDataFrame(
        [(1, None), (2, 1)], "child long, parent long"
    )
    with pytest.raises(ValueError, match="NULL"):
        dag_reachability(nul, "child", "parent")

    dup = spark.createDataFrame(
        [(2, 1), (2, 1)], "child long, parent long"
    )
    with pytest.raises(ValueError, match="duplicate edge"):
        dag_reachability(dup, "child", "parent")


def test_dag_root_labels_equals_squaring_operator(spark):
    """dag_root_labels (level propagation) and dag_reachability
    (squaring) are two cost models for ONE answer: pinned equal on the
    diamond-with-shortcut, the seeded random layered DAG, and a forest
    (where both equal hierarchy_paths)."""
    import random

    from thundercats_spark.operators.hierarchy import (
        dag_reachability,
        dag_root_labels,
    )

    def both(edges, schema):
        df = spark.createDataFrame(edges, schema)
        a = {tuple(r) for r in dag_root_labels(df, "child", "parent").collect()}
        b = {tuple(r) for r in dag_reachability(df, "child", "parent").collect()}
        return a, b

    a, b = both([(4, 2), (4, 3), (2, 1), (3, 1), (4, 1)], "child long, parent long")
    assert a == b and (4, 1, 1, 2) in a

    rng = random.Random(42)
    layers = [[f"L{i}N{j}" for j in range(5)] for i in range(6)]
    edges = []
    for i in range(1, 6):
        for n in layers[i]:
            above = [m for lay in layers[:i] for m in lay]
            for p in rng.sample(above, rng.randint(1, 3)):
                edges.append((n, p))
    a, b = both(sorted(set(edges)), "child string, parent string")
    assert a == b

    a, b = both([(2, 1), (3, 1), (4, 2), (5, 4), (7, 6)], "child long, parent long")
    assert a == b


def test_dag_root_labels_rounds_track_longest_path(spark):
    """The telemetry contract that distinguishes the two operators: on
    a depth-20 chain the level walk takes ~20 rounds (O(depth)) where
    the squaring operator takes ~6; on a depth-2 bush it takes ~3."""
    from thundercats_spark.operators.hierarchy import dag_root_labels

    chain = spark.createDataFrame(
        [(i + 1, i) for i in range(20)], "child long, parent long"
    )
    stats = {}
    out = {r["node"]: r for r in dag_root_labels(chain, "child", "parent", stats=stats).collect()}
    assert out[20]["min_depth"] == out[20]["max_depth"] == 20
    assert 20 <= stats["iterations"] <= 22, stats["iterations"]

    bush = spark.createDataFrame(
        [(i, 0) for i in range(1, 40)] + [(100 + i, i) for i in range(1, 40)],
        "child long, parent long",
    )
    stats = {}
    dag_root_labels(bush, "child", "parent", stats=stats).count()
    assert stats["iterations"] <= 3, stats["iterations"]


def test_dag_root_labels_cycle_and_guards(spark):
    import pytest

    from thundercats_spark.operators.hierarchy import dag_root_labels

    cyc = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (1, 0)], "child long, parent long"
    )
    with pytest.raises(RuntimeError, match="CYCLE"):
        dag_root_labels(cyc, "child", "parent", max_iters=10)

    dup = spark.createDataFrame([(2, 1), (2, 1)], "child long, parent long")
    with pytest.raises(ValueError, match="duplicate edge"):
        dag_root_labels(dup, "child", "parent")


def test_dag_root_labels_rootless_graph_raises(spark):
    """A fully cyclic edge set has no roots — the operator must raise
    rather than silently return an empty frame (the quiet twin of the
    max_iters cycle tripwire)."""
    import pytest

    from thundercats_spark.operators.hierarchy import dag_root_labels

    pure_cycle = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "child long, parent long"
    )
    with pytest.raises(RuntimeError, match="no roots"):
        dag_root_labels(pure_cycle, "child", "parent")


def test_dag_root_labels_root_unreachable_cycle_raises(spark):
    """ADVICE r09: a cyclic SUBGRAPH unreachable from any root never
    enters the frontier, so the loop converges normally — the old code
    silently OMITTED those nodes while the pinned-equal twin
    dag_reachability raised on the same input. Both operators must now
    raise, naming the unlabelled nodes."""
    import pytest

    from thundercats_spark.operators.hierarchy import (
        dag_reachability,
        dag_root_labels,
    )

    # root 0 -> 1 is a healthy tree; 10 <-> 11 is an island cycle no
    # root can reach (both have parents, so neither is a root)
    edges = spark.createDataFrame(
        [(1, 0), (10, 11), (11, 10)], "child long, parent long"
    )
    with pytest.raises(RuntimeError, match="UNREACHABLE"):
        dag_root_labels(edges, "child", "parent")
    with pytest.raises(RuntimeError):  # sibling contract, same input
        dag_reachability(edges, "child", "parent", max_iters=8)

    # healthy forest with multiple roots still converges cleanly
    ok = spark.createDataFrame(
        [(1, 0), (2, 1), (5, 4)], "child long, parent long"
    )
    got = {tuple(r) for r in dag_root_labels(ok, "child", "parent").collect()}
    assert (2, 0, 2, 2) in got and (5, 4, 1, 1) in got
