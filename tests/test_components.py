

def test_long_chain_converges_via_pointer_halving(spark):
    """A 201-node path has diameter 200: plain min-propagation would
    need 200 rounds and silently mislabel at max_iter=20; pointer
    halving converges in O(log d)."""
    from thundercats_spark.operators.components import connected_components

    edges = spark.createDataFrame([(i, i + 1) for i in range(200)], "id_a long, id_b long")
    out = connected_components(edges)
    assert out.select("component").distinct().count() == 1
    assert out.where("component != 0").count() == 0
    # two disjoint chains stay disjoint
    edges2 = edges.union(
        spark.createDataFrame([(1000 + i, 1001 + i) for i in range(50)], "id_a long, id_b long")
    )
    comp = {r["id"]: r["component"] for r in connected_components(edges2).collect()}
    assert comp[150] == 0 and comp[1040] == 1000


def test_driver_fast_path_equals_distributed(spark):
    import random

    from thundercats_spark.operators.components import connected_components

    rng = random.Random(23)
    edges = [
        (rng.randint(0, 80), rng.randint(0, 80)) for _ in range(150)
    ] + [(200, 201), (201, 202), (202, 203), (203, 204)]  # a chain
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    fast = sorted(tuple(r) for r in connected_components(df).collect())
    dist = sorted(
        tuple(r)
        for r in connected_components(df, small_graph_rows=None).collect()
    )
    assert fast == dist
    comp = dict(fast)
    assert comp[204] == 200  # the chain collapses to its min id


def test_fast_path_empty_edges(spark):
    from thundercats_spark.operators.components import connected_components

    df = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(df).count() == 0


def test_small_graph_rows_plumbed_through_callers(spark):
    """small_graph_rows=0 must force the distributed CC path through a
    CALLER (not just connected_components directly) and produce the
    same groups — the config hook for small-driver deployments."""
    from thundercats_spark.operators.components import dedup_groups

    df = spark.createDataFrame(
        [(i, f"t{i}") for i in range(6)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5)], "id_a long, id_b long"
    )
    fast = dedup_groups(df, pairs)  # default: driver union-find
    forced = dedup_groups(df, pairs, small_graph_rows=None)  # distributed
    canon = lambda d: sorted(
        (r["doc_id"], r["group_id"], r["group_size"]) for r in d.collect()
    )
    assert canon(fast) == canon(forced)


def test_small_graph_rows_plumbed_leakage_safe_split(spark):
    from thundercats_spark.operators.curation import corpus_split_leakage_safe

    df = spark.createDataFrame(
        [(i, "x") for i in range(8)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(0, 3), (3, 6)], "id_a long, id_b long")
    w = {"train": 0.8, "test": 0.2}
    fast = corpus_split_leakage_safe(df, pairs, w)
    forced = corpus_split_leakage_safe(df, pairs, w, small_graph_rows=None)
    canon = lambda d: sorted(
        (r["doc_id"], r["group_rep"], r["split"]) for r in d.collect()
    )
    assert canon(fast) == canon(forced)


def test_iterative_path_chain_plus_hub_iterations_and_equality(spark):
    """VERDICT r06 #6: since the driver fast path landed, the
    ITERATIVE path never ran on the adversarial shapes it exists for.
    Force it (small_graph_rows=0) on a long chain (diameter 512) plus
    a hot hub, assert pointer-halving converges in <= log2(diameter)+2
    rounds (plain propagation would need ~diameter and silently
    mislabel at max_iter=20), and pin exact equality with the
    union-find fast path."""
    import math

    from thundercats_spark.operators.components import connected_components

    chain = [(i, i + 1) for i in range(512)]  # path: diameter 512
    hub = [(10_000, 10_000 + j) for j in range(1, 200)]  # star
    bridge = [(400, 10_050)]  # fuse them into one component
    iso = [(20_000, 20_001)]  # plus a separate tiny component
    edges = spark.createDataFrame(
        chain + hub + bridge + iso, "id_a long, id_b long"
    )
    stats: dict = {}
    out = connected_components(edges, small_graph_rows=0, stats=stats)
    got = sorted(tuple(r) for r in out.collect())
    assert stats["path"] == "iterative"
    bound = math.ceil(math.log2(512)) + 2  # 11
    assert stats["iterations"] <= bound, stats
    ref = sorted(
        tuple(r)
        for r in connected_components(edges, small_graph_rows=10**9).collect()
    )
    assert got == ref
    comp = dict(got)
    assert comp[512] == 0 and comp[10_199] == 0 and comp[20_001] == 20_000
