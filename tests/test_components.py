

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
