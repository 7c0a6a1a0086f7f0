"""Connected-components label propagation (operators/graph.py)."""

from gem_data_wrangle_spark.operators.graph import connected_components


def test_components_chain_and_singletons(spark):
    # chain 1-2-3-4-5 (diameter 4 → multiple propagation rounds),
    # separate pair 10-11, isolated vertex 99
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], "a bigint, b bigint"
    )
    vertices = spark.createDataFrame([(v,) for v in [1, 2, 3, 4, 5, 10, 11, 99]], "id bigint")
    out = connected_components(edges, "a", "b", vertices=vertices)
    got = {r["id"]: r["component"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 99: 99}


def test_components_default_vertices_from_edges(spark):
    edges = spark.createDataFrame([(7, 3), (3, 9)], "a bigint, b bigint")
    out = connected_components(edges, "a", "b")
    got = {r["id"]: r["component"] for r in out.collect()}
    assert got == {3: 3, 7: 3, 9: 3}


def test_components_max_iter_bounds_work(spark):
    # a long chain with max_iter too small still returns a labeling
    # (possibly unconverged) — the bound must not loop forever
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 12)], "a bigint, b bigint"
    )
    out = connected_components(edges, "a", "b", max_iter=3)
    assert out.count() == 12
