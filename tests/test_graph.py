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
    """ADVICE r2: exhausting max_iter before convergence means the
    labels are WRONG — the default must refuse to return them; the
    escape hatch warns."""
    import warnings

    import pytest

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 12)], "a bigint, b bigint"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, "a", "b", max_iter=3)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = connected_components(edges, "a", "b", max_iter=3, strict=False)
        assert out.count() == 12          # partial labels, opted in
    assert any("did not converge" in str(w.message) for w in caught)
    # ample bound on the same chain converges with no warning
    ok = connected_components(edges, "a", "b", max_iter=15)
    assert {r["component"] for r in ok.collect()} == {1}
