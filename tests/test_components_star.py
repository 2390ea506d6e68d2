"""Large-star/small-star connected components: agreement with the
propagation form and round-count advantage on high-diameter graphs."""

import random

from pyspark.sql import functions as F

from deltacat_spark.operators.dedupe import (
    connected_components,
    connected_components_star,
)


def _labels(df):
    return {r.doc_id: r.cluster_id for r in df.collect()}


def test_star_cc_chain_graph(spark):
    """A 60-node chain (diameter 59): star CC must resolve it in
    O(log² n) rounds — well under the 50-iteration cap — and label
    every node with the chain minimum."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], ["doc_a", "doc_b"]
    )
    got = _labels(connected_components_star(pairs))
    assert got == {i: 0 for i in range(61)}


def test_star_cc_matches_propagation_on_random_graph(spark):
    rng = random.Random(7)
    edges = set()
    while len(edges) < 120:
        a, b = rng.randrange(200), rng.randrange(200)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    pairs = spark.createDataFrame(sorted(edges), ["doc_a", "doc_b"])
    star = _labels(connected_components_star(pairs))
    prop = _labels(connected_components(pairs))
    assert star == prop


def test_star_cc_isolated_pair_and_clique(spark):
    pairs = spark.createDataFrame(
        [(10, 11)] + [(a, b) for a in range(5) for b in range(a + 1, 5)],
        ["doc_a", "doc_b"],
    )
    got = _labels(connected_components_star(pairs))
    assert got == {**{i: 0 for i in range(5)}, 10: 10, 11: 10}


def test_adaptive_cc_driver_and_distributed_paths_agree(spark):
    """connected_components picks driver union-find under the edge
    bound and propagation above it — both must produce identical
    min-id labelings (and agree with star CC)."""
    rng = random.Random(13)
    edges = set()
    while len(edges) < 150:
        a, b = rng.randrange(300), rng.randrange(300)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    pairs = spark.createDataFrame(sorted(edges), ["doc_a", "doc_b"])
    driver = _labels(connected_components(pairs))  # under the bound
    dist = _labels(connected_components(pairs, driver_max_edges=None))
    star = _labels(connected_components_star(pairs))
    assert driver == dist == star


def test_adaptive_cc_chain_graph_driver_path(spark):
    """Chains are the propagation form's worst case (O(diameter)
    rounds); the driver path handles them in one pass."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(500)], ["doc_a", "doc_b"]
    )
    got = _labels(connected_components(pairs))
    assert got == {i: 0 for i in range(501)}
