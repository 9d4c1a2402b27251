"""Connected components (alternating large/small star) + duplicate
cluster resolution: equivalence with a sequential union-find on
random and adversarial graphs, and the resolve API contract."""

import random

import pytest
from pyspark.sql import functions as F

from langscrape_spark.operators.components import (
    connected_components,
    resolve_duplicates,
)


def _union_find_labels(edges):
    """Sequential oracle: node -> min id of its component."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp = {}
    for n in list(parent):
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for members in comp.values() for n in members}


def _spark_labels(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {
        r["id"]: r["component"]
        for r in connected_components(df).collect()
    }


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_matches_union_find_on_random_graphs(spark, seed):
    rng = random.Random(seed)
    n, m = 120, 90
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(m)
    ]
    expected = _union_find_labels([e for e in edges if e[0] != e[1]])
    assert _spark_labels(spark, edges) == expected


def test_chain_worst_case_converges(spark):
    """A 64-node path graph is the adversarial diameter case for label
    propagation; large/small star must still converge (O(log n)) and
    label everything with the chain minimum."""
    edges = [(i, i + 1) for i in range(63)]
    labels = _spark_labels(spark, edges)
    assert labels == {i: 0 for i in range(64)}


def test_descending_ids_and_duplicate_edges(spark):
    edges = [(5, 4), (4, 3), (3, 5), (5, 4), (10, 11)]
    labels = _spark_labels(spark, edges)
    assert labels == {3: 3, 4: 3, 5: 3, 10: 10, 11: 10}


def test_empty_edges(spark):
    df = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(df).count() == 0


def test_self_loops_only(spark):
    df = spark.createDataFrame([(7, 7), (9, 9)], "id_a long, id_b long")
    assert connected_components(df).count() == 0


def test_resolve_duplicates_elects_min_and_sizes(spark):
    docs = spark.range(10).withColumnRenamed("id", "doc_id")
    pairs = spark.createDataFrame(
        [(1, 4), (4, 8), (2, 3)], "id_a long, id_b long"
    )
    out = resolve_duplicates(docs, pairs, id_col="doc_id")
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 10
    for d in (1, 4, 8):
        assert rows[d]["canonical_id"] == 1
        assert rows[d]["cluster_size"] == 3
    for d in (2, 3):
        assert rows[d]["canonical_id"] == 2
        assert rows[d]["cluster_size"] == 2
    singles = {0, 5, 6, 7, 9}
    for d in singles:
        assert rows[d]["canonical_id"] == d
        assert rows[d]["cluster_size"] == 1
        assert rows[d]["is_canonical"]
    survivors = {d for d, r in rows.items() if r["is_canonical"]}
    assert survivors == {1, 2} | singles
    # dedup = keep canonical rows only
    assert out.where("is_canonical").count() == 7


def test_non_convergence_raises(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(40)],
                               "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(df, max_iterations=1)
