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


# ---------------------------------------------------------------------------
# Label propagation (q96)
# ---------------------------------------------------------------------------

def test_lpa_two_cliques_one_bridge(spark):
    """Two triangles joined by one bridge: one component, but LPA finds
    two communities (labels collapse to each family's min host)."""
    from langscrape_spark.operators.components import label_propagation

    # 4-cliques: a 3-clique is too small — the bridge node's in-family
    # votes (2 + self) exactly tie its adopted-min-label votes and the
    # min tie-break keeps it cross-family
    clique = lambda p: [
        (f"{p}{i}", f"{p}{j}") for i in range(4) for j in range(i + 1, 4)
    ]
    edges = spark.createDataFrame(
        clique("a") + clique("b") + [("a0", "b0")],
        "src_host string, dst_host string",
    )
    rows = {r["host"]: (r["community"], r["community_size"])
            for r in label_propagation(edges, iterations=4).collect()}
    assert {rows[f"a{i}"][0] for i in range(4)} == {"a0"}
    assert {rows[f"b{i}"][0] for i in range(4)} == {"b0"}
    assert rows["a0"][1] == 4 and rows["b1"][1] == 4


def test_lpa_isolated_self_vote_and_determinism(spark):
    """A node with only a self-loop keeps its own label; two runs are
    byte-identical (deterministic tie-breaks)."""
    from langscrape_spark.operators.components import label_propagation

    edges = spark.createDataFrame(
        [("solo", "solo"), ("x", "y")], "src_host string, dst_host string"
    )
    out1 = sorted(map(tuple, label_propagation(edges, iterations=3).collect()))
    out2 = sorted(map(tuple, label_propagation(edges, iterations=3).collect()))
    assert out1 == out2
    d = {h: c for h, c, _ in out1}
    assert d["solo"] == "solo"
    assert d["x"] == d["y"] == "x"
