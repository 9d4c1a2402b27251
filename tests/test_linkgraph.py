"""Anchor-text link-graph: kernel harvest + rollup operator."""

import pytest
from pyspark.sql import functions as F

from langscrape_spark.html.links import extract_links_with_anchors
from langscrape_spark.operators.linkgraph import anchor_rollup, link_edges


class TestAnchorHarvest:
    def test_anchors_collapse_whitespace_and_keep_duplicates(self):
        html = """
        <p><a href="/a">  First   <b>Link</b> </a>
           <a href="/a">second link</a>
           <a href="/b"><img src="x.png"></a>
           <a href="javascript:void(0)">skip</a>
           <a>no href</a></p>
        """
        got = extract_links_with_anchors(html, "https://ex.com/base/")
        assert got == [
            ("https://ex.com/a", "First Link"),
            ("https://ex.com/a", "second link"),  # duplicate target kept
            ("https://ex.com/b", ""),  # image link: empty anchor
        ]

    def test_resolution_and_normalization_match_extract_links(self):
        from langscrape_spark.html.links import extract_links

        html = '<a href="next%20page?x=1#frag">n</a><a href="HTTP://EX.COM/Y">y</a>'
        urls = [u for u, _ in extract_links_with_anchors(html, "https://ex.com/base/")]
        assert urls == extract_links(html, "https://ex.com/base/")


class TestAnchorRollup:
    @pytest.fixture(scope="class")
    def edges(self, spark):
        rows = [
            ("https://a.com/1", "https://t.com/x", "Spark engine docs"),
            ("https://a.com/2", "https://t.com/x", "spark ENGINE"),
            ("https://b.com/1", "https://t.com/x", "engine!"),
            ("https://b.com:8080/2", "https://t.com/y", ""),
        ]
        return spark.createDataFrame(rows, "src_url string, dst_url string, anchor string")

    def test_rollup_counts_hosts_and_topk(self, edges):
        out = {r["dst_url"]: r for r in anchor_rollup(edges, k=2).collect()}
        x = out["https://t.com/x"]
        assert x["in_degree"] == 3
        assert x["n_src_hosts"] == 2  # a.com, b.com
        # engine:3 > spark:2 > docs:1 — k=2 keeps engine|spark
        assert x["top_terms"] == "engine|spark"
        y = out["https://t.com/y"]
        assert y["in_degree"] == 1
        assert y["n_src_hosts"] == 1  # port stripped from b.com:8080
        assert y["top_terms"] == ""  # empty anchor → no terms row

    def test_tie_break_is_term_ascending(self, spark):
        rows = [("s", "d", "beta alpha")]
        df = spark.createDataFrame(rows, "src_url string, dst_url string, anchor string")
        assert anchor_rollup(df, k=2).collect()[0]["top_terms"] == "alpha|beta"


class TestLinkEdges:
    def test_pages_to_edges_via_kernel(self, spark):
        html = (
            '<a href="/p/1">One Two</a><a href="/p/1">one</a>'
            '<a href="/p/2">Other</a>'
        )
        pages = spark.createDataFrame(
            [("https://h.com/root", html), ("https://h.com/none", "<p>no links</p>")],
            "url string, html string",
        )
        edges = link_edges(pages).orderBy("dst_url", "anchor").collect()
        assert [(e["src_url"], e["dst_url"], e["anchor"]) for e in edges] == [
            ("https://h.com/root", "https://h.com/p/1", "One Two"),
            ("https://h.com/root", "https://h.com/p/1", "one"),
            ("https://h.com/root", "https://h.com/p/2", "Other"),
        ]
        rolled = anchor_rollup(link_edges(pages)).orderBy("dst_url").collect()
        assert rolled[0]["top_terms"] == "one|two"

    def test_binary_html_column(self, spark):
        pages = spark.createDataFrame(
            [("https://h.com/", b'<a href="/z">Z</a>')], "url string, html binary"
        )
        out = link_edges(pages).collect()
        assert out[0]["dst_url"] == "https://h.com/z"


def test_reciprocal_link_stats_clique_vs_organic(spark):
    """A 3-host clique flags as a farm; a star (hub with one-way
    outlinks) does not; self-loops and duplicate edges are ignored."""
    from langscrape_spark.operators.linkgraph import reciprocal_link_stats

    edges = [
        # clique a<->b<->c<->a
        ("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"), ("a", "c"),
        ("c", "a"),
        ("a", "b"),          # duplicate
        ("a", "a"),          # self-loop
        # hub: one-way out to 4 targets, nobody links back
        ("hub", "t1"), ("hub", "t2"), ("hub", "t3"), ("hub", "t4"),
        # one organic backlink pair below min_out
        ("t1", "x"), ("x", "t1"),
    ]
    df = spark.createDataFrame(edges, ["src_host", "dst_host"])
    out = {r["host"]: r for r in reciprocal_link_stats(
        df, min_out=2, min_recip_share=0.6).collect()}
    assert out["a"]["out_deg"] == 2 and out["a"]["n_recip"] == 2
    assert out["a"]["is_farm"] and out["b"]["is_farm"] and out["c"]["is_farm"]
    assert out["hub"]["out_deg"] == 4 and out["hub"]["n_recip"] == 0
    assert not out["hub"]["is_farm"]
    assert out["t1"]["n_recip"] == 1 and not out["t1"]["is_farm"]  # out_deg 1 < min_out
    assert "t2" not in out  # no outlinks -> no row


def test_reciprocal_link_stats_plans_equi_joins(spark):
    from langscrape_spark.operators.linkgraph import reciprocal_link_stats

    df = spark.createDataFrame([("a", "b"), ("b", "a")],
                               ["src_host", "dst_host"])
    plan = reciprocal_link_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "EvalPython" not in plan


# ---------------------------------------------------------------------------
# Co-citation / bibliographic coupling (q93)
# ---------------------------------------------------------------------------

def test_cocitation_coupling_hand_graph(spark):
    """s1->{a,b,c}, s2->{a,b}: cocitation(a,b)=2 (both srcs), (a,c) and
    (b,c)=1 (below min_strength 2 -> filtered unless coupling rescues);
    coupling(s1,s2)=2 via shared {a,b}."""
    from langscrape_spark.operators.linkgraph import cocitation_coupling

    edges = spark.createDataFrame(
        [
            ("s1", "a"), ("s1", "b"), ("s1", "c"),
            ("s2", "a"), ("s2", "b"),
            ("s2", "a"),           # duplicate must dedup
            ("x", "x"),            # self-loop dropped
        ],
        "src_host string, dst_host string",
    )
    rows = {
        (r["host_a"], r["host_b"]): (r["cocitation"], r["coupling"])
        for r in cocitation_coupling(edges, min_strength=2).collect()
    }
    assert rows == {("a", "b"): (2, 0), ("s1", "s2"): (0, 2)}


def test_cocitation_fanout_cap_excludes_hubs(spark):
    """A src over the fanout cap contributes no co-citation pairs; a
    dst over the cap contributes no coupling pairs."""
    from langscrape_spark.operators.linkgraph import cocitation_coupling

    hub = [("hub", f"d{i}") for i in range(5)]
    organic = [("s1", "d0"), ("s1", "d1"), ("s2", "d0"), ("s2", "d1")]
    edges = spark.createDataFrame(
        hub + organic, "src_host string, dst_host string"
    )
    rows = {
        (r["host_a"], r["host_b"]): (r["cocitation"], r["coupling"])
        for r in cocitation_coupling(
            edges, max_fanout=4, min_strength=2
        ).collect()
    }
    # hub (out-deg 5 > 4) excluded from co-citation; d0/d1 (in-deg 3)
    # fine for coupling between s1/s2 (hub still couples via capped dsts
    # d2..d4? no - those have in-degree 1, only hub links them)
    assert rows[("d0", "d1")] == (2, 0)
    assert rows[("s1", "s2")][1] == 2


# ---------------------------------------------------------------------------
# HITS (q94)
# ---------------------------------------------------------------------------

def test_hits_star_graph_analytic(spark):
    """hub -> {a,b,c}: the only hub is 'hub' (score 1), authorities
    split evenly (1/3 each) at every iteration — analytic fixed point."""
    from langscrape_spark.operators.hostrank import hits

    edges = spark.createDataFrame(
        [("hub", "a"), ("hub", "b"), ("hub", "c")],
        "src_host string, dst_host string",
    )
    rows = {r["host"]: (r["authority"], r["hub"]) for r in hits(edges, 3).collect()}
    assert rows["hub"] == (0.0, 1.0)
    for h in "abc":
        assert abs(rows[h][0] - round(1 / 3, 6)) < 1e-9
        assert rows[h][1] == 0.0


def test_hits_empty_and_selfloop(spark):
    import pytest as _pytest

    from langscrape_spark.operators.hostrank import hits

    empty = spark.createDataFrame([], "src_host string, dst_host string")
    assert hits(empty).count() == 0
    with _pytest.raises(ValueError):
        hits(empty, iterations=0)
    loops = spark.createDataFrame(
        [("a", "a"), ("a", "b")], "src_host string, dst_host string"
    )
    rows = {r["host"]: (r["authority"], r["hub"]) for r in hits(loops, 2).collect()}
    # self-loop dropped: pure 2-node chain
    assert rows == {"a": (0.0, 1.0), "b": (1.0, 0.0)}


# ---------------------------------------------------------------------------
# TrustRank (q95)
# ---------------------------------------------------------------------------

def test_trustrank_seed_chain_hand_case(spark):
    """seed -> a -> b, 1 iteration, d=0.85: trust(seed)=0.15 (teleport
    only), trust(a)=0.85·1.0 (full seed mass), b untouched after one
    step. Mass conservation: totals stay 1 each iteration."""
    from langscrape_spark.operators.hostrank import trustrank

    edges = spark.createDataFrame(
        [("seed", "a"), ("a", "b")], "src_host string, dst_host string"
    )
    rows = {
        r["host"]: (r["trust"], r["is_seed"])
        for r in trustrank(edges, ["seed"], iterations=1).collect()
    }
    assert rows["seed"] == (0.15, 1)
    assert rows["a"] == (0.85, 0)
    assert rows["b"] == (0.0, 0)

    r8 = trustrank(edges, ["seed"], iterations=8)
    total = sum(r["trust"] for r in r8.collect())
    assert abs(total - 1.0) < 1e-4  # dangling b teleports back to seed


def test_trustrank_untrusted_component_stays_zero(spark):
    """A disconnected spam clique gets exactly zero trust — the
    property that distinguishes TrustRank from PageRank."""
    from langscrape_spark.operators.hostrank import trustrank

    edges = spark.createDataFrame(
        [("seed", "a"), ("spam1", "spam2"), ("spam2", "spam1")],
        "src_host string, dst_host string",
    )
    rows = {r["host"]: r["trust"] for r in trustrank(edges, ["seed"], iterations=6).collect()}
    assert rows["spam1"] == 0.0 and rows["spam2"] == 0.0
    # a is dangling: its mass teleports back to the seed each round,
    # steady state ~0.29 — positive, well above the spam clique
    assert rows["a"] > 0.2


# ---------------------------------------------------------------------------
# k-core (q98)
# ---------------------------------------------------------------------------

def test_kcore_pendant_chain_cascade(spark):
    """A triangle (3-clique) with a pendant 3-chain at k=2: the chain
    unravels one node per round (needs 3 rounds — a single degree
    filter only removes the tail), the triangle survives."""
    from langscrape_spark.operators.linkgraph import kcore

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"),
         ("a", "p1"), ("p1", "p2"), ("p2", "p3")],
        "src_host string, dst_host string",
    )
    rows = {r["host"]: (r["in_kcore"], r["kcore_degree"])
            for r in kcore(edges, k=2, rounds=5).collect()}
    assert rows["a"] == (1, 2) and rows["b"] == (1, 2) and rows["c"] == (1, 2)
    for p in ("p1", "p2", "p3"):
        assert rows[p] == (0, 0)
    # one round is NOT enough — pins that peeling actually iterates
    one = {r["host"]: r["in_kcore"]
           for r in kcore(edges, k=2, rounds=1).collect()}
    assert one["p1"] == 1 and one["p3"] == 0


def test_kcore_whole_graph_below_k_empties(spark):
    from langscrape_spark.operators.linkgraph import kcore

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src_host string, dst_host string"
    )
    out = kcore(edges, k=3, rounds=3).collect()
    assert len(out) == 3 and all(r["in_kcore"] == 0 for r in out)


# ---------------------------------------------------------------------------
# BFS depth map (q101)
# ---------------------------------------------------------------------------

def test_bfs_depths_chain_and_unreachable(spark):
    """seed -> a -> b -> c with a shortcut seed -> b: min depth wins
    (b=1 not 2); d is disconnected -> -1; direction respected."""
    from langscrape_spark.operators.hostrank import bfs_depths

    edges = spark.createDataFrame(
        [("seed", "a"), ("a", "b"), ("b", "c"), ("seed", "b"),
         ("d", "seed")],  # in-edge only: d stays unreachable
        "src_host string, dst_host string",
    )
    rows = {r["host"]: (r["depth"], r["reached"])
            for r in bfs_depths(edges, ["seed"], max_depth=5).collect()}
    assert rows["seed"] == (0, 1)
    assert rows["a"] == (1, 1) and rows["b"] == (1, 1)
    assert rows["c"] == (2, 1)
    assert rows["d"] == (-1, 0)


def test_bfs_depths_max_depth_truncates(spark):
    from langscrape_spark.operators.hostrank import bfs_depths

    edges = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(5)],
        "src_host string, dst_host string",
    )
    rows = {r["host"]: r["depth"]
            for r in bfs_depths(edges, ["n0"], max_depth=2).collect()}
    assert rows["n2"] == 2 and rows["n3"] == -1  # beyond the cap
    assert bfs_depths(edges, [], max_depth=2).count() == 0


def test_bfs_depths_isolated_seed_reports_zero(spark):
    """A seed with no incident edge still gets a depth-0 row."""
    from langscrape_spark.operators.hostrank import bfs_depths

    edges = spark.createDataFrame(
        [("a", "b")], "src_host string, dst_host string"
    )
    rows = {r["host"]: (r["depth"], r["reached"])
            for r in bfs_depths(edges, ["newhost"], max_depth=3).collect()}
    assert rows["newhost"] == (0, 1)
    assert rows["a"] == (-1, 0) and rows["b"] == (-1, 0)


# ---------------------------------------------------------------------------
# Triangle counting (q105)
# ---------------------------------------------------------------------------

def test_triangle_stats_k4_analytic(spark):
    """K4 has C(4,3)=4 triangles, each node in 3 of them, clustering 1;
    adding a pendant node gives it 0 triangles and clustering 0."""
    from itertools import combinations

    from langscrape_spark.operators.linkgraph import triangle_stats

    k4 = [(a, b) for a, b in combinations("abcd", 2)]
    edges = spark.createDataFrame(
        k4 + [("a", "p")], "src_host string, dst_host string"
    )
    rows = {r["host"]: r for r in triangle_stats(edges).collect()}
    for h in "bcd":
        assert rows[h]["triangles"] == 3 and rows[h]["clustering"] == 1.0
    # a has degree 4 (K4 + pendant): 3 triangles over C(4,2)=6 wedges
    assert rows["a"]["triangles"] == 3 and rows["a"]["clustering"] == 0.5
    assert rows["p"]["triangles"] == 0 and rows["p"]["clustering"] == 0.0
    total = sum(r["triangles"] for r in rows.values())
    assert total == 3 * 4  # 4 triangles x 3 corners


def test_triangle_stats_direction_and_dups_ignored(spark):
    """A directed 3-cycle with duplicate/reversed edges is ONE
    undirected triangle."""
    from langscrape_spark.operators.linkgraph import triangle_stats

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"), ("a", "b")],
        "src_host string, dst_host string",
    )
    rows = {r["host"]: r["triangles"] for r in triangle_stats(edges).collect()}
    assert rows == {"a": 1, "b": 1, "c": 1}


# ---------------------------------------------------------------------------
# link prediction
# ---------------------------------------------------------------------------

def test_link_prediction_path_graph(spark):
    """a-b-c path: the only distance-2 pair is (a, c) with one common
    neighbor b (deg 2), Jaccard 1/(1+1-1)=1, AA = 1/ln 2."""
    import math

    from langscrape_spark.operators.linkgraph import link_prediction

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src_host string, dst_host string"
    )
    rows = link_prediction(e, min_common=1).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.host_a, r.host_b, r.common_neighbors) == ("a", "c", 1)
    assert r.jaccard == 1.0
    assert r.adamic_adar == round(1 / math.log(2), 6)


def test_link_prediction_excludes_adjacent_and_hot_centers(spark):
    from langscrape_spark.operators.linkgraph import link_prediction

    # triangle a-b-c: all pairs adjacent -> nothing predicted
    tri = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")],
        "src_host string, dst_host string",
    )
    assert link_prediction(tri, min_common=1).count() == 0
    # star with center s of degree 5 > cap 4: s is barred as a
    # center, so its leaves yield NO predictions
    star = spark.createDataFrame(
        [("s", f"l{i}") for i in range(5)],
        "src_host string, dst_host string",
    )
    assert (
        link_prediction(star, max_center_degree=4, min_common=1).count()
        == 0
    )
    # raise the cap and every leaf pair is predicted: C(5,2) = 10
    assert (
        link_prediction(star, max_center_degree=5, min_common=1).count()
        == 10
    )


def test_opic_conservation_and_tiny_graph(spark):
    from langscrape_spark.operators.hostrank import opic

    # a -> b -> c, c dangling; n=3, cash starts 1/3 each.
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src_host string, dst_host string"
    )
    rows = {r.host: r for r in opic(edges, iterations=2).collect()}
    assert set(rows) == {"a", "b", "c"}
    # Mass conservation: cash sums to 1, history to T, importance to 1.
    assert abs(sum(r.cash for r in rows.values()) - 1.0) < 1e-6
    assert abs(sum(r.history for r in rows.values()) - 2.0) < 1e-6
    assert abs(sum(r.importance for r in rows.values()) - 1.0) < 1e-6
    # Hand-rolled rounds: c0 = (1/3, 1/3, 1/3); dangling c.
    # r1: dang=1/3 -> each +1/9; a=1/9, b=1/3+1/9, c=1/3+1/9
    # h1 = c0.  r2: dang=c1(c)=4/9 -> each +4/27;
    # a=4/27, b=c1(a)+4/27=1/9+4/27, c=c1(b)+4/27=4/9+4/27
    third = 1.0 / 3
    c1 = {"a": 1 / 9, "b": third + 1 / 9, "c": third + 1 / 9}
    c2 = {"a": 4 / 27, "b": 1 / 9 + 4 / 27, "c": 4 / 9 + 4 / 27}
    for hst in "abc":
        assert abs(rows[hst].cash - c2[hst]) < 1e-6, hst
        assert abs(rows[hst].history - (third + c1[hst])) < 1e-6, hst


def test_opic_empty_graph(spark):
    from langscrape_spark.operators.hostrank import opic

    empty = spark.createDataFrame([], "src_host string, dst_host string")
    assert opic(empty).count() == 0


def test_greedy_seed_cover_marginal_gains(spark):
    from langscrape_spark.operators.linkgraph import greedy_seed_cover

    # s1 covers {a,b,c}; s2 covers {b,c,d,e}; s3 covers {a}.
    # Greedy: s2 (4), then s1 (marginal {a} = 1), then s3 gains 0 ->
    # third round picks nothing new... s3's dst a is covered, s1/s2
    # fully covered -> round 3 still picks the best zero... remaining
    # is EMPTY so the loop stops: exactly 2 picks.
    edges = spark.createDataFrame(
        [("s1", d) for d in "abc"]
        + [("s2", d) for d in "bcde"]
        + [("s3", "a")],
        "src_host string, dst_host string",
    )
    rows = greedy_seed_cover(edges, k=4).orderBy("round").collect()
    assert [(r.round, r.host, r.gain, r.covered_total) for r in rows] == [
        (1, "s2", 4, 4),
        (2, "s1", 1, 5),
    ]


def test_greedy_seed_cover_tie_breaks_smallest_host(spark):
    from langscrape_spark.operators.linkgraph import greedy_seed_cover

    edges = spark.createDataFrame(
        [("z", "a"), ("y", "b")], "src_host string, dst_host string"
    )
    rows = greedy_seed_cover(edges, k=1).collect()
    assert rows[0].host == "y"


# -- degree assortativity (operators/linkgraph.py) --


def test_assortativity_signs_and_exactness(spark):
    from langscrape_spark.operators.linkgraph import degree_assortativity

    # star: hub -> 4 leaves, each leaf -> hub. Every edge pairs a
    # high-out with a low-in or vice versa -> strongly negative r.
    star = [("hub", f"l{i}") for i in range(4)] + [
        (f"l{i}", "hub") for i in range(4)
    ]
    r_star = degree_assortativity(
        spark.createDataFrame(star, "src_host string, dst_host string")
    ).collect()[0]
    assert r_star.r is not None and r_star.r < -0.5

    # uniform ring: every node out-degree 1, in-degree 1 -> zero
    # variance -> NULL (not a crash, not 1.0)
    ring = [(f"n{i}", f"n{(i + 1) % 5}") for i in range(5)]
    r_ring = degree_assortativity(
        spark.createDataFrame(ring, "src_host string, dst_host string")
    ).collect()[0]
    assert r_ring.r is None and r_ring.m == 5

    # self-loops and duplicate edges are hygiene'd away
    noisy = ring + [("n0", "n0"), ("n0", "n1"), ("n0", "n1")]
    r_noisy = degree_assortativity(
        spark.createDataFrame(noisy, "src_host string, dst_host string")
    ).collect()[0]
    assert r_noisy.m == 5


def test_assortativity_matches_numpy_pearson(spark):
    import math

    from langscrape_spark.operators.linkgraph import degree_assortativity

    edges = [(f"a{i % 7}", f"b{(i * i + i) % 5}") for i in range(30)]
    df = spark.createDataFrame(edges, "src_host string, dst_host string")
    got = degree_assortativity(df).collect()[0]
    e = sorted(set((s, d) for s, d in edges if s != d))
    od, idg = {}, {}
    for s, d in e:
        od[s] = od.get(s, 0) + 1
        idg[d] = idg.get(d, 0) + 1
    xs = [od[s] for s, d in e]
    ys = [idg[d] for s, d in e]
    m = len(e)
    num = m * sum(x * y for x, y in zip(xs, ys)) - sum(xs) * sum(ys)
    den = math.sqrt(m * sum(x * x for x in xs) - sum(xs) ** 2) * math.sqrt(
        m * sum(y * y for y in ys) - sum(ys) ** 2
    )
    assert got.r == round(num / den, 6) and got.m == m


# -- HyperANF neighborhood function (operators/linkgraph.py) --


def test_neighborhood_function_chain_and_saturation(spark):
    from langscrape_spark.operators.linkgraph import neighborhood_function

    # directed chain a->b->c->d->e: exact N(t) = sum over nodes of
    # (reachable within t) = n + sum_{k<=t} (n-k)
    chain = [(c, n) for c, n in zip("abcd", "bcde")]
    df = spark.createDataFrame(chain, "src_host string, dst_host string")
    out = {r.t: r for r in neighborhood_function(df, rounds=4).collect()}
    exact = {t: 5 + sum(5 - k for k in range(1, t + 1)) for t in range(5)}
    for t in range(5):
        # m=64 HLL on <=5-element balls sits in the linear-counting
        # regime: near-exact (well within 5%)
        assert abs(out[t].n_pairs - exact[t]) / exact[t] < 0.05, t
    # monotone, saturating curve; frac hits 1.0 at the last round
    assert out[4].frac == 1.0
    assert all(out[t].n_pairs <= out[t + 1].n_pairs for t in range(4))

    # star: hub -> 4 leaves saturates at t=1 (frac 1.0 from then on)
    star = [("hub", f"l{i}") for i in range(4)]
    s = {r.t: r for r in neighborhood_function(
        spark.createDataFrame(star, "src_host string, dst_host string"),
        rounds=3,
    ).collect()}
    assert s[1].n_pairs == s[3].n_pairs and s[1].frac == 1.0


# ---------------------------------------------------------------------------
# salsa
# ---------------------------------------------------------------------------

def test_salsa_mass_and_stationary_indegree(spark):
    """SALSA's authority chain is mass-preserving (no normalizer) and,
    on a connected graph, its stationary authority weights are
    proportional to in-degree (Lempel & Moran 2001 Thm — the property
    HITS does NOT have). Run long enough to converge and check both,
    plus hub mass preservation."""
    from langscrape_spark.operators.hostrank import salsa

    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
        ("b", "a"), ("c", "b"), ("a", "d"), ("d", "a"), ("b", "d"),
    ]
    df = spark.createDataFrame(edges, "src_host string, dst_host string")
    out = {r.host: r for r in salsa(df, iterations=40).collect()}
    tot_a = sum(r.authority for r in out.values())
    tot_h = sum(r.hub for r in out.values())
    assert abs(tot_a - 1.0) < 1e-4 and abs(tot_h - 1.0) < 1e-4
    indeg = {}
    for s, d in set(edges):
        indeg[d] = indeg.get(d, 0) + 1
    tot_d = sum(indeg.values())
    for h, r in out.items():
        assert abs(r.authority - indeg.get(h, 0) / tot_d) < 1e-3, h


def test_salsa_empty_graph(spark):
    from langscrape_spark.operators.hostrank import salsa

    df = spark.createDataFrame([], "src_host string, dst_host string")
    assert salsa(df, iterations=3).count() == 0


def test_bowtie_all_classes(spark):
    """Planted Broder graph: 5-node SCC (+chord making c0 the
    max-out-degree pivot by tie-break), IN chain, OUT chain, a tube
    bypassing the core, tendrils off IN and into OUT, and a
    disconnected pair — each lands in its class. Duplicate edges and
    self-loops are hygiene-dropped."""
    from langscrape_spark.operators.linkgraph import bowtie

    edges = [
        ("c0", "c1"), ("c1", "c2"), ("c2", "c3"), ("c3", "c4"),
        ("c4", "c0"), ("c0", "c2"),             # SCC + chord
        ("i0", "i1"), ("i1", "c0"),             # IN chain
        ("c2", "o0"), ("o0", "o1"),             # OUT chain
        ("i1", "t0"), ("t0", "o0"),             # tube
        ("i0", "td0"),                          # tendril off IN
        ("td1", "o1"),                          # tendril into OUT
        ("d0", "d1"),                           # disconnected pair
        ("c0", "c1"), ("c0", "c0"),             # dup + self-loop
    ]
    df = spark.createDataFrame(edges, "src_host string, dst_host string")
    got = {r["host"]: r["component"] for r in bowtie(df, rounds=6).collect()}
    assert got == {
        "c0": "core", "c1": "core", "c2": "core", "c3": "core",
        "c4": "core",
        "i0": "in", "i1": "in",
        "o0": "out", "o1": "out",
        "t0": "tube",
        "td0": "tendril", "td1": "tendril",
        "d0": "disconnected", "d1": "disconnected",
    }


def test_bowtie_empty_graph(spark):
    from langscrape_spark.operators.linkgraph import bowtie

    df = spark.createDataFrame([], "src_host string, dst_host string")
    assert bowtie(df, rounds=3).count() == 0


def test_bowtie_pivot_tiebreak_and_horizon(spark):
    """All out-degrees equal → lexicographically smallest src is the
    pivot; a horizon smaller than the graph diameter truncates
    reachability (documented fixed-rounds contract)."""
    from langscrape_spark.operators.linkgraph import bowtie

    # a -> b -> c -> d: pivot = 'a' (deg all 1, min name).
    chain = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")],
        "src_host string, dst_host string",
    )
    got = {r["host"]: r["component"] for r in bowtie(chain, rounds=6).collect()}
    # F(a)={a,b,c,d}, B(a)={a}: core={a}, out={b,c,d}.
    assert got == {"a": "core", "b": "out", "c": "out", "d": "out"}
    short = {r["host"]: r["component"] for r in bowtie(chain, rounds=1).collect()}
    # rounds=1: F(a)={a,b} -> 'd' invisible forward; backward-from-out
    # sweep then finds c -> d ... d reaches nothing in OUT, c is OUT.
    assert short["a"] == "core" and short["b"] == "out"


def test_scc_multiple_components(spark):
    """Two cycles, a singleton bridge, a 2-cycle, cross links: each
    strongly-connected set gets its min member as scc_id."""
    from langscrape_spark.operators.linkgraph import scc

    edges = [
        ("a0", "a1"), ("a1", "a2"), ("a2", "a0"),           # 3-cycle
        ("b0", "b1"), ("b1", "b2"), ("b2", "b3"), ("b3", "b0"),  # 4-cycle
        ("a0", "b0"),                                        # A -> B
        ("b1", "c0"),                                        # B -> c0
        ("c0", "d0"), ("d0", "d1"), ("d1", "d0"),            # c0 -> 2-cycle
        ("a1", "a1"),                                        # self-loop drop
    ]
    df = spark.createDataFrame(edges, "src_host string, dst_host string")
    got = {r["host"]: (r["scc_id"], r["scc_size"]) for r in scc(df).collect()}
    assert got == {
        "a0": ("a0", 3), "a1": ("a0", 3), "a2": ("a0", 3),
        "b0": ("b0", 4), "b1": ("b0", 4), "b2": ("b0", 4), "b3": ("b0", 4),
        "c0": ("c0", 1),
        "d0": ("d0", 2), "d1": ("d0", 2),
    }


def test_scc_chain_all_singletons(spark):
    from langscrape_spark.operators.linkgraph import scc

    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")],
        "src_host string, dst_host string",
    )
    got = {r["host"]: r["scc_size"] for r in scc(df, outer_rounds=2).collect()}
    assert got == {"a": 1, "b": 1, "c": 1, "d": 1}


def test_scc_matches_python_tarjan_on_random_graph(spark):
    """Cross-check against a sequential Tarjan on a deterministic
    pseudo-random graph (hash-derived edges, no RNG)."""
    import hashlib
    from langscrape_spark.operators.linkgraph import scc

    # seed chosen (offline simulation of the exact refinement) so the
    # algorithm converges in 2 outer rounds at inner=6 — keeps this
    # heavyweight cross-check fast; SCC sizes [6, 4, 1, 1, 1, 1].
    n, m = 14, 34
    edges = []
    for i in range(m):
        h = hashlib.md5(f"edge7:{i}".encode()).hexdigest()
        u, v = int(h[:8], 16) % n, int(h[8:16], 16) % n
        if u != v:
            edges.append((f"n{u:02d}", f"n{v:02d}"))
    df = spark.createDataFrame(edges, "src_host string, dst_host string")
    got = {r["host"]: r["scc_id"] for r in scc(df, outer_rounds=2, inner_rounds=6, verify=True).collect()}

    # iterative Tarjan
    adj = {}
    nodes = set()
    for u, v in edges:
        adj.setdefault(u, []).append(v)
        nodes.update((u, v))
    index = {}
    low = {}
    onstack = set()
    stack = []
    comp = {}
    counter = [0]

    def strongconnect(root):
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                onstack.add(v)
            recurse = False
            for i in range(pi, len(adj.get(v, []))):
                w2 = adj[v][i]
                if w2 not in index:
                    work[-1] = (v, i + 1)
                    work.append((w2, 0))
                    recurse = True
                    break
                elif w2 in onstack:
                    low[v] = min(low[v], index[w2])
            if not recurse:
                work.pop()
                if work:
                    pv = work[-1][0]
                    low[pv] = min(low[pv], low[v])
                if low[v] == index[v]:
                    members = []
                    while True:
                        w2 = stack.pop()
                        onstack.discard(w2)
                        members.append(w2)
                        if w2 == v:
                            break
                    mid = min(members)
                    for mm in members:
                        comp[mm] = mid

    for v in sorted(nodes):
        if v not in index:
            strongconnect(v)
    assert got == comp


def test_hub_removal_fragments_star(spark):
    """Hub-and-spoke + pair links: removing the hub shatters the
    giant component into pairs (Albert-Jeong-Barabási fragility)."""
    from langscrape_spark.operators.linkgraph import hub_removal_resilience

    edges = []
    for i in range(12):
        edges.append(("hub0", f"s{i:02d}"))
    for j in range(6):
        edges.append((f"s{2*j:02d}", f"s{2*j+1:02d}"))
    df = spark.createDataFrame(edges, "src_host string, dst_host string")
    got = {r["k"]: r for r in hub_removal_resilience(df, ks=(0, 1), rounds=4).collect()}
    assert (got[0]["n_hosts"], got[0]["n_components"], got[0]["largest"]) == (13, 1, 13)
    assert (got[1]["n_hosts"], got[1]["n_components"], got[1]["largest"]) == (12, 6, 2)
    assert got[1]["largest_share_micro"] == 2 * 1000000 // 12
