"""Unit tests for the duplicate-URL-structure miners
(operators/mirrors.py) and exact harmonic centrality
(operators/linkgraph.py) — hand-built inputs with hand-computed
expected outputs, independent of the q165–q168 synthetic corpora."""

from pyspark.sql import functions as F

from langscrape_spark.operators.linkgraph import harmonic_centrality
from langscrape_spark.operators.mirrors import (
    dust_rules,
    mirror_hosts,
    param_significance,
    url_tokens,
)


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, fp string")


class TestUrlTokens:
    def test_tokenizes_path_and_query(self, spark):
        df = spark.range(1).select(
            url_tokens(
                F.lit("https://a.example/Item/123?sid=456&ref=home")
            ).alias("t")
        )
        assert df.collect()[0].t == [
            "p:<N>",
            "p:item",
            "q:ref=home",
            "q:sid=<N>",
        ]

    def test_hex_before_digits_and_dedup(self, spark):
        # a >=8-char hex run templates to <H> BEFORE the digit pass,
        # and repeated tokens collapse (distinct set semantics)
        df = spark.range(1).select(
            url_tokens(
                F.lit("https://a.example/x/deadbeef01/x?t=deadbeef01")
            ).alias("t")
        )
        assert df.collect()[0].t == ["p:<H>", "p:x", "q:t=<H>"]

    def test_no_query_no_path(self, spark):
        df = spark.range(1).select(
            url_tokens(F.lit("https://a.example")).alias("t")
        )
        assert df.collect()[0].t == []


class TestMirrorHosts:
    def test_mirror_pair_scored_and_universal_cell_capped(self, spark):
        rows = []
        # a and b share 4 of a's 5 cells; b has 4 cells -> score
        # 4/min(5,4) = 1.0 for the shared universe
        for i in range(4):
            rows.append((f"https://a.ex/p{i}", f"f{i}"))
            rows.append((f"https://b.ex/p{i}", f"f{i}"))
        rows.append(("https://a.ex/extra", "fx"))
        # universal cell on 3 hosts; cap at 2 must drop it entirely
        for h in ("a.ex", "b.ex", "c.ex"):
            rows.append((f"https://{h}/notice", "uni"))
        out = mirror_hosts(
            _pages(spark, rows),
            max_key_df=2,
            min_shared=3,
            min_score_micro=500_000,
        ).collect()
        got = {(r.host_a, r.host_b): r for r in out}
        assert set(got) == {("a.ex", "b.ex")}  # c.ex only had the capped cell
        r = got[("a.ex", "b.ex")]
        assert (r.shared, r.n_a, r.n_b) == (4, 5, 4)
        assert r.score_micro == 1_000_000
        assert r.is_mirror == 1

    def test_refetch_counts_once(self, spark):
        rows = [
            ("https://a.ex/p", "f1"),
            ("https://a.ex/p", "f1"),  # refetch: same triple twice
            ("https://b.ex/p", "f1"),
        ]
        out = mirror_hosts(
            _pages(spark, rows), max_key_df=8, min_shared=1
        ).collect()
        assert len(out) == 1 and out[0].shared == 1


class TestDustRules:
    def test_session_rule_mined_and_identity_pairs_dropped(self, spark):
        rows = []
        for c in range(3):
            rows.append((f"https://s.ex/item/{c}", f"f{c}"))
            rows.append((f"https://s.ex/item/{c}?sid=11{c}", f"f{c}"))
            rows.append((f"https://s.ex/item/{c}?sid=22{c}", f"f{c}"))
        out = dust_rules(
            _pages(spark, rows), max_group=16, min_support=3,
            min_contents=2,
        ).collect()
        rules = {(r.lhs, r.rhs): r for r in out}
        # clean < sid spelling lexicographically -> rule ('' => sid)
        r = rules[("", "q:sid=<N>")]
        assert r.support == 6 and r.n_contents == 3 and r.valid == 1
        # sid-vs-sid pairs template identically -> empty rule dropped
        assert ("", "") not in rules
        assert all(not (k[0] == "" and k[1] == "") for k in rules)

    def test_hot_group_capped(self, spark):
        rows = [(f"https://s.ex/a?x={i}", "same") for i in range(5)]
        out = dust_rules(
            _pages(spark, rows), max_group=4, min_support=1,
            min_contents=1,
        ).collect()
        assert out == []  # the 5-spelling group exceeds the cap

    def test_cross_content_pairs_never_join(self, spark):
        rows = [
            ("https://s.ex/a", "f1"),
            ("https://s.ex/b", "f2"),
        ]
        assert dust_rules(_pages(spark, rows), min_support=1).count() == 0


class TestParamSignificance:
    def test_verdicts(self, spark):
        rows = []
        # sess varies, content fixed by cat -> content_irrelevant
        # cat varies (rows without sess), content varies -> significant
        for cat in range(2):
            for s in range(3):
                rows.append(
                    (f"https://c.ex/l?cat={cat}&sess={cat}{s}", f"f{cat}")
                )
            rows.append((f"https://c.ex/l?cat={cat}", f"f{cat}"))
        out = param_significance(_pages(spark, rows)).collect()
        v = {r.key: r for r in out}
        assert v["sess"].verdict == "content_irrelevant"
        assert v["sess"].n_multi == 2 and v["sess"].n_varying == 0
        assert v["cat"].verdict == "content_significant"

    def test_single_valued_param_no_evidence(self, spark):
        rows = [
            ("https://c.ex/l?utm=nl&p=1", "f1"),
            ("https://c.ex/l?utm=nl&p=2", "f2"),
        ]
        v = {
            r.key: r
            for r in param_significance(_pages(spark, rows)).collect()
        }
        assert v["utm"].verdict == "no_evidence"
        assert v["p"].verdict == "content_significant"

    def test_mixed_verdict(self, spark):
        rows = [
            # ctx A: k varies, content varies
            ("https://c.ex/a?k=1", "f1"),
            ("https://c.ex/a?k=2", "f2"),
            # ctx B: k varies, content fixed
            ("https://c.ex/b?k=1", "g"),
            ("https://c.ex/b?k=2", "g"),
        ]
        v = {
            r.key: r
            for r in param_significance(_pages(spark, rows)).collect()
        }
        assert v["k"].verdict == "mixed"
        assert v["k"].n_multi == 2 and v["k"].n_varying == 1


class TestHarmonicCentrality:
    def test_path_graph_exact_micro(self, spark):
        e = spark.createDataFrame(
            [("a", "b"), ("b", "c")], "src_host string, dst_host string"
        )
        got = {
            r.host: r
            for r in harmonic_centrality(e, rounds=4).collect()
        }
        # H(a) = 1/1 + 1/2 -> 1_500_000 micro; c reaches nothing
        assert got["a"].harmonic_micro == 1_500_000
        assert got["a"].n_reached == 2
        assert got["b"].harmonic_micro == 1_000_000
        assert got["c"].harmonic_micro == 0 and got["c"].n_reached == 0

    def test_horizon_truncates(self, spark):
        e = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "d")],
            "src_host string, dst_host string",
        )
        got = {
            r.host: r
            for r in harmonic_centrality(e, rounds=2).collect()
        }
        # d is 3 hops out -> beyond the 2-round horizon, contributes 0
        assert got["a"].n_reached == 2
        assert got["a"].harmonic_micro == 1_500_000


class TestApplyDust:
    def test_deletion_rules_collapse_spellings(self, spark):
        from langscrape_spark.operators.mirrors import (
            apply_dust_rules,
            dust_rules,
        )

        rows = []
        for i in range(30):
            rows.append((f"https://s.example/item/{i}", f"f{i}"))
            rows.append((f"https://s.example/item/{i}?sid={1000+i}", f"f{i}"))
        df = spark.createDataFrame(rows, "url string, fp string")
        rules = dust_rules(df, min_support=3, min_contents=2)
        out = apply_dust_rules(df, rules)
        got = {r["url"]: r for r in out.collect()}
        clean = got["https://s.example/item/7"]
        dusty = got["https://s.example/item/7?sid=1007"]
        assert clean["n_rules"] == 0
        assert dusty["n_rules"] == 1
        assert clean["canon"] == dusty["canon"] == "s.example/item/7"
        # distinct canon count = number of real pages
        assert out.select("canon").distinct().count() == 30

    def test_non_matching_urls_untouched(self, spark):
        from langscrape_spark.operators.mirrors import apply_dust_rules

        rules = spark.createDataFrame(
            [("q:sid=<N>", "", 5, 3, 1), ("q:a=<N>", "q:b=<N>", 9, 9, 1),
             ("q:ref=home", "", 1, 1, 0)],
            "lhs string, rhs string, support long, n_contents long, valid int",
        )
        df = spark.createDataFrame(
            [("https://s.example/p?ref=home",),
             ("https://s.example/p?a=1",)],
            "url string",
        )
        out = {r["url"]: r for r in apply_dust_rules(df, rules).collect()}
        # invalid rule not applied; substitution rule not applied
        assert out["https://s.example/p?ref=home"]["n_rules"] == 0
        assert out["https://s.example/p?a=1"]["n_rules"] == 0

    def test_max_rules_guard(self, spark):
        import pytest as _pytest
        from langscrape_spark.operators.mirrors import apply_dust_rules

        rules = spark.createDataFrame(
            [(f"q:x{i}=<N>", "", 5, 3, 1) for i in range(10)],
            "lhs string, rhs string, support long, n_contents long, valid int",
        )
        df = spark.createDataFrame([("https://s.example/p",)], "url string")
        with _pytest.raises(ValueError, match="max_rules"):
            apply_dust_rules(df, rules, max_rules=5)
