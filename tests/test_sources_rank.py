"""robots.txt parsing and link-graph host-rank."""

import pytest

from langscrape_spark import synth
from langscrape_spark.operators.hostrank import (
    host_edges,
    host_pagerank,
    host_rank_table,
)
from langscrape_spark.sources.robots import parse_robots_txt, robots_table

ROBOTS = """
# global rules
User-agent: *
Disallow: /private/
Disallow: /tmp*junk
Crawl-delay: 2

User-agent: fastbot
Disallow:
Crawl-delay: 0.1

User-agent: badbot
Disallow: /
"""


def test_parse_robots_default_agent():
    dis, rules, delay, allowed, smaps = parse_robots_txt(ROBOTS, "*")
    assert dis == ["/private/", "/tmp"]  # wildcard clipped conservatively
    assert smaps == []
    assert rules == [("/private/", False), ("/tmp*junk", False)]
    assert delay == 2.0
    assert allowed


def test_parse_robots_specific_agents():
    dis, rules, delay, allowed, _ = parse_robots_txt(ROBOTS, "fastbot")
    assert dis == [] and rules == [] and delay == 0.1 and allowed
    dis, rules, _, allowed, _ = parse_robots_txt(ROBOTS, "badbot")
    assert not allowed and dis == [] and rules == [("/", False)]


def test_parse_robots_garbage():
    assert parse_robots_txt("", "*") == ([], [], None, True, [])
    assert parse_robots_txt("\x00\x01 not robots at all", "*") == (
        [], [], None, True, []
    )


def test_robots_table(spark):
    df = spark.createDataFrame(
        [("a.example", ROBOTS.encode()), ("b.example", b"")],
        "host string, body binary",
    )
    rows = {r["host"]: r for r in robots_table(df).collect()}
    assert rows["a.example"]["disallow_prefixes"] == ["/private/", "/tmp"]
    got_rules = [(r["pattern"], r["allow"], r["wild"]) for r in rows["a.example"]["rules"]]
    assert got_rules == [("/private/", False, False), ("/tmp*junk", False, True)]
    assert rows["a.example"]["rules"][1]["regex"] == "^/tmp.*junk"
    assert rows["a.example"]["crawl_delay"] == 2.0
    assert rows["b.example"]["allowed"] and rows["b.example"]["crawl_delay"] == 1.0
    # fastbot view of the same bodies
    fast = {r["host"]: r for r in robots_table(df, agent="fastbot").collect()}
    assert fast["a.example"]["crawl_delay"] == 0.1


@pytest.fixture(scope="module")
def pages(spark):
    df = synth.build_pages_df(spark, 200, partitions=4).cache()
    df.count()
    return df


def test_host_edges_shape(spark, pages):
    e = host_edges(pages)
    rows = e.collect()
    assert all(r["src_host"] != r["dst_host"] for r in rows)
    assert all(r["weight"] >= 1.0 for r in rows)


def test_pagerank_sums_to_one_and_deterministic(spark, pages):
    edges = host_edges(pages).cache()
    r1 = host_pagerank(edges, iterations=8)
    total = r1.agg({"rank": "sum"}).first()[0]
    assert abs(total - 1.0) < 1e-6
    r2 = host_pagerank(edges, iterations=8)
    assert sorted(map(tuple, r1.collect())) == sorted(map(tuple, r2.collect()))


def test_hot_host_ranks_highest(spark, pages):
    """synth routes ~30% of pages (and so of in-links) to host 0."""
    ranked = host_rank_table(pages, iterations=8).orderBy("rank", ascending=False)
    top = ranked.first()
    assert top["host"] == "www.site0.example"
    assert top["rank"] == 1.0  # max-normalized


class TestPoissonHT:
    def test_full_probability_recovers_exact_total(self, spark):
        from pyspark.sql import functions as F
        from langscrape_spark.operators.ranking import poisson_sample_ht

        df = spark.range(100).select(
            F.col("id").alias("doc_id"),
            F.lit(1000000).alias("pm"),
            (F.col("id") + 1).alias("v"),
            (F.col("id") % 2).alias("g"),
        )
        out = poisson_sample_ht(
            df, "pm", "v", group_cols=("g",), id_col="doc_id"
        ).collect()
        got = {r["g"]: (r["n_sampled"], r["ht_total_micro"]) for r in out}
        # p=1 for every row: n_sampled = 50 per group, HT total exact.
        tot0 = sum(i + 1 for i in range(0, 100, 2)) * 1_000_000
        tot1 = sum(i + 1 for i in range(1, 100, 2)) * 1_000_000
        assert got == {0: (50, tot0), 1: (50, tot1)}

    def test_half_probability_estimates_within_tolerance(self, spark):
        from pyspark.sql import functions as F
        from langscrape_spark.operators.ranking import poisson_sample_ht

        n = 2000
        df = spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.lit(500000).alias("pm"),
            F.lit(10).alias("v"),
        )
        row = poisson_sample_ht(df, "pm", "v", id_col="doc_id").collect()[0]
        # ~half sampled; each contributes 20 -> estimate ~ n*10.
        assert abs(row["n_sampled"] - n / 2) < n * 0.05
        est = row["ht_total_micro"] / 1e6
        assert abs(est - n * 10) < n * 10 * 0.1

    def test_zero_probability_rows_never_sampled(self, spark):
        from pyspark.sql import functions as F
        from langscrape_spark.operators.ranking import poisson_sample_ht

        df = spark.range(50).select(
            F.col("id").alias("doc_id"),
            F.lit(0).alias("pm"),
            F.lit(5).alias("v"),
        )
        out = poisson_sample_ht(df, "pm", "v", id_col="doc_id").collect()
        assert out[0]["n_sampled"] == 0

    def test_salt_varies_sample_but_not_p1_rows(self, spark):
        from pyspark.sql import functions as F
        from langscrape_spark.operators.ranking import poisson_sample_ht

        df = spark.range(500).select(
            F.col("id").alias("doc_id"),
            F.lit(300000).alias("pm"),
            F.lit(1).alias("v"),
        )
        a = poisson_sample_ht(df, "pm", "v", salt="a").collect()[0]
        b = poisson_sample_ht(df, "pm", "v", salt="b").collect()[0]
        aa = poisson_sample_ht(df, "pm", "v", salt="a").collect()[0]
        assert a == aa  # deterministic
        assert a["n_sampled"] != b["n_sampled"] or a != b
