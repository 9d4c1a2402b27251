"""Sitemap ingestion: XML parsing, index expansion, robots.txt
``Sitemap:`` line extraction (both parsers), and crawl seeding."""

from pyspark.sql import functions as F

from langscrape_spark import synth
from langscrape_spark.scheduler.robots import parse_robots_txt as parse_sql
from langscrape_spark.sources.robots import parse_robots_txt as parse_py
from langscrape_spark.sources.sitemap import (
    expand_sitemap_index,
    parse_sitemaps,
    sitemap_seeds,
)

_URLSET = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
    " <url>\n  <loc>https://a.example/x?a=1&amp;b=2</loc>\n"
    "  <lastmod>2026-01-02</lastmod>\n  <changefreq>daily</changefreq>\n"
    "  <priority>0.8</priority>\n </url>\n"
    " <url><loc> https://a.example/y </loc></url>\n"
    " <url><priority>0.3</priority></url>\n"
    "</urlset>"
)
_INDEX = (
    "<sitemapindex>\n"
    " <sitemap><loc>https://b.example/sm/child.xml</loc>"
    "<lastmod>2025-12-31T10:00:00Z</lastmod></sitemap>\n"
    "</sitemapindex>"
)
_CHILD = (
    "<urlset><url><loc>https://b.example/c1</loc>"
    "<priority>0.5</priority></url>"
    "<url><loc>https://b.example/c2</loc></url></urlset>"
)


def _bodies(spark):
    rows = [
        ("https://a.example/sitemap.xml", _URLSET),
        ("https://b.example/sitemap.xml", _INDEX),
        ("https://b.example/sm/child.xml", _CHILD),
        ("https://c.example/sitemap.xml", None),
        ("https://d.example/sitemap.xml", "garbage not xml"),
    ]
    return spark.createDataFrame(rows, "sitemap_url string, body string")


def test_parse_sitemaps_fields_and_drops(spark):
    got = {
        (r["src"], r["pos"]): r.asDict()
        for r in parse_sitemaps(_bodies(spark)).collect()
    }
    # entity-decoded loc, trimmed, fields extracted
    a0 = got[("https://a.example/sitemap.xml", 0)]
    assert a0["loc"] == "https://a.example/x?a=1&b=2"
    assert (a0["lastmod"], a0["changefreq"], a0["priority"]) == (
        "2026-01-02", "daily", 0.8,
    )
    a1 = got[("https://a.example/sitemap.xml", 1)]
    assert a1["loc"] == "https://a.example/y" and a1["priority"] is None
    # loc-less entry dropped; garbage and NULL bodies yield nothing
    assert len(got) == 5
    assert not any("c.example" in s or "d.example" in s for s, _ in got)
    # index entry typed
    b0 = got[("https://b.example/sitemap.xml", 0)]
    assert b0["kind"] == "index" and b0["loc"].endswith("child.xml")


def test_expand_index_and_seeds(spark):
    bodies = _bodies(spark)
    top = parse_sitemaps(
        bodies.where(F.col("sitemap_url").endswith("/sitemap.xml"))
    )
    flat = expand_sitemap_index(top, bodies)
    assert {r["kind"] for r in flat.collect()} == {"urlset"}
    seeds = sitemap_seeds(flat)
    urls = sorted(r["url"] for r in seeds.collect())
    assert urls == [
        "https://a.example/x?a=1&b=2",
        "https://a.example/y",
        "https://b.example/c1",
        "https://b.example/c2",
    ]
    assert seeds.schema["depth"].dataType.simpleString() == "int"


_ROBOTS_WITH_SITEMAPS = (
    "Sitemap: https://h.example/sm-top.xml\n"
    "User-agent: a\n"
    "Sitemap: https://h.example/sm-mid.xml\n"  # breaks the UA run
    "User-agent: b\n"
    "Disallow: /d\n"
    "User-agent: *\n"
    "Allow: /ok\n"
    "sitemap: https://h.example/sm-low.xml  # comment\n"
    "Sitemap:\n"  # empty → dropped
)


def test_robots_sitemap_lines_group_independent(spark):
    # pandas parser
    _, rules, _, _, smaps = parse_py(_ROBOTS_WITH_SITEMAPS)
    assert smaps == [
        "https://h.example/sm-top.xml",
        "https://h.example/sm-mid.xml",
        "https://h.example/sm-low.xml",
    ]
    assert rules == [("/ok", True)]  # * group only; UA-a run was broken
    # SQL parser emits the identical list + rules
    df = spark.createDataFrame(
        [("h.example", _ROBOTS_WITH_SITEMAPS)], "host string, robots_txt string"
    )
    row = parse_sql(df).collect()[0]
    assert list(row["sitemaps"]) == smaps
    assert [(r["pattern"], r["allow"]) for r in row["rules"]] == rules


def test_revisit_schedule_semantics(spark):
    """changefreq→interval, lastmod→next_due, staleness-scaled
    priority; sentinels for 'never' and unknown lastmod."""
    from langscrape_spark.sources.sitemap import revisit_schedule

    rows = [
        # fresh daily page: due tomorrow, not overdue
        ("urlset", "u/daily-fresh", "2026-08-17", "daily", 0.8),
        # stale weekly page: due 2026-08-08, 9 days overdue
        ("urlset", "u/weekly-stale", "2026-08-01T09:30:00Z", "WEEKLY", None),
        # never → no due date, never overdue, priority unscaled
        ("urlset", "u/never", "2020-01-01", "never", 0.9),
        # unknown lastmod → due immediately (0 days overdue)
        ("urlset", "u/nolastmod", "garbage", None, 0.2),
        # ancient page: overdue scaling capped at 30 days → 2x
        ("urlset", "u/ancient", "2020-01-01", "daily", 0.5),
        # unknown changefreq → default 7-day interval
        ("urlset", "u/oddfreq", "2026-08-10", "sometimes", None),
        # index rows are not revisit targets
        ("index", "u/index", "2026-08-01", "daily", 0.1),
    ]
    df = spark.createDataFrame(
        rows,
        "kind string, loc string, lastmod string, "
        "changefreq string, priority double",
    )
    got = {
        r["url"]: r.asDict()
        for r in revisit_schedule(df, "2026-08-17").collect()
    }
    assert set(got) == {
        "u/daily-fresh", "u/weekly-stale", "u/never", "u/nolastmod",
        "u/ancient", "u/oddfreq",
    }
    f = got["u/daily-fresh"]
    assert str(f["next_due"]) == "2026-08-18" and not f["overdue"]
    assert f["refresh_priority"] == 0.8  # 0 days overdue → unscaled
    w = got["u/weekly-stale"]
    assert (str(w["next_due"]), w["interval_days"]) == ("2026-08-08", 7)
    assert w["overdue"]
    assert w["refresh_priority"] == round(0.5 * (1 + 9 / 30), 6)
    n = got["u/never"]
    assert n["next_due"] is None and n["interval_days"] is None
    assert not n["overdue"] and n["refresh_priority"] == 0.9
    u = got["u/nolastmod"]
    assert u["lastmod_date"] is None and str(u["next_due"]) == "2026-08-17"
    assert u["overdue"] and u["refresh_priority"] == 0.2  # due today, 0 over
    assert got["u/ancient"]["refresh_priority"] == 1.0  # 0.5 * capped 2x
    assert got["u/oddfreq"]["interval_days"] == 7


def test_crawl_seeded_from_sitemaps(spark, tmp_path):
    """robots Sitemap: lines → fetched sitemap bodies → seeds →
    run_crawl matches the simulator given the same seed set."""
    from langscrape_spark.scheduler.frontier import CrawlConfig, run_crawl
    from langscrape_spark.scheduler.simulator import simulate_crawl
    from langscrape_spark.sources.catalog import Catalog

    n_pages = 200
    seed_ids = [i * (n_pages // 10) for i in range(10)]
    locs = "".join(
        f"<url><loc>{synth.url_of(i)}</loc></url>" for i in seed_ids
    )
    bodies = spark.createDataFrame(
        [("https://www.site1.example/sitemap.xml", f"<urlset>{locs}</urlset>")],
        "sitemap_url string, body string",
    )
    seeds_df = sitemap_seeds(parse_sitemaps(bodies))
    seed_urls = sorted(r["url"] for r in seeds_df.collect())
    assert seed_urls == sorted(synth.url_of(i) for i in seed_ids)

    robots_dict = {
        f"www.site{i}.example": (["/private/"], 1.0, True)
        for i in range(synth.N_HOSTS)
    }
    host_rank = {
        f"www.site{i}.example": round(1.0 - i * 0.04, 4)
        for i in range(synth.N_HOSTS)
    }
    pages = {
        synth.url_of(i): synth.page_html(i, n_pages) for i in range(n_pages)
    }
    sim_sched, sim_seen = simulate_crawl(
        sorted(seed_urls), pages, robots_dict, host_rank,
        batch_size=50, max_depth=2, max_rounds=3,
    )
    pages_df = synth.build_pages_df(spark, n_pages, partitions=4).cache()
    pages_df.count()
    robots_df = spark.createDataFrame(
        [(h, list(v[0]), v[1], v[2]) for h, v in robots_dict.items()],
        "host string, disallow_prefixes array<string>, "
        "crawl_delay double, allowed boolean",
    )
    rank_df = spark.createDataFrame(
        list(host_rank.items()), "host string, rank double"
    )
    state = run_crawl(
        spark, pages_df, seeds_df, robots_df, rank_df,
        Catalog(spark, str(tmp_path / "cat")),
        CrawlConfig(batch_size=50, max_depth=2, max_rounds=3,
                    seen_partitions=4),
    )
    got = [
        (r["round"], r["seq"], r["url"])
        for r in state.schedule.orderBy("round", "seq").collect()
    ]
    assert got == sim_sched
    pages_df.unpersist()


_INDEX_A = (  # index → index → urlset: spec-violating two-deep chain
    "<sitemapindex><sitemap>"
    "<loc>https://e.example/sm/mid.xml</loc></sitemap></sitemapindex>"
)
_INDEX_MID = (
    "<sitemapindex><sitemap>"
    "<loc>https://e.example/sm/leaf.xml</loc></sitemap></sitemapindex>"
)
_LEAF = "<urlset><url><loc>https://e.example/deep</loc></url></urlset>"
_CYCLE = (  # a self-listing index must terminate, contributing nothing
    "<sitemapindex><sitemap>"
    "<loc>https://f.example/sitemap.xml</loc></sitemap></sitemapindex>"
)


def test_expand_index_multilevel_and_cycle(spark):
    rows = [
        ("https://e.example/sitemap.xml", _INDEX_A),
        ("https://e.example/sm/mid.xml", _INDEX_MID),
        ("https://e.example/sm/leaf.xml", _LEAF),
        ("https://f.example/sitemap.xml", _CYCLE),
    ]
    bodies = spark.createDataFrame(rows, "sitemap_url string, body string")
    top = parse_sitemaps(
        bodies.where(F.col("sitemap_url").endswith("/sitemap.xml"))
    )
    # one level (the spec-legal default) resolves A→mid but not the
    # deeper leaf; two levels seed it; the cycle contributes nothing
    # at any level and terminates
    one = expand_sitemap_index(top, bodies)
    assert [r["loc"] for r in one.collect()] == []
    two = expand_sitemap_index(top, bodies, levels=2)
    assert [r["loc"] for r in two.collect()] == ["https://e.example/deep"]
    three = expand_sitemap_index(top, bodies, levels=3)
    assert [r["loc"] for r in three.collect()] == ["https://e.example/deep"]
