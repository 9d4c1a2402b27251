"""RFC 9309 robots matching: Allow/Disallow wildcard rules and the
longest-match decision, mirrored three ways — the Spark codegen fold
(`scheduler/robots.py::robots_decision`), the pure-Python policy
mirror (`scheduler/policy.py::robots_decision_py`), and the two
parsers (SQL `scheduler/robots.py::parse_robots_txt` vs pandas
`sources/robots.py::parse_robots_txt`) that feed them. The Spark
frontier and the sequential simulator must agree on every decision or
the scheduler-equivalence gate (SURVEY §5.3) silently narrows to
prefix-only robots."""

import random

import pytest
from pyspark.sql import functions as F

from langscrape_spark import synth
from langscrape_spark.scheduler.policy import (
    robots_decision_py,
    rule_matches,
    rule_regex,
)
from langscrape_spark.scheduler.robots import (
    RULES_TYPE,
    parse_robots_txt,
    robots_decision,
)
from langscrape_spark.sources.robots import parse_robots_txt as parse_py


# ---------------------------------------------------------------------------
# pattern → regex mirror
# ---------------------------------------------------------------------------

_PATTERNS = [
    "/plain/prefix",
    "/wild/*.html",
    "/multi*star*x",
    "/anchored$",
    "/star-then-anchor*$",
    "/dollar$inside/x",  # non-trailing $ is literal
    "/meta.chars+(){}[]|",
    "/back\\slash",
    "*",
    "$",
    "/",
]


def test_rule_regex_spark_python_identical(spark):
    """The SQL regex builder and the Python mirror emit byte-identical
    regex strings for every pattern class (literal metachars, stars,
    trailing and embedded dollars)."""
    from langscrape_spark.scheduler.robots import _rule_regex

    df = spark.createDataFrame([(p,) for p in _PATTERNS], "p string")
    got = {
        r["p"]: r["rx"]
        for r in df.select("p", _rule_regex(F.col("p")).alias("rx")).collect()
    }
    for p in _PATTERNS:
        assert got[p] == rule_regex(p), p


def test_rule_matches_semantics():
    assert rule_matches("/wild/deep/x.html", "/wild/*.html")
    assert not rule_matches("/wild/deep/x.htm", "/wild/*.html")
    assert rule_matches("/anchored", "/anchored$")
    assert not rule_matches("/anchored/x", "/anchored$")
    # non-trailing $ is a literal character
    assert rule_matches("/dollar$inside/xyz", "/dollar$inside/x")
    assert not rule_matches("/dollarinside/xyz", "/dollar$inside/x")
    assert rule_matches("/anything", "*")
    assert rule_matches("", "$")
    assert not rule_matches("/x", "$")


def test_decision_longest_match_and_ties():
    rules = [("/a", False), ("/a/b", True)]
    assert not robots_decision_py("/a/x", rules)
    assert robots_decision_py("/a/b/c", rules)
    # tie → Allow, regardless of file order
    assert robots_decision_py("/t/x", [("/t", False), ("/t", True)])
    assert robots_decision_py("/t/x", [("/t", True), ("/t", False)])
    # no match / no rules → allowed
    assert robots_decision_py("/other", rules)
    assert robots_decision_py("/other", [])
    # host-kill with a longer Allow carve-out
    kill = [("/", False), ("/public/", True)]
    assert robots_decision_py("/public/x", kill)
    assert not robots_decision_py("/private/x", kill)


# ---------------------------------------------------------------------------
# Spark fold ≡ Python mirror on randomized rule sets
# ---------------------------------------------------------------------------


def _random_pattern(rng: random.Random) -> str:
    segs = ["/a", "/bb", "/c.d", "/e+f", "/g(h)", "/news", "/tech", "/x[1]"]
    n = rng.randint(1, 3)
    pat = "".join(rng.choice(segs) for _ in range(n))
    if rng.random() < 0.4:
        i = rng.randint(1, len(pat))
        pat = pat[:i] + "*" + pat[i:]
    if rng.random() < 0.25:
        pat += "$"
    return pat


def _random_path(rng: random.Random) -> str:
    segs = ["/a", "/bb", "/c.d", "/e+f", "/g(h)", "/news", "/tech", "/x[1]",
            "/a/bb", "/zz"]
    return "".join(rng.choice(segs) for _ in range(rng.randint(1, 4)))


def test_spark_fold_matches_python_mirror_randomized(spark):
    """400 (rule-set, path) decisions: the codegen fold and the Python
    mirror agree bit-for-bit, including on the startswith fast path vs
    regex slow path split."""
    rng = random.Random(46)
    rows = []
    expected = []
    for i in range(80):
        rules = [
            (_random_pattern(rng), rng.random() < 0.5)
            for _ in range(rng.randint(0, 6))
        ]
        structs = [
            {
                "pattern": p,
                "regex": rule_regex(p),
                "allow": a,
                "rlen": len(p),
                "wild": "*" in p or p.endswith("$"),
            }
            for p, a in rules
        ]
        for j in range(5):
            path = _random_path(rng)
            rows.append((i * 10 + j, path, structs))
            expected.append((i * 10 + j, robots_decision_py(path, rules)))
    df = spark.createDataFrame(
        rows, f"id int, path string, rules {RULES_TYPE}"
    )
    got = {
        r["id"]: r["allowed"]
        for r in df.select(
            "id", robots_decision(F.col("path"), F.col("rules")).alias("allowed")
        ).collect()
    }
    for rid, want in expected:
        assert got[rid] == want, rid


# ---------------------------------------------------------------------------
# SQL parser ≡ pandas parser on the rules they emit
# ---------------------------------------------------------------------------

_BODIES = [
    (
        "a.example",
        "User-agent: *\nDisallow: /private/*.html\nAllow: /private/pub\n"
        "Disallow: /tmp$\nCrawl-delay: 2\n\n"
        "User-agent: otherbot\nDisallow: /ignored/\n",
    ),
    (
        "b.example",
        "# comment only\nUser-agent: foo\nUser-agent: *\nAllow: /x/ok\n"
        "Disallow: /x\nDisallow:\n",
    ),
    ("c.example", "User-agent: *\nDisallow: /\nAllow: /public/\n"),
    ("d.example", "User-agent: onlybot\nDisallow: /all/\n"),
    ("e.example", ""),
]


def test_sql_and_pandas_parsers_emit_identical_rules(spark):
    df = spark.createDataFrame(_BODIES, "host string, robots_txt string")
    sql_rules = {
        r["host"]: [
            (s["pattern"], s["regex"], s["allow"], s["rlen"], s["wild"])
            for s in r["rules"]
        ]
        for r in parse_robots_txt(df).collect()
    }
    for host, body in _BODIES:
        _, rules, _, _, _ = parse_py(body)
        want = [
            (p, rule_regex(p), a, len(p), "*" in p or p.endswith("$"))
            for p, a in rules
        ]
        assert sql_rules[host] == want, host


# ---------------------------------------------------------------------------
# frontier ≡ simulator under wildcard/Allow robots
# ---------------------------------------------------------------------------


def test_frontier_matches_simulator_with_rfc_rules(spark, tmp_path):
    """Scheduler-equivalence gate, RFC edition: a crawl whose robots
    use wildcards, anchors, and an Allow carve-out over a Disallow-/
    host-kill (inexpressible in the legacy prefix gate) admits the
    exact same schedule in the Spark frontier (rules-column path) and
    the sequential simulator (robots_decision_py path)."""
    from langscrape_spark.scheduler.frontier import CrawlConfig, run_crawl
    from langscrape_spark.scheduler.simulator import simulate_crawl
    from langscrape_spark.sources.catalog import Catalog

    n_pages = 400
    bodies = []
    for i in range(synth.N_HOSTS):
        host = f"www.site{i}.example"
        if i == 3:
            body = "User-agent: *\nDisallow: /\nAllow: /news/\n"
        elif i == 5:
            body = (
                "User-agent: *\nDisallow: /tech/*.html\n"
                "Allow: /tech/article-0000*\nCrawl-delay: 2\n"
            )
        elif i == 7:
            body = "User-agent: *\nDisallow: /sport/article-*1.html\n"
        else:
            body = "User-agent: *\nDisallow: /private/\n"
        bodies.append((host, body))

    robots_df = parse_robots_txt(
        spark.createDataFrame(bodies, "host string, robots_txt string")
    )
    robots_dict = {}
    for host, body in bodies:
        dis, rules, delay, allowed, _ = parse_py(body)
        robots_dict[host] = (dis, delay if delay is not None else 1.0,
                             allowed, rules)

    pages = {synth.url_of(i): synth.page_html(i, n_pages) for i in range(n_pages)}
    seeds = [synth.url_of(i * (n_pages // 12)) for i in range(12)]
    host_rank = {
        f"www.site{i}.example": round(1.0 - i * 0.04, 4)
        for i in range(synth.N_HOSTS)
    }
    sim_schedule, sim_seen = simulate_crawl(
        seeds, pages, robots_dict, host_rank,
        batch_size=60, max_depth=3, max_rounds=6,
    )
    # the RFC rules actually bite: some host-3 news pages admitted,
    # zero non-news host-3 pages, and the host-5 Allow carve-out holds
    h3 = [u for _, _, u in sim_schedule if "site3" in u]
    assert h3 and all("/news/" in u for u in h3)

    pages_df = synth.build_pages_df(spark, n_pages, partitions=4).cache()
    pages_df.count()
    seeds_df = spark.createDataFrame(
        [(u, 0) for u in seeds], "url string, depth int"
    )
    rank_df = spark.createDataFrame(
        list(host_rank.items()), "host string, rank double"
    )
    catalog = Catalog(spark, str(tmp_path / "cat"))
    cfg = CrawlConfig(batch_size=60, max_depth=3, max_rounds=6,
                      seen_partitions=8)
    state = run_crawl(
        spark, pages_df, seeds_df, robots_df, rank_df, catalog, cfg
    )
    got = [
        (r["round"], r["seq"], r["url"])
        for r in state.schedule.orderBy("round", "seq").collect()
    ]
    assert got == sim_schedule
    got_seen = {r["url"] for r in state.seen.collect()}
    assert got_seen == sim_seen
    pages_df.unpersist()


# ---------------------------------------------------------------------------
# RFC 9309 grouping: non-grammar lines leave the UA run open;
# first parseable Crawl-delay wins; empty patterns never match
# ---------------------------------------------------------------------------

_GROUPING_BODIES = [
    # blank line + unknown Host: between UA lines: * and Bar share one
    # group (the * agent inherits /m/); first parseable delay in file
    # order wins across the two * groups (4, not 9)
    (
        "g1.example",
        "User-agent: *\n\nHost: x.example\nUser-agent: Bar\nDisallow: /m/\n"
        "Crawl-delay: 4\nUser-agent: *\nCrawl-delay: 9\n",
    ),
    # comment-only and unknown Clean-param: lines inside a group body
    # do not end the group either
    (
        "g2.example",
        "User-agent: *\nDisallow: /a/\n# note\nClean-param: ref\n"
        "Disallow: /b/\n",
    ),
    # a recognized directive (Sitemap) DOES end a UA run: the second
    # UA line starts a fresh group that alone carries /z/
    (
        "g3.example",
        "User-agent: Foo\nSitemap: https://g3.example/sm.xml\n"
        "User-agent: *\nDisallow: /z/\n",
    ),
    # malformed first delay skipped; '2.5 extra' parses its leading
    # numeric run; later well-formed delays lose to the first parseable
    (
        "g4.example",
        "User-agent: *\nCrawl-delay: abc\nCrawl-delay: 2.5 extra\n"
        "Crawl-delay: 1\n",
    ),
]


def test_grouping_and_delay_parity_sql_vs_pandas(spark):
    """RFC 9309 §2.2.2: blank lines / unknown directives are not part
    of the grammar and MUST NOT end a User-agent run — both parsers
    group identically, and both take the first parseable delay."""
    df = spark.createDataFrame(
        _GROUPING_BODIES, "host string, robots_txt string"
    )
    got = {r["host"]: r for r in parse_robots_txt(df).collect()}
    for host, body in _GROUPING_BODIES:
        dis, rules, delay, allowed, smaps = parse_py(body)
        r = got[host]
        assert [(s["pattern"], s["allow"]) for s in r["rules"]] == rules, host
        assert list(r["disallow_prefixes"]) == dis, host
        assert r["crawl_delay"] == delay, host
        assert list(r["sitemaps"]) == smaps, host
        assert r["allowed"] == allowed, host
    # pinned absolute semantics, not just parity
    _, r1, d1, _, _ = parse_py(_GROUPING_BODIES[0][1])
    assert r1 == [("/m/", False)] and d1 == 4.0
    _, r2, _, _, _ = parse_py(_GROUPING_BODIES[1][1])
    assert r2 == [("/a/", False), ("/b/", False)]
    _, r3, _, _, s3 = parse_py(_GROUPING_BODIES[2][1])
    assert r3 == [("/z/", False)] and s3 == ["https://g3.example/sm.xml"]
    _, _, d4, _, _ = parse_py(_GROUPING_BODIES[3][1])
    assert d4 == 2.5


def test_decision_empty_pattern_never_matches(spark):
    """A hand-built rules array with pattern '' must not become a
    match-everything rlen-0 Disallow — both the codegen fold and the
    Python mirror skip it (parsers filter such rules out upstream)."""
    assert robots_decision_py("/x", [("", False)])
    structs = [
        {"pattern": "", "regex": "^", "allow": False, "rlen": 0, "wild": False}
    ]
    df = spark.createDataFrame(
        [("/x", structs)], f"path string, rules {RULES_TYPE}"
    )
    row = df.select(
        robots_decision(F.col("path"), F.col("rules")).alias("a")
    ).first()
    assert row["a"] is True


def test_policy_match_target_includes_query(spark):
    """The robots match target is path + optional query (RFC 9309
    matches '/*?sessionid=' style rules); empty '?' dropped, fragments
    excluded, pathless urls normalized to '/' — frontier and simulator
    mirror agree url-by-url."""
    from langscrape_spark.html.links import normalize_url, url_host
    from langscrape_spark.scheduler.frontier import _with_policy_columns
    from langscrape_spark.scheduler.policy import robots_allows
    from urllib.parse import urlparse

    body = "User-agent: *\nDisallow: /*?sessionid=\nDisallow: /priv/\n"
    robots_df = parse_robots_txt(
        spark.createDataFrame(
            [("h.example", body)], "host string, robots_txt string"
        )
    )
    dis, rules, delay, allowed, _ = parse_py(body)
    robots_dict = {"h.example": (dis, delay or 1.0, allowed, rules)}
    urls = [
        "https://h.example/a?sessionid=1",  # blocked: query in target
        "https://h.example/a?x=1",          # allowed: query differs
        "https://h.example/a?",             # allowed: empty query dropped
        "https://h.example/a#sessionid=1",  # allowed: fragment ≠ query
        "https://h.example?sessionid=1",    # blocked: pathless → /?sessionid=
        "https://h.example/priv/p?x=1",     # blocked: prefix matches thru query
    ]
    df = spark.createDataFrame([(u, 0) for u in urls], "url string, depth int")
    rank = spark.createDataFrame(
        [("h.example", 1.0)], "host string, rank double"
    )
    got = {r["url"] for r in _with_policy_columns(df, robots_df, rank).collect()}
    # the Python mirror (simulator enqueue target construction)
    want = set()
    for u in urls:
        norm = normalize_url(u)
        parts = urlparse(norm)
        path = parts.path or "/"
        if parts.query:
            path += "?" + parts.query
        if robots_allows(url_host(norm), path, robots_dict):
            want.add(u)
    assert got == want
    assert got == {
        "https://h.example/a?x=1",
        "https://h.example/a?",
        "https://h.example/a#sessionid=1",
    }
