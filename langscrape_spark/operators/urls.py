"""URL canonicalization — pure JVM column expressions.

A 10^10-URL frontier admits on exact url-string equality
(``scheduler/frontier.py``); without canonicalization the same page is
fetched once per spelling (``HTTP://Host/``, ``http://host:80/``,
``http://host/?utm_source=x``...). This operator normalizes urls to a
canonical form BEFORE they enter the seen set / frontier — apply it to
seed lists and to harvested links (``html/links.py::decode_url`` output)
upstream of admission. It deliberately stays a standalone projection:
admission semantics (simulator-verified) are unchanged; callers opt in.

Extends the reference's url handling (``langscrape/utils.py`` validate/
decode — see SURVEY.md §2.10 scalar families) with the normalization the
reference never needed at 1 URL/LLM-call scale.

Canonical form (RFC 3986 normalizations + tracker stripping):
  1. scheme and host lowercased
  2. fragment removed
  3. default port dropped (http:80, https:443)
  4. query params: ``utm_*`` / ``gclid`` / ``fbclid`` keys dropped,
     the rest sorted lexicographically (param order never
     distinguishes resources in practice; sorting makes the string
     canonical); empty query → no ``?``
  5. empty path → ``/``

Everything is regexp/split/array built-ins inside whole-stage codegen —
no Python, no UDFs, no shuffle. Oracled in ANSI SQL (q43).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, Window, functions as F

TRACKER_KEYS = ("gclid", "fbclid")


def _params_clean(query: Column) -> Column:
    """Split a raw query string, drop tracker params, sort the rest."""
    parts = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~F.lower(p).startswith("utm_")
        & ~F.lower(F.split_part(p, F.lit("="), F.lit(1))).isin(*TRACKER_KEYS),
    )
    return F.array_sort(parts)


def canonicalize_url(url: Column) -> Column:
    """Canonical url string (see module docstring), NULL-safe: rows
    without a ``scheme://host`` shape come back unchanged (minus
    fragment) so callers can keep routing them through
    ``validate_url``."""
    no_frag = F.regexp_replace(url, "#.*$", "")
    scheme = F.lower(F.regexp_extract(no_frag, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(no_frag, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.regexp_extract(rest, r"^([^/?]*)", 1)
    pathq = F.substring(rest, F.length(hostport) + 1, F.lit(1 << 30))
    host = F.lower(F.regexp_replace(hostport, ":[0-9]+$", ""))
    port = F.regexp_extract(hostport, ":([0-9]+)$", 1)
    keep_port = (port != "") & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    raw_query = F.when(
        pathq.contains("?"), F.regexp_replace(pathq, r"^[^?]*\?", "")
    ).otherwise(F.lit(""))
    canon_q = F.array_join(_params_clean(raw_query), "&")
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(canon_q != "", F.concat(F.lit("?"), canon_q)).otherwise(F.lit("")),
    )
    return F.when(scheme == "", no_frag).otherwise(rebuilt)


# ---------------------------------------------------------------------------
# Crawl-trap detection (URL-template explosion)
# ---------------------------------------------------------------------------


def host_of(url_col: Column) -> Column:
    """Lowercased host of a url — scheme, userinfo (``user:pw@``) and
    port stripped. Same answer as ``F.lower(F.try_parse_url(url,
    'HOST'))`` but built from a regex BOTH engines share, so DuckDB
    oracles can mirror it exactly (RE2 supports the non-capturing
    userinfo group). The single shared definition keeps host keys
    joinable across the trap/pagerank/link-graph/snapshot tables."""
    return F.lower(
        F.regexp_replace(
            F.regexp_extract(
                url_col,
                r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#]*@)?([^/?#]*)",
                1,
            ),
            ":[0-9]+$",
            "",
        )
    )


def url_template(url: Column) -> Column:
    """Collapse a url to its path TEMPLATE — the signature that groups
    "the same page generator": scheme/host/query/fragment dropped,
    lowercase path, long hex runs (ids, session tokens; ≥8 chars)
    → ``<H>`` first, then digit runs → ``<N>``. ``/cal/2026/07/15``
    and ``/cal/2011/01/03`` both become ``/cal/<N>/<N>/<N>`` — one
    group, however many million spellings exist.

    Pure codegen (try_parse_url + two regexp_replace); the hex class
    must run BEFORE the digit class or ``deadbeef123`` tears into
    ``deadbeef<N>``. Reproducible in ANSI SQL (oracle q50)."""
    path = F.lower(
        F.coalesce(
            F.nullif(F.try_parse_url(url, F.lit("PATH")), F.lit("")),
            F.lit("/"),
        )
    )
    no_hex = F.regexp_replace(path, r"[0-9a-f]{8,}", "<H>")
    return F.regexp_replace(no_hex, r"[0-9]+", "<N>")


def detect_url_traps(
    df,
    url_col: str = "url",
    min_urls: int = 1000,
    share_threshold: float = 0.5,
):
    """Per-(host, template) explosion detector for the frontier: a
    crawler trap (calendar pages, faceted search, session-id spellings)
    shows up as ONE template generating an outsized share of a host's
    distinct urls. Returns ``(host, template, n_urls, host_urls,
    share, is_trap)``; feed the flagged rows to :func:`trap_filter`
    to stop admitting the trap's urls.

    is_trap = ``n_urls ≥ min_urls`` AND ``share ≥ share_threshold``.
    Both knobs matter: a big site legitimately has a dominant article
    template (high share, but so is the whole host — raise min_urls),
    while a trap's template count grows without bound round over
    round (run the detector per round on the cumulative seen set and
    the thresholds become a growth gate).

    Scale shape: two hash aggregations, both keyed by (host[,template])
    — equi-key shuffles with map-side partial counts; a hot host is
    one group per template, never one partition per url. The result is
    tiny (distinct templates, not urls) and broadcast-joinable back
    onto the frontier. No UDFs, no windows, no driver collect."""
    u = F.col(url_col)
    t = df.select(
        F.lower(F.try_parse_url(u, F.lit("HOST"))).alias("host"),
        url_template(u).alias("template"),
        u.alias("_u"),
    ).where(F.col("host").isNotNull())
    per_tmpl = t.groupBy("host", "template").agg(
        F.countDistinct("_u").alias("n_urls")
    )
    per_host = per_tmpl.groupBy("host").agg(
        F.sum("n_urls").alias("host_urls")
    )
    out = per_tmpl.join(per_host, "host")
    share = F.try_divide(F.col("n_urls"), F.col("host_urls"))
    return out.select(
        "host",
        "template",
        "n_urls",
        "host_urls",
        share.alias("share"),
        (
            (F.col("n_urls") >= F.lit(min_urls))
            & (share >= F.lit(share_threshold))
        ).alias("is_trap"),
    )


def trap_filter(frontier, traps, url_col: str = "url"):
    """Drop frontier urls whose (host, template) is a flagged trap —
    a broadcast anti-join (the traps table is distinct templates,
    tiny by construction). Opt-in like canonicalize_url: admission
    semantics stay simulator-verified unless the caller engages it."""
    u = F.col(url_col)
    keyed = frontier.withColumn(
        "_trap_host", F.lower(F.try_parse_url(u, F.lit("HOST")))
    ).withColumn("_trap_tmpl", url_template(u))
    flagged = traps.where(F.col("is_trap")).select(
        F.col("host").alias("_trap_host"),
        F.col("template").alias("_trap_tmpl"),
    )
    return (
        keyed.join(
            F.broadcast(flagged), ["_trap_host", "_trap_tmpl"], "left_anti"
        )
        .drop("_trap_host", "_trap_tmpl")
    )


def resolve_redirects(
    edges,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 32,
    checkpoint_every: int = 4,
):
    """Resolve HTTP-redirect chains to their terminal URL by pointer
    doubling — the canonicalization step between the link harvest and
    the frontier (a crawl that schedules every hop of a 10-step
    redirect chain wastes 10 politeness slots on one page, and dup
    detection must key on the TERMINAL url).

    Input: one row per redirect edge; multiple destinations per source
    collapse deterministically to ``min(dst)``. Output: one row per
    url in the edge universe (sources ∪ destinations) with
    ``(url, resolved, hops, status)`` — ``terminal`` when the chain
    reached a url with no outgoing redirect within the hop cap (hops =
    exact chain length, 0 for non-redirecting urls), else
    ``unresolved`` (a cycle, or a chain longer than the cap) with NULL
    resolved/hops. The effective cap is ``2^ceil(log2(max_hops))``
    applications of the redirect map.

    Scale shape: this is THE textbook pointer-doubling job —
    ``ceil(log2(max_hops))`` equi-key self-joins of a urls-sized
    frame (composing the walked map with itself doubles the covered
    distance per round), never a row-at-a-time walk and never
    max_hops sequential joins; lineage is truncated with a lazy
    ``localCheckpoint`` every ``checkpoint_every`` rounds (the
    host-PageRank pattern). One final semi-join classifies terminals.
    """
    import math

    m = (
        edges.where(F.col(src_col).isNotNull() & F.col(dst_col).isNotNull())
        .groupBy(F.col(src_col).alias("_u"))
        .agg(F.min(dst_col).alias("_dst"))
    )
    univ = (
        m.select(F.col("_u").alias("url"))
        .union(m.select(F.col("_dst").alias("url")))
        .distinct()
    )
    state = univ.join(m, univ["url"] == m["_u"], "left").select(
        "url",
        F.coalesce("_dst", "url").alias("cur"),
        F.when(F.col("_dst").isNotNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("steps"),
    )
    rounds = max(1, math.ceil(math.log2(max(2, int(max_hops)))))
    for i in range(rounds):
        hop = state.select(
            F.col("url").alias("_hu"),
            F.col("cur").alias("_hcur"),
            F.col("steps").alias("_hsteps"),
        )
        # every cur is in the universe, so the join always matches;
        # composing the map with itself doubles the walked distance
        state = (
            state.join(hop, state["cur"] == hop["_hu"])
            .select(
                "url",
                F.col("_hcur").alias("cur"),
                (F.col("steps") + F.col("_hsteps")).alias("steps"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < rounds:
            state = state.localCheckpoint(eager=False)

    has_out = m.select(F.col("_u").alias("_out_u"))
    done = state.join(has_out, state["cur"] == has_out["_out_u"], "left")
    return done.select(
        "url",
        F.when(F.col("_out_u").isNull(), F.col("cur")).alias("resolved"),
        F.when(F.col("_out_u").isNull(), F.col("steps")).alias("hops"),
        F.when(F.col("_out_u").isNull(), F.lit("terminal"))
        .otherwise(F.lit("unresolved"))
        .alias("status"),
    )


def path_segments(url: Column) -> Column:
    """Non-empty path segments of a url (everything after the
    authority, before ``?``/``#``), split on ``/``. Shared by the
    prefix rollup and the trap detectors so path parsing cannot
    diverge between them."""
    path = F.regexp_replace(
        url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", ""
    )
    path = F.regexp_replace(path, r"[?#].*$", "")
    return F.filter(F.split(path, "/"), lambda s: s != "")


def path_prefix_rollup(df, url_col: str = "url"):
    """Hierarchical directory rollup of a url corpus: one row per
    (host, directory prefix) with page count, distinct immediate
    children, and depth — the crawl-analytics view that spots
    calendar traps (one prefix, thousands of children), decides
    per-directory sampling budgets, and sizes sitemaps.

    Every page at depth n contributes n rows (its ancestor
    directories, root included) — explode factor = avg path depth,
    linear in corpus size; the rollup is one (host, prefix) hash agg,
    map-side combinable. Output: ``(host, prefix, depth, n_pages,
    n_children)``.
    """
    segs = path_segments(F.col(url_col))
    d = df.select(
        host_of(F.col(url_col)).alias("host"), segs.alias("segs")
    ).where(F.size("segs") > 0)
    lev = d.select(
        "host",
        "segs",
        F.explode(F.sequence(F.lit(0), F.size("segs") - 1)).alias("d"),
    )
    return (
        lev.select(
            "host",
            F.concat(
                F.lit("/"),
                F.array_join(F.slice("segs", 1, F.col("d")), "/"),
            ).alias("prefix"),
            F.col("d").cast("int").alias("depth"),
            F.element_at("segs", F.col("d") + 1).alias("child"),
        )
        .groupBy("host", "prefix", "depth")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.countDistinct("child").alias("n_children"),
        )
    )


# Demo subset of the (public-domain) Public Suffix List: the operator
# takes the rules as a DataFrame, so production swaps in the full PSL
# (~9k rules — still a broadcast dimension table). Forms: exact rules,
# '*.x' wildcards (one label), '!x' exceptions (PSL semantics).
PSL_SUBSET = [
    "com", "org", "net", "edu", "gov", "io", "dev",
    "uk", "co.uk", "org.uk", "ac.uk",
    "jp", "co.jp", "au", "com.au",
    "github.io",   # private-section entry: user sites are own domains
    "*.ck",        # wildcard: every label under .ck is a suffix…
    "!www.ck",     # …except www.ck itself (the canonical PSL example)
]


def registrable_domain(
    hosts: DataFrame,
    rules: Optional[DataFrame] = None,
    host_col: str = "host",
) -> DataFrame:
    """Registrable domain (eTLD+1) per host under Public Suffix List
    semantics — the unit a polite crawler actually budgets by
    (``a.example.co.uk`` and ``b.example.co.uk`` are ONE site;
    ``x.github.io`` and ``y.github.io`` are TWO). Hostname-keyed
    politeness (the q02 family) over-throttles multi-subdomain sites
    and under-throttles user-content suffixes; this operator provides
    the right key.

    Full PSL algorithm, set-joined instead of per-host trie walks:
    every host explodes into its ≤ n label-suffix candidates (exact
    and one-label-wildcard forms), ONE broadcast join against the
    rules table matches them all, and a per-host window picks the
    prevailing rule (exception beats all, else longest). No rule →
    the PSL default ``*`` (suffix = last label). The registrable
    domain is the suffix plus one label; a host that IS a public
    suffix gets NULL (nothing registrable).

    Scale shape: labels arrays are bounded (≤ 127 DNS labels), the
    candidate explode is ≤ 2n rows per host, the rules side is a
    broadcast dimension, and the prevailing-rule window partitions by
    host — corpus-parallel by construction.

    Output: ``(host, suffix, registrable)``.
    """
    spark = hosts.sparkSession
    if rules is None:
        rules = spark.createDataFrame(
            [(r,) for r in PSL_SUBSET], "rule string"
        )
    r = rules.select(
        F.when(
            F.col("rule").startswith("!"),
            F.expr("substring(rule, 2)"),
        )
        .otherwise(F.col("rule"))
        .alias("form"),
        F.col("rule").startswith("!").alias("is_exc"),
    )
    h = hosts.select(F.col(host_col).alias("host")).where(
        F.col("host").isNotNull() & (F.col("host") != "")
    ).distinct()
    labels = F.split(F.lower(F.col("host")), r"\.")
    n = F.size(labels)
    cands = h.select(
        "host",
        labels.alias("ls"),
        n.alias("n"),
        F.explode(F.sequence(F.lit(1), n)).alias("k"),
    ).select(
        "host",
        "ls",
        "n",
        "k",
        F.array_join(
            F.slice(F.col("ls"), F.col("n") - F.col("k") + 1, F.col("k")),
            ".",
        ).alias("exact_form"),
        F.when(
            F.col("k") >= 2,
            F.concat(
                F.lit("*."),
                F.array_join(
                    F.slice(
                        F.col("ls"),
                        F.col("n") - F.col("k") + 2,
                        F.col("k") - 1,
                    ),
                    ".",
                ),
            ),
        ).alias("wild_form"),
    )
    # slim to (host, k, form) before the join/window: the up-to-127-
    # label array would otherwise ride every candidate row through the
    # broadcast join and the shuffle only to be discarded (all_h
    # re-reads labels from the hosts frame)
    melted = cands.select(
        "host", "k", F.col("exact_form").alias("form")
    ).unionByName(
        cands.where(F.col("wild_form").isNotNull()).select(
            "host", "k", F.col("wild_form").alias("form")
        )
    )
    hits = melted.join(F.broadcast(r), "form")
    w = Window.partitionBy("host").orderBy(
        F.desc("is_exc"), F.desc("k"), "form"
    )
    best = (
        hits.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "host",
            # exception rules define the suffix as the rule MINUS its
            # leftmost label (PSL: !www.ck -> suffix is ck)
            F.when(F.col("is_exc"), F.col("k") - 1)
            .otherwise(F.col("k"))
            .alias("slen"),
        )
    )
    # PSL default rule '*': hosts matching nothing take suffix = last
    # label
    all_h = h.select(
        "host", labels.alias("ls"), n.alias("n")
    ).join(best, "host", "left").withColumn(
        "slen", F.coalesce("slen", F.lit(1))
    )
    suffix = F.array_join(
        F.slice(F.col("ls"), F.col("n") - F.col("slen") + 1, F.col("slen")),
        ".",
    )
    registrable = F.when(
        F.col("n") > F.col("slen"),
        F.array_join(
            F.slice(
                F.col("ls"),
                F.col("n") - F.col("slen"),
                F.col("slen") + 1,
            ),
            ".",
        ),
    )
    return all_h.select(
        "host", suffix.alias("suffix"), registrable.alias("registrable")
    )


def surt_key(url: Column) -> Column:
    """SURT form (Sort-friendly URI Reordering Transform) — the
    Heritrix / Wayback / Common-Crawl CDX index key:
    ``com,example,www)/path?b=2&a=1`` with the host reversed on dots
    so one registrable domain's urls SORT CONTIGUOUSLY. That sort
    locality is the point at 10^10 urls: a seen-set, CDX index or
    frontier partitioned by SURT range groups a domain's crawl state
    into the same partitions/row groups (range pruning on eTLD+1
    prefixes), where raw-url ordering scatters it by subdomain.

    Canonicalization applied (the engine's subset of Heritrix's):
    scheme and userinfo dropped, host lowercased and port stripped
    (:func:`host_of`), path lowercased with a lone trailing slash
    trimmed, query params lowercased, tracker params dropped and the
    rest SORTED (:func:`_params_clean`'s gates). Session-id stripping
    is deliberately not here — that is mined evidence, not syntax
    (``mirrors.dust_rules`` + ``apply_dust_rules``). NULL/hostless
    urls yield NULL.
    """
    host = host_of(url)
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    path = F.lower(
        F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit(""))
    )
    path = F.regexp_replace(path, "/$", "")
    q = _params_clean(
        F.lower(F.coalesce(F.try_parse_url(url, F.lit("QUERY")), F.lit("")))
    )
    key = F.concat(
        rev,
        F.lit(")"),
        path,
        F.when(
            F.size(q) > 0, F.concat(F.lit("?"), F.array_join(q, "&"))
        ).otherwise(F.lit("")),
    )
    return F.when(host.isNotNull() & (host != ""), key)
