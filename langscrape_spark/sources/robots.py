"""robots.txt ingestion: raw fetched bodies → the rules dimension table.

The reference has no robots handling at all (its crawler is a
hand-curated URL list); the north rule requires "robots.txt rules
broadcast as a DataFrame join". The *join* lives in
``scheduler/frontier.py::_with_policy_columns``; this module produces
its right-hand side from raw robots.txt bodies, so a production
deployment can refresh the rules table from a robots-fetch pass.

Parsing follows the original robots exclusion protocol subset the
engine enforces (RFC 9309 semantics for grouping): the groups whose
``User-agent`` matches (exact agent name, else ``*``) contribute
``Allow``/``Disallow`` path rules and ``Crawl-delay``. Rules keep
file order and full REP wildcard patterns (``*`` any run, trailing
``$`` anchor) in the ``rules`` column the frontier's longest-match
gate consumes; the legacy ``disallow_prefixes`` column additionally
clips wildcards at the first metacharacter — a conservative
over-approximation (may skip more than required, never less politely)
— for consumers still on the prefix gate. ``Disallow:`` with an empty
value allows everything; a group disallowing ``/`` marks the host
fully disallowed in the legacy ``allowed`` boolean (the rules gate
instead lets an ``Allow:`` carve-out outrank it, per RFC 9309
longest-match).
"""

from __future__ import annotations

import re
from typing import Iterator, List, Optional, Tuple

import pandas as pd

from pyspark.sql import DataFrame

from ..scheduler.policy import Rule, rule_regex

ROBOTS_DDL = (
    "host string, disallow_prefixes array<string>, "
    "rules array<struct<pattern:string,regex:string,allow:boolean,"
    "rlen:int,wild:boolean>>, "
    "sitemaps array<string>, crawl_delay double, allowed boolean"
)

DEFAULT_CRAWL_DELAY = 1.0


def parse_robots_txt(
    body: str, agent: str = "*"
) -> Tuple[List[str], List[Rule], Optional[float], bool, List[str]]:
    """Returns (disallow_prefixes, rules, crawl_delay, allowed,
    sitemaps); rules are file-ordered ``(pattern, allow)`` across the
    chosen groups; sitemaps are group-INDEPENDENT (RFC 9309 §2.4) and
    keep file order across the whole file."""
    groups: List[Tuple[List[str], List[Rule], Optional[float]]] = []
    sitemaps: List[str] = []
    cur_agents: List[str] = []
    cur_rules: List[Rule] = []
    cur_delay: Optional[float] = None
    in_group_body = False

    def flush() -> None:
        nonlocal cur_agents, cur_rules, cur_delay
        if cur_agents:
            groups.append((cur_agents, cur_rules, cur_delay))
        cur_agents, cur_rules, cur_delay = [], [], None

    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if in_group_body:
                flush()
                in_group_body = False
            cur_agents.append(value.lower())
        elif key == "sitemap":
            # group-independent, but still breaks a User-agent run —
            # like every recognized non-UA directive; blank lines and
            # unknown directives (Host:, …) are NOT part of the REP
            # grammar and leave the run open (RFC 9309 §2.2.2), the
            # same grouping the SQL parser's significant-line filter
            # + gaps-and-islands produces
            in_group_body = True
            if value:
                sitemaps.append(value.split()[0])
        elif key in ("disallow", "allow", "crawl-delay"):
            in_group_body = True
            if key in ("disallow", "allow") and value:
                cur_rules.append((value, key == "allow"))
            elif key == "crawl-delay" and cur_delay is None:
                # FIRST parseable delay wins (the SQL parser takes min
                # by line idx); extract the leading numeric run like
                # the SQL regex so "2.5 extra" parses as 2.5 in both
                m = re.match(r"[0-9.]+", value)
                if m:
                    try:
                        cur_delay = float(m.group(0))
                    except ValueError:
                        pass
    flush()

    agent = agent.lower()
    exact = [g for g in groups if agent in g[0]]
    chosen = exact or [g for g in groups if "*" in g[0]]
    rules: List[Rule] = []
    delay: Optional[float] = None
    for _, rs, cd in chosen:
        rules.extend(rs)
        # groups are disjoint file-order line ranges, so the first
        # group with a delay holds the file's first parseable delay —
        # identical to the SQL parser's min-by-idx across * groups
        if delay is None and cd is not None:
            delay = cd
    dis: List[str] = []
    for pattern, allow in rules:
        if allow:
            continue
        # legacy prefix: clip at the first wildcard metachar
        clipped = pattern
        for meta in ("*", "$"):
            idx = clipped.find(meta)
            if idx >= 0:
                clipped = clipped[:idx]
        if clipped:
            dis.append(clipped)
    allowed = "/" not in dis
    dis = [p for p in dis if p != "/"]
    return dis, rules, delay, allowed, sitemaps


def robots_table(fetched: DataFrame, agent: str = "*") -> DataFrame:
    """(host, body:string|binary) → the rules table the politeness
    join consumes. One Arrow-batched pass; no shuffle (the consumer
    broadcasts the result)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                body = r.body
                if isinstance(body, (bytes, bytearray)):
                    body = bytes(body).decode("utf-8", errors="replace")
                dis, rules, delay, allowed, smaps = parse_robots_txt(
                    body or "", agent
                )
                rule_structs = [
                    {
                        "pattern": p,
                        "regex": rule_regex(p),
                        "allow": a,
                        "rlen": len(p),
                        "wild": "*" in p or p.endswith("$"),
                    }
                    for p, a in rules
                ]
                rows.append(
                    (
                        r.host,
                        dis,
                        rule_structs,
                        smaps,
                        delay if delay is not None else DEFAULT_CRAWL_DELAY,
                        allowed,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "host",
                    "disallow_prefixes",
                    "rules",
                    "sitemaps",
                    "crawl_delay",
                    "allowed",
                ],
            )

    return fetched.select("host", "body").mapInPandas(gen, schema=ROBOTS_DDL)
