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
``Disallow`` path prefixes and ``Crawl-delay``. ``Disallow:`` with an
empty value allows everything; a group disallowing ``/`` marks the
host fully disallowed. Wildcard patterns (``*``/``$``) are clipped at
the first metacharacter — a conservative over-approximation (we may
skip more than required, never less politely).
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Tuple

import pandas as pd

from pyspark.sql import DataFrame

ROBOTS_DDL = (
    "host string, disallow_prefixes array<string>, "
    "crawl_delay double, allowed boolean"
)

DEFAULT_CRAWL_DELAY = 1.0


def parse_robots_txt(
    body: str, agent: str = "*"
) -> Tuple[List[str], Optional[float], bool]:
    """Returns (disallow_prefixes, crawl_delay, allowed)."""
    groups: List[Tuple[List[str], List[str], Optional[float]]] = []
    cur_agents: List[str] = []
    cur_dis: List[str] = []
    cur_delay: Optional[float] = None
    in_group_body = False

    def flush() -> None:
        nonlocal cur_agents, cur_dis, cur_delay
        if cur_agents:
            groups.append((cur_agents, cur_dis, cur_delay))
        cur_agents, cur_dis, cur_delay = [], [], None

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
        elif key in ("disallow", "allow", "crawl-delay"):
            in_group_body = True
            if key == "disallow" and value:
                # clip at the first wildcard metachar (conservative)
                for meta in ("*", "$"):
                    idx = value.find(meta)
                    if idx >= 0:
                        value = value[:idx]
                if value:
                    cur_dis.append(value)
            elif key == "crawl-delay":
                try:
                    cur_delay = float(value)
                except ValueError:
                    pass
    flush()

    agent = agent.lower()
    exact = [g for g in groups if agent in g[0]]
    chosen = exact or [g for g in groups if "*" in g[0]]
    dis: List[str] = []
    delay: Optional[float] = None
    for _, d, cd in chosen:
        dis.extend(d)
        if cd is not None and (delay is None or cd > delay):
            delay = cd
    allowed = "/" not in dis
    dis = [p for p in dis if p != "/"]
    return dis, delay, allowed


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
                dis, delay, allowed = parse_robots_txt(body or "", agent)
                rows.append(
                    (
                        r.host,
                        dis,
                        delay if delay is not None else DEFAULT_CRAWL_DELAY,
                        allowed,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["host", "disallow_prefixes", "crawl_delay", "allowed"],
            )

    return fetched.select("host", "body").mapInPandas(gen, schema=ROBOTS_DDL)
