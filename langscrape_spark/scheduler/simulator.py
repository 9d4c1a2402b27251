"""Reference-faithful sequential crawl simulator (the oracle).

A single-process, dictionary-based implementation of the policy in
``policy.py`` — deliberately the *simplest possible* encoding of the
semantics, mirroring how the reference drains its URL list in one
Python loop (``/root/reference/scripts/run.py:63-98``). The Spark
frontier must reproduce this simulator's admitted order and final
seen-set exactly (SURVEY.md §5.3); the equivalence test is the
scheduler gate.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple
from urllib.parse import urlparse

from ..html.links import extract_links, normalize_url, url_host
from .policy import (
    DEFAULT_BATCH,
    DEFAULT_MAX_DEPTH,
    politeness_k,
    priority_of,
    robots_allows,
)


def _url_template(url: str) -> str:
    """Python twin of ``operators/urls.py::url_template`` (lowercased
    path, hex runs ≥8 → ``<H>`` before digit runs → ``<N>``) — must
    stay expression-for-expression identical or the trap-filtered
    equivalence test (test_scheduler.py) diverges."""
    import re

    path = (urlparse(url).path or "/").lower()
    path = re.sub(r"[0-9a-f]{8,}", "<H>", path)
    return re.sub(r"[0-9]+", "<N>", path)


def simulate_crawl(
    seeds: List[str],
    pages: Dict[str, str],  # url -> html (the "fetch")
    robots: Dict[str, Tuple[List[str], float, bool]],
    host_rank: Dict[str, float],
    batch_size: int = DEFAULT_BATCH,
    max_depth: int = DEFAULT_MAX_DEPTH,
    max_rounds: int = 100,
    traps: Optional[set] = None,
) -> Tuple[List[Tuple[int, int, str]], set]:
    """Returns (schedule, seen): schedule rows are (round, seq, url) in
    admission order; seen is the final URL-seen set.  ``traps`` is an
    optional set of flagged ``(host, path-template)`` pairs (the
    ``detect_url_traps`` output shape): a url matching one is never
    enqueued, never marked seen — mirroring ``run_crawl``'s optional
    ``traps`` frontier filter."""
    frontier: Dict[str, Tuple[str, int, float]] = {}  # url -> (host, depth, priority)
    seen: set = set()

    def enqueue(url: str, depth: int) -> None:
        norm = normalize_url(url)
        if norm is None or norm in seen:
            return
        host = url_host(norm)
        if host is None:
            return
        if traps and (host, _url_template(norm)) in traps:
            return
        # RFC 9309 match target = path + optional query (mirrors
        # frontier._with_policy_columns; '?sessionid=' rules must fire)
        parts = urlparse(norm)
        path = parts.path or "/"
        if parts.query:
            path += "?" + parts.query
        if not robots_allows(host, path, robots):
            return
        if depth > max_depth:
            return
        seen.add(norm)
        frontier[norm] = (host, depth, priority_of(host_rank.get(host), depth))

    for url in seeds:
        enqueue(url, 0)

    schedule: List[Tuple[int, int, str]] = []
    for round_no in range(max_rounds):
        if not frontier:
            break
        # per-host top-k by (priority desc, url asc)
        by_host: Dict[str, List[Tuple[float, str]]] = {}
        for url, (host, depth, prio) in frontier.items():
            by_host.setdefault(host, []).append((prio, url))
        admitted: List[Tuple[float, str]] = []
        for host, entries in by_host.items():
            entries.sort(key=lambda e: (-e[0], e[1]))
            k = politeness_k(robots.get(host, (None, 1.0, True))[1] if host in robots else 1.0)
            admitted.extend(entries[:k])
        # global cap by the same total order
        admitted.sort(key=lambda e: (-e[0], e[1]))
        admitted = admitted[:batch_size]

        discovered: Dict[str, int] = {}  # url -> min depth this round
        for seq, (prio, url) in enumerate(admitted):
            schedule.append((round_no, seq, url))
            host, depth, _ = frontier.pop(url)
            html = pages.get(url)
            if html is None:
                continue  # fetch miss: admitted + seen, no links
            for link in extract_links(html, url):
                d = depth + 1
                if link not in discovered or d < discovered[link]:
                    discovered[link] = d
        for url, depth in discovered.items():
            enqueue(url, depth)

    return schedule, seen
