"""The crawl-scheduling policy — single source of truth shared by the
Spark frontier (``frontier.py``) and the sequential reference-faithful
simulator (``simulator.py``). Equivalence between the two is the
scheduler gate (BASELINE.md): same admitted order, same final seen-set.

The reference drains a static URL list strictly sequentially
(``/root/reference/scripts/run.py:63``) — it has no frontier, no
politeness, no robots. The north rule adds those; this policy defines
them deterministically:

- **priority** ``= host_rank(host) − DEPTH_PENALTY·depth`` (missing
  host_rank → 0.0); total order = (priority desc, url asc) — ties are
  broken by url so the schedule is reproducible anywhere;
- **politeness budget** per host per round
  ``k = max(1, floor(BASE_BUDGET / crawl_delay))`` (missing robots row
  → crawl_delay 1.0, allowed);
- **robots** applied at *insertion* (seeds and discovered links):
  disallowed hosts and disallow-prefix paths never enter the frontier;
- **admission** per round: per-host top-k by the total order, then a
  global cap of ``batch_size`` by the same order;
- **depth**: discovered url's depth = min over discovering parents in
  that round + 1; urls beyond ``max_depth`` are not enqueued;
- **seen** = every url ever enqueued (frontier ∪ admitted history);
  a url is enqueued at most once, ever.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

DEPTH_PENALTY = 0.1
BASE_BUDGET = 4.0
DEFAULT_BATCH = 1000
DEFAULT_MAX_DEPTH = 4


def politeness_k(crawl_delay: Optional[float]) -> int:
    if crawl_delay is None or crawl_delay <= 0:
        crawl_delay = 1.0
    return max(1, int(BASE_BUDGET / crawl_delay))


def priority_of(host_rank: Optional[float], depth: int) -> float:
    return (host_rank or 0.0) - DEPTH_PENALTY * depth


def robots_allows(
    host: str,
    path: str,
    robots: Dict[str, Tuple[List[str], float, bool]],
) -> bool:
    """robots lookup: ``robots[host] = (disallow_prefixes, crawl_delay,
    allowed)``; unknown host → allowed."""
    rule = robots.get(host)
    if rule is None:
        return True
    prefixes, _, allowed = rule
    if not allowed:
        return False
    return not any(path.startswith(p) for p in prefixes)
