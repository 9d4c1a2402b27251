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

import re
from functools import lru_cache
from typing import Dict, List, Optional, Sequence, Tuple

DEPTH_PENALTY = 0.1
BASE_BUDGET = 4.0
DEFAULT_BATCH = 1000
DEFAULT_MAX_DEPTH = 4

# RFC 9309 path rule: (pattern, allow). Patterns may use REP wildcards
# (``*`` = any character run; a TRAILING ``$`` anchors the path end).
Rule = Tuple[str, bool]

_META_RE = re.compile(r"([.^+?(){}\[\]|\\$])")


def rule_regex(pattern: str) -> str:
    """robots path pattern → anchored regex string — the byte-exact
    Python mirror of ``scheduler/robots.py::_rule_regex`` (the Spark
    fold and this simulator must agree on every pattern). ``*`` matches
    any character run, a TRAILING ``$`` anchors the path end, every
    other character (non-trailing ``$`` included) is literal. The
    escaped-literal + ``.*`` regex subset behaves identically in
    Python's ``re`` and Java's ``regexp_like``."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    esc = _META_RE.sub(r"\\\1", body)
    stars = esc.replace("*", ".*")
    return "^" + stars + ("$" if anchored else "")


@lru_cache(maxsize=65536)
def _compiled(pattern: str) -> "re.Pattern[str]":
    return re.compile(rule_regex(pattern))


def rule_matches(path: str, pattern: str) -> bool:
    """Does one robots rule pattern match ``path``? Plain prefixes
    (no ``*``, no trailing ``$``) take the startswith fast path —
    exactly like the Spark fold's ``wild`` branch."""
    if "*" not in pattern and not pattern.endswith("$"):
        return path.startswith(pattern)
    return _compiled(pattern).search(path) is not None


def robots_decision_py(path: str, rules: Sequence[Rule]) -> bool:
    """RFC 9309 §2.2.2 longest-match decision — the Python mirror of
    ``scheduler/robots.py::robots_decision``: among matching rules the
    one with the most pattern octets wins; an Allow/Disallow tie goes
    to Allow; no matching rule (or no rules) = allowed. Lengths are
    character counts on both sides (identical for the ASCII paths REP
    governs)."""
    best_len, best_allow = -1, True
    for pattern, allow in rules:
        if not pattern:
            continue
        if rule_matches(path, pattern):
            n = len(pattern)
            if n > best_len or (n == best_len and allow):
                best_len, best_allow = n, bool(allow)
    return best_allow


def politeness_k(crawl_delay: Optional[float]) -> int:
    if crawl_delay is None or crawl_delay <= 0:
        crawl_delay = 1.0
    return max(1, int(BASE_BUDGET / crawl_delay))


def priority_of(host_rank: Optional[float], depth: int) -> float:
    return (host_rank or 0.0) - DEPTH_PENALTY * depth


def robots_allows(
    host: str,
    path: str,
    robots: Dict[str, tuple],
) -> bool:
    """robots lookup; unknown host → allowed. Two dict-value shapes:

    - legacy 3-tuple ``(disallow_prefixes, crawl_delay, allowed)`` —
      prefix gate (equivalent to RFC longest-match when every rule is
      a Disallow prefix, since any match then means disallowed);
    - RFC 4-tuple ``(disallow_prefixes, crawl_delay, allowed, rules)``
      with ``rules`` a file-ordered list of :data:`Rule` — full
      longest-match decision (:func:`robots_decision_py`); the legacy
      slots are ignored, mirroring how the Spark frontier gates purely
      on ``robots_decision`` when the robots table has a ``rules``
      column (a ``Disallow: /`` host-kill is itself a rule there).
    """
    rule = robots.get(host)
    if rule is None:
        return True
    if len(rule) >= 4 and rule[3] is not None:
        return robots_decision_py(path, rule[3])
    prefixes, _, allowed = rule[:3]
    if not allowed:
        return False
    return not any(path.startswith(p) for p in prefixes)
