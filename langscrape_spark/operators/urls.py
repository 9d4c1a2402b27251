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

from pyspark.sql import Column, functions as F

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
