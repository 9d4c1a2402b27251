"""Multi-pattern phrase-blocklist matching — the C4/Gopher "bad
words" gate generalized to arbitrary-size phrase lists.

Reference scope: the reference pipeline has no content blocklist; C4
(Raffel et al. 2020, §2.2) drops any page containing a phrase from
the "List of Dirty, Naughty ..." list, and every production webtext
pipeline ships an equivalent gate. Semantics here: WORD-BOUNDARY
phrase match over normalized text (lowercase, non-alphanumerics
collapsed to single spaces) — "cat" never matches inside
"concatenate", and multi-word phrases must appear as consecutive
tokens.

Two plans, one contract (pinned equal by tests):

- ``blocklist_matches`` — the SCALE path. Docs explode to DISTINCT
  (doc, token) postings; phrases join on their FIRST token (the
  candidate prune — lossless under word-boundary semantics, because
  a matching doc necessarily contains the phrase's first token);
  survivors verify with one JVM ``contains`` on the space-padded
  normalized text. No UDF anywhere; the phrase side can be millions
  of rows (it shuffles/broadcasts like any dimension table), and the
  doc side is touched once per DISTINCT first-token hit, not once
  per phrase — a 100k-phrase list with a heavy-tailed first-token
  distribution probes each doc a handful of times.
- ``blocklist_flag_rlike`` — the SMALL-LIST fast path: one compiled
  regex alternation (anchored with spaces) evaluated inside
  whole-stage codegen; zero joins, zero shuffles. Use when the list
  fits a regex comfortably (~<=1k phrases); it returns only the
  flag, not which phrases hit.

An Aho-Corasick automaton (the textbook answer) would be a
per-executor Python structure scanning per char — slower than both
JVM plans here and opaque to Catalyst; the posting-join IS the
distributed automaton: the first-token index plays the role of the
goto function, `contains` the role of the output verification.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def normalize_for_match(col: Column) -> Column:
    """lowercase, collapse every non-alphanumeric run to one space,
    trim — the shared normal form for text AND phrases."""
    return F.trim(
        F.regexp_replace(F.lower(col), "[^a-z0-9]+", " ")
    )


def _padded(col: Column) -> Column:
    return F.concat(F.lit(" "), col, F.lit(" "))


def blocklist_matches(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    phrases: DataFrame,
    phrase_col: str = "phrase",
    broadcast_phrases: bool = True,
) -> DataFrame:
    """Per-document blocklist hits: ``(id_col, n_blocked, phrases_hit
    array<string> sorted)`` — one row per document with >=1 hit.

    ``broadcast_phrases=False`` switches the candidate join to a
    shuffle join for phrase lists too big to broadcast; the plan is
    otherwise identical.
    """
    norm_docs = docs.select(
        F.col(id_col), _padded(normalize_for_match(F.col(text_col))).alias("_pt")
    ).where(F.length("_pt") > 2)
    toks = norm_docs.select(
        id_col, F.explode(F.split(F.trim(F.col("_pt")), " ")).alias("_tok")
    ).distinct()
    ph = (
        phrases.select(normalize_for_match(F.col(phrase_col)).alias("_ph"))
        .where(F.length("_ph") > 0)
        .distinct()
        .select(
            "_ph", F.split(F.col("_ph"), " ").getItem(0).alias("_tok")
        )
    )
    ph_side = F.broadcast(ph) if broadcast_phrases else ph
    cands = toks.join(ph_side, "_tok").select(id_col, "_ph")
    hits = (
        cands.join(norm_docs, id_col)
        .where(
            F.col("_pt").contains(_padded(F.col("_ph")))
        )
        .select(id_col, "_ph")
    )
    return (
        hits.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_blocked"),
            F.array_sort(F.collect_list("_ph")).alias("phrases_hit"),
        )
    )


def blocklist_flag_rlike(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    phrase_literals: list[str],
    out: str = "blocked",
) -> DataFrame:
    """Small-list codegen path: one boolean column, no joins. The
    alternation is built over normalized phrases with regex
    metacharacters escaped, matched space-anchored against the padded
    normalized text."""
    import re as _re

    norm = sorted(
        {p for p in (_norm_py(x) for x in phrase_literals) if p}
    )
    if not norm:
        return docs.select(F.col(id_col), F.lit(False).alias(out))
    alt = "|".join(_re.escape(p) for p in norm)
    return docs.select(
        F.col(id_col),
        _padded(normalize_for_match(F.col(text_col)))
        .rlike(f" ({alt}) ")
        .alias(out),
    )


def _norm_py(s: str) -> str:
    """Python twin of :func:`normalize_for_match` (for literal phrase
    lists handled driver-side)."""
    import re as _re

    return _re.sub(r"[^a-z0-9]+", " ", s.lower()).strip()
