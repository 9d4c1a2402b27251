"""C4-style line-level page cleaning (Raffel et al. 2020, §2.2).

The C4 rules are the canonical webtext line filter and complement the
statistical passes this engine already has (per-host boilerplate
removal in ``operators/boilerplate.py``, corpus-level span dedup in
``operators/text.span_dedup``): they are *rule-based* and per-page, so
they catch junk a frequency detector cannot (a one-off "enable
JavaScript" warning, a page's only cookie banner). Faithful rule set:

- keep only lines ending in terminal punctuation (``. ! ? "`` and the
  curly close-quote);
- keep only lines with at least ``min_words`` words;
- drop lines containing "javascript" (case-insensitive) or one of the
  boilerplate policy phrases ("terms of use", "privacy policy",
  "cookie policy", "uses cookies");
- drop the whole PAGE when it contains "lorem ipsum" or a ``{`` (code
  leakage), or when fewer than ``min_kept_lines`` lines survive.

Scale shape (100 TB): one pass — page-level flags are codegen
``contains`` on the unsplit text, line flags ride the ``posexplode``,
and kept-line reassembly + counts come out of ONE ``groupBy(id)``
whose map-side partial delivers a row per page per partition (a page's
lines never leave the partition that exploded them). No UDFs, no
joins, one documents-sized shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

C4_POLICY_PHRASES = [
    "terms of use",
    "privacy policy",
    "cookie policy",
    "uses cookies",
]

# . ! ? straight-quote, curly close-quote — optionally followed by
# trailing whitespace.
TERMINAL_PUNCT_RE = '[.!?"”]\\s*$'


def c4_line_keep(line: Column, min_words: int = 5) -> Column:
    """The per-line C4 verdict as one codegen boolean."""
    from .text import words_col

    lower = F.lower(line)
    n_words = F.size(words_col(line))
    keep = (
        line.rlike(TERMINAL_PUNCT_RE)
        & (n_words >= F.lit(min_words))
        & ~lower.contains("javascript")
    )
    for phrase in C4_POLICY_PHRASES:
        keep = keep & ~lower.contains(phrase)
    return keep


def c4_clean(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 5,
    min_kept_lines: int = 3,
) -> DataFrame:
    """Apply the C4 rules: one row per input page with
    ``(id, n_lines, n_kept, has_lorem, has_brace, page_keep,
    clean_text)``. ``clean_text`` is the surviving lines rejoined in
    original order (computed even for dropped pages — the gate is a
    column, the caller decides); pages with no lines at all come back
    with empty ``clean_text`` and ``page_keep`` false."""
    lower_text = F.lower(F.col(text_col))
    exploded = docs.select(
        F.col(id_col),
        # NULL text must yield boolean flags (contains(NULL) is NULL)
        F.coalesce(
            lower_text.contains("lorem ipsum"), F.lit(False)
        ).alias("has_lorem"),
        F.coalesce(
            F.col(text_col).contains("{"), F.lit(False)
        ).alias("has_brace"),
        F.posexplode_outer(F.split(F.col(text_col), "\n")).alias(
            "pos", "line"
        ),
    ).withColumn(
        "line_keep",
        F.when(
            F.col("line").isNotNull(), c4_line_keep(F.col("line"), min_words)
        ).otherwise(F.lit(False)),
    )
    rolled = exploded.groupBy(id_col).agg(
        F.count("line").alias("n_lines"),
        F.sum(F.col("line_keep").cast("int")).alias("n_kept"),
        F.first("has_lorem").alias("has_lorem"),
        F.first("has_brace").alias("has_brace"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("line_keep"),
                            F.struct(F.col("pos"), F.col("line")),
                        )
                    )
                ),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("clean_text"),
    )
    return rolled.withColumn(
        "page_keep",
        ~F.col("has_lorem")
        & ~F.col("has_brace")
        & (F.col("n_kept") >= F.lit(min_kept_lines)),
    )
