"""``clean_tags``: post-extraction tag-vocabulary filter.

Reference semantics (``langscrape/nodes/post_processor.py:11-36``): for
each of the four summary tag fields, keep only values present in the
allowed vocabulary (default: the UNION of all four vocabularies, per
the reference's default argument); a non-list value becomes ``[]``.
Order and duplicate occurrences of surviving tags are preserved
(``[tag for tag in tags if tag in TAGS]`` is a stable filter, NOT a
set intersection — ``array_intersect`` would dedupe, so the column
form uses ``F.filter`` + membership instead).

Spark mapping (SURVEY §2.4): the vocabulary is a few-KB literal folded
into the plan (broadcast-equivalent; no join, no shuffle) and the
filter is a codegen'd higher-order function — per-row cost is
|tags|·|vocab| string compares on short arrays, negligible beside the
extraction kernel.
"""

from __future__ import annotations

from typing import Iterable, Optional, Sequence

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.tagvocab import ALL_TAGS, VOCABULARIES

# summary-record field → governing vocabulary key
# (reference post_processor.py:22-27; the reference nevertheless
# filters every field against the union, which is the default here.)
TAG_FIELDS = {
    "location_tags": "location",
    "figures_tags": "figures",
    "countries_and_organizations_tags": "countries_and_organizations",
    "theme_tags": "theme",
}


def _vocab_array(vocab: Sequence[str]) -> Column:
    return F.array(*[F.lit(t) for t in vocab])


def clean_tags_col(col: Column, vocab: Optional[Sequence[str]] = None) -> Column:
    """Column form: stable-filter ``col`` (array<string>) against the
    allowed vocabulary; NULL (the typed-column analogue of the
    reference's "non-list") → ``[]``."""
    allowed = _vocab_array(ALL_TAGS if vocab is None else vocab)
    return F.when(
        col.isNull(), F.array().cast("array<string>")
    ).otherwise(F.filter(col, lambda t: F.array_contains(allowed, t)))


def clean_tags(
    df: DataFrame,
    cols: Optional[Iterable[str]] = None,
    vocab: Optional[Sequence[str]] = None,
    per_field_vocab: bool = False,
) -> DataFrame:
    """DataFrame form: clean every tag column in place.

    ``cols`` defaults to whichever of the four reference tag fields
    exist on ``df``. ``per_field_vocab=True`` filters each field
    against its OWN vocabulary (stricter than the reference's
    union-vocabulary default; off by default for parity)."""
    if cols is None:
        cols = [c for c in TAG_FIELDS if c in df.columns]
    out = df
    for c in cols:
        v = vocab
        if v is None and per_field_vocab and c in TAG_FIELDS:
            v = VOCABULARIES[TAG_FIELDS[c]]
        out = out.withColumn(c, clean_tags_col(F.col(c), v))
    return out
