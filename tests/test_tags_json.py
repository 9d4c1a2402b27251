"""clean_tags vocabulary filtering and the extract_json_block fallback
chain — the two post-extraction record stages added in round 2
(reference langscrape/nodes/post_processor.py:11-36 and
langscrape/nodes/data_collator.py:10-43)."""

import pytest
from pyspark.sql import functions as F

from langscrape_spark.functions.tagvocab import (
    ALL_TAGS,
    COUNTRIES_AND_ORGANIZATIONS,
    FIGURES,
    LOCATIONS,
    THEME_TAGS,
    VOCABULARIES,
)
from langscrape_spark.operators.tags import TAG_FIELDS, clean_tags
from langscrape_spark.operators.text import (
    extract_json_block_col,
    extract_json_block_parsed,
)


# ---------------------------------------------------------------------------
# vocabularies
# ---------------------------------------------------------------------------

def test_vocab_shape_matches_reference():
    """Counts per reference langscrape/tags.py (225/84/84/83) and the
    union default of post_processor.py:11."""
    assert len(THEME_TAGS) == 225
    assert len(COUNTRIES_AND_ORGANIZATIONS) == 84
    assert len(LOCATIONS) == 84
    assert len(FIGURES) == 83
    assert ALL_TAGS == (
        LOCATIONS + FIGURES + COUNTRIES_AND_ORGANIZATIONS + THEME_TAGS
    )
    assert set(VOCABULARIES) == {
        "theme", "countries_and_organizations", "location", "figures",
    }


# ---------------------------------------------------------------------------
# clean_tags
# ---------------------------------------------------------------------------

def test_clean_tags_stable_filter_with_dups(spark):
    """Reference semantics: [t for t in tags if t in TAGS] — order and
    duplicate occurrences preserved, disallowed values dropped."""
    df = spark.createDataFrame(
        [(1, ["Abuse", "NotATag", "Jerusalem", "Abuse"])],
        "id long, theme_tags array<string>",
    )
    out = clean_tags(df).collect()[0]["theme_tags"]
    assert out == ["Abuse", "Jerusalem", "Abuse"]


def test_clean_tags_null_becomes_empty(spark):
    """The reference's non-list → [] rule: in a typed column the
    non-list analogue is NULL, which must become []."""
    df = spark.createDataFrame(
        [(1, None), (2, [])],
        "id long, location_tags array<string>",
    )
    rows = {r["id"]: r["location_tags"] for r in clean_tags(df).collect()}
    assert rows[1] == [] and rows[2] == []


def test_clean_tags_union_vocab_default(spark):
    """Default filters every field against the UNION (reference default
    argument), so a location value survives in theme_tags."""
    df = spark.createDataFrame(
        [(1, ["Jerusalem"])], "id long, theme_tags array<string>"
    )
    assert clean_tags(df).collect()[0]["theme_tags"] == ["Jerusalem"]
    strict = clean_tags(df, per_field_vocab=True).collect()[0]["theme_tags"]
    assert strict == []  # Jerusalem is not a theme tag


def test_collate_results_cleans_summary_tags(spark):
    """collate_results wires clean_tags over whichever tag fields the
    extraction carries and emits them as the summary block."""
    from langscrape_spark import synth
    from langscrape_spark.plans.extract import collate_results, extract_pages

    pages = synth.build_pages_df(spark, 4, partitions=1)
    fm = {"title": {"strategy": "xpath_extractor", "xpath": "//h1"}}
    extracted = extract_pages(pages, fm).withColumn(
        "theme_tags", F.array(F.lit("Abuse"), F.lit("zzz-not-allowed"))
    )
    out = collate_results(extracted).collect()
    assert all(r["summary"]["theme_tags"] == ["Abuse"] for r in out)
    # without tag columns no summary block is emitted (schema parity
    # with the round-1 deterministic-kernel contract)
    plain = collate_results(extract_pages(pages, fm))
    assert "summary" not in plain.columns


# ---------------------------------------------------------------------------
# extract_json_block — reference four-stage order
# ---------------------------------------------------------------------------

CASES = [
    # (input, selected JSON text) — expectations hand-derived from the
    # reference implementation (data_collator.py:10-43).
    ('before ```json {"a": 1} ``` after', '{"a": 1}'),          # stage 1
    ('```JSON\n{"x": [1, 2]}\n```', '{"x": [1, 2]}'),           # stage 1, case-insensitive
    ('```json not json ``` noise {"b": 2} tail', '{"b": 2}'),   # 1 fails → 2
    ('xx {"c": {"d": 3}} yy', '{"c": {"d": 3}}'),               # stage 2, nested
    ('{"a":1} and {"b":2}', "{}"),                              # greedy bare spans both → invalid → 3 invalid → {}
    ('[1, 2, 3]', "[1, 2, 3]"),                                 # stage 3: whole text, non-object JSON
    ("42", "42"),                                               # stage 3: scalar
    ("plain prose, no json", "{}"),                             # stage 4
    ("", "{}"),                                                 # empty guard
    (None, "{}"),                                               # null guard
]


def test_extract_json_block_fallback_order(spark):
    df = spark.createDataFrame(
        [(i, c[0]) for i, c in enumerate(CASES)], "id long, raw string"
    )
    got = {
        r["id"]: r["js"]
        for r in df.select(
            "id", extract_json_block_col(F.col("raw")).alias("js")
        ).collect()
    }
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want, (raw, got[i], want)


def test_extract_json_block_parsed(spark):
    df = spark.createDataFrame(
        [(1, 'noise {"k": 7, "s": "v"} more')], "id long, raw string"
    )
    row = df.select(
        extract_json_block_parsed(F.col("raw"), "k long, s string").alias("p")
    ).collect()[0]["p"]
    assert row["k"] == 7 and row["s"] == "v"
