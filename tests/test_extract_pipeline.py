"""End-to-end tests of the Spark extraction pipeline on the synthetic
corpus: UDF output must byte-match the pure-Python kernel run on the
same rows (the per-row invariant from BASELINE.json input_hint)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from langscrape_spark import synth
from langscrape_spark.functions.kernel import html_to_text_udf
from langscrape_spark.html.clean import clean_html_for_extraction
from langscrape_spark.html.extract import extract_by_xpath_map
from langscrape_spark.plans.extract import collate_results, extract_pages

N_PAGES = 64


@pytest.fixture(scope="module")
def pages(spark):
    return synth.build_pages_df(spark, N_PAGES, partitions=4).cache()


def test_pages_schema_and_count(pages):
    assert pages.count() == N_PAGES
    assert [f.name for f in pages.schema.fields] == [
        "url", "warc_ts", "html", "text", "lang",
    ]


def test_extraction_matches_kernel_bytewise(spark, pages):
    """The Spark plan and a plain-Python run over the same rows must
    agree byte-for-byte on cleaned/extracted values."""
    result = {
        r["url"]: r
        for r in extract_pages(pages, synth.FIELD_MAP, keep_cleaned=True).collect()
    }
    assert len(result) == N_PAGES
    for pid in range(0, N_PAGES, 7):  # sample spread across the corpus
        rec = synth.page_record(pid, N_PAGES)
        row = result[rec["url"]]
        html = rec["html"].decode("utf-8")
        cleaned = clean_html_for_extraction(html)
        assert row["cleaned"] == cleaned
        expected = extract_by_xpath_map(cleaned, synth.FIELD_MAP)
        got = {k: list(v) for k, v in row["extracted"].items()}
        assert got == expected
        # Golden content sanity: the synth corpus has known fields.
        assert expected["title"][0].startswith(f"Article {pid:08d}:")
        assert expected["datetime"][0].count("-") == 2
        assert len(expected["article_body"]) >= 3


def test_text_column_byte_identity(spark, pages):
    """html_to_text_udf(html) must reproduce the stored text column."""
    mismatches = (
        pages.withColumn("text2", html_to_text_udf(F.col("html")))
        .where(F.col("text2") != F.col("text"))
        .count()
    )
    assert mismatches == 0


def test_flags_and_scheme(spark, pages):
    df = extract_pages(pages, synth.FIELD_MAP)
    rows = df.collect()
    assert all(r["is_valid_url"] for r in rows)
    assert all(r["is_valid_scheme"] for r in rows)
    assert all(r["traditional_flag"] == [] for r in rows)
    assert not any(r["is_pdf"] for r in rows)
    # bodies are long enough in the synth corpus
    assert all(not r["too_short_body"] for r in rows)


def test_collate_shape(spark, pages):
    out = collate_results(extract_pages(pages.limit(5), synth.FIELD_MAP))
    row = out.first()
    assert set(out.columns) == {"url", "meta_data", "extraction"}
    assert row["meta_data"]["is_valid_scheme"] is True
    assert "title" in row["extraction"]


def test_no_python_shuffle_in_plan(spark, pages):
    """All UDFs are map-only: the physical plan must contain no
    exchange below the Python stages (scan → project only)."""
    plan = extract_pages(pages, synth.FIELD_MAP)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
