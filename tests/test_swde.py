"""SWDE-style corpus reader: synthetic category/site page dirs +
tab-separated ground truth → eval table → ranked-xpath F1, end to end
(reference feilian/datasets/dataset.py:92-254,
dataset_tools.py:66-95)."""

import os

import pytest
from pyspark.sql import functions as F

from langscrape_spark.operators.evalops import best_per_group, f1_by_group
from langscrape_spark.sources.swde import (
    swde_eval_table,
    swde_ground_truth,
    swde_pages,
    truth_values_long,
)

SITES = {("auto", "msn"): 4, ("auto", "aol"): 3, ("book", "abe"): 2}


def _page_html(cat, site, i):
    return (
        f"<html><body><h1 class='t'>{cat}-{site} title {i}</h1>"
        f"<span class='price'>${i}9.99</span>"
        f"<div class='noise'>chrome</div></body></html>"
    )


@pytest.fixture(scope="module")
def swde_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("swde")
    for (cat, site), n in SITES.items():
        pdir = root / cat / f"{cat}-{site}({n})"
        pdir.mkdir(parents=True)
        for i in range(n):
            (pdir / f"{i:04d}.htm").write_text(_page_html(cat, site, i))
        # hidden file: matches the *.htm glob but must be skipped
        (pdir / ".hidden.htm").write_text("<html><body>nope</body></html>")
        gdir = root / "groundtruth" / cat
        gdir.mkdir(parents=True, exist_ok=True)
        # attr 'title': header x2, then page_id \t count \t values
        lines = ["header line 1", "header line 2"]
        for i in range(n):
            lines.append(f"{i:04d}\t1\t{cat}-{site} title {i}")
        lines.append(f"9999\t1\t<NULL>")  # dropped row
        (gdir / f"{cat}-{site}-title.txt").write_text("\n".join(lines))
        # attr 'price' with an entity to exercise normalize_text
        lines = ["h1", "h2"]
        for i in range(n):
            lines.append(f"{i:04d}\t1\t${i}9.99&nbsp;")
        (gdir / f"{cat}-{site}-price.txt").write_text("\n".join(lines))
    return str(root)


def test_swde_pages_parse_paths(spark, swde_root):
    pages = swde_pages(spark, swde_root)
    assert pages.count() == sum(SITES.values())
    row = pages.where("category = 'auto' and site = 'msn'").orderBy("page_id").first()
    assert row["pages"] == "4" and row["page_id"] == "0000"
    assert b"title 0" in bytes(row["html"])


def test_swde_ground_truth_pivot(spark, swde_root):
    truth = swde_ground_truth(spark, os.path.join(swde_root, "groundtruth"))
    assert truth.count() == sum(SITES.values())  # <NULL> row dropped
    row = truth.where(
        "category = 'auto' and site = 'msn' and page_id = '0001'"
    ).first()
    gt = row["ground_truth"]
    assert gt["title"] == ["auto-msn title 1"]
    # normalize_text collapsed the trailing &nbsp;
    assert gt["price"] == ["$19.99"]


def test_swde_eval_table_shape(spark, swde_root):
    pages = swde_pages(spark, swde_root)
    truth = swde_ground_truth(spark, os.path.join(swde_root, "groundtruth"))
    ev = swde_eval_table(pages, truth)
    assert ev.count() == sum(SITES.values())
    assert set(ev.columns) == {
        "id", "category", "site", "page_id", "html", "query", "ground_truth",
    }
    assert ev.where(F.col("ground_truth").isNull()).count() == 0


def test_swde_end_to_end_xpath_ranking(spark, swde_root):
    """The full research flow: read corpus → extract candidate xpaths
    per field → F1 against truth → best xpath per (site, field). The
    correct selector must win for every site."""
    from langscrape_spark.functions.kernel import make_extract_fields_udf

    pages = swde_pages(spark, swde_root)
    truth = swde_ground_truth(spark, os.path.join(swde_root, "groundtruth"))
    candidates = {
        "title": ["//h1", "//div"],
        "price": ["//span[@class='price']", "//h1"],
    }
    field_map = {
        f"{field}|{xp}": {"strategy": "xpath_extractor", "xpath": xp}
        for field, xps in candidates.items()
        for xp in xps
    }
    extract = make_extract_fields_udf(field_map)
    extracted = pages.select(
        "category", "site", "page_id",
        extract(F.decode("html", "utf-8")).alias("extracted"),
    )
    pred = (
        extracted.select(
            "category", "site", "page_id",
            F.explode("extracted").alias("key", "values"),
        )
        .select(
            "category", "site", "page_id",
            F.split_part("key", F.lit("|"), F.lit(1)).alias("field_name"),
            F.split_part("key", F.lit("|"), F.lit(2)).alias("xpath"),
            F.explode("values").alias("value"),
        )
        .where(~F.col("value").startswith("(") & ~F.col("value").startswith("Error"))
    )
    # truth replicated per candidate xpath of the SAME field, so each
    # (field, xpath) hypothesis is scored against that field's truth
    tr = truth_values_long(truth).join(
        F.broadcast(pred.select("field_name", "xpath").distinct()), "field_name"
    )
    scored = f1_by_group(
        pred,
        tr.select("category", "site", "field_name", "xpath", "value"),
        ["category", "site", "field_name", "xpath"],
    )
    best = best_per_group(scored, ["category", "site", "field_name"])
    got = {
        (r["category"], r["site"], r["field_name"]): (r["xpath"], r["f1"])
        for r in best.collect()
    }
    for (cat, site) in SITES:
        assert got[(cat, site, "title")][0] == "//h1"
        assert got[(cat, site, "title")][1] == 1.0
        assert got[(cat, site, "price")][0] == "//span[@class='price']"
        assert got[(cat, site, "price")][1] == 1.0


def test_select_best_xpath_cascade(spark):
    """The reference's selection cascade (feilian/agents/agent.py:
    150-177): drop invalid xpaths; among valid prefer those that
    extracted on every snippet, argmin total extracted; fall back to
    first-valid then first-proposed by proposal order."""
    from langscrape_spark.operators.evalops import select_best_xpath

    rows = [
        # field A: xp2 invalid; xp1 and xp3 valid+nonempty — fewest
        # total extractions (xp3) wins despite later proposal order
        ("A", "xp1", 0, False, True, 9),
        ("A", "xp2", 1, True, True, 1),
        ("A", "xp3", 2, False, True, 4),
        # field B: no xpath nonempty → first VALID by proposal order
        ("B", "xp1", 0, True, False, 0),
        ("B", "xp2", 1, False, False, 3),
        ("B", "xp3", 2, False, False, 1),
        # field C: everything invalid → first proposed
        ("C", "xp1", 0, True, False, 0),
        ("C", "xp2", 1, True, True, 5),
    ]
    df = spark.createDataFrame(
        rows,
        "field_name string, xpath string, try_order int, "
        "invalid boolean, all_nonempty boolean, total_extracted long",
    )
    got = {
        r["field_name"]: r["xpath"]
        for r in select_best_xpath(df).collect()
    }
    assert got == {"A": "xp3", "B": "xp2", "C": "xp1"}
