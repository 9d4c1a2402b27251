#!/usr/bin/env python3
"""Freeze the HTML-kernel outputs that back the q22/q23/q31 DuckDB
oracles.

DuckDB cannot parse HTML, so the kernel step (DOM explode / template
signature) of those queries was previously uncheckable and the driver
recorded them rows-only. The kernel inputs are the deterministic
``synth`` corpora, so the kernel OUTPUTS are deterministic too: this
script materializes them once into ``tests/fixtures/`` and the oracles
aggregate over the frozen parquet while the Spark queries keep
computing the same tables live — the comparison then checks the
downstream aggregation exactly AND pins the kernel output (any kernel
drift shows up as a hash mismatch).

Re-run after any intentional kernel change:
    python scripts/freeze_dom_fixtures.py
"""

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXDIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures",
)


def main() -> None:
    from pyspark.sql import functions as F

    from langscrape_spark import synth
    from langscrape_spark.operators import multimodal as mm
    from langscrape_spark.operators.domtable import (
        dom_nodes_table,
        template_signatures,
    )
    from langscrape_spark.operators.hostrank import host_edges
    from langscrape_spark.plans.extract import extract_pages
    from langscrape_spark.session import get_spark

    spark = get_spark("freeze_fixtures", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(FIXDIR, exist_ok=True)

    # q22/q23 corpus: 48 synth pages -> DOM node table
    nodes = dom_nodes_table(synth.build_pages_df(spark, 48, partitions=4))
    # q31 corpus: 64 synth pages -> template signatures
    sigs = template_signatures(synth.build_pages_df(spark, 64, partitions=4))
    # q32 corpus: 256 synth pages -> host->host weighted link edges
    # (the PageRank input; the iterations themselves are oracled in SQL)
    edges = host_edges(synth.build_pages_df(spark, 256, partitions=8))

    # q18 corpus: 64 synth pages -> extraction-kernel field map output,
    # map flattened to typed array columns (DuckDB map extraction
    # semantics vary by version; arrays are stable)
    kern = extract_pages(
        synth.build_pages_df(spark, 64, partitions=4), synth.FIELD_MAP
    ).select(
        "url",
        F.col("extracted").getItem("title").alias("title_arr"),
        F.col("extracted").getItem("datetime").alias("datetime_arr"),
        F.col("extracted").getItem("article_body").alias("body_arr"),
        "is_valid_scheme",
    )
    # q24 corpora: the three multimodal kernel outputs (decode+resize /
    # frame-sample / audio features) on the 60-row synthetic media
    # table; the oracle recomputes q24's downstream (md5(hex(pixels)),
    # per-video frame counts, zero-crossing projection) in SQL
    media = mm.build_media_df(spark, 60, partitions=4)
    resized = mm.resize_images(mm.decode_images(media), 8, 8).select(
        "media_id", "pixels"
    )
    frames = mm.sample_frames(media, every_n=10).select(
        "media_id", "frame_idx"
    )
    audio = mm.audio_features(media).select("media_id", "zero_crossings")

    # q34 corpus: synthetic SWDE page dirs -> kernel xpath predictions
    # (post sentinel-filter, exactly the q34 pred side) + exploded
    # ground truth. The Spark query keeps computing pred LIVE from the
    # corpus, so the driver compare against the frozen oracle input
    # pins the SWDE reader + extraction kernel end-to-end.
    import __spark_entry__ as entry

    from langscrape_spark.functions.kernel import make_extract_fields_udf
    from langscrape_spark.sources.swde import (
        swde_ground_truth,
        swde_pages,
        truth_values_long,
    )

    q34_root = entry.ensure_q34_corpus()
    q34_pages = swde_pages(spark, q34_root)
    q34_extract = make_extract_fields_udf(
        {xp: {"strategy": "xpath_extractor", "xpath": xp} for xp in ("//h1", "//div")}
    )
    q34_pred = (
        q34_pages.select(
            "category", "site", "page_id",
            q34_extract(F.decode("html", "utf-8")).alias("ex"),
        )
        .select("category", "site", "page_id", F.explode("ex").alias("xpath", "vs"))
        .select("category", "site", "page_id", "xpath", F.explode("vs").alias("value"))
        .where(~F.col("value").startswith("("))
    )
    q34_truth = truth_values_long(
        swde_ground_truth(spark, os.path.join(q34_root, "groundtruth"))
    )

    for name, df in [
        ("q22_dom_nodes", nodes),
        ("q31_template_sigs", sigs),
        ("q32_host_edges", edges),
        ("q18_kernel_fields", kern),
        ("q24_resized", resized),
        ("q24_frames", frames),
        ("q24_audio", audio),
        ("q34_pred", q34_pred),
        ("q34_truth", q34_truth),
    ]:
        tmp = os.path.join(FIXDIR, f"_{name}_stage")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        dest = os.path.join(FIXDIR, f"{name}.parquet")
        shutil.move(os.path.join(tmp, part), dest)
        shutil.rmtree(tmp)
        print(f"wrote {dest}")
    spark.stop()


if __name__ == "__main__":
    main()
