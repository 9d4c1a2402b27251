"""End-to-end integration: dimension tables derived from raw inputs
(robots.txt bodies, the corpus link graph) drive a full crawl +
extraction — the production wiring, no hand-built tables."""

import pytest
from pyspark.sql import functions as F

from langscrape_spark import synth
from langscrape_spark.operators.hostrank import host_rank_table
from langscrape_spark.plans.extract import extract_pages
from langscrape_spark.scheduler.frontier import CrawlConfig, run_crawl
from langscrape_spark.sources.catalog import Catalog
from langscrape_spark.sources.robots import robots_table

N_PAGES = 150


def _robots_bodies(spark):
    rows = []
    for i in range(synth.N_HOSTS):
        host = f"www.site{i}.example"
        if i == 19:
            body = "User-agent: *\nDisallow: /\n"
        else:
            body = (
                "User-agent: *\nDisallow: /private/\nDisallow: /admin/\n"
                f"Crawl-delay: {2.0 if i == 0 else 0.5}\n"
            )
        rows.append((host, body.encode()))
    return spark.createDataFrame(rows, "host string, body binary")


def test_crawl_from_raw_dimension_sources(spark, tmp_path):
    pages = synth.build_pages_df(spark, N_PAGES, partitions=4).cache()
    pages.count()

    robots = robots_table(_robots_bodies(spark))
    host_rank = host_rank_table(pages, iterations=6)
    seeds = synth.seeds_df(spark, N_PAGES, n_seeds=8)

    catalog = Catalog(spark, str(tmp_path / "cat"))
    cfg = CrawlConfig(batch_size=40, max_depth=3, max_rounds=5, seen_partitions=8)
    state = run_crawl(spark, pages, seeds, robots, host_rank, catalog, cfg)

    schedule = state.schedule
    n_scheduled = schedule.count()
    assert n_scheduled > 50

    # robots from raw bodies enforced: fully-disallowed host absent
    assert schedule.where("url like '%site19.example%'").count() == 0
    # politeness budget from parsed crawl-delay enforced (hot host k=2)
    hot_per_round = (
        schedule.withColumn("host", F.lower(F.parse_url("url", F.lit("HOST"))))
        .where("host = 'www.site0.example'")
        .groupBy("round")
        .count()
    )
    assert hot_per_round.agg(F.max("count")).first()[0] <= 2

    # derived host-rank drives priority: the hot host (top-ranked by
    # the link graph) is admitted in round 0 despite its tight budget
    r0_hosts = {
        r["host"]
        for r in schedule.where("round = 0")
        .withColumn("host", F.lower(F.parse_url("url", F.lit("HOST"))))
        .select("host")
        .collect()
    }
    assert "www.site0.example" in r0_hosts

    # extraction over the schedule: every fetched page valid-scheme
    fetched = pages.join(F.broadcast(schedule.select("url")), "url", "inner")
    out = extract_pages(fetched, synth.FIELD_MAP)
    assert out.where(~F.col("is_valid_scheme")).count() == 0
    assert out.count() == fetched.count()
