"""Scheduler equivalence at the SURVEY §5.3 scale (10³ urls): the
Spark frontier must still match the sequential simulator exactly when
rounds admit hundreds of urls and the frontier holds thousands."""

from langscrape_spark import synth
from langscrape_spark.scheduler.frontier import CrawlConfig, run_crawl
from langscrape_spark.scheduler.simulator import simulate_crawl
from langscrape_spark.sources.catalog import Catalog

N_PAGES = 1500
BATCH = 300
MAX_DEPTH = 4
MAX_ROUNDS = 10
N_SEEDS = 40
DELAY_DIV = 20.0  # higher budgets → fat rounds (k=40/host, hot host 10)


def test_spark_matches_simulator_at_scale(spark, tmp_path):
    pages_df = synth.build_pages_df(spark, N_PAGES, partitions=8).cache()
    pages_df.count()
    seeds_df = synth.seeds_df(spark, N_PAGES, n_seeds=N_SEEDS)
    from pyspark.sql import functions as F

    robots_df = synth.robots_df(spark).withColumn(
        "crawl_delay", F.col("crawl_delay") / DELAY_DIV
    )
    host_rank_df = synth.host_rank_df(spark)

    # simulator side (same policy inputs)
    pages = {synth.url_of(i): synth.page_html(i, N_PAGES) for i in range(N_PAGES)}
    stride = max(1, N_PAGES // N_SEEDS)
    seeds = [synth.url_of(i * stride) for i in range(N_SEEDS)]
    seeds += ["not a url", "ftp://site.example/x",
              f"https://{synth.host_of(0)}/docs/report.pdf"]
    robots = {
        f"www.site{i}.example": (
            ["/private/", "/admin/"],
            (2.0 if i == 0 else 0.5) / DELAY_DIV,
            i != 19,
        )
        for i in range(synth.N_HOSTS)
    }
    host_rank = {
        f"www.site{i}.example": round(1.0 - i * 0.04, 4)
        for i in range(synth.N_HOSTS)
    }
    sim_schedule, sim_seen = simulate_crawl(
        seeds, pages, robots, host_rank,
        batch_size=BATCH, max_depth=MAX_DEPTH, max_rounds=MAX_ROUNDS,
    )
    assert len(sim_schedule) > 1000  # the scale actually materialized

    catalog = Catalog(spark, str(tmp_path / "cat"))
    cfg = CrawlConfig(
        batch_size=BATCH, max_depth=MAX_DEPTH, max_rounds=MAX_ROUNDS,
        seen_partitions=16, compact_every=4,
    )
    state = run_crawl(
        spark, pages_df, seeds_df, robots_df, host_rank_df, catalog, cfg
    )
    got = [
        (r["round"], r["seq"], r["url"])
        for r in state.schedule.orderBy("round", "seq").collect()
    ]
    assert got == sim_schedule
    assert {r["url"] for r in state.seen.collect()} == sim_seen
