#!/usr/bin/env python3
"""Per-phase crawl-round decomposition at one parallelism level.

Prints one JSON object with the per-round phase wall times recorded by
``run_crawl`` (admit window / extraction / membership / each checkpoint
write / compaction). Run it at two core counts (fresh process each) to
attribute scaling loss to a specific phase instead of guessing:

    python scripts/phase_probe.py <cpus> <n_pages> [membership]

``membership`` (optional, default "shuffle"): "shuffle" or
"bucket_probe" — A/B the two exact-membership strategies' per-round
membership phase at the same corpus.

Same corpus/config shape as ``bench.py --crawl-only`` via
``scripts/scaling_bench.py`` (batch = pages/2, seeds = pages/8,
2 rounds, delay_div 500, python-worker warmup before the clock).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 262_144
    membership = sys.argv[3] if len(sys.argv) > 3 else "shuffle"

    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    os.environ["SPARK_GRAFT_SHUFFLE"] = str(max(32, cpus))

    from pyspark.sql import functions as F

    from langscrape_spark import synth
    from langscrape_spark.plans.extract import extract_pages
    from langscrape_spark.scheduler.frontier import CrawlConfig, run_crawl
    from langscrape_spark.session import get_spark
    from langscrape_spark.sources.catalog import Catalog

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="phase_probe_")
    try:
        pages_path = os.path.join(tmp, "pages")
        n_part = spark.sparkContext.defaultParallelism * 2
        synth.build_pages_df(spark, n_pages, partitions=n_part).write.parquet(
            pages_path
        )
        pages = spark.read.parquet(pages_path)
        seeds = synth.seeds_df(spark, n_pages, n_seeds=n_pages // 8)
        robots = synth.robots_df(spark).withColumn(
            "crawl_delay", F.col("crawl_delay") / F.lit(500.0)
        )
        host_rank = synth.host_rank_df(spark)
        catalog = Catalog(spark, os.path.join(tmp, "catalog"))
        cfg = CrawlConfig(
            batch_size=n_pages // 2,
            max_rounds=2,
            extract_field_map=synth.FIELD_MAP,
            membership=membership,
        )

        # python-worker warmup (one task per core slot)
        warm = synth.build_pages_df(spark, cpus * 32, partitions=cpus)
        warm_out = extract_pages(warm, synth.FIELD_MAP)
        warm_out.write.format("noop").mode("overwrite").save()

        t0 = time.perf_counter()
        state = run_crawl(spark, pages, seeds, robots, host_rank, catalog, cfg)
        elapsed = time.perf_counter() - t0
        n_scheduled = state.schedule.count()

        print(
            json.dumps(
                {
                    "cpus": cpus,
                    "n_pages": n_pages,
                    "membership": membership,
                    "crawl_sec": round(elapsed, 3),
                    "urls_scheduled": n_scheduled,
                    "urls_per_sec": round(n_scheduled / elapsed, 2),
                    "rounds": [
                        {
                            "round": m["round"],
                            "admitted": m["admitted"],
                            "new_urls": m["new_urls"],
                            "phases": m.get("phases", {}),
                        }
                        for m in state.metrics
                    ],
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
