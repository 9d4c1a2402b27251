#!/usr/bin/env python3
"""Bloom vs cuckoo prefilter A/B at bench scale.

Runs the SAME synth crawl twice — once with each prefilter forced
active from round 0 — and reports per-prefilter wall time plus an
admission-identity check (schedule md5 over (round, seq, url) must be
byte-equal: the prefilters may only differ in which candidates pay
the exact membership join, never in what gets admitted).

Usage: python scripts/cuckoo_ab.py [n_pages] [rounds]
Prints one JSON line.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import sys
import tempfile
import time

# runnable from any cwd, like the sibling soak scripts
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def one_run(spark, n_pages, max_rounds, batch_size, prefilter):
    from pyspark.sql import functions as F

    from langscrape_spark import synth
    from langscrape_spark.scheduler.frontier import CrawlConfig, run_crawl
    from langscrape_spark.sources.catalog import Catalog

    tmp = tempfile.mkdtemp(prefix=f"cuckoo_ab_{prefilter}_")
    try:
        n_part = spark.sparkContext.defaultParallelism * 2
        pages_path = os.path.join(tmp, "pages")
        synth.build_pages_df(spark, n_pages, partitions=n_part).write.parquet(
            pages_path
        )
        pages = spark.read.parquet(pages_path)
        seeds = synth.seeds_df(spark, n_pages, n_seeds=20)
        robots = synth.robots_df(spark).withColumn(
            "crawl_delay", F.col("crawl_delay") / F.lit(25.0)
        )
        host_rank = synth.host_rank_df(spark)
        catalog = Catalog(spark, os.path.join(tmp, "catalog"))
        cfg = CrawlConfig(
            batch_size=batch_size,
            max_rounds=max_rounds,
            use_bloom=True,
            bloom_min_seen=0,     # force the prefilter from round 0
            bloom_items=200_000,
            bloom_bits=1 << 20,
            prefilter=prefilter,
        )
        t0 = time.perf_counter()
        state = run_crawl(spark, pages, seeds, robots, host_rank, catalog, cfg)
        wall = time.perf_counter() - t0
        rows = sorted(
            (r["round"], r["seq"], r["url"])
            for r in state.schedule.collect()
        )
        md5 = hashlib.md5(json.dumps(rows).encode()).hexdigest()
        return {
            "prefilter": prefilter,
            "wall_sec": round(wall, 2),
            "rounds": state.rounds_run,
            "scheduled": len(rows),
            "schedule_md5": md5,
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main(argv):
    n_pages = int(argv[1]) if len(argv) > 1 else 32_768
    rounds = int(argv[2]) if len(argv) > 2 else 3
    from langscrape_spark.session import get_spark

    spark = get_spark()
    out = {"n_pages": n_pages, "legs": []}
    # Interleave isn't needed: both legs run in the same session
    # back-to-back and the comparison is admission identity + a rough
    # wall ratio, not a microbenchmark.
    for pf in ("bloom", "cuckoo", "bloom", "cuckoo"):
        out["legs"].append(one_run(spark, n_pages, rounds, 2048, pf))
    b = [r["wall_sec"] for r in out["legs"] if r["prefilter"] == "bloom"]
    c = [r["wall_sec"] for r in out["legs"] if r["prefilter"] == "cuckoo"]
    out["bloom_best"] = min(b)
    out["cuckoo_best"] = min(c)
    out["admission_identical"] = (
        len({r["schedule_md5"] for r in out["legs"]}) == 1
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv)
