#!/usr/bin/env python3
"""Two-parallelism scaling evidence (BASELINE.md bench protocol).

The north rule's scaling criterion is throughput efficiency >= 0.8
between N and 4N executors. This sandbox has no multi-node cluster, so
(per the driver instruction) the same job runs on the same input at
``local[8]`` and ``local[32]`` — each in a *fresh JVM* via subprocess
so the two measurements share nothing — and efficiency is

    eff = (rate_4N / rate_N) / 4

reported for both the end-to-end crawl (schedule + extract, includes
the driver round loop and checkpoint I/O, which are constant-cost and
therefore *penalize* the 4N side at this toy scale) and the
steady-state extraction kernel (the term that dominates at 10^10
urls).

The workload is sized compute-dominated the way a production round is:
a large seed set and high politeness budgets so each round processes
thousands of pages, not tens.

Writes results to stdout (JSON) — paste into BASELINE.md.

Usage: python scripts/scaling_bench.py [n_pages]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_at(cpus: int, n_pages: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SHUFFLE=str(max(32, cpus)),
        SPARK_GRAFT_BENCH_PAGES=str(n_pages),
        SPARK_GRAFT_BENCH_ROUNDS="2",
        SPARK_GRAFT_BENCH_BATCH=str(n_pages // 2),
        SPARK_GRAFT_BENCH_SEEDS=str(n_pages // 8),
        SPARK_GRAFT_BENCH_DELAY_DIV="500",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--crawl-only"],
        env=env,
        capture_output=True,
        text=True,
        cwd=REPO,
        check=True,
    )
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 32000
    levels = (
        (int(sys.argv[2]), int(sys.argv[3])) if len(sys.argv) > 3 else (8, 32)
    )
    results = {c: run_at(c, n_pages) for c in levels}
    n, n4 = levels
    crawl_eff = (results[n4]["urls_per_sec"] / results[n]["urls_per_sec"]) / (n4 / n)
    extract_eff = (
        results[n4]["extract_urls_per_sec"] / results[n]["extract_urls_per_sec"]
    ) / (n4 / n)
    print(
        json.dumps(
            {
                "n_pages": n_pages,
                "levels": {
                    str(c): {
                        "urls_per_sec": results[c]["urls_per_sec"],
                        "extract_urls_per_sec": results[c]["extract_urls_per_sec"],
                        "urls_scheduled": results[c]["urls_scheduled"],
                        "crawl_sec": results[c]["queries"]["q00_crawl_extract"],
                    }
                    for c in levels
                },
                "scaling_efficiency_crawl": round(crawl_eff, 3),
                "scaling_efficiency_extract": round(extract_eff, 3),
            },
            indent=2,
        )
    )


if __name__ == "__main__":
    main()
