#!/usr/bin/env python3
"""Incremental dedup soak: per-round cost must stay FLAT as state grows.

The batch LSH operators re-signature the whole corpus per call —
O(corpus) per crawl round. ``operators/incremental.py`` is the
round-shaped alternative: each round signatures only its batch and
probes the accumulated bucket-partitioned state with row-group-pruned
direct reads. This soak ingests R equal batches (same deterministic
planted-near-dup corpus as dedup_bench) and times every round; if the
probe were secretly O(state), round time would grow linearly with the
round index. The summary compares the mean of the last 3 rounds to
the mean of rounds 2-4 (round 1 is excluded everywhere — cold JIT +
python-worker spawn; see memory: first-leg numbers are junk).

Prints one JSON line per round plus a summary line:
  {"summary": ..., "flat_ratio": last3/first3, "rounds": R, ...}

Usage: python scripts/incremental_soak.py [rounds] [docs_per_round]
       (defaults 10 x 20000)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from dedup_bench import _doc_text  # noqa: E402  (same planted corpus)


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    per_round = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000

    import pandas as pd

    from langscrape_spark.operators.incremental import (
        bucket_state_compact,
        bucket_state_rows,
        exact_ingest_round,
        minhash_ingest_round,
    )
    from langscrape_spark.session import get_spark

    spark = get_spark("incremental_soak")
    spark.sparkContext.setLogLevel("ERROR")
    # gen_docs captures _doc_text, whose __module__ is 'dedup_bench' —
    # cloudpickle serializes it BY REFERENCE, and python workers (cwd =
    # wherever the daemon started, scripts/ never on their sys.path)
    # would raise ModuleNotFoundError on the first batch without
    # shipping the module alongside the tasks
    spark.sparkContext.addPyFile(
        os.path.join(REPO, "scripts", "dedup_bench.py")
    )
    tmp = tempfile.mkdtemp(prefix="inc_soak_")
    state = os.path.join(tmp, "mh_state")
    n_part = spark.sparkContext.defaultParallelism * 2

    def gen_docs(batches):
        for pdf in batches:
            ids = pdf["id"]
            yield pd.DataFrame(
                {"doc_id": ids, "text": [_doc_text(int(i)) for i in ids]}
            )

    try:
        # materialize every batch OUTSIDE the timed windows
        batch_paths = []
        for r in range(rounds):
            p = os.path.join(tmp, f"batch{r}")
            (
                spark.range(
                    r * per_round, (r + 1) * per_round, numPartitions=n_part
                )
                .mapInPandas(gen_docs, "doc_id long, text string")
                .write.parquet(p)
            )
            batch_paths.append(p)
        # warm python workers (one task per core slot) so round 1 is
        # not measuring worker spawn
        spark.range(
            spark.sparkContext.defaultParallelism * 8,
            numPartitions=spark.sparkContext.defaultParallelism,
        ).mapInPandas(
            lambda it: (pdf for pdf in it), "id long"
        ).write.format("noop").mode("overwrite").save()

        ex_state = os.path.join(tmp, "ex_state")
        times, pair_counts, ex_times = [], [], []
        compact_every = max(rounds // 3, 2)
        for r in range(rounds):
            batch = spark.read.parquet(batch_paths[r])
            t0 = time.perf_counter()
            pairs = minhash_ingest_round(
                batch, state, "text", "doc_id", n_parts=32
            )
            n_pairs = pairs.count()  # checkpointed — count is cheap
            dt = time.perf_counter() - t0
            times.append(dt)
            pair_counts.append(n_pairs)
            # the exact-dup screen a crawl runs on the same batch —
            # its distinct-content state must ALSO stay flat-cost
            e0 = time.perf_counter()
            tagged = exact_ingest_round(batch, ex_state, n_parts=32)
            n_dups = tagged.where("is_dup").count()
            ex_dt = time.perf_counter() - e0
            ex_times.append(ex_dt)
            line = {
                "round": r,
                "sec": round(dt, 2),
                "pairs": n_pairs,
                "exact_sec": round(ex_dt, 2),
                "exact_dups": n_dups,
                "state_docs": (r + 1) * per_round,
            }
            # periodic between-round maintenance, exactly where a crawl
            # would run it: timed separately — compaction cost must not
            # be mistaken for probe cost, and vice versa
            if (r + 1) % compact_every == 0 and r + 1 < rounds:
                c0 = time.perf_counter()
                stats = bucket_state_compact(spark, state, n_parts=32)
                n_compacted = stats.count()
                line["compact_sec"] = round(time.perf_counter() - c0, 2)
                line["compacted_parts"] = n_compacted
            print(json.dumps(line), flush=True)
        state_rows = bucket_state_rows(spark, state).count()
        early = times[1:4]
        late = times[-3:]
        flat_ratio = round(
            (sum(late) / len(late)) / (sum(early) / len(early)), 3
        )
        print(
            json.dumps(
                {
                    "summary": "incremental minhash ingest soak",
                    "rounds": rounds,
                    "docs_per_round": per_round,
                    "state_rows": state_rows,
                    "total_pairs": sum(pair_counts),
                    "round_secs": [round(t, 2) for t in times],
                    "flat_ratio": flat_ratio,
                    "exact_round_secs": [round(t, 2) for t in ex_times],
                    "exact_flat_ratio": round(
                        (sum(ex_times[-3:]) / 3)
                        / (sum(ex_times[1:4]) / 3),
                        3,
                    ),
                    "note": "flat_ratio = mean(last 3)/mean(rounds 2-4);"
                    " ~1.0 = per-round cost independent of state size",
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
