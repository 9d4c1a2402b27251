#!/usr/bin/env python3
"""Dedup/ANN scale soak: the training-data operators at 100k+ docs.

The driver-contract oracles verify correctness at sf0.01 (500 docs);
this script is the scale evidence — a deterministic synthetic corpus
with a planted near-dup structure, two orders of magnitude past the
testdata, through the dedup and embedding operators at local[32]:

- exact_dedup over 10% planted byte-dups;
- minhash_lsh_pairs (default caps) — planted ~1% near-dup pairs;
- simhash_near_dups at radius 3 (pigeonhole 4 blocks);
- ngram_jaccard_pairs with the sampled hot-shingle guard active
  (every doc shares one boilerplate sentence, so the guard must fire
  and the posting-list join must stay linear);
- embedding_neardup_pairs_lsh with derived planes + bucket refinement
  over clustered vectors.

Prints ONE JSON line: {"n_docs": N, "timings": {...}, "counts": {...}}.
Corpus generation/materialization happens OUTSIDE the timed windows.

Usage: python scripts/dedup_bench.py [n_docs]   (default 100000)
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

BOILER = "subscribe to our newsletter for updates and breaking news today"

WORDS = [f"w{i:03d}" for i in range(700)]


def _doc_text(i: int) -> str:
    # deterministic "content" words; every 100th doc is a near-dup of
    # its predecessor (one word changed), every 10th a byte-dup of i-5
    import hashlib

    if i % 10 == 0 and i >= 5:
        return _doc_text(i - 5)
    h = hashlib.md5(f"doc{i}".encode()).digest()
    body = " ".join(WORDS[(h[j % 16] * 7 + j * 13 + i * (0 if i % 100 == 1 else 1)) % 700]
                    for j in range(60))
    if i % 100 == 1:
        base = _doc_text(i - 1)
        parts = base.split()
        parts[30] = "changed"
        return " ".join(parts)
    return f"{BOILER} {body}"


def _embedding(i: int, n_clusters: int, dim: int = 32):
    import numpy as np

    # ~100 members per cluster regardless of corpus size, so planted
    # pair counts grow linearly with n, not quadratically; seeded PCG64
    # per cluster/vector keeps the corpus deterministic
    cluster = i % n_clusters
    center = np.random.default_rng(cluster).uniform(-2.0, 2.0, dim)
    noise = np.random.default_rng(10**9 + i).normal(0.0, 0.05, dim)
    return [float(x) for x in center + noise]


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000

    from pyspark.sql import functions as F

    from langscrape_spark.operators.ann import embedding_neardup_pairs_lsh
    from langscrape_spark.operators.dedup import (
        exact_dedup,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        simhash_near_dups,
    )
    from langscrape_spark.session import get_spark

    spark = get_spark("dedup_bench")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="dedup_bench_")
    try:
        import pandas as pd

        n_part = spark.sparkContext.defaultParallelism * 2

        def gen_docs(batches):
            for pdf in batches:
                ids = pdf["id"]
                yield pd.DataFrame(
                    {"doc_id": ids, "text": [_doc_text(int(i)) for i in ids]}
                )

        n_clusters = max(50, n_docs // 100)

        def gen_embs(batches):
            for pdf in batches:
                ids = pdf["id"]
                yield pd.DataFrame(
                    {
                        "vec_id": ids,
                        "embedding": [
                            _embedding(int(i), n_clusters) for i in ids
                        ],
                    }
                )

        base = spark.range(n_docs, numPartitions=n_part)
        docs_path, embs_path = os.path.join(tmp, "docs"), os.path.join(tmp, "embs")
        base.mapInPandas(gen_docs, "doc_id long, text string").write.parquet(docs_path)
        base.mapInPandas(gen_embs, "vec_id long, embedding array<double>").write.parquet(embs_path)
        docs = spark.read.parquet(docs_path)
        embs = spark.read.parquet(embs_path)
        # warm python workers
        docs.limit(n_part * 8).count()

        timings, counts = {}, {}

        def run(name, df):
            t0 = time.perf_counter()
            counts[name] = df.count()
            timings[name] = round(time.perf_counter() - t0, 2)

        run("exact_dedup", exact_dedup(docs, "text", "doc_id"))
        run("minhash_lsh", minhash_lsh_pairs(docs, "text", "doc_id"))
        run("simhash_r3", simhash_near_dups(docs, "text", "doc_id", max_hamming=3))
        run(
            "ngram_jaccard_capped",
            ngram_jaccard_pairs(
                docs, "text", "doc_id", k=3, threshold=0.8,
                max_doc_freq=n_docs // 10,
            ),
        )
        run("embedding_lsh", embedding_neardup_pairs_lsh(embs, 0.995))

        # duplicate-cluster resolution over the minhash edge set:
        # components + survivor election (pairs recomputed inside the
        # timed window on purpose — resolve_duplicates is the full
        # "pairs -> dedup'd corpus" cost a pipeline pays)
        from langscrape_spark.operators.components import resolve_duplicates

        t0 = time.perf_counter()
        resolved = resolve_duplicates(
            docs, minhash_lsh_pairs(docs, "text", "doc_id"), id_col="doc_id"
        )
        counts["dup_cluster_survivors"] = resolved.where("is_canonical").count()
        timings["dup_cluster_resolve"] = round(time.perf_counter() - t0, 2)

        print(
            json.dumps(
                {
                    "n_docs": n_docs,
                    "cpus": spark.sparkContext.defaultParallelism,
                    "timings": timings,
                    "counts": counts,
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
