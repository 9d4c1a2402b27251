#!/usr/bin/env python3
"""Freeze the ANN bucket/centroid assignments that back the
q17/q21/q35 DuckDB oracles.

DuckDB cannot run the numpy-gemm bucketers (``srp_bucket_fast``,
``ivf_assign``) or the Lloyd iterations, so those queries were
previously rows-only. The assignments are deterministic functions of
the sf0.01 embeddings table (md5-derived hyperplanes, md5-seeded
Lloyd — no RNG state), so this script materializes them once into
``tests/fixtures/`` and the oracles re-derive everything DOWNSTREAM of
the assignment in SQL — the hamming-radius probe, the nprobe centroid
ranking, the within-bucket self-join, the exact cosine re-rank and the
top-k total order. The Spark queries keep computing the assignments
live, so the driver compare both checks the downstream logic exactly
AND pins the bucketers (any assignment drift = hash mismatch).

Unlike the synth-corpus fixtures (freeze_dom_fixtures.py) these are
derived from ``/root/testdata/sf0.01`` — the driver's correctness SF.
The bench runs the same queries at sf0.1 but never consults the
oracles there.

Re-run after any intentional bucketer/centroid change:
    python scripts/freeze_ann_fixtures.py
"""

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXDIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures",
)
SF_DIR = "/root/testdata/sf0.01"


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from langscrape_spark.operators.ann import (
        _deterministic_planes,
        ivf_assign,
        ivf_centroids,
        lsh_bucket_assignments,
        srp_bucket_fast,
    )
    from langscrape_spark.session import get_spark

    spark = get_spark("freeze_ann_fixtures", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(FIXDIR, exist_ok=True)

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    dim = len(entry.QUERY_VEC)

    # q17: SRP bucket per vector (n_planes=8, matching q17_lsh_ann).
    planes = _deterministic_planes(dim, 8)
    q17 = (
        emb.where(F.col("embedding").isNotNull() & (F.size("embedding") > 0))
        .select(
            "vec_id", srp_bucket_fast(F.col("embedding"), planes).alias("bucket")
        )
    )
    q_bits = [
        sum(float(x) * p for x, p in zip(entry.QUERY_VEC, plane)) >= 0
        for plane in planes
    ]
    q_bucket = sum(1 << i for i, bit in enumerate(q_bits) if bit)
    print(f"q17 query bucket (embed as literal in oracle_sql): {q_bucket}")

    # q21: the exact (id, bucket, sub) grouping the pair gemm runs on
    # (derived n_planes, refinement and guard included — shared code
    # path with embedding_neardup_pairs_lsh).
    q21 = lsh_bucket_assignments(emb).select("id", "bucket", "sub")

    # q35: IVF centroids (k=16, 2 Lloyd iterations, matching
    # q35_ivf_ann) + per-vector nearest-centroid assignment.
    cents = ivf_centroids(emb, k=16, iterations=2)
    cent_df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)], "cid int, centroid array<double>"
    )
    assign = ivf_assign(emb, cents).select("vec_id", "bucket")

    # q86: PQ codebooks (m=8, ksub=16, 2 iterations, matching
    # q86_pq_ann) + per-vector codes. The oracle re-derives the ADC
    # table from the frozen codebooks and the ADC sums/top-k from the
    # frozen codes; Spark computes both LIVE, so the compare pins the
    # subspace Lloyd and the encoder.
    from langscrape_spark.operators.ann import pq_codebooks, pq_encode

    cbs = pq_codebooks(emb, m=8, ksub=16, iterations=2)
    cb_df = spark.createDataFrame(
        [(s, c, cbs[s][c]) for s in range(len(cbs))
         for c in range(len(cbs[s]))],
        "sub int, cid int, centroid array<double>",
    )
    codes_df = pq_encode(emb, cbs).select("vec_id", "codes")

    for name, df in [
        ("q17_srp_buckets", q17),
        ("q21_lsh_buckets", q21),
        ("q35_ivf_centroids", cent_df),
        ("q35_ivf_assign", assign),
        ("q86_pq_codebooks", cb_df),
        ("q86_pq_codes", codes_df),
    ]:
        tmp = os.path.join(FIXDIR, f"_{name}_stage")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        dest = os.path.join(FIXDIR, f"{name}.parquet")
        shutil.move(os.path.join(tmp, part), dest)
        shutil.rmtree(tmp)
        print(f"froze {dest}")

    spark.stop()


if __name__ == "__main__":
    main()
