#!/usr/bin/env python3
"""Semantic (embedding) incremental-dedup soak — the vector sibling of
``incremental_soak.py``, exercising BOTH state payloads:

- raw-vector state (``semantic_ingest_round``): dim·4 B/doc payload;
- PQ-coded state (``semantic_ingest_round_pq``): m B/doc payload, ADC
  candidate screen + exact re-rank against the system-of-record
  embedding table.

Per round it ingests one deterministic batch (planted near-dups:
every 5th vector is a small perturbation of an earlier one) against
frozen round-0 IVF centroids and frozen round-0 PQ codebooks, timing
both legs. Between-round maintenance: ``bucket_state_compact`` every
4 rounds. At the halfway round it simulates the torn-append kill
window on both legs (half the batch's state rows appended, then the
full round replayed) — the replay must emit no self-pairs and the
final union must be unaffected.

End-of-soak assertions (exact, not statistical):
- raw-leg pair union == numpy brute-force within-cluster cosine pairs;
- PQ-leg pair union == the same brute force with the ADC screen
  reproduced in numpy for cross-round pairs (same-round pairs are
  exact in both legs by construction);
- state sizes on disk reported side by side (the point of PQ).

Prints one JSON line per round plus a summary line.

Usage: python scripts/semantic_soak.py [rounds] [vecs_per_round]
       (defaults 8 x 4000; dim 64, k 32 clusters, m 8 PQ subspaces)
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

DIM = 64
K_CLUSTERS = 32
M_PQ = 8
KSUB = 16
THRESHOLD = 0.8
SLACK = 0.1


def _vec(i: int) -> list:
    """Deterministic embedding: hash-seeded direction with planted
    near-dups (every 5th vector perturbs vector i-3)."""
    import hashlib

    import numpy as np

    base_i = i - 3 if (i % 5 == 0 and i >= 5) else i
    h = hashlib.blake2b(f"v:{base_i}".encode(), digest_size=32).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
    v = rng.standard_normal(DIM)
    if base_i != i:
        hp = hashlib.blake2b(f"p:{i}".encode(), digest_size=8).digest()
        rng2 = np.random.default_rng(int.from_bytes(hp, "big"))
        v = v + 0.15 * rng2.standard_normal(DIM)
    return [float(x) for x in v]


def _du(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    per_round = int(sys.argv[2]) if len(sys.argv) > 2 else 4000

    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from langscrape_spark.operators.ann import (
        ivf_assign,
        ivf_centroids,
        pq_codebooks,
        pq_encode,
    )
    from langscrape_spark.operators.incremental import (
        _semantic_params,
        _semantic_pq_params,
        bucket_state_append,
        bucket_state_compact,
        semantic_ingest_round,
        semantic_ingest_round_pq,
    )
    from langscrape_spark.session import get_spark

    spark = get_spark("semantic_soak")
    spark.sparkContext.setLogLevel("ERROR")

    n_total = rounds * per_round
    print(json.dumps({"soak": "semantic", "rounds": rounds,
                      "per_round": per_round, "dim": DIM}), flush=True)

    # System-of-record embedding table (what a crawl's pages/embedding
    # store is): all vectors, materialized once.
    all_pdf = pd.DataFrame(
        {"id": range(n_total), "vec": [_vec(i) for i in range(n_total)]}
    )
    emb_dir = tempfile.mkdtemp(prefix="sem_soak_emb_")
    all_pdf.to_parquet(os.path.join(emb_dir, "emb.parquet"), index=False)
    emb = spark.read.parquet(emb_dir).select(
        "id", F.col("vec").cast("array<float>").alias("vec")
    ).cache()
    emb.count()

    # Frozen geometry from round 0 only (production: a training sample)
    r0 = emb.where(F.col("id") < per_round)
    r0v = r0.select(F.col("id").alias("vec_id"),
                    F.col("vec").alias("embedding"))
    cents = ivf_centroids(r0v, k=K_CLUSTERS, iterations=2)
    cbs = pq_codebooks(r0v, m=M_PQ, ksub=KSUB, iterations=2)

    assigned_all = ivf_assign(
        emb.select(F.col("id").alias("vec_id"),
                   F.col("vec").alias("embedding")),
        cents,
    ).select(
        F.col("vec_id").alias("id"),
        F.col("bucket").alias("cluster"),
        F.col("embedding").alias("vec"),
    ).cache()
    assigned_all.count()

    raw_dir = tempfile.mkdtemp(prefix="sem_soak_raw_")
    pq_dir = tempfile.mkdtemp(prefix="sem_soak_pq_")
    shutil.rmtree(raw_dir); shutil.rmtree(pq_dir)  # states create dirs

    raw_pairs: set = set()
    pq_pairs: set = set()
    raw_times, pq_times = [], []
    kill_round = rounds // 2
    try:
        for r in range(rounds):
            batch = assigned_all.where(
                (F.col("id") >= r * per_round)
                & (F.col("id") < (r + 1) * per_round)
            )
            if r == kill_round:
                # torn-append kill window on BOTH legs: half the
                # batch's state rows committed, then a full replay
                half = batch.where(F.col("id") % 2 == 0)
                bucket_state_append(
                    half.where(F.col("cluster") >= 0).select(
                        F.col("cluster").cast("int").cast("string")
                        .alias("bucket"), "id", "vec",
                    ),
                    raw_dir, n_parts=K_CLUSTERS,
                    params=_semantic_params(THRESHOLD, K_CLUSTERS),
                )
                bucket_state_append(
                    pq_encode(half.where(F.col("cluster") >= 0), cbs,
                              "vec").select(
                        F.col("cluster").cast("int").cast("string")
                        .alias("bucket"), "id", "codes",
                    ),
                    pq_dir, n_parts=K_CLUSTERS,
                    params=_semantic_pq_params(
                        THRESHOLD, K_CLUSTERS, cbs, SLACK
                    ),
                )
            t0 = time.time()
            p_raw = semantic_ingest_round(
                batch, raw_dir, threshold=THRESHOLD, k=K_CLUSTERS,
                n_parts=K_CLUSTERS,
            ).collect()
            raw_dt = time.time() - t0
            t0 = time.time()
            p_pq = semantic_ingest_round_pq(
                batch, pq_dir, threshold=THRESHOLD, k=K_CLUSTERS,
                codebooks=cbs, corpus_vecs=emb, slack=SLACK,
                n_parts=K_CLUSTERS,
            ).collect()
            pq_dt = time.time() - t0
            assert all(p.id_a != p.id_b for p in p_raw), "raw self-pair"
            assert all(p.id_a != p.id_b for p in p_pq), "pq self-pair"
            raw_pairs |= {(p.id_a, p.id_b) for p in p_raw}
            pq_pairs |= {(p.id_a, p.id_b) for p in p_pq}
            raw_times.append(raw_dt)
            pq_times.append(pq_dt)
            if (r + 1) % 4 == 0:
                bucket_state_compact(spark, raw_dir, n_parts=K_CLUSTERS)
                bucket_state_compact(spark, pq_dir, n_parts=K_CLUSTERS)
            print(json.dumps({
                "round": r, "raw_sec": round(raw_dt, 2),
                "pq_sec": round(pq_dt, 2),
                "raw_pairs": len(raw_pairs), "pq_pairs": len(pq_pairs),
                "killed": r == kill_round,
            }), flush=True)

        # ---- exact brute-force oracle (numpy) --------------------------
        adf = assigned_all.toPandas()
        adf = adf[adf["cluster"] >= 0]
        codes_pdf = pq_encode(assigned_all, cbs, "vec").select(
            "id", "codes"
        ).toPandas().set_index("id")["codes"]
        C = np.asarray(cbs, dtype=np.float64)  # (m, ksub, dsub)
        dsub = C.shape[2]
        want_raw, want_pq = set(), set()
        for cl, grp in adf.groupby("cluster"):
            ids = grp["id"].to_numpy()
            V = np.array([list(v) for v in grp["vec"]], dtype=np.float64)
            nrm = np.linalg.norm(V, axis=1)
            S = (V @ V.T) / np.outer(nrm, nrm)
            S = np.round(S, 6)
            # reconstructed vectors + norms from codes (ADC)
            codes = np.array(
                [list(codes_pdf[i]) for i in ids], dtype=np.int64
            )
            R = np.concatenate(
                [C[s][codes[:, s]] for s in range(M_PQ)], axis=1
            )
            rnrm = np.linalg.norm(R, axis=1)
            A = np.round((V @ R.T) / np.outer(nrm, rnrm), 6)
            rnds = ids // per_round
            n = len(ids)
            iu, ju = np.triu_indices(n, 1)
            for x, y in zip(iu, ju):
                ia, ib = int(ids[x]), int(ids[y])
                lo, hi = (ia, ib) if ia < ib else (ib, ia)
                if S[x, y] >= THRESHOLD:
                    want_raw.add((lo, hi))
                    if rnds[x] == rnds[y]:
                        want_pq.add((lo, hi))
                    else:
                        # new = later round probes old = earlier codes
                        new_i, old_i = (
                            (x, y) if rnds[x] > rnds[y] else (y, x)
                        )
                        adc = round(
                            float(V[new_i] @ R[old_i])
                            / (nrm[new_i] * rnrm[old_i]), 6,
                        )
                        if adc >= THRESHOLD - SLACK:
                            want_pq.add((lo, hi))
        ok_raw = raw_pairs == want_raw
        ok_pq = pq_pairs == want_pq
        raw_bytes, pq_bytes = _du(raw_dir), _du(pq_dir)
        w = raw_times[1:]
        wq = pq_times[1:]
        flat_raw = (sum(w[-3:]) / 3) / (sum(w[:3]) / 3) if len(w) >= 6 else None
        flat_pq = (sum(wq[-3:]) / 3) / (sum(wq[:3]) / 3) if len(wq) >= 6 else None
        print(json.dumps({
            "summary": "semantic incremental soak (raw vs PQ payload)",
            "rounds": rounds, "vectors": n_total,
            "union_equals_bruteforce_raw": ok_raw,
            "union_equals_bruteforce_pq": ok_pq,
            "raw_pairs": len(raw_pairs), "pq_pairs": len(pq_pairs),
            "pq_screen_dropped": len(want_raw) - len(want_pq),
            "raw_round_secs": [round(t, 2) for t in raw_times],
            "pq_round_secs": [round(t, 2) for t in pq_times],
            "flat_ratio_raw": round(flat_raw, 3) if flat_raw else None,
            "flat_ratio_pq": round(flat_pq, 3) if flat_pq else None,
            "state_bytes_raw": raw_bytes,
            "state_bytes_pq": pq_bytes,
            "state_bytes_per_doc_raw": round(raw_bytes / n_total, 1),
            "state_bytes_per_doc_pq": round(pq_bytes / n_total, 1),
        }), flush=True)
        if not (ok_raw and ok_pq):
            print(json.dumps({
                "raw_missing": sorted(want_raw - raw_pairs)[:5],
                "raw_extra": sorted(raw_pairs - want_raw)[:5],
                "pq_missing": sorted(want_pq - pq_pairs)[:5],
                "pq_extra": sorted(pq_pairs - want_pq)[:5],
            }), flush=True)
            sys.exit(1)
    finally:
        for d in (raw_dir, pq_dir, emb_dir):
            shutil.rmtree(d, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
