"""Similarity search over an embedding column (``array<float>``).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Dot product and norms via ``F.zip_with``/``F.aggregate`` higher-order
  functions (JVM-side, codegen) in double precision.
- ``lsh_topk``: the scale path — sign-random-projection LSH buckets
  (hyperplanes derived deterministically from md5, no RNG state), then
  exact re-ranking inside the probed buckets. At 100 TB the bucket join
  replaces the full scan; recall is tunable by n_planes/n_probes.
"""

from __future__ import annotations

import hashlib
import math
from typing import List, Sequence

from pyspark.sql import Column, DataFrame, functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_sim(a: Column, b: Column) -> Column:
    # try_divide, not '/': under Spark 4 ANSI mode even DOUBLE
    # division by zero THROWS — one zero-norm embedding would kill the
    # whole query. NULL cosine → dropped by every downstream filter
    # and sorted after every real value (poison rows flagged, never
    # fatal).
    return F.try_divide(_dot(a, b), _norm(a) * _norm(b))


def cosine_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact brute-force top-k by cosine similarity to ``query_vec``.
    Deterministic total order: (similarity desc, id asc); similarity
    rounded to 6 decimals in the output for cross-engine comparability."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        F.round(cosine_sim(F.col(vec_col), q), 6).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.col(id_col).asc()).limit(k)


def _deterministic_planes(dim: int, n_planes: int) -> List[List[float]]:
    """Hyperplanes from md5 — no RNG state, identical everywhere.
    Component (p, d) = signed fraction from the md5 of 'p:d'."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"plane{p}:{d}".encode()).digest()
            v = int.from_bytes(h[:8], "big") / 2**63 - 1.0  # [-1, 1)
            row.append(v)
        planes.append(row)
    return planes


def gemm_block_rows(n_cols: int, target_bytes: int = 128 << 20) -> int:
    """Row-block size for a blocked gemm whose sims slab must stay
    ≤ ``target_bytes``: slab = block · n_cols · 8 B. Post-guard groups
    in the LSH near-dup path can reach 8·max_bucket_rows (131k) columns
    — a fixed 1024-row block there is a ~1 GB slab per python worker."""
    return max(16, min(1024, target_bytes // (max(n_cols, 1) * 8)))


def srp_bucket(vec: Column, planes: List[List[float]]) -> Column:
    """Sign-random-projection bucket id: one bit per plane.

    REFERENCE-ONLY: every live path uses :func:`srp_bucket_fast` (one
    gemm per Arrow batch); this expression form exists as the readable
    specification and for JVM-only contexts. Sign decisions can differ
    from the gemm form on dot products within float-summation error of
    zero, so do NOT mix the two bucketers over one corpus."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bucket = bucket + F.when(_dot(vec, p) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def lsh_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    n_planes: int = 8,
    probe_radius: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: restrict the exact scorer to SRP buckets
    within hamming ``probe_radius`` of the query's bucket (multiprobe
    LSH). At scale the bucket is a stored column on the embeddings
    table: probing hamming ≤ r of 2^n_planes buckets scans a
    ``sum(C(n,i))/2^n`` fraction of the corpus (r=3, n=8 → ~36%)
    instead of 100%, and the probe set is an explicit bucket-key list,
    so a bucket-partitioned table gets partition pruning. Recall/cost
    trades via (n_planes, probe_radius)."""
    dim = len(query_vec)
    planes = _deterministic_planes(dim, n_planes)
    q_bits = [
        sum(float(x) * p for x, p in zip(query_vec, plane)) >= 0 for plane in planes
    ]
    q_bucket = sum(1 << i for i, bit in enumerate(q_bits) if bit)

    # poison-safe: NULL/empty vectors can never be top-k by cosine
    # (their similarity is undefined) and a None inside the gemm
    # bucketer's Arrow batch would kill the whole query — drop them
    # from the CANDIDATES only (the corpus is untouched).
    df = df.where(F.col(vec_col).isNotNull() & (F.size(vec_col) > 0))
    # srp_bucket_fast: one numpy gemm per Arrow batch instead of
    # n_planes HOF dot products per row — same sign decisions up to
    # float-summation boundary cases, and the exact cosine re-rank
    # below is unchanged either way (measured 2.2s → ~1s at sf0.1).
    bucketed = df.withColumn("bucket", srp_bucket_fast(F.col(vec_col), planes))
    cand = bucketed.where(
        F.bit_count(F.col("bucket").bitwiseXOR(F.lit(q_bucket))) <= probe_radius
    )
    return cosine_topk(cand, query_vec, k, vec_col, id_col)


def ivf_centroids(
    df: DataFrame,
    k: int = 64,
    iterations: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Deterministic IVF centroids: seed with the k md5-first vectors
    (engine-portable, no RNG state), then ``iterations`` Lloyd steps —
    assignment is one gemm per Arrow batch against the broadcast
    centroid matrix, the mean update is a numpy groupby per partition
    reduced on the driver (n_partitions·k rows of dim floats — MBs at
    worst for realistic k; never proportional to corpus size). Returns
    a ``list[list[float]]`` of L2-normalized centroids.

    Scale shape: every pass over the corpus is map-only + one tiny
    collect of per-partition (sum, count) partials; nothing grows with
    corpus size on the driver."""
    import numpy as np

    # poison-safe: NULL/empty vectors can neither seed nor move a
    # centroid (and would NaN the means / crash the batch gemm)
    df = df.where(F.col(vec_col).isNotNull() & (F.size(vec_col) > 0))
    seed_rows = (
        df.select(id_col, vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(k)
        .collect()
    )
    if not seed_rows:
        return []
    cent = np.array([r[vec_col] for r in seed_rows], dtype=np.float64)
    norms = np.linalg.norm(cent, axis=1)
    norms[norms == 0] = 1.0
    cent = cent / norms[:, None]
    spark = df.sparkSession

    for _ in range(iterations):
        bc = spark.sparkContext.broadcast(cent)

        def partials(batches):
            import pandas as pd

            C = bc.value
            sums = np.zeros_like(C)
            counts = np.zeros(len(C), dtype=np.int64)
            for pdf in batches:
                vals = [
                    v for v in pdf[vec_col] if v is not None and len(v) == C.shape[1]
                ]
                if not vals:
                    continue
                V = np.array(vals, dtype=np.float64)
                n = np.linalg.norm(V, axis=1)
                n[n == 0] = 1.0
                a = np.argmax((V / n[:, None]) @ C.T, axis=1)
                np.add.at(sums, a, V)
                np.add.at(counts, a, 1)
            yield pd.DataFrame(
                {
                    "cid": np.arange(len(C)),
                    "s": [x.tolist() for x in sums],
                    "n": counts,
                }
            )

        rows = (
            df.select(vec_col)
            .mapInPandas(partials, schema="cid int, s array<double>, n long")
            .collect()
        )
        sums = np.zeros_like(cent)
        counts = np.zeros(len(cent), dtype=np.int64)
        for r in rows:
            sums[r["cid"]] += np.asarray(r["s"])
            counts[r["cid"]] += r["n"]
        mask = counts > 0
        cent[mask] = sums[mask] / counts[mask, None]
        n = np.linalg.norm(cent, axis=1)
        n[n == 0] = 1.0
        cent = cent / n[:, None]
    return [list(map(float, c)) for c in cent]


def ivf_assign(
    df: DataFrame,
    centroids,
    vec_col: str = "embedding",
) -> DataFrame:
    """Add a ``bucket`` column: nearest centroid by cosine (one gemm
    per Arrow batch). At scale this column is written once and the
    table is bucket-partitioned, so probes get partition pruning.

    Poison rows (NULL / wrong-length vectors) get bucket −1 — a list
    no probe ever scans — and never affect the valid rows sharing
    their Arrow batch (a whole-batch fallback would silently
    misassign every neighbor of one bad row)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import IntegerType

    C = [list(map(float, c)) for c in centroids]

    def _assign(vs):
        M = np.asarray(C, dtype=np.float64)
        dim = M.shape[1]
        vals = list(vs)
        good = [
            i for i, v in enumerate(vals) if v is not None and len(v) == dim
        ]
        out = np.full(len(vals), -1, dtype="int32")
        if good:
            V = np.array([vals[i] for i in good], dtype=np.float64)
            n = np.linalg.norm(V, axis=1)
            n[n == 0] = 1.0
            out[good] = np.argmax((V / n[:, None]) @ M.T, axis=1).astype("int32")
        return pd.Series(out)

    return df.withColumn("bucket", pandas_udf(_assign, IntegerType())(F.col(vec_col)))


def ivf_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    centroids,
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-flat approximate top-k: rank centroids by similarity to the
    query, scan only the ``nprobe`` nearest inverted lists, exact
    re-rank inside them (same scorer and total order as
    ``cosine_topk``). With a stored/partitioned ``bucket`` column the
    probe is an explicit IN-list filter → partition pruning; recall
    trades via (k centroids, nprobe) exactly like FAISS IVF-flat."""
    import numpy as np

    if not centroids:
        return cosine_topk(df, query_vec, k, vec_col, id_col)
    C = np.asarray(centroids, dtype=np.float64)
    q = np.asarray(list(query_vec), dtype=np.float64)
    qn = np.linalg.norm(q)
    if qn == 0:
        qn = 1.0
    sims = C @ (q / qn)
    # stable sort: tied centroid similarities break toward the lower
    # cid, matching the q35 oracle's 'dot DESC, cid ASC' ranking (an
    # unstable argsort can pick a different probe set when duplicate
    # embeddings converge two centroids to identical positions)
    probe = np.argsort(-sims, kind="stable")[:nprobe].tolist()
    assigned = df if "bucket" in df.columns else ivf_assign(df, centroids, vec_col)
    cand = assigned.where(F.col("bucket").isin([int(b) for b in probe]))
    return cosine_topk(cand, query_vec, k, vec_col, id_col)


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs: (a, b, cosine) for
    a < b with cosine >= threshold. The O(n^2) correctness baseline —
    run it on a filtered slice; the scale path is the LSH variant."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return (
        pairs.select(
            "id_a",
            "id_b",
            F.round(cosine_sim(F.col("va"), F.col("vb")), 6).alias("cosine"),
        )
        # zero-norm vectors yield NULL cosines (try_divide); the
        # isnan guard additionally drops NaN-poisoned inputs.
        .where(~F.isnan("cosine") & (F.col("cosine") >= threshold))
    )


def lsh_bucket_assignments(
    df: DataFrame,
    n_planes: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    target_bucket_rows: int = 1024,
    max_bucket_rows: int = 16384,
) -> DataFrame | None:
    """The bucketing stage of :func:`embedding_neardup_pairs_lsh`,
    exposed so the DuckDB oracle fixtures can freeze the exact
    (id, bucket, sub) assignment the pair generator groups on
    (``scripts/freeze_ann_fixtures.py``). Returns a frame with columns
    ``(id, vec, bucket, sub)`` post-refinement and post-guard, or
    ``None`` for an effectively-empty input."""
    import math as _math

    # poison-safe: NULL/empty vectors can never satisfy a cosine
    # threshold; dropping them from the PAIR operator flags nothing
    # but also breaks nothing (they remain in the corpus). The
    # dimension probe must skip them too — an unfiltered .first()
    # hitting one NULL row would silently empty the whole result.
    df = df.where(F.col(vec_col).isNotNull() & (F.size(vec_col) > 0))
    first = df.select(F.size(vec_col).alias("d")).first()
    if first is None or first["d"] is None:
        return None
    dim = int(first["d"])
    if n_planes is None:
        n = df.count()
        if n == 0:
            return None
        n_planes = min(24, max(4, _math.ceil(_math.log2(max(n / target_bucket_rows, 1.0)))))
    planes = _deterministic_planes(dim, n_planes)
    bucketed = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        srp_bucket_fast(F.col(vec_col), planes).alias("bucket"),
    )

    # Per-bucket adaptive refinement: hot buckets get extra sign bits.
    hot = (
        bucketed.groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") > max_bucket_rows)
        .withColumn(
            "extra_bits",
            F.ceil(F.log2(F.col("n") / F.lit(float(max_bucket_rows)))).cast("int"),
        )
        .select("bucket", "extra_bits")
    )
    hot_rows = hot.collect()  # bounded: ≤ corpus/max_bucket_rows rows
    if hot_rows:
        max_extra = min(16, max(int(r["extra_bits"]) for r in hot_rows))
        extra_planes = _deterministic_planes(dim, n_planes + max_extra)[n_planes:]
        bucketed = (
            bucketed.withColumn(
                "refine", srp_bucket_fast(F.col("vec"), extra_planes)
            )
            .join(F.broadcast(hot), "bucket", "left")
            .withColumn(
                "sub",
                F.when(
                    F.col("extra_bits").isNotNull(),
                    F.col("refine").bitwiseAND(
                        F.pow(
                            F.lit(2.0),
                            F.least(F.col("extra_bits"), F.lit(max_extra)),
                        ).cast("long")
                        - 1
                    ),
                ).otherwise(F.lit(0)),
            )
            .select("id", "vec", "bucket", "sub")
        )
    else:
        bucketed = bucketed.withColumn("sub", F.lit(0))

    # Hard guard: a group still oversized after refinement is a
    # sign-identical cluster no projection can split — exclude it
    # (exact_dedup's territory) instead of handing one python worker
    # an m²/2-pair explosion.
    if hot_rows:
        oversized = (
            bucketed.groupBy("bucket", "sub")
            .agg(F.count("*").alias("m"))
            .where(F.col("m") > 8 * max_bucket_rows)
            .select("bucket", "sub")
        )
        bucketed = bucketed.join(
            F.broadcast(oversized), ["bucket", "sub"], "left_anti"
        )
    return bucketed


def embedding_neardup_pairs_lsh(
    df: DataFrame,
    threshold: float,
    n_planes: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    target_bucket_rows: int = 1024,
    max_bucket_rows: int = 16384,
) -> DataFrame:
    """Scale path: SRP buckets partition the corpus; all-pairs cosine
    runs *within* each bucket as one numpy gemm (``applyInPandas`` per
    bucket group) — never a per-pair HOF evaluation and never a cross
    join. Recall < 1 (pairs split across buckets are missed); raise it
    with band-style multiple plane sets, as minhash_lsh_pairs does for
    text.

    - ``n_planes=None`` derives the plane count from the corpus size so
      buckets average ~``target_bucket_rows`` rows — a fixed default
      (the old 4 → 16 buckets) is a cross-join in disguise at 10^10.
    - Buckets that still exceed ``max_bucket_rows`` (dense clusters)
      are REFINED with extra planes — per-bucket depth, like a prefix
      tree. Refinement loses the same class of cross-bucket pairs the
      base bucketing does.
    - Groups that stay oversized AFTER refinement are clusters of
      sign-identical vectors no projection can split (byte-identical
      embeddings, the mass-duplicate case): like
      ``minhash_lsh_pairs``' bucket guard, groups beyond
      ``8·max_bucket_rows`` are EXCLUDED from pair generation — that
      is ``exact_dedup``'s job (an identical-vector cluster of size m
      would emit m²/2 pairs from one python worker).
    - NULL / empty embeddings contribute no pairs (a pair with an
      undefined cosine is meaningless) and never poison the
      dimensionality probe or a whole Arrow batch.

    The bucketing stage lives in :func:`lsh_bucket_assignments` (shared
    with the oracle-fixture freezer, which pins it against DuckDB).
    """
    bucketed = lsh_bucket_assignments(
        df,
        n_planes=n_planes,
        vec_col=vec_col,
        id_col=id_col,
        target_bucket_rows=target_bucket_rows,
        max_bucket_rows=max_bucket_rows,
    )
    if bucketed is None:
        return df.sparkSession.createDataFrame(
            [], "id_a long, id_b long, cosine double"
        )

    import numpy as np
    import pandas as pd

    thr = float(threshold)

    def gen(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["id"].to_numpy(dtype=np.int64)
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
            )
        mat = np.array(list(pdf["vec"]), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = np.nan  # zero-norm → NaN cosine → dropped
        unit = mat / norms[:, None]
        outs = []
        # row-blocked gemm, block sized so the sims slab stays ≤128 MB
        block = gemm_block_rows(len(ids))
        for lo in range(0, len(ids), block):
            sims = np.round(unit[lo : lo + block] @ unit.T, 6)
            li, ri = np.nonzero(
                (sims >= thr) & (ids[lo : lo + block, None] < ids[None, :])
            )
            outs.append(
                pd.DataFrame(
                    {
                        "id_a": ids[lo + li],
                        "id_b": ids[ri],
                        "cosine": sims[li, ri],
                    }
                )
            )
        return pd.concat(outs, ignore_index=True)

    return bucketed.groupBy("bucket", "sub").applyInPandas(
        gen, schema="id_a long, id_b long, cosine double"
    )


def embedding_neardup_pairs_blocked(
    df: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_broadcast_rows: int = 100_000,
) -> DataFrame:
    """Exact all-pairs cosine via BLOCKED MATRIX MULTIPLY: the
    (bounded) right side is collected, L2-normalized and broadcast as
    one numpy matrix; each partition's rows multiply against it with
    a single BLAS gemm inside ``mapInPandas``. Identical results to
    ``embedding_neardup_pairs`` (same rounding, same a<b and NaN
    rules) at a fraction of the cost — per-element HOF expressions
    can't touch a gemm.

    Scale shape: left side streams (arbitrarily large), right side is
    the broadcast block — for corpora beyond ``max_broadcast_rows``
    compose over right-side chunks (outer driver loop), or fall back
    to the LSH bucket join which needs no broadcast at all."""
    import numpy as np
    import pandas as pd

    rows = df.select(id_col, vec_col).collect()
    if len(rows) > max_broadcast_rows:
        raise ValueError(
            f"right side has {len(rows)} rows > max_broadcast_rows="
            f"{max_broadcast_rows}; chunk the right side or use "
            "embedding_neardup_pairs_lsh"
        )
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    mat = np.array([r[vec_col] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    safe = norms.copy()
    safe[safe == 0] = np.nan  # zero-norm → NaN cosine → dropped
    unit = mat / safe[:, None]
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((ids, unit))

    def gen(batches):
        r_ids, r_unit = bc.value
        for pdf in batches:
            l_ids = pdf[id_col].to_numpy(dtype=np.int64)
            l_mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            l_norms = np.linalg.norm(l_mat, axis=1)
            l_norms[l_norms == 0] = np.nan
            l_unit = l_mat / l_norms[:, None]
            sims = np.round(l_unit @ r_unit.T, 6)
            li, ri = np.nonzero(
                (sims >= threshold) & (l_ids[:, None] < r_ids[None, :])
            )
            yield pd.DataFrame(
                {
                    "id_a": l_ids[li],
                    "id_b": r_ids[ri],
                    "cosine": sims[li, ri],
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        gen, schema="id_a long, id_b long, cosine double"
    )


def srp_bucket_fast(vec: Column, planes: List[List[float]]) -> Column:
    """SRP bucket via one numpy gemm per Arrow batch instead of
    n_planes HOF dot products. Sign decisions can differ from
    :func:`srp_bucket` only for dot products within float summation
    error of zero — harmless for bucketing (any consistent bucketing
    is valid; candidate recall shifts by at most those boundary
    vectors, and the exact cosine confirm is unchanged)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    p_mat = [list(map(float, row)) for row in planes]

    def _bucket(vs):
        P = np.asarray(p_mat, dtype=np.float64)
        weights = (1 << np.arange(len(p_mat), dtype=np.uint64)).astype(np.uint64)
        V = np.array(list(vs), dtype=np.float64)
        if V.ndim != 2 or len(V) == 0:
            return pd.Series([0] * len(vs), dtype="int64")
        bits = (V @ P.T >= 0).astype(np.uint64)
        return pd.Series((bits * weights).sum(axis=1).view(np.int64))

    return pandas_udf(_bucket, LongType())(vec)


def embedding_neardup_pairs_chunked(
    df: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    chunk_rows: int = 50_000,
) -> DataFrame:
    """Exact all-pairs beyond one broadcast: the corpus is split into
    id-ordered chunks; every chunk is broadcast in turn and the blocked
    gemm runs the streaming side against it. The a<b rule inside the
    blocked kernel makes chunk overlaps self-deduplicating, so the
    union over chunks is exactly the full pair set. Driver loop depth
    is ceil(n/chunk_rows) — at 10^8 vectors with 10^5-row chunks that
    is ~10^3 sequential broadcasts, which is where the LSH bucket join
    takes over as the primary path and this remains the exact verifier
    for sampled slices.

    Chunk boundaries come from ``approxQuantile`` over the id column
    (driver holds O(n_chunks) scalars), not from collecting every id —
    at 10^8+ vectors an all-ids collect is gigabytes on the driver.
    Quantile error only skews chunk *sizes* (±0.1%); coverage stays
    exact because chunks partition the id space by half-open ranges."""
    import math as _math

    n = df.count()
    if n == 0:
        return df.sparkSession.createDataFrame(
            [], "id_a long, id_b long, cosine double"
        )
    n_chunks = max(1, _math.ceil(n / chunk_rows))
    if n_chunks == 1:
        cuts: list[float] = []
    else:
        probs = [i / n_chunks for i in range(1, n_chunks)]
        cuts = df.stat.approxQuantile(id_col, probs, 0.001)
    # half-open ranges (lo, hi]; first chunk has no lower bound, last no
    # upper bound — every id lands in exactly one chunk.
    bounds = [None] + cuts + [None]
    out = None
    branches = 0
    for i in range(len(bounds) - 1):
        lo, hi = bounds[i], bounds[i + 1]
        right = df
        if lo is not None:
            right = right.where(F.col(id_col) > lo)
        if hi is not None:
            right = right.where(F.col(id_col) <= hi)
        # left side: only rows that can satisfy a < b against this chunk
        left = df if hi is None else df.where(F.col(id_col) < hi)
        part = _blocked_against(
            left, right, threshold, vec_col=vec_col, id_col=id_col
        )
        out = part if out is None else out.unionByName(part)
        branches += 1
        # fold the union every 32 chunks: an unbounded unionByName over
        # ~10^3 chunks is an unplannable DAG (Catalyst cost is
        # superlinear in plan width); localCheckpoint truncates the
        # lineage to the materialized pairs, which are tiny relative to
        # the corpus.
        if branches % 32 == 0:
            out = out.localCheckpoint(eager=True)
    return out


def _blocked_against(
    left: DataFrame,
    right: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Blocked gemm of ``left`` rows against a broadcast of ``right``
    (the single-chunk kernel behind the blocked/chunked variants)."""
    import numpy as np
    import pandas as pd

    rows = right.select(id_col, vec_col).collect()
    if not rows:
        return left.sparkSession.createDataFrame(
            [], "id_a long, id_b long, cosine double"
        )
    r_ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    mat = np.array([r[vec_col] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = np.nan
    r_unit = mat / norms[:, None]
    bc = left.sparkSession.sparkContext.broadcast((r_ids, r_unit))

    def gen(batches):
        rid, runit = bc.value
        for pdf in batches:
            l_ids = pdf[id_col].to_numpy(dtype=np.int64)
            if len(l_ids) == 0:
                continue
            l_mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            l_norms = np.linalg.norm(l_mat, axis=1)
            l_norms[l_norms == 0] = np.nan
            l_unit = l_mat / l_norms[:, None]
            sims = np.round(l_unit @ runit.T, 6)
            li, ri = np.nonzero(
                (sims >= threshold) & (l_ids[:, None] < rid[None, :])
            )
            yield pd.DataFrame(
                {"id_a": l_ids[li], "id_b": rid[ri], "cosine": sims[li, ri]}
            )

    return left.select(id_col, vec_col).mapInPandas(
        gen, schema="id_a long, id_b long, cosine double"
    )


def semdedup(
    df: DataFrame,
    threshold: float,
    k: int | None = None,
    iterations: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    target_cluster_rows: int = 8192,
    max_cluster_rows: int = 65536,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster the embedding space with
    k-means, then judge near-duplicates only WITHIN each cluster — the
    canonical way to run embedding dedup when all-pairs (even
    LSH-bucketed) is too coarse or the corpus needs semantic rather
    than sign-pattern locality.

    Per row returns ``(id, cluster, max_sim_earlier, keep)`` where
    ``max_sim_earlier`` is the max cosine (round-6, like every cosine
    path here) to any SAME-CLUSTER row with a SMALLER id and ``keep =
    max_sim_earlier is NULL or < threshold`` — the paper's greedy
    keep-first rule (NOT connected components: if a~b and b~c but
    a!~c, b and c both drop and a survives; ``resolve_duplicates`` is
    the transitive alternative). Deterministic: md5-seeded Lloyd
    (:func:`ivf_centroids`), id order as the keep priority.

    Scale shape: ``iterations`` map-only corpus passes for centroids
    (driver holds k·dim floats), one gemm-batch assignment pass, then
    ONE shuffle on the cluster id and a per-cluster blocked gemm
    (sims slab ≤128 MB via :func:`gemm_block_rows`). ``k=None``
    derives ceil(n / target_cluster_rows) — fixing k while the corpus
    grows is the same cross-join-in-disguise the LSH path's derived
    plane count guards against; clusters beyond ``max_cluster_rows``
    raise with that guidance (a silently skipped cluster would flip
    every one of its rows to keep=True).

    Poison rows (NULL / wrong-dim / zero-norm vectors) keep
    ``cluster=-1`` / NULL similarity / keep=True: cosine is undefined
    there, so SemDeDup has no evidence to drop them — route them to
    the text paths (``exact_dedup`` catches byte-identical blobs).
    """
    import numpy as np
    import pandas as pd

    if k is None:
        n = df.count()
        k = max(16, min(4096, -(-n // target_cluster_rows)))
    cents = ivf_centroids(df, k=k, iterations=iterations,
                          vec_col=vec_col, id_col=id_col)
    if not cents:
        return df.sparkSession.createDataFrame(
            [], f"{id_col} long, cluster int, max_sim_earlier double, keep boolean"
        )
    assigned = ivf_assign(df, cents, vec_col=vec_col).select(
        F.col(id_col).alias("id"), F.col("bucket").alias("cluster"),
        F.col(vec_col).alias("vec"),
    )
    thr, dim = float(threshold), len(cents[0])
    cap = int(max_cluster_rows)

    def gen(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["id"].to_numpy(dtype=np.int64)
        cluster = int(pdf["cluster"].iloc[0])
        if cluster < 0 or len(ids) == 1:
            # poison cluster (or singleton): nothing to compare against
            return pd.DataFrame({
                "id": ids,
                "cluster": np.full(len(ids), cluster, dtype="int32"),
                "max_sim_earlier": pd.array([pd.NA] * len(ids),
                                            dtype="Float64"),
                "keep": np.ones(len(ids), dtype=bool),
            })
        if len(ids) > cap:
            raise ValueError(
                f"semdedup cluster {cluster} has {len(ids)} rows > "
                f"max_cluster_rows={cap}; raise k (or lower "
                f"target_cluster_rows) so clusters stay gemm-sized"
            )
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        mat = np.array(list(pdf["vec"].iloc[order]), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1)
        zero = norms == 0
        norms[zero] = np.nan  # zero-norm -> NaN sims -> excluded below
        unit = mat / norms[:, None]
        best = np.full(len(ids), -np.inf)
        block = gemm_block_rows(len(ids))
        for lo in range(0, len(ids), block):
            sims = np.round(unit[lo : lo + block] @ unit.T, 6)
            # only earlier (strictly smaller) ids count; NaN never wins max
            sims[ids[lo : lo + block, None] <= ids[None, :]] = -np.inf
            sims = np.where(np.isnan(sims), -np.inf, sims)
            best[lo : lo + block] = sims.max(axis=1)
        max_sim = np.where(np.isfinite(best), best, np.nan)
        keep = ~(max_sim >= thr)  # NaN compares False -> keep
        return pd.DataFrame({
            "id": ids,
            "cluster": np.full(len(ids), cluster, dtype="int32"),
            # nullable Float64: no-earlier-neighbor is SQL NULL, not NaN
            "max_sim_earlier": pd.array(
                [pd.NA if np.isnan(v) else v for v in max_sim],
                dtype="Float64",
            ),
            "keep": keep,
        })

    out = assigned.groupBy("cluster").applyInPandas(
        gen, schema="id long, cluster int, max_sim_earlier double, keep boolean"
    )
    return out.select(
        F.col("id").alias(id_col), "cluster", "max_sim_earlier", "keep"
    )


# --------------------------------------------------------------------------
# Product quantization (Jégou et al. 2011) — memory-bounded ANN
# --------------------------------------------------------------------------

def _pq_argmin(Vs, Cs):
    """L2-nearest codebook entry per row of ``Vs`` against subspace
    codebook ``Cs`` — THE shared distance/tie-break kernel of trainer
    and encoder (argmin of the expanded ||v−c||²; numpy argmin's
    first-occurrence rule is the deterministic tie-break). Keep both
    callers on this helper or they can silently disagree."""
    import numpy as np

    d2 = (
        (Vs * Vs).sum(1)[:, None]
        - 2.0 * (Vs @ Cs.T)
        + (Cs * Cs).sum(1)[None, :]
    )
    return np.argmin(d2, axis=1)


def pq_codebooks(
    df: DataFrame,
    m: int = 8,
    ksub: int = 16,
    iterations: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Deterministic PQ codebooks (Jégou/Douze/Schmid 2011, "Product
    Quantization for Nearest Neighbor Search"): the vector is split
    into ``m`` subvectors and each subspace gets its own ``ksub``-way
    L2 k-means codebook, so a vector stores as ``m`` small codes
    (here m bytes at ksub ≤ 256) instead of dim floats — the memory
    move that makes billion-vector ANN fit on a cluster.

    Same scale/determinism shape as :func:`ivf_centroids`: seeds are
    the ksub md5-first vectors (no RNG state), every Lloyd pass over
    the corpus is ONE ``mapInPandas`` handling all m subspaces (m
    small gemms per Arrow batch — never m corpus passes), and the
    driver only ever sees per-partition (sum, count) partials of size
    m·ksub·dsub. Unlike IVF the codebooks are plain L2 (no
    normalization): PQ approximates Euclidean geometry, and the ADC
    scorer below is L2².

    Returns ``list[m][ksub][dsub]`` of centroids. Requires dim % m
    == 0 (raises otherwise). NULL / wrong-length vectors neither seed
    nor move centroids — the corpus dim is the MODE of the collected
    seed-candidate lengths, and candidates of any other length are
    discarded before seeding (a ragged md5-first sample would
    otherwise crash the seed stack, and a short poison row landing
    first would silently redefine dim); if poison thins the seed set
    the codebook just starts with fewer than ksub entries.
    """
    import numpy as np

    df = df.where(F.col(vec_col).isNotNull() & (F.size(vec_col) > 0))
    seed_rows = (
        df.select(id_col, vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(ksub)
        .collect()
    )
    if not seed_rows:
        return []
    lengths = [len(r[vec_col]) for r in seed_rows]
    dim = max(set(lengths), key=lambda d: (lengths.count(d), -d))
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    seed_rows = [r for r in seed_rows if len(r[vec_col]) == dim]
    # (m, ksub, dsub) — every subspace seeded from the same md5-first
    # rows (their respective slices)
    seeds = np.array([r[vec_col] for r in seed_rows], dtype=np.float64)
    cent = np.stack([seeds[:, s * dsub:(s + 1) * dsub] for s in range(m)])
    spark = df.sparkSession

    for _ in range(iterations):
        bc = spark.sparkContext.broadcast(cent)

        def partials(batches):
            import pandas as pd

            C = bc.value  # (m, ksub, dsub)
            m_, k_, d_ = C.shape
            sums = np.zeros_like(C)
            counts = np.zeros((m_, k_), dtype=np.int64)
            for pdf in batches:
                vals = [
                    v for v in pdf[vec_col]
                    if v is not None and len(v) == m_ * d_
                ]
                if not vals:
                    continue
                V = np.array(vals, dtype=np.float64)
                for s in range(m_):
                    Vs = V[:, s * d_:(s + 1) * d_]
                    a = _pq_argmin(Vs, C[s])
                    np.add.at(sums[s], a, Vs)
                    np.add.at(counts[s], a, 1)
            yield pd.DataFrame({
                "sub": np.repeat(np.arange(m_), k_),
                "cid": np.tile(np.arange(k_), m_),
                "s": [x.tolist() for x in sums.reshape(m_ * k_, d_)],
                "n": counts.reshape(m_ * k_),
            })

        rows = (
            df.select(vec_col)
            .mapInPandas(partials, schema="sub int, cid int, s array<double>, n long")
            .collect()
        )
        sums = np.zeros_like(cent)
        counts = np.zeros(cent.shape[:2], dtype=np.int64)
        for r in rows:
            sums[r["sub"], r["cid"]] += np.asarray(r["s"])
            counts[r["sub"], r["cid"]] += r["n"]
        mask = counts > 0
        cent[mask] = sums[mask] / counts[mask][:, None]
    return [[list(map(float, c)) for c in sub] for sub in cent]


def pq_encode(
    df: DataFrame,
    codebooks,
    vec_col: str = "embedding",
) -> DataFrame:
    """Add a ``codes`` column (``array<int>``, length m): per
    subspace, the L2-nearest codebook entry — one set of m small
    gemms per Arrow batch against the broadcast codebooks. At scale
    this is the compressed representation you persist; the raw
    vectors are only consulted for optional exact re-ranks. Poison
    rows (NULL / wrong-length) get NULL codes and never affect batch
    neighbors. Empty codebooks (empty/all-poison corpus) encode
    every row to NULL codes."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, IntegerType

    if not codebooks:
        return df.withColumn(
            "codes", F.lit(None).cast("array<int>")
        )
    # ndarray once, captured by the closure (pickles fine) — not
    # rebuilt from nested lists on every Arrow batch
    M = np.asarray(codebooks, dtype=np.float64)  # (m, ksub, dsub)

    def _enc(vs):
        m_, k_, d_ = M.shape
        vals = list(vs)
        out = [None] * len(vals)
        good = [
            i for i, v in enumerate(vals) if v is not None and len(v) == m_ * d_
        ]
        if good:
            V = np.array([vals[i] for i in good], dtype=np.float64)
            codes = np.empty((len(good), m_), dtype=np.int64)
            for s in range(m_):
                codes[:, s] = _pq_argmin(V[:, s * d_:(s + 1) * d_], M[s])
            for row, i in enumerate(good):
                out[i] = [int(x) for x in codes[row]]
        return pd.Series(out)

    return df.withColumn(
        "codes", pandas_udf(_enc, ArrayType(IntegerType()))(F.col(vec_col))
    )


def pq_adc_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    codebooks,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance (ADC) approximate top-k: the query builds
    an m×ksub table of exact subvector L2² distances ONCE
    (driver-side, broadcast as a literal), and every database vector
    scores as the sum of m table lookups on its codes — no float
    vector is read at query time. Scoring is a JVM fold over the code
    array (index order, engine-portable); output is ``(vec_id, adc)``
    ascending by the ROUNDED round-6 distance with id tie-break (the
    q35 oracle protocol). Rows with NULL codes (poison vectors) are
    excluded; empty codebooks (empty/all-poison corpus) yield an
    empty result with the output schema."""
    import numpy as np

    if not codebooks:
        return df.select(
            F.col(id_col), F.lit(0.0).alias("adc")
        ).where(F.lit(False))
    C = np.asarray(codebooks, dtype=np.float64)  # (m, ksub, dsub)
    m_, k_, d_ = C.shape
    q = np.asarray(list(query_vec), dtype=np.float64)
    if q.shape[0] != m_ * d_:
        raise ValueError("query dim mismatch")
    # exact per-subspace L2^2 table — tiny (m*ksub doubles)
    tab = [
        [float(((q[s * d_:(s + 1) * d_] - C[s][c]) ** 2).sum())
         for c in range(k_)]
        for s in range(m_)
    ]
    tab_lit = F.array(*[
        F.array(*[F.lit(x) for x in row]) for row in tab
    ])
    enc = df if "codes" in df.columns else pq_encode(df, codebooks, vec_col)
    adc = F.aggregate(
        F.sequence(F.lit(1), F.lit(m_)),
        F.lit(0.0),
        lambda acc, i: acc
        + F.element_at(
            F.element_at(tab_lit, i),
            F.element_at(F.col("codes"), i) + 1,
        ),
    )
    return (
        enc.where(F.col("codes").isNotNull())
        .select(F.col(id_col), F.round(adc, 6).alias("adc"))
        .orderBy(F.asc("adc"), F.asc(id_col))
        .limit(k)
    )


def int8_quantize(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-vector symmetric int8 quantization of the L2-NORMALIZED
    embedding — the standard 4× memory/bandwidth compression for
    billion-vector search (a 100 TB float32 corpus becomes 25 TB, and
    the scan becomes integer SIMD): ``x̂ = x/‖x‖``, ``scale =
    127/max|x̂_i|``, ``q_i = floor(x̂_i·scale + 0.5)`` (round-half-up
    — engine-portable, unlike banker's rounding). Approximate cosine
    between rows reconstructs as ``dot(q_a, q_b)/(scale_a·scale_b)``
    with the dot product EXACT integer arithmetic.

    All JVM-side higher-order functions — no UDF, stays inside
    whole-stage codegen. Zero vectors get NULL scale (try_divide)
    and NULL codes; downstream filters drop them.

    Returns ``(id, qvec array<int>, scale double)``.
    """
    # Expression shape matters here: a naive qvec =
    # transform(xhat, x*scale) with scale = 127/max|xhat| and
    # xhat = x/nrm re-evaluates the nrm fold PER ELEMENT PER OUTER
    # ELEMENT (HOF lambdas are interpreted — no codegen CSE), an
    # O(dim³)-per-row tree that benched 59s at 60k×64. Flattened:
    # max|x/nrm| = max|x|/nrm, so scale = 127·nrm/max|x| touches only
    # two independent folds, and q_i = floor(x_i·(scale/nrm) + 0.5)
    # keeps one shared scalar subtree per element — O(dim²) worst
    # case, ~1s on the same input. The oracle mirrors this exact
    # shape (q_i arithmetic must stay identical for parity).
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    nrm = F.sqrt(
        F.aggregate(
            F.transform(v, lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    max_raw = F.array_max(F.transform(v, F.abs))
    scale = F.try_divide(F.lit(127.0) * nrm, max_raw)
    qvec = F.when(
        scale.isNotNull(),
        F.transform(
            v,
            lambda x: F.floor(
                F.try_divide(x, nrm) * scale + F.lit(0.5)
            ).cast("int"),
        ),
    )
    return df.select(
        F.col(id_col),
        qvec.alias("qvec"),
        scale.alias("scale"),
    )


def int8_ann_topk(
    quantized: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k by int8-approximated cosine against ``query_vec``: the
    query is quantized by the SAME in-plan expressions (a 1-row frame
    through :func:`int8_quantize`, broadcast), scores are one integer
    dot per row divided by the two scales. Returns ``(id,
    approx_cosine)`` cut on the UNROUNDED score (ties by id)."""
    spark = quantized.sparkSession
    qrow = spark.createDataFrame(
        [(0, [float(x) for x in query_vec])],
        "vec_id long, embedding array<double>",
    )
    qq = int8_quantize(qrow).where(F.col("scale").isNotNull()).select(
        F.col("qvec").alias("_q_qvec"), F.col("scale").alias("_q_scale")
    )
    idot = F.aggregate(
        F.zip_with(
            F.col("qvec"),
            F.col("_q_qvec"),
            lambda a, b: a.cast("long") * b.cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        quantized.where(F.col("scale").isNotNull())
        .crossJoin(F.broadcast(qq))
        .select(
            F.col(id_col),
            F.try_divide(
                idot.cast("double"), F.col("scale") * F.col("_q_scale")
            ).alias("approx_cosine"),
        )
        .orderBy(F.desc("approx_cosine"), F.col(id_col).asc())
        .limit(k)
    )


def mmr_select(
    emb: DataFrame,
    query_vec: Sequence[float],
    pool: int = 20,
    k: int = 5,
    lam: float = 0.75,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Maximal Marginal Relevance (Carbonell/Goldstein 1998): greedily
    pick ``k`` results maximizing ``λ·cos(q,d) − (1−λ)·max_{s∈S}
    cos(d,s)`` — the diversity-aware cut that keeps near-duplicate
    hits from filling a result page (the retrieval-side complement of
    the dedup operators). ``λ`` should make ``1−λ`` float-exact
    (0.75 → 0.25) so the trade-off arithmetic is engine-portable.

    Scale shape: the corpus-wide work is ONE exact top-``pool``
    relevance pass (``TakeOrderedAndProject``); the greedy loop then
    runs on the bounded pool with one bounded argmax collect per step
    (the BPE-train per-round pattern) — selected rows re-enter as a
    broadcast, pairwise sims touch pool×selected ≤ pool·k pairs.
    Deterministic: ties by id, fixed k.

    Returns ``(rank, vec_id, relevance, mmr_score)`` in pick order.
    """
    spark = emb.sparkSession
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    pool_df = (
        emb.select(
            F.col(id_col),
            F.col(vec_col).alias("_v"),
            cosine_sim(F.col(vec_col), q).alias("rel"),
        )
        .where(F.col("rel").isNotNull())
        .orderBy(F.desc("rel"), F.col(id_col).asc())
        .limit(pool)
        .cache()
    )
    picked = []  # (rank, id, rel, mmr) — raw floats; rounding happens
    # IN-PLAN below (F.round is HALF_UP like DuckDB's round; Python's
    # round is half-to-even and would diverge on exact halves)
    for step in range(1, k + 1):
        remaining = pool_df.where(
            ~F.col(id_col).isin([p[1] for p in picked])
            if picked
            else F.lit(True)
        )
        if picked:
            sel = pool_df.where(
                F.col(id_col).isin([p[1] for p in picked])
            ).select(F.col("_v").alias("_sv"))
            scored = (
                remaining.crossJoin(F.broadcast(sel))
                .select(
                    id_col,
                    "rel",
                    cosine_sim(F.col("_v"), F.col("_sv")).alias("_s"),
                )
                .groupBy(id_col, "rel")
                .agg(F.max("_s").alias("_maxsim"))
                .select(
                    id_col,
                    "rel",
                    (
                        F.lit(lam) * F.col("rel")
                        - F.lit(1.0 - lam) * F.col("_maxsim")
                    ).alias("_mmr"),
                )
            )
        else:
            scored = remaining.select(
                id_col, "rel", (F.lit(lam) * F.col("rel")).alias("_mmr")
            )
        top = scored.orderBy(
            F.desc("_mmr"), F.col(id_col).asc()
        ).first()  # bounded: pool-sized frame
        if top is None:
            break
        picked.append((step, top[id_col], top["rel"], top["_mmr"]))
    pool_df.unpersist()  # result below is driver-built; the cached
    # pool would otherwise stay pinned for the whole session
    from pyspark.sql import types as T

    id_type = emb.schema[id_col].dataType
    schema = T.StructType(
        [
            T.StructField("rank", T.LongType()),
            T.StructField(id_col, id_type),
            T.StructField("_rel", T.DoubleType()),
            T.StructField("_mmr", T.DoubleType()),
        ]
    )
    raw = spark.createDataFrame(
        [(r, i, float(rel), float(m)) for r, i, rel, m in picked], schema
    )
    return raw.select(
        "rank",
        id_col,
        F.round("_rel", 6).alias("relevance"),
        F.round("_mmr", 6).alias("mmr_score"),
    )


def hard_negative_pairs(
    df: DataFrame,
    k: int = 16,
    iterations: int = 2,
    lo: float = 0.05,
    hi: float = 0.35,
    per_anchor: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Contrastive hard-negative mining for embedding training: for
    each anchor, the ``per_anchor`` most-similar DIFFERENT-label
    vectors whose cosine lies in the [lo, hi) band — similar enough
    to be informative gradients, below the near-dup band where a
    "negative" is probably a mislabeled positive (the SimCLR/DPR
    hard-negative recipe; the band is the standard false-negative
    guard).

    Scale shape: candidates come only from the anchor's IVF cluster
    (same frozen-seed Lloyd as :func:`semdedup` — one gemm assign
    pass), so the pair join is per-cluster, never corpus x corpus;
    the top-``per_anchor`` cut is a window over each anchor's OWN
    candidate list (bounded by cluster size). The band filter applies
    to the ROUND-6 cosine so any engine reproduces the exact cut.
    Zero-norm poison vectors yield NULL cosine (try_divide) and drop
    at the band filter.

    Output: ``(vec_id, neg_id, sim round-6, rk)`` with
    rk = 1..per_anchor ordered by (sim desc, neg_id).
    """
    from pyspark.sql import Window

    cents = ivf_centroids(df, k=k, iterations=iterations,
                          vec_col=vec_col, id_col=id_col)
    # bucket -1 is ivf_assign's poison list (NULL / wrong-dimension
    # vectors): excluded here, otherwise corrupt rows of matching
    # length would mine each other as "hard negatives".
    assigned = (
        ivf_assign(df, cents, vec_col=vec_col)
        .where(F.col("bucket") >= 0)
        .select(F.col(id_col), F.col(vec_col), F.col(label_col), "bucket")
    )
    a = assigned.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("_va"),
        F.col(label_col).alias("_la"),
        "bucket",
    )
    b = assigned.select(
        F.col(id_col).alias("neg_id"),
        F.col(vec_col).alias("_vb"),
        F.col(label_col).alias("_lb"),
        "bucket",
    )
    sims = (
        a.join(b, "bucket")
        .where(
            (F.col("vec_id") != F.col("neg_id"))
            & (F.col("_la") != F.col("_lb"))
        )
        .select(
            "vec_id",
            "neg_id",
            F.round(cosine_sim(F.col("_va"), F.col("_vb")), 6).alias(
                "sim"
            ),
        )
        .where(
            F.col("sim").isNotNull()
            & (F.col("sim") >= lo)
            & (F.col("sim") < hi)
        )
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("sim"), F.col("neg_id")
    )
    return (
        sims.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= per_anchor)
        .select("vec_id", "neg_id", "sim", F.col("rk").cast("int"))
    )
