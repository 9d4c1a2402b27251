"""Deterministic Lloyd k-means over embedding columns — the corpus
topic-bucketing / curriculum-mixing primitive (and the training loop
behind q35's IVF coarse quantizer, here exposed as an operator whose
every iteration is oracle-checkable).

Cross-engine exactness is designed in, not hoped for:

* Points are quantized to an integer grid (``floor(x · scale)`` —
  floor, not round, so there is no half-way-tie ambiguity between
  engines). Per-cluster centroid SUMS are then exact integers —
  immune to float summation order, the usual reason iterative ML
  cannot be hash-compared.
* Centroid means are one exact-integer / count IEEE division; the
  only float fold is the 64-term squared-distance sum, whose ulp
  wobble is absorbed by comparing ROUND-6 distances (magnitude ≤
  ~64, so 1e-6 is far above 1-ulp noise) with cluster id as the
  tie-break — the same convention the ANN/pagerank oracles use.
* Init is the k smallest ids' points; every step is a pure function
  of the table.

Scale shape: each iteration is ONE scan of the points — the k
centroids ride in as literals (nothing is broadcast-joined, nothing
shuffles for assignment) and the update is a map-side-combinable
(cluster, dim) integer sum. Driver state is k·dim scalars per
iteration (bounded by parameters, not data) — the per-round bounded
collect doubles as the loop's materialization point, the same shape
as the BPE trainer. At 100 TB you'd raise k and dims, not the
pattern.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F


def _quantize(vec_col: str, scale: int):
    return F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(float(scale))).cast(
            "long"
        ),
    )


def kmeans_lloyd(
    points: DataFrame,
    k: int = 4,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """Lloyd k-means on the quantized grid: ``iterations`` rounds of
    (assign, exact-integer centroid update), then one final
    assignment. Returns ``(id, cluster, dist)`` with ``dist`` the
    round-6 squared distance in ORIGINAL units. Empty clusters keep
    their previous centroid (mirrored by the oracle)."""
    pts = points.select(
        F.col(id_col).alias("vec_id"), _quantize(vec_col, scale).alias("q")
    ).persist()
    init = pts.orderBy("vec_id").limit(k).collect()
    if len(init) < k:
        raise ValueError(f"need at least k={k} points, got {len(init)}")
    dim = len(init[0]["q"])
    # centroid means in ORIGINAL units' quantized grid (doubles)
    centroids = [[float(v) for v in row["q"]] for row in init]

    def _best(cents):
        structs = []
        for cid, m in enumerate(cents):
            marr = F.array(*[F.lit(v) for v in m])
            d = F.aggregate(
                F.zip_with(
                    F.col("q"),
                    marr,
                    lambda a, b: ((a - b) / F.lit(float(scale)))
                    * ((a - b) / F.lit(float(scale))),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            structs.append(
                F.struct(
                    F.round(d, 6).alias("d"), F.lit(cid).alias("c")
                )
            )
        return F.array_min(F.array(*structs))

    for _ in range(iterations):
        assigned = pts.withColumn("_b", _best(centroids)).select(
            "vec_id", "q", F.col("_b.c").alias("cluster")
        )
        sums = (
            assigned.select(
                "cluster", F.posexplode("q").alias("dim", "v")
            )
            .groupBy("cluster", "dim")
            .agg(
                F.sum("v").alias("s"),
                F.count(F.lit(1)).alias("c"),
            )
            .collect()
        )
        by_cluster: dict = {}
        for r in sums:
            by_cluster.setdefault(r["cluster"], {})[r["dim"]] = (
                int(r["s"]),
                int(r["c"]),
            )
        new = []
        for cid in range(k):
            dims = by_cluster.get(cid)
            if dims is None:  # empty cluster keeps its centroid
                new.append(centroids[cid])
            else:
                new.append([dims[i][0] / dims[i][1] for i in range(dim)])
        centroids = new

    out = pts.withColumn("_b", _best(centroids)).select(
        "vec_id",
        F.col("_b.c").cast("int").alias("cluster"),
        F.col("_b.d").alias("dist"),
    )
    pts.unpersist()
    return out


def kmeans_oracle_sql(
    points_sql: str,
    k: int = 4,
    iterations: int = 2,
    scale: int = 1000,
    dim: int = 64,
) -> str:
    """DuckDB twin of :func:`kmeans_lloyd`, unrolled as chained
    MATERIALIZED CTEs (the iterative-graph oracle recipe): the same
    floor-quantization, the same k-smallest-ids init, per-iteration
    argmin on round-6 distances with cid tie-break, exact HUGEINT
    centroid sums divided once, empty clusters coalescing to the
    previous centroid. ``points_sql`` must yield (vec_id, embedding).
    """
    dist = (
        "list_sum(list_transform(range(1, {d1}), i ->"
        " ((q[i] - m[i]) / {s}.0) * ((q[i] - m[i]) / {s}.0)))"
    ).format(d1=dim + 1, s=scale)
    parts = [
        f"""WITH pts AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * {scale}) AS BIGINT)) AS q
  FROM ({points_sql})),
c0 AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
         list_transform(q, x -> CAST(x AS DOUBLE)) AS m
  FROM (SELECT vec_id, q FROM pts ORDER BY vec_id LIMIT {k}))"""
    ]
    for it in range(iterations):
        parts.append(
            f"""a{it} AS MATERIALIZED (
  SELECT vec_id, cid AS cluster FROM (
    SELECT p.vec_id, c.cid,
           row_number() OVER (PARTITION BY p.vec_id
             ORDER BY round({dist}, 6), c.cid) AS rn
    FROM pts p CROSS JOIN c{it} c)
  WHERE rn = 1),
s{it} AS MATERIALIZED (
  SELECT cluster AS cid,
         list(CAST(s AS DOUBLE) / c ORDER BY dim) AS m
  FROM (
    SELECT a.cluster, u.i AS dim,
           CAST(sum(p.q[u.i]) AS BIGINT) AS s,
           count(*) AS c
    FROM a{it} a JOIN pts p USING (vec_id),
         range(1, {dim + 1}) u(i)
    GROUP BY a.cluster, u.i) sums
  GROUP BY cluster),
c{it + 1} AS MATERIALIZED (
  SELECT c{it}.cid, coalesce(s{it}.m, c{it}.m) AS m
  FROM c{it} LEFT JOIN s{it} ON c{it}.cid = s{it}.cid)"""
        )
    final = f"""SELECT vec_id, CAST(cid AS INT) AS cluster,
       round({dist}, 6) AS dist
FROM (
  SELECT p.vec_id, c.cid, p.q, c.m,
         row_number() OVER (PARTITION BY p.vec_id
           ORDER BY round({dist}, 6), c.cid) AS rn
  FROM pts p CROSS JOIN c{iterations} c)
WHERE rn = 1
ORDER BY vec_id"""
    return ",\n".join(parts) + "\n" + final

