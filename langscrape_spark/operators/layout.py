"""Z-order (Morton) data layout for multi-dimension scan pruning.

At 100 TB the cheapest query is the one that never reads the file:
parquet/Iceberg readers prune whole files from min/max column stats,
but stats only help if the WRITE ORDER clusters each file into a small
rectangle of the filtered dimensions. Sorting by one column gives
perfect pruning on it and none on the second; interleaving the bits of
both bucketized dimensions (the Morton / Z-order curve) gives
near-square rectangles on BOTH — the standard layout trick behind
Delta/Iceberg ``ZORDER BY``.

This module computes the z-value in-plan (pure integer bit arithmetic,
whole-stage codegen, no UDF) and reports the per-file bounding
rectangles a writer partitioned on z-ranges would produce — the
pruning-quality audit. The bucket bounds come from a 1-row aggregate
broadcast back via crossJoin (no driver collect), so the operator is
one scan + one tiny shuffle regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def morton_col(xb: Column, yb: Column, bits: int) -> Column:
    """Interleave the low ``bits`` bits of two bucket ids: x gets the
    even output bits, y the odd. Literal shifts only (Spark's
    shiftleft/shiftright take literal distances)."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + (
            F.shiftright(xb, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i))
            + F.shiftright(yb, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1))
        )
    return z


def morton_sql(xb_expr: str, yb_expr: str, bits: int) -> str:
    """The DuckDB twin of :func:`morton_col` as a SQL expression."""
    terms = []
    for i in range(bits):
        terms.append(f"((({xb_expr}) >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"((({yb_expr}) >> {i}) & 1) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"


def _bucket(x: Column, lo: Column, hi: Column, m: int) -> Column:
    """Equal-width bucket of ``x`` into [0, m) over the [lo, hi] range;
    degenerate range (hi == lo) maps everything to bucket 0. The
    formula is written so the DuckDB oracle can repeat it op-for-op
    (IEEE doubles agree when the expression tree agrees)."""
    raw = F.floor(
        F.try_divide((x - lo) * F.lit(float(m)), hi - lo)
    )
    return F.least(
        F.greatest(F.coalesce(raw, F.lit(0)).cast("long"), F.lit(0)),
        F.lit(m - 1),
    )


def zorder_file_stats(
    df: DataFrame,
    x_col: Column,
    y_col: Column,
    bits: int = 8,
    files: int = 16,
) -> DataFrame:
    """Audit the file layout a z-order writer would produce.

    Buckets both dimensions into ``2**bits`` equal-width cells over
    their observed min/max, interleaves to the z-value, assigns each
    row to one of ``files`` equal-width z-ranges (``files`` must be a
    power of two dividing ``4**bits``), and reports each file's row
    count and bucket-space bounding rectangle — small rectangles mean
    min/max stats prune scans on EITHER dimension.
    Output: ``file_id, n_rows, xb_min, xb_max, yb_min, yb_max``.
    """
    return _curve_file_stats(
        df, x_col, y_col, bits, files,
        lambda xb, yb: morton_col(xb, yb, bits),
    )


def _curve_file_stats(df, x_col, y_col, bits, files, curve):
    """Shared scaffold of the space-filling-curve layout audits
    (Z-order and Hilbert): equal-width 2**bits bucketing over the
    observed min/max (1-row broadcast range, no driver collect),
    ``curve(xb, yb)`` -> curve value, equal-width curve-range file
    assignment, per-file counts + bounding rectangles. ONE definition
    so bucketing/validation fixes cannot diverge between curves."""
    m = 1 << bits
    if files <= 0 or files & (files - 1) or files > m * m:
        raise ValueError("files must be a power of two <= 4**bits")
    d = df.select(
        x_col.cast("double").alias("_x"), y_col.cast("double").alias("_y")
    ).where(F.col("_x").isNotNull() & F.col("_y").isNotNull())
    rng = d.agg(
        F.min("_x").alias("_xlo"),
        F.max("_x").alias("_xhi"),
        F.min("_y").alias("_ylo"),
        F.max("_y").alias("_yhi"),
    )
    b = d.crossJoin(F.broadcast(rng)).select(
        _bucket(F.col("_x"), F.col("_xlo"), F.col("_xhi"), m).alias("xb"),
        _bucket(F.col("_y"), F.col("_ylo"), F.col("_yhi"), m).alias("yb"),
    )
    z = b.withColumn("_cv", curve(F.col("xb"), F.col("yb")))
    per_file = m * m // files
    return (
        z.withColumn(
            "file_id", F.floor(F.col("_cv") / F.lit(per_file)).cast("long")
        )
        .groupBy("file_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("xb").alias("xb_min"),
            F.max("xb").alias("xb_max"),
            F.min("yb").alias("yb_min"),
            F.max("yb").alias("yb_max"),
        )
    )


def partition_skew_audit(
    df: DataFrame,
    key_col: str,
    n_partitions: int = 32,
    label: str = "key",
) -> DataFrame:
    """Shuffle-partition skew audit — the question every join/groupBy
    key must answer BEFORE it ships at 100 TB: how evenly does this
    key hash across P reducers, and is there a hot bucket that needs
    salting? (The politeness scheduler already salts hosts; this is
    the generic pre-flight for any new key.)

    Buckets via ``pmod(md5_lower64(key), P)`` with P a power of two —
    the repo's engine-portable hash stack (DuckDB
    ``md5_number_lower % P``), deliberately NOT Spark's Murmur3 (the
    audit measures key-distribution shape, which any uniform hash
    exposes identically; md5 keeps the oracle exact). Empty buckets
    COUNT: the frame densifies over range(P), so skew = max/avg is
    against P reducers, not the used ones. The hot bucket is
    deterministic (max rows, min bucket id via a combined integer
    score — P·n + (P−1−bucket), unique per bucket so no tie
    ambiguity).

    Output (one row): ``(key, n_partitions, total_rows, n_empty,
    max_rows, hot_bucket, skew)`` with skew = max_rows·P/total
    round-6 (1.0 = perfectly even; NULL for an empty frame).
    """
    from .dedup import _md5_lower64

    P = int(n_partitions)
    if P & (P - 1) or P <= 0:
        raise ValueError(f"n_partitions must be a power of 2, got {P}")
    spark = df.sparkSession
    # NULL keys co-locate on ONE reducer in a real shuffle — the
    # classic skew cause — so they must count here too: coalesce to a
    # sentinel, never drop (a NULL md5 would vanish in the densify
    # join and the audit would miss exactly the hot-key case)
    b = df.select(
        F.pmod(
            _md5_lower64(
                F.coalesce(
                    F.col(key_col).cast("string"), F.lit("<NULL-KEY>")
                )
            ),
            F.lit(P),
        ).alias("bucket")
    )
    counts = b.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    dense = (
        spark.range(P)
        .select(F.col("id").alias("bucket"))
        .join(counts, "bucket", "left")
        .select("bucket", F.coalesce("n", F.lit(0)).alias("n"))
    )
    score = F.col("n") * P + (P - 1 - F.col("bucket"))
    agg = dense.agg(
        F.sum("n").cast("long").alias("total_rows"),
        F.sum((F.col("n") == 0).cast("int")).cast("long").alias("n_empty"),
        F.max("n").cast("long").alias("max_rows"),
        F.max_by(F.col("bucket"), score).cast("long").alias("hot_bucket"),
    )
    return agg.select(
        F.lit(label).alias("key"),
        F.lit(P).cast("long").alias("n_partitions"),
        "total_rows",
        "n_empty",
        "max_rows",
        "hot_bucket",
        F.round(
            F.try_divide(
                (F.col("max_rows") * P).cast("double"),
                F.col("total_rows").cast("double"),
            ),
            6,
        ).alias("skew"),
    )


def rendezvous_assign(
    df: DataFrame,
    n_workers: int,
    key_col: str = "host",
    salt: str = "w",
) -> DataFrame:
    """Rendezvous (highest-random-weight) assignment of keys to
    workers — how a frontier shards hosts across fetcher nodes so a
    RESIZE moves only ~1/(W+1) of the keys, where the naive
    ``pmod(hash, W)`` remap moves ~W/(W+1) (i.e. nearly everything:
    every moved host re-warms robots caches, politeness state and
    connection pools). Worker w's score for key k is
    ``md5(salt:w:key)``; the key goes to the argmax — no ring, no
    vnodes, no wrap-around corner case, and per-key independence
    makes the whole thing one broadcast crossJoin + min window.

    Engine-portable: scores are the repo's md5-lower64; the argmax
    orders by the UNSIGNED 64-bit value — Spark holds it in a signed
    long, so the sign bit is flipped (``x XOR Long.MIN``: the classic
    signed-comparator-for-unsigned trick) to match DuckDB's UBIGINT
    ``md5_number_lower`` order exactly; worker id breaks the (2⁻⁶⁴)
    tie. Worker count is a dimension (≤ thousands of fetchers), keys
    are the corpus side; the per-key window partitions by key.

    Output: ``(key, worker)`` with worker in ``[0, n_workers)``.
    """
    from pyspark.sql import Window

    from .dedup import _md5_lower64

    spark = df.sparkSession
    w = spark.range(int(n_workers)).select(
        F.col("id").cast("int").alias("_w")
    )
    keyed = df.select(F.col(key_col).alias("key")).where(
        F.col("key").isNotNull()
    ).distinct()
    sx = _md5_lower64(
        F.concat_ws(":", F.lit(salt), F.col("_w"), F.col("key"))
    ).bitwiseXOR(F.lit(-(1 << 63)))
    scored = keyed.crossJoin(F.broadcast(w)).select(
        "key", "_w", sx.alias("_s")
    )
    win = Window.partitionBy("key").orderBy(F.desc("_s"), "_w")
    return (
        scored.withColumn("_rn", F.row_number().over(win))
        .where(F.col("_rn") == 1)
        .select("key", F.col("_w").alias("worker"))
    )


def ring_assign(
    df: DataFrame,
    shards: "list[str]",
    vnodes: int = 16,
    key_col: str = "host",
    salt: str = "ring",
) -> DataFrame:
    """Consistent-hash RING assignment with virtual nodes — the other
    classic resize-stable sharding scheme next to
    :func:`rendezvous_assign` (Karger et al. 1997; memcached/Dynamo
    lineage). Each shard owns ``vnodes`` ring positions
    ``h(salt:shard#i)``; a key goes to the first vnode clockwise from
    its own hash (wrapping to the ring minimum). Versus rendezvous:
    O(log V) / O(V) lookup against a STATIC ring instead of W scores
    per key, at the cost of vnode-count-dependent load variance —
    which is why both live here; the churn query (q181) measures the
    trade empirically.

    Engine-portable ordering: all positions are the md5-lower64
    masked to 53 bits (non-negative in a signed long, identical to
    DuckDB's ``md5_number_lower % 2^53`` — the q160 uniform's mask),
    so no sign-flip trick is needed. The ring is a BROADCAST-LITERAL
    sorted array scanned with one higher-order ``filter`` per key —
    pure codegen, no join, no shuffle: |shards|·vnodes is a few
    thousand entries, and the scan is the whole lookup cost. (A real
    10^4-shard ring would binary-search; the linear HOF scan is the
    Spark-expressible form and vnode counts here keep it cheap —
    documented trade.)

    Output: input columns + ``ring_h`` (the key's ring position) +
    ``shard``. Empty ``shards`` raises.
    """
    import hashlib

    from .dedup import _md5_lower64

    if not shards:
        raise ValueError("shards must be non-empty")
    mask = (1 << 53) - 1

    def h53(s: str) -> int:
        d = hashlib.md5(s.encode()).digest()
        return int.from_bytes(d[8:16], "little") & mask

    ring = sorted(
        (h53(f"{salt}:{s}#{i}"), s)
        for s in shards
        for i in range(vnodes)
    )
    pos_arr = F.array(*[F.lit(p) for p, _ in ring])
    shard_arr = F.array(*[F.lit(s) for _, s in ring])
    kh = _md5_lower64(
        F.concat(F.lit(salt + ":"), F.col(key_col).cast("string"))
    ).bitwiseAND(F.lit(mask))
    ge = F.filter(pos_arr, lambda p: p >= F.col("ring_h"))
    chosen_pos = F.when(F.size(ge) > 0, F.element_at(ge, 1)).otherwise(
        F.element_at(pos_arr, 1)
    )
    idx = F.array_position(pos_arr, chosen_pos)
    return (
        df.withColumn("ring_h", kh)
        .withColumn("shard", F.element_at(shard_arr, idx.cast("int")))
    )


def range_partition_audit(
    df: DataFrame,
    key_col: str,
    n_parts: int,
    sample_mod: int = 7,
) -> DataFrame:
    """Sample-based range-partitioner boundary selection + exact
    balance audit — the mechanism behind Spark's own
    ``RangePartitioner``/global sort (reservoir-sample boundaries,
    then range assignment), made DETERMINISTIC and auditable: the
    sample is the md5-hash systematic sample ``md5_64(key) pmod
    sample_mod == 0`` (no RNG, any engine re-derives it), the
    ``n_parts - 1`` boundaries are exact rank picks from the sorted
    sample (rank ``ceil(i * n_sample / n_parts)``), and every corpus
    row is then assigned ``part = #boundaries < key`` (strictly-less,
    ties right) so the TRUE per-partition counts and the skew ratio
    (max/ideal) are exact.

    Scale shape: the sample is |corpus|/sample_mod rows and ONLY the
    sample is sorted (one window over the sample — at production
    scale pick sample_mod so the sample fits one partition
    comfortably, e.g. 1e-4 of 10^10 urls = 10^6 rows; the boundary
    frame itself is n_parts-1 rows, broadcast); the corpus-side
    assignment is a broadcast join + one aggregate, no global sort
    ever touches the full data. This is the pre-flight you run
    BEFORE committing a sort/bucket layout: a skew ratio far above
    1.0 means the key is too clumped for even ranges and needs
    salting or a different layout key.

    Output: one row per partition id ``(part, n_rows)`` plus
    ``skew`` (max/ideal, round-6) replicated on each row for
    single-frame consumption.
    """
    from pyspark.sql import Window

    from .dedup import _md5_lower64

    if n_parts < 1:
        raise ValueError("n_parts must be >= 1")
    # The key keeps its NATIVE type: boundaries, the sample sort and
    # the strictly-less assignment all use the column's own ordering
    # (a numeric key audited lexicographically would describe a
    # layout nobody builds). Only the md5 SAMPLE hash stringifies.
    src = df.select(F.col(key_col).alias("_k")).where(
        F.col("_k").isNotNull()
    )
    if n_parts == 1:
        # One partition: no boundaries, no sample — exact by
        # definition (and Spark's sequence(1, 0) would DESCEND, not
        # be empty, planting a spurious boundary).
        return src.agg(F.count(F.lit(1)).alias("n_rows")).select(
            F.lit(0).alias("part"),
            "n_rows",
            F.lit(1.0).alias("skew"),
        )
    # 63-bit mask BEFORE the modulus: an unsigned engine (DuckDB's
    # md5_number_lower) and Spark's signed pmod only agree on the
    # masked value (2^64 % m != 0 for general m).
    samp = src.where(
        F.pmod(
            _md5_lower64(F.col("_k").cast("string")).bitwiseAND(
                F.lit(0x7FFFFFFFFFFFFFFF)
            ),
            F.lit(sample_mod),
        )
        == 0
    )
    w = Window.orderBy("_k")
    ranked = samp.select(
        "_k", F.row_number().over(w).alias("_rn")
    )
    n_s = ranked.agg(F.max("_rn").alias("_n"))
    # boundary i (1..n_parts-1) = sample value at rank
    # ceil(i * n_sample / n_parts); duplicates collapse (a boundary
    # may repeat when the sample is clumped — assignment still
    # well-defined via the strict < count).
    bounds = (
        ranked.crossJoin(F.broadcast(n_s))
        .where(
            F.expr(
                f"array_contains(transform(sequence(1, {n_parts - 1}), "
                f"i -> cast(ceil(i * _n / {n_parts}) as int)), _rn)"
            )
        )
        .select(F.col("_k").alias("_b"))
        .distinct()
    )
    blist = bounds.agg(
        F.array_sort(F.collect_list("_b")).alias("_bs")
    )
    assigned = src.crossJoin(F.broadcast(blist)).select(
        F.size(F.filter(F.col("_bs"), lambda b: b < F.col("_k"))).alias(
            "part"
        )
    )
    counts = assigned.groupBy("part").agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    total = counts.agg(
        F.sum("n_rows").alias("_tot"), F.max("n_rows").alias("_mx")
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "part",
            "n_rows",
            F.round(
                F.col("_mx") * F.lit(n_parts) / F.col("_tot"), 6
            ).alias("skew"),
        )
        .orderBy("part")
    )


def hilbert_file_stats(
    df: DataFrame,
    x_col: Column,
    y_col: Column,
    bits: int = 8,
    files: int = 16,
) -> DataFrame:
    """Hilbert-curve twin of :func:`zorder_file_stats`: same
    equal-width bucketing, but rows order along the Hilbert
    space-filling curve instead of Morton — adjacent curve positions
    are ALWAYS adjacent cells (the Hilbert curve has no Morton
    "seams" where the curve jumps across the plane), so file
    bounding rectangles are tighter and min/max scan pruning
    sharper; this is the layout question Databricks' liquid
    clustering and modern Iceberg writers answer with Hilbert by
    default.

    The xy -> d transform is the classic bit-iteration with quadrant
    rotation (Wikipedia's ``xy2d``), vectorized in ONE Arrow-batched
    numpy pass (the expression-tree form would double per bit level
    under projection collapse; 8 levels of numpy where() is flat) —
    exact integer arithmetic, reproduced op-for-op by the unrolled
    CTE chain :func:`hilbert_sql_chain` builds for the oracle.

    Output matches zorder_file_stats:
    ``file_id, n_rows, xb_min, xb_max, yb_min, yb_max``.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    def _h(xb, yb):
        import numpy as np

        x = xb.to_numpy(dtype=np.int64).copy()
        y = yb.to_numpy(dtype=np.int64).copy()
        d = np.zeros(len(x), dtype=np.int64)
        for i in range(bits - 1, -1, -1):
            s = 1 << i
            rx = (x >> i) & 1
            ry = (y >> i) & 1
            d += (s * s) * ((3 * rx) ^ ry)
            swap = ry == 0
            flip = swap & (rx == 1)
            nx = np.where(swap, np.where(flip, s - 1 - y, y), x)
            ny = np.where(swap, np.where(flip, s - 1 - x, x), y)
            x, y = nx, ny
        return pd.Series(d)

    hud = pandas_udf(_h, LongType())
    return _curve_file_stats(
        df, x_col, y_col, bits, files, lambda xb, yb: hud(xb, yb)
    )


def hilbert_sql_chain(src_cte: str, bits: int) -> tuple:
    """DuckDB twin of the Hilbert xy2d transform as an unrolled CTE
    chain (one CTE per bit level — linear SQL growth, vs the
    exponential expression-tree a single nested CASE would need).
    ``src_cte`` must provide columns ``xb, yb``; returns
    ``(ctes_sql, final_cte)`` where the final CTE carries
    ``(xb, yb, hval)``. Every reference is table-qualified so
    DuckDB's lateral column aliasing cannot bind the NEW hx/hy into
    the same SELECT's other expressions."""
    parts = [
        f"hh{bits} AS (SELECT xb, yb, CAST(xb AS BIGINT) AS hx,"
        f" CAST(yb AS BIGINT) AS hy, CAST(0 AS BIGINT) AS hd"
        f" FROM {src_cte})"
    ]
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        rx = f"((t.hx >> {i}) & 1)"
        ry = f"((t.hy >> {i}) & 1)"
        parts.append(
            f"hh{i} AS (SELECT t.xb, t.yb,"
            f" CASE WHEN {ry} = 1 THEN t.hx"
            f" WHEN {rx} = 0 THEN t.hy"
            f" ELSE {s - 1} - t.hy END AS hx,"
            f" CASE WHEN {ry} = 1 THEN t.hy"
            f" WHEN {rx} = 0 THEN t.hx"
            f" ELSE {s - 1} - t.hx END AS hy,"
            f" t.hd + {s * s} * xor(3 * {rx}, {ry}) AS hd"
            f" FROM hh{i + 1} t)"
        )
    final = (
        f"hfin AS (SELECT xb, yb, hd AS hval FROM hh0)"
    )
    parts.append(final)
    return ",\n".join(parts), "hfin"
