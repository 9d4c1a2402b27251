"""Ranking / sampling operators (SURVEY.md §2.6-2.8).

Spark restatements of the reference's pandas groupby patterns:
- top-1/top-k per group (best-xpath-per-field,
  ``/root/reference/feilian/agents/fragments_agent.py:224-229``);
- stratified group sampling
  (``/root/reference/feilian/datasets/dataset.py:98-135``) made
  deterministic by ordering on md5(id) instead of a seeded RNG — the
  distributed-reproducible equivalent of ``random_state=42``;
- binned aggregates (``feilian/statistical_analysis.py:55-79``);
- percentile describes (``feilian/statistical_analysis.py:546-554``).
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int = 1,
    rank_col: str = "rn",
) -> DataFrame:
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
        .drop(rank_col)
    )


def stratified_sample(
    df: DataFrame, group_cols: Sequence[str], id_col: str, n: int
) -> DataFrame:
    """n rows per group, chosen by md5(id) order — deterministic across
    engines and partitionings (the seeded-sample analogue)."""
    w = Window.partitionBy(*group_cols).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n)
        .drop("_rn")
    )


def binned_avg(
    df: DataFrame, bin_col: str, bin_width: float, value_cols: Sequence[str]
) -> DataFrame:
    """``x // w * w`` binning + per-bin means."""
    b = (F.floor(F.col(bin_col) / bin_width) * bin_width).alias("bin")
    aggs = [F.avg(c).alias(f"avg_{c}") for c in value_cols]
    return df.groupBy(b).agg(*aggs)


def percentile_describe(
    df: DataFrame, group_cols: Sequence[str], value_col: str,
    percentiles: Sequence[float] = (0.05, 0.5, 0.95),
) -> DataFrame:
    """Exact interpolated percentiles per group (matches SQL
    ``quantile_cont``); plus count/mean."""
    return df.groupBy(*group_cols).agg(
        F.count(value_col).alias("n"),
        F.round(F.avg(value_col), 6).alias("mean"),
        *[
            F.round(
                F.expr(f"percentile({value_col}, {p})"), 6
            ).alias(f"p{int(p * 100):02d}")
            for p in percentiles
        ],
    )


def spearman_rho(
    df: DataFrame,
    x_col: str,
    y_col: str,
    id_col: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Spearman rank correlation between two ranking signals — the
    crawl-ops agreement audit (does OPIC order hosts the way PageRank
    does? did the quality re-score shuffle the curation order?): a
    monotone-agreement measure that ignores each signal's scale.

    EXACT-integer form: ranks are ``row_number`` over ``(value, id)``
    — a deterministic PERMUTATION (ties broken by the id column, the
    repo's rank convention; for heavily-tied data read the tie-break
    as part of the metric's definition), so ``d = rx − ry`` and
    ``Σd²`` are integers and ``ρ = 1 − 6Σd²/(n³−n)`` is one IEEE
    division of two exact integers — no float summation order
    anywhere. n³ caps the integer range: n per group must stay under
    ~2M rows for BIGINT (signal frames are host-/source-sized; at
    corpus scale rank-bucket first).

    NULL in either signal drops the row (both ranks must exist).
    Output: ``(*group_cols, n, sum_d2, rho)``; groups with n < 2 get
    NULL rho (no variance to correlate).
    """
    g = list(group_cols)
    idc = id_col
    base = df.where(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    )
    wx = Window.partitionBy(*g).orderBy(x_col, idc)
    wy = Window.partitionBy(*g).orderBy(y_col, idc)
    ranked = base.select(
        *g,
        # long from the start: int32 (rx-ry)^2 would overflow at
        # ~46k-row groups under ANSI, far below the documented range
        F.row_number().over(wx).cast("long").alias("rx"),
        F.row_number().over(wy).cast("long").alias("ry"),
    )
    d2 = (F.col("rx") - F.col("ry")) * (F.col("rx") - F.col("ry"))
    agg = ranked.groupBy(*g).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d2).cast("long").alias("sum_d2"),
    )
    n = F.col("n").cast("long")
    return agg.select(
        *g,
        n.alias("n"),
        "sum_d2",
        F.round(
            F.lit(1.0)
            - F.try_divide(
                (6 * F.col("sum_d2")).cast("double"),
                (n * n * n - n).cast("double"),
            ),
            6,
        ).alias("rho"),
    )


def aes_key_cols(id_col: Column, weight_col: Column, salt: str = ""):
    """Engine-portable Efraimidis–Spirakis sampling key, split into
    exact integer parts: ``(lq, w)`` where ``lq = floor(-ln(u)·1e6 +
    0.5)`` (micro-unit quantized, the q152 log convention) and ``u``
    is a bit-exact uniform in (0, 1] from the lower 53 bits of
    ``md5(id || ':' || salt)`` (53 bits + the +1/2^53 offset make
    ``u`` an exactly representable double in BOTH engines — DuckDB:
    ``(md5_number_lower(..) % 2^53 + 1) / 2^53``). The A-ES order
    "largest u^(1/w) first" is equivalently "smallest -ln(u)/w
    first"; ``lq / w`` divides two identical integers, and IEEE
    division is correctly rounded, so the double sort key is
    bit-identical across engines — only the ln() micro-quantization
    is approximate (1-ulp libm drift can flip a half-integer
    rounding; the same accepted boundary as every micro-unit log
    path here)."""
    m = _md5_lower64_rank(
        F.concat(id_col.cast("string"), F.lit(":" + salt))
    ).bitwiseAND(F.lit((1 << 53) - 1))
    u = (m + F.lit(1)).cast("double") / F.lit(float(1 << 53))
    lq = F.floor(-F.log(u) * F.lit(1e6) + F.lit(0.5)).cast("long")
    return lq, weight_col.cast("long")


def _md5_lower64_rank(s: Column) -> Column:
    from .dedup import _md5_lower64

    return _md5_lower64(s)


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    group_cols: Sequence[str] = (),
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k rows (per group if
    ``group_cols``), inclusion odds proportional to ``weight_col`` —
    Efraimidis & Spirakis (2006) A-ES, the one-pass mergeable form
    every training-data mixture sampler needs (sample documents
    proportional to token count / quality weight when a source's
    budget is capped). Deterministic: the uniform comes from
    ``md5(id)``, so the sample is reproducible across engines,
    partitionings and reruns — vary ``salt`` to draw an independent
    sample (the distributed ``random_state=42`` convention of
    :func:`stratified_sample`, weighted).

    Rows with NULL or non-positive weight are excluded (selection
    probability 0). Returns the winning rows with their exact integer
    key parts ``(lq, w)`` and display key ``aes_key`` (round-6
    ``lq/w``); selection orders by the UNROUNDED division (bit-exact,
    see :func:`aes_key_cols`), ties by id.

    Scale shape: one projection computes the key; grouped mode is a
    ``row_number`` window that plans as WindowGroupLimit (per-group
    top-k with map-side partial limits, q01's shape); global mode is
    ``orderBy().limit()`` — TakeOrderedAndProject, never a single
    sorted partition. A-ES keys are mergeable by construction (the
    top-k of a union is the top-k of per-partition top-ks), which is
    exactly what those two plans exploit."""
    w = F.col(weight_col)
    lq, wl = aes_key_cols(F.col(id_col), w, salt)
    scored = (
        df.where(w.isNotNull() & (w > 0))
        .withColumn("_lq", lq)
        .withColumn("_w", wl)
        .withColumn("_key", F.col("_lq").cast("double") / F.col("_w"))
    )
    if group_cols:
        win = Window.partitionBy(*group_cols).orderBy(
            F.col("_key").asc(), F.col(id_col).asc()
        )
        picked = (
            scored.withColumn("_rn", F.row_number().over(win))
            .where(F.col("_rn") <= k)
            .drop("_rn")
        )
    else:
        picked = scored.orderBy(
            F.col("_key").asc(), F.col(id_col).asc()
        ).limit(k)
    return (
        picked.withColumn("aes_key", F.round(F.col("_key"), 6))
        .withColumnRenamed("_lq", "lq")
        .withColumnRenamed("_w", "w")
        .drop("_key")
    )


def poisson_sample_ht(
    df: DataFrame,
    p_micro_col: str,
    value_col: str,
    group_cols: Sequence[str] = (),
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic Poisson sampling + Horvitz–Thompson totals: the
    "estimate corpus statistics from a cheap sample" primitive a
    100 TB pipeline runs instead of full scans (per-source token
    totals, quality-gate pass mass) — each row enters the sample
    independently with its OWN inclusion probability, and the HT
    estimator Σ v_i/p_i over the sample is unbiased for Σ v_i.

    ``p_micro_col``: integer inclusion probability in micro-units
    (0..1_000_000), computed by the caller with integer arithmetic so
    it is identical cross-engine (e.g. ``least(1e6, n_chars * 300)``
    — longer docs sampled harder, the classic PPS design). Rows with
    ``p_micro <= 0`` can never be sampled and are excluded from the
    estimand (callers wanting unbiasedness must keep p positive).
    ``value_col``: integer value whose group total is estimated.

    Engine-exact by construction: the uniform is the 53-bit md5 draw
    (:func:`aes_key_cols` convention), the inclusion gate compares
    ``u <= p_micro/1e6`` (one correctly-rounded IEEE division), and
    each sampled contribution ``v·1e6/p`` is quantized to an exact
    integer — ``(v * 10^12) div p_micro`` — before the LONG sum, so
    no float accumulation order can drift. v up to ~10^6 stays well
    inside 63 bits.

    Scale shape: one projection (hash, gate) + one hash agg — a scan
    with map-side combine, no shuffle beyond the group rollup.
    Returns ``(group_cols…, n_sampled, ht_total_micro)``;
    ``ht_total_micro / 1e6`` estimates ``sum(value)`` per group.
    """
    m = _md5_lower64_rank(
        F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))
    ).bitwiseAND(F.lit((1 << 53) - 1))
    u = (m + F.lit(1)).cast("double") / F.lit(float(1 << 53))
    p = F.col(p_micro_col).cast("long")
    sampled = df.where(
        (p > 0) & (u <= p.cast("double") / F.lit(1e6))
    )
    # CASE guard keeps the ANSI DIV from throwing (or constant-folding
    # to an error when p_micro is a literal 0) — p<=0 rows are already
    # filtered out, so the 0 branch is unreachable at runtime.
    contrib = F.expr(
        f"CASE WHEN CAST({p_micro_col} AS BIGINT) > 0 THEN "
        f"(CAST({value_col} AS BIGINT) * 1000000000000) DIV "
        f"CAST({p_micro_col} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
    )
    gb = sampled.groupBy(*[F.col(c) for c in group_cols]) if group_cols \
        else sampled.groupBy()
    return gb.agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum(contrib).alias("ht_total_micro"),
    )


def poisson_bootstrap_ci(
    df: DataFrame,
    value_col: str,
    id_col: str,
    n_resamples: int = 64,
    lo_pct: float = 2.5,
    hi_pct: float = 97.5,
) -> DataFrame:
    """Deterministic Poisson-bootstrap confidence interval for the
    corpus MEAN of an integer column — error bars for corpus metrics
    (mean doc length, token counts, quality scores) without any RNG
    state: resample b weights row i by a Poisson(1) draw read off the
    uniform ``md5(id:b)/2^63`` through Python-literal inverse-CDF
    thresholds (identical bits in any engine), the standard
    distributed bootstrap (Chamandy et al., Google 2012 — Poisson
    weights need no global n, so the pass is embarrassingly
    parallel).

    Scale shape: the explode to (row x B) feeds a groupBy(b) whose
    map-side partials collapse each partition to ``B`` rows — the
    shuffle is B x partitions rows regardless of corpus size; the
    B-row frame then yields exact order-statistic percentile picks
    (rank = ceil(pct/100·B), deterministic). With an INTEGER value
    column every resample sum is exact, so the resample means are
    identical rationals cross-engine.

    Output (one row): ``(n_rows, n_resamples, mean_full, ci_lo,
    ci_hi, se)`` — round-6.
    """
    import math

    cdf = []
    acc = 0.0
    fact = 1.0
    for k in range(8):
        if k > 0:
            fact *= k
        acc += math.exp(-1.0) / fact
        cdf.append(acc)
    thresholds = cdf[:-1]  # multiplicity = #thresholds <= u, max 7

    src = df.select(
        F.col(id_col).cast("string").alias("_id"),
        F.col(value_col).cast("long").alias("_v"),
    ).where(F.col("_v").isNotNull())
    from .dedup import _md5_lower64

    b = src.select(
        "_id",
        "_v",
        F.explode(F.sequence(F.lit(1), F.lit(n_resamples))).alias("_b"),
    )
    u = (
        _md5_lower64(
            F.concat(F.col("_id"), F.lit(":"), F.col("_b").cast("string"))
        ).bitwiseAND(F.lit(0x7FFFFFFFFFFFFFFF))
        / F.lit(float(1 << 63))
    )
    mult = sum(
        [(u >= F.lit(t)).cast("int") for t in thresholds],
        F.lit(0),
    )
    sums = (
        b.select("_b", (mult.cast("long") * F.col("_v")).alias("_wx"),
                 mult.cast("long").alias("_w"))
        .groupBy("_b")
        .agg(F.sum("_wx").alias("_sx"), F.sum("_w").alias("_sw"))
        .select(
            F.try_divide(
                F.col("_sx").cast("double"), F.col("_sw").cast("double")
            ).alias("_mean")
        )
        .where(F.col("_mean").isNotNull())
    )
    from pyspark.sql import Window

    w = Window.orderBy("_mean")
    ranked = sums.withColumn("_rn", F.row_number().over(w))
    lo_rank = max(1, math.ceil(lo_pct / 100.0 * n_resamples))
    hi_rank = max(1, math.ceil(hi_pct / 100.0 * n_resamples))
    picks = ranked.agg(
        F.max(F.when(F.col("_rn") == lo_rank, F.col("_mean"))).alias(
            "_lo"
        ),
        F.max(F.when(F.col("_rn") == hi_rank, F.col("_mean"))).alias(
            "_hi"
        ),
        F.stddev_pop("_mean").alias("_se"),
    )
    full = src.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.avg("_v").alias("_mf"),
    )
    return full.crossJoin(F.broadcast(picks)).select(
        "n_rows",
        F.lit(n_resamples).alias("n_resamples"),
        F.round("_mf", 6).alias("mean_full"),
        F.round("_lo", 6).alias("ci_lo"),
        F.round("_hi", 6).alias("ci_hi"),
        F.round("_se", 6).alias("se"),
    )
