"""Deterministic corpus sharding and mixture budgeting.

The last mile of a training-data pipeline: (1) give the corpus a
deterministic global order (md5 of the id — a reproducible shuffle),
(2) pack documents into fixed-token-budget shards in that order, and
(3) cut per-source token budgets so the final mixture matches target
proportions. All three need a GLOBAL running token sum — the textbook
Spark trap, because ``sum().over(Window.orderBy(key))`` with no
partitioning collapses to a single partition.

This module computes the global cumsum in two levels instead:

* bucket = first byte of the order key (256 uniform ranges, since the
  key is md5) — a per-(group, bucket) window cumsum runs fully
  parallel;
* bucket offsets = per-bucket token totals (a 256-rows-per-group
  frame) cumulated by a window over that TINY frame and broadcast
  back.

``global_cum = bucket_offset + within_bucket_cum`` is exact (integer
sums), so the DuckDB oracle can verify it against a plain global
window cumsum while the Spark plan never funnels the corpus through
one partition. The decomposition is the standard parallel-prefix-sum
shape (Blelloch scan) expressed relationally.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def order_key(id_col: Column, salt: str = "s:") -> Column:
    """Deterministic shuffle key: md5 of the salted id. Uniform, so
    its first byte makes 256 balanced range buckets."""
    return F.md5(F.concat(F.lit(salt), id_col.cast("string")))


def distributed_cumsum(
    df: DataFrame,
    value_col: str,
    key_col: str,
    group_cols: Sequence[str] = (),
    out: str = "cum",
) -> DataFrame:
    """Running sum of ``value_col`` over ``key_col`` order (within
    each group), without a single-partition global window.

    ``key_col`` must be an md5-hex key (``order_key``); its first two
    hex chars form the range bucket. Adds ``out`` = inclusive running
    sum.
    """
    g = list(group_cols)
    df = df.withColumn(
        "_bk", F.conv(F.substring(F.col(key_col), 1, 2), 16, 10).cast("int")
    )
    w_in = (
        Window.partitionBy(*g, "_bk")
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = F.sum(value_col).over(w_in)
    totals = df.groupBy(*g, "_bk").agg(F.sum(value_col).alias("_tot"))
    w_off = (
        Window.partitionBy(*g)
        .orderBy("_bk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = totals.select(
        *g, "_bk", (F.sum("_tot").over(w_off) - F.col("_tot")).alias("_off")
    )
    return (
        df.join(F.broadcast(offsets), g + ["_bk"])
        .withColumn(out, (F.col("_off") + within).cast("long"))
        .drop("_bk", "_off")
    )


def pack_shards(
    docs: DataFrame,
    tokens_col: str,
    shard_tokens: int,
    id_col: str = "doc_id",
    key_col: Optional[str] = None,
) -> DataFrame:
    """Assign every document to a fixed-token-budget shard.

    Documents are laid out in deterministic md5 order (or by an
    existing ``key_col``) and a document belongs to the shard its
    START offset falls in: ``shard_id = floor((cum - tokens) /
    shard_tokens)``. A document longer than the budget still lands in
    exactly one shard (writers handle the spill; assignment stays
    total and deterministic). Adds ``shard_id`` and ``shard_start``.
    """
    if key_col is None:
        docs = docs.withColumn("_key", order_key(F.col(id_col)))
        key_col = "_key"
    cum = distributed_cumsum(docs, tokens_col, key_col)
    return (
        cum.withColumn("shard_start", (F.col("cum") - F.col(tokens_col)).cast("long"))
        .withColumn(
            "shard_id",
            F.floor(F.col("shard_start") / F.lit(shard_tokens)).cast("long"),
        )
        .drop("cum", *(["_key"] if key_col == "_key" else []))
    )


def mixture_select(
    docs: DataFrame,
    budgets: dict,
    source_col: str = "source",
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cut each source's documents to a token budget, deterministically.

    ``budgets`` maps source -> max tokens. Within each source,
    documents are taken in md5 order while their START offset is
    inside the budget (so a source always contributes at least one
    document if its budget is > 0 — matching how shard packing treats
    straddlers). Sources missing from ``budgets`` are dropped.
    Adds ``selected`` (boolean); callers filter or audit.
    """
    spark = docs.sparkSession
    bdf = spark.createDataFrame(
        [(k, int(v)) for k, v in sorted(budgets.items())],
        f"{source_col} string, _budget long",
    )
    keyed = docs.withColumn("_key", order_key(F.col(id_col)))
    cum = distributed_cumsum(keyed, tokens_col, "_key", group_cols=[source_col])
    return (
        cum.join(F.broadcast(bdf), source_col)
        .withColumn(
            "selected",
            (F.col("cum") - F.col(tokens_col)) < F.col("_budget"),
        )
        .drop("_key", "_budget")
        .withColumnRenamed("cum", "source_cum")
    )


def temperature_mix(
    docs: DataFrame,
    alpha: float = 0.5,
    total_budget: int = 1_000_000,
    source_col: str = "source",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Temperature-based mixture weights (the multilingual/source
    balancing rule of XLM-R / mT5: ``p_s ∝ n_s^α``): derives the
    per-source token budgets that ``mixture_select`` (q58) consumes,
    instead of taking them as given. ``α < 1`` upsamples small
    sources and downsamples dominant ones; ``α = 1`` reproduces raw
    shares; ``α = 0`` is uniform.

    Scale shape: ONE sources-sized aggregation (map-side combined
    from the corpus scan) — everything after is arithmetic over the
    handful of source rows, with the normalizer as a 1-row broadcast
    crossJoin (never a collect).

    Returns per source: ``n_docs, n_tokens, raw_share,
    tempered_share, budget_tokens, upsample_factor`` — budgets in
    tokens of ``total_budget``, factor > 1 meaning the source is
    oversampled relative to its natural share.
    """
    per_src = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(tokens_col).cast("long").alias("n_tokens"),
    )
    tempered = per_src.withColumn(
        "_w", F.pow(F.col("n_tokens").cast("double"), F.lit(alpha))
    )
    tot = tempered.agg(
        F.sum("n_tokens").cast("double").alias("_tot_raw"),
        F.sum("_w").alias("_tot_w"),
    )
    return (
        tempered.crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            "n_tokens",
            F.round(F.col("n_tokens") / F.col("_tot_raw"), 6).alias(
                "raw_share"
            ),
            F.round(F.col("_w") / F.col("_tot_w"), 6).alias(
                "tempered_share"
            ),
            F.round(
                F.col("_w") / F.col("_tot_w") * F.lit(float(total_budget))
            )
            .cast("long")
            .alias("budget_tokens"),
            F.round(
                (F.col("_w") / F.col("_tot_w"))
                / (F.col("n_tokens") / F.col("_tot_raw")),
                6,
            ).alias("upsample_factor"),
        )
        .orderBy("source")
    )


def grid_quantiles(
    df: DataFrame,
    value_col: str,
    fractions: Sequence[tuple] = ((1, 4), (1, 2), (3, 4), (9, 10)),
    scale: int = 100,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """EXACT type-1 quantiles of the value quantized to a fixed grid
    (``floor(v·scale)/scale``) — the scale path for percentile
    queries: Spark's exact ``percentile`` funnels every value through
    one aggregation buffer, and GK/t-digest sketches are
    merge-order-dependent. The histogram route is the classic
    warehouse pattern: ONE map-side-combinable groupBy compresses the
    corpus to ≤ distinct-grid-cells rows, an arithmetic-bucketed
    two-level prefix sum (same decomposition as
    :func:`distributed_cumsum`, but ordered by the GRID, bucket
    bounds from a bounded min/max collect) gives exact cumulative
    counts in parallel, and each quantile is the smallest grid cell
    whose cumulative count reaches ``ceil(n·num/den)``.

    ``fractions`` are (num, den) rationals so the target position is
    computed identically in any engine. NULL values are excluded.
    Returns one row per (group, fraction): ``(…group, q_num, q_den,
    value)`` with ``value = cell/scale``.
    """
    g = list(group_cols)
    vals = df.where(F.col(value_col).isNotNull()).select(
        *g,
        F.floor(F.col(value_col).cast("double") * F.lit(float(scale)))
        .cast("long")
        .alias("_cell"),
    )
    hist = vals.groupBy(*g, "_cell").agg(
        F.count(F.lit(1)).alias("_c")
    ).persist()
    bounds = hist.agg(
        F.min("_cell").alias("lo"), F.max("_cell").alias("hi")
    ).collect()[0]
    if bounds["lo"] is None:
        return (
            hist.sparkSession.createDataFrame(
                [],
                ", ".join(
                    [f"{c} string" for c in g]
                    + ["q_num int", "q_den int", "value double"]
                ),
            )
            if not g
            else hist.limit(0).select(
                *g,
                F.lit(0).alias("q_num"),
                F.lit(0).alias("q_den"),
                F.lit(0.0).alias("value"),
            )
        )
    lo, hi = int(bounds["lo"]), int(bounds["hi"])
    span = hi - lo + 1
    parts = hist.sparkSession.sparkContext.defaultParallelism
    b = hist.withColumn(
        "_b", F.expr(f"((_cell - {lo}L) * {parts}L) DIV {span}L")
    )
    w_in = (
        Window.partitionBy(*g, "_b")
        .orderBy("_cell")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = b.withColumn("_wc", F.sum("_c").over(w_in))
    totals = b.groupBy(*g, "_b").agg(F.sum("_c").alias("_t"))
    w_off = (
        Window.partitionBy(*g)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = totals.select(
        *g, "_b", (F.sum("_t").over(w_off) - F.col("_t")).alias("_off")
    )
    cum = within.join(F.broadcast(offsets), g + ["_b"]).withColumn(
        "_cum", (F.col("_off") + F.col("_wc")).cast("long")
    )
    n = cum.groupBy(*g).agg(F.max("_cum").alias("_n"))
    fr = hist.sparkSession.createDataFrame(
        [(int(a), int(bden)) for a, bden in fractions],
        "q_num int, q_den int",
    )
    targets = n.crossJoin(F.broadcast(fr)).withColumn(
        "_pos",
        F.ceil(F.col("_n") * F.col("q_num") / F.col("q_den").cast("double"))
        .cast("long"),
    )
    out = (
        cum.join(F.broadcast(targets), g if g else None, "inner")
        if g
        else cum.crossJoin(F.broadcast(targets))
    )
    return (
        out.where(F.col("_cum") >= F.col("_pos"))
        .groupBy(*g, "q_num", "q_den")
        .agg(F.min("_cell").alias("_qcell"))
        .select(
            *g,
            "q_num",
            "q_den",
            (F.col("_qcell") / F.lit(float(scale))).alias("value"),
        )
    )


def sequence_pack(
    docs: DataFrame,
    tokens_col: str,
    seq_len: int,
    id_col: str = "doc_id",
    key_col: Optional[str] = None,
) -> DataFrame:
    """Concat-and-chunk sequence packing (GPT-style pretraining layout).

    The corpus is laid out as one virtual token stream in deterministic
    md5 order and cut into fixed ``seq_len`` windows; a document whose
    token span crosses a boundary contributes one SEGMENT per window it
    touches (this is the standard "documents may straddle sequences"
    packing, unlike :func:`pack_shards` whole-doc assignment). Output:
    one row per (sequence, document) segment with

    * ``seq_id``        — 0-based sequence index,
    * ``seg_start_in_doc`` / ``seg_start_in_seq`` — 0-based offsets,
    * ``seg_len``       — tokens of the doc inside this sequence.

    Scale shape: the global offset comes from the two-level
    :func:`distributed_cumsum` (no single-partition window) and the
    explode factor per doc is ``1 + tokens/seq_len`` — total output is
    ``n_docs + total_tokens/seq_len`` rows, linear in corpus size.
    Zero-token documents are dropped (they occupy no stream span).
    """
    if key_col is None:
        docs = docs.withColumn("_key", order_key(F.col(id_col)))
        key_col = "_key"
    cum = distributed_cumsum(
        docs.where(F.col(tokens_col) > 0), tokens_col, key_col
    )
    end = F.col("cum")
    start = end - F.col(tokens_col)
    first = F.floor(start / F.lit(seq_len)).cast("long")
    last = F.floor((end - 1) / F.lit(seq_len)).cast("long")
    seg = (
        cum.withColumn("_start", start.cast("long"))
        .withColumn("seq_id", F.explode(F.sequence(first, last)))
    )
    seq_lo = F.col("seq_id") * F.lit(seq_len)
    seg_lo = F.greatest(F.col("_start"), seq_lo)
    seg_hi = F.least(F.col("cum"), seq_lo + F.lit(seq_len))
    return seg.select(
        F.col("seq_id"),
        F.col(id_col),
        (seg_lo - F.col("_start")).cast("long").alias("seg_start_in_doc"),
        (seg_lo - seq_lo).cast("long").alias("seg_start_in_seq"),
        (seg_hi - seg_lo).cast("long").alias("seg_len"),
    )


def unimax_allocation(
    docs: DataFrame,
    total_budget: int,
    epoch_cap: int = 2,
    source_col: str = "source",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """UniMax language sampling (Chung et al. 2023): spread a token
    budget as UNIFORMLY as possible across sources, but never take
    more than ``epoch_cap`` epochs of any source — the fairness rule
    that replaced temperature sampling (q100) for mT5-class corpora,
    where α-weights still over-repeat tail languages.

    Water-filling, all-integer until the final division: with caps
    ``c_s = epoch_cap · n_s`` sorted ASCENDING, source at rank i (of
    L) is CAPPED iff every j ≤ i satisfies
    ``c_j · (L − j + 1) ≤ B − Σ_{<j} c_k`` — once a source's cap
    exceeds the uniform share of what's left, so do all larger ones,
    and each gets exactly that share ``R/k`` (one IEEE division of
    two integers, identical in any engine). Monotonicity makes the
    capped set a sorted PREFIX, so the whole algorithm is one
    sources-sized window pass plus two 1-row broadcast scalars — no
    driver loop, no collect.

    Integer ranges: cumulative caps and ``c·k`` stay < 2^63 for any
    real corpus (10^13 tokens · epoch_cap 10 · 10^5 sources ~ 10^19
    would overflow — cast the caps to decimal(38,0) first at that
    scale; documented, not silently wrong: ANSI mode throws).

    Output: ``(source, n_tokens, cap, capped, alloc, epochs_used)``
    — ``alloc`` is the capped ``c_s`` or the uniform share, round-6;
    ``epochs_used = alloc/n_s`` (NULL for an empty source).
    """
    counts = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.sum(tokens_col).cast("long").alias("n_tokens")
    )
    caps = counts.withColumn(
        "cap", F.lit(int(epoch_cap)) * F.col("n_tokens")
    )
    # sources-sized frame: the single-partition sort window is the
    # POINT here (L ~ 10^2..10^4 languages), not a corpus window
    w = Window.orderBy("cap", "source")
    ranked = (
        caps.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "cum_excl",
            F.coalesce(
                F.sum("cap").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .withColumn(
            "L",
            F.count(F.lit(1)).over(
                Window.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
        )
    )
    B = F.lit(int(total_budget))
    flagged = ranked.withColumn(
        "ok", F.col("cap") * (F.col("L") - F.col("rn") + 1) <= B - F.col("cum_excl")
    )
    boundary = flagged.where(~F.col("ok")).agg(
        F.min("rn").alias("b_rn"),
        F.min_by(F.col("cum_excl"), F.col("rn")).alias("b_cum"),
        F.min_by(F.col("L") - F.col("rn") + 1, F.col("rn")).alias("b_k"),
    )
    out = flagged.crossJoin(F.broadcast(boundary)).select(
        "source",
        "n_tokens",
        "cap",
        (F.col("b_rn").isNull() | (F.col("rn") < F.col("b_rn"))).alias(
            "capped"
        ),
        F.round(
            F.when(
                F.col("b_rn").isNull() | (F.col("rn") < F.col("b_rn")),
                F.col("cap").cast("double"),
            ).otherwise(
                (B - F.col("b_cum")).cast("double")
                / F.col("b_k").cast("double")
            ),
            6,
        ).alias("alloc"),
    )
    return out.withColumn(
        "epochs_used",
        F.round(
            F.try_divide(F.col("alloc"), F.col("n_tokens").cast("double")),
            6,
        ),
    )


def apportion_budget(
    docs: DataFrame,
    total_budget: int,
    source_col: str = "source",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment: turn fractional
    mixture shares into INTEGER per-source budgets that sum to
    EXACTLY ``total_budget`` — the last step q58's ``mixture_select``
    and the q100/q131 weight rules all need, done exactly instead of
    per-source rounding (which drifts the total by up to ±sources/2).

    All-integer: base_s = ⌊B·n_s/N⌋ and remainder_s = B·n_s − base_s·N
    (both exact — no float share ever exists), leftover = B − Σbase
    seats go to the largest remainders (source tie-break). One
    sources-sized agg + one rank window + one 1-row broadcast — the
    same shape as :func:`unimax_allocation`. B·n_s bounds the range:
    keep B·N < 2^63 or cast the products to decimal(38,0).

    Output: ``(source, n_tokens, base, extra, alloc)`` with
    ``Σ alloc == total_budget`` by construction (alloc = 0 rows kept).
    """
    counts = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.sum(tokens_col).cast("long").alias("n_tokens")
    )
    B = F.lit(int(total_budget))
    tot = counts.agg(F.sum("n_tokens").alias("N"))
    # `div`, not floor(a/b): `/` is DOUBLE division, which silently
    # loses integer exactness past 2^53 — div stays integral
    prod = B * F.col("n_tokens")
    c = (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_tokens",
            "N",
            prod.alias("p"),
            F.expr(f"({int(total_budget)} * n_tokens) div N").alias(
                "base"
            ),
        )
        .select(
            "source",
            "n_tokens",
            "base",
            (F.col("p") - F.col("base") * F.col("N")).alias("rem"),
        )
    )
    leftover = c.agg((B - F.sum("base")).cast("long").alias("k"))
    w = Window.orderBy(F.desc("rem"), "source")
    ranked = c.withColumn("rk", F.row_number().over(w))
    return (
        ranked.crossJoin(F.broadcast(leftover))
        .select(
            "source",
            "n_tokens",
            F.col("base").cast("long").alias("base"),
            (F.col("rk") <= F.col("k")).cast("int").alias("extra"),
            (F.col("base") + (F.col("rk") <= F.col("k")).cast("int"))
            .cast("long")
            .alias("alloc"),
        )
    )


def compaction_schedule(
    shards: DataFrame,
    id_col: str = "shard_id",
    bytes_col: str = "n_bytes",
) -> DataFrame:
    """Optimal pairwise-merge schedule for delta-file compaction
    (Huffman 1952 applied to storage: merging two files costs their
    combined bytes, so the total bytes MOVED is minimized by always
    merging the two smallest — the catalog's compactor asks exactly
    this when it folds its delta chain). Greedy-smallest-two is
    provably optimal for linear merge cost.

    Shape: the shards frame is PARAMETER-sized (a catalog holds tens
    of deltas, not millions), so the greedy loop runs on the driver
    over one collected list — the BPE/k-means bounded-collect pattern
    (driver state = n_shards scalars, never corpus data). Ties break
    on (size, id) both in the heap and in merged-node naming
    (``m<k>``), making the schedule byte-stable and oracle-checkable.

    Output: one row per merge step: ``(step, left_id, right_id,
    merged_id, merged_bytes, cum_cost)`` — ``cum_cost`` is the running
    total bytes moved; the last row's value is the plan's total cost.
    """
    import heapq

    rows = shards.select(
        F.col(id_col).cast("string").alias("i"),
        F.col(bytes_col).cast("long").alias("b"),
    ).collect()
    bad = [str(r["i"]) for r in rows if r["b"] is None]
    if bad:
        raise ValueError(
            f"compaction_schedule: NULL n_bytes for shards {bad[:5]} — "
            "size every delta before planning (a NULL would silently "
            "skew the schedule)"
        )
    heap = [(int(r["b"]), str(r["i"])) for r in rows]
    heapq.heapify(heap)
    out, cum, k = [], 0, 0
    while len(heap) > 1:
        b1, i1 = heapq.heappop(heap)
        b2, i2 = heapq.heappop(heap)
        k += 1
        merged = f"m{k}"
        cost = b1 + b2
        cum += cost
        out.append((k, i1, i2, merged, cost, cum))
        heapq.heappush(heap, (cost, merged))
    spark = shards.sparkSession
    schema = (
        "step int, left_id string, right_id string, merged_id string,"
        " merged_bytes long, cum_cost long"
    )
    return spark.createDataFrame(out, schema)


def huffman_oracle_sql(sizes_sql: str, n_shards: int) -> str:
    """DuckDB twin of :func:`compaction_schedule`, the greedy rounds
    unrolled as MATERIALIZED CTEs: each round ranks the pool by
    (bytes, id) — VARCHAR order matches Python's str comparison for
    ASCII ids — pops the two smallest, emits the step and pushes
    ``m<k>``. ``sizes_sql`` must yield (i VARCHAR, b BIGINT) with
    exactly ``n_shards`` rows."""
    parts = [f"WITH h0 AS MATERIALIZED ({sizes_sql})"]
    steps = []
    for k in range(1, n_shards):
        parts.append(
            f"""p{k} AS MATERIALIZED (
  SELECT i, b, row_number() OVER (ORDER BY b, i) AS rn FROM h{k - 1}),
s{k} AS MATERIALIZED (
  SELECT max(CASE WHEN rn = 1 THEN i END) AS i1,
         max(CASE WHEN rn = 1 THEN b END) AS b1,
         max(CASE WHEN rn = 2 THEN i END) AS i2,
         max(CASE WHEN rn = 2 THEN b END) AS b2
  FROM p{k} WHERE rn <= 2),
h{k} AS MATERIALIZED (
  SELECT i, b FROM p{k} WHERE rn > 2
  UNION ALL SELECT 'm{k}', b1 + b2 FROM s{k})"""
        )
        steps.append(
            f"SELECT {k} AS step, i1 AS left_id, i2 AS right_id,"
            f" 'm{k}' AS merged_id, b1 + b2 AS merged_bytes FROM s{k}"
        )
    union = "\nUNION ALL\n".join(steps)
    parts.append(f"steps AS ({union})")
    # precondition guard: a pool size other than n_shards would unroll
    # the wrong number of rounds and emit NULL-byte merges — empty the
    # output instead so the parity compare fails LOUDLY on row count
    parts.append("chk AS (SELECT count(*) AS c FROM h0)")
    final = f"""SELECT CAST(step AS INT) AS step, left_id, right_id,
       merged_id, CAST(merged_bytes AS BIGINT) AS merged_bytes,
       CAST(sum(merged_bytes) OVER (ORDER BY step
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS BIGINT) AS cum_cost
FROM steps, chk WHERE chk.c = {n_shards} ORDER BY step"""
    return ",\n".join(parts) + "\n" + final


def waterfill_allocation(
    df: DataFrame,
    host_col: str,
    demand_col: str,
    budget: int,
) -> DataFrame:
    """Max-min fair (water-filling) crawl-budget allocation: split an
    integer URL budget across hosts so no host gets more than its
    demand and, subject to that, the smallest allocations are as
    large as possible — the fairness rule that stops a handful of
    mega-hosts from starving the long tail (the complement of
    :func:`apportion_budget`'s proportional Hamilton split: water-
    filling is what you want when demand EQUALS frontier backlog and
    politeness already caps per-host rates).

    Exact integer mechanics: with hosts sorted by demand, the water
    level L is the largest level where satisfying every demand <= L
    in full and giving L to everyone else stays within budget;
    leftover units (< hosts above L) go one each to the
    lowest-host-id unsatisfied hosts (deterministic largest-remainder
    twin of q139's rule).

    Scale shape: the level search runs over the DISTINCT-demand
    distribution, not hosts — groupBy(demand) → counts → one window
    over distinct demand values (thousands of distinct backlog sizes
    even at 10^10 urls, vs millions of hosts), then the level and
    remainder broadcast back as one-row literals. The only per-host
    work is a projection plus a bounded row_number over the hosts at
    the waterline that split the remainder.

    Output: ``(host, demand, alloc, satisfied int)`` with
    sum(alloc) == min(budget, sum(demand)).
    """
    from pyspark.sql import Window

    hosts = df.select(
        F.col(host_col).alias("host"),
        F.col(demand_col).cast("long").alias("demand"),
    ).where(F.col("demand") > 0)
    dist = hosts.groupBy("demand").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wv = Window.orderBy("demand").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # For each distinct demand value v: consumed(v) = full service of
    # all demands <= v plus v for every host above. The level is the
    # largest v with consumed(v) <= budget.
    n_tot = hosts.agg(
        F.count(F.lit(1)).alias("n"), F.sum("demand").alias("d_tot")
    )
    lv = (
        dist.withColumn("cum_d", F.sum(F.col("demand") * F.col("cnt")).over(wv))
        .withColumn("cum_n", F.sum("cnt").over(wv))
        .crossJoin(F.broadcast(n_tot))
        .withColumn(
            "consumed",
            F.col("cum_d") + (F.col("n") - F.col("cum_n")) * F.col("demand"),
        )
    )
    tot = n_tot.collect()[0]  # bounded driver scalar
    n, d_tot = tot["n"] or 0, tot["d_tot"] or 0
    if n == 0 or budget <= 0:
        return hosts.select(
            "host",
            "demand",
            F.lit(0).cast("long").alias("alloc"),
            F.lit(0).alias("satisfied"),
        )
    if d_tot <= budget:
        return hosts.select(
            "host",
            "demand",
            F.col("demand").alias("alloc"),
            F.lit(1).alias("satisfied"),
        )
    # Base level: largest distinct demand whose consumed <= budget
    # (run only on the genuinely-capped path — the satisfied/empty
    # early returns above never pay this job).
    base = (
        lv.where(F.col("consumed") <= budget)
        .orderBy(F.desc("demand"))
        .limit(1)
        .select(
            F.col("demand").alias("v0"),
            F.col("cum_d").alias("cd0"),
            F.col("cum_n").alias("cn0"),
        )
        .collect()
    )  # ONE row (or none) — bounded driver scalar
    if base:
        v0, cd0, cn0 = base[0]["v0"], base[0]["cd0"], base[0]["cn0"]
    else:
        v0, cd0, cn0 = 0, 0, 0
    above = n - cn0
    # Raise the level integer-exactly past v0: extra full units each
    # of the `above` hosts can take without passing the next demand
    # value or the budget.
    spare = budget - (cd0 + above * v0)
    level = v0 + (spare // above if above else 0)
    rem = spare - (spare // above) * above if above else 0
    # Hosts with demand > level get `level` (+1 for the `rem`
    # lowest-host-id among them). The remainder pick is orderBy +
    # limit — TakeOrderedAndProject's per-partition top-k, NOT a
    # global row_number window (which would single-partition every
    # unsatisfied host; rem < hosts-above-level, usually tiny).
    plus_one = (
        hosts.where(F.col("demand") > level)
        .select("host")
        .orderBy("host")
        .limit(int(rem))
        .select("host", F.lit(1).cast("long").alias("_plus"))
    )
    return (
        hosts.join(F.broadcast(plus_one), "host", "left")
        .select(
            "host",
            "demand",
            F.when(
                F.col("demand") <= level, F.col("demand")
            )
            .otherwise(F.lit(level) + F.coalesce("_plus", F.lit(0)))
            .alias("alloc"),
            (F.col("demand") <= level).cast("int").alias("satisfied"),
        )
    )
