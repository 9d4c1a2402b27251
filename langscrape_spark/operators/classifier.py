"""Hashed-feature multinomial Naive Bayes quality classifier.

The fastText-style linear quality classifier is a standard stage in
web-corpus curation (CCNet trains one against Wikipedia, FineWeb-Edu
against LLM-graded seeds; langscrape's LLM grader plays the same role
per-page — ``langscrape/nodes/data_collator.py`` routes pages by an
LLM quality verdict). Multinomial NB over hashed token buckets is the
deterministic, one-pass-trainable member of that family: scoring is a
linear scan ``score(x) = log_prior + sum_f count_f(x) * llr_f`` —
exactly a fastText linear model whose weights come from closed-form
counts instead of SGD, which makes it reproducible bit-for-bit in the
DuckDB oracle (no iterative float drift).

Scale shape (100 TB): training is one explode + equi-key count agg
whose output is ``2 * num_buckets`` rows (the hashed vocabulary is the
point — no giant vocab table), collected driver-side and re-seeded as
a small frame exactly like :func:`dsir.feature_log_ratio`; the labeled
set is the SMALL side by construction (curation classifiers train on
10^4-10^6 seeds, score 10^10 pages). Scoring broadcasts the
``num_buckets``-sized weight table against the exploded corpus —
map-side join, per-doc reduce shuffles ~1 row/doc/partition after
partial aggregation. No UDFs anywhere; the hash is the md5 lower half
(DuckDB ``md5_number_lower``) with a power-of-2 bucket count so
Spark's signed ``pmod`` equals DuckDB's unsigned ``%``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dsir import hashed_ngram_buckets


def nb_train(
    labeled_docs: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    n: int = 1,
    num_buckets: int = 1024,
    alpha: float = 0.5,
) -> DataFrame:
    """Train on a labeled frame (``label_col`` boolean-ish: casts to
    int, 1 = positive). Returns the broadcastable model as a
    ``num_buckets``-row frame ``(bucket, llr, log_prior)``:

    - ``llr_b  = ln((c1_b + a) / (N1 + a*B)) - ln((c0_b + a) / (N0 + a*B))``
      (add-alpha multinomial likelihood ratio per hashed bucket),
    - ``log_prior = ln(d1 / d) - ln(d0 / d)`` (doc-level class prior,
      replicated on every row so the model stays ONE broadcast table).

    Token counts use occurrence multiplicity (multinomial NB, same
    bag-of-hashed-features convention as DSIR). The labeled set is
    scanned twice (token counts + doc counts) — it is the small side.
    Smoothing is over the full fixed bucket space, so scoring has no
    OOV branch and every bucket exists in the model.
    """
    lab = labeled_docs.select(
        F.col(label_col).cast("int").alias("y"), F.col(text_col).alias("t")
    )
    tok_rows = (
        lab.select(
            "y",
            F.explode(hashed_ngram_buckets(F.col("t"), n, num_buckets)).alias(
                "bucket"
            ),
        )
        .groupBy("y", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    doc_rows = lab.groupBy("y").agg(F.count(F.lit(1)).alias("d")).collect()
    if any(r["y"] is None for r in doc_rows):
        n_null = sum(int(r["d"]) for r in doc_rows if r["y"] is None)
        raise ValueError(
            f"nb_train: {n_null} labeled rows have a NULL label (usually "
            "a failed silver-labeling join) — refusing to fold them into "
            "a class"
        )
    c1 = {int(r["bucket"]): int(r["c"]) for r in tok_rows if r["y"] == 1}
    c0 = {int(r["bucket"]): int(r["c"]) for r in tok_rows if r["y"] != 1}
    d1 = sum(int(r["d"]) for r in doc_rows if r["y"] == 1)
    d0 = sum(int(r["d"]) for r in doc_rows if r["y"] != 1)
    if d1 == 0 or d0 == 0:
        raise ValueError(
            f"nb_train needs both classes in the labeled set (pos={d1}, "
            f"neg={d0})"
        )
    n1 = sum(c1.values())
    n0 = sum(c0.values())
    base = labeled_docs.sparkSession.createDataFrame(
        [(b, c1.get(b, 0), c0.get(b, 0)) for b in range(num_buckets)],
        "bucket long, c1 long, c0 long",
    )
    # ln evaluated by Spark (not python math.log) for engine float
    # parity with the oracle's ln() — same discipline as DSIR.
    denom1 = F.lit(float(n1)) + F.lit(alpha) * F.lit(num_buckets)
    denom0 = F.lit(float(n0)) + F.lit(alpha) * F.lit(num_buckets)
    prior = F.log(F.lit(float(d1)) / F.lit(float(d1 + d0))) - F.log(
        F.lit(float(d0)) / F.lit(float(d1 + d0))
    )
    return base.select(
        "bucket",
        (
            F.log((F.col("c1") + F.lit(alpha)) / denom1)
            - F.log((F.col("c0") + F.lit(alpha)) / denom0)
        ).alias("llr"),
        prior.alias("log_prior"),
    )


def nb_score(
    docs: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 1,
    num_buckets: int = 1024,
) -> DataFrame:
    """Score every document with the trained model:
    ``(id, n_features, score, pred)`` where ``score`` is the class
    log-odds ``log_prior + sum(llr over feature occurrences)`` and
    ``pred = score > 0``. Empty docs score exactly ``log_prior``
    (kept — the downstream gate decides).

    The model broadcast-joins the exploded corpus map-side; the
    per-doc sum shuffles one partial row per doc per partition.
    ``n``/``num_buckets`` must match training — the model is just a
    weight table and cannot check.
    """
    feats = docs.select(
        F.col(id_col),
        F.explode_outer(
            hashed_ngram_buckets(F.col(text_col), n, num_buckets)
        ).alias("bucket"),
    )
    scored = (
        feats.join(F.broadcast(model), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count("bucket").alias("n_features"),
            (
                F.sum(F.coalesce("llr", F.lit(0.0)))
                + F.first("log_prior", ignorenulls=True)
            ).alias("score"),
        )
    )
    # a doc whose every row missed the model (impossible by
    # construction — smoothing fills all buckets — but explode_outer
    # NULL-bucket rows for empty docs carry no log_prior) still needs
    # the prior: re-join the constant from the model head.
    prior = model.select(F.first("log_prior").alias("_lp")).limit(1)
    return (
        scored.crossJoin(F.broadcast(prior))
        .select(
            id_col,
            "n_features",
            F.coalesce("score", F.col("_lp")).alias("score"),
        )
        .withColumn("pred", F.col("score") > 0)
    )


def calibration_table(
    scored: DataFrame,
    label_col: str = "label",
    score_col: str = "score",
    n_bins: int = 5,
    mode: str = "exact",
) -> DataFrame:
    """Classifier calibration by score quantile: split the scored
    corpus into ``n_bins`` equal-mass score bands and report, per
    band, volume / positive share / score range — the table that
    turns a quality score into a THRESHOLD decision (FineWeb-style
    pipelines pick the keep-cutoff off exactly this curve, trading
    volume against precision).

    ``mode='exact'`` uses SQL ``percentile`` (DuckDB ``quantile_cont``
    parity, proven by q06/q53); ``mode='approx'`` uses
    ``percentile_approx`` — the mergeable-sketch 100 TB path (bin
    EDGES shift within sketch error; the semantics don't). Cutoffs are
    computed on ``round(score, 6)`` and rows are binned on the same
    rounding so sub-1e-6 engine float noise cannot move a row across a
    band. Bin index = number of interior cutoffs strictly below the
    row's score (ties collapse LEFT into the lower band — with heavy
    score ties some bands may be empty; they are absent from the
    output, not padded).

    Scale shape: one reduce for the (n_bins-1)-value cutoff row,
    broadcast back, then one bins-sized hash agg. NULL scores and NULL
    labels are excluded (a calibration row must have both).
    """
    if mode not in ("exact", "approx"):
        raise ValueError(f"mode must be 'exact' or 'approx', got {mode!r}")
    fn = "percentile" if mode == "exact" else "percentile_approx"
    s = scored.where(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        F.col(label_col).cast("int").alias("_y"),
        F.round(F.col(score_col), 6).alias("_s"),
    )
    probs = ", ".join(f"cast({i} as double)/{n_bins}" for i in range(1, n_bins))
    cuts = s.agg(F.expr(f"{fn}(_s, array({probs}))").alias("_cuts"))
    binned = s.crossJoin(F.broadcast(cuts)).withColumn(
        "bin",
        F.size(F.filter(F.col("_cuts"), lambda c: c < F.col("_s"))),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_y").alias("n_pos"),
            F.min("_s").alias("score_min"),
            F.max("_s").alias("score_max"),
        )
        .withColumn("pos_share", F.col("n_pos") / F.col("n"))
    )


def auc_exact(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_cols=(),
) -> DataFrame:
    """Exact tie-aware ROC-AUC of a quality classifier against silver
    labels — the single-number companion to :func:`calibration_table`
    (q75): AUC = P(score₊ > score₋) + ½·P(score₊ = score₋), computed
    as the Mann-Whitney U rank statistic.

    Exactness trick: ties take AVERAGE ranks, which are half-integers
    — so everything is carried in DOUBLED ranks ``r2 = 2·rank + cnt −
    1`` (min-rank + tie count, both integers), making
    ``U2 = Σ₊ r2 − n₊(n₊+1)`` an exact integer and
    ``AUC = U2 / (2·n₊·n₋)`` one division of identical integers in
    any engine — no float rank arithmetic to diverge.

    Scale shape: one per-group rank window + one tie-count window +
    one agg over the scores frame. One-class groups (n₊ or n₋ = 0)
    report NULL AUC via try_divide, never a crash. Rank sums bound
    the integer range at n² < 2^63 (n per group < ~2·10⁹).

    Output: ``(*group_cols, n_pos, n_neg, u2, auc)``.
    """
    from pyspark.sql import Window

    g = list(group_cols)
    base = df.where(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        *g,
        F.col(score_col).alias("s"),
        F.col(label_col).cast("int").alias("y"),
    )
    ranked = base.withColumn(
        # long from the start: 2*rk as int32*int32 would overflow at
        # ~1.07e9-row groups, inside the documented n < ~2e9 range
        "rk",
        F.rank().over(Window.partitionBy(*g).orderBy("s")).cast("long"),
    ).withColumn(
        "cnt",
        F.count(F.lit(1)).over(Window.partitionBy(*(g + ["s"]))),
    )
    agg = ranked.groupBy(*g).agg(
        F.sum("y").cast("long").alias("n_pos"),
        F.sum(1 - F.col("y")).cast("long").alias("n_neg"),
        F.sum(
            F.when(
                F.col("y") == 1, 2 * F.col("rk") + F.col("cnt") - 1
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("sum_r2_pos"),
    )
    u2 = F.col("sum_r2_pos") - F.col("n_pos") * (F.col("n_pos") + 1)
    return agg.select(
        *g,
        "n_pos",
        "n_neg",
        u2.cast("long").alias("u2"),
        F.round(
            F.try_divide(
                u2.cast("double"),
                (2 * F.col("n_pos") * F.col("n_neg")).cast("double"),
            ),
            6,
        ).alias("auc"),
    )


def f1_threshold(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_cols=(),
) -> DataFrame:
    """Where to CUT a quality score: the threshold maximizing F1
    against silver labels — the number q75's calibration curve and
    q133's AUC both stop short of handing the pipeline. Keep rule is
    ``score >= threshold``; candidate thresholds are the distinct
    observed scores (the only places F1 can change).

    One pass, no per-threshold scan: sort distinct scores DESCENDING
    and suffix-cumulate per-score positive/total counts with one
    window — at threshold s, TP = positives with score ≥ s and
    FP = rows ≥ s minus TP, all exact integers; F1 = 2TP/(TP + FN +
    rows≥s) is an identical-expression double in both engines, argmax
    by (F1 desc, threshold asc) via one more window. n² never
    appears; the frame after the first agg is DISTINCT-SCORE-sized.

    Output per group: ``(.., threshold, tp, fp, fn, precision,
    recall, f1)`` — the winning row only. Groups with no positives
    get F1 = 0 exactly (the denominator holds the rows ≥ threshold,
    never zero) and NULL recall; a NULL threshold is impossible
    (every group has ≥ 1 distinct score).
    """
    from pyspark.sql import Window

    g = list(group_cols)
    base = df.where(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        *g,
        F.col(score_col).alias("s"),
        F.col(label_col).cast("int").alias("y"),
    )
    per_score = base.groupBy(*g, "s").agg(
        F.sum("y").cast("long").alias("pos"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    w = (
        Window.partitionBy(*g)
        .orderBy(F.desc("s"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy(*g)
    c = (
        per_score.withColumn("tp", F.sum("pos").over(w))
        .withColumn("ge", F.sum("n").over(w))
        .withColumn("all_pos", F.sum("pos").over(tot))
    )
    tp = F.col("tp")
    fp = F.col("ge") - tp
    fn = F.col("all_pos") - tp
    f1 = F.try_divide(
        (2 * tp).cast("double"), (2 * tp + fp + fn).cast("double")
    )
    ranked = c.withColumn("f1", F.round(f1, 6)).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy(*g).orderBy(
                F.desc_nulls_last("f1"), F.asc("s")
            )
        ),
    )
    return ranked.where(F.col("rn") == 1).select(
        *g,
        F.col("s").alias("threshold"),
        tp.cast("long").alias("tp"),
        fp.cast("long").alias("fp"),
        fn.cast("long").alias("fn"),
        F.round(F.try_divide(tp.cast("double"), F.col("ge").cast("double")), 6).alias("precision"),
        F.round(
            F.try_divide(tp.cast("double"), F.col("all_pos").cast("double")),
            6,
        ).alias("recall"),
        "f1",
    )


def logreg_gd(
    df: DataFrame,
    feature_cols: "list[str]",
    label_col: str,
    rounds: int = 3,
    lr_micro: int = 500000,
) -> "list[dict]":
    """Distributed logistic-regression training by full-batch gradient
    descent — the SGD-family counterpart to :func:`nb_train` (NB is
    closed-form counts; this is the iterative member every curation
    stack eventually wants for calibrated quality gates), built so the
    whole trajectory is EXACT INTEGER state reproducible in the DuckDB
    oracle:

    - features and labels are INTEGER columns (caller scales);
      weights live in micro-units (long), initialized to 0;
    - the margin is exact: ``z_micro = Σ_j w_micro_j · x_j``;
    - the link is the FAST SIGMOID ``σ̃(z) = ½(1 + z/(1+|z|))``
      (Elliott activation) in pure integer arithmetic —
      ``s_micro = 500000 + (z_micro·500000) DIV (10^6 + |z_micro|)``
      — because ``exp()`` is not correctly rounded across libms and
      would drift the trajectory; σ̃ has the same sign/shape/limits
      and trains an equivalent linear separator;
    - per-round gradient ``g_j = Σ rows (s_micro − y·10^6)·x_j`` is
      one LONG hash-agg sum (exact, order-free); the update
      ``w −= lr·g/n`` is two truncating integer divisions
      (``DIV``, toward zero — DuckDB ``//`` matches).

    Scale shape: each round is ONE map-side-combined aggregation over
    the corpus producing |features| longs; the weight vector is the
    bounded per-round driver scalar every iterative operator here
    uses (PageRank's dangling mass, k-means' centroids) and ships
    back as literals — no shuffle grows with rounds, lineage is flat
    because each round's frame is rebuilt from the base scan.

    Returns the weight trajectory: ``[{feature, round, w_micro}…]``
    for rounds 1..``rounds`` (a plain list — the weights ARE driver
    state; callers wanting a frame seed one from it).
    """
    k = len(feature_cols)
    if k == 0:
        raise ValueError("need at least one feature column")
    w = [0] * k
    out = []
    base = df.select(
        *[F.col(c).cast("long").alias(f"x{j}") for j, c in enumerate(feature_cols)],
        F.col(label_col).cast("long").alias("y"),
    )
    # One pre-pass aggregate: row count + NULL audit. A NULL feature
    # or label would silently drop its row from every gradient sum
    # while n still counted it (a skewed update with no symptom) — or
    # NULL the whole gradient on an all-NULL column — so refuse early.
    any_null = None
    for c in [f"x{j}" for j in range(k)] + ["y"]:
        isn = F.col(c).isNull()
        any_null = isn if any_null is None else (any_null | isn)
    stats = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(any_null.cast("long")).alias("n_null"),
    ).collect()[0]
    n = int(stats["n"])
    if n == 0:
        raise ValueError("empty training frame")
    if int(stats["n_null"] or 0) > 0:
        raise ValueError(
            f"logreg_gd: {stats['n_null']} rows carry NULL features/"
            "labels — drop or impute them first (NULLs would silently "
            "skew the gradient)"
        )
    for r in range(1, rounds + 1):
        z = None
        for j in range(k):
            term = F.lit(int(w[j])) * F.col(f"x{j}")
            z = term if z is None else z + term
        scored = base.withColumn("__z", z.cast("long")).withColumn(
            "__s",
            F.lit(500000).cast("long")
            + F.expr(
                "(__z * CAST(500000 AS BIGINT)) DIV "
                "(CAST(1000000 AS BIGINT) + abs(__z))"
            ),
        )
        err = F.col("__s") - F.col("y") * F.lit(1000000)
        grads = scored.agg(
            *[
                F.sum(err * F.col(f"x{j}")).alias(f"g{j}")
                for j in range(k)
            ]
        ).collect()[0]
        for j in range(k):
            g = int(grads[f"g{j}"])
            gn = g // n if g >= 0 else -((-g) // n)  # trunc toward 0
            step = lr_micro * gn
            dw = step // 1000000 if step >= 0 else -((-step) // 1000000)
            w[j] -= dw
        for j in range(k):
            out.append(
                {"feature": feature_cols[j], "round": r, "w_micro": int(w[j])}
            )
    return out


def logreg_score(
    df: DataFrame,
    weights: "list[dict]",
    feature_cols: "list[str]",
) -> DataFrame:
    """Score rows with the FINAL round's :func:`logreg_gd` weights:
    adds ``z_micro`` (exact integer margin) and ``pred`` (z ≥ 0).
    Broadcast-free — the k weights are literals in the projection."""
    last = max(r["round"] for r in weights)
    wmap = {
        r["feature"]: r["w_micro"]
        for r in weights
        if r["round"] == last
    }
    z = None
    for c in feature_cols:
        term = F.lit(int(wmap[c])) * F.col(c).cast("long")
        z = term if z is None else z + term
    return df.withColumn("z_micro", z.cast("long")).withColumn(
        "pred", (F.col("z_micro") >= 0).cast("int")
    )


def logreg_oracle_sql(
    base_sql: str,
    feature_names: "list[str]",
    rounds: int = 3,
    lr_micro: int = 500000,
) -> str:
    """DuckDB twin of :func:`logreg_gd`: the full-batch GD trajectory
    unrolled as MATERIALIZED CTEs — per round one scored frame, one
    gradient aggregate, one weight row — using the same integer
    fast-sigmoid and truncating divisions (DuckDB ``//`` truncates
    toward zero exactly like Spark ``DIV``). ``base_sql`` must yield
    integer columns ``x0..x{k-1}`` and ``y``; the result is the
    ``(feature, round, w_micro)`` trajectory."""
    k = len(feature_names)
    parts = [
        f"WITH base AS MATERIALIZED ({base_sql}),",
        "cnt AS MATERIALIZED (SELECT count(*) AS n FROM base),",
        "w0 AS MATERIALIZED (SELECT "
        + ", ".join(f"CAST(0 AS BIGINT) AS w{j}" for j in range(k))
        + "),",
    ]
    for r in range(1, rounds + 1):
        z = " + ".join(f"w.w{j} * b.x{j}" for j in range(k))
        parts.append(
            f"sc{r} AS MATERIALIZED (SELECT b.*,"
            f" CAST({z} AS BIGINT) AS z"
            f" FROM base b, w{r - 1} w),"
        )
        sig = (
            "(500000 + (z * CAST(500000 AS BIGINT))"
            " // (CAST(1000000 AS BIGINT) + abs(z)))"
        )
        gsel = ", ".join(
            f"CAST(sum(({sig} - y * 1000000) * x{j}) AS BIGINT) AS g{j}"
            for j in range(k)
        )
        parts.append(f"g{r} AS MATERIALIZED (SELECT {gsel} FROM sc{r}),")
        wsel = ", ".join(
            f"CAST(w.w{j} - (({lr_micro} * (g.g{j} // cnt.n))"
            f" // 1000000) AS BIGINT) AS w{j}"
            for j in range(k)
        )
        parts.append(
            f"w{r} AS MATERIALIZED (SELECT {wsel}"
            f" FROM w{r - 1} w, g{r} g, cnt),"
        )
    unions = []
    for r in range(1, rounds + 1):
        for j, name in enumerate(feature_names):
            unions.append(
                f"SELECT '{name}' AS feature, CAST({r} AS INT)"
                f" AS round, w{j} AS w_micro FROM w{r}"
            )
    body = " UNION ALL ".join(unions)
    # strip the trailing comma of the last CTE
    parts[-1] = parts[-1].rstrip(",")
    return "\n".join(parts) + ",\ntraj AS (" + body + ")\n" + \
        "SELECT feature, round, w_micro FROM traj ORDER BY round, feature"
