"""Topical text segmentation — TextTiling (Hearst, CL 1997) as a
relational plan, for chunking long web documents into coherent
training segments (the "split at topic shifts, not at arbitrary
token counts" alternative to fixed-window chunking; pairs with
``operators/text.py::chunk_documents``).

Mechanics, exact-arithmetic variant:
- tokens bucket into fixed blocks of ``w`` tokens; per-(doc, block,
  term) counts are INTEGER.
- each inter-block gap scores the cosine between its two blocks.
  dot = sum(cnt_a * cnt_b) and the squared norms are integer sums
  (one hash-agg), so the only float step is the final two-scalar
  division — engine-stable, then rounded to micro-units
  (``sim_micro = round(cos * 1e6)`` as a LONG).
- depth score per gap (how deep the similarity valley is):
  ``(peak_l - s) + (peak_r - s)`` with peaks = max sim over the
  ``radius`` gaps to each side — Hearst's hill-climb bounded to a
  fixed window so it is TWO frame-bounded window functions, not a
  sequential walk.
- boundary rule: ``depth_micro * n_gaps >= sum(depth_micro) +
  offset_micro * n_gaps`` — i.e. depth >= mean + offset, cross-
  multiplied so the comparison is pure integers (Hearst uses
  mean + sd/2; a fixed offset keeps the rule exactly reproducible
  in any engine — no float stddev on the decision path).

Scale shape: everything is per-doc: one explode + hash-agg for
block-term counts, one equi-join of adjacent blocks on (doc, term),
two bounded-frame windows and one per-doc aggregate — shuffles key
on doc_id, no global windows, no driver collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def texttile_boundaries(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = 20,
    radius: int = 2,
    offset_micro: int = 50_000,
) -> DataFrame:
    """Per-doc TextTiling summary: ``(id, n_blocks, n_gaps,
    n_boundaries, boundaries)`` where ``boundaries`` is the
    comma-joined ascending list of gap indices (gap g sits between
    block g and g+1) whose depth clears mean + offset. Docs shorter
    than two blocks yield zero gaps and no boundaries."""
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"),
                lambda x: x != "",
            )
        ).alias("pos", "term"),
    )
    counts = (
        toks.select(
            "id", (F.col("pos") / w).cast("long").alias("blk"), "term"
        )
        .groupBy("id", "blk", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    norms = counts.groupBy("id", "blk").agg(
        F.sum(F.col("c") * F.col("c")).alias("n2")
    )
    nb = norms.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_blocks")
    )
    a = counts.select(
        "id", F.col("blk").alias("g"), "term", F.col("c").alias("ca")
    )
    b = counts.select(
        "id", (F.col("blk") - 1).alias("g"), "term", F.col("c").alias("cb")
    )
    dots = (
        a.join(b, ["id", "g", "term"])
        .groupBy("id", "g")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("dot"))
    )
    # Every adjacent pair is a gap even with zero shared terms: build
    # the gap frame from the norm table, not from the dot join.
    na = norms.select("id", F.col("blk").alias("g"), F.col("n2").alias("na2"))
    nbn = norms.select(
        "id", (F.col("blk") - 1).alias("g"), F.col("n2").alias("nb2")
    )
    gaps = (
        na.join(nbn, ["id", "g"])
        .join(dots, ["id", "g"], "left")
        .select(
            "id",
            "g",
            F.round(
                F.coalesce(F.col("dot"), F.lit(0))
                / (F.sqrt("na2") * F.sqrt("nb2"))
                * 1e6
            )
            .cast("long")
            .alias("sim_micro"),
        )
    )
    wl = (
        Window.partitionBy("id").orderBy("g").rowsBetween(-radius, 0)
    )
    wr = Window.partitionBy("id").orderBy("g").rowsBetween(0, radius)
    depth = gaps.select(
        "id",
        "g",
        (
            (F.max("sim_micro").over(wl) - F.col("sim_micro"))
            + (F.max("sim_micro").over(wr) - F.col("sim_micro"))
        ).alias("depth_micro"),
    )
    stats = depth.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("depth_micro").alias("sum_depth"),
    )
    marked = depth.join(stats, "id").where(
        F.col("depth_micro") * F.col("n_gaps")
        >= F.col("sum_depth") + F.lit(offset_micro) * F.col("n_gaps")
    )
    bounds = marked.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_boundaries"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("g")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("boundaries"),
    )
    return (
        nb.join(
            stats.select("id", "n_gaps"), "id", "left"
        )
        .join(bounds, "id", "left")
        .select(
            F.col("id"),
            "n_blocks",
            F.coalesce("n_gaps", F.lit(0)).alias("n_gaps"),
            F.coalesce("n_boundaries", F.lit(0)).alias("n_boundaries"),
            F.coalesce("boundaries", F.lit("")).alias("boundaries"),
        )
    )
