"""Exact edit-distance similarity join (FastSS deletion neighborhoods).

Finds all pairs of strings within Levenshtein distance ``max_edit``
(1 or 2) — the URL-typo / near-variant detection piece of a crawl
pipeline (mirror hosts, misspelled anchors, tokenizer vocab variants).

Candidate generation is the FastSS deletion-neighborhood scheme
(Bocek et al., 2007): for ``ed(a, b) <= k`` there is always a common
string reachable from BOTH sides by at most ``k`` single-character
deletions, so strings sharing any member of their k-deletion
neighborhoods are the complete candidate set — recall is exact by
pigeonhole, no sampling, no df-cap. False positives (the intersection
bound is one-directional) are removed by one JVM-side
``levenshtein()`` confirm per candidate pair.

Scale shape: a string of length L emits ``1 + L`` variants at k=1 and
``1 + L + L(L-1)/2`` at k=2 — linear/quadratic in STRING length, never
in corpus size. The variant frame is computed ONCE (persisted) and fed
to a self-equi-join on the variant key. Identical-string clusters
collapse into hot variant buckets exactly like identical documents
collapse LSH bands; the same counts-pass + broadcast-anti-join guard
used by ``minhash_lsh_pairs`` bounds them — restricted to
single-distinct-string buckets so distinct-string recall stays exact
(run ``exact_dedup`` first — ed=0 pairs are its job).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _del1(s: Column, p: Column) -> Column:
    """``s`` with the (1-based) ``p``-th character deleted."""
    return F.concat(
        F.substr(s, F.lit(1), p - 1), F.substr(s, p + 1, F.length(s))
    )


def deletion_variants(s: Column, max_edit: int) -> Column:
    """All strings reachable from ``s`` by 0..``max_edit`` deletions
    (the FastSS signature set), distinct, empty-string safe."""
    if max_edit not in (1, 2):
        raise ValueError("deletion_variants supports max_edit 1 or 2")
    one = F.when(
        F.length(s) > 0,
        F.transform(F.sequence(F.lit(1), F.length(s)), lambda p: _del1(s, p)),
    ).otherwise(F.array().cast("array<string>"))
    vs = F.concat(F.array(s), one)
    if max_edit == 2:
        two = F.when(
            F.length(s) > 1,
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.length(s) - 1),
                    lambda p: F.transform(
                        F.sequence(p + 1, F.length(s)),
                        # delete q first (right), then p: positions of
                        # p's prefix are unaffected by the right delete
                        lambda q: _del1(_del1(s, q), p),
                    ),
                )
            ),
        ).otherwise(F.array().cast("array<string>"))
        vs = F.concat(vs, two)
    return F.array_distinct(vs)


def edit_distance_pairs(
    df: DataFrame,
    str_col: str,
    id_col: str,
    max_edit: int = 1,
    max_bucket: int | None = 100_000,
) -> DataFrame:
    """All pairs with ``levenshtein(s_a, s_b) <= max_edit``,
    ``id_a < id_b``. Output columns: ``id_a, id_b, dist``.

    Exact (complete + precise) between DISTINCT strings: FastSS
    candidates, then a ``levenshtein`` confirm. The ``max_bucket``
    guard drops only variant buckets holding ONE distinct string
    (identical-string clusters — their pair output is quadratic and
    ``exact_dedup``'s job), so no dist>=1 pair is ever lost; hot
    buckets fanned in by many DISTINCT near-neighbors are kept for
    completeness (if such fan-in is pathological for your corpus —
    e.g. millions of length<=k strings sharing the empty variant —
    pre-filter short strings; an exact join cannot drop them for
    you). ``None`` disables the guard entirely.

    The variant frame is persisted: the guard's counts pass and both
    sides of the candidate self-join read one cached explode instead
    of re-deriving the O(L)-per-string variant generation (ReuseExchange
    does not fire across a groupBy guard + anti-join + self-join).
    """
    v = (
        df.select(F.col(id_col).alias("id"), F.col(str_col).alias("s"))
        .withColumn(
            "variant", F.explode(deletion_variants(F.col("s"), max_edit))
        )
        .persist()
    )
    if max_bucket is not None:
        hot = (
            v.groupBy("variant")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.countDistinct("s").alias("nd"),
            )
            .where((F.col("n") > max_bucket) & (F.col("nd") == 1))
            .select("variant")
        )
        v = v.join(F.broadcast(hot), "variant", "left_anti")
    a, b = v.alias("a"), v.alias("b")
    cand = (
        a.join(b, "variant")
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.s").alias("s_a"),
            F.col("b.s").alias("s_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn("dist", F.levenshtein("s_a", "s_b"))
        .where(F.col("dist") <= max_edit)
        .select("id_a", "id_b", "dist")
    )
