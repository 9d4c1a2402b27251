"""Probabilistic record linkage — Fellegi & Sunter (JASA 1969) match
scoring over blocked candidate pairs.

Crawl/webtext use: linking page records ACROSS snapshots or mirrored
hosts when no shared key exists (url changed, content shifted) —
"same underlying page?" from field agreement: title prefix, language,
size bucket, host. The reference has no linkage surface; this is part
of the training-data curation layer (merging crawl metadata with
external catalogs without exact keys).

Model: each compared field j has literal match/unmatch probabilities
(m_j = P(agree | same entity), u_j = P(agree | different)). A pair's
score is sum over fields of log2(m_j/u_j) on agreement and
log2((1-m_j)/(1-u_j)) on disagreement; two thresholds split
link / possible / non-link. Weights are precomputed in Python as
INTEGER MICRO-UNITS (round(w * 1e6)) so the pair score is an exact
integer sum — bit-identical in any engine, no float-order
sensitivity (the repo-wide micro-unit convention, cf. sessions.py).

Scale shape: candidate generation is a BLOCKING equi-join — the
standard linkage answer to the quadratic pair explosion (Christen,
"Data Matching", ch. 4). Pairs exist only within a block, the join
shuffles on the block key, and block sizes are auditable up front
(``block_profile``) so a hot block is visible BEFORE the join
(salt/split it, or tighten the key — same playbook as the politeness
window's salting). NULL block keys never pair (inner join semantics,
documented); NULL field values compare as DISAGREEMENT via a
sentinel, never as NULL-propagating equality.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

_NULL_SENTINEL = "<NULL-FS>"


@dataclass(frozen=True)
class FsField:
    name: str
    m: float  # P(agree | same entity)   — in (0, 1)
    u: float  # P(agree | different)     — in (0, 1)

    @property
    def w_agree_micro(self) -> int:
        return round(math.log2(self.m / self.u) * 1_000_000)

    @property
    def w_disagree_micro(self) -> int:
        return round(math.log2((1 - self.m) / (1 - self.u)) * 1_000_000)


def _sent(col: Column) -> Column:
    return F.coalesce(col.cast("string"), F.lit(_NULL_SENTINEL))


def block_profile(
    a: DataFrame, b: DataFrame, block_cols: Sequence[str]
) -> DataFrame:
    """Per-block pair-count audit BEFORE the join: |A_block|·|B_block|
    per key, descending — the pre-flight that catches a hot block
    while it is still one aggregate row, not 10^9 joined pairs."""
    bc = list(block_cols)
    ca = a.groupBy(*bc).agg(F.count(F.lit(1)).alias("_na"))
    cb = b.groupBy(*bc).agg(F.count(F.lit(1)).alias("_nb"))
    return (
        ca.join(cb, bc)
        .select(*bc, (F.col("_na") * F.col("_nb")).alias("pairs"))
        .orderBy(F.desc("pairs"), *bc)
    )


def fs_link_pairs(
    a: DataFrame,
    b: DataFrame,
    id_a: str,
    id_b: str,
    block_cols: Sequence[str],
    fields: Sequence[FsField],
    link_ge_micro: int,
    nonlink_le_micro: int,
    max_block_pairs: int | None = None,
) -> DataFrame:
    """Blocked Fellegi-Sunter linkage: inner-join ``a`` x ``b`` on the
    blocking key, score each pair as the integer micro-unit sum of
    per-field agreement weights, classify by the two thresholds.

    ``fields`` columns must exist in BOTH frames (compared as strings
    with NULL -> sentinel -> always a disagreement against any real
    value AND against another NULL? No: two sentinels AGREE — two
    missing values are weak evidence, the standard treatment is a
    third state; we keep the two-state model and document that
    NULL==NULL counts as agreement, which the m/u literals must
    price in).

    ``max_block_pairs`` (optional) enforces the pre-flight: when any
    block exceeds it, raise instead of silently cross-joining — the
    100 TB guard (callers split/salt the offending block first).

    Output: ``(id_a, id_b, score_micro long, decision string)``,
    decision in {'link','possible','non_link'}.
    """
    if not fields:
        raise ValueError("fs_link_pairs needs at least one FsField")
    bc = list(block_cols)
    if max_block_pairs is not None:
        hot = (
            block_profile(a, b, bc)
            .where(F.col("pairs") > max_block_pairs)
            .limit(1)
            .collect()
        )
        if hot:
            raise ValueError(
                f"block {tuple(hot[0][c] for c in bc)} would generate "
                f"{hot[0]['pairs']} pairs (> {max_block_pairs}); "
                "split or salt the blocking key"
            )
    # Block keys stay RAW: equality-join semantics drop NULL keys on
    # both engines identically (a NULL block key pairs with nothing).
    # Only the COMPARED fields go through the sentinel.
    la = a.select(
        F.col(id_a),
        *[F.col(c).alias(f"_bk_{c}") for c in bc],
        *[_sent(F.col(f.name)).alias(f"_fa_{f.name}") for f in fields],
    )
    lb = b.select(
        F.col(id_b),
        *[F.col(c).alias(f"_bk_{c}") for c in bc],
        *[_sent(F.col(f.name)).alias(f"_fb_{f.name}") for f in fields],
    )
    joined = la.join(lb, [f"_bk_{c}" for c in bc])
    score = None
    for f_ in fields:
        w = F.when(
            F.col(f"_fa_{f_.name}") == F.col(f"_fb_{f_.name}"),
            F.lit(f_.w_agree_micro).cast("long"),
        ).otherwise(F.lit(f_.w_disagree_micro).cast("long"))
        score = w if score is None else score + w
    return joined.select(
        id_a,
        id_b,
        score.alias("score_micro"),
        F.when(score >= link_ge_micro, F.lit("link"))
        .otherwise(
            F.when(score <= nonlink_le_micro, F.lit("non_link")).otherwise(
                F.lit("possible")
            )
        )
        .alias("decision"),
    )


def fs_oracle_weights(fields: Sequence[FsField]) -> dict:
    """The exact integer literals for an SQL oracle — same Python
    rounding as the Spark plan, so both engines share one source."""
    return {
        f.name: (f.w_agree_micro, f.w_disagree_micro) for f in fields
    }
