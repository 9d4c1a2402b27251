"""IP→CIDR-block mapping: a range join executed as a broadcast
prefix-bucket equi-join.

Crawl schedulers and abuse/geo policy need every host's IP mapped to
its routing block (ASN, country, hosting provider): politeness is
often enforced per-ASN (one CDN fronts thousands of hostnames), and
block-level reputation feeds the frontier the same way
``detect_url_traps`` does. The reference has no network layer at all;
this is corpus-side enrichment for the pages/frontier tables.

The naive formulation is a non-equi join (``ip BETWEEN lo AND hi``)
— Spark plans that as BroadcastNestedLoopJoin: O(|ips|·|blocks|)
comparisons, catastrophic at 10^10 rows × 10^6 routes. The standard
fix (also how Trino/BigQuery users hand-optimize IP joins): quantize
both sides to a fixed prefix bucket — block rows explode to the
``2^bucket_bits``-grain buckets their range spans, probes compute one
bucket with a shift — then the join is an EQUI-join on bucket with
the BETWEEN demoted to a post-join filter. A real BGP table (~10^6
routes, almost all /16-or-longer) explodes to a few million rows —
comfortably broadcastable — so the ip side never shuffles at all:
scan → broadcast hash join → filter, whole-stage codegen throughout.

Overlapping blocks (CIDR nesting) are resolved longest-prefix-first
(smallest span wins) when ``id_col`` names a unique probe key — the
per-probe window is bounded by CIDR nesting depth (≤ 32 rows), never
corpus-scale. Without ``id_col`` the block table must be disjoint
(one match per ip) or matched rows fan out.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["ip_block_join"]


def ip_block_join(
    ips: DataFrame,
    blocks: DataFrame,
    ip_col: str = "ip",
    lo_col: str = "lo",
    hi_col: str = "hi",
    payload_cols: Sequence[str] = ("asn",),
    bucket_bits: int = 16,
    id_col: Optional[str] = None,
    broadcast_blocks: bool = True,
) -> DataFrame:
    """Left-join each probe row to the CIDR block containing its IP.

    ``ips``: any columns + ``ip_col`` (non-negative integer IPv4 as
    long). ``blocks``: ``lo_col``/``hi_col`` (inclusive range) +
    ``payload_cols``. Output = probe columns + ``block_lo`` +
    ``payload_cols`` (NULL when unrouted).

    ``bucket_bits`` trades explosion factor against bucket width: a
    block spanning ``2^(32-b)``-aligned grains emits one row per
    grain. 16 suits real route tables (blocks are mostly longer than
    /16); lower it when synthetic blocks are huge.
    """
    if not (0 < bucket_bits <= 32):
        raise ValueError("bucket_bits must be in (0, 32]")
    shift = 32 - bucket_bits
    pcols = list(ips.columns)
    for c in ("__bucket", "__lo", "__hi", "__rk", "block_lo", *payload_cols):
        if c in pcols:
            raise ValueError(
                f"probe column {c!r} collides with ip_block_join output"
            )

    blk = blocks.select(
        F.explode(
            F.sequence(
                F.shiftrightunsigned(F.col(lo_col).cast("long"), shift),
                F.shiftrightunsigned(F.col(hi_col).cast("long"), shift),
            )
        ).alias("__bucket"),
        F.col(lo_col).cast("long").alias("__lo"),
        F.col(hi_col).cast("long").alias("__hi"),
        *[F.col(c) for c in payload_cols],
    )
    if broadcast_blocks:
        blk = F.broadcast(blk)

    probe = ips.withColumn(
        "__bucket", F.shiftrightunsigned(F.col(ip_col).cast("long"), shift)
    )
    cond = (
        (probe["__bucket"] == blk["__bucket"])
        & (F.col(ip_col) >= blk["__lo"])
        & (F.col(ip_col) <= blk["__hi"])
    )
    out = probe.join(blk, cond, "left").select(
        *pcols,
        blk["__lo"].alias("block_lo"),
        blk["__hi"].alias("__hi"),
        *[blk[c] for c in payload_cols],
    )
    if id_col is not None:
        # Longest prefix (smallest span) wins; ≤ CIDR nesting depth
        # rows per probe, so the window is bounded by construction.
        # Payload columns break exact-duplicate-range ties (MOAS
        # prefixes: same lo/hi announced by two origins) so the
        # winner is deterministic across runs and partitionings.
        w = Window.partitionBy(id_col).orderBy(
            (F.col("__hi") - F.col("block_lo")).asc_nulls_last(),
            F.col("block_lo").asc_nulls_last(),
            *[F.col(c).asc_nulls_last() for c in payload_cols],
        )
        out = (
            out.withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") == 1)
            .drop("__rk")
        )
    return out.drop("__hi")
