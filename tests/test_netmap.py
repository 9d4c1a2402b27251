"""ip_block_join: bucket-equi-join range matching, longest-prefix
resolution, unrouted NULLs."""

import pytest
from pyspark.sql import functions as F

from langscrape_spark.operators.netmap import ip_block_join


def test_disjoint_blocks_match_and_unrouted(spark):
    ips = spark.createDataFrame(
        [("a", 5), ("b", 100), ("c", 200), ("d", 4_000_000_000)],
        "host string, ip long",
    )
    blocks = spark.createDataFrame(
        [(0, 63, "AS1"), (64, 127, "AS2"), (192, 255, "AS3")],
        "lo long, hi long, asn string",
    )
    out = ip_block_join(ips, blocks, bucket_bits=28)
    got = {r["host"]: (r["asn"], r["block_lo"]) for r in out.collect()}
    assert got == {
        "a": ("AS1", 0),
        "b": ("AS2", 64),
        "c": ("AS3", 192),
        "d": (None, None),  # unrouted
    }
    assert out.count() == 4


def test_longest_prefix_wins_with_id_col(spark):
    """Nested CIDRs: the /24-ish inner block beats the /8-ish outer."""
    ips = spark.createDataFrame(
        [("a", 10), ("b", 5000)], "host string, ip long"
    )
    blocks = spark.createDataFrame(
        [(0, 65535, "outer"), (0, 255, "inner")],
        "lo long, hi long, asn string",
    )
    out = ip_block_join(ips, blocks, bucket_bits=20, id_col="host")
    got = {r["host"]: r["asn"] for r in out.collect()}
    assert got == {"a": "inner", "b": "outer"}
    assert out.count() == 2


def test_wide_block_spans_buckets(spark):
    """A block wider than one bucket still matches IPs in every grain
    it covers (the explosion path)."""
    ips = spark.createDataFrame(
        [(i, i * 1_000_000) for i in range(10)], "host long, ip long"
    )
    blocks = spark.createDataFrame(
        [(0, 8_000_000, "wide")], "lo long, hi long, asn string"
    )
    out = ip_block_join(ips, blocks, ip_col="ip", bucket_bits=12)
    got = {r["host"]: r["asn"] for r in out.collect()}
    assert all(got[i] == "wide" for i in range(9))
    assert got[9] is None


def test_guards(spark):
    ips = spark.createDataFrame([("a", 1)], "host string, ip long")
    blocks = spark.createDataFrame(
        [(0, 10, "x")], "lo long, hi long, asn string"
    )
    with pytest.raises(ValueError, match="bucket_bits"):
        ip_block_join(ips, blocks, bucket_bits=0)
    with pytest.raises(ValueError, match="collides"):
        ip_block_join(ips.withColumn("block_lo", F.lit(1)), blocks)


def test_plan_is_broadcast_join(spark):
    """The exploded block side must plan as a broadcast hash join —
    the ip side never shuffles."""
    ips = spark.range(100).select(
        F.col("id").alias("host"), (F.col("id") * 7).alias("ip")
    )
    blocks = spark.createDataFrame(
        [(0, 350, "a"), (351, 700, "b")], "lo long, hi long, asn string"
    )
    out = ip_block_join(ips, blocks, bucket_bits=24)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
