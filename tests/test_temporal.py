"""asof_join: point-in-time semantics, ties, tolerance, NULL hygiene."""

import pytest
from pyspark.sql import functions as F

from langscrape_spark.operators.temporal import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    captures = spark.createDataFrame(
        [
            ("u1", 10, "a", 1),
            ("u1", 20, "b", 2),
            ("u1", 20, "b2", 9),  # duplicate ts — max-struct election
            ("u2", 5, "x", 7),
            (None, 3, "nullkey", 0),
            ("u3", None, "nullts", 0),
        ],
        "url string, ts int, fp string, round int",
    )
    probes = spark.createDataFrame(
        [
            (1, "u1", 5),
            (2, "u1", 10),
            (3, "u1", 15),
            (4, "u1", 25),
            (5, "u2", 100),
            (6, "u9", 50),
            (7, None, 50),
            (8, "u1", None),
        ],
        "pid int, url string, ts int",
    )
    return probes, captures


def _rows(df):
    return {
        r["pid"]: (r["capture_ts"], r["fp"], r["round"])
        for r in df.collect()
    }


def test_backward_inclusive_match(spark, frames):
    probes, captures = frames
    out = asof_join(
        probes, captures, key_col="url", ts_col="ts", value_cols=("fp", "round")
    )
    assert out.columns == ["pid", "url", "ts", "capture_ts", "fp", "round"]
    got = _rows(out)
    assert got[1] == (None, None, None)  # before first capture
    assert got[2] == (10, "a", 1)  # equal ts matches (inclusive)
    assert got[3] == (10, "a", 1)
    # duplicate capture ts=20 collapses to max(struct(fp, round)) = ("b2", 9)
    assert got[4] == (20, "b2", 9)
    assert got[5] == (5, "x", 7)
    assert got[6] == (None, None, None)  # key never captured
    assert got[7] == (None, None, None)  # NULL-key probe: no match
    assert got[8] == (None, None, None)  # NULL-ts probe: no match


def test_tolerance_nulls_stale_matches(spark, frames):
    probes, captures = frames
    out = asof_join(
        probes,
        captures,
        key_col="url",
        ts_col="ts",
        value_cols=("fp",),
        tolerance_sec=6,
    )
    got = {r["pid"]: (r["capture_ts"], r["fp"]) for r in out.collect()}
    assert got[2] == (10, "a")  # staleness 0 <= 6
    assert got[3] == (10, "a")  # staleness 5 <= 6
    assert got[4] == (20, "b2")  # staleness 5 <= 6
    assert got[5] == (None, None)  # staleness 95 > 6 — nulled


def test_probe_columns_passed_through_and_count_preserved(spark, frames):
    probes, captures = frames
    out = asof_join(
        probes, captures, key_col="url", ts_col="ts", value_cols=("fp",)
    )
    assert out.count() == probes.count()


def test_collision_guard(spark, frames):
    probes, captures = frames
    with pytest.raises(ValueError, match="collides"):
        asof_join(
            probes.withColumn("capture_ts", F.lit(1)),
            captures,
            key_col="url",
            ts_col="ts",
            value_cols=("fp",),
        )
    with pytest.raises(ValueError, match="missing"):
        asof_join(probes, captures, value_cols=("nope",))


def test_matches_duckdb_asof_semantics(spark, frames):
    """Cross-engine: the window form reproduces DuckDB's native
    ASOF LEFT JOIN (inclusive >=) row-for-row. NULL-ts probes are
    excluded — DuckDB sorts them NULLS LAST so they inherit the final
    capture, whereas asof_join defines NULL ts as unmatchable (pinned
    in test_backward_inclusive_match)."""
    duckdb = pytest.importorskip("duckdb")
    probes, captures = frames
    out = asof_join(
        probes.where(F.col("ts").isNotNull()),
        captures,
        key_col="url",
        ts_col="ts",
        value_cols=("fp", "round"),
    )
    got = {
        (r["pid"], r["capture_ts"], r["fp"], r["round"]) for r in out.collect()
    }
    con = duckdb.connect()
    con.execute(
        """
        CREATE TABLE c AS SELECT * FROM (VALUES
          ('u1', 10, 'a', 1), ('u1', 20, 'b', 2), ('u1', 20, 'b2', 9),
          ('u2', 5, 'x', 7), (NULL, 3, 'nullkey', 0),
          ('u3', NULL, 'nullts', 0)) t(url, ts, fp, round);
        CREATE TABLE p AS SELECT * FROM (VALUES
          (1, 'u1', 5), (2, 'u1', 10), (3, 'u1', 15), (4, 'u1', 25),
          (5, 'u2', 100), (6, 'u9', 50), (7, NULL, 50)) t(pid, url, ts);
        """
    )
    want = {
        tuple(r)
        for r in con.execute(
            """
            WITH cd AS (
              SELECT url, ts,
                     max(struct_pack(fp := fp, round := round)) AS v FROM c
              WHERE url IS NOT NULL AND ts IS NOT NULL GROUP BY url, ts),
            cc AS (SELECT url, ts, v.fp AS fp, v.round AS round FROM cd)
            SELECT p.pid, cc.ts, cc.fp, cc.round
            FROM p ASOF LEFT JOIN cc
              ON p.url = cc.url AND p.ts >= cc.ts
            """
        ).fetchall()
    }
    assert got == want
