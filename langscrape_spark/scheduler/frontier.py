"""The distributed URL-frontier scheduler (north-rule core).

Implements ``policy.py`` as pure DataFrame ops in a driver round loop
("spark-submit rounds"), checkpointing frontier + seen-set through
:class:`~langscrape_spark.sources.catalog.Catalog` every round so a
killed run resumes exactly (SURVEY.md §7 Phase 2/3).

Scale design (the parts that must survive 1000 executors / 10^10 urls):

- **Seen-set membership**: candidates are explicitly repartitioned by
  ``xxhash64(url)`` before a ``left_anti`` join against the seen table
  (north rule: "explicit repartitioning by url-hash before membership
  checks"). A JVM-side bloom filter built from the seen table
  (``bloom_filter_agg`` / ``might_contain``) pre-filters candidates so
  the exact anti-join shuffles only probable-new urls; the bloom's
  false positives are removed by the anti-join, so admission is exact.
- **Politeness with skew**: the per-host top-k window is two-phase:
  first rank within ``(host, salt)`` where ``salt = pmod(xxhash64(url),
  SALT_BUCKETS)`` and keep k per salt bucket, then rank the ≤ salt·k
  survivors per host exactly. Any url in a host's true top-k is
  necessarily in its salt bucket's top-k, so phase 1 never changes the
  admitted set — it only bounds the rows any single window partition
  sees, which is what kills the hot-host straggler (SURVEY.md §4.2).
- **Robots / host-rank**: kilobyte-to-megabyte dimension tables,
  ``F.broadcast`` joined.
- **Fetch**: the admitted batch (≤ batch_size rows) is broadcast
  against the pages table. In production the pages table is an Iceberg
  table bucketed by url-hash, giving storage-partitioned joins; a live
  crawl would replace this join with real fetches.
- **Per-round lineage**: each round appends per-partition row counts
  for the membership stage plus round totals to a metrics table.

Everything per-row-Python lives in the two kernel UDFs
(link extraction, url normalization); all shuffles are JVM-side.
"""

from __future__ import annotations

import json
import os
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.kernel import extract_links_udf, normalize_url_udf
from ..sources.catalog import Catalog
from .policy import BASE_BUDGET, DEFAULT_BATCH, DEFAULT_MAX_DEPTH, DEPTH_PENALTY

SALT_BUCKETS = 8
FRONTIER_DDL = "url string, host string, depth int, priority double"


@dataclass
class CrawlConfig:
    batch_size: int = DEFAULT_BATCH
    max_depth: int = DEFAULT_MAX_DEPTH
    max_rounds: int = 100
    seen_partitions: int = 32
    use_bloom: bool = True
    bloom_items: int = 1_000_000
    # Per-BUCKET bitset size for the partitioned bloom (must be a
    # multiple of 8; 2^23 bits = 1 MiB packed per bucket).
    bloom_bits: int = 8_388_608
    # Bucket count for the partitioned bloom; None → seen_partitions.
    # (The cogroup probe shuffles by pmod bucket id — a distinct
    # partitioning from the anti-join's xxhash64 repartition; matching
    # the counts keeps parallelism aligned, not exchanges shared.)
    bloom_buckets: Optional[int] = None
    # Below this seen-set size the bloom pre-filter costs more (full
    # seen scan + driver collect per round) than the shuffle it saves.
    bloom_min_seen: int = 2_000_000
    # Approximate-membership prefilter implementation once active:
    # "bloom" (default; SQL bloom or the partitioned bitset path) or
    # "cuckoo" (scheduler/cuckoo.py — same maybe/definitely-new
    # screen and admission exactness, but fingerprints are
    # DELETABLE, so a revisit sweep can re-open urls without a full
    # rebuild; geometry derives from bloom_items/bloom_buckets).
    # Both paths are admission-identical (schedule-md5 parity test).
    prefilter: str = "bloom"
    # When set, each round runs the extraction kernel over its fetched
    # batch and appends to the catalog's "results" table — the full
    # "scheduled+extracted per round" production shape. None keeps the
    # scheduler extraction-free (callers extract the schedule later).
    extract_field_map: Optional[Dict[str, Any]] = None
    # Fold seen deltas into one base snapshot every k rounds: without
    # compaction a months-long crawl accumulates one delta dir per
    # round and read_appended degrades into a file-listing scan.
    compact_every: int = 16
    # Exact-membership strategy.
    # "shuffle": anti-join candidates against a re-partitioned read of
    #   the whole seen set — ONE O(|seen|) shuffle of the seen side
    #   per round. Correct, simple, but at a 10^10-url seen set the
    #   per-round seen shuffle is the membership bottleneck.
    # "bucket_probe": seen deltas are stored dir-partitioned by
    #   pmod(xxhash64(url), seen_bucket_count) (the compacted base
    #   keeps the layout), and the exact check runs per bucket inside
    #   applyInPandas — each task direct-reads only its bucket's
    #   committed parquet files. The candidates shuffle once (they
    #   must anyway); the seen set NEVER crosses the network — its
    #   cost drops to a columnar one-column read of touched buckets.
    #   Equivalent admission (simulator-exact, tested); requires the
    #   catalog to have been written in this mode from round 0.
    membership: str = "shuffle"
    # Bucket count for the bucket_probe seen layout; None →
    # seen_partitions. Size it so one bucket's url set fits a worker
    # comfortably: |seen| · ~60 B/url / buckets ≤ a few hundred MB.
    seen_bucket_count: Optional[int] = None
    # Measured crossover for the probe (34-round soak + 262k-page A/B,
    # BASELINE.md): below this seen-set size the per-bucket file-open
    # overhead costs more than shuffling the whole (tiny) seen set, so
    # membership="bucket_probe" keeps the bucketed LAYOUT from round 0
    # but runs the exact check as the shuffle anti-join until |seen|
    # crosses this floor. Both strategies are admission-identical
    # (same schedule md5 over the full soak), so the switch never
    # changes the crawl.
    probe_min_seen: int = 200_000


@dataclass
class CrawlState:
    rounds_run: int = 0
    schedule: Optional[DataFrame] = None
    seen: Optional[DataFrame] = None
    metrics: List[Dict[str, Any]] = field(default_factory=list)


def _with_policy_columns(
    df: DataFrame, robots: DataFrame, host_rank: DataFrame
) -> DataFrame:
    """Insert-time policy: robots filter + priority. ``df`` must have
    (url, depth); adds host, priority; drops disallowed urls."""
    # try_parse_url, not parse_url: under ANSI mode (Spark 4 default)
    # parse_url THROWS on malformed urls — one bad discovered link
    # would kill the whole round. Invalid → NULL host → dropped below.
    df = df.withColumn("host", F.lower(F.try_parse_url(F.col("url"), F.lit("HOST"))))
    # RFC 9309 matches rules against path + optional query ('Disallow:
    # /*?sessionid=' must fire), so the match target keeps the query
    # string; an empty '?' is dropped like urlparse does. The simulator
    # mirrors this in its enqueue() target. nullif: a pathless url
    # ('https://h?a=1') parses to PATH='' (not NULL) — it must become
    # '/' like urlparse's `path or "/"`, or the two targets diverge.
    path_c = F.coalesce(
        F.nullif(F.try_parse_url(F.col("url"), F.lit("PATH")), F.lit("")),
        F.lit("/"),
    )
    query_c = F.try_parse_url(F.col("url"), F.lit("QUERY"))
    df = df.withColumn(
        "path",
        F.when(
            query_c.isNotNull() & (query_c != ""),
            F.concat(path_c, F.lit("?"), query_c),
        ).otherwise(path_c),
    ).where(F.col("host").isNotNull())  # simulator: host None → dropped
    if "rules" in robots.columns:
        # RFC 9309 robots table (scheduler/robots.py or
        # sources/robots.py): gate purely on the longest-match decision
        # — a `Disallow: /` host-kill is itself a rule, and an `Allow:`
        # carve-out can outrank it, which the legacy boolean cannot
        # express. One codegen fold per URL; no extra join.
        from .robots import robots_decision

        df = df.join(F.broadcast(robots), "host", "left").where(
            robots_decision(F.col("path"), F.col("rules"))
        )
    else:
        df = (
            df.join(F.broadcast(robots), "host", "left")
            .where(F.coalesce(F.col("allowed"), F.lit(True)))
            .where(
                ~F.coalesce(
                    F.exists(
                        "disallow_prefixes", lambda p: F.col("path").startswith(p)
                    ),
                    F.lit(False),
                )
            )
        )
    df = df.join(F.broadcast(host_rank), "host", "left").withColumn(
        "priority",
        F.coalesce(F.col("rank"), F.lit(0.0)) - F.lit(DEPTH_PENALTY) * F.col("depth"),
    )
    return df.select("url", "host", "depth", "priority")


def _politeness_admit(frontier: DataFrame, robots: DataFrame, batch_size: int) -> DataFrame:
    """Two-phase per-host top-k (salted exact pre-prune), then the
    global batch cap by the total order (priority desc, url asc)."""
    k_col = F.greatest(
        F.lit(1),
        F.floor(F.lit(BASE_BUDGET) / F.coalesce(F.col("crawl_delay"), F.lit(1.0))),
    ).cast("int")
    cand = frontier.join(
        F.broadcast(robots.select("host", "crawl_delay")), "host", "left"
    ).withColumn("k", k_col)

    order = [F.desc("priority"), F.asc("url")]
    # Phase 1: cap each (host, salt) bucket at k — exactness-preserving
    # prune that bounds any single window partition on a hot host.
    salted = Window.partitionBy(
        "host", F.pmod(F.xxhash64("url"), F.lit(SALT_BUCKETS))
    ).orderBy(*order)
    cand = cand.withColumn("rn_salt", F.row_number().over(salted)).where(
        F.col("rn_salt") <= F.col("k")
    )
    # Phase 2: exact per-host top-k over the ≤ SALT_BUCKETS·k survivors.
    per_host = Window.partitionBy("host").orderBy(*order)
    cand = cand.withColumn("rn", F.row_number().over(per_host)).where(
        F.col("rn") <= F.col("k")
    )
    # Global cap: distributed TakeOrdered, then seq over ≤ batch_size rows.
    admitted = cand.select("url", "host", "depth", "priority").orderBy(*order).limit(
        batch_size
    )
    seq_w = Window.orderBy(*order)  # bounded input: ≤ batch_size rows
    return admitted.withColumn("seq", F.row_number().over(seq_w) - 1)


_BLOOM_SQL_AVAILABLE: Optional[bool] = None


def _bloom_sql_available(spark: SparkSession) -> bool:
    """``bloom_filter_agg``/``might_contain`` are internal expressions;
    registration varies by build. Detect once per process. When absent,
    the engine still gets bloom pre-filtering from Catalyst's runtime
    bloom-filter injection (enabled in session.py), plus the exact
    anti-join below."""
    global _BLOOM_SQL_AVAILABLE
    if _BLOOM_SQL_AVAILABLE is None:
        try:
            _BLOOM_SQL_AVAILABLE = spark.catalog.functionExists(
                "might_contain"
            ) and spark.catalog.functionExists("bloom_filter_agg")
        except Exception:
            _BLOOM_SQL_AVAILABLE = False
    return _BLOOM_SQL_AVAILABLE


def _bloom_prefilter(
    spark: SparkSession, candidates: DataFrame, seen: DataFrame, cfg: CrawlConfig
) -> DataFrame:
    """Explicit JVM bloom pre-filter (used when the SQL functions are
    registered): candidates the bloom rules out skip the exact anti-join
    entirely; false positives fall through to it, so admission stays
    exact."""
    # bloom_bits is PER-BUCKET for the partitioned path; the single
    # global SQL bloom gets the equivalent total capacity (bits × nb),
    # else the same config would build a ~nb× weaker filter here.
    nb = cfg.bloom_buckets or cfg.seen_partitions
    # bloom_filter_agg silently CLAMPS numBits to
    # spark.sql.optimizer.runtime.bloomFilter.maxNumBits (default 2^26)
    # — without raising it, a 2^28-bit request builds a ~4× weaker
    # filter (admission stays exact via the anti-join, but more
    # candidates fall through). Raise the conf to the request.
    try:
        cur = int(
            spark.conf.get(
                "spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "67108864"
            )
        )
        want = cfg.bloom_bits * nb
        if want > cur:
            spark.conf.set(
                "spark.sql.optimizer.runtime.bloomFilter.maxNumBits", str(want)
            )
    except Exception:
        pass  # conf locked down: the clamp only weakens, never breaks
    bloom_row = seen.select(
        F.expr(
            f"bloom_filter_agg(xxhash64(url), "
            f"cast({cfg.bloom_items} as bigint), "
            f"cast({cfg.bloom_bits * nb} as bigint)) as bf"
        )
    ).collect()[0]
    bf = bloom_row["bf"]
    if bf is None:
        return candidates.withColumn("maybe_seen", F.lit(False))
    bf_df = spark.createDataFrame([(bytearray(bf),)], "bf binary")
    return candidates.join(F.broadcast(bf_df)).withColumn(
        "maybe_seen", F.expr("might_contain(bf, xxhash64(url))")
    ).drop("bf")


_BLOOM_K = 3  # hash functions per key


def _bloom_positions(m_bits: int):
    """k bit positions per url, computed JVM-side with ``xxhash64`` so
    build and probe agree without a Python xxhash implementation."""
    return F.array(
        *[
            F.pmod(F.xxhash64(F.col("url"), F.lit(i)), F.lit(m_bits))
            for i in range(_BLOOM_K)
        ]
    )


# ---------------------------------------------------------------------------
# Partitioned bloom filter (the no-driver-collect scale path)
# ---------------------------------------------------------------------------
# One bitset per url-hash bucket, stored as a bucket-PARTITIONED
# parquet directory beside the seen checkpoint:
# - BUILD (once, on activation or state mismatch): explode each seen
#   url's k bit positions, distinct, pack per bucket with a grouped
#   pandas apply — one equi-shuffle, nothing on the driver.
# - MERGE (per round): only the buckets the round's new urls TOUCH are
#   rewritten, via dynamic partition overwrite — per-round I/O is
#   O(touched buckets), never O(total bloom) (a full versioned-snapshot
#   rewrite per round would reintroduce the full-copy-per-round cost
#   class the seen table's delta design exists to avoid).
# - PROBE: candidates cogrouped with their bucket's bitset — the bits
#   travel once per bucket, never once per candidate row (a plain join
#   would replicate a MiB-scale bitset onto every row).
# Crash-safety: the `_STATE` marker (round + GEOMETRY: bits/buckets/k)
# is INVALIDATED before each merge write and re-stamped after it.
# Required because dynamic partition overwrite deletes each matched
# bucket dir before renaming staged files at job commit — a kill
# inside that window leaves a bucket MISSING (false negatives, NOT a
# superset), which a stale marker would wrongly validate. With the
# invalidate-write-stamp order, every crash point resolves to either
# the previous committed bloom or a full rebuild from the committed
# seen set (`test_bloom_crash_inside_merge_overwrite_forces_rebuild`).
# A geometry or round mismatch in `_STATE` likewise forces a rebuild
# (probing with the wrong modulus would produce false NEGATIVES).


def _bloom_layout(cfg: CrawlConfig) -> tuple:
    """(n_buckets, bits_per_bucket) — the single source of the bloom
    geometry; build, merge and probe must all agree on it."""
    return (cfg.bloom_buckets or cfg.seen_partitions, cfg.bloom_bits)


def _bloom_bucket_col(n_buckets: int):
    return F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int")


def _bucketed_positions(urls: DataFrame, cfg: CrawlConfig) -> DataFrame:
    nb, m = _bloom_layout(cfg)
    return urls.select(
        _bloom_bucket_col(nb).alias("bucket"),
        F.explode(_bloom_positions(m)).alias("p"),
    ).distinct()


def _pack_bits(m_bits: int, positions, prev: bytes | None = None) -> bytes:
    import numpy as np

    bits = (
        np.unpackbits(np.frombuffer(prev, dtype=np.uint8))
        if prev is not None
        else np.zeros(m_bits, dtype=np.uint8)
    )
    if len(positions):
        bits[np.asarray(positions, dtype=np.int64)] = 1
    return np.packbits(bits).tobytes()


def _build_bloom_df(urls: DataFrame, cfg: CrawlConfig) -> DataFrame:
    import pandas as pd

    _, m = _bloom_layout(cfg)

    def pack(pdf):
        return pd.DataFrame(
            {
                "bucket": [int(pdf["bucket"].iloc[0])],
                "bits": [_pack_bits(m, pdf["p"].to_numpy())],
            }
        )

    return (
        _bucketed_positions(urls, cfg)
        .groupBy("bucket")
        .applyInPandas(pack, "bucket int, bits binary")
    )


def _merge_bloom_df(
    bloom: DataFrame,
    new_urls: DataFrame,
    cfg: CrawlConfig,
    changed_only: bool = False,
) -> DataFrame:
    """OR the new urls' bit positions into the stored bitsets.
    ``changed_only=True`` emits only buckets that received new
    positions (the dynamic-partition-overwrite merge unit); the default
    emits the full merged table (build ≡ merge-with-empty — pinned by
    test_partitioned_bloom_merge_equals_rebuild)."""
    import pandas as pd

    _, m = _bloom_layout(cfg)
    new_pos = _bucketed_positions(new_urls, cfg)

    def merge(key, bloom_pdf, pos_pdf):
        if changed_only and not len(pos_pdf):
            return pd.DataFrame({"bucket": [], "bits": []}).astype(
                {"bucket": "int32", "bits": "object"}
            )
        prev = bytes(bloom_pdf["bits"].iloc[0]) if len(bloom_pdf) else None
        return pd.DataFrame(
            {
                "bucket": [int(key[0])],
                "bits": [_pack_bits(m, pos_pdf["p"].to_numpy(), prev)],
            }
        )

    return (
        bloom.groupBy("bucket")
        .cogroup(new_pos.groupBy("bucket"))
        .applyInPandas(merge, "bucket int, bits binary")
    )


def _partitioned_bloom_probe(
    candidates: DataFrame, bloom: DataFrame, cfg: CrawlConfig
) -> DataFrame:
    import numpy as np
    import pandas as pd

    nb, m = _bloom_layout(cfg)
    cand = candidates.withColumn("_bucket", _bloom_bucket_col(nb)).withColumn(
        "_pos", _bloom_positions(m)
    )
    out_cols = candidates.columns
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in candidates.schema.fields
    ) + ", maybe_seen boolean"

    def probe(key, cand_pdf, bloom_pdf):
        if not len(cand_pdf):
            return pd.DataFrame(columns=out_cols + ["maybe_seen"])
        out = cand_pdf[out_cols].copy()
        if not len(bloom_pdf):
            out["maybe_seen"] = False
            return out
        bits = np.unpackbits(
            np.frombuffer(bytes(bloom_pdf["bits"].iloc[0]), dtype=np.uint8)
        ).astype(bool)
        # one vectorized gather for the whole group (k positions per
        # url), not a per-row python loop — this IS the hot path
        pos = np.vstack(cand_pdf["_pos"].to_numpy())
        out["maybe_seen"] = bits[pos].all(axis=1)
        return out

    return (
        cand.groupBy("_bucket")
        .cogroup(bloom.groupBy("bucket"))
        .applyInPandas(probe, out_schema)
    )


# -- bloom storage (bucket-partitioned dir + atomic state marker) -----------

def _bloom_dir(catalog: Catalog) -> str:
    import os

    return os.path.join(catalog.root, "bloom_parts")


def _bloom_state(catalog: Catalog):
    import json
    import os

    try:
        with open(os.path.join(_bloom_dir(catalog), "_STATE")) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def _write_bloom_state(catalog: Catalog, round_no: int, cfg: CrawlConfig) -> None:
    import json
    import os

    nb, m = _bloom_layout(cfg)
    os.makedirs(_bloom_dir(catalog), exist_ok=True)
    path = os.path.join(_bloom_dir(catalog), "_STATE")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"round": round_no, "bits": m, "buckets": nb, "k": _BLOOM_K}, f)
    os.replace(tmp, path)  # atomic; leading '_' keeps parquet readers away


def _invalidate_bloom_state(catalog: Catalog) -> None:
    """Remove the state marker so any crash before the next stamp
    forces ``_ensure_bloom``'s full rebuild from the committed seen
    set. Required around the merge write: dynamic partition overwrite
    DELETES each matched bucket dir before renaming staged files at
    job commit, so a kill inside that commit window can leave a bucket
    MISSING (a false-NEGATIVE source, not a superset) while a stale
    _STATE would still validate it."""
    import os

    try:
        os.remove(os.path.join(_bloom_dir(catalog), "_STATE"))
    except FileNotFoundError:
        pass


def _bloom_state_current(catalog: Catalog, cfg: CrawlConfig, round_no: int) -> bool:
    nb, m = _bloom_layout(cfg)
    return _bloom_state(catalog) == {
        "round": round_no, "bits": m, "buckets": nb, "k": _BLOOM_K,
    }


def _ensure_bloom(
    catalog: Catalog, seen: DataFrame, cfg: CrawlConfig, round_no: int
) -> DataFrame:
    """Return the bloom at ``round_no``, rebuilding from the full seen
    set when the state marker is absent, for a different round (bloom
    was inactive, or a torn attempt), or for a DIFFERENT GEOMETRY —
    probing a bitset with the wrong modulus/bucket count would yield
    false negatives, the one failure admission-exactness can't absorb."""
    spark = seen.sparkSession
    if not _bloom_state_current(catalog, cfg, round_no):
        (
            _build_bloom_df(seen.select("url"), cfg)
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(_bloom_dir(catalog))
        )
        _write_bloom_state(catalog, round_no, cfg)
    return spark.read.parquet(_bloom_dir(catalog))


def _advance_bloom(
    catalog: Catalog,
    bloom: DataFrame,
    new_urls: DataFrame,
    cfg: CrawlConfig,
    next_round: int,
) -> None:
    """Fold the round's new urls in and commit the state marker.
    Only touched buckets are rewritten (dynamic partition overwrite);
    the changed set is localCheckpoint-ed first because Spark refuses
    to overwrite a path that appears as a source in the write's own
    plan (the merge reads the same directory)."""
    changed = _merge_bloom_df(
        bloom, new_urls, cfg, changed_only=True
    ).localCheckpoint(eager=True)
    # Invalidate-then-write-then-stamp: the overwrite's commit window
    # (bucket dir deleted, staged file not yet renamed) is the one
    # crash point where the stored bloom is NOT a superset of the
    # committed seen set. With _STATE gone during the window, any
    # crash inside it resolves to a full rebuild on resume instead of
    # probing a bloom with a silently-missing bucket (false negatives
    # ⇒ the exact anti-join is skipped ⇒ duplicate admissions).
    _invalidate_bloom_state(catalog)
    (
        changed.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(_bloom_dir(catalog))
    )
    _write_bloom_state(catalog, next_round, cfg)


# -- cuckoo prefilter storage (deletion-capable bloom alternative) ----------
# Same bucket-partitioned dir + invalidate-write-stamp marker protocol
# as the bloom (see the crash-safety discussion above _bloom_layout):
# a geometry or round mismatch forces a rebuild from the committed
# seen set, and any crash inside the dynamic-partition-overwrite
# window resolves to that rebuild rather than probing a state with a
# silently-missing bucket.


def _cuckoo_cfg(cfg: CrawlConfig, n_seen: int = 0):
    """CuckooConfig sized for ``max(bloom_items, bloom_min_seen,
    n_seen)`` urls at <=0.84 load (b=4, 16-bit fingerprints — FPP
    ~1.2e-4, far below the bloom's; memory 2 bytes/slot vs the
    bitset's bloom_bits/8).

    ``bloom_min_seen`` is in the max because the prefilter only
    activates once the seen set reaches it — sizing from
    ``bloom_items`` alone (the old behavior) would build the filter
    at ~0.95+ nominal load on first activation and hard-saturate
    every shard to all-maybe immediately.  ``n_seen`` (the live seen
    count at build time) keeps it sized as the crawl grows: ``m`` is
    rounded up to a power of two, so the derived geometry is stable
    until the count crosses the next sizing boundary, at which point
    the ``_STATE`` marker mismatch forces one rebuild with doubled
    ``m`` — amortized-doubling growth, O(log) rebuilds over a crawl's
    life, never silent saturation."""
    import math

    from .cuckoo import CuckooConfig

    nb = cfg.bloom_buckets or cfg.seen_partitions
    target = max(cfg.bloom_items, cfg.bloom_min_seen, int(n_seen))
    per_bucket = max(1024, target // max(nb, 1))
    m = 1 << max(8, math.ceil(math.log2(per_bucket / 4 / 0.84)))
    return CuckooConfig(n_buckets=nb, m=m, b=4, fbits=16)


def _cuckoo_dir(catalog: Catalog) -> str:
    import os

    return os.path.join(catalog.root, "cuckoo_parts")


def _cuckoo_marker(ccfg, round_no: int) -> dict:
    return {
        "round": round_no,
        "m": ccfg.m,
        "b": ccfg.b,
        "fbits": ccfg.fbits,
        "buckets": ccfg.n_buckets,
        # In-bucket index-derivation version: v2 decorrelated the home
        # bucket i1 from the shard key's low hash bits (cuckoo.py::
        # _fp_i1_i2).  Blobs written under v1 place fingerprints at
        # different indices, so a version drift must rebuild, exactly
        # like any other geometry change.
        "i1v": 2,
    }


def _cuckoo_state_read(catalog: Catalog):
    import json
    import os

    try:
        with open(os.path.join(_cuckoo_dir(catalog), "_STATE")) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def _write_cuckoo_state(catalog: Catalog, round_no: int, ccfg) -> None:
    import json
    import os

    path = os.path.join(_cuckoo_dir(catalog), "_STATE")
    tmp = path + ".tmp"
    os.makedirs(_cuckoo_dir(catalog), exist_ok=True)
    with open(tmp, "w") as f:
        json.dump(_cuckoo_marker(ccfg, round_no), f)
    os.replace(tmp, path)


def _invalidate_cuckoo_state(catalog: Catalog) -> None:
    import contextlib
    import os

    with contextlib.suppress(OSError):
        os.remove(os.path.join(_cuckoo_dir(catalog), "_STATE"))


def _ensure_cuckoo(
    catalog: Catalog,
    seen: DataFrame,
    cfg: CrawlConfig,
    round_no: int,
    n_seen: int = 0,
) -> DataFrame:
    """Return the cuckoo state at ``round_no``, rebuilding from the
    full committed seen set on marker absence, round drift or a
    geometry change — the same failure classes that force a bloom
    rebuild (probing with wrong geometry would manufacture false
    negatives, which admission exactness cannot absorb).  ``n_seen``
    (the live seen count) feeds the capacity sizing: when the crawl
    outgrows the stored geometry the marker comparison fails here and
    the state rebuilds with doubled ``m`` (see _cuckoo_cfg)."""
    from .cuckoo import cuckoo_build

    spark = seen.sparkSession
    ccfg = _cuckoo_cfg(cfg, n_seen)
    if _cuckoo_state_read(catalog) != _cuckoo_marker(ccfg, round_no):
        (
            cuckoo_build(seen.select("url"), ccfg)
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(_cuckoo_dir(catalog))
        )
        _write_cuckoo_state(catalog, round_no, ccfg)
    return spark.read.parquet(_cuckoo_dir(catalog))


def _advance_cuckoo(
    catalog: Catalog,
    state: DataFrame,
    new_urls: DataFrame,
    cfg: CrawlConfig,
    next_round: int,
    n_seen: int = 0,
) -> None:
    """Insert the round's new urls (each url is new-by-construction —
    it passed the exact membership check — so the insert-once caller
    contract of cuckoo_update holds) and commit the marker. Only
    touched buckets rewrite (dynamic partition overwrite), with the
    bloom's invalidate-write-stamp crash protocol.  ``n_seen`` must be
    the SAME value the round's _ensure_cuckoo used (the seen count at
    round start): updates must run under the stored state's geometry;
    growth is handled by the NEXT round's ensure/rebuild, never by an
    in-place geometry change."""
    from .cuckoo import cuckoo_update

    ccfg = _cuckoo_cfg(cfg, n_seen)
    changed = cuckoo_update(
        state, new_urls, ccfg, changed_only=True
    ).localCheckpoint(eager=True)
    _invalidate_cuckoo_state(catalog)
    (
        changed.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(_cuckoo_dir(catalog))
    )
    _write_cuckoo_state(catalog, next_round, ccfg)


# -- exact membership via bucket probe (no seen-side shuffle) ---------------

def _seen_bucket_expr(cfg: CrawlConfig):
    nb = cfg.seen_bucket_count or cfg.seen_partitions
    return F.pmod(F.xxhash64("url"), F.lit(nb)).cast("int")


def _seen_layout_path(catalog: Catalog) -> str:
    return os.path.join(catalog.root, "seen", "_BUCKET_LAYOUT")


def _check_seen_layout(catalog: Catalog, cfg: CrawlConfig) -> None:
    """Geometry guard for the bucket_probe seen layout: the bucket
    count is baked into every committed dir name, so a resume with a
    different ``seen_bucket_count``/``seen_partitions`` would probe the
    WRONG buckets — false negatives, duplicate admissions, silent
    schedule divergence (the same failure class the bloom's ``_STATE``
    geometry stamp guards against). First bucketed write records the
    count; every later write and every probe refuses on mismatch."""
    nb = int(cfg.seen_bucket_count or cfg.seen_partitions)
    path = _seen_layout_path(catalog)
    try:
        with open(path) as f:
            recorded = int(json.load(f)["buckets"])
    except (OSError, ValueError, KeyError):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"buckets": nb}, f)
        os.replace(tmp, path)
        return
    if recorded != nb:
        raise ValueError(
            f"membership='bucket_probe' seen layout was written with "
            f"{recorded} buckets but this run is configured for {nb}; "
            f"resume with the original bucket count (or rebuild the "
            f"seen table) — probing a mismatched layout would silently "
            f"re-admit seen urls"
        )


def _append_seen(
    catalog: Catalog, urls: DataFrame, version: int, cfg: CrawlConfig
) -> None:
    """Write a seen-set delta in the layout the configured membership
    strategy reads: flat for "shuffle", ``bucket=K/`` dir-partitioned
    (stable url-hash) for "bucket_probe"."""
    if cfg.membership == "bucket_probe":
        _check_seen_layout(catalog, cfg)
        catalog.append(
            "seen",
            urls.select("url", _seen_bucket_expr(cfg).alias("bucket")),
            version,
            partition_cols=["bucket"],
        )
    else:
        catalog.append("seen", urls.select("url"), version)


def _seen_bucket_files(catalog: Catalog, round_no: int) -> dict:
    """bucket id → committed seen parquet files, listed from exactly
    the dirs a ``read_appended("seen", round_no)`` would union (base +
    deltas), so the probe sees the identical committed state.

    Local filesystem only in this sandbox; production runs this
    against the object store via the same listing (or swaps to
    Iceberg's storage-partitioned join, which is this pattern with
    the listing done by the table format)."""
    files: dict = {}
    for d in catalog.appended_dirs("seen", round_no):
        if "://" in d:
            raise NotImplementedError(
                "bucket_probe file listing implemented for local paths; "
                "use Iceberg storage-partitioned joins on a cluster"
            )
        for sub in sorted(os.listdir(d)):
            full = os.path.join(d, sub)
            if sub.startswith("bucket=") and os.path.isdir(full):
                b = int(sub.split("=", 1)[1])
                files.setdefault(b, []).extend(
                    os.path.join(full, f)
                    for f in sorted(os.listdir(full))
                    if f.endswith(".parquet")
                )
            elif sub.endswith(".parquet"):
                raise ValueError(
                    f"seen delta {d!r} is flat, not bucket-partitioned: "
                    "membership='bucket_probe' requires a catalog "
                    "written in bucket mode from round 0"
                )
    return files


def _bucket_probe_anti_join(
    spark: SparkSession, cand: DataFrame, bucket_files: dict, cfg: CrawlConfig
) -> DataFrame:
    """``cand`` minus the seen set, WITHOUT shuffling the seen set:
    candidates group by the stable url-hash bucket (one shuffle of the
    small side), and each task direct-reads only its own bucket's
    committed parquet files (one column, no exchange). Bit-exact with
    the shuffle anti-join: the bucket expr matches the write layout,
    and membership is a plain string-equality set test."""
    import pandas as pd  # noqa: F401 (applyInPandas contract)
    import pyarrow.parquet as pq

    out_cols = list(cand.columns)
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in cand.schema.fields
    )
    bf = spark.sparkContext.broadcast(bucket_files)

    def probe(key, pdf):
        paths = bf.value.get(int(key[0]), [])
        if not len(pdf) or not paths:
            return pdf[out_cols]
        seen_urls = set(
            pq.read_table(paths, columns=["url"]).column("url").to_pylist()
        )
        return pdf.loc[~pdf["url"].isin(seen_urls), out_cols]

    return (
        cand.withColumn("_pb_bucket", _seen_bucket_expr(cfg))
        .groupBy("_pb_bucket")
        .applyInPandas(probe, schema)
    )


def sweep_revisit(
    spark: SparkSession,
    catalog: Catalog,
    due: DataFrame,
    robots: DataFrame,
    host_rank: DataFrame,
    cycle_id: str,
) -> int:
    """Between-submission revisit sweep — the production consumer of
    ``revisit_schedule`` (q48) and the north rule's "re-admit pages
    due for revisit": inject the due urls back into the COMMITTED
    frontier so the next ``run_crawl`` submission fetches them again
    under normal politeness.  Returns the number of urls injected.

    Semantics (why injection, not seen-set deletion): the seen table
    is append-only by design (per-round deltas, compaction — a
    tombstone mechanism would complicate every membership path), and
    a revisit means "fetch this KNOWN url once more", not "forget it
    was ever seen".  Injecting into the frontier achieves exactly
    that: politeness admits the url again, its re-fetch re-harvests
    links, and any link-rediscovery of the url while it waits in the
    frontier is correctly suppressed by the (unchanged) seen check.
    The deletion-capable cuckoo prefilter (scheduler/cuckoo.py, q187)
    exists for the stronger design where the seen set itself revokes
    entries; this sweep does not need it.

    Idempotent and crash-safe, at THREE levels:

    - within one sweep attempt: urls are normalized with the crawl's
      own kernel, restricted to urls actually in the seen set (an
      unknown url belongs in a seed list, not a revisit sweep), and
      anti-joined against the current frontier, so a crash-replay of
      the sweep itself injects nothing twice;
    - the frontier snapshot edit uses ``Catalog.write_replace`` — the
      sweep rewrites the COMMITTED version (unlike the round loop,
      which always writes round+1), and a plain overwrite would
      delete the only copy of the committed crawl state before the
      new files land; write_replace stages, renames, and heals, so
      no crash point loses the frontier;
    - across a crashed-and-resubmitted *submission*: the REQUIRED
      ``cycle_id`` names this revisit cycle, and an applied-cycle
      marker (``Catalog.put_marker``) records that the cycle was
      already swept.  Without it, "sweep then N rounds then crash
      then resubmit the identical command" would re-inject urls the
      earlier rounds already refetched (they are no longer in the
      frontier, so the anti-join alone cannot know).  The id must be
      explicit because no default is safe in both directions: a
      content fingerprint of the due set would turn legitimate
      periodic re-sweeps of an identical url list into silent
      permanent no-ops, while no marker at all re-injects on every
      crashed resubmission.  Use the schedule's ``as_of`` date
      (``sources/sitemap.py::revisit_schedule`` already has one) —
      a retry of a crashed submission naturally reuses it, the next
      week's cycle naturally gets a new one."""
    round_no = catalog.committed_round()
    if round_no is None:
        raise ValueError(
            "sweep_revisit needs a committed crawl (seed run_crawl first)"
        )
    marker = f"revisit_applied_{cycle_id}"
    if catalog.has_marker(marker):  # validates cycle_id spelling too
        return 0
    frontier = catalog.read("frontier", round_no)
    seen = catalog.read_appended("seen", round_no)
    if frontier is None or seen is None:
        raise ValueError(f"catalog has no frontier/seen at round {round_no}")
    due_n = (
        due.select(normalize_url_udf(F.col("url")).alias("url"))
        .where(F.col("url").isNotNull())
        .dropDuplicates(["url"])
    )
    inject = (
        due_n.join(seen.select("url"), "url", "inner")
        .join(frontier.select("url"), "url", "left_anti")
        .withColumn("depth", F.lit(0))
    )
    # One materialization feeds union AND count (the pipeline above —
    # normalize UDF + seen join + anti-join + policy joins — is the
    # sweep's dominant cost and must not run twice).  The union
    # itself needs NO checkpoint: write_replace stages into a sibling
    # dir, so the frontier files it reads stay intact for the whole
    # staging write.
    entries = _with_policy_columns(inject, robots, host_rank).select(
        *frontier.columns
    ).localCheckpoint(eager=True)
    n_injected = int(entries.count())
    if n_injected:
        catalog.write_replace(
            "frontier", frontier.unionByName(entries), round_no
        )
    # Marker AFTER the frontier write: a crash before it replays the
    # sweep, where the anti-join (frontier now holds the urls) makes
    # the replay an empty injection — and the n_injected guard above
    # then skips the frontier-sized rewrite on that replay path.
    catalog.put_marker(marker)
    entries.unpersist()
    return n_injected


def run_crawl(
    spark: SparkSession,
    pages: DataFrame,
    seeds: DataFrame,
    robots: DataFrame,
    host_rank: DataFrame,
    catalog: Catalog,
    cfg: CrawlConfig = CrawlConfig(),
    traps: Optional[DataFrame] = None,
) -> CrawlState:
    """Drive the crawl to frontier exhaustion (or ``max_rounds``),
    checkpointing every round. Restartable: if the catalog already has
    committed rounds, the loop resumes after the last committed one.

    ``traps`` (optional) engages the trap frontier filter: a
    ``detect_url_traps``-shaped frame of flagged ``(host, template,
    is_trap)`` rows (q50's explosion detector, q166's DUST study,
    q209's path-entropy ranking all emit this shape).  Flagged urls
    are dropped at BOTH frontier entry points — the seed list and
    each round's link harvest — before the membership check, so a
    trap url is never admitted, never marked seen, and costs no
    politeness slot.  Opt-in, like ``membership="bucket_probe"``:
    admission semantics stay simulator-verified either way
    (``simulate_crawl(..., traps=...)`` mirrors the filter;
    equivalence pinned in test_scheduler.py)."""
    from ..operators.urls import trap_filter
    if cfg.prefilter not in ("bloom", "cuckoo"):
        # fail LOUD before any work: a typo would silently run the
        # bloom path while the caller believes deletion-capable
        # cuckoo state is being maintained for a later revisit sweep
        raise ValueError(
            f"unknown prefilter {cfg.prefilter!r}; "
            "expected 'bloom' or 'cuckoo'"
        )
    state = CrawlState()

    start_round = catalog.committed_round()
    if start_round is None:
        # Round -1: seed the frontier. Normalization is the same kernel
        # function the simulator uses (byte-identical url identity).
        normed = seeds.select(
            F.col("url").alias("raw_url"),
            normalize_url_udf(F.col("url")).alias("url"),
            F.col("depth"),
        )
        # invalid seeds → quarantine table, not an exception (SURVEY
        # §2.2: a poison row must never kill the run)
        catalog.append(
            "quarantine",
            normed.where(F.col("url").isNull()).select(
                F.col("raw_url").alias("url"),
                F.lit("invalid_url").alias("reason"),
            ),
            0,
        )
        seeded = (
            normed.where(F.col("url").isNotNull())
            .select("url", "depth")
            .dropDuplicates(["url"])
        )
        if traps is not None:
            seeded = trap_filter(seeded, traps)
        frontier0 = _with_policy_columns(seeded, robots, host_rank)
        catalog.write("frontier", frontier0, 0)
        # seen is a *delta* table: round k's delta holds only the urls
        # first enqueued entering round k. Rewriting the full seen-set
        # every round would be O(rounds · |seen|) I/O — quadratic over
        # a crawl, unusable at a 10^10-url frontier.
        _append_seen(catalog, frontier0, 0, cfg)
        catalog.commit_round(0)
        start_round = 0

    # Seen-set cardinality, maintained in the driver across rounds so
    # bloom-vs-antijoin can be decided without a count job. One count
    # on (re)start, then updated from each round's n_new.
    total_seen = None

    for round_no in range(start_round, cfg.max_rounds):
        t0 = time.time()
        frontier = catalog.read("frontier", round_no)
        if frontier is None:
            break
        if total_seen is None:
            total_seen = catalog.read_appended("seen", round_no).count()

        # Round caches released in `finally`: an exception anywhere in
        # the round body (including a checkpoint-write failure re-raised
        # before commit) or the terminal empty-admission break must not
        # leak cached batches into executor storage across retries.
        admitted = _politeness_admit(frontier, robots, cfg.batch_size).cache()
        cached_cand = None
        probed_cache = None
        new_entries = None
        # Per-phase wall timings (driver-side diagnostics only — the
        # metrics *table* schema is unchanged): lets the scaling bench
        # attribute non-scaling round cost to a specific phase instead
        # of guessing (admit window vs extraction vs membership vs
        # checkpoint I/O).
        phases: dict = {}
        try:
            tp = time.time()
            n_admitted = admitted.count()
            phases["admit"] = round(time.time() - tp, 3)
            if n_admitted == 0:
                break

            # --- fetch (pages-table join stand-in) + link expansion -------
            # Inner join with the tiny admitted batch broadcast: fetch
            # misses contribute no links, and Spark can build the hash side
            # from the broadcast batch (a left-outer here would forbid
            # broadcasting the admitted side and force a full shuffle).
            # NOTE (measured, do not "fix"): links and the optional
            # extraction below deliberately run SEPARATE broadcast-join
            # scans of the pages table. Fusing them through one cached
            # full-column batch was A/B-measured 2.5x SLOWER end-to-end —
            # serializing html-heavy rows into executor storage costs more
            # than the second pruned parquet scan it saves.
            fetched = pages.select("url", "html").join(F.broadcast(admitted), "url", "inner")
            links = (
                fetched
                .select(
                    F.explode(extract_links_udf(F.col("html"), F.col("url"))).alias("url"),
                    (F.col("depth") + 1).alias("depth"),
                )
                .where(F.col("depth") <= cfg.max_depth)
                .groupBy("url")
                .agg(F.min("depth").alias("depth"))
            )

            # --- per-round extraction (optional) ---------------------------
            if cfg.extract_field_map is not None:
                from ..plans.extract import extract_pages

                tp = time.time()
                batch_pages = pages.join(
                    F.broadcast(admitted.select("url")), "url", "inner"
                )
                catalog.append(
                    "results",
                    extract_pages(batch_pages, cfg.extract_field_map).withColumn(
                        "round", F.lit(round_no)
                    ),
                    round_no,
                )
                phases["extract"] = round(time.time() - tp, 3)

            # --- seen membership: explicit url-hash repartition + bloom ----
            seen = catalog.read_appended("seen", round_no)
            # Cached: consumed by both bloom branches — without the cache
            # the link-extraction UDF would re-run once per consumer.
            # Held in its own variable: the bloom branch rebinds ``cand``,
            # so unpersisting ``cand`` at round end would release the
            # derived DF and leak this cache one round at a time.
            if traps is not None:
                # Trap screen BEFORE membership: a flagged url never
                # reaches the seen check, is never marked seen, and
                # re-discovery next round re-screens it (cheap — the
                # traps side is a broadcast of distinct templates).
                links = trap_filter(links, traps)
            cached_cand = links.repartition(
                cfg.seen_partitions, F.xxhash64("url")
            ).cache()
            # Materialize the harvest under its OWN timer: the link-
            # extraction UDF + url-hash repartition are lazy, and
            # without this their cost lands in whichever membership
            # action runs first — masking exactly the strategy
            # difference the phase timers exist to expose.
            tp = time.time()
            cached_cand.count()
            phases["harvest"] = round(time.time() - tp, 3)
            cand = cached_cand
            use_probe = False
            if cfg.membership == "bucket_probe":
                # Layout validation runs EVERY round in bucket mode —
                # geometry guard + flat-layout refusal must fire even
                # when the seen set is still below probe_min_seen and
                # the exact check falls back to the shuffle anti-join.
                _check_seen_layout(catalog, cfg)
                bucket_files = _seen_bucket_files(catalog, round_no)
                use_probe = total_seen >= cfg.probe_min_seen
            if use_probe:
                # Exact check without shuffling the seen set: per-bucket
                # direct file reads against the committed layout. The
                # closure replaces both anti-join sites below.
                def _exact_new(c, _bf=bucket_files):
                    return _bucket_probe_anti_join(spark, c, _bf, cfg)

            else:
                # Shuffle anti-join — the whole seen set repartitions by
                # url-hash each round. Measured CHEAPER below
                # probe_min_seen (file-open overhead beats a tiny
                # shuffle); reads the bucketed layout transparently.
                def _exact_new(c):
                    return c.join(
                        seen.repartition(
                            cfg.seen_partitions, F.xxhash64("url")
                        ),
                        "url",
                        "left_anti",
                    )

            # Below ``bloom_min_seen`` urls the exact anti-join alone is
            # cheaper than maintaining/probing the bloom (the bloom's job is
            # to cut *shuffle* volume, which only matters once seen dwarfs
            # the candidate batch).
            bloom_df = None
            cuckoo_df = None
            # Snapshot for the cuckoo geometry: ensure/probe/advance
            # within ONE round must agree on sizing, and total_seen is
            # mutated (+= n_new) before the deferred advance lambda
            # runs — capture the round-start value now.
            seen_at_round_start = total_seen
            if cfg.use_bloom and total_seen >= cfg.bloom_min_seen:
                if cfg.prefilter == "cuckoo":
                    from .cuckoo import cuckoo_probe

                    cuckoo_df = _ensure_cuckoo(
                        catalog, seen, cfg, round_no, seen_at_round_start
                    )
                    # Cached for the same two-consumer reason as the
                    # partitioned bloom probe below.
                    probed_cache = cuckoo_probe(
                        cand, cuckoo_df, _cuckoo_cfg(cfg, seen_at_round_start)
                    ).cache()
                    cand = probed_cache
                elif _bloom_sql_available(spark):
                    cand = _bloom_prefilter(spark, cand, seen, cfg)
                else:
                    bloom_df = _ensure_bloom(catalog, seen, cfg, round_no)
                    # Cached: the probe output feeds BOTH union branches
                    # below; uncached, the cogrouped pandas probe subtree
                    # would execute twice per round (only the exchanges
                    # under it are reuse-dedupable, not the python stage).
                    probed_cache = _partitioned_bloom_probe(
                        cand, bloom_df, cfg
                    ).cache()
                    cand = probed_cache
                definitely_new = cand.where(~F.col("maybe_seen")).drop("maybe_seen")
                to_check = cand.where(F.col("maybe_seen")).drop("maybe_seen")
                checked_new = _exact_new(to_check)
                new_urls = definitely_new.unionByName(checked_new)
            else:
                new_urls = _exact_new(cand)

            new_entries = _with_policy_columns(new_urls, robots, host_rank).cache()

            # --- per-partition lineage for the membership stage ------------
            # One job yields both the total (n_new) and the per-partition
            # row counts of the membership stage's output (the anti-join
            # preserves cand's url-hash partitioning, so skew shows here).
            tp = time.time()
            part_counts = (
                new_entries.groupBy(F.spark_partition_id().alias("pid"))
                .count()
                .collect()
            )
            phases["membership"] = round(time.time() - tp, 3)
            n_new = sum(int(r["count"]) for r in part_counts)
            total_seen += n_new

            # --- checkpoint round r+1 state --------------------------------
            next_frontier = (
                frontier.join(admitted.select("url"), "url", "left_anti")
                .unionByName(new_entries)
            )
            round_metrics = {
                "round": round_no,
                "admitted": n_admitted,
                "new_urls": n_new,
                "membership_partitions": {
                    int(r["pid"]): int(r["count"]) for r in part_counts
                },
                "wall_sec": round(time.time() - t0, 3),
            }
            state.metrics.append(round_metrics)
            metrics_df = spark.createDataFrame(
                [
                    (
                        round_no,
                        n_admitted,
                        n_new,
                        [(int(r["pid"]), int(r["count"])) for r in part_counts],
                        round_metrics["wall_sec"],
                    )
                ],
                "round int, admitted long, new_urls long, "
                "partition_rows array<struct<pid:int,rows:long>>, wall_sec double",
            )
            sched_df = admitted.select(
                F.lit(round_no).alias("round"), F.col("seq"), F.col("url")
            )
            # The four (five with bloom) checkpoint writes are independent
            # table snapshots whose inputs are all cached — submitting them
            # CONCURRENTLY overlaps their driver round-trips and output I/O
            # (a serial sequence paid ~4-5 job latencies of pure driver
            # wait per round). The round marker still commits strictly
            # AFTER every write lands, so torn-round semantics are
            # unchanged: a crash mid-flight leaves the previous round live.
            # keep=4 on the frontier: per-round snapshots would otherwise
            # grow the catalog by a full copy per round; resume needs only
            # the committed round and its successor.
            def _timed(name, fn):
                def run():
                    ts = time.time()
                    fn()
                    phases[f"write_{name}"] = round(time.time() - ts, 3)

                return run

            writes = [
                _timed(
                    "frontier",
                    lambda: catalog.write(
                        "frontier", next_frontier, round_no + 1, keep=4
                    ),
                ),
                _timed(
                    "seen",
                    lambda: _append_seen(
                        catalog, new_entries, round_no + 1, cfg
                    ),
                ),
                _timed(
                    "schedule", lambda: catalog.append("schedule", sched_df, round_no)
                ),
                _timed(
                    "metrics", lambda: catalog.append("metrics", metrics_df, round_no)
                ),
            ]
            if bloom_df is not None:
                # Incremental bloom maintenance: only the buckets touched
                # by this round's new urls are rewritten (dynamic partition
                # overwrite — O(touched), never O(total bloom)); the state
                # marker commits after the data inside _advance_bloom.
                writes.append(
                    _timed(
                        "bloom",
                        lambda: _advance_bloom(
                            catalog, bloom_df, new_entries.select("url"),
                            cfg, round_no + 1,
                        ),
                    )
                )
            if cuckoo_df is not None:
                # Same incremental contract for the cuckoo state:
                # touched buckets only, marker after data.
                writes.append(
                    _timed(
                        "cuckoo",
                        lambda: _advance_cuckoo(
                            catalog, cuckoo_df, new_entries.select("url"),
                            cfg, round_no + 1, seen_at_round_start,
                        ),
                    )
                )
            tp = time.time()
            with ThreadPoolExecutor(max_workers=len(writes)) as pool:
                for fut in [pool.submit(w) for w in writes]:
                    fut.result()  # re-raise any write failure before commit
            phases["writes_barrier"] = round(time.time() - tp, 3)
            catalog.commit_round(round_no + 1)
            if cfg.compact_every and (round_no + 1) % cfg.compact_every == 0:
                tp = time.time()
                catalog.compact("seen", round_no + 1)
                phases["compact"] = round(time.time() - tp, 3)
            round_metrics["phases"] = phases
            state.rounds_run += 1
        finally:
            admitted.unpersist()
            if cached_cand is not None:
                cached_cand.unpersist()
            if probed_cache is not None:
                probed_cache.unpersist()
            if new_entries is not None:
                new_entries.unpersist()

    state.schedule = catalog.read_appended("schedule")
    # url-only regardless of membership mode: bucket_probe's storage
    # layout adds a bucket partition column consumers shouldn't see.
    seen_final = catalog.read_appended("seen")
    state.seen = seen_final.select("url") if seen_final is not None else None
    return state
