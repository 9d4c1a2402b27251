"""Incremental page ingest via Structured Streaming.

The north rule prescribes batch rounds for the *crawl* (frontier and
seen-set checkpointed between spark-submit rounds — SURVEY.md §2.11:
no watermarks, no event-time windows, no stateful operators needed,
and the reference itself is strictly synchronous batch). What a
production deployment still wants incrementally is *ingest*: WARC
dumps land as files, and each micro-batch should flow through the
same deterministic extraction kernel without re-reading old files.

``stream_extract`` is exactly that: a file-source ``readStream`` over
the pages directory, piped through ``plans.extract.extract_pages`` in
``foreachBatch`` — one code path for batch and streaming, which is
what keeps the byte-identity contract meaningful in both modes. The
file source + checkpointLocation give exactly-once per input file;
ordering across micro-batches is irrelevant because extraction is
per-row.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

from pyspark.sql import DataFrame, SparkSession

from ..plans.extract import extract_pages
from ..synth import PAGES_DDL


def stream_extract(
    spark: SparkSession,
    pages_dir: str,
    field_map: Dict[str, Any],
    checkpoint_dir: str,
    sink: Callable[[DataFrame, int], None],
    max_files_per_trigger: Optional[int] = None,
    schema: str = PAGES_DDL,
):
    """Start a streaming query: new parquet files under ``pages_dir``
    → extraction kernel → ``sink(batch_df, batch_id)``.

    ``sink`` receives the *extracted* micro-batch (same schema as the
    batch pipeline) — append it to the results table. Returns the
    StreamingQuery; caller owns ``awaitTermination``/``stop``."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    pages = reader.parquet(pages_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        sink(extract_pages(batch_df, field_map), batch_id)

    return (
        pages.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_dedup_ingest(
    spark: SparkSession,
    docs_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    sink: Callable[[DataFrame, int], None],
    schema: str = "doc_id long, text string",
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
    n_parts: int = 16,
    max_files_per_trigger: Optional[int] = None,
):
    """Streaming near-dup ingest: new document files flow through the
    SAME incremental MinHash state the batch rounds use
    (``operators/incremental.minhash_ingest_round``) — each
    micro-batch's pairs (new docs vs everything already ingested plus
    within-batch) go to ``sink(pairs_df, batch_id)`` and its band
    buckets append to the on-disk bucket-partitioned state.

    One code path for batch rounds AND streaming ingest, so the
    union-equivalence contract (per-round pairs union EXACTLY to the
    batch full-corpus join) holds in both modes; the file source +
    checkpointLocation give exactly-once per input file, and the
    union property is order-independent, so micro-batch scheduling
    cannot change the result set. Returns the StreamingQuery; caller
    owns ``awaitTermination``/``stop``.

    Note the state append happens inside ``foreachBatch`` — Spark
    guarantees foreachBatch runs micro-batches sequentially, which is
    the single-writer assumption the bucket state's append protocol
    already requires of the batch rounds.
    """
    from ..operators.incremental import minhash_ingest_round

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.parquet(docs_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        pairs = minhash_ingest_round(
            batch_df, state_dir, text_col, id_col,
            num_hashes, bands, k, None, n_parts,
        )
        sink(pairs, batch_id)

    return (
        docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
