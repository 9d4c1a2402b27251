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
