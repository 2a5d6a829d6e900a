"""Incremental/streaming ingest for the extraction pipeline.

The reference's only async surface is a Redis work queue + realtime progress
events (ocr_read.py:61-64, 105). The Spark equivalent: the same batch
transform under Structured Streaming ``foreachBatch`` with checkpointing.
No watermarks or stateful operators are required — every document is
processed independently (embarrassingly parallel, no cross-doc state), so
exactly-once comes from checkpoint + idempotent append.

Also provided: a sessionization example over the `events` stream table
(watermark + window) since downstream pipelines typically need it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.pipeline import extract


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    media_pages: DataFrame | None = None,
    schema=None,
):
    """File-source streaming: new parquet files of documents_raw appear in
    `input_dir`; each micro-batch runs the identical batch extract() and
    appends. Returns the StreamingQuery (caller awaits/stops)."""
    reader = spark.readStream
    if schema is not None:
        reader = reader.schema(schema)
    stream = reader.parquet(input_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        out = extract(batch_df, media_pages)
        # exactly-once: each micro-batch owns a batch_id-named directory
        # and OVERWRITES it, so a batch replayed after a crash between
        # the data write and the checkpoint commit replaces its own
        # partial output instead of appending a duplicate copy
        out.write.mode("overwrite").parquet(f"{output_dir}/batch_id={batch_id}")

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts(events: DataFrame, window: str = "10 minutes",
                          watermark: str = "30 minutes") -> DataFrame:
    """Watermarked tumbling-window aggregation over the events stream —
    late rows beyond the watermark are dropped, state is bounded."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        # decimal sum: exact and order-independent regardless of partition
        # merge order (double sums are not associative)
        .agg(F.count("*").alias("n"),
             F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
             .alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )
