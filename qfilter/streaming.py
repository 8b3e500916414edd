"""Structured Streaming front-end for incremental ingest.

The reference is a batch folder pipeline (SURVEY.md §2.10: no
streaming ops), and the north rule's resumability is batch
checkpointing — but at 100 TB new image+caption files land
continuously, so the same feature + cascade stages are exposed as a
streaming job too:

* `stream_quality_filter` — file-source stream of image parquet ->
  decode/features/cascade/scrub -> parquet sink with checkpoint;
  `availableNow` drains the backlog exactly-once and is restartable
  from the checkpoint (the streaming analogue of `qfilter.pipeline`'s
  lineage resume).
* `stream_event_window_counts` — event-time tumbling-window counts
  with a watermark for late data (the generic streaming-agg pattern).
* `stream_event_sessions` — stateful per-user session windows via the
  built-in `session_window` with watermark-bounded merging state.

All reuse the exact batch transformations — Structured Streaming
runs the same Catalyst plan incrementally, so batch/stream parity is
by construction (asserted in tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .cascade import with_labels
from .features import with_all_features

__all__ = [
    "IMAGES_SCHEMA",
    "stream_quality_filter",
    "stream_event_window_counts",
    "stream_event_sessions",
]

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

IMAGES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("caption", T.StringType()),
        T.StructField("phash", T.LongType()),
    ]
)

LABEL_OUT_COLS = [
    "image_id", "category", "reason", "keep", "is_dark", "lang",
    "caption_scrubbed", "pii_hits", "tox_hits", "phash64",
]


def stream_quality_filter(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    schema: T.StructType = IMAGES_SCHEMA,
    max_files_per_trigger: int = 8,
):
    """Incremental quality filter over a landing directory of parquet
    files.  Returns the StreamingQuery (await/stop is the caller's).

    ``max_files_per_trigger`` bounds micro-batch size; a file-source
    micro-batch parallelizes at one task per file, so keep it >= the
    executor core count when draining a backlog with availableNow."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    labeled = with_labels(with_all_features(stream)).select(*LABEL_OUT_COLS)
    writer = (
        labeled.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_event_window_counts(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    schema: T.StructType | None = None,
):
    """Event-time tumbling-window counts per event_type with a
    watermark bounding state for late data."""
    if schema is None:
        schema = EVENTS_SCHEMA
    stream = spark.readStream.schema(schema).parquet(input_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type", "n", "sum_value",
        )
    )
    return (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stream_event_sessions(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    schema: T.StructType | None = None,
):
    """Stateful session windows: per-user sessions via the built-in
    `session_window` (merging state bounded by the watermark).  Append
    mode emits a session once the watermark passes its end (last event
    ts + gap).  Session semantics — merge iff inter-event gap < `gap`
    — match the batch `corpus.event_sessions` cumsum form exactly
    (parity asserted in tests/test_streaming.py), and the emitted
    window is [min ts, max ts + gap)."""
    if schema is None:
        schema = EVENTS_SCHEMA
    stream = spark.readStream.schema(schema).parquet(input_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            "user_id", "session_start", "session_end", "n_events", "sum_value",
            F.col("win.end").alias("win_end"),
        )
    )
    return (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
