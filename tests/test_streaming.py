"""Streaming parity: availableNow drain == batch run; checkpoint resume."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def landing(spark, smoke_dir, tmp_path_factory):
    """Landing dir with the smoke images split into several files."""
    d = str(tmp_path_factory.mktemp("landing"))
    (
        spark.read.parquet(os.path.join(smoke_dir, "images.parquet"))
        .drop("blocks")
        .limit(200)
        .repartition(4)
        .write.mode("overwrite")
        .parquet(d)
    )
    return d


def test_stream_matches_batch(spark, landing, tmp_path_factory):
    from qfilter.cascade import with_labels
    from qfilter.features import with_all_features
    from qfilter.streaming import LABEL_OUT_COLS, stream_quality_filter

    out = str(tmp_path_factory.mktemp("stream_out"))
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    q = stream_quality_filter(spark, landing, out, ckpt)
    q.awaitTermination(600)

    streamed = spark.read.parquet(out)
    batch = with_labels(with_all_features(spark.read.parquet(landing))).select(
        *LABEL_OUT_COLS
    )
    assert streamed.count() == batch.count() == 200
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0

    # restart on the same checkpoint: nothing new -> no duplicate rows
    q2 = stream_quality_filter(spark, landing, out, ckpt)
    q2.awaitTermination(600)
    assert spark.read.parquet(out).count() == 200


def test_event_window_counts(spark, tmp_path_factory):
    from qfilter.streaming import stream_event_window_counts

    src = "/root/testdata/sf0.001"
    land = str(tmp_path_factory.mktemp("ev_landing"))
    spark.read.parquet(f"{src}/events.parquet").repartition(3).write.mode(
        "overwrite"
    ).parquet(land)
    out = str(tmp_path_factory.mktemp("ev_out"))
    ckpt = str(tmp_path_factory.mktemp("ev_ckpt"))
    q = stream_event_window_counts(spark, land, out, ckpt)
    q.awaitTermination(600)
    got = spark.read.parquet(out)
    # watermark append-mode emits only windows older than the watermark;
    # check emitted windows agree with the batch aggregation
    batch = (
        spark.read.parquet(land)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("win_start"), "event_type", "n")
    )
    j = got.select("win_start", "event_type", F.col("n").alias("sn")).join(
        batch, ["win_start", "event_type"], "inner"
    )
    assert j.count() == got.count() > 0
    assert j.filter(F.col("sn") != F.col("n")).count() == 0
