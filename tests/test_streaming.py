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


def test_event_sessions_stream_batch_parity(spark, tmp_path_factory):
    """session_window streaming == gap-cumsum batch sessionization on
    the emitted (watermark-finalized) subset; win_end = last ts + gap."""
    from qfilter.streaming import stream_event_sessions

    src = "/root/testdata/sf0.001"
    land = str(tmp_path_factory.mktemp("sess_landing"))
    spark.read.parquet(f"{src}/events.parquet").repartition(3).write.mode(
        "overwrite"
    ).parquet(land)
    out = str(tmp_path_factory.mktemp("sess_out"))
    ckpt = str(tmp_path_factory.mktemp("sess_ckpt"))
    q = stream_event_sessions(spark, land, out, ckpt)
    assert q.awaitTermination(600)
    got = spark.read.parquet(out)
    n_got = got.count()
    assert n_got > 0
    # streamed window end is last event ts + the 30-minute gap
    assert (
        got.filter(
            F.col("win_end") != F.col("session_end") + F.expr("INTERVAL 30 MINUTES")
        ).count()
        == 0
    )

    # batch sessionization via the SHIPPED op (gap-cumsum is invariant
    # to file layout, so running it over the source dir covers the
    # repartitioned landing copy row-for-row)
    from qfilter.corpus import event_sessions

    bsess = event_sessions(spark, src, gap_minutes=30)
    # every emitted session matches a batch session exactly
    gsel = got.select("user_id", "session_start", "session_end", "n_events", "sum_value")
    bsel = bsess.select("user_id", "session_start", "session_end", "n_events", "sum_value")
    assert gsel.exceptAll(bsel).count() == 0
    # emitted set = batch sessions finalized by the final watermark;
    # Spark tracks the event-time watermark in whole MILLISECONDS
    # (max event time is floored to ms before subtracting the delay)
    mx = spark.read.parquet(land).agg(F.max("ts")).collect()[0][0]
    mx_ms = mx.replace(microsecond=(mx.microsecond // 1000) * 1000)
    fin = bsel.filter(
        F.col("session_end") + F.expr("INTERVAL 30 MINUTES")
        <= F.lit(mx_ms) - F.expr("INTERVAL 2 HOURS")
    )
    assert n_got == fin.count()


def test_custom_stateful_sessions_match_builtin_and_batch(spark, tmp_path_factory):
    """applyInPandasWithState sessionizer == session_window stream ==
    batch gap-cumsum on the watermark-finalized subset, value sums
    bit-identical (decimal(18,6) replication)."""
    from qfilter.streaming import stream_event_sessions, stream_event_sessions_custom

    src = "/root/testdata/sf0.001"
    land = str(tmp_path_factory.mktemp("cs_landing"))
    spark.read.parquet(f"{src}/events.parquet").repartition(3).write.mode(
        "overwrite"
    ).parquet(land)

    out_c = str(tmp_path_factory.mktemp("cs_out"))
    q = stream_event_sessions_custom(
        spark, land, out_c, str(tmp_path_factory.mktemp("cs_ckpt"))
    )
    assert q.awaitTermination(600)
    got = spark.read.parquet(out_c).select(
        "user_id", "session_start", "session_end", "n_events", "sum_value"
    )
    n_custom = got.count()
    assert n_custom > 0

    out_b = str(tmp_path_factory.mktemp("cb_out"))
    qb = stream_event_sessions(
        spark, land, out_b, str(tmp_path_factory.mktemp("cb_ckpt"))
    )
    assert qb.awaitTermination(600)
    builtin = spark.read.parquet(out_b).select(
        "user_id", "session_start", "session_end", "n_events", "sum_value"
    )
    # exact multiset equality with the built-in session_window stream
    assert got.exceptAll(builtin).count() == 0
    assert builtin.exceptAll(got).count() == 0

    # and every emitted session is a batch session, exactly
    from qfilter.corpus import event_sessions

    bsess = event_sessions(spark, src, gap_minutes=30).select(
        "user_id", "session_start", "session_end", "n_events", "sum_value"
    )
    assert got.exceptAll(bsess).count() == 0


def test_custom_stateful_sessions_checkpoint_resume(spark, tmp_path_factory):
    """Exactly-once across restart for applyInPandasWithState: drain
    the EARLY half of the events, stop, land the LATE half, restart on
    the SAME checkpoint.  State (open sessions) must carry over — the
    final emitted set equals the batch sessions finalized by the final
    watermark, with cross-restart sessions (spanning the split point)
    emitted exactly once and correctly merged."""
    from qfilter.corpus import event_sessions
    from qfilter.streaming import stream_event_sessions_custom

    src = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{src}/events.parquet")
    ts_sorted = [r.ts for r in ev.select("ts").orderBy("ts").collect()]
    cut = ts_sorted[len(ts_sorted) // 2]

    land = str(tmp_path_factory.mktemp("cr_landing"))
    out = str(tmp_path_factory.mktemp("cr_out"))
    ckpt = str(tmp_path_factory.mktemp("cr_ckpt"))
    pat = os.path.join(land, "*")

    ev.filter(F.col("ts") <= F.lit(cut)).repartition(2).write.mode(
        "overwrite"
    ).parquet(os.path.join(land, "early"))
    q1 = stream_event_sessions_custom(spark, pat, out, ckpt)
    assert q1.awaitTermination(600)
    n1 = spark.read.parquet(out).count()

    ev.filter(F.col("ts") > F.lit(cut)).repartition(2).write.mode(
        "overwrite"
    ).parquet(os.path.join(land, "late"))
    q2 = stream_event_sessions_custom(spark, pat, out, ckpt)
    assert q2.awaitTermination(600)

    got = spark.read.parquet(out).select(
        "user_id", "session_start", "session_end", "n_events", "sum_value"
    )
    assert got.count() > n1  # the second drain emitted more sessions
    # no duplicate emissions across the restart
    assert got.groupBy(got.columns).count().filter("count > 1").count() == 0
    # every emitted session is a batch session, exactly (incl. values)
    bsess = event_sessions(spark, src, gap_minutes=30).select(
        "user_id", "session_start", "session_end", "n_events", "sum_value"
    )
    assert got.exceptAll(bsess).count() == 0
    # at least one emitted session SPANS the restart point — proof the
    # open-session state survived the checkpoint restart and merged
    # with post-restart events (the fixture's sessions are dense
    # enough that the median-ts cut always bisects some session)
    spanning = got.filter(
        (F.col("session_start") <= F.lit(cut)) & (F.col("session_end") > F.lit(cut))
    ).count()
    assert spanning > 0


def test_stream_event_dedup_exactly_once(spark, tmp_path_factory):
    """Planted full re-delivery of the events table: the watermarked
    streaming dedup emits each event_id exactly once, matching batch
    SELECT DISTINCT — with state BOUNDED by the watermark, unlike a
    bare streaming dropDuplicates."""
    from qfilter.streaming import stream_event_dedup

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    n_distinct = events.select("event_id").distinct().count()

    land = str(tmp_path_factory.mktemp("dedup_land"))
    # two deliveries of the same rows (separate files = separate
    # micro-batch inputs under maxFilesPerTrigger defaults)
    events.repartition(2).write.mode("overwrite").parquet(land)
    events.repartition(3).write.mode("append").parquet(land)
    assert spark.read.parquet(land).count() == 2 * events.count()

    out = str(tmp_path_factory.mktemp("dedup_out"))
    ckpt = str(tmp_path_factory.mktemp("dedup_ckpt"))
    q = stream_event_dedup(spark, land, out, ckpt)
    assert q.awaitTermination(600), "availableNow drain timed out"

    got = spark.read.parquet(out)
    assert got.count() == n_distinct
    assert got.select("event_id").distinct().count() == n_distinct

    # re-deliver AGAIN on the same checkpoint: still exactly once
    events.repartition(1).write.mode("append").parquet(land)
    q2 = stream_event_dedup(spark, land, out, ckpt)
    assert q2.awaitTermination(600)
    assert spark.read.parquet(out).count() == n_distinct
