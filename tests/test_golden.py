"""Golden end-to-end test: Spark pipeline == pure-Python oracle.

The BASELINE.json gates: keep/drop F1 >= 0.99 (target: exact equality),
category/reason equality, scrubbed-caption equality, decoded-pixel
PSNR >= 40 dB for the lossy format.
"""

from __future__ import annotations

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def labeled(spark, smoke_dir):
    from qfilter.cascade import with_labels
    from qfilter.features import with_all_features

    images = spark.read.parquet(os.path.join(smoke_dir, "images.parquet"))
    out = with_labels(with_all_features(images)).cache()
    ref = spark.read.parquet(os.path.join(smoke_dir, "labels_ref.parquet"))
    joined = (
        out.alias("p")
        .join(ref.alias("r"), "image_id", "inner")
        .cache()
    )
    assert joined.count() == out.count() == ref.count()
    return joined


def test_category_reason_exact(labeled):
    from pyspark.sql import functions as F

    mism = labeled.filter(
        (F.col("p.category") != F.col("r.category"))
        | (F.col("p.reason") != F.col("r.reason"))
    )
    rows = mism.select("image_id", "p.category", "r.category",
                       "p.reason", "r.reason").limit(10).collect()
    assert not rows, f"label mismatches: {rows}"


def test_keep_f1(labeled):
    from pyspark.sql import functions as F

    agg = labeled.agg(
        F.sum((F.col("p.keep") & F.col("r.keep")).cast("int")).alias("tp"),
        F.sum((F.col("p.keep") & ~F.col("r.keep")).cast("int")).alias("fp"),
        F.sum((~F.col("p.keep") & F.col("r.keep")).cast("int")).alias("fn"),
    ).collect()[0]
    f1 = 2 * agg.tp / max(1, 2 * agg.tp + agg.fp + agg.fn)
    assert f1 >= 0.99, f"keep/drop F1 {f1} below gate (tp={agg.tp} fp={agg.fp} fn={agg.fn})"
    assert agg.fp == 0 and agg.fn == 0  # target: exact


def test_dark_flag_and_reason(labeled):
    from pyspark.sql import functions as F

    mism = labeled.filter(
        (F.col("p.is_dark") != F.col("r.is_dark"))
        | (F.col("p.dark_reason") != F.col("r.dark_reason"))
    )
    rows = mism.select("image_id", "p.dark_reason", "r.dark_reason").limit(5).collect()
    assert not rows, f"dark mismatches: {rows}"


def test_scrubbed_caption_equality(labeled):
    from pyspark.sql import functions as F

    mism = labeled.filter(F.col("p.caption_scrubbed") != F.col("r.caption_scrubbed"))
    rows = mism.select("p.caption_scrubbed", "r.caption_scrubbed").limit(5).collect()
    assert not rows, f"scrub mismatches: {rows}"
    hits = labeled.agg(
        F.sum("p.pii_hits").alias("pii"), F.sum("p.tox_hits").alias("tox")
    ).collect()[0]
    assert hits.pii > 0 and hits.tox > 0  # plants actually present & found


def test_langid_matches_oracle(labeled):
    from pyspark.sql import functions as F

    mism = labeled.filter(F.col("p.lang") != F.col("r.lang")).count()
    assert mism == 0


def test_phash_matches_input_column(labeled):
    """Pipeline-recomputed phash == generator's phash column (decode
    round-trip consistency incl. the lossy format)."""
    from pyspark.sql import functions as F

    ok_rows = labeled.filter(F.col("p.error").isNull())
    mism = ok_rows.filter(F.col("p.phash64") != F.col("p.phash")).count()
    assert mism == 0


def test_error_channel(labeled):
    from pyspark.sql import functions as F

    errs = labeled.filter(F.col("p.error").isNotNull())
    assert errs.count() > 0
    bad = errs.filter(
        (F.col("p.category") != "trash") | F.col("p.keep")
        | (F.col("p.reason") != F.col("p.error"))
    ).count()
    assert bad == 0


def test_every_rule_covered(labeled):
    from pyspark.sql import functions as F

    reasons = {
        r.reason for r in labeled.filter(F.col("p.error").isNull())
        .select(F.col("p.reason").alias("reason")).distinct().collect()
    }
    expected = {
        "roi<min", "skew_bad", "ocr_dead", "blur_dead", "no_text_content",
        "unstable_ocr", "irregular_lines", "miniature_poor", "table_strong",
        "table_ok", "table_weak", "text_strong", "text_ok", "text_weak",
    }
    assert expected <= reasons, f"missing rules: {expected - reasons}"


def test_qjpg_psnr_gate(smoke_dir):
    """Decoded lossy pixels within PSNR >= 40 dB of pre-encode pixels."""
    import pyarrow.parquet as pq

    from qfilter import codecs

    pool = pq.read_table(os.path.join(smoke_dir, "pool.parquet")).to_pylist()
    checked = 0
    for row in pool:
        if row["fmt"] != "qjpg" or not row["pixels_pre"]:
            continue
        px_ref = np.frombuffer(row["pixels_pre"], dtype=np.uint8).reshape(
            row["h"], row["w"], 3
        )
        px = codecs.decode(row["bytes"], "qjpg", row["w"], row["h"])
        p = codecs.psnr(px_ref, px)
        assert p >= 40.0, f"qjpg PSNR {p:.1f} < 40"
        checked += 1
    assert checked > 0


def test_lossless_roundtrip_exact(smoke_dir):
    import pyarrow.parquet as pq

    from qfilter import codecs

    pool = pq.read_table(os.path.join(smoke_dir, "pool.parquet")).to_pylist()
    checked = 0
    for row in pool:
        if row["fmt"] == "qjpg" or not row["pixels_pre"]:
            continue
        px_ref = np.frombuffer(row["pixels_pre"], dtype=np.uint8).reshape(
            row["h"], row["w"], 3
        )
        px = codecs.decode(row["bytes"], row["fmt"], row["w"], row["h"])
        assert np.array_equal(px_ref, px)
        checked += 1
    assert checked > 0
