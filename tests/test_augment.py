"""Deterministic augmentation: pure-function params, label-safe
kernels, shuffle-free Spark plan, byte-identical re-runs."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from qfilter import codecs
from qfilter.augment import augment_params, augment_px, with_augmented

RNG = np.random.default_rng(7)


def _px(h=24, w=32):
    return RNG.integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_params_are_pure_and_bounded():
    p1 = augment_params("img-0001", 0)
    p2 = augment_params("img-0001", 0)
    assert p1 == p2
    assert p1 != augment_params("img-0001", 1)
    assert p1 != augment_params("img-0002", 0)
    for v in range(50):
        p = augment_params("x", v)
        assert 0 <= p["crop_top"] <= 0.1 and 0 <= p["crop_right"] <= 0.1
        assert -32 <= p["brightness"] <= 31


def test_flip_is_involutive_and_crop_bounded():
    px = _px()
    flipped = augment_px(px, dict(flip=True, crop_top=0, crop_left=0,
                                  crop_bottom=0, crop_right=0, brightness=0))
    unflipped = augment_px(flipped, dict(flip=True, crop_top=0, crop_left=0,
                                         crop_bottom=0, crop_right=0, brightness=0))
    assert np.array_equal(unflipped, px)
    p = dict(flip=False, crop_top=0.1, crop_left=0.1,
             crop_bottom=0.1, crop_right=0.1, brightness=0)
    out = augment_px(px, p)
    assert out.shape[0] >= 8 and out.shape[1] >= 8
    assert out.shape[0] <= px.shape[0] and out.shape[1] <= px.shape[1]


def test_tiny_image_never_cropped_below_minimum():
    px = _px(8, 8)
    p = dict(flip=False, crop_top=0.1, crop_left=0.1,
             crop_bottom=0.1, crop_right=0.1, brightness=5)
    assert augment_px(px, p).shape[:2] == (8, 8)  # crop skipped, not shrunk


def test_brightness_clips_to_uint8():
    px = np.full((10, 10, 3), 250, np.uint8)
    out = augment_px(px, dict(flip=False, crop_top=0, crop_left=0,
                              crop_bottom=0, crop_right=0, brightness=31))
    assert out.max() == 255 and out.dtype == np.uint8


@pytest.fixture()
def img_df(spark):
    rows = []
    for i in range(6):
        px = _px(16 + i, 20 + i)
        fmt = ["raw", "png", "bmp"][i % 3]
        rows.append(("img-%04d" % i, codecs.encode(px, fmt),
                     px.shape[1], px.shape[0], fmt))
    rows.append(("img-bad", b"\x00garbage", 10, 10, "png"))
    return spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )


def test_spark_augment_is_deterministic_and_complete(spark, img_df):
    out1 = with_augmented(img_df, variants=3).orderBy("image_id", "variant").collect()
    out2 = (
        with_augmented(img_df.repartition(5), variants=3)
        .orderBy("image_id", "variant")
        .collect()
    )
    assert len(out1) == 7 * 3
    assert [bytes(r["bytes"]) if r["bytes"] is not None else None for r in out1] == [
        bytes(r["bytes"]) if r["bytes"] is not None else None for r in out2
    ]
    bad = [r for r in out1 if r["image_id"] == "img-bad"]
    assert all(r["error"] is not None and r["bytes"] is None for r in bad)
    good = [r for r in out1 if r["image_id"] != "img-bad"]
    assert all(r["error"] is None for r in good)


def test_spark_matches_single_node_oracle_bit_exact(spark, img_df):
    out = {
        (r["image_id"], r["variant"]): r
        for r in with_augmented(img_df.filter("fmt = 'raw'"), variants=2).collect()
    }
    for r0 in img_df.filter("fmt = 'raw'").collect():
        px = codecs.decode(bytes(r0["bytes"]), "raw", r0["w"], r0["h"])
        for v in range(2):
            want = augment_px(px, augment_params(r0["image_id"], v))
            got = out[(r0["image_id"], v)]
            assert bytes(got["bytes"]) == codecs.encode(want, "raw")
            assert (got["h"], got["w"]) == want.shape[:2]


def test_stream_augment_matches_batch(spark, img_df, tmp_path_factory):
    """mapInPandas augmentation is stream-compatible: an availableNow
    drain over a file source produces byte-identical output to the
    batch run — determinism is what makes augmented shards safely
    re-creatable after a stream restart."""
    landing = str(tmp_path_factory.mktemp("aug_landing"))
    out = str(tmp_path_factory.mktemp("aug_out"))
    ckpt = str(tmp_path_factory.mktemp("aug_ckpt"))
    img_df.repartition(3).write.mode("overwrite").parquet(landing)
    src = spark.readStream.schema(
        spark.read.parquet(landing).schema
    ).parquet(landing)
    q = (
        with_augmented(src, variants=2)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "availableNow drain timed out"
    streamed = spark.read.parquet(out)
    batch = with_augmented(spark.read.parquet(landing), variants=2)
    assert streamed.count() == batch.count() == 7 * 2
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0


def test_augment_plan_has_no_exchange(spark, img_df):
    plan = with_augmented(img_df, variants=2)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
