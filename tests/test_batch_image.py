"""Bit-identity of the shape-batched image kernels vs the scalar path.

`qfilter.batch_image.image_features_batch` (the image-UDF interior)
must produce EXACTLY the values of the scalar path
(`imageops.image_features` + `phash.average_hash`) — exact float
equality: the driver's parity gate hashes values, so one ULP of drift
is a red row.  Also proves, exhaustively over their full input
domains, the two integer-form shortcuts the batch path relies on
(banker's-rounded /256 in the blur; integer-space adaptive-threshold
comparison).
"""

from __future__ import annotations

import numpy as np
import pytest

from qfilter import codecs, imageops
from qfilter.batch_image import image_features_batch
from qfilter.phash import average_hash


def _scalar_feats(px):
    gray = imageops.grayscale(px)
    d = imageops.image_features(px, _gray=gray)
    d["phash64"] = average_hash(px, _gray=gray)
    return d


def _decode_fixture_images(limit=400):
    import pyarrow.parquet as pq

    from make_fixtures import ensure_fixtures
    import os

    tdir = ensure_fixtures("smoke")
    t = (
        pq.read_table(
            os.path.join(tdir, "images.parquet"),
            columns=["bytes", "fmt", "w", "h"],
        )
        .to_pandas()
        .head(limit)
    )
    pxs = []
    for b, f, w, h in zip(t["bytes"], t["fmt"], t["w"], t["h"]):
        try:
            pxs.append(codecs.decode(b, f, int(w), int(h)))
        except Exception:
            pass
    return pxs


def _assert_identical(ref: dict, got: dict):
    for k, v in ref.items():
        gv = got[k]
        if isinstance(v, float):
            assert (v == gv) or (np.isnan(v) and np.isnan(gv)), (k, v, gv)
        else:
            assert v == gv, (k, v, gv)


def test_batch_matches_scalar_on_fixtures():
    pxs = _decode_fixture_images()
    assert len(pxs) > 100
    got = image_features_batch(pxs)
    for px, g in zip(pxs, got):
        _assert_identical(_scalar_feats(px), g)


def test_batch_matches_scalar_random_shapes():
    """Random sizes (including degenerate < 3 px dims) and random
    noise/structured content — every Arrow batch mix must agree."""
    rng = np.random.default_rng(7)
    pxs = []
    for _ in range(60):
        h = int(rng.integers(1, 70))
        w = int(rng.integers(1, 70))
        px = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        if rng.random() < 0.5:  # paper-like: bright page + dark strokes
            px[:] = 235
            for _ in range(int(rng.integers(0, 6))):
                y = int(rng.integers(0, h))
                px[y : y + 2, :] = 40
        pxs.append(px)
    got = image_features_batch(pxs)
    for px, g in zip(pxs, got):
        _assert_identical(_scalar_feats(px), g)


def test_blur_integer_rounding_exhaustive():
    """round(o/256) with np.round (half-to-even; o/256 is exact in
    float64) == the integer banker's rounding the batch blur uses,
    for EVERY reachable o in [0, 255*256]."""
    o = np.arange(0, 255 * 256 + 1, dtype=np.int32)
    ref = np.clip(np.round(o / 256.0), 0, 255).astype(np.uint8)
    q, r = np.divmod(o, 256)
    q += (r > 128) | ((r == 128) & ((q & 1) == 1))
    assert np.array_equal(ref, q.astype(np.uint8))


@pytest.mark.parametrize("block,c", [(35, 15), (41, 15), (31, 10), (31, 11)])
def test_adaptive_threshold_integer_form_exhaustive(block, c):
    """px <= s/b^2 - c (float64, the scalar form) == px*b^2 <= s - c*b^2
    (integer, the batch form) for EVERY reachable window sum s at the
    call site's (block, c) — so the integer comparison is not an
    approximation but an identity."""
    b2 = block * block
    s = np.arange(0, 255 * b2 + 1, dtype=np.int64)
    thr_f = s / float(b2) - c
    rhs = s - c * b2
    for px in range(256):
        assert np.array_equal(px <= thr_f, px * b2 <= rhs), px


def test_cc_banded_stats_match_per_image():
    """connected_component_stats(band_h=...) over a stacked mask must
    return per-image stats identical (incl. float moments) to separate
    per-image calls."""
    rng = np.random.default_rng(3)
    h, w, n = 23, 31, 7
    masks = (rng.random((n, h, w)) < 0.35).astype(np.uint8) * 255
    tall = np.zeros((n * (h + 1), w), dtype=np.uint8)
    tall.reshape(n, h + 1, w)[:, :h, :] = masks
    st = imageops.connected_component_stats(tall, band_h=h + 1)
    assert st is not None
    band = st["band"]
    assert np.all(np.diff(band) >= 0)
    for i in range(n):
        sel = band == i
        ref = imageops.connected_component_stats(masks[i])
        if ref is None:
            assert not sel.any()
            continue
        for k in ref:
            assert np.array_equal(ref[k], st[k][sel]), (i, k)


def test_error_rows_interleaved_with_batch(spark, smoke_dir):
    """The UDF splits decode errors out, batches the rest, and must
    reassemble rows in order with the schema's column order."""
    import os

    from pyspark.sql import functions as F

    from qfilter.features import with_image_features

    img = spark.read.parquet(os.path.join(smoke_dir, "images.parquet"))
    # corrupt ~1/5 of the byte streams
    broken = img.withColumn(
        "bytes",
        F.when(
            F.crc32(F.col("image_id")) % 5 == 0,
            F.lit(b"\x00\x01broken"),
        ).otherwise(F.col("bytes")),
    )
    out = with_image_features(broken).select("image_id", "error", "phash64")
    rows = out.collect()
    n_err = sum(1 for r in rows if r.error is not None)
    assert n_err > 0
    for r in rows:
        if r.error is not None:
            assert r.phash64 == 0
        else:
            assert isinstance(r.phash64, int)
