"""Twin-parity + properties for the P11 polish kernels
(`qfilter/polish.py` vs `oracle/imageref.py` *_ref twins)."""

from __future__ import annotations

import numpy as np
import pytest

from oracle import imageref as ref
from qfilter import polish


def _images(n=8, seed=3):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        h = int(rng.integers(16, 140))
        w = int(rng.integers(16, 140))
        g = rng.integers(0, 256, (h, w), dtype=np.uint8)
        if i % 2:  # paper-like
            g[:] = 228
            for _ in range(6):
                y = int(rng.integers(0, h))
                g[y : y + 2, :] = 35
        out.append(g)
    return out


def test_clahe_twin_and_properties():
    for g in _images():
        a = polish.clahe(g)
        b = ref.clahe_ref(g)
        assert np.array_equal(a, b)
    flat = np.full((64, 64), 100, dtype=np.uint8)
    assert np.array_equal(np.unique(polish.clahe(flat)), np.unique(polish.clahe(flat)))


def test_gaussian_unsharp_twin():
    for g in _images():
        for sigma, amt in ((1.0, 1.4), (0.6, 0.15)):
            assert np.allclose(
                polish.gaussian_blur_sigma(g, sigma),
                ref.gaussian_blur_sigma_ref(g, sigma),
                rtol=0, atol=0,
            )
            assert np.array_equal(
                polish.unsharp(g, sigma, amt), ref.unsharp_ref(g, sigma, amt)
            )


def test_canny_twin_and_properties():
    for g in _images():
        a = polish.canny(g, 50, 150)
        b = ref.canny_ref(g, 50, 150)
        assert np.array_equal(a, b)
    # no edges on a constant image
    assert polish.canny(np.full((40, 40), 77, np.uint8), 50, 150).sum() == 0
    # a crisp step edge is detected
    step = np.zeros((40, 40), np.uint8)
    step[:, 20:] = 255
    assert polish.canny(step, 50, 150).sum() > 0


def test_nl_means_twin_and_denoises():
    rng = np.random.default_rng(0)
    for g in _images(4):
        a = polish.nl_means(g, 6.0, 7, 11)
        b = ref.nl_means_ref(g, 6.0, 7, 11)
        assert np.array_equal(a, b)
    # variance reduction on noisy flat field
    noisy = np.clip(
        128 + rng.normal(0, 12, (64, 64)), 0, 255
    ).astype(np.uint8)
    den = polish.nl_means(noisy, 10.0, 7, 11)
    assert den.std() < noisy.std() * 0.8
    # identical-pixel image is a fixpoint
    flat = np.full((32, 32), 99, np.uint8)
    assert np.array_equal(polish.nl_means(flat, 6.0), flat)


def test_lighten_full_twin_rgb():
    rng = np.random.default_rng(9)
    for _ in range(3):
        h = int(rng.integers(24, 100))
        w = int(rng.integers(24, 100))
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        a = polish.lighten_full(px)
        b = ref.lighten_full_ref(px)
        assert np.array_equal(a, b)
        assert a.shape == (h, w, 3)


def test_polish_stats_twin_on_fixture_slice():
    import os

    import pyarrow.parquet as pq

    from make_fixtures import ensure_fixtures
    from qfilter import codecs

    tdir = ensure_fixtures("smoke")
    t = (
        pq.read_table(
            os.path.join(tdir, "images.parquet"),
            columns=["bytes", "fmt", "w", "h"],
        )
        .to_pandas()
        .head(40)
    )
    n = 0
    for b, f, w, h in zip(t["bytes"], t["fmt"], t["w"], t["h"]):
        try:
            px = codecs.decode(b, f, int(w), int(h))
        except Exception:
            continue
        a = polish.polish_stats_one(px)
        bb = ref.polish_stats_ref(px)
        assert a == bb
        n += 1
        if n >= 6:  # the twin is ~0.8 s/image
            break
    assert n >= 5


def test_twin_catches_canny_threshold_drift(monkeypatch):
    """Sensitivity: a minimal decision-boundary drift in the production
    chain (Canny high threshold nudged below one integer magnitude —
    for integer magnitudes, the classic off-by-one) must make the twin
    disagree — the parity is a tripwire, not a tautology."""
    orig = polish.canny

    def drifted(gray, low, high):
        return orig(gray, low, high - 1)

    monkeypatch.setattr(polish, "canny", drifted)
    rng = np.random.default_rng(2)
    px = rng.integers(0, 256, (96, 96, 3), dtype=np.uint8)
    a = polish.polish_stats_one(px)
    b = ref.polish_stats_ref(px)
    assert a != b


# ------------------------------------------------------ P8 OCR prep

def test_lanczos_resize_twin_and_properties():
    from oracle.imageref import lanczos_resize_ref
    from qfilter.ocrprep import lanczos_resize

    rng = np.random.default_rng(6)
    for _ in range(4):
        h = int(rng.integers(8, 60))
        w = int(rng.integers(8, 60))
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        oh, ow = h * 3 + 1, w * 2 + 5
        a = lanczos_resize(px, oh, ow)
        b = lanczos_resize_ref(px, oh, ow)
        assert np.array_equal(a, b)
        assert a.shape == (oh, ow, 3)
    # constant image stays constant under resampling (weights sum to 1)
    flat = np.full((20, 30), 123, np.uint8)
    out = lanczos_resize(flat, 61, 90)
    assert int(out.min()) == 123 and int(out.max()) == 123


def test_ocr_prep_twin_and_contract():
    from oracle.imageref import ocr_prep_ref
    from qfilter.ocrprep import ocr_prep_stats_one, prep_for_ocr

    rng = np.random.default_rng(8)
    px = rng.integers(0, 256, (40, 64, 3), dtype=np.uint8)
    a = ocr_prep_stats_one(px)
    b = ocr_prep_ref(px)
    assert a == b
    # contract: long side upscaled to exactly 1800, output binary
    thr = prep_for_ocr(px)
    assert max(thr.shape) == 1800
    assert set(np.unique(thr)).issubset({0, 255})
    # already-large page is not resized
    big = rng.integers(0, 256, (1900, 500, 3), dtype=np.uint8)
    assert prep_for_ocr(big).shape == (1900, 500)
