"""Enhancement operators: line detect/remove, lighten, rotate, deskew."""

from __future__ import annotations

import numpy as np
import pytest

from qfilter.enhance import (
    deskew_angle_search,
    detect_lines,
    lighten_basic,
    remove_lines,
    rotate_bound_white,
)
from qfilter.imageops import grayscale


def _page_with_line(horizontal=True, w=160, h=120):
    g = np.full((h, w), 245, dtype=np.uint8)
    rng = np.random.default_rng(3)
    # some text-ish ink so Otsu has two classes
    for y in range(20, h - 20, 14):
        x = 10
        while x < w - 15:
            seg = int(rng.integers(8, 16))
            g[y : y + 4, x : x + seg] = 20
            x += seg + 10
    if horizontal:
        g[h // 2 : h // 2 + 2, 2 : w - 2] = 15  # full-width rule
    else:
        g[2 : h - 2, w // 2 : w // 2 + 2] = 15
    return np.stack([g] * 3, axis=-1)


def test_detect_horizontal_line():
    px = _page_with_line(horizontal=True)
    d = detect_lines(grayscale(px), min_len_ratio=0.8)
    assert d["has_line"] and d["orientation"] == "h" and d["score"] > 0.5


def test_detect_vertical_line():
    px = _page_with_line(horizontal=False)
    d = detect_lines(grayscale(px), min_len_ratio=0.8)
    assert d["has_line"] and d["orientation"] == "v"


def test_no_line_on_clean_page():
    px = _page_with_line(horizontal=True)
    px[:, :, :] = np.where(px < 100, px, px)  # keep text
    clean = _page_with_line(horizontal=True)
    clean[58:62] = 245  # erase the rule
    d = detect_lines(grayscale(clean), min_len_ratio=0.8)
    assert not d["has_line"]


def test_remove_lines_erases_rule_keeps_text():
    px = _page_with_line(horizontal=True)
    out = remove_lines(px, min_len_ratio=0.5, line_thickness=3)
    mid = grayscale(out)[58:62, 20:-20]
    assert mid.mean() > 200  # rule replaced by paper
    d = detect_lines(grayscale(out), min_len_ratio=0.8)
    assert not d["has_line"]


def test_lighten_raises_dark_background():
    px = _page_with_line(horizontal=False)
    dark = (px.astype(np.float64) * 0.55).astype(np.uint8)
    out = lighten_basic(dark)
    assert grayscale(out).mean() > grayscale(dark).mean() + 40


def test_rotate_bound_identity_and_size():
    px = _page_with_line()
    out0 = rotate_bound_white(px, 0.0)
    assert out0.shape[0] >= px.shape[0] and out0.shape[1] >= px.shape[1]
    assert abs(float(grayscale(out0).mean()) - float(grayscale(px).mean())) < 3
    out90 = rotate_bound_white(px, 90.0)
    assert out90.shape[:2] == (px.shape[1], px.shape[0])


@pytest.mark.parametrize("true_angle", [-4.0, 3.0])
def test_deskew_recovers_angle(true_angle):
    base = _page_with_line(horizontal=True)
    skewed = rotate_bound_white(base, true_angle)
    est = deskew_angle_search(grayscale(skewed))
    # rotating by est should undo the skew: est ~ -true_angle
    assert abs(est + true_angle) <= 0.6, (true_angle, est)


def test_line_feature_stage(spark, smoke_dir):
    import os

    from qfilter.enhance import with_line_features

    img = spark.read.parquet(os.path.join(smoke_dir, "images.parquet")).limit(60)
    out = with_line_features(img).select(
        "image_id", "has_line", "line_orientation", "line_score", "n_line_boxes"
    )
    rows = out.collect()
    assert len(rows) == 60
    assert all(r.line_score >= 0.0 for r in rows)
