"""Twin-parity for the enhance / line / orientation kernels.

`oracle/imageref.py` re-implements the recipes on different machinery
(np.pad + sliding windows, BFS flood-fill components, histogram-loop
Otsu, flattened-index rotation gathers).  Exact equality against the
live kernels over fixture images means the sidecar oracles are backed
by TWO implementations, not one — and the sensitivity test below
proves a 1-ulp kernel drift is caught, not absorbed.
"""

from __future__ import annotations

import numpy as np
import pytest

from qfilter import codecs, enhance
from qfilter.imageops import grayscale
from oracle import imageref as ref


def _fixture_pxs(limit):
    import os

    import pyarrow.parquet as pq

    from make_fixtures import ensure_fixtures

    tdir = ensure_fixtures("smoke")
    t = (
        pq.read_table(
            os.path.join(tdir, "images.parquet"),
            columns=["image_id", "bytes", "fmt", "w", "h"],
        )
        .to_pandas()
    )
    # deterministic spread across the tier, skipping undecodable rows
    out = []
    step = max(1, len(t) // (limit * 2))
    for i in range(0, len(t), step):
        r = t.iloc[i]
        try:
            out.append(
                (r["image_id"], codecs.decode(r["bytes"], r["fmt"], int(r["w"]), int(r["h"])))
            )
        except Exception:
            continue
        if len(out) >= limit:
            break
    return out


def test_line_features_twin():
    for image_id, px in _fixture_pxs(40):
        g = grayscale(px)
        a = enhance.detect_lines(g, min_len_ratio=0.5)
        b = ref.detect_lines_ref(g, min_len_ratio=0.5)
        assert a["has_line"] == b["has_line"], image_id
        assert a["orientation"] == b["orientation"], image_id
        assert a["score"] == b["score"], image_id
        assert len(a["bboxes"]) == len(b["bboxes"]), image_id


def test_orientation_twin():
    for image_id, px in _fixture_pxs(40):
        a = enhance.orientation_one(px, image_id)
        b = ref.orientation_ref(px, image_id)
        assert a == b, image_id


def test_enhance_stats_twin():
    # deskew runs ~100 bilinear rotations per image; keep the sample
    # small but meaningful
    for image_id, px in _fixture_pxs(12):
        a = enhance.enhance_stats_one(px)
        b = ref.enhance_stats_ref(px)
        for k in a:
            assert a[k] == b[k], (image_id, k, a[k], b[k])


def test_twin_catches_ulp_scale_kernel_drift(monkeypatch):
    """Sensitivity: an infinitesimal drift at a DECISION BOUNDARY (the
    Otsu ink/paper comparison nudged by one float ulp — for integer
    pixels, equivalent to the classic off-by-one threshold bug) must
    make the twin DISAGREE on at least one fixture image — i.e. the
    parity above is a real tripwire, not a tautology.  (A uniform
    1-ulp scale on a score is monotone and argmax-invariant, so the
    boundary nudge is the minimal drift that is observable at all.)"""

    def drifted_otsu_inv(gray):
        from qfilter.imageops import otsu_threshold

        t = otsu_threshold(gray)
        return ((gray.astype(np.float64) <= t - 2.0**-45) * 255).astype(np.uint8)

    monkeypatch.setattr(enhance, "_otsu_inv", drifted_otsu_inv)
    diverged = False
    for image_id, px in _fixture_pxs(12):
        a = enhance.enhance_stats_one(px)
        b = ref.enhance_stats_ref(px)
        if any(a[k] != b[k] for k in a):
            diverged = True
            break
    assert diverged, "boundary-ulp kernel perturbation went undetected by the twin"
