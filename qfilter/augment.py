"""Deterministic image augmentation (training-data op, image axis).

A training pipeline multiplies its corpus with label-preserving
transforms — flip, crop, brightness jitter.  At 100 TB the transform
must be (a) a pure function of ``(image_id, variant)`` so any re-run,
any retry, any cluster produces byte-identical shards (augmented data
is cached/checkpointed downstream; nondeterminism poisons dedup and
resume), and (b) embarrassingly parallel: decode→transform→re-encode
inside one Arrow-batched ``mapInPandas`` stage with NO shuffle — the
variant fan-out is a narrow ``explode`` and bytes never cross an
Exchange (same invariant the e2e pipeline plan-tests).

Parameters derive from crc32(image_id#variant) — not a Spark hash —
so the assignment is reproducible outside Spark too (the single-node
oracle applies the same kernels to the same params).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from qfilter import codecs

__all__ = ["augment_params", "augment_px", "with_augmented", "AUGMENT_SCHEMA"]

_MIN_DIM = 8  # never crop below the smallest kernel-safe image


def augment_params(image_id: str, variant: int) -> dict:
    """Pure function (image_id, variant) -> transform parameters.
    Bit-slices one crc32; every field is exact integer arithmetic."""
    h = zlib.crc32(f"{image_id}#{variant}".encode("utf-8"))
    return {
        "flip": bool(h & 1),
        # each margin in [0, 0.1] on a 32-step grid
        "crop_top": ((h >> 1) & 31) / 310.0,
        "crop_left": ((h >> 6) & 31) / 310.0,
        "crop_bottom": ((h >> 11) & 31) / 310.0,
        "crop_right": ((h >> 16) & 31) / 310.0,
        # additive brightness in [-32, 31]
        "brightness": ((h >> 21) & 63) - 32,
    }


def augment_px(px: np.ndarray, p: dict) -> np.ndarray:
    """Apply flip -> crop -> brightness.  Vectorized slicing and one
    clipped add; no per-pixel Python."""
    if p["flip"]:
        px = px[:, ::-1]
    h, w = px.shape[:2]
    top = int(h * p["crop_top"])
    left = int(w * p["crop_left"])
    bot = h - int(h * p["crop_bottom"])
    right = w - int(w * p["crop_right"])
    if bot - top >= _MIN_DIM and right - left >= _MIN_DIM:
        px = px[top:bot, left:right]
    out = px.astype(np.int16) + int(p["brightness"])
    return np.clip(out, 0, 255).astype(np.uint8)


AUGMENT_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("variant", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("flip", T.BooleanType()),
        T.StructField("crop_top", T.DoubleType()),
        T.StructField("crop_left", T.DoubleType()),
        T.StructField("crop_bottom", T.DoubleType()),
        T.StructField("crop_right", T.DoubleType()),
        T.StructField("brightness", T.IntegerType()),
        T.StructField("error", T.StringType()),
    ]
)

def _augment_iter(batches):
    cols = [f.name for f in AUGMENT_SCHEMA]
    for pdf in batches:
        rows = []
        for iid, data, fmt, w, h, variant in zip(
            pdf["image_id"], pdf["bytes"], pdf["fmt"], pdf["w"], pdf["h"], pdf["variant"]
        ):
            p = augment_params(str(iid), int(variant))
            row = {"image_id": iid, "variant": int(variant), "fmt": fmt, **p}
            try:
                px = codecs.decode(bytes(data), fmt, int(w), int(h))
                out = augment_px(px, p)
                row.update(
                    h=int(out.shape[0]),
                    w=int(out.shape[1]),
                    # deflate level 1 (r6): augmented shards are bulk
                    # training input, not a byte-pinned oracle surface;
                    # level 6 spent ~46% of the stage in zlib for ~15%
                    # smaller shards.  Pixels identical; the single-node
                    # oracle encodes through this same call.
                    bytes=codecs.encode(out, fmt, level=1),
                    error=None,
                )
            except Exception as exc:  # noqa: BLE001 — error channel, never a crash
                row.update(h=None, w=None, bytes=None, error=f"{type(exc).__name__}: {exc}")
            rows.append(row)
        yield pd.DataFrame(rows, columns=cols)


def with_augmented(df: DataFrame, variants: int = 2) -> DataFrame:
    """``variants`` deterministic augmented copies per image.

    The fan-out is a narrow explode (no shuffle), the transform one
    Arrow-batched mapInPandas; output partitioning == input
    partitioning, so a downstream write needs no repartition.
    """
    ex = df.select(
        "image_id",
        "bytes",
        "fmt",
        "w",
        "h",
        F.explode(F.array(*[F.lit(i) for i in range(variants)])).alias("variant"),
    )
    return ex.mapInPandas(_augment_iter, schema=AUGMENT_SCHEMA)
