"""Train -> artifact -> broadcast -> batch-infer path (reference entry
point 3, SURVEY §3.3).

From-scratch numpy logistic regression standing in for the reference's
StandardScaler + LogisticRegression pipeline
(`tune_extended_classifier.py:171-191`) and its pickled-model predict
(`infer_quality.py:16-91`, joblib dict {'model','features'}), reshaped
for Spark:

1. fit on a driver-side SAMPLE of the features table (orderBy + limit,
   same discipline as the IVF quantizer — never a full-table driver
   read at 100 TB);
2. serialize weights to an ``.npz`` artifact (`save_model`), the
   analog of the reference's joblib dump
   (`tune_extended_classifier.py:277-281`);
3. broadcast the weights to executors and batch-predict inside one
   vectorized pandas UDF (`with_model_scores`).

Determinism contract (the DuckDB oracle recomputes the identical
doubles):

* features are the ARITHMETIC-ONLY engineered columns (no log1p terms
  — JVM ``Math.log`` vs libm differ in the last ulp, see
  `qf_derived_features`), so every feature value is bit-identical
  between Spark, numpy and DuckDB;
* training avoids BLAS matmul (thread-blocking-dependent reduction
  order) — all reductions are numpy pairwise sums over fixed-order
  arrays, so the same sample rows give bit-identical weights in any
  process;
* inference accumulates ``z = b + w1*f1 + w2*f2 + ...`` strictly
  left-to-right, elementwise — the oracle SQL nests the additions in
  the same order, so scores match bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MODEL_FEATURES",
    "TRAIN_SAMPLE_MAX",
    "CV_K",
    "fit_logreg",
    "train_from_features",
    "cv_models_from_features",
    "with_cv_scores",
    "save_model",
    "load_model",
    "with_model_scores",
]

# arithmetic-only engineered features (infer_quality.py:50-58 minus the
# log1p terms; raw gates pct80/median_ocr_conf/conf_iqr as in the
# tuning cascade tune_extended_classifier.py:81-97)
MODEL_FEATURES = [
    "pct80",
    "median_ocr_conf",
    "conf_iqr",
    "conf_range",
    "blur_per_word",
    "density_per_conf",
    "pct80_squared",
    "line_height_cv",
    "line_spacing_cv",
]

TRAIN_SAMPLE_MAX = 4096  # driver-side training sample cap
LOGREG_LR = 0.5
LOGREG_ITERS = 400
LOGREG_L2 = 1e-3


def fit_logreg(
    X: np.ndarray,
    y: np.ndarray,
    lr: float = LOGREG_LR,
    iters: int = LOGREG_ITERS,
    l2: float = LOGREG_L2,
) -> tuple[np.ndarray, float]:
    """Full-batch gradient-descent logistic regression with internal
    standardization (the reference pipeline's StandardScaler), folded
    back into RAW-feature weights so predict is a plain affine score.

    Deterministic: fixed iteration count, zero init, no BLAS matmul
    (see module docstring).  Returns (w_raw, b_raw) with
    score(x) = b_raw + sum_i w_raw[i] * x[i]."""
    # C-contiguous: numpy's pairwise reductions traverse by memory
    # layout, so a Fortran-ordered input (pandas .to_numpy()) would sum
    # in a different order and break bit-identity with the oracle twin
    X = np.ascontiguousarray(X, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if X.ndim != 2 or len(X) != len(y) or len(X) == 0:
        raise ValueError(f"bad training shapes X={X.shape} y={y.shape}")
    mu = X.mean(axis=0)
    sd = X.std(axis=0)
    # (near-)constant features: folding w/sd back with sd ~ 1e-30 would
    # explode the raw weight (catastrophic cancellation in the score);
    # treat them as unscaled — their standardized values stay ~0, so GD
    # leaves their weight at ~0
    sd = np.where(sd > 1e-9 * np.maximum(1.0, np.abs(mu)), sd, 1.0)
    Xs = (X - mu) / sd
    n, d = Xs.shape
    w = np.zeros(d, dtype=np.float64)
    b = 0.0
    for _ in range(iters):
        z = b + (Xs * w).sum(axis=1)
        p = 1.0 / (1.0 + np.exp(-z))
        err = p - y
        gw = (Xs * err[:, None]).sum(axis=0) / n + l2 * w
        gb = float(err.sum()) / n
        w = w - lr * gw
        b = b - lr * gb
    w_raw = w / sd
    b_raw = b - float((w * mu / sd).sum())
    return w_raw, float(b_raw)


def train_from_features(
    features: DataFrame,
    label_col: str = "keep",
    order_col: str = "image_id",
    sample_max: int = TRAIN_SAMPLE_MAX,
) -> tuple[np.ndarray, float]:
    """Fit from a Spark features table: deterministic orderBy + limit
    sample -> driver -> `fit_logreg`.  Only <= sample_max rows ever
    reach the driver (100 TB: the sort+limit is a TakeOrdered, not a
    full collect)."""
    rows = (
        features.select(order_col, label_col, *MODEL_FEATURES)
        .orderBy(order_col)
        .limit(sample_max)
        .collect()
    )
    X = np.asarray([[float(r[f]) for f in MODEL_FEATURES] for r in rows])
    y = np.asarray([1.0 if r[label_col] else 0.0 for r in rows])
    return fit_logreg(X, y)


CV_K = 5  # folds, as the reference's cross_val_score(cv=5) default


def cv_models_from_features(
    features: DataFrame,
    k: int = CV_K,
    label_col: str = "keep",
    order_col: str = "image_id",
    sample_max: int = TRAIN_SAMPLE_MAX,
) -> list[tuple[np.ndarray, float]]:
    """K-fold CV models (A7, reference `tune_extended_classifier.py`
    cross_val_score): deterministic orderBy+limit sample, fold f =
    position % k over the sorted sample, model f trained on every
    OTHER fold.  Same driver discipline as `train_from_features` —
    only <= sample_max rows leave the cluster."""
    rows = (
        features.select(order_col, label_col, *MODEL_FEATURES)
        .orderBy(order_col)
        .limit(sample_max)
        .collect()
    )
    X = np.asarray([[float(r[f]) for f in MODEL_FEATURES] for r in rows])
    y = np.asarray([1.0 if r[label_col] else 0.0 for r in rows])
    folds = np.arange(len(rows)) % k
    return [fit_logreg(X[folds != f], y[folds != f]) for f in range(k)]


def with_cv_scores(
    df: DataFrame, models: list[tuple[np.ndarray, float]], fold_col: str = "fold"
) -> DataFrame:
    """Held-out prediction: each row is scored by the model that did
    NOT train on its fold.  One broadcast of the (k, d) weight matrix,
    one Arrow-batched UDF; z accumulates left-to-right per feature like
    `with_model_scores`, so the oracle's per-fold nested affine SQL is
    bit-identical."""
    spark = df.sparkSession
    W = np.asarray([m[0] for m in models], dtype=np.float64)
    B = np.asarray([m[1] for m in models], dtype=np.float64)
    bc = spark.sparkContext.broadcast((W, B))

    @F.pandas_udf(T.BooleanType())
    def pred(fold: pd.Series, *cols: pd.Series) -> pd.Series:
        Wm, Bm = bc.value
        fidx = fold.to_numpy(dtype=np.int64)
        z = Bm[fidx].copy()
        for i, c in enumerate(cols):
            z = z + Wm[fidx, i] * c.to_numpy(dtype=np.float64)
        return pd.Series(z > 0.0)

    return df.withColumn(
        "pred_keep", pred(F.col(fold_col), *[F.col(f) for f in MODEL_FEATURES])
    )


def save_model(path: str, w: np.ndarray, b: float) -> None:
    """.npz artifact — {'model','features'} like the reference's joblib
    dump, numpy-only (no pickled code)."""
    np.savez_compressed(
        path, w=np.asarray(w, dtype=np.float64), b=np.float64(b),
        features=np.array(MODEL_FEATURES),
    )


def load_model(path: str) -> tuple[np.ndarray, float]:
    z = np.load(path, allow_pickle=False)
    feats = [str(x) for x in z["features"]]
    if feats != MODEL_FEATURES:
        raise ValueError(f"artifact feature order {feats} != {MODEL_FEATURES}")
    return z["w"].astype(np.float64), float(z["b"])


_SCORE_SCHEMA = T.StructType(
    [
        T.StructField("score", T.DoubleType()),
        T.StructField("pred_keep", T.BooleanType()),
    ]
)


def with_model_scores(df: DataFrame, w: np.ndarray, b: float) -> DataFrame:
    """Batch inference: broadcast the (tiny) weight vector, score every
    row inside one Arrow-batched pandas UDF.

    z accumulates left-to-right per feature (elementwise numpy adds, no
    matmul) so the oracle SQL's identically-nested expression produces
    bit-identical doubles.  pred_keep = z > 0 (p > 0.5)."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((np.asarray(w, dtype=np.float64), float(b)))

    @F.pandas_udf(_SCORE_SCHEMA)
    def score(*cols: pd.Series) -> pd.DataFrame:
        ws, bb = bc.value
        z = np.full(len(cols[0]), bb, dtype=np.float64)
        for wi, c in zip(ws, cols):
            z = z + wi * c.to_numpy(dtype=np.float64)
        return pd.DataFrame({"score": z, "pred_keep": z > 0.0})

    out = df.withColumn("_m", score(*[F.col(f) for f in MODEL_FEATURES]))
    return out.select(*df.columns, "_m.*")
