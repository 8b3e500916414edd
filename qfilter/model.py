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

import math

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


# ------------------------------------------- model family 2: GB stumps
#
# The reference's model zoo trains RandomForest / GradientBoosting /
# SVM variants next to the logistic pipeline and picks the best by CV
# accuracy (tune_extended_classifier.py:134-238).  sklearn is not
# available here, so the second family is a from-scratch deterministic
# gradient-boosted-stumps classifier: logistic-loss boosting, each
# round fitting a depth-1 tree (feature, threshold, two Newton-step
# leaf values).  Bit-identity discipline matches fit_logreg: fixed
# round count, no BLAS, all reductions are numpy sums over arrays in
# original row order, ties broken by (feature index, threshold index),
# and inference accumulates z = f0 + round_1 + round_2 + ... strictly
# left-to-right so the oracle SQL's identically-nested CASE chain
# produces bit-identical doubles.

GB_ROUNDS = 12
GB_LR = 0.5
GB_MAX_CANDS = 32


def _stump_candidates(col: np.ndarray) -> np.ndarray:
    """Deterministic candidate thresholds: midpoints between sorted
    unique values, thinned to <= GB_MAX_CANDS evenly by index."""
    u = np.unique(col)
    if len(u) < 2:
        return np.empty(0)
    mids = (u[:-1] + u[1:]) / 2.0
    if len(mids) > GB_MAX_CANDS:
        idx = (np.arange(GB_MAX_CANDS) * len(mids)) // GB_MAX_CANDS
        mids = mids[idx]
    return mids


def fit_gb_stumps(
    X: np.ndarray,
    y: np.ndarray,
    rounds: int = GB_ROUNDS,
    lr: float = GB_LR,
) -> dict:
    """Gradient-boosted decision stumps for binary logistic loss.

    Per round: residual r = y - p; split (j, t) maximizes the exact
    variance-reduction score sum_L(r)^2/n_L + sum_R(r)^2/n_R; leaf
    values are one Newton step sum(r)/sum(p(1-p)) clipped to +-4 (the
    standard Friedman/LogitBoost guard against vanishing Hessians).
    Returns {"f0", "feat", "thr", "val_l", "val_r"} with the learning
    rate folded into the leaf values:
    score(x) = f0 + sum_k (x[feat_k] <= thr_k ? val_l_k : val_r_k).
    """
    X = np.ascontiguousarray(X, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n, d = X.shape
    if n == 0:
        raise ValueError("empty training set")
    cands = [_stump_candidates(X[:, j]) for j in range(d)]
    feat = np.zeros(rounds, dtype=np.int64)
    thr = np.zeros(rounds, dtype=np.float64)
    val_l = np.zeros(rounds, dtype=np.float64)
    val_r = np.zeros(rounds, dtype=np.float64)
    gain_arr = np.zeros(rounds, dtype=np.float64)
    Fv = np.zeros(n, dtype=np.float64)
    for k in range(rounds):
        p = 1.0 / (1.0 + np.exp(-Fv))
        r = y - p
        h = p * (1.0 - p)
        best = (-np.inf, 0, 0.0)
        for j in range(d):
            col = X[:, j]
            for t in cands[j]:
                m = col <= t
                nl = int(m.sum())
                if nl == 0 or nl == n:
                    continue
                sl = float(r[m].sum())
                sr = float(r[~m].sum())
                gain = sl * sl / nl + sr * sr / (n - nl)
                if gain > best[0]:
                    best = (gain, j, float(t))
        gbest, j, t = best
        m = X[:, j] <= t
        gain_arr[k] = gbest  # variance-reduction score of the round
        hl = float(h[m].sum())
        hr = float(h[~m].sum())
        gl = float(np.clip(float(r[m].sum()) / max(hl, 1e-9), -4.0, 4.0))
        gr = float(np.clip(float(r[~m].sum()) / max(hr, 1e-9), -4.0, 4.0))
        feat[k] = j
        thr[k] = t
        val_l[k] = lr * gl
        val_r[k] = lr * gr
        Fv = Fv + np.where(m, val_l[k], val_r[k])
    return {"f0": 0.0, "feat": feat, "thr": thr, "val_l": val_l,
            "val_r": val_r, "gain": gain_arr}


def gb_train_from_features(
    features: DataFrame,
    label_col: str = "keep",
    order_col: str = "image_id",
    sample_max: int = TRAIN_SAMPLE_MAX,
) -> dict:
    """Same deterministic orderBy+limit driver sample as
    `train_from_features`, GB-stumps fit."""
    rows = (
        features.select(order_col, label_col, *MODEL_FEATURES)
        .orderBy(order_col)
        .limit(sample_max)
        .collect()
    )
    X = np.asarray([[float(r[f]) for f in MODEL_FEATURES] for r in rows])
    y = np.asarray([1.0 if r[label_col] else 0.0 for r in rows])
    return fit_gb_stumps(X, y)


def gb_cv_models_from_features(
    features: DataFrame,
    k: int = CV_K,
    label_col: str = "keep",
    order_col: str = "image_id",
    sample_max: int = TRAIN_SAMPLE_MAX,
) -> list[dict]:
    rows = (
        features.select(order_col, label_col, *MODEL_FEATURES)
        .orderBy(order_col)
        .limit(sample_max)
        .collect()
    )
    X = np.asarray([[float(r[f]) for f in MODEL_FEATURES] for r in rows])
    y = np.asarray([1.0 if r[label_col] else 0.0 for r in rows])
    folds = np.arange(len(rows)) % k
    return [fit_gb_stumps(X[folds != f], y[folds != f]) for f in range(k)]


def save_gb(path: str, model: dict) -> None:
    """.npz artifact for the stump ensemble (same shape discipline as
    `save_model`: arrays + feature list, no pickled code)."""
    np.savez_compressed(
        path,
        f0=np.float64(model["f0"]),
        feat=model["feat"].astype(np.int64),
        thr=model["thr"].astype(np.float64),
        val_l=model["val_l"].astype(np.float64),
        val_r=model["val_r"].astype(np.float64),
        features=np.array(MODEL_FEATURES),
    )


def load_gb(path: str) -> dict:
    z = np.load(path, allow_pickle=False)
    feats = [str(x) for x in z["features"]]
    if feats != MODEL_FEATURES:
        raise ValueError(f"artifact feature order {feats} != {MODEL_FEATURES}")
    return {
        "f0": float(z["f0"]),
        "feat": z["feat"].astype(np.int64),
        "thr": z["thr"].astype(np.float64),
        "val_l": z["val_l"].astype(np.float64),
        "val_r": z["val_r"].astype(np.float64),
    }


def with_gb_scores(df: DataFrame, model: dict) -> DataFrame:
    """Broadcast the stump arrays, score in one Arrow-batched UDF.
    z accumulates round-by-round left-to-right; the oracle SQL nests
    the same CASE terms in the same order -> bit-identical doubles."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(
        (
            float(model["f0"]), model["feat"].astype(np.int64),
            model["thr"].astype(np.float64),
            model["val_l"].astype(np.float64),
            model["val_r"].astype(np.float64),
        )
    )

    @F.pandas_udf(_SCORE_SCHEMA)
    def score(*cols: pd.Series) -> pd.DataFrame:
        f0, feat, thr, vl, vr = bc.value
        mats = [c.to_numpy(dtype=np.float64) for c in cols]
        z = np.full(len(mats[0]), f0, dtype=np.float64)
        for k in range(len(feat)):
            z = z + np.where(mats[feat[k]] <= thr[k], vl[k], vr[k])
        return pd.DataFrame({"score": z, "pred_keep": z > 0.0})

    out = df.withColumn("_m", score(*[F.col(f) for f in MODEL_FEATURES]))
    return out.select(*df.columns, "_m.*")


def with_gb_cv_scores(
    df: DataFrame, models: list[dict], fold_col: str = "fold"
) -> DataFrame:
    """Held-out stump-ensemble prediction (the GB analog of
    `with_cv_scores`): each row scored by the model that did NOT train
    on its fold, one broadcast of all k ensembles."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(
        [
            (
                float(m["f0"]), m["feat"].astype(np.int64),
                m["thr"].astype(np.float64),
                m["val_l"].astype(np.float64),
                m["val_r"].astype(np.float64),
            )
            for m in models
        ]
    )

    @F.pandas_udf(T.BooleanType())
    def pred(fold: pd.Series, *cols: pd.Series) -> pd.Series:
        ms = bc.value
        fidx = fold.to_numpy(dtype=np.int64)
        mats = [c.to_numpy(dtype=np.float64) for c in cols]
        z = np.empty(len(fidx), dtype=np.float64)
        for f, (f0, feat, thr, vl, vr) in enumerate(ms):
            sel = fidx == f
            if not sel.any():
                continue
            zz = np.full(int(sel.sum()), f0, dtype=np.float64)
            for k in range(len(feat)):
                zz = zz + np.where(mats[feat[k]][sel] <= thr[k], vl[k], vr[k])
            z[sel] = zz
        return pd.Series(z > 0.0)

    return df.withColumn(
        "pred_keep", pred(F.col(fold_col), *[F.col(f) for f in MODEL_FEATURES])
    )


# ---------------------------------- model families 3-5: RF / SVM / vote
#
# Completing the reference zoo shape (tune_extended_classifier.py:
# 134-225: RandomForest grid, GradientBoosting grid, LR grid, SVC,
# soft VotingClassifier).  Same determinism discipline: fixed
# iteration counts, integer-hash pseudo-randomness (no RNG state), no
# BLAS, fixed accumulation orders.  The RBF-kernel SVC is replaced by
# a from-scratch LINEAR SVM (documented deviation — kernel machines
# need stateful solvers; the zoo's point is the bake-off shape), with
# sigmoid(margin) as its soft probability (Platt-style with unit
# scale, deterministic).

RF_TREES = 8
RF_DEPTH = 2  # root + one split per side = 4 leaves
_HASH_A = 2654435761  # Knuth multiplicative constant


def _tree_fit(X: np.ndarray, y: np.ndarray, feats: list[int]) -> dict:
    """Depth-2 CART on the given feature subset: gini-gain splits over
    `_stump_candidates` thresholds, leaf value = keep fraction.

    Each realized split also records its impurity decrease in
    ``gains`` as (feature, gain) pairs in split order (root, left,
    right) — the raw material for `feature_importance_rows`
    (reference feature_importances_, tune_extended_classifier.py:
    244-251)."""

    def parent_impurity(idx):
        # total (unnormalized) gini of the node: n * p * (1 - p)
        n = len(idx)
        p = float(y[idx].sum()) / max(n, 1)
        return n * (p * (1.0 - p))

    def best_split(idx):
        yy = y[idx]
        n = len(idx)
        base = yy.sum()
        best = (-np.inf, -1, 0.0)
        for j in feats:
            col = X[idx, j]
            for t in _stump_candidates(col):
                m = col <= t
                nl = int(m.sum())
                if nl == 0 or nl == n:
                    continue
                sl = float(yy[m].sum())
                sr = base - sl
                # negative weighted gini impurity (higher = better)
                pl, pr = sl / nl, sr / (n - nl)
                score = -(
                    nl * (pl * (1.0 - pl)) + (n - nl) * (pr * (1.0 - pr))
                )
                if score > best[0]:
                    best = (score, j, float(t))
        return best

    def leaf(idx):
        return float(y[idx].sum()) / max(len(idx), 1)

    all_idx = np.arange(len(X))
    gains: list[tuple[int, float]] = []
    s0 = best_split(all_idx)
    if s0[1] < 0:
        p = leaf(all_idx)
        return {"feat": 0, "thr": np.inf, "l": (0, np.inf, p, p),
                "r": (0, np.inf, p, p), "gains": gains}
    _, j0, t0 = s0
    # best_split's score is -(weighted child gini total), so the
    # impurity DECREASE of the split is parent_total + score
    gains.append((int(j0), parent_impurity(all_idx) + s0[0]))
    left = all_idx[X[all_idx, j0] <= t0]
    right = all_idx[X[all_idx, j0] > t0]

    def child(idx):
        if len(idx) < 4:
            p = leaf(idx)
            return (0, np.inf, p, p)
        s = best_split(idx)
        if s[1] < 0:
            p = leaf(idx)
            return (0, np.inf, p, p)
        _, j, t = s
        gains.append((int(j), parent_impurity(idx) + s[0]))
        m = X[idx, j] <= t
        return (j, t, leaf(idx[m]), leaf(idx[~m]))

    return {"feat": j0, "thr": t0, "l": child(left), "r": child(right),
            "gains": gains}


def fit_rf_lite(X: np.ndarray, y: np.ndarray, trees: int = RF_TREES) -> list[dict]:
    """Bagged depth-2 trees: per-tree bootstrap rows and feature
    subsets from integer hashes (deterministic in any process).
    predict_proba(x) = mean over trees of the leaf keep-fraction,
    accumulated in tree order."""
    X = np.ascontiguousarray(X, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n, d = X.shape
    forest = []
    for t in range(trees):
        rows = ((np.arange(n, dtype=np.uint64) * _HASH_A + 40503 * (t + 1))
                % (2**32)) % n
        feats = sorted(
            j for j in range(d) if (j * _HASH_A + t) % 4 != 0
        ) or list(range(d))
        forest.append(_tree_fit(X[rows.astype(np.int64)], y[rows.astype(np.int64)], feats))
    return forest


def rf_proba(X: np.ndarray, forest: list[dict]) -> np.ndarray:
    """Mean leaf probability over trees, t-order accumulation (the
    oracle SQL nests the identical CASE chain)."""
    X = np.asarray(X, dtype=np.float64)
    p = np.zeros(len(X), dtype=np.float64)
    for tr in forest:
        root = X[:, tr["feat"]] <= tr["thr"]
        jl, tl, pll, plr = tr["l"]
        jr, trr, prl, prr = tr["r"]
        pl = np.where(X[:, jl] <= tl, pll, plr)
        pr = np.where(X[:, jr] <= trr, prl, prr)
        p = p + np.where(root, pl, pr)
    return p / float(len(forest))


SVM_LR = 0.5
SVM_ITERS = 300
SVM_L2 = 1e-3


def fit_svm_linear(
    X: np.ndarray,
    y: np.ndarray,
    lr: float = SVM_LR,
    iters: int = SVM_ITERS,
    l2: float = SVM_L2,
) -> tuple[np.ndarray, float]:
    """Linear SVM by full-batch subgradient descent on the hinge loss
    with internal standardization folded back into raw-feature weights
    (same shape discipline as `fit_logreg`).  Returns (w_raw, b_raw)."""
    X = np.ascontiguousarray(X, dtype=np.float64)
    yy = np.where(np.asarray(y, dtype=np.float64) > 0.5, 1.0, -1.0)
    mu = X.mean(axis=0)
    sd = X.std(axis=0)
    sd = np.where(sd > 1e-9 * np.maximum(1.0, np.abs(mu)), sd, 1.0)
    Xs = (X - mu) / sd
    n, d = Xs.shape
    w = np.zeros(d, dtype=np.float64)
    b = 0.0
    for _ in range(iters):
        z = b + (Xs * w).sum(axis=1)
        viol = (yy * z) < 1.0
        gw = -(Xs * (yy * viol)[:, None]).sum(axis=0) / n + l2 * w
        gb = -float((yy * viol).sum()) / n
        w = w - lr * gw
        b = b - lr * gb
    return w / sd, float(b - float((w * mu / sd).sum()))


def _sigmoid(z: np.ndarray) -> np.ndarray:
    # scalar libm exp per element, NOT np.exp: numpy >= 1.22 ships its
    # own SIMD exp that can differ from glibc libm by 1 ulp, while the
    # qf_model_zoo oracle's DuckDB exp() IS libm — a scalar math.exp
    # loop keeps both engines on one code path (only runs over the
    # <= TRAIN_SAMPLE_MAX CV sample, never the corpus hot path).
    out = np.empty(len(z), dtype=np.float64)
    for i, v in enumerate(z.astype(np.float64, copy=False)):
        try:
            e = math.exp(-float(v))
        except OverflowError:  # libm would return +inf -> sigmoid 0.0
            e = math.inf
        out[i] = 1.0 / (1.0 + e)
    return out


# --------------------------------- RBF-kernel SVC via random Fourier
# features (round 4, closing the documented linear stand-in).  The
# reference zoo races SVC(kernel='rbf', probability=True)
# (tune_extended_classifier.py:196,213); a true kernel machine needs a
# stateful QP solver, but the Rahimi-Recht random-features map
# cos(w.x + b) with w ~ N(0, 2*gamma*I) approximates the RBF kernel
# and turns the fit into the SAME deterministic linear subgradient
# problem already used for `fit_svm_linear` — honest, from-scratch,
# and SQL-expressible (the oracle nests D cos() terms).

RFF_D = 16  # random features; SQL oracle nests D cos terms per fold


def _hash_unit(i: int) -> float:
    """Deterministic uniform in (0, 1) from an integer index — no RNG
    state, identical in any process (same discipline as `fit_rf_lite`'s
    bootstrap hashes)."""
    h = (i * _HASH_A + 12345) % (2 ** 32)
    return (h + 0.5) / 2.0 ** 32


def fit_svm_rff(
    X: np.ndarray,
    y: np.ndarray,
    D: int = RFF_D,
    lr: float = SVM_LR,
    iters: int = SVM_ITERS,
    l2: float = SVM_L2,
) -> dict:
    """RBF-approximating SVM: standardize, map through D random
    Fourier features z_k = sqrt(2/D) * cos(w_k . s + b_k) with
    w_k ~ N(0, 2*gamma*I) (gamma = 1/d, sklearn's 'scale' on
    standardized features), then hinge-loss subgradient descent in
    z-space.  All pseudo-randomness is integer-hash Box-Muller —
    deterministic in any process.  Returns a dict model
    {mu, sd, W, B, scale, w, b}; score via `svm_rff_margin`."""
    X = np.ascontiguousarray(X, dtype=np.float64)
    yy = np.where(np.asarray(y, dtype=np.float64) > 0.5, 1.0, -1.0)
    n, d = X.shape
    mu = X.mean(axis=0)
    sd = X.std(axis=0)
    sd = np.where(sd > 1e-9 * np.maximum(1.0, np.abs(mu)), sd, 1.0)
    S = (X - mu) / sd
    gamma = 1.0 / d
    gstd = math.sqrt(2.0 * gamma)
    W = np.empty((D, d), dtype=np.float64)
    B = np.empty(D, dtype=np.float64)
    for k in range(D):
        for j in range(d):
            u1 = _hash_unit(k * 131 + j * 2 + 1)
            u2 = _hash_unit(k * 131 + j * 2 + 2)
            W[k, j] = gstd * math.sqrt(-2.0 * math.log(u1)) * math.cos(
                2.0 * math.pi * u2
            )
        B[k] = 2.0 * math.pi * _hash_unit(100003 + k)
    scale = math.sqrt(2.0 / D)
    # feature map with the same left-to-right accumulation the oracle
    # SQL nests; cos is scalar libm (see _sigmoid for why not np.cos)
    Z = _rff_features(S, W, B, scale)
    w = np.zeros(D, dtype=np.float64)
    b = 0.0
    for _ in range(iters):
        z = b + (Z * w).sum(axis=1)
        viol = (yy * z) < 1.0
        gw = -(Z * (yy * viol)[:, None]).sum(axis=0) / n + l2 * w
        gb = -float((yy * viol).sum()) / n
        w = w - lr * gw
        b = b - lr * gb
    return {"mu": mu, "sd": sd, "W": W, "B": B, "scale": scale,
            "w": w, "b": float(b)}


def _rff_features(S: np.ndarray, W: np.ndarray, B: np.ndarray,
                  scale: float) -> np.ndarray:
    """scale * cos(B_k + sum_j W_kj * s_j), per-feature left-to-right
    elementwise adds (no matmul) and scalar libm cos — the oracle
    SQL's identically-nested chain over DuckDB's libm cos produces
    bit-identical doubles."""
    n = len(S)
    D = len(B)
    Z = np.empty((n, D), dtype=np.float64)
    for k in range(D):
        zk = np.full(n, B[k], dtype=np.float64)
        for j in range(S.shape[1]):
            zk = zk + W[k, j] * S[:, j]
        for i in range(n):
            Z[i, k] = scale * math.cos(zk[i])
    return Z


def svm_rff_margin(X: np.ndarray, model: dict) -> np.ndarray:
    """margin = b + sum_k w_k * z_k, k-order accumulation (the oracle
    nests the identical chain); pred = margin > 0, proba =
    sigmoid(margin) (Platt-style unit scale, as the linear family)."""
    X = np.ascontiguousarray(X, dtype=np.float64)
    S = (X - model["mu"]) / model["sd"]
    Z = _rff_features(S, model["W"], model["B"], model["scale"])
    m = np.full(len(X), model["b"], dtype=np.float64)
    w = model["w"]
    for k in range(len(w)):
        m = m + w[k] * Z[:, k]
    return m


def svm_rff_cv_models_from_features(
    features: DataFrame, k: int = CV_K, label_col: str = "keep",
    order_col: str = "image_id", sample_max: int = TRAIN_SAMPLE_MAX,
) -> list[dict]:
    rows = (
        features.select(order_col, label_col, *MODEL_FEATURES)
        .orderBy(order_col).limit(sample_max).collect()
    )
    X = np.asarray([[float(r[f]) for f in MODEL_FEATURES] for r in rows])
    y = np.asarray([1.0 if r[label_col] else 0.0 for r in rows])
    folds = np.arange(len(rows)) % k
    return [fit_svm_rff(X[folds != f], y[folds != f]) for f in range(k)]


def with_svm_rff_cv_scores(
    df: DataFrame, models: list[dict], fold_col: str = "fold"
) -> DataFrame:
    """Held-out RFF-SVC prediction: margin > 0."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(models)

    @F.pandas_udf(T.BooleanType())
    def pred(fold: pd.Series, *cols: pd.Series) -> pd.Series:
        ms = bc.value
        fidx = fold.to_numpy(dtype=np.int64)
        X = np.column_stack([c.to_numpy(dtype=np.float64) for c in cols])
        out = np.empty(len(fidx), dtype=bool)
        for f, m in enumerate(ms):
            sel = fidx == f
            if sel.any():
                out[sel] = svm_rff_margin(X[sel], m) > 0.0
        return pd.Series(out)

    return df.withColumn(
        "pred_keep", pred(F.col(fold_col), *[F.col(f) for f in MODEL_FEATURES])
    )


def feature_importance_rows(
    rf_folds: list[list[dict]], gb_folds: list[dict]
) -> list[tuple[str, str, int]]:
    """(model, feature, gain_q9) triples from the recorded split gains
    of every CV-fold RF-lite forest and GB-stump ensemble — the raw
    input of qf_feature_importance (reference feature_importances_
    top-10, tune_extended_classifier.py:244-251).  Gains quantize to
    exact floor(g * 1e9) BIGINTs at the source so both engines sum
    integers (order-free) instead of doubles."""
    rows: list[tuple[str, str, int]] = []
    for forest in rf_folds:
        for tr in forest:
            for j, g in tr["gains"]:
                rows.append(
                    ("rf_lite", MODEL_FEATURES[int(j)],
                     int(math.floor(g * 1e9)))
                )
    for m in gb_folds:
        for j, g in zip(m["feat"], m["gain"]):
            rows.append(
                ("gb_stumps", MODEL_FEATURES[int(j)],
                 int(math.floor(float(g) * 1e9)))
            )
    return rows


def zoo_soft_vote_proba(
    X: np.ndarray,
    lr_model: tuple[np.ndarray, float],
    gb_model: dict,
    forest: list[dict],
    svm_model: dict,
) -> np.ndarray:
    """Reference soft VotingClassifier (`tune:208-218`, estimators rf /
    gb / lr / svm): mean of the four probabilities, fixed order
    (((rf + gb) + lr) + svm) / 4.  Probabilities: leaf fractions for
    RF, sigmoid of the boosted margin for GB, sigmoid of the affine
    score for LR, sigmoid of the RFF margin for the kernel SVC.  Sigmoids go through `_sigmoid`'s
    scalar math.exp loop (glibc libm), the same libm the oracle's
    DuckDB exp() calls — numpy's SIMD exp is deliberately avoided so
    bit-parity doesn't rest on a numpy-build coincidence (ADVICE r3);
    any residual divergence is still caught loudly by the hash gate."""
    X = np.ascontiguousarray(X, dtype=np.float64)

    def affine(m):
        w, b = m
        z = np.full(len(X), b, dtype=np.float64)
        for i in range(X.shape[1]):
            z = z + w[i] * X[:, i]
        return z

    p_rf = rf_proba(X, forest)
    zg = np.full(len(X), gb_model["f0"], dtype=np.float64)
    for k in range(len(gb_model["feat"])):
        zg = zg + np.where(
            X[:, gb_model["feat"][k]] <= gb_model["thr"][k],
            gb_model["val_l"][k], gb_model["val_r"][k],
        )
    p_gb = _sigmoid(zg)
    p_lr = _sigmoid(affine(lr_model))
    p_svm = _sigmoid(svm_rff_margin(X, svm_model))
    return (((p_rf + p_gb) + p_lr) + p_svm) / 4.0


def rf_cv_models_from_features(
    features: DataFrame, k: int = CV_K, label_col: str = "keep",
    order_col: str = "image_id", sample_max: int = TRAIN_SAMPLE_MAX,
) -> list[list[dict]]:
    rows = (
        features.select(order_col, label_col, *MODEL_FEATURES)
        .orderBy(order_col).limit(sample_max).collect()
    )
    X = np.asarray([[float(r[f]) for f in MODEL_FEATURES] for r in rows])
    y = np.asarray([1.0 if r[label_col] else 0.0 for r in rows])
    folds = np.arange(len(rows)) % k
    return [fit_rf_lite(X[folds != f], y[folds != f]) for f in range(k)]


def svm_cv_models_from_features(
    features: DataFrame, k: int = CV_K, label_col: str = "keep",
    order_col: str = "image_id", sample_max: int = TRAIN_SAMPLE_MAX,
) -> list[tuple[np.ndarray, float]]:
    rows = (
        features.select(order_col, label_col, *MODEL_FEATURES)
        .orderBy(order_col).limit(sample_max).collect()
    )
    X = np.asarray([[float(r[f]) for f in MODEL_FEATURES] for r in rows])
    y = np.asarray([1.0 if r[label_col] else 0.0 for r in rows])
    folds = np.arange(len(rows)) % k
    return [fit_svm_linear(X[folds != f], y[folds != f]) for f in range(k)]


def with_rf_cv_scores(
    df: DataFrame, forests: list[list[dict]], fold_col: str = "fold"
) -> DataFrame:
    """Held-out RF prediction: leaf-fraction mean > 0.5."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(forests)

    @F.pandas_udf(T.BooleanType())
    def pred(fold: pd.Series, *cols: pd.Series) -> pd.Series:
        fs = bc.value
        fidx = fold.to_numpy(dtype=np.int64)
        X = np.column_stack([c.to_numpy(dtype=np.float64) for c in cols])
        out = np.empty(len(fidx), dtype=bool)
        for f, forest in enumerate(fs):
            sel = fidx == f
            if sel.any():
                out[sel] = rf_proba(X[sel], forest) > 0.5
        return pd.Series(out)

    return df.withColumn(
        "pred_keep", pred(F.col(fold_col), *[F.col(f) for f in MODEL_FEATURES])
    )


def with_vote_cv_scores(
    df: DataFrame,
    lr_models: list,
    gb_models: list,
    forests: list,
    svm_models: list,
    fold_col: str = "fold",
) -> DataFrame:
    """Held-out soft-voting prediction: mean of the four per-family
    probabilities > 0.5 (reference VotingClassifier(voting='soft'))."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((lr_models, gb_models, forests, svm_models))

    @F.pandas_udf(T.BooleanType())
    def pred(fold: pd.Series, *cols: pd.Series) -> pd.Series:
        lrs, gbs, fs, svms = bc.value
        fidx = fold.to_numpy(dtype=np.int64)
        X = np.column_stack([c.to_numpy(dtype=np.float64) for c in cols])
        out = np.empty(len(fidx), dtype=bool)
        for f in range(len(lrs)):
            sel = fidx == f
            if sel.any():
                p = zoo_soft_vote_proba(X[sel], lrs[f], gbs[f], fs[f], svms[f])
                out[sel] = p > 0.5
        return pd.Series(out)

    return df.withColumn(
        "pred_keep", pred(F.col(fold_col), *[F.col(f) for f in MODEL_FEATURES])
    )
