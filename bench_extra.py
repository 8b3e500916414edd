"""Round-6 optimization probes (guide §1.4): noop-sink isolation of the
e2e stages, Arrow-batch-size sweep, and per-query noop timings.

NOT part of the frozen measurement contract — `bench.py` is the
driver's timer; this file exists so OPTIMIZATION_r06.md can cite
stage-isolated numbers (image UDF vs caption UDF vs write) that the
combined bench cannot resolve.

Usage:
    python bench_extra.py e2e        # stage decomposition at current config
    python bench_extra.py sweep      # Arrow batch-rows sweep over the e2e
    python bench_extra.py ops        # noop timings for the operator suite
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
for p in (REPO, os.path.join(REPO, "tools")):
    if p not in sys.path:
        sys.path.insert(0, p)

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("QFILTER_BENCH_RUNS", "3"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, name, fn, runs=RUNS):
    ws = []
    for _ in range(runs):
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        fn()
        ws.append(round(time.time() - t0, 3))
    spark.sparkContext.setJobDescription(None)
    print(json.dumps({"q": name, "walls": ws, "min": min(ws)}), flush=True)
    return min(ws)


def _session():
    from qfilter.session import get_spark

    spark = get_spark(app="qfilter-bench-extra", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _images(spark):
    from make_fixtures import ensure_fixtures

    tdir = ensure_fixtures("bench")
    images = (
        spark.read.parquet(os.path.join(tdir, "images.parquet"))
        .repartition(CPUS * 3, "image_id")
        .persist()
    )
    images.count()
    return images


def e2e_decomposition():
    import tempfile, shutil

    from pyspark.sql import functions as F

    from qfilter.cascade import with_labels
    from qfilter.features import (
        with_all_features,
        with_caption_and_scrub,
        with_image_features,
    )

    spark = _session()
    images = _images(spark)
    sink = tempfile.mkdtemp(prefix="qfilter_bx_")
    out_cols = [
        "image_id", "category", "reason", "keep", "is_dark", "lang",
        "caption_scrubbed", "pii_hits", "tox_hits", "phash64",
    ]
    try:
        # warm-up (worker spawn + JIT), same slice as bench.py
        warm = images.filter(F.crc32(F.col("image_id")) % 59 == 0)
        noop(with_labels(with_all_features(warm)).select(*out_cols))

        timed(spark, "identity_noop", lambda: noop(images.select("image_id", "w", "h")))
        timed(spark, "image_udf_noop", lambda: noop(with_image_features(images)))
        timed(spark, "caption_udf_noop", lambda: noop(with_caption_and_scrub(images.drop("bytes"))))
        timed(spark, "all_features_noop", lambda: noop(with_all_features(images)))
        timed(
            spark, "e2e_noop",
            lambda: noop(with_labels(with_all_features(images)).select(*out_cols)),
        )
        timed(
            spark, "e2e_parquet",
            lambda: with_labels(with_all_features(images))
            .select(*out_cols)
            .write.mode("overwrite")
            .parquet(os.path.join(sink, "labels")),
        )
    finally:
        shutil.rmtree(sink, ignore_errors=True)
    spark.stop()


def sweep():
    # Arrow batch size is read at session build; run one subprocess per size.
    import subprocess

    for rows in (32, 64, 128, 256, 512, 1024):
        env = dict(os.environ, QFILTER_ARROW_BATCH_ROWS=str(rows))
        subprocess.run(
            [sys.executable, __file__, "e2e_only"], env=env, check=True
        )


def e2e_only():
    from pyspark.sql import functions as F

    from qfilter.cascade import with_labels
    from qfilter.features import with_all_features

    spark = _session()
    images = _images(spark)
    out_cols = [
        "image_id", "category", "reason", "keep", "is_dark", "lang",
        "caption_scrubbed", "pii_hits", "tox_hits", "phash64",
    ]
    warm = images.filter(F.crc32(F.col("image_id")) % 59 == 0)
    noop(with_labels(with_all_features(warm)).select(*out_cols))
    rows = os.environ.get("QFILTER_ARROW_BATCH_ROWS", "64")
    timed(
        spark, f"e2e_noop_batch{rows}",
        lambda: noop(with_labels(with_all_features(images)).select(*out_cols)),
    )
    spark.stop()


def ops():
    from qfilter import corpus, similarity

    spark = _session()
    for name, fn in (
        ("trigram_jaccard", lambda: corpus.trigram_jaccard_pairs(spark, SF_DIR)),
        ("winnow_fingerprints", lambda: corpus.winnow_fingerprints(spark, SF_DIR)),
        ("substring_dup_spans", lambda: corpus.substring_dup_spans(spark, SF_DIR)),
        ("decontaminate", lambda: corpus.decontaminate(spark, SF_DIR)),
        ("neardup_components", lambda: corpus.neardup_components(spark, SF_DIR)),
        ("neardup_components_star", lambda: corpus.neardup_components_star(spark, SF_DIR)),
        ("event_sessions", lambda: corpus.event_sessions(spark, SF_DIR)),
        ("weighted_median", lambda: corpus.weighted_median_value(spark, SF_DIR)),
        ("cosine_topk_bucketed", lambda: similarity.cosine_topk_bucketed(spark, SF_DIR)),
    ):
        timed(spark, name, lambda fn=fn: fn().count())
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "e2e"
    {"e2e": e2e_decomposition, "sweep": sweep, "ops": ops,
     "e2e_only": e2e_only}[mode]()
