"""Capture .explain('formatted') output for the round-6 touched queries.

Usage: python tools/capture_plans.py <outdir> [suffix]
Writes <outdir>/<query>_<suffix>.txt for each captured query.
Run once from the round-start commit (suffix=before) and once from the
final tree (suffix=after); the plan files are the judge's evidence for
plan-shape claims in OPTIMIZATION_r06.md.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (REPO, os.path.join(REPO, "tools")):
    if p not in sys.path:
        sys.path.insert(0, p)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    outdir = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else "after"
    os.makedirs(outdir, exist_ok=True)

    from make_fixtures import ensure_fixtures

    from qfilter import corpus, similarity
    from qfilter.augment import with_augmented
    from qfilter.cascade import with_labels
    from qfilter.dedup import phash_winners
    from qfilter.features import with_all_features
    from qfilter.session import get_spark

    spark = get_spark(app="capture-plans", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    tdir = ensure_fixtures("bench")
    images = spark.read.parquet(os.path.join(tdir, "images.parquet")).repartition(
        CPUS * 3, "image_id"
    )

    def cap(name, df):
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            ))
        print("wrote", path)

    cap("qfilter_e2e", with_labels(with_all_features(images)).select(
        "image_id", "category", "reason", "keep", "is_dark", "lang",
        "caption_scrubbed", "pii_hits", "tox_hits", "phash64",
    ))
    cap("phash_dedup", phash_winners(images))
    cap("augment_2x", with_augmented(images, variants=2))
    cap("trigram_jaccard_pairs", corpus.trigram_jaccard_pairs(spark, SF_DIR))
    cap("minhash_lsh_dup_pairs", corpus.minhash_lsh_dup_pairs(spark, SF_DIR))
    cap("neardup_components", corpus.neardup_components(spark, SF_DIR))
    cap("neardup_components_star", corpus.neardup_components_star(spark, SF_DIR))
    cap("winnow_fingerprints", corpus.winnow_fingerprints(spark, SF_DIR))
    cap("substring_dup_spans", corpus.substring_dup_spans(spark, SF_DIR))
    cap("decontaminate", corpus.decontaminate(spark, SF_DIR))
    cap("event_sessions", corpus.event_sessions(spark, SF_DIR))
    cap("weighted_median_value", corpus.weighted_median_value(spark, SF_DIR))
    cap("cosine_topk_bucketed", similarity.cosine_topk_bucketed(spark, SF_DIR))
    cap("simhash64", corpus.simhash64(spark, SF_DIR))
    spark.stop()


if __name__ == "__main__":
    main()
