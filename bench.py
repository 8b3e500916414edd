"""Benchmark driver: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline = the BASELINE.json metric: end-to-end filter throughput
(images/sec) over the deterministic `bench` fixture tier (decode ->
image+caption features -> cascade -> scrub -> parquet sink), plus the
corpus-scale operator suite at the given sf dir.

The e2e stage is materialized with a parquet write — a count() would
let Catalyst prune the feature UDFs away and time nothing.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
for p in (REPO, os.path.join(REPO, "tools")):
    if p not in sys.path:
        sys.path.insert(0, p)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_TIER = os.environ.get("QFILTER_BENCH_TIER", "bench")


def _sf_value(sf_dir: str) -> float:
    base = os.path.basename(os.path.normpath(sf_dir))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.0


def run_suite(spark, sf_dir: str, tier: str) -> tuple[dict, int, float, list]:
    from make_fixtures import ensure_fixtures

    from qfilter import corpus, similarity
    from qfilter.cascade import with_labels
    from qfilter.dedup import phash_winners
    from qfilter.features import with_all_features

    tdir = ensure_fixtures(tier)
    # explicit hash partitioning on the row key (north rule): the raw
    # fixture is one parquet file -> too few input splits for the UDF
    # stage; a real deployment reads an already-bucketed Iceberg table
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    images = (
        spark.read.parquet(os.path.join(tdir, "images.parquet"))
        .repartition(cpus * 3, "image_id")
        .persist()
    )
    n_images = images.count()

    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 3)

    sink = tempfile.mkdtemp(prefix="qfilter_bench_")
    try:
        def e2e(df, name):
            labeled = with_labels(with_all_features(df))
            labeled.select(
                "image_id", "category", "reason", "keep", "is_dark", "lang",
                "caption_scrubbed", "pii_hits", "tox_hits", "phash64",
            ).write.mode("overwrite").parquet(os.path.join(sink, name))

        # untimed warm-up slice: Python worker spawn + codegen/JIT are
        # per-session costs, discarded per the BASELINE.md protocol.
        # A hash filter, not limit(): limit() funnels everything through
        # a single-partition GlobalLimit exchange (shuffling the bytes
        # column) and warms only ONE Python worker; the filter touches
        # ~1/59 of rows across every partition and worker.
        from pyspark.sql import functions as F

        e2e(images.filter(F.crc32(F.col("image_id")) % 59 == 0), "warmup")
        # MEDIAN of 3 timed runs: single-shot e2e walls swing +/-40%
        # in this sandbox (r01 single-shots: 23-45 s for the identical
        # job), so one sample can't resolve round-over-round changes.
        # All walls are reported (e2e_walls) for transparency.
        e2e_walls = []
        for _ in range(3):
            t0 = time.time()
            e2e(images, "labels")
            e2e_walls.append(round(time.time() - t0, 3))
        timings["qfilter_e2e"] = sorted(e2e_walls)[1]

        # BASELINE.md §3: the bench run itself must hit keep/drop
        # F1 >= 0.99 vs the single-node oracle on the same rows
        got = spark.read.parquet(os.path.join(sink, "labels")).select("image_id", "keep")
        ref = (
            spark.read.parquet(os.path.join(tdir, "labels_ref.parquet"))
            .select("image_id", F.col("keep").alias("ref_keep"))
        )
        cm = (
            got.join(ref, "image_id")
            .agg(
                F.sum((F.col("keep") & F.col("ref_keep")).cast("long")).alias("tp"),
                F.sum((F.col("keep") & ~F.col("ref_keep")).cast("long")).alias("fp"),
                F.sum((~F.col("keep") & F.col("ref_keep")).cast("long")).alias("fn"),
            )
            .collect()[0]
        )
        keep_f1 = 2 * cm.tp / max(2 * cm.tp + cm.fp + cm.fn, 1)
        assert keep_f1 >= 0.99, f"bench keep/drop F1 {keep_f1} < 0.99 gate"
        timed("phash_dedup", lambda: phash_winners(images).count())
        timed("lineitem_rollup", lambda: corpus.lineitem_rollup(spark, sf_dir).count())
        timed("top_customers", lambda: corpus.top_customers(spark, sf_dir).count())
        timed("event_gaps", lambda: corpus.event_gaps(spark, sf_dir).count())
        timed("exact_dedup", lambda: corpus.exact_dedup(spark, sf_dir).count())
        timed(
            "trigram_jaccard",
            lambda: corpus.trigram_jaccard_pairs(spark, sf_dir).count(),
        )
        # r01 recorded simhash64 under the key "doc_nlp_batch" (label
        # bug); from r02 both run under their real names.
        timed("simhash64", lambda: corpus.simhash64(spark, sf_dir).count())
        from __spark_entry__ import queries as _entry_queries

        # agg over the UDF outputs, not count(): a bare count() lets
        # Catalyst prune the projection and skip the UDF entirely
        timed(
            "doc_nlp_batch",
            lambda: _entry_queries()["doc_nlp"](spark, sf_dir)
            .agg(F.sum("token_count"), F.count("lang_pred"))
            .collect(),
        )
        timed(
            "cosine_topk_bucketed",
            lambda: similarity.cosine_topk_bucketed(spark, sf_dir).count(),
        )
        # round-2 additions: sessionization (single-shuffle window chain)
        # and iterative near-dup clustering (CC to fixpoint)
        timed(
            "event_sessions",
            lambda: corpus.event_sessions(spark, sf_dir).count(),
        )
        timed(
            "neardup_components",
            lambda: corpus.neardup_components(spark, sf_dir).count(),
        )
    finally:
        shutil.rmtree(sink, ignore_errors=True)
    return timings, n_images, keep_f1, e2e_walls


def main() -> None:
    from qfilter.session import get_spark

    spark = get_spark(app="qfilter-bench", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    timings, n_images, keep_f1, e2e_walls = run_suite(spark, SF_DIR, BENCH_TIER)
    total = round(sum(timings.values()), 3)
    out = {
        "metric": "qfilter bench suite wall time (e2e filter + operator suite)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_value(SF_DIR),
        "images": n_images,
        "images_per_sec": round(n_images / timings["qfilter_e2e"], 1),
        "e2e_walls": e2e_walls,
        "keep_f1_vs_oracle": round(keep_f1, 6),
        "cpus": CPUS,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
