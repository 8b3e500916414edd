"""Kill-and-resume: pipeline output after a crash+rerun == single-shot run."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def images(spark, smoke_dir):
    return (
        spark.read.parquet(os.path.join(smoke_dir, "images.parquet"))
        .limit(200)
        .cache()
    )


def _run_full(spark, images, out_dir):
    from qfilter.pipeline import QualityFilterPipeline

    pipe = QualityFilterPipeline(spark, out_dir, n_parts=8, wave_size=3)
    return pipe, pipe.run(images, run_id="full")


def test_kill_and_resume_equivalence(spark, images, tmp_path_factory):
    from qfilter.pipeline import PipelineKilled, QualityFilterPipeline

    d_full = str(tmp_path_factory.mktemp("full"))
    d_kill = str(tmp_path_factory.mktemp("killed"))

    _, full = _run_full(spark, images, d_full)

    pipe = QualityFilterPipeline(spark, d_kill, n_parts=8, wave_size=3)
    with pytest.raises(PipelineKilled):
        pipe.run(images, run_id="r1", fail_after_wave=0)
    st = pipe.status()
    assert 0 < st["committed"] < 8  # partial progress committed

    resumed = pipe.run(run_id="r2")  # no input needed — resumes from tables
    a = full.select("image_id", "category", "reason", "keep").orderBy("image_id")
    b = resumed.select("image_id", "category", "reason", "keep").orderBy("image_id")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    assert resumed.count() == images.count()

    # exactly-once: each partition committed exactly once in lineage
    lin = pipe.catalog.read(spark, "lineage")
    dupes = lin.groupBy("part_id").count().filter(F.col("count") > 1).count()
    assert dupes == 0


def test_metrics_written(spark, images, tmp_path_factory):
    from qfilter.pipeline import QualityFilterPipeline

    d = str(tmp_path_factory.mktemp("metrics"))
    pipe = QualityFilterPipeline(spark, d, n_parts=4, wave_size=4)
    labels = pipe.run(images, run_id="m")
    metrics = pipe.catalog.read(spark, "metrics")
    total = metrics.agg(F.sum("rows")).collect()[0][0]
    assert total == labels.count() == images.count()
    cats = {r.category for r in metrics.select("category").distinct().collect()}
    assert cats <= {"good", "medium", "failed", "trash"}
