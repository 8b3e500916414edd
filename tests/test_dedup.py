"""Salted pHash dedup: equivalence with unsalted, idempotence, LSH."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def images(spark, smoke_dir):
    return spark.read.parquet(os.path.join(smoke_dir, "images.parquet")).cache()


def test_salted_equals_unsalted(images):
    from qfilter.dedup import phash_winners

    salted = phash_winners(images, salt_buckets=32)
    direct = images.groupBy("phash").agg(
        F.min("image_id").alias("canonical_id"),
        F.count(F.lit(1)).alias("dup_count"),
    )
    assert salted.exceptAll(direct).count() == 0
    assert direct.exceptAll(salted).count() == 0


def test_dedup_idempotent(images):
    from qfilter.dedup import dedup_by_phash

    once = dedup_by_phash(images).cache()
    n_distinct = images.select("phash").distinct().count()
    assert once.count() == n_distinct
    twice = dedup_by_phash(once.drop("dup_count"))
    assert twice.count() == n_distinct


def test_hot_bucket_collapses(images):
    from qfilter.dedup import dedup_by_phash

    hot = (
        images.groupBy("phash").count().orderBy(F.desc("count")).first()
    )
    assert hot["count"] >= 100  # the planted hot bucket
    deduped = dedup_by_phash(images)
    assert deduped.filter(F.col("phash") == hot.phash).count() == 1


def test_neardup_pairs_symmetric_and_bounded(images):
    from qfilter.dedup import neardup_phash_pairs

    distinct = images.select("phash").distinct()
    pairs = neardup_phash_pairs(distinct, max_hamming=3).cache()
    rows = pairs.collect()
    for r in rows:
        assert r.h1 < r.h2
        assert bin((r.h1 ^ r.h2) & (2**64 - 1)).count("1") == r.hamming <= 3
