"""Merge-on-read equality deletes (Iceberg v2 delete files).

Why this matters at 100 TB: copy-on-write makes a 0.001% delete
(GDPR erasure, bad-batch retraction) cost a full table rewrite.  The
merge-on-read path writes only the distinct equality keys of the
deleted rows — KB, not TB — and readers mask them with one
broadcastable anti-join until the next compaction materializes the
delete.  Sequence scoping (a delete masks only data committed before
it) is what makes re-ingesting a corrected batch safe.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from qfilter.catalog import Catalog, CommitConflict


def _hash(df):
    cols = [F.col(c).cast("string") for c in sorted(df.columns)]
    row = F.xxhash64(*cols).cast("decimal(38,0)")
    return df.agg(F.sum(row).alias("h"), F.count("*").alias("n")).collect()[0]


@pytest.fixture()
def cat(tmp_path):
    return Catalog(str(tmp_path / "wh"))


def _mk(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"),
        (F.col("id") % 3).alias("bucket"),
        F.concat(F.lit("cap-"), F.col("id")).alias("caption"),
    )


def test_mor_delete_masks_without_rewriting_data(spark, cat):
    cat.append("t", _mk(spark, 0, 100))
    files_before = sorted(cat.table_data_files("t"))
    cat.delete_where(spark, "t", "id < 30", mode="merge-on-read", equality_cols=["id"])
    # the data files are untouched — only a small delete file was added
    assert sorted(cat.table_data_files("t")) == files_before
    df = cat.read(spark, "t")
    assert df.count() == 70
    assert df.agg(F.min("id")).collect()[0][0] == 30
    hist = cat.history(spark, "t").orderBy("snapshot_id").collect()
    assert [r["operation"] for r in hist] == ["append", "delete"]
    # time travel to before the delete still sees all rows
    assert cat.read(spark, "t", snapshot=0).count() == 100


def test_mor_requires_equality_cols(spark, cat):
    cat.append("t", _mk(spark, 0, 10))
    with pytest.raises(ValueError, match="equality_cols"):
        cat.delete_where(spark, "t", "id < 5", mode="merge-on-read")


def test_reinsert_after_delete_survives(spark, cat):
    cat.append("t", _mk(spark, 0, 100))
    cat.delete_where(spark, "t", "id < 50", mode="merge-on-read", equality_cols=["id"])
    # corrected batch re-ingests ten of the deleted keys
    cat.append("t", _mk(spark, 0, 10))
    df = cat.read(spark, "t")
    assert df.count() == 60  # 50 survivors + 10 re-inserts
    ids = sorted(r["id"] for r in df.select("id").collect())
    assert ids[:10] == list(range(10)) and ids[10] == 50


def test_stacked_deletes_and_multicolumn_keys(spark, cat):
    cat.append("t", _mk(spark, 0, 120))
    cat.delete_where(
        spark, "t", "bucket = 0 and id < 60",
        mode="merge-on-read", equality_cols=["id", "bucket"],
    )
    cat.delete_where(spark, "t", "id >= 110", mode="merge-on-read", equality_cols=["id"])
    df = cat.read(spark, "t")
    want = (
        cat.read(spark, "t", snapshot=0)
        .filter(~((F.col("bucket") == 0) & (F.col("id") < 60)))
        .filter(F.col("id") < 110)
    )
    assert _hash(df) == _hash(want)


def test_scan_applies_mor_deletes(spark, cat):
    cat.append("t", _mk(spark, 0, 200))
    cat.delete_where(spark, "t", "id % 2 = 0", mode="merge-on-read", equality_cols=["id"])
    got = cat.scan(spark, "t", [("id", ">=", 100)])
    assert got.count() == 50  # odd ids 101..199
    assert got.agg(F.min("id")).collect()[0][0] == 101


def test_compact_materializes_deletes_and_gc_reclaims(spark, cat):
    cat.append("t", _mk(spark, 0, 100))
    cat.delete_where(spark, "t", "id < 40", mode="merge-on-read", equality_cols=["id"])
    before = _hash(cat.read(spark, "t"))
    cat.compact(spark, "t", target_file_bytes=1 << 30)
    cur = cat.current_snapshot("t")
    assert cur.get("delete_specs") == []
    assert _hash(cat.read(spark, "t")) == before
    # while the delete snapshot is retained, its delete file is kept...
    data_root = os.path.join(cat.warehouse, "t", "data")
    assert any(n.startswith("del-") for n in os.listdir(data_root))
    # ...and once expired, GC reclaims it
    cat.expire_snapshots("t", keep_last=1)
    assert not any(n.startswith("del-") for n in os.listdir(data_root))
    assert _hash(cat.read(spark, "t")) == before


def test_incremental_scan_skips_delete_snapshots(spark, cat):
    cat.append("t", _mk(spark, 0, 50))       # snapshot 0
    cat.delete_where(spark, "t", "id < 10", mode="merge-on-read", equality_cols=["id"])  # 1
    cat.append("t", _mk(spark, 50, 80))      # snapshot 2
    inc = cat.read_incremental(spark, "t", since_snapshot=0)
    assert sorted(r["id"] for r in inc.select("id").collect()) == list(range(50, 80))


def test_rollback_restores_state_without_data_movement(spark, cat):
    cat.append("t", _mk(spark, 0, 50))
    good = _hash(cat.read(spark, "t"))
    cat.append("t", _mk(spark, 50, 999))          # bad batch
    cat.delete_where(spark, "t", "id >= 900", mode="merge-on-read", equality_cols=["id"])
    sid = cat.rollback("t", 0)
    assert _hash(cat.read(spark, "t")) == good
    assert cat.current_snapshot("t")["id"] == sid
    hist = cat.history(spark, "t").orderBy("snapshot_id").collect()
    assert hist[-1]["operation"] == "rollback"
    # bad snapshots stay readable for forensics
    assert cat.read(spark, "t", snapshot=1).count() == 999
    # table keeps working after rollback
    cat.append("t", _mk(spark, 50, 60))
    assert cat.read(spark, "t").count() == 60
    # ...but an incremental scan across the rollback must refuse
    with pytest.raises(ValueError, match="rollback"):
        cat.read_incremental(spark, "t", since_snapshot=1)
    with pytest.raises(ValueError, match="does not exist"):
        cat.rollback("t", 99)


def test_tags_pin_dataset_versions_through_expiry(spark, cat):
    cat.append("t", _mk(spark, 0, 50))
    v1 = _hash(cat.read(spark, "t"))
    cat.tag("t", "train-v1")
    cat.append("t", _mk(spark, 50, 100))
    cat.compact(spark, "t", target_file_bytes=1 << 30)
    cat.expire_snapshots("t", keep_last=1)
    # the tagged snapshot survived expiry: exact v1 bytes still read
    assert _hash(cat.read_tag(spark, "t", "train-v1")) == v1
    assert cat.read(spark, "t").count() == 100
    assert cat.tags("t") == {"train-v1": 0}
    with pytest.raises(ValueError, match="already exists"):
        cat.tag("t", "train-v1")
    # dropping the tag releases the pin; the next expiry reclaims it
    cat.drop_tag("t", "train-v1")
    cat.expire_snapshots("t", keep_last=1)
    with pytest.raises(ValueError, match="does not exist"):
        cat.read(spark, "t", snapshot=0)
    with pytest.raises(ValueError, match="no tag"):
        cat.read_tag(spark, "t", "train-v1")


def test_mor_delete_conflicts_like_compact(spark, cat):
    cat.append("t", _mk(spark, 0, 50))
    cur = cat.current_snapshot("t")
    # another writer steals the next snapshot id mid-flight
    cat.append("t", _mk(spark, 50, 60))
    keys = cat.read(spark, "t", snapshot=cur["id"]).filter("id < 5").select("id").distinct()
    ddir = cat._new_data_dir("t", "del")
    keys.write.mode("overwrite").parquet(ddir)
    with pytest.raises(CommitConflict):
        cat._commit_manifest(
            "t",
            {
                "id": cur["id"] + 1,
                "parent": cur["id"],
                "dirs": cur["dirs"],
                "partition_by": [],
                "schema": cur.get("schema"),
                "operation": "delete",
                "delete_specs": [{"dir": ddir, "cols": ["id"], "id": cur["id"] + 1}],
                "dir_added": cur.get("dir_added") or {},
            },
        )
