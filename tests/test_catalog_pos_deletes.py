"""Merge-on-read POSITION deletes (Iceberg v2's second delete flavor)
and the MOR MERGE built on them.

Equality deletes mask by key; position deletes mask exact (file,
row-ordinal) pairs via the parquet ``_metadata`` columns.  That makes
them (a) scoped by construction — a file added later has a different
path, so re-inserts can never be masked, (b) able to target rows with
no usable key, and (c) the natural delete artifact of a MERGE that
touched a known file subset.  At 100 TB a MOR MERGE costs
O(source + matches) writes instead of a table rewrite; readers pay
one broadcast anti-join until the next compaction materializes it.
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


def _mk(spark, lo, hi, tag="a"):
    return spark.range(lo, hi).select(
        F.col("id"),
        (F.col("id") % 3).alias("bucket"),
        F.concat(F.lit(f"{tag}-"), F.col("id")).alias("caption"),
    )


def test_pos_delete_masks_without_rewriting_data(spark, cat):
    cat.append("t", _mk(spark, 0, 100))
    files_before = sorted(cat.table_data_files("t"))
    cat.delete_where(spark, "t", "id < 30", mode="merge-on-read-position")
    assert sorted(cat.table_data_files("t")) == files_before
    df = cat.read(spark, "t")
    assert df.count() == 70
    assert df.agg(F.min("id")).collect()[0][0] == 30
    # helper address columns never leak into the user schema
    assert set(df.columns) == {"id", "bucket", "caption"}
    hist = cat.history(spark, "t").orderBy("snapshot_id").collect()
    assert [r["operation"] for r in hist] == ["append", "delete"]
    # time travel to before the delete still sees all rows
    assert cat.read(spark, "t", snapshot=0).count() == 100


def test_pos_delete_can_remove_duplicate_identical_rows(spark, cat):
    """The capability equality deletes lack: two byte-identical rows
    live at different (file, pos) addresses, so both are individually
    addressable and the delete file records each."""
    cat.append("t", _mk(spark, 0, 10))
    cat.append("t", _mk(spark, 0, 10))  # exact duplicates, second dir
    assert cat.read(spark, "t").count() == 20
    cat.delete_where(spark, "t", "id < 4", mode="merge-on-read-position")
    df = cat.read(spark, "t")
    assert df.count() == 12  # both copies of ids 0..3 gone
    assert df.agg(F.min("id")).collect()[0][0] == 4


def test_reinsert_after_pos_delete_survives_by_construction(spark, cat):
    """No sequence-number bookkeeping needed: the re-ingested batch
    lands in a NEW file the delete file cannot reference."""
    cat.append("t", _mk(spark, 0, 100))
    cat.delete_where(spark, "t", "id < 50", mode="merge-on-read-position")
    cat.append("t", _mk(spark, 0, 10, tag="fixed"))
    df = cat.read(spark, "t")
    assert df.count() == 60  # 50 survivors + 10 re-inserts
    ids = sorted(r["id"] for r in df.select("id").collect())
    assert ids[:10] == list(range(10)) and ids[10] == 50
    assert (
        df.filter(F.col("id") < 10).filter(~F.col("caption").startswith("fixed")).count()
        == 0
    )


def test_pos_and_equality_deletes_stack(spark, cat):
    cat.append("t", _mk(spark, 0, 120))
    cat.delete_where(
        spark, "t", "id < 30", mode="merge-on-read", equality_cols=["id"]
    )
    cat.delete_where(spark, "t", "id >= 110", mode="merge-on-read-position")
    df = cat.read(spark, "t")
    want = (
        cat.read(spark, "t", snapshot=0)
        .filter(F.col("id") >= 30)
        .filter(F.col("id") < 110)
    )
    assert _hash(df) == _hash(want)


def test_scan_applies_pos_deletes(spark, cat):
    cat.append("t", _mk(spark, 0, 200))
    cat.delete_where(spark, "t", "id % 2 = 0", mode="merge-on-read-position")
    got = cat.scan(spark, "t", [("id", ">=", 100)])
    assert got.count() == 50  # odd ids 101..199
    assert got.agg(F.min("id")).collect()[0][0] == 101


def test_compact_materializes_pos_deletes_and_gc_reclaims(spark, cat):
    cat.append("t", _mk(spark, 0, 100))
    cat.delete_where(spark, "t", "id < 40", mode="merge-on-read-position")
    before = _hash(cat.read(spark, "t"))
    cat.compact(spark, "t", target_file_bytes=1 << 30)
    cur = cat.current_snapshot("t")
    assert cur.get("delete_specs") == []
    assert _hash(cat.read(spark, "t")) == before
    data_root = os.path.join(cat.warehouse, "t", "data")
    assert any(n.startswith("posdel-") for n in os.listdir(data_root))
    cat.expire_snapshots("t", keep_last=1)
    assert not any(n.startswith("posdel-") for n in os.listdir(data_root))
    assert _hash(cat.read(spark, "t")) == before


def test_merge_mor_upsert_semantics(spark, cat):
    cat.append("t", _mk(spark, 0, 100))
    files_before = sorted(cat.table_data_files("t"))
    src = _mk(spark, 90, 120, tag="new")  # 10 updates + 20 inserts
    sid = cat.merge_mor(spark, "t", src, on=["id"])
    df = cat.read(spark, "t")
    assert df.count() == 120
    # matched rows replaced by source versions, unmatched kept
    assert df.filter(F.col("id") >= 90).filter(
        ~F.col("caption").startswith("new")
    ).count() == 0
    assert df.filter(F.col("id") < 90).filter(
        ~F.col("caption").startswith("a")
    ).count() == 0
    # one atomic snapshot; original files untouched (plus one new dir)
    assert cat.current_snapshot("t")["id"] == sid
    assert cat.current_snapshot("t")["operation"] == "merge"
    files_after = sorted(cat.table_data_files("t"))
    assert set(files_before) <= set(files_after)
    # time travel: pre-merge snapshot unchanged
    assert cat.read(spark, "t", snapshot=0).count() == 100
    # incremental scan across a MOR merge must refuse (it retracts rows)
    with pytest.raises(ValueError, match="merge"):
        cat.read_incremental(spark, "t", since_snapshot=0)


def test_merge_mor_validation_matches_cow_merge(spark, cat):
    cat.append("t", _mk(spark, 0, 10))
    dup = _mk(spark, 0, 3).unionByName(_mk(spark, 2, 3, tag="twin"))
    with pytest.raises(ValueError, match="duplicate"):
        cat.merge_mor(spark, "t", dup, on=["id"])
    with pytest.raises(ValueError, match="absent from target"):
        cat.merge_mor(spark, "t", _mk(spark, 0, 3).withColumn("x", F.lit(1)), on=["id"])


def test_merge_mor_then_compact_then_expire(spark, cat):
    cat.append("t", _mk(spark, 0, 100))
    cat.merge_mor(spark, "t", _mk(spark, 50, 150, tag="v2"), on=["id"])
    want = _hash(cat.read(spark, "t"))
    cat.compact(spark, "t", target_file_bytes=1 << 30)
    cat.expire_snapshots("t", keep_last=1)
    assert _hash(cat.read(spark, "t")) == want
    assert len(cat.snapshots("t")) == 1
    data_root = os.path.join(cat.warehouse, "t", "data")
    assert not any(n.startswith("posdel-") for n in os.listdir(data_root))


def test_merge_mor_conflicts_like_compact(spark, cat):
    cat.append("t", _mk(spark, 0, 50))
    orig_snapshots = cat.snapshots

    def stale_then_stolen(table):
        out = orig_snapshots(table)
        if not getattr(stale_then_stolen, "fired", False):
            stale_then_stolen.fired = True
            Catalog(cat.warehouse).append(table, _mk(spark, 50, 60))
        return out

    cat.snapshots = stale_then_stolen
    try:
        with pytest.raises(CommitConflict):
            cat.merge_mor(spark, "t", _mk(spark, 0, 5, tag="v2"), on=["id"])
    finally:
        cat.snapshots = orig_snapshots
    # the concurrent writer's rows are intact
    assert cat.read(spark, "t").count() == 60
