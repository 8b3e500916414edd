"""Thin Iceberg-style table layer over plain parquet.

The sandbox has no Iceberg runtime jar (SURVEY.md §7.0), so this module
implements the minimal contract the pipeline needs — append-only
snapshots, read-by-snapshot, partition listing — as a warehouse
directory of parquet data dirs plus JSON snapshot manifests:

    warehouse/<table>/data/s<N>/...parquet     (files of append N)
    warehouse/<table>/snapshots/<N>.json       {id, parent, dirs}

Swapping in real Iceberg is a config change at the call sites
(`spark.sql.catalog.* = org.apache.iceberg.spark.SparkCatalog` and
`df.writeTo(table).append()`); nothing else in the pipeline knows
about this layout.

Appends are atomic-by-manifest: data is written to the new snapshot
dir first, the manifest JSON (renamed into place) commits it; readers
only ever see dirs listed by a committed manifest, so a killed writer
leaves garbage data but no torn table — the resume path
(`qfilter.pipeline`) relies on this.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

__all__ = ["Catalog"]


class Catalog:
    def __init__(self, warehouse: str):
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)

    # ------------------------------------------------------------ paths
    def _tdir(self, table: str) -> str:
        return os.path.join(self.warehouse, table)

    def _snap_dir(self, table: str) -> str:
        return os.path.join(self._tdir(table), "snapshots")

    # -------------------------------------------------------- snapshots
    def snapshots(self, table: str) -> list[dict]:
        sdir = self._snap_dir(table)
        if not os.path.isdir(sdir):
            return []
        out = []
        for name in sorted(os.listdir(sdir)):
            if name.endswith(".json"):
                with open(os.path.join(sdir, name)) as f:
                    out.append(json.load(f))
        return sorted(out, key=lambda s: s["id"])

    def current_snapshot(self, table: str) -> dict | None:
        snaps = self.snapshots(table)
        return snaps[-1] if snaps else None

    # ----------------------------------------------------------- append
    def append(self, table: str, df: DataFrame, partition_by: list[str] | None = None) -> int:
        snaps = self.snapshots(table)
        sid = (snaps[-1]["id"] + 1) if snaps else 0
        data_dir = os.path.join(self._tdir(table), "data", f"s{sid}")
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(data_dir)
        parent_dirs = snaps[-1]["dirs"] if snaps else []
        manifest = {
            "id": sid,
            "parent": snaps[-1]["id"] if snaps else None,
            "dirs": parent_dirs + [data_dir],
            "partition_by": partition_by or [],
            # schema travels in the manifest so empty tables (zero
            # rows/files) still read back with the right columns
            "schema": df.schema.jsonValue(),
        }
        sdir = self._snap_dir(table)
        os.makedirs(sdir, exist_ok=True)
        tmp = os.path.join(sdir, f".{sid}.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(sdir, f"{sid}.json"))  # commit point
        return sid

    # ------------------------------------------------------------- read
    def read(self, spark: SparkSession, table: str, snapshot: int | None = None) -> DataFrame:
        snaps = self.snapshots(table)
        if not snaps:
            raise FileNotFoundError(f"table {table!r} has no snapshots")
        snap = snaps[-1] if snapshot is None else next(s for s in snaps if s["id"] == snapshot)
        # per-dir reads + unionByName: keeps partition-column discovery
        # working per snapshot dir regardless of layout
        from pyspark.sql.types import StructType

        schema = StructType.fromJson(snap["schema"]) if snap.get("schema") else None
        df = None
        for d in snap["dirs"]:
            try:
                part = spark.read.parquet(d)
            except Exception:
                if schema is None:
                    raise
                part = spark.createDataFrame([], schema)
            df = part if df is None else df.unionByName(part)
        return df

    def exists(self, table: str) -> bool:
        return bool(self.snapshots(table))


# ------------------------------------------------------- bucketed layout

def write_bucketed(
    df, table: str, bucket_cols: list[str], n_buckets: int = 64,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist a DataFrame as a BUCKETED managed table (Spark/Hive
    bucketing): rows are hash-partitioned into ``n_buckets`` files per
    partition by ``bucket_cols`` at WRITE time, so joins and
    aggregations keyed on those columns read co-located data and skip
    the shuffle entirely — the 100 TB technique for repeated joins on
    the same key (e.g. image_id label joins, doc_id dedup joins).

    `tests/test_plans.py::test_bucketed_join_no_shuffle` proves the
    plan: two tables bucketed on the same key join with ZERO Exchange
    nodes.  On a real deployment the same layout comes from Iceberg's
    bucket partition transform."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def read_table(spark, table: str):
    return spark.table(table)
