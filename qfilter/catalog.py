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
import shutil

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
        return self._commit_manifest(table, manifest)

    def _commit_manifest(self, table: str, manifest: dict) -> int:
        sid = manifest["id"]
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
            # allowMissingColumns = add-column schema evolution: dirs
            # written before a column existed read back as null for it
            # (Iceberg's default add-column semantics)
            df = part if df is None else df.unionByName(part, allowMissingColumns=True)
        if schema is not None:
            from pyspark.sql import functions as F

            cols = [
                F.col(f.name) if f.name in df.columns
                else F.lit(None).cast(f.dataType).alias(f.name)
                for f in schema.fields
            ]
            df = df.select(*cols)
        return df

    def exists(self, table: str) -> bool:
        return bool(self.snapshots(table))

    # ----------------------------------------------------- maintenance
    #
    # The three Iceberg table-maintenance operations a 100 TB deployment
    # cannot live without, expressed over the same manifest layout:
    #
    #   compact()           = Iceberg rewrite_data_files (bin-pack).
    #                         Wave-writes and streaming sinks append one
    #                         dir per micro-commit; after thousands of
    #                         commits the table is millions of small
    #                         files and scan throughput dies on open()
    #                         overhead.  Compaction rewrites the CURRENT
    #                         snapshot into ceil(bytes/target) files and
    #                         commits it as a "replace" snapshot; the
    #                         old snapshots stay readable (time travel)
    #                         until expired.
    #   expire_snapshots()  = Iceberg expireSnapshots + orphan-file GC.
    #   read_incremental()  = Iceberg incremental append scan: only the
    #                         rows added after a known snapshot, so a
    #                         downstream consumer never rescans the
    #                         table.  "replace" snapshots are skipped —
    #                         they rewrite existing rows, adding none —
    #                         exactly Iceberg's semantics.
    #
    # All three keep the manifest-commit-last invariant: a killed
    # compactor leaves garbage data files but no torn table.

    def table_data_files(self, table: str, snapshot: int | None = None) -> list[str]:
        """All parquet data files of a snapshot (default: current)."""
        snaps = self.snapshots(table)
        snap = snaps[-1] if snapshot is None else next(s for s in snaps if s["id"] == snapshot)
        files: list[str] = []
        for d in snap["dirs"]:
            for root, _dirs, names in os.walk(d):
                files.extend(
                    os.path.join(root, n) for n in names if n.endswith(".parquet")
                )
        return files

    def compact(
        self,
        spark: SparkSession,
        table: str,
        target_file_bytes: int = 128 << 20,
    ) -> int:
        """Bin-pack the current snapshot into ~target-sized files.

        Returns the new snapshot id.  Old snapshots remain readable via
        ``read(snapshot=...)`` until ``expire_snapshots`` drops them.
        """
        snaps = self.snapshots(table)
        if not snaps:
            raise FileNotFoundError(f"table {table!r} has no snapshots")
        cur = snaps[-1]
        total = sum(os.path.getsize(f) for f in self.table_data_files(table))
        n_files = max(1, -(-total // target_file_bytes))
        df = self.read(spark, table)
        sid = cur["id"] + 1
        data_dir = os.path.join(self._tdir(table), "data", f"s{sid}")
        part_by = cur.get("partition_by") or []
        # repartition bounds files-per-task at 1; with partition columns
        # in the hash the rows of one partition land in few tasks, so a
        # partitioned table compacts to <= n_files files per partition
        # value rather than n_files * n_partitions.
        out = df.repartition(int(n_files), *part_by) if part_by else df.repartition(int(n_files))
        writer = out.write.mode("overwrite")
        if part_by:
            writer = writer.partitionBy(*part_by)
        writer.parquet(data_dir)
        manifest = {
            "id": sid,
            "parent": cur["id"],
            "dirs": [data_dir],
            "partition_by": part_by,
            "schema": cur.get("schema") or df.schema.jsonValue(),
            "operation": "replace",
            "replaced_dirs": cur["dirs"],
        }
        return self._commit_manifest(table, manifest)

    def expire_snapshots(self, table: str, keep_last: int = 1) -> list[str]:
        """Drop all but the last ``keep_last`` snapshots and delete every
        data dir they exclusively referenced — including orphan dirs a
        killed writer left behind (written but never committed).

        Returns the deleted dirs.  Never touches a dir any retained
        snapshot references.
        """
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        snaps = self.snapshots(table)
        retained, expired = snaps[-keep_last:], snaps[:-keep_last]
        keep_dirs = {os.path.normpath(d) for s in retained for d in s["dirs"]}
        deleted: list[str] = []
        data_root = os.path.join(self._tdir(table), "data")
        if os.path.isdir(data_root):
            for name in sorted(os.listdir(data_root)):
                path = os.path.normpath(os.path.join(data_root, name))
                if path not in keep_dirs:
                    shutil.rmtree(path, ignore_errors=True)
                    deleted.append(path)
        for s in expired:
            try:
                os.remove(os.path.join(self._snap_dir(table), f"{s['id']}.json"))
            except FileNotFoundError:
                pass
        return deleted

    def read_incremental(
        self,
        spark: SparkSession,
        table: str,
        since_snapshot: int,
        to_snapshot: int | None = None,
    ) -> DataFrame:
        """Rows appended AFTER ``since_snapshot`` up to ``to_snapshot``
        (default: current).  Skips "replace" (compaction) snapshots —
        they add no rows.  Raises if the chain has been expired, because
        then the appended set can no longer be reconstructed.
        """
        from pyspark.sql.types import StructType

        snaps = {s["id"]: s for s in self.snapshots(table)}
        if not snaps:
            raise FileNotFoundError(f"table {table!r} has no snapshots")
        to = max(snaps) if to_snapshot is None else to_snapshot
        added: list[str] = []
        schema_json = None
        if since_snapshot < 0:  # "everything since before the first append"
            prev_dirs: set[str] | None = set()
        elif since_snapshot in snaps:
            prev_dirs = set(snaps[since_snapshot]["dirs"])
        else:
            prev_dirs = None
        for sid in range(since_snapshot + 1, to + 1):
            snap = snaps.get(sid)
            if snap is None:
                raise ValueError(
                    f"snapshot {sid} of {table!r} has been expired; "
                    "incremental read impossible — run a full read"
                )
            if prev_dirs is None:
                raise ValueError(
                    f"since_snapshot {since_snapshot} of {table!r} has been "
                    "expired; incremental read impossible — run a full read"
                )
            schema_json = snap.get("schema") or schema_json
            if snap.get("operation", "append") == "append":
                added.extend(d for d in snap["dirs"] if d not in prev_dirs)
            prev_dirs = set(snap["dirs"])
        schema = StructType.fromJson(schema_json) if schema_json else None
        if not added:
            cur_schema = schema or StructType.fromJson(
                self.current_snapshot(table)["schema"]
            )
            return spark.createDataFrame([], cur_schema)
        df = None
        for d in added:
            part = spark.read.parquet(d)
            df = part if df is None else df.unionByName(part)
        return df


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
