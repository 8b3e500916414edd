"""Stage graph with per-partition lineage + metrics and resume.

The reference checkpoints by materializing every stage to a folder
(`config.py:30-63`: all_splitted -> rotated -> deskewed -> ...) with
per-stage failed folders — staged, restartable, file-at-a-time.  The
north rule asks for the scale version: per-PARTITION lineage + metrics
tables so a killed run resumes from the last committed partition.

Design (100 TB shape):

* ``part_id = pmod(xxhash64(image_id), n_parts)`` — explicit hash
  partitioning on the row key, stable across runs and cluster sizes.
* Stage 0 *ingest*: write the input partitioned by ``part_id``
  (`partitionBy`), so later waves read ONLY their partitions'
  directories — partition pruning instead of full rescans.  On a real
  Iceberg deployment the table is already bucketed; this stage is a
  no-op there.
* Stage 1 *label*: waves of partitions; each wave runs
  decode -> features -> cascade -> scrub on just its partition dirs and
  appends to the ``labels`` table (Catalog append = atomic manifest),
  then commits one lineage row PER PARTITION plus a per-wave metrics
  row.  Crash between waves => committed waves are never recomputed
  (resume anti-joins lineage), the in-flight wave restarts cleanly
  (its data dir is garbage without a manifest; its lineage rows were
  never written — lineage is appended only AFTER the data commit).
* Exactly-once per partition: lineage append is the commit point and
  happens after the data append; replays overwrite nothing (each wave
  appends a new snapshot dir) and re-emit only uncommitted partitions.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .cascade import with_labels
from .catalog import Catalog
from .features import with_all_features

__all__ = ["QualityFilterPipeline", "PipelineKilled"]

LABEL_COLS = [
    "image_id", "part_id", "category", "reason", "keep", "is_dark",
    "dark_reason", "lang", "lang_conf", "perplexity", "caption_scrubbed",
    "pii_hits", "tox_hits", "error", "phash", "phash64",
    # features kept for analysis / training parity
    "roi_frac", "avg_blur", "text_density", "is_table_like", "avg_skew_deg",
    "core_frac", "mean_brightness", "median_brightness", "contrast",
    "dark_pixels_percent", "very_dark_pixels_percent",
    "median_ocr_conf", "mean_ocr_conf", "pct80", "words_count", "conf_iqr",
    "bbox_area_text_frac", "line_height_var", "text_blocks_count",
]


class PipelineKilled(RuntimeError):
    """Raised by the test-only fail_after_wave kill switch."""


class QualityFilterPipeline:
    def __init__(
        self,
        spark: SparkSession,
        out_dir: str,
        n_parts: int = 64,
        wave_size: int = 16,
    ):
        self.spark = spark
        self.out_dir = out_dir
        self.n_parts = n_parts
        self.wave_size = wave_size
        self.catalog = Catalog(os.path.join(out_dir, "warehouse"))

    # ----------------------------------------------------------- stages
    def ingest(self, images: DataFrame) -> None:
        """Partition the input by part_id (idempotent; skipped if done)."""
        if self.catalog.exists("images_parted"):
            return
        parted = images.withColumn(
            "part_id", F.pmod(F.xxhash64("image_id"), F.lit(self.n_parts)).cast("int")
        )
        self.catalog.append("images_parted", parted, partition_by=["part_id"])

    def _committed_parts(self) -> set[int]:
        if not self.catalog.exists("lineage"):
            return set()
        rows = (
            self.catalog.read(self.spark, "lineage")
            .filter(F.col("stage") == "label")
            .filter(F.col("status") == "done")
            .select("part_id")
            .distinct()
            .collect()
        )
        return {r.part_id for r in rows}

    def run(
        self,
        images: DataFrame | None = None,
        run_id: str = "run0",
        fail_after_wave: int | None = None,
    ) -> DataFrame:
        """Execute (or resume) the full filter; returns the labels table."""
        if images is not None:
            self.ingest(images)
        parted = self.catalog.read(self.spark, "images_parted")
        done = self._committed_parts()
        pending = [p for p in range(self.n_parts) if p not in done]
        waves = [
            pending[i : i + self.wave_size]
            for i in range(0, len(pending), self.wave_size)
        ]
        for wi, wave_parts in enumerate(waves):
            t0 = time.time()
            # partition pruning: filter on the partition column reads
            # only those part dirs
            subset = parted.filter(F.col("part_id").isin(wave_parts))
            labeled = with_labels(with_all_features(subset)).select(*LABEL_COLS)
            self.catalog.append("labels", labeled, partition_by=["part_id"])
            wall_ms = int((time.time() - t0) * 1000)
            self._commit_lineage(run_id, wave_parts, wall_ms)
            self._commit_metrics(run_id, wave_parts, wall_ms)
            if fail_after_wave is not None and wi >= fail_after_wave:
                raise PipelineKilled(f"killed after wave {wi}")
        return self.catalog.read(self.spark, "labels")

    # ---------------------------------------------------- lineage/metrics
    def _commit_lineage(self, run_id: str, parts: list[int], wall_ms: int) -> None:
        per_part = (
            self.catalog.read(self.spark, "labels")
            .filter(F.col("part_id").isin(parts))
            .groupBy("part_id")
            .agg(F.count(F.lit(1)).alias("rows_out"))
            .withColumn("run_id", F.lit(run_id))
            .withColumn("stage", F.lit("label"))
            .withColumn("status", F.lit("done"))
            .withColumn("wall_ms", F.lit(wall_ms))
        )
        self.catalog.append("lineage", per_part)

    def _commit_metrics(self, run_id: str, parts: list[int], wall_ms: int) -> None:
        m = (
            self.catalog.read(self.spark, "labels")
            .filter(F.col("part_id").isin(parts))
            .groupBy("category")
            .agg(
                F.count(F.lit(1)).alias("rows"),
                F.sum(F.col("keep").cast("int")).alias("kept"),
                F.sum(F.col("pii_hits")).alias("pii_hits"),
                F.sum(F.col("tox_hits")).alias("tox_hits"),
            )
            .withColumn("run_id", F.lit(run_id))
            .withColumn("wave_wall_ms", F.lit(wall_ms))
        )
        self.catalog.append("metrics", m)

    # ------------------------------------------------------- maintenance
    def maintain(
        self, target_file_bytes: int = 128 << 20, keep_last: int = 1
    ) -> dict:
        """Post-run table maintenance: bin-pack the labels table (every
        wave appended a snapshot of small files) and expire superseded
        snapshots.  Resume state lives in the lineage table, not in the
        labels file layout, so a maintained table resumes identically —
        ``tests/test_catalog_maintenance.py`` proves it."""
        before = len(self.catalog.table_data_files("labels"))
        sid = self.catalog.compact(self.spark, "labels", target_file_bytes)
        deleted = self.catalog.expire_snapshots("labels", keep_last=keep_last)
        after = len(self.catalog.table_data_files("labels"))
        return {
            "snapshot": sid,
            "files_before": before,
            "files_after": after,
            "dirs_deleted": len(deleted),
        }

    # ------------------------------------------------------------ status
    def status(self) -> dict:
        done = self._committed_parts()
        return {
            "n_parts": self.n_parts,
            "committed": len(done),
            "pending": self.n_parts - len(done),
        }

    def write_summary(self) -> str:
        path = os.path.join(self.out_dir, "SUMMARY.json")
        with open(path, "w") as f:
            json.dump(self.status(), f)
        return path
