"""Bounded-retry external-call operator (reference contract:
`surya_ocr_client.py:17-19,52-67` — 3 retries, linear backoff, then a
per-file error record).  Failure modes under test: per-row retry
exhaustion must land in the error column with ZERO Spark task
failures, transient rows must succeed with the right attempt count,
and a connection-level (whole-batch) exception must be retried, not
escape the task."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from qfilter.external import with_external_call


def _die_at(key: str) -> int:
    """Deterministic per-key flakiness: attempts 1..k fail, k+1 ok.

    h%7==0 -> permanently broken (fails every attempt);
    otherwise needs 1 + h%3 attempts to succeed."""
    h = int.from_bytes(hashlib.sha1(key.encode()).digest()[:4], "big")
    if h % 7 == 0:
        return 10**9
    return h % 3  # 0, 1 or 2 leading failures


def make_fake_transport():
    """Nested so cloudpickle ships it by value — the tests module is
    not importable on Spark's Python workers."""

    def fake_transport(batch: pd.DataFrame, attempt: int):
        import hashlib as _h

        res, errs = [], []
        for key in batch["image_id"]:
            h = int.from_bytes(_h.sha1(key.encode()).digest()[:4], "big")
            die_at = 10**9 if h % 7 == 0 else h % 3
            if attempt > die_at:
                res.append(f"ocr:{key}")
                errs.append(None)
            else:
                res.append(None)
                errs.append("HTTPError: 503 Service Unavailable")
        return res, errs

    return fake_transport


@pytest.fixture()
def df(spark):
    return spark.range(200).select(
        F.concat(F.lit("img-"), F.col("id")).alias("image_id"),
        F.encode(F.concat(F.lit("payload-"), F.col("id")), "utf-8").alias("bytes"),
        (F.col("id") % 5).alias("shard"),
    )


def test_retry_exhaustion_lands_in_error_channel(spark, df):
    out = with_external_call(
        df, make_fake_transport(), max_retries=3, retry_backoff_s=1.0,
        sleep=lambda s: None,
    ).toPandas()

    keys = out["image_id"]
    expect_broken = {k for k in keys if _die_at(k) >= 3}
    assert expect_broken, "fixture must include permanently-broken rows"

    # the job finished — retry exhaustion produced rows, not task failures
    broken = out[out["status"] == "error"]
    assert set(broken["image_id"]) == expect_broken
    assert (broken["attempts"] == 3).all()
    assert broken["result"].isna().all()
    assert broken["error"].str.contains("503").all()

    # success-row parity: result and attempt count both deterministic
    ok = out[out["status"] == "ok"]
    assert len(ok) + len(broken) == 200
    assert (ok["result"] == "ocr:" + ok["image_id"]).all()
    assert (ok["attempts"] == ok["image_id"].map(_die_at) + 1).all()
    assert ok["error"].isna().all()

    # payload bytes are dropped; passthrough columns survive
    assert "bytes" not in out.columns
    assert set(out.columns) == {
        "image_id", "shard", "result", "attempts", "status", "error",
    }


def test_linear_backoff_protocol(spark, df, tmp_path):
    """Backoff is reference-shaped: backoff * attempt between rounds,
    paid once per round (subset-shared), nothing before round 1.
    Sleeps happen on the worker; record them through the shared FS
    (local mode)."""
    log = str(tmp_path / "slept.log")

    def recording_sleep(s: float) -> None:
        with open(log, "a") as f:
            f.write(f"{s}\n")

    def always_503(batch: pd.DataFrame, attempt: int):
        return [None] * len(batch), ["503"] * len(batch)

    with_external_call(
        df.coalesce(1), always_503, max_retries=3, retry_backoff_s=0.5,
        sleep=recording_sleep,
    ).collect()
    # per Arrow batch: rounds 2 and 3 each sleep exactly once, in
    # linear progression (0.5 then 1.0) — never per row
    with open(log) as f:
        slept = [float(x) for x in f.read().split()]
    assert slept and len(slept) % 2 == 0
    assert slept == [0.5, 1.0] * (len(slept) // 2)
    # sleeps are per batch, not per row: far fewer than 200 rows x 2
    assert len(slept) <= 2 * 8


def test_connection_level_exception_is_retried_not_fatal(spark, df):
    """A transport that RAISES (connection refused, not a per-row
    error) fails that attempt for the subset but never the task."""

    def flaky_conn(batch: pd.DataFrame, attempt: int):
        if attempt == 1:
            raise ConnectionError("connection refused")
        return [f"ok:{k}" for k in batch["image_id"]], [None] * len(batch)

    out = with_external_call(
        df, flaky_conn, max_retries=3, sleep=lambda s: None
    ).toPandas()
    assert (out["status"] == "ok").all()
    assert (out["attempts"] == 2).all()


def test_misbehaving_transport_row_count_is_an_error_not_corruption(spark, df):
    """A transport returning the wrong row count must not silently
    misalign results; it lands in the error channel."""

    def short_transport(batch: pd.DataFrame, attempt: int):
        return ["x"], [None]

    out = with_external_call(
        df, short_transport, max_retries=2, sleep=lambda s: None
    ).toPandas()
    assert (out["status"] == "error").all()
    assert out["error"].str.contains("row").all()
