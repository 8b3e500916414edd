"""Benchmark decontamination (13-gram eval-set overlap, the
GPT-3-appendix-C / Llama-2 recipe) — planted-contamination recovery
and plan-shape assertions on top of the DuckDB parity already enforced
by tests/test_oracle_parity.py."""

from __future__ import annotations

import re

import pyspark.sql.functions as F
import pytest

from qfilter import corpus

SF_DIR = "/root/testdata/sf0.001"
N = corpus.DECON_N
MOD = corpus.DECON_BENCH_MOD


@pytest.fixture(scope="module")
def result(spark):
    return {r.doc_id: r for r in corpus.decontaminate(spark, SF_DIR).collect()}


def _word_counts(spark):
    docs = corpus.load(spark, SF_DIR, "documents")
    return {
        r.doc_id: r.nw
        for r in docs.select(
            "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("nw")
        ).collect()
    }


def test_planted_contamination_recovered(spark, result):
    """Every benchmark base doc (doc_id % 41 == 0, >= 51 words) has a
    TRAINING partner (doc_id + 2e6) carrying its words 12..51 verbatim
    -> the partner must be flagged with at least the 40 - 13 + 1 = 28
    matching gram positions, and >= 0.8 of its 35 positions hit."""
    hit_floor = 40 - N + 1
    checked = 0
    for doc_id, nw in _word_counts(spark).items():
        if doc_id % MOD == 0 and nw >= 51 and (doc_id + 2_000_000) % MOD != 0:
            partner = result.get(doc_id + 2_000_000)
            assert partner is not None, f"partner of bench doc {doc_id} not flagged"
            assert partner.n_hits >= hit_floor
            assert partner.contam_frac >= hit_floor / (47 - N + 1)
            checked += 1
    assert checked >= 1, "fixture has no qualifying benchmark doc"


def test_benchmark_partner_contaminates_base(spark, result):
    """The symmetric plant: when the PARTNER lands in the eval slice
    (base doc_id % 41 == 21), the training BASE doc shares the 40-word
    span with it and must be flagged."""
    for doc_id, nw in _word_counts(spark).items():
        if doc_id % MOD == MOD - (2_000_000 % MOD) and nw >= 51:
            row = result.get(doc_id)
            assert row is not None, f"base {doc_id} of bench partner not flagged"
            assert row.n_hits >= 40 - N + 1


def test_no_benchmark_doc_flagged_and_counts_consistent(result):
    """Output is training docs only, with n_hit_grams <= n_hits <=
    n_total and contam_frac = n_hits / n_total."""
    assert result, "no contaminated docs found at all"
    for r in result.values():
        assert r.doc_id % MOD != 0
        assert 1 <= r.n_hit_grams <= r.n_hits <= r.n_total
        assert abs(r.contam_frac - r.n_hits / r.n_total) < 1e-12


def test_plan_broadcasts_eval_side(spark):
    """The 100 TB contract: the eval set is fixed-size, so its distinct
    gram hashes BROADCAST to the training scan and the contaminated-doc
    aggregate broadcasts back to the totals projection — the
    corpus-sized training gram table must never be the build or shuffle
    side of a SortMergeJoin.  Allowed (non-broadcast) exchanges: the
    eval-side distinct and the two-phase distinct aggregate on matched
    rows only."""
    df = corpus.decontaminate(spark, SF_DIR)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = df._jdf.queryExecution().explainString(mode)
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2
    n_ex = len(re.findall(r"^\(\d+\) Exchange\b", plan, flags=re.M))
    assert n_ex <= 3, f"unexpected shuffle count {n_ex}:\n{plan}"
