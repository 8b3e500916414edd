"""Exact substring-span dedup (suffix-array-style, Lee et al. ACL'22
shape) — planted-span recovery and maximality properties on top of the
DuckDB parity already enforced by tests/test_oracle_parity.py."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from qfilter import corpus

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spans(spark):
    return corpus.substring_dup_spans(spark, SF_DIR).collect()


def test_planted_spans_recovered(spark, spans):
    """Every doc with >= 51 words gets a partner embedding its words
    12..51 -> the (doc, doc+2e6) pair must report exactly the planted
    40-word span: start1 = 11 (0-based word index in the original),
    start2 = 4 (after the 4 sentinel words), length 40."""
    docs = corpus.load(spark, SF_DIR, "documents")
    qualifying = {
        r.doc_id
        for r in docs.select(
            "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("nw")
        ).collect()
        if r.nw >= 51
    }
    assert qualifying, "fixture must contain docs with >= 51 words"
    planted = {
        (r.id1, r.id2): r
        for r in spans
        if r.id2 == r.id1 + 2_000_000
    }
    for doc_id in qualifying:
        key = (doc_id, doc_id + 2_000_000)
        assert key in planted, f"planted span missing for doc {doc_id}"
        r = planted[key]
        # the planted region is words 12..51 (1-based) = 0-based 11..50;
        # natural overlap adjacent to the plant can only EXTEND the span
        assert r.start1 <= 11 and r.start1 + r.span_words >= 51
        assert r.span_words >= 40
        # offsets are consistent: same diag on both sides
        assert r.start1 - r.start2 == 11 - 4


def test_span_run_consistency(spans):
    """n_grams of a maximal run over k-shingles of an L-word span is
    L - k + 1 (runs are contiguous by construction)."""
    k = corpus.SUBSTR_K
    for r in spans:
        assert r.n_grams == r.span_words - k + 1
        assert r.span_words >= corpus.SUBSTR_MIN_WORDS
        assert r.id1 < r.id2
        assert r.start1 >= 0 and r.start2 >= 0


def test_apply_removes_planted_spans(spark):
    """substring_dedup_apply cuts every detected span from the
    HIGHER-id doc (keep-first-occurrence) and only those words:
    n_removed equals the merged cut length, the planted partners lose
    (at least) their 40 duplicated words, and docs in no pair are
    byte-identical to their whitespace-normalized original."""
    spans = corpus.substring_dup_spans(spark, SF_DIR).collect()
    out = {r.doc_id: r for r in corpus.substring_dedup_apply(spark, SF_DIR).collect()}
    docs = {
        r.doc_id: r.text.strip().split()
        for r in corpus.load(spark, SF_DIR, "documents").collect()
    }

    # merged expected cut length per doc (union of [start2, end2))
    cut_ranges: dict[int, list[tuple[int, int]]] = {}
    for r in spans:
        cut_ranges.setdefault(r.id2, []).append(
            (r.start2, r.start2 + r.span_words)
        )
    for doc_id, ranges in cut_ranges.items():
        ranges.sort()
        merged_len, cur_s, cur_e = 0, *ranges[0]
        for s, e in ranges[1:]:
            if s > cur_e:
                merged_len += cur_e - cur_s
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        merged_len += cur_e - cur_s
        assert out[doc_id].n_removed == merged_len, doc_id

    # planted partners: >= their 40 duplicated words removed
    for doc_id, ws in docs.items():
        partner = doc_id + 2_000_000
        if len(ws) >= 51 and partner in out:
            assert out[partner].n_removed >= 40, partner

    # untouched docs: exact whitespace-normalized original
    for doc_id, ws in docs.items():
        if doc_id not in cut_ranges:
            assert out[doc_id].n_removed == 0
            assert out[doc_id].text_dedup == " ".join(ws), doc_id


def test_spans_are_true_duplicates(spark, spans):
    """Spot-check: the reported word ranges really are identical text
    on both sides (the substring-dedup guarantee), for every planted
    pair and a slice of natural pairs."""
    docs = {
        r.doc_id: r.text.strip().split()
        for r in corpus.load(spark, SF_DIR, "documents").collect()
    }

    def words_of(doc_id):
        if doc_id >= 2_000_000:
            base = docs[doc_id - 2_000_000]
            return (
                [f"zq{doc_id - 2_000_000}", "filler", "alpha", "beta"]
                + base[11:51]
                + ["omega", "filler", "end"]
            )
        return docs[doc_id]

    checked = 0
    for r in spans:
        a = words_of(r.id1)[r.start1 : r.start1 + r.span_words]
        b = words_of(r.id2)[r.start2 : r.start2 + r.span_words]
        assert a == b, (r.id1, r.id2, r.start1, r.start2)
        checked += 1
        if checked >= 200:
            break
    assert checked > 0
