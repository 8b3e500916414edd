"""Deterministic dataset split / exact stratified sample.

The training-reproducibility contract: assignment is a pure function
of the key — identical at any parallelism, partitioning, or run — and
the stratified sample is EXACT per stratum (ceil(n/den*num) rows, not
±binomial noise).  Oracle parity vs DuckDB is covered by
tests/test_oracle_parity.py (deregistered_checks); these tests cover
the scale properties an oracle diff can't.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from qfilter.corpus import dataset_split, stratified_sample

SF_DIR = "/root/testdata/sf0.01"


def _collect_map(df, key="doc_id", val="split"):
    return {r[key]: r[val] for r in df.collect()}


def test_split_is_parallelism_invariant(spark):
    a = _collect_map(dataset_split(spark, SF_DIR))
    b = _collect_map(dataset_split(spark, SF_DIR).repartition(17))
    c = _collect_map(dataset_split(spark, SF_DIR).coalesce(1))
    assert a == b == c


def test_split_partitions_the_corpus(spark):
    df = dataset_split(spark, SF_DIR)
    n = df.count()
    counts = {r["split"]: r["n"] for r in df.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == n  # disjoint + complete by construction
    # 80/10/10 within binomial tolerance at n=500
    assert abs(counts.get("train", 0) / n - 0.8) < 0.06
    assert abs(counts.get("val", 0) / n - 0.1) < 0.05
    assert abs(counts.get("test", 0) / n - 0.1) < 0.05


def test_split_plan_is_narrow(spark):
    # zero-shuffle: no Exchange in the plan — assignment must stay a
    # per-row projection at any table size
    plan = dataset_split(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_stratified_sample_is_exact_per_stratum(spark):
    langs = {
        r["lang"]: r["n"]
        for r in dataset_split(spark, SF_DIR).groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    got = {
        r["lang"]: r["n"]
        for r in stratified_sample(spark, SF_DIR).groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert got == {lang: math.ceil(n / 5) for lang, n in langs.items()}


def test_sample_and_pack_plans_shuffle_exactly_once(spark):
    """Both stratified ops need exactly ONE Exchange (hash by lang):
    rank + count windows share the partitioning, and nothing upstream
    or downstream may add another shuffle at any scale."""
    from qfilter.corpus import pack_shards, stratified_sample

    for df in (stratified_sample(spark, SF_DIR), pack_shards(spark, SF_DIR)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1, plan


def test_pack_shards_fills_to_budget_deterministically(spark):
    from qfilter.corpus import pack_shards

    rows = pack_shards(spark, SF_DIR, budget_chars=4000).collect()
    again = pack_shards(spark, SF_DIR, budget_chars=4000).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r["doc_id"])
        cum = 0
        shards: dict = {}
        for r in rs:
            # offset = chars before it; shard = floor(offset/budget)
            assert r["offset_chars"] == cum
            assert r["shard_id"] == cum // 4000
            cum += r["n_chars"]
            shards.setdefault(r["shard_id"], 0)
            shards[r["shard_id"]] += r["n_chars"]
        ids = sorted(shards)
        assert ids == list(range(len(ids)))  # contiguous shard ids
        # every shard but the last spans its full budget window
        for sid in ids[:-1]:
            assert shards[sid] > 0
        max_doc = max(r["n_chars"] for r in rs)
        for sid in ids[:-1]:
            assert shards[sid] <= 4000 + max_doc  # straddle bound


def test_pack_shards_sub_strata_is_valid_parallel_packing(spark):
    """sub_strata=4: same packing rule applied independently per
    (lang, doc_id % 4) — recompute each sub-stratum single-node and
    compare; budget semantics are unchanged inside each."""
    from qfilter.corpus import pack_shards

    rows = pack_shards(spark, SF_DIR, budget_chars=4000, sub_strata=4).collect()
    groups: dict = {}
    for r in rows:
        groups.setdefault((r["lang"], r["sub_stratum"]), []).append(r)
    assert len({k[1] for k in groups}) == 4
    for (_lang, sub), rs in groups.items():
        rs.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in rs:
            assert r["doc_id"] % 4 == sub
            assert r["offset_chars"] == cum and r["shard_id"] == cum // 4000
            cum += r["n_chars"]


def test_stratified_sample_is_a_deterministic_subset(spark):
    s1 = sorted(r["doc_id"] for r in stratified_sample(spark, SF_DIR).collect())
    s2 = sorted(r["doc_id"] for r in stratified_sample(spark, SF_DIR).collect())
    assert s1 == s2
    all_ids = {r["doc_id"] for r in dataset_split(spark, SF_DIR).collect()}
    assert set(s1) <= all_ids


def test_temperature_resample_mixing_shape(spark):
    """alpha=0.5 mixing: head languages are downsampled toward their
    mixed share, tail languages kept (near-)fully; realized keep
    ratios track the analytic rate min(1, sqrt(c)*B/(S*c)) within
    binomial noise; assignment is deterministic (pure f(doc_id))."""
    import math

    from qfilter.corpus import load, temperature_resample

    docs = load(spark, SF_DIR, "documents").select("doc_id", "lang")
    before = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    kept_df = temperature_resample(spark, SF_DIR)
    after = {r.lang: r.n for r in kept_df.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}

    B = sum(before.values())
    S = sum(int(math.isqrt(c)) for c in before.values())
    for lang, c in before.items():
        rate = min(1.0, math.isqrt(c) * B / (S * c))
        realized = after.get(lang, 0) / c
        # u is a Knuth-hash uniform: allow ~4-sigma binomial noise
        tol = 4 * math.sqrt(rate * (1 - rate) / c) + 1 / c
        assert abs(realized - rate) <= tol, (lang, c, rate, realized)

    # head lang downsampled strictly more than tail lang
    head = max(before, key=before.get)
    tail = min(before, key=before.get)
    if before[head] > 4 * before[tail]:
        assert after[head] / before[head] < after.get(tail, 0) / before[tail]

    # deterministic: a second invocation yields the identical doc set
    a = {r.doc_id for r in kept_df.collect()}
    b = {r.doc_id for r in temperature_resample(spark, SF_DIR).collect()}
    assert a == b


def test_temperature_resample_upsampled_targets(spark):
    """Full-replication variant: per-lang realized totals hit the
    integer target n_l = round(w_l*B/S) up to binomial noise on the
    fractional copy; tail languages genuinely UPSAMPLE (realized > c);
    copy indices are dense per doc."""
    import math

    from qfilter.corpus import load, temperature_resample_upsampled

    docs = load(spark, SF_DIR, "documents").select("doc_id", "lang")
    before = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    out = temperature_resample_upsampled(spark, SF_DIR)
    after = {r.lang: r.n for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}

    B = sum(before.values())
    S = sum(int(math.isqrt(c)) for c in before.values())
    upsampled = 0
    for lang, c in before.items():
        target = (2 * int(math.isqrt(c)) * B + S) // (2 * S)
        frac = (target % c) / c
        tol = 4 * math.sqrt(max(frac * (1 - frac), 1e-9) * c) + 1
        assert abs(after.get(lang, 0) - target) <= tol, (lang, c, target, after.get(lang))
        if target > c:
            assert after[lang] > c
            upsampled += 1
    assert upsampled >= 1, "fixture has no tail language to upsample"

    # copy_idx is dense 0..copies-1 per doc
    per_doc = out.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("copy_idx").alias("mx"),
        F.min("copy_idx").alias("mn"),
    )
    bad = per_doc.filter(
        (F.col("mn") != 0) | (F.col("mx") != F.col("n") - 1)
    ).count()
    assert bad == 0
