"""Corpus-scale text analytics over the `documents` / `events` /
TPC-H-ish tables — the training-data-pipeline operators (dedup,
fingerprinting, quality scoring, CER, rollups, windows, top-k).

Each function takes (spark, sf_dir) and returns a DataFrame; the
matching ANSI-SQL oracle strings live in `__spark_entry__.oracle_sql`.
Determinism rules for oracle hash-equality:

* money/quantity sums -> DECIMAL (associative, order-independent),
  never double sums (partial-aggregation order would change ulps);
* doubles only from integer/integer division (exact same IEEE result
  in both engines);
* every aggregate aliased identically in Spark and SQL.

Reference parity notes: category counts = A3 (`classify_quality_folder
.py:37-40`), weighted macro CER = A5 (`cer_utils.py:46-54`), filename
equi-join = J1 (`cer_utils.py:36-40`), page->doc rollup = A1
(`classificator_extended_paddleocr.py:424-443`), lag window = W1
(`:300-308`), grid argmax = A6 (`tune_extended_classifier.py:103-123`),
top-k = A8 (`tune:244-251`).  Dedup/fingerprint/minhash/simhash are the
north-rule extensions (no counterpart in the reference).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "load",
    "text_quality_stats",
    "lang_rollup",
    "exact_dedup",
    "fingerprints",
    "winnow_fingerprints",
    "cer_per_lang",
    "trigram_jaccard_pairs",
    "decontaminate",
    "minhash_signatures",
    "minhash_lsh_dup_pairs",
    "connected_components",
    "neardup_components",
    "simhash64",
    "event_gaps",
    "event_rollup",
    "event_sessions",
    "lineitem_rollup",
    "top_customers",
    "discount_grid_argmax",
]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _words():
    """text -> words array Column (lazy: needs an active session)."""
    return F.split(F.trim(F.col("text")), r"\s+")


# ------------------------------------------------------- quality / langid

def text_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style counters, restricted to the SQL-exact subset."""
    docs = load(spark, sf_dir, "documents")
    nw = F.size(_words())
    compact = F.regexp_replace(F.col("text"), r"\s+", "")
    return docs.select(
        "doc_id",
        "lang",
        nw.alias("n_words"),
        F.length("text").alias("n_chars_obs"),
        F.length(compact).alias("n_letters"),
        (F.length(compact).cast("double") / nw.cast("double")).alias("mean_word_len"),
        F.size(F.array_distinct(_words())).alias("n_uniq_words"),
        (F.size(F.array_distinct(_words())).cast("double") / nw.cast("double")).alias(
            "uniq_word_frac"
        ),
    )


def doc_gopher_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style standalone document filter (the corpus-level analog
    of the caption rules inside the main cascade): ordered
    first-match-wins when-chain, pure Catalyst — the same shape as
    qfilter.cascade (SURVEY §2.9).  The counters come from
    text_quality_stats so there is exactly one definition of them."""
    stats = text_quality_stats(spark, sf_dir)
    reason = (
        F.when(F.col("n_words") < 25, F.lit("too_few_words"))
        .when(F.col("mean_word_len") < 4.0, F.lit("short_words"))
        .when(F.col("uniq_word_frac") < 0.4, F.lit("repetitive"))
        .otherwise(F.lit("ok"))
    )
    return stats.select(
        "doc_id",
        reason.alias("reason"),
        (reason == "ok").alias("keep"),
    )


def lang_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus stats (A3/A4 analog: counts per label)."""
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(_words())).alias("total_words"),
        F.sum("n_chars").alias("total_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


# ----------------------------------------- deterministic splits/samples
#
# Reproducible dataset assignment is a first-class training-pipeline
# op: the SAME doc must land in the SAME split on every run, on any
# cluster, at any parallelism — so assignment must be a pure function
# of the key, never of sampling order.  The hash here is a two-round
# Lehmer/MINSTD multiplicative hash over the Mersenne prime 2^31-1:
# exact 64-bit-safe integer arithmetic expressible IDENTICALLY in
# Spark SQL and ANSI SQL, so the whole contract is oracle-checkable
# bit-for-bit (xxhash64 would be the engine-native choice but has no
# DuckDB twin).  Zero shuffle for the split; one shuffle (by stratum)
# for the exact stratified sample.

_SPLIT_M = 2147483647  # 2^31 - 1
_SPLIT_A = 48271  # MINSTD multiplier


def _split_hash(col):
    # (x % M) * A fits 64-bit: (M-1) * 48271 ~ 1.04e14 << 2^63
    h = F.pmod(F.pmod(col, F.lit(_SPLIT_M)) * _SPLIT_A, F.lit(_SPLIT_M))
    return F.pmod(h * _SPLIT_A, F.lit(_SPLIT_M))


def dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment, pure function of doc_id.
    Narrow (zero-shuffle) at any scale; thresholds are integer
    constants (floor of 0.8/0.9 * (2^31-1)) so no float crosses an
    engine boundary."""
    docs = load(spark, sf_dir, "documents")
    h = _split_hash(F.col("doc_id"))
    return docs.select(
        "doc_id",
        "lang",
        F.when(h < 1717986917, "train")
        .when(h < 1932735282, "val")
        .otherwise("test")
        .alias("split"),
    )


def stratified_sample(
    spark: SparkSession, sf_dir: str, num: int = 1, den: int = 5
) -> DataFrame:
    """Exact per-language ``num/den`` sample: rank docs inside each
    stratum by the deterministic hash and keep the first
    ceil(n * num / den).  Unlike fraction-threshold sampling this is
    EXACT per stratum (ceil, never ±binomial noise), at the cost of
    one shuffle by stratum + a window; the keep condition
    ``(rank-1) * den < n * num`` is pure integer math, identical in
    any SQL engine."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", _split_hash(F.col("doc_id")).alias("h")
    )
    w = Window.partitionBy("lang").orderBy("h", "doc_id")
    ranked = docs.select(
        "doc_id",
        "lang",
        F.row_number().over(w).alias("sample_rank"),
        F.count(F.lit(1)).over(Window.partitionBy("lang")).alias("_n"),
    )
    return ranked.filter(
        (F.col("sample_rank") - 1) * den < F.col("_n") * num
    ).select("doc_id", "lang", "sample_rank")


def pack_shards(
    spark: SparkSession,
    sf_dir: str,
    budget_chars: int = 4000,
    sub_strata: int = 1,
) -> DataFrame:
    """Pack documents into fixed-budget training shards.

    LLM training wants shards of ~equal token mass, assembled
    DETERMINISTICALLY (re-runs must produce the same shard manifest, or
    downstream checkpoint/resume breaks).  Assignment rule: within each
    language, in doc_id order, a doc joins shard
    ``floor(chars_before_it / budget)`` — a pure window cumsum, so the
    whole packing is one shuffle (by stratum) + one sorted window pass,
    parallel across strata at any scale, and expressible identically
    in any SQL engine (unlike true next-fit packing, which is a
    sequential scan).  Shards fill to ~budget; a doc straddling a
    boundary belongs to the shard its first char falls in.

    A language stratum is one window partition — one task.  When one
    stratum dominates the corpus (English at web scale), pass
    ``sub_strata`` > 1: packing runs per ``(lang, pmod(doc_id, k))``
    — still deterministic, still valid fixed-budget shards, k-way
    parallel inside the hot stratum; shard ids are then unique per
    (lang, sub_stratum).
    """
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    part_keys = ["lang"]
    if sub_strata > 1:
        docs = docs.withColumn(
            "sub_stratum", F.pmod(F.col("doc_id"), F.lit(sub_strata)).cast("int")
        )
        part_keys.append("sub_stratum")
    w = Window.partitionBy(*part_keys).orderBy("doc_id")
    cum_before = F.coalesce(
        F.sum("n_chars").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    return docs.select(
        "doc_id",
        *part_keys[1:],
        "lang",
        "n_chars",
        F.floor(cum_before / budget_chars).cast("long").alias("shard_id"),
        cum_before.alias("offset_chars"),
    )


# ---------------------------------------------------------------- dedup

def _docs_with_planted_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents UNION a copy with offset ids — deterministic dup plant
    (the driver corpus has no natural dups)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    copy = docs.select(
        (F.col("doc_id") + F.lit(1_000_000)).alias("doc_id"), "text", "lang"
    )
    return docs.unionByName(copy)


def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by md5(text): winner = min(doc_id), dup_count.
    Salted two-phase aggregation (same pattern as qfilter.dedup)."""
    dup = _docs_with_planted_dups(spark, sf_dir)
    salted = dup.select(
        F.md5("text").alias("h"),
        "doc_id",
        F.pmod(F.col("doc_id"), F.lit(16)).alias("_salt"),
    )
    partial = salted.groupBy("h", "_salt").agg(
        F.min("doc_id").alias("_m"), F.count(F.lit(1)).alias("_c")
    )
    return partial.groupBy("h").agg(
        F.min("_m").alias("keep_id"), F.sum("_c").alias("dup_count")
    )


def fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit-hex document fingerprint (md5 prefix of normalized text)."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.substring(F.md5(F.lower(F.trim(F.col("text")))), 1, 16).alias("fingerprint"),
    )


WINNOW_K = 5     # k-gram length (characters, after normalization)
WINNOW_W = 4     # winnowing window (guarantee: any match >= k+w-1
                 # chars shares a selected fingerprint)
WINNOW_MOD = 1_000_000_007
WINNOW_BASE = 257


def winnow_fingerprints(
    spark: SparkSession, sf_dir: str, k: int = WINNOW_K, w: int = WINNOW_W
) -> DataFrame:
    """MOSS-style winnowing fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03): polynomial rolling hash over character k-grams of the
    normalized text, then per sliding window of w gram hashes select
    the minimum (ties -> rightmost), distinct selected (pos, hash)
    pairs per doc.  The training-data "document fingerprinting
    (rolling hash)" op: expected density 2/(w+1), and any substring
    match of length >= k+w-1 between two docs is GUARANTEED to share a
    fingerprint — the property md5-prefix `fingerprints` (exact only)
    and SimHash (similarity only) don't give.

    Everything is exact int64 arithmetic in Catalyst higher-order
    functions — (acc*257 + ascii) % 1e9+7 stays far below 2^63 — and
    the DuckDB oracle is an INDEPENDENT relational formulation of the
    same algorithm (grams exploded to rows, window membership as a
    lateral join, arg-min per window via struct-min aggregate), so
    parity is a real two-implementation check.

    Scale design: winnowing is doc-LOCAL, so the whole computation is
    a per-row projection — gram-hash array, then window arg-min
    selection, both inside one task.  The only shuffle is a doc-keyed
    repartition of the raw TEXT rows (bytes ~ corpus text size), vs
    the naive relational plan's (doc_id, wstart) groupBy shuffling a
    w-fold explode of every gram (measured 3.3x slower at sf0.1 and
    ~100x the shuffle volume).  The persist() between the two
    projections is load-bearing: without it CollapseProject inlines
    the FULL O(|t|*k) gram-array expression at every one of the
    O(|t|*w) hs[...] accesses in the selection lambda — turning a
    linear pass quadratic (measured: minutes instead of seconds at
    sf0.001)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    n_parts = spark.sparkContext.defaultParallelism * 2
    norm = (
        docs.select(
            "doc_id",
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]", "").alias("t"),
        )
        .where(F.length("t") >= k + w - 1)
        .repartition(n_parts, "doc_id")
    )
    hs = (
        f"transform(sequence(0, length(t) - {k}), p -> "
        f"aggregate(transform(sequence(1, {k}),"
        f" i -> cast(ascii(substring(t, p + i, 1)) as bigint)),"
        f" cast(0 as bigint),"
        f" (acc, x) -> (acc * {WINNOW_BASE} + x) % {WINNOW_MOD}))"
    )
    # arg-min over each w-window of (h, -pos) structs; ties -> larger
    # pos (smaller np), the robust-winnowing rightmost-min rule
    sel = (
        f"array_distinct(transform(sequence(0, size(hs) - {w}), ws -> "
        f"aggregate(sequence(ws + 1, ws + {w - 1}),"
        f" named_struct('h', hs[ws], 'np', -ws),"
        f" (acc, p) -> if(named_struct('h', hs[p], 'np', -p) < acc,"
        f" named_struct('h', hs[p], 'np', -p), acc))))"
    )
    # DISK_ONLY: the gram-hash arrays are ~8 bytes per text char —
    # larger than the corpus itself; any memory tier would thrash at
    # scale, and the persist only exists to break CollapseProject
    with_hs = norm.withColumn("hs", F.expr(hs)).persist(StorageLevel.DISK_ONLY)
    return (
        with_hs.withColumn("sel", F.expr(sel))
        .select("doc_id", F.explode("sel").alias("s"))
        .select(
            "doc_id",
            (-F.col("s.np")).alias("pos"),
            F.col("s.h").alias("fp"),
        )
    )


# ------------------------------------------------------------------ CER

def cer_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted macro CER (A5): hypothesis = vowel-stripped text vs
    reference text, joined by doc_id (J1 filename-join analog),
    aggregated per lang as sum(lev) / sum(ref_len) components."""
    docs = load(spark, sf_dir, "documents")
    hyp = docs.select(
        "doc_id", F.regexp_replace("text", "[aeiou]", "").alias("hyp_text")
    )
    ref = docs.select("doc_id", "lang", F.col("text").alias("ref_text"))
    joined = ref.join(hyp, "doc_id", "inner")
    return joined.groupBy("lang").agg(
        F.sum(F.levenshtein("hyp_text", "ref_text")).alias("sum_lev"),
        F.sum(F.length("ref_text")).alias("sum_ref_len"),
        F.count(F.lit(1)).alias("n_docs"),
    )


# --------------------------------------------------------- near-dup ops

def _doc_trigrams(docs: DataFrame) -> DataFrame:
    """(doc_id, shingle) — distinct word-3-gram shingles per doc."""
    words = docs.select("doc_id", _words().alias("ws")).filter(F.size("ws") >= 3)
    tri = words.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, greatest(size(ws) - 3, -1)),"
                " i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))"
            )
        ).alias("shingle"),
    )
    return tri.distinct()


def _doc_shingle_hashes(docs: DataFrame, p: int) -> DataFrame:
    """(doc_id, x) word-3-gram shingle hashes, x = xxhash64(shingle)
    mod p, WITHOUT per-doc dedup — for min-fold consumers (MinHash),
    where duplicates cannot affect the result."""
    words = docs.select("doc_id", _words().alias("ws")).filter(F.size("ws") >= 3)
    return words.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, greatest(size(ws) - 3, -1)),"
                f" i -> pmod(xxhash64(concat_ws(' ', ws[i], ws[i+1], ws[i+2])), {p}))"
            )
        ).alias("x"),
    )


TRIGRAM_DF_CAP = 64  # drop shingles present in more docs than this


def trigram_jaccard_pairs(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.4,
    df_cap: int = TRIGRAM_DF_CAP,
) -> DataFrame:
    """Word-3-gram Jaccard near-dup pairs.  Dup plant: each doc vs a
    copy truncated to its first 80% of words (id + 1e6) => known
    overlapping pairs.  Shingle equi-join, then filter on jaccard."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    trunc = docs.select(
        (F.col("doc_id") + F.lit(1_000_000)).alias("doc_id"),
        F.concat_ws(
            " ",
            F.slice(_words(), 1, F.greatest(F.floor(F.size(_words()) * 0.8), F.lit(1)).cast("int")),
        ).alias("text"),
    )
    all_docs = docs.unionByName(trunc)
    # join/shuffle on the 64-bit shingle hash, not the string: ~4x
    # smaller shuffle keys; per-doc shingles are DISTINCT strings, so
    # hashed counts match exactly absent an xxhash64 collision (~1e-8
    # at this cardinality; the oracle parity test would surface one).
    # r6: hash BEFORE the per-doc distinct (not `_doc_trigrams` then
    # hash) — the distinct is the first shuffle of the job and now
    # moves 16-byte (doc_id, sh) rows instead of full shingle strings.
    # Same output under the same no-collision assumption the hashed
    # join already makes: dedup over hashes == dedup over the distinct
    # strings they came from unless two distinct shingles of one doc
    # collide.
    words = all_docs.select("doc_id", _words().alias("ws")).filter(
        F.size("ws") >= 3
    )
    tri_all = words.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, greatest(size(ws) - 3, -1)),"
                " i -> xxhash64(concat_ws(' ', ws[i], ws[i+1], ws[i+2])))"
            )
        ).alias("sh"),
    ).distinct()
    # document-frequency cap (stop-shingle removal): one corpus-common
    # trigram ("one of the") would otherwise produce O(df^2) rows in
    # the self-join below — the scale-killer at 100 TB.  Jaccard is
    # computed over the KEPT shingles on both sides (sizes included),
    # mirrored exactly in the DuckDB oracle.
    # r6: the cap is a count() window over sh, not a df-aggregate
    # joined back — the agg+join form re-executed the whole shingle
    # generation for each of its two scans (one per join side) and
    # paid two shuffles; the window computes identical df counts in
    # ONE shuffle of the shingle table and one generation pass.
    from pyspark.sql.window import Window

    tri = (
        tri_all.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("sh"))
        )
        .filter(F.col("df") <= df_cap)
        .drop("df")
        # corpus-sized intermediate: DISK_ONLY, not memory cache — at
        # 100 TB the kept-shingle set dwarfs executor memory and a
        # MEMORY persist would evict/thrash; local parquet-speed disk
        # re-reads are cheaper than recomputing the cap pass twice
        .persist(StorageLevel.DISK_ONLY)
    )
    sizes = tri.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = tri.alias("a")
    b = tri.alias("b")
    inter = (
        a.join(b, F.col("a.sh") == F.col("b.sh"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("id1"), F.col("n_sh").alias("n1"))
    sb = sizes.select(F.col("doc_id").alias("id2"), F.col("n_sh").alias("n2"))
    j = (
        inter.join(sa, "id1").join(sb, "id2")
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("n1") + F.col("n2") - F.col("n_inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "n_inter", "n1", "n2", "jaccard")
    )
    return j


SUBSTR_K = 8        # shingle width, words (detection resolution)
SUBSTR_MIN_WORDS = 15  # report spans at least this many words long
SUBSTR_DF_CAP = 64  # drop shingles present in more docs than this


def _substring_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + the planted substring-dup partners, as (doc_id, ws)
    word arrays.  Every doc with >= 51 words gets a partner
    (doc_id + 2e6) embedding its words 12..51 between unrelated
    sentinel words -> a known 40-word duplicated span per qualifying
    doc, mirrored verbatim in the DuckDB oracles."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.select("doc_id", _words().alias("ws"))
    copy = base.filter(F.size("ws") >= 51).select(
        (F.col("doc_id") + F.lit(2_000_000)).alias("doc_id"),
        F.concat(
            F.array(
                F.concat(F.lit("zq"), F.col("doc_id").cast("string")),
                F.lit("filler"), F.lit("alpha"), F.lit("beta"),
            ),
            F.slice("ws", 12, 40),
            F.array(F.lit("omega"), F.lit("filler"), F.lit("end")),
        ).alias("ws"),
    )
    return base.unionByName(copy)


def substring_dup_spans(
    spark: SparkSession,
    sf_dir: str,
    k: int = SUBSTR_K,
    min_words: int = SUBSTR_MIN_WORDS,
    df_cap: int = SUBSTR_DF_CAP,
) -> DataFrame:
    """Exact cross-document duplicated-SPAN detection — the
    suffix-array-style substring dedup of Lee et al., "Deduplicating
    Training Data Makes Language Models Better" (ACL '22), at word
    granularity.  Unlike doc-level exact/MinHash/winnowing dedup this
    reports WHICH span of which pair of documents is repeated, the
    primitive substring-removal dedup needs.

    Algorithm (all DataFrame ops, no UDF):
      1. k-word shingles at EVERY word position, hashed to int64
         inside the projection (transform + xxhash64 in one Catalyst
         expression, then posexplode of the hash array — the string
         shingles never leave the task).
      2. Document-frequency cap on the shingle hash (count DISTINCT
         docs), exactly like `trigram_jaccard_pairs`: a boilerplate
         k-gram shared by thousands of docs would otherwise explode
         the self-join O(df^2) — the 100 TB scale-killer.  Capped
         shingles can split a reported span; semantics are "maximal
         runs of kept shingles", mirrored in the oracle.
      3. Self-join on the hash (id1 < id2) -> anti-diagonal runs:
         matches of one contiguous duplicated span share
         diag = pos_a - pos_b, and their pos_a values are consecutive.
         Gaps-and-islands (row_number window per (id1, id2, diag))
         merges each run into one maximal span: any common substring
         of >= k words is found, with exact start offsets on both
         sides and length max-min+k.
      4. Keep spans >= min_words.

    Dup plant: every doc with >= 51 words gets a partner
    (doc_id + 2e6) embedding its words 12..51 between unrelated
    sentinels -> a known 40-word duplicated span per qualifying doc.

    Shuffle budget: explode is map-side; the df agg, the cap join and
    the self-join all shuffle on `h` (co-partitioned); the window and
    the span groupBy share one (id1, id2, diag)-clustered exchange
    (groupBy keys are a superset, Catalyst reuses the partitioning).
    The gram table is corpus-sized -> DISK_ONLY persist, same policy
    as the trigram/minhash intermediates.
    """
    from pyspark.sql import Window

    all_docs = _substring_corpus(spark, sf_dir).filter(F.size("ws") >= k)
    grams = (
        all_docs.select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, size(ws) - {k}), i -> "
                    f"xxhash64(concat_ws(' ', slice(ws, i + 1, {k}))))"
                )
            ).alias("pos", "h"),
        )
        .select("doc_id", F.col("pos").cast("long").alias("pos"), "h")
        .persist(StorageLevel.DISK_ONLY)
    )
    keep = (
        grams.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") <= df_cap)
        .select("h")
    )
    g = grams.join(keep, "h")
    a, b = g.alias("a"), g.alias("b")
    pairs = (
        a.join(b, F.col("a.h") == F.col("b.h"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id1"),
            F.col("b.doc_id").alias("id2"),
            F.col("a.pos").alias("pa"),
            (F.col("a.pos") - F.col("b.pos")).alias("diag"),
        )
    )
    wspec = Window.partitionBy("id1", "id2", "diag").orderBy("pa")
    runs = pairs.withColumn(
        "grp", F.col("pa") - F.row_number().over(wspec)
    )
    return (
        runs.groupBy("id1", "id2", "diag", "grp")
        .agg(
            F.min("pa").alias("s1"),
            F.max("pa").alias("e1"),
            F.count(F.lit(1)).alias("n_grams"),
        )
        .withColumn("span_words", F.col("e1") - F.col("s1") + F.lit(k))
        .filter(F.col("span_words") >= min_words)
        .select(
            "id1",
            "id2",
            F.col("s1").alias("start1"),
            (F.col("s1") - F.col("diag")).alias("start2"),
            "span_words",
            "n_grams",
        )
    )


def substring_dedup_apply(
    spark: SparkSession,
    sf_dir: str,
    k: int = SUBSTR_K,
    min_words: int = SUBSTR_MIN_WORDS,
    df_cap: int = SUBSTR_DF_CAP,
) -> DataFrame:
    """The REMOVAL half of exact substring dedup (Lee et al. keep one
    occurrence and cut the rest): for every detected duplicated span,
    the lower-id document keeps its copy and the higher-id document's
    word range is cut.  Per doc: overlapping/adjacent cut ranges are
    union-merged (gaps-and-islands over the running max of range
    ends), then the surviving words are reassembled in one Catalyst
    projection (filter-with-index over the word array vs the
    collected cut ranges — no UDF, no extra shuffle beyond the span
    pipeline's own).

    Output: (doc_id, n_removed, text_dedup) for EVERY corpus doc
    (planted partners included); n_removed = words cut.  The cut-range
    array order is irrelevant (membership test), so collect_list's
    nondeterministic ordering cannot change the output."""
    from pyspark.sql import Window

    spans = substring_dup_spans(spark, sf_dir, k, min_words, df_cap)
    # DISTINCT cut ranges (r6 flake fix): several id1 partners (e.g.
    # exact-duplicate sources) can report the IDENTICAL (doc_id, s, e)
    # cut.  Identical ranges always union-merge, so distinct is
    # value-neutral — but it removes ties from the (s, e) window
    # order.  With ties present, an engine that evaluates the
    # running-max window and the island running-sum window under two
    # independent sorts can interleave the tied rows differently and
    # split one island in two (observed once in DuckDB on the oracle
    # side: n_removed 80 vs 40 for a doc with three identical spans).
    # After distinct, (s, e) is unique per doc and both windows are
    # totally ordered in any engine.
    cuts = spans.select(
        F.col("id2").alias("doc_id"),
        F.col("start2").alias("s"),
        (F.col("start2") + F.col("span_words")).alias("e"),
    ).distinct()
    w = Window.partitionBy("doc_id").orderBy("s", "e")
    merged = (
        cuts.withColumn(
            "pme",
            F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        )
        .withColumn(
            "flag",
            F.when(
                F.col("pme").isNull() | (F.col("s") > F.col("pme")), 1
            ).otherwise(0),
        )
        .withColumn(
            "island",
            F.sum("flag").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("doc_id", "island")
        .agg(F.min("s").alias("s"), F.max("e").alias("e"))
        .groupBy("doc_id")
        .agg(F.collect_list(F.struct("s", "e")).alias("cuts"))
    )
    all_docs = _substring_corpus(spark, sf_dir)
    return all_docs.join(merged, "doc_id", "left").select(
        "doc_id",
        F.coalesce(
            F.expr("aggregate(cuts, 0L, (a, r) -> a + r.e - r.s)"),
            F.lit(0).cast("long"),
        ).alias("n_removed"),
        F.when(F.col("cuts").isNull(), F.concat_ws(" ", "ws"))
        .otherwise(
            F.expr(
                "concat_ws(' ', filter(ws, (w, i) -> "
                "NOT exists(cuts, r -> i >= r.s AND i < r.e)))"
            )
        )
        .alias("text_dedup"),
    )


DECON_N = 13          # n-gram width: the GPT-3 / Llama-2 decontamination recipe
DECON_BENCH_MOD = 41  # doc_id % 41 == 0 -> held-out eval ("benchmark") doc


def decontaminate(
    spark: SparkSession,
    sf_dir: str,
    n: int = DECON_N,
    bench_mod: int = DECON_BENCH_MOD,
) -> DataFrame:
    """Benchmark decontamination: flag every TRAINING document that
    shares any n-word gram with the held-out eval set — the n-gram
    overlap rule used to scrub eval benchmarks out of LLM pretraining
    corpora (GPT-3 appendix C / Llama-2 style, 13-grams).

    Eval set: docs with doc_id % bench_mod == 0, over the same
    planted-span corpus as `substring_dup_spans` (so every qualifying
    benchmark doc has a training partner carrying a verbatim 40-word
    span of it -> 40 - n + 1 known matching gram positions).

    Plan (the 100 TB shape is the point):
      * both sides shingle map-side (hash inside one Catalyst
        projection, strings never leave the task);
      * the eval side is tiny and FIXED-SIZE at any corpus scale (a
        benchmark suite, not a corpus sample), so its distinct gram
        hashes BROADCAST to the training scan — the corpus-sized
        training gram table is never shuffled;
      * the hit aggregate is a map-side-combinable groupBy on doc_id
        over only the matched rows;
      * the per-doc gram totals re-join broadcast (hits are few), so
        the corpus stays Exchange-free end to end.

    The synthetic fixture derives the eval slice from the corpus table
    itself, which plans as a second (filtered) scan; a production run
    reads the benchmark suite from its own tiny table, so the corpus
    is scanned exactly once.

    Output, contaminated training docs only: (doc_id, n_hits =
    matching gram positions, n_hit_grams = distinct matching grams,
    n_total = gram positions in the doc, contam_frac).  xxhash64 join
    keys vs the oracle's string join: same two-implementation strategy
    as `substring_dup_spans`."""
    docs = (
        _substring_corpus(spark, sf_dir)
        .filter(F.size("ws") >= n)
        .select(
            "doc_id",
            "ws",
            (F.size("ws") - F.lit(n) + F.lit(1)).cast("long").alias("n_total"),
            (F.col("doc_id") % bench_mod == 0).alias("is_bench"),
        )
    )

    def _gram_hashes(df: DataFrame) -> DataFrame:
        return df.select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(ws) - {n}), i -> "
                    f"xxhash64(concat_ws(' ', slice(ws, i + 1, {n}))))"
                )
            ).alias("h"),
        )

    bench = _gram_hashes(docs.filter("is_bench")).select("h").distinct()
    hits = (
        _gram_hashes(docs.filter(~F.col("is_bench")))
        .join(F.broadcast(bench), "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.countDistinct("h").alias("n_hit_grams"),
        )
    )
    return docs.select("doc_id", "n_total").join(
        F.broadcast(hits), "doc_id"
    ).select(
        "doc_id",
        "n_hits",
        "n_hit_grams",
        "n_total",
        (F.col("n_hits") / F.col("n_total")).alias("contam_frac"),
    )


def temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based corpus mixing (alpha = 0.5, the XLM-R /
    multilingual-BERT exponent): languages are re-weighted q_l
    proportional to sqrt(c_l) and the corpus is downsampled to the
    mixed distribution at unchanged total budget — the standard
    low-resource-upweighting step of a multilingual LLM data pipeline
    (subsample-only variant: head languages shrink toward their mixed
    share, tail languages cap at keep-rate 1 rather than replicate).

    Determinism is integer-exact end to end so the DuckDB twin agrees
    bit-for-bit: per-row uniform u = (doc_id * 2654435761) % 2^32
    (Knuth multiplicative hash), weights w_l = floor(sqrt(c_l))
    (IEEE sqrt of an exact-below-2^52 integer, correctly rounded in
    both engines), and the keep test is the cross-multiplied integer
    inequality  u * S * c_l < 2^32 * w_l * B  (B = sum c, S = sum w;
    min(keep_rate, 1) falls out because u < 2^32).  No float sums
    whose accumulation order could differ between engines.  Fixture
    magnitudes keep every product below 2^63; a 10^12-row run would
    hold the same inequality in decimal/128-bit.

    Plan: one tiny groupBy(lang) + its scalar rollup, both broadcast
    back to the corpus scan — the corpus itself is filtered map-side,
    zero corpus-sized shuffles."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    cnt = (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "w", F.floor(F.sqrt(F.col("cnt").cast("double"))).cast("long")
        )
    )
    tot = cnt.agg(F.sum("cnt").alias("B"), F.sum("w").alias("S"))
    rates = cnt.crossJoin(F.broadcast(tot))
    u = (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)
    return (
        docs.join(F.broadcast(rates), "lang")
        .filter(
            u * F.col("S") * F.col("cnt")
            < F.lit(4294967296) * F.col("w") * F.col("B")
        )
        .select("doc_id", "lang")
    )


def temperature_resample_upsampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full XLM-R temperature resample (alpha = 0.5) WITH tail
    replication: each language's target row count is
    n_l = round(sqrt(c_l)/S * B) (B = corpus size, S = sum of integer
    sqrt weights), head languages are downsampled and tail languages
    UPSAMPLED by emitting (doc_id, lang, copy_idx) replicas — the half
    `temperature_resample` deliberately omits.

    Everything stays in integer arithmetic so the DuckDB twin agrees
    bit-for-bit: n_l = (2*w_l*B + S) div (2*S) (round-half-up without
    floats), per-doc copies = n_l div c_l plus one extra when
    u*c_l < (n_l mod c_l)*2^32 (u = Knuth hash of doc_id) — realized
    per-lang totals are n_l in expectation with binomial noise only on
    the fractional part.  Replicas materialize as a map-side
    explode(sequence(0, copies-1)); the per-lang plan (a handful of
    rows) broadcasts, so the corpus is never shuffled."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    cnt = (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "w", F.floor(F.sqrt(F.col("cnt").cast("double"))).cast("long")
        )
    )
    tot = cnt.agg(F.sum("cnt").alias("B"), F.sum("w").alias("S"))
    plan = cnt.crossJoin(F.broadcast(tot)).select(
        "lang",
        "cnt",
        F.expr("(2 * w * B + S) div (2 * S)").alias("target"),
    )
    u = (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)
    return (
        docs.join(F.broadcast(plan), "lang")
        .withColumn(
            "copies",
            F.expr("target div cnt")
            + F.when(
                u * F.col("cnt")
                < (F.col("target") % F.col("cnt")) * F.lit(4294967296),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .filter(F.col("copies") > 0)
        .select(
            "doc_id",
            "lang",
            F.explode(F.expr("sequence(0L, copies - 1)")).alias("copy_idx"),
        )
    )


def _minhash_coeffs(n_perm: int):
    """Deterministic well-mixed 31-bit (a, b) pairs — weak multipliers
    (2i+1) correlate the per-permutation minima and bias the estimate."""
    import numpy as np

    rng = np.random.default_rng(np.random.PCG64(11))
    a = [int(x) | 1 for x in rng.integers(1, 2**31 - 1, size=n_perm)]
    b = [int(x) for x in rng.integers(0, 2**31 - 1, size=n_perm)]
    return a, b


def minhash_signatures(
    spark: SparkSession, sf_dir: str, n_perm: int = 32
) -> DataFrame:
    """MinHash signatures over word-3-gram shingles.

    h_i(s) = (a_i * xxhash64(s) + b_i) mod p  — all inside the JVM
    (xxhash64 + arithmetic), no UDF.  Deterministic coefficient table.
    """
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    # p = 2^31-1 keeps a_i * x + b_i well inside int64 (ANSI mode errors
    # on overflow rather than wrapping)
    p = 2147483647
    # r6: no per-doc distinct before the min-aggregation — min() over a
    # multiset equals min() over its support, so duplicate shingles
    # cannot change any signature (bit-identical output, verified by
    # exceptAll both ways), and dropping the distinct removes the
    # full-width (doc_id, shingle-string) shuffle that dominated this
    # stage; what remains shuffles only map-side-combined partial
    # minima (one 32-column row per doc per map partition).
    hashed = _doc_shingle_hashes(docs, p)
    a, b = _minhash_coeffs(n_perm)
    aggs = [
        F.min(F.pmod(F.lit(a[i]) * F.col("x") + F.lit(b[i]), F.lit(p))).alias(f"mh{i}")
        for i in range(n_perm)
    ]
    return hashed.groupBy("doc_id").agg(*aggs)


def minhash_lsh_dup_pairs(
    spark: SparkSession, sf_dir: str, n_perm: int = 32, bands: int = 8
) -> DataFrame:
    """MinHash LSH candidate pairs: band the signature (bands x r),
    bucket-join on (band, banded-signature hash), estimate jaccard as
    matching-minhash fraction.  Dup plant as in trigram_jaccard_pairs."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    trunc = docs.select(
        (F.col("doc_id") + F.lit(1_000_000)).alias("doc_id"),
        F.concat_ws(
            " ",
            F.slice(_words(), 1, F.greatest(F.floor(F.size(_words()) * 0.8), F.lit(1)).cast("int")),
        ).alias("text"),
    )
    all_docs = docs.unionByName(trunc)

    # no per-doc distinct: see minhash_signatures (min over a multiset
    # == min over its support; removes the shingle-string shuffle)
    p = 2147483647
    hashed = _doc_shingle_hashes(all_docs, p)
    a, b = _minhash_coeffs(n_perm)
    aggs = [
        F.min(F.pmod(F.lit(a[i]) * F.col("x") + F.lit(b[i]), F.lit(p))).alias(f"mh{i}")
        for i in range(n_perm)
    ]
    # one signature row per doc (n_perm longs) but still corpus-
    # cardinality: DISK_ONLY so the band fan-out re-reads from local
    # disk instead of pinning executor memory at 100 TB
    sig = hashed.groupBy("doc_id").agg(*aggs).persist(StorageLevel.DISK_ONLY)

    r = n_perm // bands
    banded = None
    for b in range(bands):
        cols = [F.col(f"mh{b * r + k}") for k in range(r)]
        part = sig.select(
            "doc_id", F.lit(b).alias("band"), F.xxhash64(*cols).alias("bucket")
        )
        banded = part if banded is None else banded.unionByName(part)
    a = banded.alias("a")
    c = banded.alias("b")
    cand = (
        a.join(c, (F.col("a.band") == F.col("b.band")) & (F.col("a.bucket") == F.col("b.bucket")))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2"))
        .distinct()
    )
    s1 = sig.select(F.col("doc_id").alias("id1"), *[F.col(f"mh{i}").alias(f"a{i}") for i in range(n_perm)])
    s2 = sig.select(F.col("doc_id").alias("id2"), *[F.col(f"mh{i}").alias(f"b{i}") for i in range(n_perm)])
    match_frac = sum(
        (F.col(f"a{i}") == F.col(f"b{i}")).cast("int") for i in range(n_perm)
    ) / F.lit(float(n_perm))
    return (
        cand.join(s1, "id1").join(s2, "id2")
        .select("id1", "id2", match_frac.alias("est_jaccard"))
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
    checkpoint: str = "local",
) -> DataFrame:
    """Connected components by iterative min-label propagation:
    ``(v, component)`` where component = min vertex id reachable.

    Each round joins the (undirected) edge list with the current
    labels, takes the per-vertex neighborhood minimum, and stops at
    the fixpoint; raises if the fixpoint is not reached within
    ``max_iter`` label-changing rounds (never returns silently
    unconverged labels).  Ids may be any orderable type — integral
    ids use a cheap checksum convergence test, others a diff join.
    Rounds needed = max component eccentricity from its min-id vertex
    (<= diameter); one shuffle per round (edge-label
    join + groupBy vertex), labels are (id, id) pairs only, so state
    never exceeds one row per vertex.  Near-dup graphs are star-like
    (dups cluster around an original ⇒ diameter ~2), so this
    terminates in 2-3 rounds; for adversarial long-chain graphs swap
    in large-star/small-star (O(log n) rounds, same DataFrame ops).
    Skewed hub vertices in the groupBy are AQE's to split.

    ``checkpoint`` picks the lineage-truncation strategy:
    * ``"local"`` (default) — `localCheckpoint`: executor-local blocks,
      fastest, right for local mode / durable executors;
    * ``"reliable"`` — `.checkpoint()` to the sc checkpoint dir
      (`sc.setCheckpointDir` must have been called): survives executor
      loss, the right choice on a real multi-executor cluster.
    Both produce identical components (tested)."""
    # localCheckpoint (not cache) on every iteration frontier: caching
    # truncates physical RE-EXECUTION but the LOGICAL plan still grows
    # a full copy of the upstream lineage (here: the whole MinHash
    # pipeline) per round, and Catalyst re-analyzes it each time —
    # measured 6s -> 17s -> 42s per round at sf0.1 before this fix,
    # constant ~1s/round after.  On a multi-executor cluster prefer
    # `sc.setCheckpointDir` + `.checkpoint()` (survives executor loss);
    # the iteration structure is identical.
    # Checkpoint storage is MEMORY_AND_DISK: superseded rounds' blocks
    # are reclaimed by the ContextCleaner as the Python refs drop (we
    # del them promptly); worst-case residency is max_iter copies of
    # the 2-column vertex table, which spills rather than OOMs.
    if checkpoint == "local":
        def _ckpt(df: DataFrame, eager: bool = True) -> DataFrame:
            return df.localCheckpoint(eager=eager)
    elif checkpoint == "reliable":
        if not edges.sparkSession.sparkContext.getCheckpointDir():
            raise ValueError(
                "checkpoint='reliable' needs sc.setCheckpointDir(...) "
                "(an HDFS/object-store path on a real cluster)"
            )

        def _ckpt(df: DataFrame, eager: bool = True) -> DataFrame:
            return df.checkpoint(eager=eager)
    else:
        raise ValueError(f"unknown checkpoint strategy {checkpoint!r}")

    und = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    und = _ckpt(
        und.unionByName(
            und.select(F.col("d").alias("s"), F.col("s").alias("d"))
        ).distinct()
    )
    labels = _ckpt(
        und.select(F.col("s").alias("v")).distinct().withColumn(
            "comp", F.col("v")
        )
    )

    # Convergence check, one scan of the checkpointed frame per round:
    # for integral ids, a monotone checksum (labels only ever decrease
    # under min-propagation, so the exact decimal sum strictly
    # decreases until the fixpoint, and equal sums <=> no change); for
    # any other id type, a type-agnostic diff-join count.
    from pyspark.sql import types as T

    def _exact_summable(dt) -> bool:
        # scale>0 decimals would round under cast("decimal(38,0)"),
        # so a sub-granularity label change could leave the checksum
        # unchanged and falsely declare convergence
        if isinstance(dt, T.DecimalType):
            return dt.scale == 0
        return isinstance(dt, T.IntegralType)

    # check BOTH endpoint columns: after the unionByName the label
    # domain is src ∪ dst, and a non-integral dst (or a coercion to a
    # wider type) must route through the diff-join path
    integral = _exact_summable(edges.schema[src].dataType) and _exact_summable(
        edges.schema[dst].dataType
    )

    def _checksum(df: DataFrame):
        return df.agg(F.sum(F.col("comp").cast("decimal(38,0)"))).collect()[0][0]

    prev_sum = _checksum(labels) if integral else None
    # max_iter label-changing rounds + 1 confirming round: detecting
    # the fixpoint costs one extra (unchanged) round, which must not
    # eat into the propagation budget the docstring promises
    for _ in range(max_iter + 1):
        nbr = (
            und.join(labels, und.d == labels.v)
            .groupBy("s").agg(F.min("comp").alias("nbr_comp"))
        )
        # LAZY checkpoint (r6): the convergence check directly below is
        # the round's first action, so it materializes the checkpoint
        # blocks AND computes the checksum/diff in ONE Spark job — the
        # eager form paid a separate materialization job per round
        # (2 jobs/round -> 1; same blocks, same lineage truncation).
        new_labels = _ckpt(
            labels.alias("o")
            .join(nbr, F.col("o.v") == nbr.s, "left")
            .select(
                F.col("o.v").alias("v"),
                F.least(
                    F.col("o.comp"), F.coalesce("nbr_comp", F.col("o.comp"))
                ).alias("comp"),
            ),
            eager=False,
        )
        if integral:
            cur_sum = _checksum(new_labels)
            converged = cur_sum == prev_sum
            prev_sum = cur_sum
        else:
            converged = (
                new_labels.alias("n")
                .join(labels.alias("o"), "v")
                .filter(F.col("n.comp") != F.col("o.comp"))
                .count()
                == 0
            )
        del labels
        labels = new_labels
        if converged:
            return labels
    raise RuntimeError(
        f"connected_components: no fixpoint within max_iter={max_iter} "
        "rounds (a component's eccentricity exceeds the budget); raise "
        "max_iter or use connected_components_star (large-star/"
        "small-star, O(log n) rounds) for long-chain graphs — "
        "returning partial labels would silently mislabel clusters"
    )


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
    checkpoint: str = "local",
) -> DataFrame:
    """Connected components by alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond"):
    ``(v, component)`` with component = min vertex id, same contract
    as `connected_components`.

    Converges in O(log n) label-changing rounds regardless of graph
    DIAMETER — the variant to use when components can be long chains
    (min-label propagation needs eccentricity-many rounds there).
    Per round: two aggregate+join passes over the current edge set;
    edge count never grows (every edge maps to exactly one edge), so
    peak state = the input edge list.  Skewed hubs: the groupBy min
    is a partial-aggregatable min — map-side combine absorbs them.

    large-star(u): m = min(N(u) ∪ {u}); every LARGER neighbor v > u
    re-points to m — halves long chains.  small-star(u): m = min of
    the SMALLER-or-equal neighbors ∪ {u}; they and u all point to m —
    flattens local stars.  Fixpoint: the edge multiset is stable;
    checked with an order-independent exact checksum (sum of
    xxhash64(u, v) over distinct edges — collision-safe here because
    equal sums only confirm an already-monotone process).
    """
    if checkpoint == "local":
        def _ckpt(df: DataFrame, eager: bool = True) -> DataFrame:
            return df.localCheckpoint(eager=eager)
    elif checkpoint == "reliable":
        if not edges.sparkSession.sparkContext.getCheckpointDir():
            raise ValueError(
                "checkpoint='reliable' needs sc.setCheckpointDir(...)"
            )

        def _ckpt(df: DataFrame, eager: bool = True) -> DataFrame:
            return df.checkpoint(eager=eager)
    else:
        raise ValueError(f"unknown checkpoint strategy {checkpoint!r}")

    # checkpoint the raw edge list FIRST (r6): `verts` and `e` both
    # consume it, and without this the caller's entire upstream
    # pipeline (e.g. the MinHash candidate generation) re-executes
    # once per consumer — measured ~2 s per extra pass at sf0.1, and
    # a full corpus-scale re-read at 100 TB
    und = _ckpt(edges.select(F.col(src).alias("u"), F.col(dst).alias("v")))
    verts = _ckpt(
        und.select("u").unionByName(und.select(F.col("v").alias("u"))).distinct()
    )
    e = _ckpt(
        und.unionByName(und.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )

    def _sym(df: DataFrame) -> DataFrame:
        return (
            df.unionByName(df.select(F.col("v").alias("u"), F.col("u").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    def _checksum(df: DataFrame):
        # decimal(38,0) accumulator: summing ~2^63-range hashes in a
        # long overflows under ANSI mode
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("s"),
        ).collect()[0]
        return (row.n, row.s)

    prev = _checksum(e)
    for _ in range(max_iter + 1):
        # large star: (u,v) with v > u  ->  (v, m_u)
        mins = e.groupBy("u").agg(F.min("v").alias("mn"))
        mins = mins.select("u", F.least("u", "mn").alias("m"))
        ls = (
            e.filter(F.col("v") > F.col("u"))
            .join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        # LAZY checkpoints (r6): the round-ending checksum action below
        # materializes e2's blocks and, through e2's plan, e1's as
        # well — one Spark job per round where the eager form ran
        # three (e1 materialize, e2 materialize, checksum).
        e1 = _ckpt(_sym(ls), eager=False)
        # small star over edges oriented large -> small: (u,v), v <= u
        small = e1.filter(F.col("v") < F.col("u"))
        mins2 = small.groupBy("u").agg(F.min("v").alias("m"))
        ss = (
            small.join(mins2, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(mins2.select(F.col("u"), F.col("m").alias("v")))
        )
        e2 = _ckpt(_sym(ss), eager=False)
        del e
        e = e2
        cur = _checksum(e)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components_star: no fixpoint within {max_iter} rounds"
        )
    # stable edge set is a union of stars child -> root (root = min id)
    child = e.filter(F.col("v") < F.col("u")).select(
        F.col("u").alias("v"), F.col("v").alias("comp")
    )
    return verts.select(F.col("u").alias("v")).join(
        child, "v", "left"
    ).select("v", F.coalesce("comp", F.col("v")).alias("comp"))


def neardup_components(
    spark: SparkSession, sf_dir: str, min_jaccard: float = 0.5,
    algo: str = "prop",
) -> DataFrame:
    """Near-dup cluster ids: MinHash-LSH candidate pairs thresholded at
    ``min_jaccard``, then connected components — the step between pair
    generation and "keep one doc per cluster" in a dedup pipeline.
    Component id = min doc_id in the cluster (the canonical keeper).

    ``algo``: "prop" (min-label propagation — rounds = component
    eccentricity, right for the star-like dup graphs this produces) or
    "star" (large-star/small-star — O(log n) rounds regardless of
    diameter, the adversarial-chain-safe variant).  Identical labels
    either way (same oracle)."""
    pairs = minhash_lsh_dup_pairs(spark, sf_dir).filter(
        F.col("est_jaccard") >= min_jaccard
    )
    cc = connected_components if algo == "prop" else connected_components_star
    comp = cc(pairs, src="id1", dst="id2")
    return comp.select(F.col("v").alias("doc_id"), F.col("comp").alias("component"))


def neardup_components_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`neardup_components` via the large-star/small-star CC — same
    result set (shared DuckDB recursive-CTE oracle), exercising the
    O(log n)-round variant end to end."""
    return neardup_components(spark, sf_dir, algo="star")


def simhash64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document — one per-row fold, ZERO shuffles.

    The r01 version exploded every word hash into 64 (doc_id, bit) rows
    and shuffled them twice (64x row amplification on the hot path); at
    corpus scale that dominates the job.  Here the 64 bit-votes are
    accumulated inside a single aggregate() higher-order function per
    row: ones[b] = count of word hashes with bit b set, and bit b of
    the result is set iff 2*ones[b] > n_words (the +-1 vote sign).
    Bit-identical output (same xxhash64 word hashes, same sign rule),
    so the oracle sidecar is unchanged."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.select(
        "doc_id",
        F.size(_words()).alias("nw"),
        F.expr(
            "aggregate("
            "  transform(split(trim(text), '\\\\s+'), w -> xxhash64(w)),"
            "  array_repeat(0L, 64),"
            "  (acc, h) -> zip_with(acc, sequence(0, 63),"
            "                       (a, b) -> a + (shiftrightunsigned(h, b) & 1L)))"
        ).alias("ones"),
    )
    return base.select(
        "doc_id",
        F.expr(
            "aggregate("
            "  zip_with(ones, sequence(0, 63),"
            "           (o, b) -> if(2L * o > nw, shiftleft(1L, b), 0L)),"
            "  0L, (acc, x) -> acc + x)"
        ).alias("simhash"),
    )


# --------------------------------------------------------------- events

def event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 analog: per-user lag over ts; positive gap stats per user."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond diffs are integer-exact and timezone-free on naive
    # timestamps (second-granularity functions disagree across engines
    # on sub-second rounding vs boundary counting)
    gaps = ev.withColumn("prev_ts", F.lag("ts").over(w)).withColumn(
        "gap_us", F.expr("timestampdiff(MICROSECOND, prev_ts, ts)")
    )
    return gaps.filter(F.col("gap_us").isNotNull()).groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("gap_us").alias("sum_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
        F.sum((F.col("gap_us") > 3600 * 1000000).cast("int")).alias("n_gaps_gt_1h"),
    )


def event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(F.col("user_id")).alias("n_users"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


def event_sessions(
    spark: SparkSession, sf_dir: str, gap_minutes: int = 30
) -> DataFrame:
    """Gap-based sessionization (W-class): per-user sessions split where
    the inter-event gap reaches `gap_minutes`.

    Classic lag -> boundary-flag -> cumulative-sum session index, all
    window ops partitioned by user_id — one shuffle on the session key,
    scale-safe (state per user is a running int, never materialized).
    The boundary rule (new session when gap >= g, i.e. merge only when
    gap < g) matches Spark's built-in `session_window` semantics, so
    `streaming.stream_event_sessions` over the same input yields the
    same sessions (parity-tested in tests/test_streaming.py); this
    batch form is SQL-expressible for the exact DuckDB oracle.
    Microsecond integer arithmetic throughout (see event_gaps)."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 60_000_000 * gap_minutes
    flagged = ev.withColumn(
        "gap_us", F.expr("timestampdiff(MICROSECOND, lag(ts) OVER "
                         "(PARTITION BY user_id ORDER BY ts, event_id), ts)")
    ).withColumn(
        "new_sess",
        (F.col("gap_us").isNull() | (F.col("gap_us") >= gap_us)).cast("int"),
    )
    sess = flagged.withColumn("session_idx", F.sum("new_sess").over(w))
    return sess.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.expr("timestampdiff(MICROSECOND, min(ts), max(ts))").alias("duration_us"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    )


def weighted_median_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 (reference rotate_any_angle.py:96-104): weighted median —
    first value whose cumulative weight reaches half the group total.
    Two-pass: per-(group, value) weight sums (full hash parallelism),
    then the running-weight window over the distinct-value table only.
    Weights are small exact integers (event_id % 10 + 1) so cumulative
    float64 sums are order-independent and engine-exact."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events").withColumn(
        "wt", (F.col("event_id") % 10 + 1).cast("double")
    )
    # Two-pass exact form.  A window partitioned on event_type (~5
    # distinct values) over the RAW table funnels every row into 5
    # sort partitions — a single-task bottleneck at corpus scale.
    # Pass 1 instead aggregates weight per (event_type, value): full
    # hash parallelism, map-side combine, output cardinality = number
    # of DISTINCT values per group (tiny vs the corpus).  Pass 2 runs
    # the cumulative-weight window over that aggregated table only.
    # Identical results to the one-window form: the RANGE-frame window
    # already gave peer rows (equal values) the same cumulative
    # weight, which is exactly the per-value sum; integer-valued
    # float64 weights keep every sum order-independent and
    # engine-exact.  tests/test_plans.py asserts the full-table sort
    # is gone.
    per_value = ev.groupBy("event_type", "value").agg(F.sum("wt").alias("w"))
    cum_w = Window.partitionBy("event_type").orderBy("value")
    tot_w = Window.partitionBy("event_type")
    t = per_value.select(
        "event_type",
        "value",
        F.sum("w").over(cum_w).alias("cum"),
        F.sum("w").over(tot_w).alias("tot"),
    )
    return (
        t.filter(F.col("cum") >= F.col("tot") / 2.0)
        .groupBy("event_type")
        .agg(F.min("value").alias("weighted_median"))
    )


# ---------------------------------------------------------- TPC-H-ish

def lineitem_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 rollup analog (TPC-H Q1 shape) with decimal sums."""
    li = load(spark, sf_dir, "lineitem")
    d = lambda c: F.col(c).cast("decimal(18,4)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(d("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(d("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(
                (d("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - d("l_discount"))).cast(
                    "decimal(28,8)"
                )
            ).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def top_customers(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """Join + top-k (J2/A8 analog): customers by decimal order total."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    joined = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    return (
        joined.groupBy("c_custkey", "c_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double").alias("total_spent"),
        )
        .orderBy(F.desc("total_spent"), F.asc("c_custkey"))
        .limit(k)
    )


def discount_grid_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 grid-search argmax analog: best (qty_max, disc_min) cell by
    decimal revenue over a small parameter grid (crossJoin eval)."""
    li = load(spark, sf_dir, "lineitem")
    grid = spark.createDataFrame(
        [(q, d_ / 100.0) for q in (10, 20, 30, 40) for d_ in (2, 4, 6, 8)],
        ["qty_max", "disc_min"],
    )
    revenue = (
        li.crossJoin(F.broadcast(grid))
        .filter((F.col("l_quantity") < F.col("qty_max")) & (F.col("l_discount") >= F.col("disc_min")))
        .groupBy("qty_max", "disc_min")
        .agg(
            F.sum(
                (F.col("l_extendedprice").cast("decimal(18,4)") * F.col("l_discount").cast("decimal(18,4)")).cast(
                    "decimal(28,8)"
                )
            ).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    return revenue.orderBy(F.desc("revenue"), "qty_max", "disc_min").limit(1)
