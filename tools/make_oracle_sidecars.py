"""Precompute pure-Python (no Spark) NLP outputs over the driver's
`documents` tables -> parquet sidecars used as oracle inputs.

The driver's correctness gate compares each Spark query against an
ANSI-SQL oracle.  For ops whose semantics live in our own models
(langid, BPE-ish token count, n-gram perplexity) the oracle is this
module's single-node run, persisted to parquet; the SQL just SELECTs
it.  Deterministic: same artifacts (`textops.default_bundle`) as the
executors load, same doubles bit-for-bit.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from qfilter.textops import default_bundle, text_heuristics  # noqa: E402

OUT_DIR = os.path.join(REPO, "oracle_out")


def build_for(sf_dir: str) -> str:
    bundle = default_bundle()
    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"]).to_pylist()
    rows = {"doc_id": [], "lang_pred": [], "token_count": [], "words_count": [],
            "perplexity": []}
    for d in docs:
        text = d["text"] or ""
        lang, _ = bundle.langid.predict(text)
        heur = text_heuristics(text)
        ppl = bundle.lm.perplexity(text)
        rows["doc_id"].append(d["doc_id"])
        rows["lang_pred"].append(lang)
        rows["token_count"].append(heur["token_count"])
        rows["words_count"].append(heur["words_count"])
        rows["perplexity"].append(float(ppl) if np.isfinite(ppl) else None)
    os.makedirs(OUT_DIR, exist_ok=True)
    name = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(OUT_DIR, f"docs_nlp_{name}.parquet")
    pq.write_table(pa.table(rows), path)
    return path


def ensure_sidecar(sf_dir: str) -> str:
    name = os.path.basename(os.path.normpath(sf_dir))
    return _ensure(os.path.join(OUT_DIR, f"docs_nlp_{name}.parquet"),
                   build_for, sf_dir, deps=("qfilter/textops.py",))


# ------------------------------------------------- xxhash64-based oracles
#
# These replicate corpus.simhash64 / corpus.minhash_lsh_dup_pairs — whose
# hashing runs JVM-side via F.xxhash64 — with the pure-Python XXH64 in
# oracle/xxh64.py (empirically proven identical to Spark's in
# tests/test_oracle_parity.py::test_xxh64_matches_spark).

import re  # noqa: E402

from oracle.xxh64 import (  # noqa: E402
    spark_xxhash64_long,
    spark_xxhash64_longs,
    spark_xxhash64_str,
)

_U64 = (1 << 64) - 1


def _spark_words(text: str) -> list[str]:
    """= F.split(F.trim(text), r'\\s+') — [''] for blank text."""
    return re.split(r"\s+", (text or "").strip())


def _read_docs(sf_dir: str):
    return pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).to_pylist()


def build_simhash(sf_dir: str) -> str:
    rows = {"doc_id": [], "simhash": []}
    for d in _read_docs(sf_dir):
        votes = [0] * 64
        for wrd in _spark_words(d["text"]):
            h = spark_xxhash64_str(wrd) & _U64
            for bit in range(64):
                votes[bit] += 1 if (h >> bit) & 1 else -1
        sh = 0
        for bit in range(64):
            if votes[bit] > 0:
                sh |= 1 << bit
        rows["doc_id"].append(d["doc_id"])
        # Spark sums shiftleft(1L, bit): bit 63 contributes Long.MIN
        rows["simhash"].append(sh - (1 << 64) if sh >> 63 else sh)
    name = os.path.basename(os.path.normpath(sf_dir))
    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, f"simhash_{name}.parquet")
    pq.write_table(pa.table(rows), path)
    return path


def _doc_shingle_hashes(docs: list[dict], p: int) -> dict[int, set]:
    """doc_id -> {pmod(xxhash64(shingle), p)} over distinct word-3-grams,
    incl. the 80%-truncated planted copies (id + 1e6)."""
    out = {}
    planted = []
    for d in docs:
        ws = _spark_words(d["text"])
        k = max(int(len(ws) * 0.8), 1)
        planted.append({"doc_id": d["doc_id"] + 1_000_000, "text": " ".join(ws[:k])})
    for d in list(docs) + planted:
        ws = _spark_words(d["text"])
        if len(ws) < 3:
            continue
        shingles = {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}
        out[d["doc_id"]] = {spark_xxhash64_str(s) % p for s in shingles}
    return out


def build_minhash_pairs(sf_dir: str, n_perm: int = 32, bands: int = 8) -> str:
    from qfilter.corpus import _minhash_coeffs

    p = 2147483647
    a, b = _minhash_coeffs(n_perm)
    sigs = {}
    for doc_id, xs in _doc_shingle_hashes(_read_docs(sf_dir), p).items():
        sigs[doc_id] = [min((a[i] * x + b[i]) % p for x in xs) for i in range(n_perm)]

    r = n_perm // bands
    buckets: dict[tuple, list] = {}
    for doc_id, sig in sigs.items():
        for band in range(bands):
            key = (band, spark_xxhash64_longs(sig[band * r : (band + 1) * r]))
            buckets.setdefault(key, []).append(doc_id)
    cand = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cand.add((ids[i], ids[j]))
    rows = {"id1": [], "id2": [], "est_jaccard": []}
    for id1, id2 in sorted(cand):
        s1, s2 = sigs[id1], sigs[id2]
        m = sum(1 for i in range(n_perm) if s1[i] == s2[i])
        rows["id1"].append(id1)
        rows["id2"].append(id2)
        rows["est_jaccard"].append(m / float(n_perm))
    name = os.path.basename(os.path.normpath(sf_dir))
    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, f"minhash_pairs_{name}.parquet")
    pq.write_table(pa.table(rows), path)
    return path


def build_lsh_ann(sf_dir: str, k: int = 5) -> str:
    """Replicates similarity.lsh_ann_topk: shared deterministic bucket
    fn, candidate union over tables, exact left-to-right-fold rerank."""
    from qfilter.similarity import LSH_TABLES, lsh_bucket_ids, lsh_planes_for_rows

    tbl = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids = tbl.column("vec_id").to_pylist()
    mat = np.asarray(
        [np.asarray(v, dtype=np.float64) for v in tbl.column("embedding").to_pylist()]
    )
    # adaptive plane count from the same corpus row count the Spark
    # side derives it from (len(mat) == the table count here)
    buckets = lsh_bucket_ids(mat, lsh_planes_for_rows(len(mat)))  # (n, L)
    byb: dict[tuple, list] = {}
    for row, vid in enumerate(ids):
        for t in range(LSH_TABLES):
            byb.setdefault((t, int(buckets[row, t])), []).append(row)
    cand = set()
    for rows_ in byb.values():
        for i in rows_:
            for j in rows_:
                if i != j:
                    cand.add((i, j))
    cand = sorted(cand)
    qi = np.array([c[0] for c in cand])
    ni = np.array([c[1] for c in cand])
    # exact same fold order as the Spark HOF aggregate: cumsum = strict
    # left-to-right sequential sum
    av, bv = mat[qi], mat[ni]
    dots = np.cumsum(av * bv, axis=1)[:, -1]
    na = np.sqrt(np.cumsum(av * av, axis=1)[:, -1])
    nb = np.sqrt(np.cumsum(bv * bv, axis=1)[:, -1])
    cos = dots / (na * nb)
    out = {"q": [], "rank": [], "n": []}
    order: dict[int, list] = {}
    for (i, j), c in zip(cand, cos):
        order.setdefault(i, []).append((c, ids[j]))
    for i, lst in order.items():
        lst.sort(key=lambda t: (-t[0], t[1]))
        for rank, (_, nid) in enumerate(lst[:k], start=1):
            out["q"].append(ids[i])
            out["rank"].append(rank)
            out["n"].append(nid)
    name = os.path.basename(os.path.normpath(sf_dir))
    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, f"lsh_ann_{name}.parquet")
    pq.write_table(
        pa.table(out, schema=pa.schema([("q", pa.int64()), ("rank", pa.int32()),
                                        ("n", pa.int64())])),
        path,
    )
    return path


def build_thumbs(fixture_dir: str, tw: int = 8, th: int = 8) -> str:
    """Replicates multimodal.image_thumbnail + md5 over the fixture
    images table (single-node run of the same codec path)."""
    import hashlib

    from qfilter import codecs
    from qfilter.multimodal import _block_mean_resize

    tbl = pq.read_table(
        os.path.join(fixture_dir, "images.parquet"),
        columns=["image_id", "bytes", "fmt", "w", "h"],
    ).to_pylist()
    rows = {"image_id": [], "thumb_md5": [], "tw": [], "th": []}
    for r in tbl:
        try:
            px = codecs.decode(r["bytes"], r["fmt"], int(r["w"]), int(r["h"]))
            thumb = codecs.encode(_block_mean_resize(px, tw, th), "png")
            md5 = hashlib.md5(thumb).hexdigest()
        except Exception:  # noqa: BLE001 — error rows: NULL md5 (Spark md5(NULL))
            md5 = None
        rows["image_id"].append(r["image_id"])
        rows["thumb_md5"].append(md5)
        rows["tw"].append(tw)
        rows["th"].append(th)
    os.makedirs(OUT_DIR, exist_ok=True)
    tier = os.path.basename(os.path.normpath(fixture_dir))
    path = os.path.join(OUT_DIR, f"thumbs_{tier}.parquet")
    pq.write_table(
        pa.table(rows, schema=pa.schema([("image_id", pa.string()),
                                         ("thumb_md5", pa.string()),
                                         ("tw", pa.int32()), ("th", pa.int32())])),
        path,
    )
    return path


def _ulaw_decode_table() -> np.ndarray:
    """256-entry G.711 mu-law decode table, built scalar-by-scalar from
    the segment formula — deliberately a DIFFERENT implementation than
    the vectorized bit-ops in qfilter/multimodal.py, so oracle parity
    on mu-law rows is a real two-implementation check."""
    tab = np.empty(256, dtype=np.int16)
    for byte in range(256):
        b = (~byte) & 0xFF
        exponent = (b >> 4) & 0x07
        mantissa = b & 0x0F
        mag = (((mantissa << 3) + 0x84) << exponent) - 0x84
        tab[byte] = -mag if (b & 0x80) else mag
    return tab


def _adpcm_decode_scalar(data: bytes) -> np.ndarray:
    """Plain per-sample IMA-ADPCM decoder — deliberately the scalar
    textbook loop, NOT the time-step-vectorized batch kernel in
    qfilter/multimodal.py, so ADPCM parity is a real two-
    implementation check."""
    import struct

    assert data[:4] == b"QADP"
    pred, idx, n = struct.unpack_from("<hBxI", data, 4)
    packed = np.frombuffer(data, dtype=np.uint8, offset=12)
    index_table = [-1, -1, -1, -1, 2, 4, 6, 8] * 2
    step_table = [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
        34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
        143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408,
        449, 494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282,
        1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327,
        3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630,
        9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500, 20350,
        22385, 24623, 27086, 29794, 32767,
    ]
    out = np.empty(n, dtype=np.int16)
    for t in range(n):
        byte = int(packed[t // 2])
        nib = byte & 0x0F if t % 2 == 0 else byte >> 4
        step = step_table[idx]
        vpdiff = step >> 3
        if nib & 4:
            vpdiff += step
        if nib & 2:
            vpdiff += step >> 1
        if nib & 1:
            vpdiff += step >> 2
        pred = pred - vpdiff if nib & 8 else pred + vpdiff
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + index_table[nib]))
        out[t] = pred
    return out


def build_audio_features() -> str:
    """Single-node oracle for `mm_audio_features`: same bytes
    (make_fixtures.synth_audio_rows), arithmetic transcribed from
    qfilter/multimodal.py:audio_features in the same operation order
    (identical float64 results bit-for-bit); mu-law rows decoded with
    the independent table above, ADPCM rows with the independent
    scalar loop above."""
    from make_fixtures import synth_audio_rows

    ulaw_tab = _ulaw_decode_table()
    rows = {"audio_id": [], "duration_s": [], "rms": [],
            "zero_crossings": [], "peak": []}
    for audio_id, pcm, sr, ch, fmt in synth_audio_rows():
        if fmt == "ulaw":
            x = ulaw_tab[np.frombuffer(pcm, dtype=np.uint8)].astype(
                np.float64) / 32768.0
        elif fmt == "adpcm_ima":
            x = _adpcm_decode_scalar(pcm).astype(np.float64) / 32768.0
        else:
            x = np.frombuffer(pcm, dtype="<i2").astype(np.float64) / 32768.0
        if ch > 1:
            x = x.reshape(-1, ch).mean(axis=1)
        rows["audio_id"].append(audio_id)
        rows["duration_s"].append(len(x) / float(sr))
        rows["rms"].append(float(np.sqrt(np.mean(x * x))) if len(x) else 0.0)
        rows["zero_crossings"].append(int(np.count_nonzero(np.diff(np.signbit(x)))))
        rows["peak"].append(float(np.abs(x).max()) if len(x) else 0.0)
    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, "audio_features_synth.parquet")
    pq.write_table(
        pa.table(rows, schema=pa.schema([
            ("audio_id", pa.string()), ("duration_s", pa.float64()),
            ("rms", pa.float64()), ("zero_crossings", pa.int64()),
            ("peak", pa.float64()),
        ])),
        path,
    )
    return path


def build_video_frames(every_n: int = 5) -> str:
    """Single-node oracle for `mm_video_frames`: same frame bytes
    (make_fixtures.synth_video_rows), per-sampled-frame gray mean/std
    transcribed from qfilter/multimodal.py:video_frame_features."""
    from make_fixtures import synth_video_rows

    rows = {"video_id": [], "frame_idx": [], "mean_brightness": [],
            "contrast": []}
    for video_id, frames, n, w, h in synth_video_rows():
        frame_sz = w * h * 3
        for fi in range(0, n, every_n):
            chunk = frames[fi * frame_sz : (fi + 1) * frame_sz]
            px = np.frombuffer(chunk, dtype=np.uint8).reshape(h, w, 3)
            f = px[..., 0] * 0.299 + px[..., 1] * 0.587 + px[..., 2] * 0.114
            g = np.clip(np.round(f), 0, 255).astype(np.uint8).astype(np.float64)
            rows["video_id"].append(video_id)
            rows["frame_idx"].append(fi)
            rows["mean_brightness"].append(float(g.mean()))
            rows["contrast"].append(float(g.std()))
    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, "video_frames_synth.parquet")
    pq.write_table(
        pa.table(rows, schema=pa.schema([
            ("video_id", pa.string()), ("frame_idx", pa.int32()),
            ("mean_brightness", pa.float64()), ("contrast", pa.float64()),
        ])),
        path,
    )
    return path


def build_lines(fixture_dir: str, min_len_ratio: float = 0.5) -> str:
    """Single-node oracle for `qf_line_features`: P13 detector
    (qfilter/enhance.py:detect_lines, reference line_cleaner.py:151-225)
    over the fixture images table."""
    from qfilter import codecs
    from qfilter.enhance import detect_lines
    from qfilter.imageops import grayscale

    tbl = pq.read_table(
        os.path.join(fixture_dir, "images.parquet"),
        columns=["image_id", "bytes", "fmt", "w", "h"],
    ).to_pylist()
    rows = {"image_id": [], "has_line": [], "line_orientation": [],
            "line_score": [], "n_line_boxes": []}
    for r in tbl:
        try:
            px = codecs.decode(r["bytes"], r["fmt"], int(r["w"]), int(r["h"]))
            d = detect_lines(grayscale(px), min_len_ratio=min_len_ratio)
            vals = (bool(d["has_line"]), d["orientation"],
                    float(d["score"]), len(d["bboxes"]))
        except Exception:  # noqa: BLE001 — error channel: same defaults as the UDF
            vals = (False, None, 0.0, 0)
        rows["image_id"].append(r["image_id"])
        rows["has_line"].append(vals[0])
        rows["line_orientation"].append(vals[1])
        rows["line_score"].append(vals[2])
        rows["n_line_boxes"].append(vals[3])
    os.makedirs(OUT_DIR, exist_ok=True)
    tier = os.path.basename(os.path.normpath(fixture_dir))
    path = os.path.join(OUT_DIR, f"lines_{tier}.parquet")
    pq.write_table(
        pa.table(rows, schema=pa.schema([
            ("image_id", pa.string()), ("has_line", pa.bool_()),
            ("line_orientation", pa.string()), ("line_score", pa.float64()),
            ("n_line_boxes", pa.int32()),
        ])),
        path,
    )
    return path


def build_enhance(fixture_dir: str) -> str:
    """Single-node oracle for `qf_enhance_stats`: P11/P14/P15 scalar
    summaries (qfilter/enhance.py:enhance_stats_one — the identical
    numpy code path, run without Spark) over the fixture images."""
    from qfilter import codecs
    from qfilter.enhance import enhance_stats_one

    tbl = pq.read_table(
        os.path.join(fixture_dir, "images.parquet"),
        columns=["image_id", "bytes", "fmt", "w", "h"],
    ).to_pylist()
    cols = ["deskew_deg", "lightened_mean", "lightened_bg_mean",
            "lightened_adv_mean", "delined_ink_frac"]
    rows = {"image_id": [], **{c: [] for c in cols}}
    for r in tbl:
        try:
            px = codecs.decode(r["bytes"], r["fmt"], int(r["w"]), int(r["h"]))
            s = enhance_stats_one(px)
        except Exception:  # noqa: BLE001
            s = {c: None for c in cols}
        rows["image_id"].append(r["image_id"])
        for c in cols:
            rows[c].append(s[c])
    os.makedirs(OUT_DIR, exist_ok=True)
    tier = os.path.basename(os.path.normpath(fixture_dir))
    path = os.path.join(OUT_DIR, f"enhance_{tier}.parquet")
    pq.write_table(
        pa.table(rows, schema=pa.schema([
            ("image_id", pa.string()),
            *[(c, pa.float64()) for c in cols],
        ])),
        path,
    )
    return path


def build_enhanced_bytes(fixture_dir: str) -> str:
    """Single-node oracle for `qf_enhanced_bytes` (the K5-analog
    transformed-bytes writeback): decode -> lighten -> re-encode via
    qfilter.enhance.enhanced_bytes_one, store the md5 of the re-encoded
    stream (the Spark query hashes with F.md5 — hex lowercase both)."""
    import hashlib

    from qfilter.enhance import enhanced_bytes_one

    tbl = pq.read_table(
        os.path.join(fixture_dir, "images.parquet"),
        columns=["image_id", "bytes", "fmt", "w", "h"],
    ).to_pylist()
    rows = {"image_id": [], "fmt": [], "enhanced_md5": []}
    for r in tbl:
        try:
            enc = enhanced_bytes_one(r["bytes"], r["fmt"], int(r["w"]), int(r["h"]))
            md5 = hashlib.md5(enc).hexdigest()
        except Exception:  # noqa: BLE001
            md5 = None
        rows["image_id"].append(r["image_id"])
        rows["fmt"].append(r["fmt"])
        rows["enhanced_md5"].append(md5)
    os.makedirs(OUT_DIR, exist_ok=True)
    tier = os.path.basename(os.path.normpath(fixture_dir))
    path = os.path.join(OUT_DIR, f"enhanced_bytes_{tier}.parquet")
    pq.write_table(
        pa.table(rows, schema=pa.schema([
            ("image_id", pa.string()), ("fmt", pa.string()),
            ("enhanced_md5", pa.string()),
        ])),
        path,
    )
    return path


def build_polish(fixture_dir: str) -> str:
    """Single-node oracle for `qf_polish_stats` — built from the
    INDEPENDENTLY-CODED twin (`oracle.imageref.polish_stats_ref`, not
    the production `qfilter.polish` kernels), so the driver parity
    compares two implementations end to end.  Subset crc32 % 5 == 0:
    the twin is deliberately slow machinery (~0.8 s/image)."""
    import zlib

    from oracle.imageref import polish_stats_ref
    from qfilter import codecs

    tbl = pq.read_table(
        os.path.join(fixture_dir, "images.parquet"),
        columns=["image_id", "bytes", "fmt", "w", "h"],
    ).to_pylist()
    cols = ["polished_mean", "polished_std", "edge_frac"]
    rows = {"image_id": [], **{c: [] for c in cols}}
    for r in tbl:
        if zlib.crc32(r["image_id"].encode("utf-8")) % 5 != 0:
            continue
        try:
            px = codecs.decode(r["bytes"], r["fmt"], int(r["w"]), int(r["h"]))
            s = polish_stats_ref(px)
        except Exception:  # noqa: BLE001
            s = {c: None for c in cols}
        rows["image_id"].append(r["image_id"])
        for c in cols:
            rows[c].append(s[c])
    os.makedirs(OUT_DIR, exist_ok=True)
    tier = os.path.basename(os.path.normpath(fixture_dir))
    path = os.path.join(OUT_DIR, f"polish_{tier}.parquet")
    pq.write_table(
        pa.table(rows, schema=pa.schema([
            ("image_id", pa.string()),
            *[(c, pa.float64()) for c in cols],
        ])),
        path,
    )
    return path


def build_ocr_prep(fixture_dir: str) -> str:
    """Single-node oracle for `qf_ocr_prep` (P8) — built from the
    independently-coded twin (`oracle.imageref.ocr_prep_ref`).
    Subset crc32 % 20 == 0: the op upscales every page to 1800 px."""
    import zlib

    from oracle.imageref import ocr_prep_ref
    from qfilter import codecs

    tbl = pq.read_table(
        os.path.join(fixture_dir, "images.parquet"),
        columns=["image_id", "bytes", "fmt", "w", "h"],
    ).to_pylist()
    rows = {"image_id": [], "prep_h": [], "prep_w": [], "white_frac": []}
    for r in tbl:
        if zlib.crc32(r["image_id"].encode("utf-8")) % 20 != 0:
            continue
        try:
            px = codecs.decode(r["bytes"], r["fmt"], int(r["w"]), int(r["h"]))
            s = ocr_prep_ref(px)
        except Exception:  # noqa: BLE001
            s = {"prep_h": None, "prep_w": None, "white_frac": None}
        rows["image_id"].append(r["image_id"])
        for c in ("prep_h", "prep_w", "white_frac"):
            rows[c].append(s[c])
    os.makedirs(OUT_DIR, exist_ok=True)
    tier = os.path.basename(os.path.normpath(fixture_dir))
    path = os.path.join(OUT_DIR, f"ocr_prep_{tier}.parquet")
    pq.write_table(
        pa.table(rows, schema=pa.schema([
            ("image_id", pa.string()), ("prep_h", pa.int32()),
            ("prep_w", pa.int32()), ("white_frac", pa.float64()),
        ])),
        path,
    )
    return path


def build_ivf_ann(sf_dir: str, k: int = 5) -> str:
    """Replicates similarity.ivf_ann_topk single-node: same sorted
    sample matrix -> same deterministic k-means centroids -> same
    fold-based assignment and exact left-to-right-fold rerank."""
    from qfilter.similarity import (
        IVF_NPROBE, _ivf_assign, ivf_fit_centroids, ivf_k_for_rows,
    )

    tbl = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids_raw = tbl.column("vec_id").to_pylist()
    order = np.argsort(np.asarray(ids_raw))
    ids = [ids_raw[i] for i in order]
    mat = np.asarray(
        [np.asarray(v, dtype=np.float64) for v in tbl.column("embedding").to_pylist()]
    )[order]
    # same adaptive K as the Spark side (len(mat) == the table count);
    # ivf_fit_centroids itself caps the training slice at IVF_SAMPLE_MAX
    cents = ivf_fit_centroids(mat, k=ivf_k_for_rows(len(mat)))
    probes = _ivf_assign(mat, cents, IVF_NPROBE)  # (n, nprobe)
    home = probes[:, 0]
    by_list: dict[int, list] = {}
    for row, lid in enumerate(home):
        by_list.setdefault(int(lid), []).append(row)
    cand = []
    for i in range(len(ids)):
        for lid in probes[i]:
            for j in by_list.get(int(lid), ()):
                if j != i:
                    cand.append((i, j))
    qi = np.array([c[0] for c in cand])
    ni = np.array([c[1] for c in cand])
    av, bv = mat[qi], mat[ni]
    dots = np.cumsum(av * bv, axis=1)[:, -1]
    na = np.sqrt(np.cumsum(av * av, axis=1)[:, -1])
    nb = np.sqrt(np.cumsum(bv * bv, axis=1)[:, -1])
    cos = dots / (na * nb)
    out = {"q": [], "rank": [], "n": []}
    per_q: dict[int, list] = {}
    for (i, j), c in zip(cand, cos):
        per_q.setdefault(i, []).append((c, ids[j]))
    for i, lst in per_q.items():
        lst.sort(key=lambda t: (-t[0], t[1]))
        for rank, (_, nid) in enumerate(lst[:k], start=1):
            out["q"].append(ids[i])
            out["rank"].append(rank)
            out["n"].append(nid)
    name = os.path.basename(os.path.normpath(sf_dir))
    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, f"ivf_ann_{name}.parquet")
    pq.write_table(
        pa.table(out, schema=pa.schema([
            ("q", pa.int64()), ("rank", pa.int32()), ("n", pa.int64()),
        ])),
        path,
    )
    return path


def model_weights_from_labels_ref(fixture_dir: str) -> tuple:
    """Train the qf_model_infer logistic regression single-node from the
    committed labels_ref table — the oracle twin of
    qfilter.model.train_from_features.  labels_ref's feature columns
    are bit-identical to the Spark-computed ones (hash-proven via
    qf_derived_features), the sort order matches orderBy(image_id),
    and fit_logreg is BLAS-free — so the weights are bit-identical."""
    from qfilter.model import fit_logreg

    X, y = _labels_ref_Xy(fixture_dir)
    return fit_logreg(X, y)


def _labels_ref_Xy(fixture_dir: str):
    """Shared sorted <=4096-row non-error sample with the derived
    feature columns — the single source for every model-oracle
    retrain below (bit-identical to the Spark-side sample: same rows,
    same order, hash-proven feature doubles)."""
    from qfilter.model import MODEL_FEATURES, TRAIN_SAMPLE_MAX

    df = (
        pq.read_table(os.path.join(fixture_dir, "labels_ref.parquet"))
        .to_pandas()
    )
    df = df[df["error"].isnull()].sort_values("image_id").head(TRAIN_SAMPLE_MAX)
    df = df.assign(
        conf_range=df.mean_ocr_conf - df.median_ocr_conf,
        blur_per_word=df.avg_blur / (df.words_count + 1.0),
        density_per_conf=df.text_density * df.median_ocr_conf,
        pct80_squared=df.pct80 * df.pct80,
        line_height_cv=df.line_height_var / (df.line_height_med + 1.0),
        line_spacing_cv=df.line_spacing_var / (df.line_spacing_med + 1.0),
    )
    X = df[MODEL_FEATURES].to_numpy(dtype=np.float64)
    y = df["keep"].to_numpy(dtype=np.float64)
    return X, y


def model_cv_weights_from_labels_ref(fixture_dir: str, k: int = 5) -> list:
    """Oracle twin of qfilter.model.cv_models_from_features: same
    sorted <=4096-row non-error sample, fold = position % k, model f
    trained on every other fold — bit-identical weights (same rows,
    same order, BLAS-free fit)."""
    from qfilter.model import fit_logreg

    X, y = _labels_ref_Xy(fixture_dir)
    folds = np.arange(len(X)) % k
    return [fit_logreg(X[folds != f], y[folds != f]) for f in range(k)]


def gb_cv_weights_from_labels_ref(fixture_dir: str, k: int = 5) -> list:
    """Oracle twin of qfilter.model.gb_cv_models_from_features (the
    second model family, GB stumps) — same sample, same folds, same
    deterministic trainer, so stump (feature, threshold, leaf-value)
    arrays are bit-identical."""
    from qfilter.model import fit_gb_stumps

    X, y = _labels_ref_Xy(fixture_dir)
    folds = np.arange(len(X)) % k
    return [fit_gb_stumps(X[folds != f], y[folds != f]) for f in range(k)]


def rf_cv_weights_from_labels_ref(fixture_dir: str, k: int = 5) -> list:
    """Oracle twin of qfilter.model.rf_cv_models_from_features."""
    from qfilter.model import fit_rf_lite

    X, y = _labels_ref_Xy(fixture_dir)
    folds = np.arange(len(X)) % k
    return [fit_rf_lite(X[folds != f], y[folds != f]) for f in range(k)]


def svm_cv_weights_from_labels_ref(fixture_dir: str, k: int = 5) -> list:
    """Oracle twin of qfilter.model.svm_cv_models_from_features."""
    from qfilter.model import fit_svm_linear

    X, y = _labels_ref_Xy(fixture_dir)
    folds = np.arange(len(X)) % k
    return [fit_svm_linear(X[folds != f], y[folds != f]) for f in range(k)]


def svm_rff_cv_weights_from_labels_ref(fixture_dir: str, k: int = 5) -> list:
    """Oracle twin of qfilter.model.svm_rff_cv_models_from_features
    (the RBF-kernel SVC via random Fourier features)."""
    from qfilter.model import fit_svm_rff

    X, y = _labels_ref_Xy(fixture_dir)
    folds = np.arange(len(X)) % k
    return [fit_svm_rff(X[folds != f], y[folds != f]) for f in range(k)]


def zoo_cv_cache(fixture_dir: str, k: int = 5) -> dict:
    """All five zoo families' per-fold models, retrained from
    labels_ref once and cached as a dep-hashed JSON sidecar (floats
    via repr — exact round-trip; no pickled code).  Saves ~3 minutes
    per oracle_sql() build; a qfilter/model.py edit auto-invalidates."""
    import json

    tier = os.path.basename(os.path.normpath(fixture_dir))
    path = os.path.join(OUT_DIR, f"zoo_cv_{tier}.json")
    meta = path + ".deps.json"
    deps = (_SELF_DEP, "qfilter/model.py", "tools/make_fixtures.py")
    want = _dep_hash(deps)
    if os.path.exists(path) and os.path.exists(meta):
        try:
            with open(meta) as f:
                if json.load(f)["sha256"] == want:
                    with open(path) as f:
                        raw = json.load(f)
                    return _zoo_cache_decode(raw)
        except Exception:  # noqa: BLE001 — corrupt cache -> rebuild
            pass
    lr = model_cv_weights_from_labels_ref(fixture_dir, k=k)
    gb = gb_cv_weights_from_labels_ref(fixture_dir, k=k)
    rf = rf_cv_weights_from_labels_ref(fixture_dir, k=k)
    svm = svm_rff_cv_weights_from_labels_ref(fixture_dir, k=k)
    raw = {
        "lr": [[list(map(float, w)), float(b)] for w, b in lr],
        "gb": [
            {
                "f0": float(m["f0"]),
                "feat": [int(x) for x in m["feat"]],
                "thr": [float(x) for x in m["thr"]],
                "val_l": [float(x) for x in m["val_l"]],
                "val_r": [float(x) for x in m["val_r"]],
                "gain": [float(x) for x in m["gain"]],
            }
            for m in gb
        ],
        "rf": [
            [
                {
                    "feat": int(t["feat"]), "thr": float(t["thr"]),
                    "l": [float(x) for x in t["l"]],
                    "r": [float(x) for x in t["r"]],
                    "gains": [[int(j), float(g)] for j, g in t["gains"]],
                }
                for t in forest
            ]
            for forest in rf
        ],
        "svm_rff": [
            {
                "mu": [float(x) for x in m["mu"]],
                "sd": [float(x) for x in m["sd"]],
                "W": [[float(x) for x in row] for row in m["W"]],
                "B": [float(x) for x in m["B"]],
                "scale": float(m["scale"]),
                "w": [float(x) for x in m["w"]],
                "b": float(m["b"]),
            }
            for m in svm
        ],
    }
    os.makedirs(OUT_DIR, exist_ok=True)
    with open(path, "w") as f:
        json.dump(raw, f)
    with open(meta, "w") as f:
        json.dump({"sha256": want, "deps": list(deps)}, f, indent=1)
    return _zoo_cache_decode(raw)


def _zoo_cache_decode(raw: dict) -> dict:
    return {
        "lr": [(np.asarray(w, dtype=np.float64), float(b)) for w, b in raw["lr"]],
        "gb": [
            {
                "f0": float(m["f0"]),
                "feat": np.asarray(m["feat"], dtype=np.int64),
                "thr": np.asarray(m["thr"], dtype=np.float64),
                "val_l": np.asarray(m["val_l"], dtype=np.float64),
                "val_r": np.asarray(m["val_r"], dtype=np.float64),
                "gain": np.asarray(m["gain"], dtype=np.float64),
            }
            for m in raw["gb"]
        ],
        "rf": [
            [
                {
                    "feat": int(t["feat"]), "thr": float(t["thr"]),
                    "l": tuple(t["l"]), "r": tuple(t["r"]),
                    "gains": [(int(j), float(g)) for j, g in t["gains"]],
                }
                for t in forest
            ]
            for forest in raw["rf"]
        ],
        "svm_rff": [
            {
                "mu": np.asarray(m["mu"], dtype=np.float64),
                "sd": np.asarray(m["sd"], dtype=np.float64),
                "W": np.asarray(m["W"], dtype=np.float64),
                "B": np.asarray(m["B"], dtype=np.float64),
                "scale": float(m["scale"]),
                "w": np.asarray(m["w"], dtype=np.float64),
                "b": float(m["b"]),
            }
            for m in raw["svm_rff"]
        ],
    }


_SELF_DEP = "tools/make_oracle_sidecars.py"


def _dep_hash(dep_files: tuple[str, ...]) -> str:
    import hashlib

    h = hashlib.sha256()
    for rel in dep_files:
        h.update(rel.encode())
        h.update(b"\0")
        with open(os.path.join(REPO, rel), "rb") as f:
            h.update(f.read())
        h.update(b"\0")
    return h.hexdigest()


def _ensure(path: str, builder, *args, deps: tuple[str, ...] = ()) -> str:
    """Build the sidecar unless it exists AND its recorded dependency
    hash (kernel sources + this tool) matches — a kernel change
    regenerates the single-node oracle automatically instead of failing
    loudly at parity-compare time with a stale committed sidecar."""
    import json

    dep_files = (_SELF_DEP, *deps)
    want = _dep_hash(dep_files)
    meta = path + ".deps.json"
    if os.path.exists(path) and os.path.exists(meta):
        try:
            with open(meta) as f:
                if json.load(f)["sha256"] == want:
                    return path
        except Exception:  # noqa: BLE001 — corrupt meta -> rebuild
            pass
    builder(*args)
    with open(meta, "w") as f:
        json.dump({"sha256": want, "deps": list(dep_files)}, f, indent=1)
    return path


_IMG_DEPS = ("qfilter/enhance.py", "qfilter/imageops.py", "qfilter/codecs.py",
             "tools/make_fixtures.py")


def ensure_sidecar_lines(fixture_dir: str) -> str:
    tier = os.path.basename(os.path.normpath(fixture_dir))
    return _ensure(os.path.join(OUT_DIR, f"lines_{tier}.parquet"),
                   build_lines, fixture_dir, deps=_IMG_DEPS)


def ensure_sidecar_polish(fixture_dir: str) -> str:
    tier = os.path.basename(os.path.normpath(fixture_dir))
    return _ensure(
        os.path.join(OUT_DIR, f"polish_{tier}.parquet"),
        build_polish, fixture_dir,
        deps=("qfilter/polish.py", "oracle/imageref.py", *_IMG_DEPS),
    )


def ensure_sidecar_ocr_prep(fixture_dir: str) -> str:
    tier = os.path.basename(os.path.normpath(fixture_dir))
    return _ensure(
        os.path.join(OUT_DIR, f"ocr_prep_{tier}.parquet"),
        build_ocr_prep, fixture_dir,
        deps=("qfilter/ocrprep.py", "qfilter/polish.py", "oracle/imageref.py",
              *_IMG_DEPS),
    )


def ensure_sidecar_enhance(fixture_dir: str) -> str:
    tier = os.path.basename(os.path.normpath(fixture_dir))
    return _ensure(os.path.join(OUT_DIR, f"enhance_{tier}.parquet"),
                   build_enhance, fixture_dir, deps=_IMG_DEPS)


def build_orientation(fixture_dir: str) -> str:
    """Single-node oracle for `qf_orientation` (P17/P18 heuristic):
    qfilter.enhance.orientation_one run without Spark over the same
    fixture bytes and planted rotations."""
    from qfilter import codecs
    from qfilter.enhance import orientation_one

    tbl = pq.read_table(
        os.path.join(fixture_dir, "images.parquet"),
        columns=["image_id", "bytes", "fmt", "w", "h"],
    ).to_pylist()
    rows = {"image_id": [], "planted_deg": [], "detected_deg": [], "recovered": []}
    for r in tbl:
        try:
            px = codecs.decode(r["bytes"], r["fmt"], int(r["w"]), int(r["h"]))
            s = orientation_one(px, str(r["image_id"]))
        except Exception:  # noqa: BLE001
            s = {"planted_deg": None, "detected_deg": None, "recovered": None}
        rows["image_id"].append(r["image_id"])
        rows["planted_deg"].append(s["planted_deg"])
        rows["detected_deg"].append(s["detected_deg"])
        rows["recovered"].append(s["recovered"])
    os.makedirs(OUT_DIR, exist_ok=True)
    tier = os.path.basename(os.path.normpath(fixture_dir))
    path = os.path.join(OUT_DIR, f"orientation_{tier}.parquet")
    pq.write_table(
        pa.table(rows, schema=pa.schema([
            ("image_id", pa.string()), ("planted_deg", pa.int32()),
            ("detected_deg", pa.int32()), ("recovered", pa.bool_()),
        ])),
        path,
    )
    return path


def ensure_sidecar_orientation(fixture_dir: str) -> str:
    tier = os.path.basename(os.path.normpath(fixture_dir))
    return _ensure(os.path.join(OUT_DIR, f"orientation_{tier}.parquet"),
                   build_orientation, fixture_dir, deps=_IMG_DEPS)


def ensure_sidecar_enhanced_bytes(fixture_dir: str) -> str:
    tier = os.path.basename(os.path.normpath(fixture_dir))
    return _ensure(os.path.join(OUT_DIR, f"enhanced_bytes_{tier}.parquet"),
                   build_enhanced_bytes, fixture_dir, deps=_IMG_DEPS)


def ensure_sidecar_simhash(sf_dir: str) -> str:
    name = os.path.basename(os.path.normpath(sf_dir))
    return _ensure(os.path.join(OUT_DIR, f"simhash_{name}.parquet"),
                   build_simhash, sf_dir, deps=("oracle/xxh64.py",))


def ensure_sidecar_minhash_pairs(sf_dir: str) -> str:
    name = os.path.basename(os.path.normpath(sf_dir))
    return _ensure(os.path.join(OUT_DIR, f"minhash_pairs_{name}.parquet"),
                   build_minhash_pairs, sf_dir, deps=("oracle/xxh64.py",))


def ensure_sidecar_lsh_ann(sf_dir: str) -> str:
    name = os.path.basename(os.path.normpath(sf_dir))
    return _ensure(os.path.join(OUT_DIR, f"lsh_ann_{name}.parquet"),
                   build_lsh_ann, sf_dir, deps=("qfilter/similarity.py",))


def ensure_sidecar_ivf_ann(sf_dir: str) -> str:
    name = os.path.basename(os.path.normpath(sf_dir))
    return _ensure(os.path.join(OUT_DIR, f"ivf_ann_{name}.parquet"),
                   build_ivf_ann, sf_dir, deps=("qfilter/similarity.py",))


def ensure_sidecar_thumbs(fixture_dir: str) -> str:
    tier = os.path.basename(os.path.normpath(fixture_dir))
    return _ensure(os.path.join(OUT_DIR, f"thumbs_{tier}.parquet"),
                   build_thumbs, fixture_dir,
                   deps=("qfilter/multimodal.py", "qfilter/codecs.py",
                         "tools/make_fixtures.py"))


def ensure_sidecar_audio() -> str:
    return _ensure(os.path.join(OUT_DIR, "audio_features_synth.parquet"),
                   build_audio_features,
                   deps=("qfilter/multimodal.py", "tools/make_fixtures.py"))


def ensure_sidecar_video() -> str:
    return _ensure(os.path.join(OUT_DIR, "video_frames_synth.parquet"),
                   build_video_frames,
                   deps=("qfilter/multimodal.py", "tools/make_fixtures.py"))


if __name__ == "__main__":
    for sf in sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
                               "/root/testdata/sf0.1"]:
        print(build_for(sf))
        print(build_simhash(sf))
        print(build_minhash_pairs(sf))
        print(build_lsh_ann(sf))
        print(build_ivf_ann(sf))
    # fixture-table sidecars (smoke tier is the driver gate's)
    from make_fixtures import ensure_fixtures

    fdir = ensure_fixtures("smoke")
    print(build_thumbs(fdir))
    print(build_lines(fdir))
    print(build_enhance(fdir))
    print(build_audio_features())
    print(build_video_frames())
