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
    path = os.path.join(OUT_DIR, f"docs_nlp_{name}.parquet")
    if not os.path.exists(path):
        build_for(sf_dir)
    return path


if __name__ == "__main__":
    for sf in sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
                               "/root/testdata/sf0.1"]:
        print(build_for(sf))
