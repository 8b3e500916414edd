"""Deployment-path smoke: the north rule mandates running via
``spark-submit --py-files`` with broadcast artifacts.  This test builds
qfilter.zip, then launches a REAL spark-submit subprocess whose cwd is
an empty temp dir — the only way the job can import qfilter is from the
shipped zip — and checks the labeled output parquet it writes.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PROBE = """
import json, sys
images_path, out_path = sys.argv[1], sys.argv[2]
from pyspark.sql import SparkSession
spark = (SparkSession.builder.appName("qfilter-submit-smoke")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
         .config("spark.sql.shuffle.partitions", "8")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from qfilter.features import with_all_features   # resolved from --py-files zip
from qfilter.cascade import with_labels
df = spark.read.parquet(images_path).limit(64)
labeled = with_labels(with_all_features(df))
labeled.select("image_id", "category", "reason", "keep").write.mode("overwrite").parquet(out_path)
n = spark.read.parquet(out_path).count()
print("QFILTER_SUBMIT_RESULT " + json.dumps({"rows": n}))
spark.stop()
"""


def _build_zip(path: str) -> None:
    with zipfile.ZipFile(path, "w") as zf:
        pkg = os.path.join(REPO, "qfilter")
        for fn in sorted(os.listdir(pkg)):
            if fn.endswith(".py"):
                zf.write(os.path.join(pkg, fn), arcname=f"qfilter/{fn}")


def test_spark_submit_py_files(smoke_dir):
    import pyspark

    submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    assert os.path.exists(submit)
    with tempfile.TemporaryDirectory(prefix="qfsubmit_") as td:
        zip_path = os.path.join(td, "qfilter.zip")
        _build_zip(zip_path)
        probe = os.path.join(td, "probe.py")
        with open(probe, "w") as f:
            f.write(_PROBE)
        out_dir = os.path.join(td, "labels_out")
        env = dict(os.environ)
        env.pop("PYTHONPATH", None)  # zip must be the only qfilter source
        env["PYSPARK_PYTHON"] = sys.executable
        env["PYSPARK_DRIVER_PYTHON"] = sys.executable
        proc = subprocess.run(
            [submit, "--master", "local[2]", "--py-files", zip_path, probe,
             os.path.join(smoke_dir, "images.parquet"), out_dir],
            cwd=td, env=env, capture_output=True, text=True, timeout=420,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        line = [ln for ln in proc.stdout.splitlines()
                if ln.startswith("QFILTER_SUBMIT_RESULT ")]
        assert line, proc.stdout[-2000:]
        assert json.loads(line[0].split(" ", 1)[1])["rows"] == 64


_ARTIFACT_PROBE = """
import json
from pyspark.sql import SparkSession
spark = (SparkSession.builder.appName("qfilter-artifact-smoke")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.sql.shuffle.partitions", "4")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from qfilter.features import with_scrubbed_caption
df = spark.createDataFrame(
    [("x1", "contact zzsecretzz now"), ("x2", "plain caption")],
    "image_id string, caption string",
)
rows = {r.image_id: (r.caption_scrubbed, r.tox_hits)
        for r in with_scrubbed_caption(df).collect()}
print("QFILTER_ARTIFACT_RESULT " + json.dumps(rows))
spark.stop()
"""


def test_spark_submit_files_artifacts(tmp_path):
    """North rule: model artifacts ship with --files and are loaded by
    executors. Proof: a scrub bundle modified to flag 'zzsecretzz' is
    shipped; the UDF only flags it if the SHIPPED bundle (not the
    built-in default) was loaded."""
    import pyspark

    from qfilter.textops import build_default_bundle, save_bundle

    submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    art = tmp_path / "artifacts"
    bundle = build_default_bundle()
    bundle.scrub.tox_words.append("zzsecretzz")  # marker absent from default
    save_bundle(bundle, str(art))
    zip_path = tmp_path / "qfilter.zip"
    _build_zip(str(zip_path))
    probe = tmp_path / "probe.py"
    probe.write_text(_ARTIFACT_PROBE)
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env.pop("QFILTER_BUNDLE_DIR", None)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    files = ",".join(str(art / f) for f in ("langid.npz", "lm.npz", "scrub.json"))
    proc = subprocess.run(
        [submit, "--master", "local[2]", "--py-files", str(zip_path),
         "--files", files, str(probe)],
        cwd=str(tmp_path), env=env, capture_output=True, text=True, timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [ln for ln in proc.stdout.splitlines()
            if ln.startswith("QFILTER_ARTIFACT_RESULT ")]
    assert line, proc.stdout[-2000:]
    rows = json.loads(line[0].split(" ", 1)[1])
    scrubbed, tox = rows["x1"]
    assert tox == 1 and "<TOX>" in scrubbed, rows  # shipped bundle applied
    assert rows["x2"][1] == 0


def test_partial_artifact_ship_fails_loudly(tmp_path, monkeypatch):
    """A partially shipped --files bundle must raise, not silently fall
    back to the built-in default (which would skip custom scrub terms)."""
    import pytest

    import qfilter.textops as textops

    (tmp_path / "scrub.json").write_text('{"pii": ["x"], "tox": ["y"]}')

    class _Files:
        @staticmethod
        def getRootDirectory():
            return str(tmp_path)

    import pyspark

    monkeypatch.setattr(pyspark, "SparkFiles", _Files)
    monkeypatch.setattr(textops, "_DEFAULT", None)
    monkeypatch.delenv("QFILTER_BUNDLE_DIR", raising=False)
    with pytest.raises(RuntimeError, match="partial artifact bundle"):
        textops.default_bundle()
    monkeypatch.setattr(textops, "_DEFAULT", None)  # don't poison the cache
