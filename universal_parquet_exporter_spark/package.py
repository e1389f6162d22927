"""Build the ``--py-files`` zip for spark-submit launches (BASELINE.md
launch mode; north rule: "run via spark-submit --py-files on a
multi-executor cluster").

Usage::

    python -m universal_parquet_exporter_spark.package [out.zip]
    spark-submit --py-files engine.zip bench.py
"""

from __future__ import annotations

import os
import sys
import zipfile


def build_zip(out_path: str = "engine.zip") -> str:
    pkg_root = os.path.dirname(os.path.abspath(__file__))
    repo_root = os.path.dirname(pkg_root)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg_root):
            if "__pycache__" in dirpath:
                continue
            for fn in filenames:
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, repo_root)
                zf.write(full, rel)
        entry = os.path.join(repo_root, "__spark_entry__.py")
        if os.path.exists(entry):
            zf.write(entry, "__spark_entry__.py")
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "engine.zip"
    print(build_zip(out))
