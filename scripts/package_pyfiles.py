"""Package tantivy_spark for cluster submission:
``python scripts/package_pyfiles.py [out_zip]`` writes a zip importable
via ``spark-submit --py-files`` (north rule: the build runs via
spark-submit --py-files on multi-executor clusters).

Usage on a cluster:
    python scripts/package_pyfiles.py dist/tantivy_spark.zip
    spark-submit --py-files dist/tantivy_spark.zip \\
        scripts/build_index_submit.py <input_parquet> <index_dir> \\
        [--key-col url] [--text-col text] [--n-segments 128]
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(out_path: str) -> str:
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    pkg = os.path.join(REPO, "tantivy_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.join(REPO, "dist", "tantivy_spark.zip")
    print(build_zip(out))
