#!/usr/bin/env python
"""Build dist/readur_spark.zip for spark-submit --py-files.

Zips the readur_spark package (sources only) so executors can import
the kernels/operators; the job script itself is passed as the
application file.
"""

from __future__ import annotations

import os
import zipfile

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO_ROOT, "dist", "readur_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg = os.path.join(REPO_ROOT, "readur_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO_ROOT))
    return out_path


if __name__ == "__main__":
    print(build())
