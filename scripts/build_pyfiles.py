"""Build engine.zip for `spark-submit --py-files engine.zip` deployment
(north rule: 'run via spark-submit --py-files on a multi-executor cluster').

    python scripts/build_pyfiles.py [out.zip]
    spark-submit --py-files engine.zip --master yarn \
        -m sfr_ingest_pipeline_spark.cli replay --binlog ... --table ...
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str) -> int:
    n = 0
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "sfr_ingest_pipeline_spark")
        for dirpath, _dirs, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(files):
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, REPO))
                    n += 1
    return n


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "engine.zip")
    n = build(out)
    print(f"{out}: {n} modules")
