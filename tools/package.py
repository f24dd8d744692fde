"""Build dist/catalogue_pipeline_spark.zip for spark-submit --py-files.

Usage:
    python tools/package.py
    spark-submit --py-files dist/catalogue_pipeline_spark.zip \
        --master <cluster> cli.py replay s3://…/binlog s3://…/transcripts \
        --checkpoints s3://…/ck --range-size 100000000 --mode delta

(cli.py = a 3-line shim: `from catalogue_pipeline_spark.__main__ import main;
main()` — __main__.py itself works for `python -m` local runs.)
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> str:
    dist = os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "catalogue_pipeline_spark.zip")
    pkg = os.path.join(REPO, "catalogue_pipeline_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for fn in sorted(files):
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    z.write(full, os.path.relpath(full, REPO))
    print(out)
    return out


if __name__ == "__main__":
    main()
