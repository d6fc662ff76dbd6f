"""Package the engine for spark-submit --py-files (north_rule run mode).

Usage: python scripts/make_pyfiles.py
Emits dist/parquet_producers_spark.zip; submit e.g.:

    spark-submit --py-files dist/parquet_producers_spark.zip \
        --conf spark.sql.adaptive.enabled=true \
        your_job.py
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    os.makedirs(os.path.join(ROOT, "dist"), exist_ok=True)
    out = os.path.join(ROOT, "dist", "parquet_producers_spark.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(ROOT, "parquet_producers_spark")
        for r, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(r, f)
                    z.write(full, os.path.relpath(full, ROOT))
    print(out)


if __name__ == "__main__":
    main()
