"""Build dist/json_schema_spark.zip for ``spark-submit --py-files``.

Pure-stdlib zip of the package tree (no wheels needed — the engine is
pure Python; executors only need the module importable).
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "json_schema_spark"
OUT = os.path.join(ROOT, "dist", f"{PKG}.zip")


def main() -> None:
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _, files in os.walk(os.path.join(ROOT, PKG)):
            if "__pycache__" in dirpath:
                continue
            for f in sorted(files):
                if f.endswith((".py", ".json", ".tsv.gz")):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, ROOT))
    print(OUT)


if __name__ == "__main__":
    main()
