"""Build dist/naer_spark.zip for spark-submit --py-files.

Usage: python tools/package.py
"""

from __future__ import annotations

import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
PKG = "named_architecture_entity_recognition_spark"


def main():
    dist = REPO / "dist"
    dist.mkdir(exist_ok=True)
    out = dist / "naer_spark.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted((REPO / PKG).rglob("*.py")):
            zf.write(py, py.relative_to(REPO))
    print(out)


if __name__ == "__main__":
    main()
