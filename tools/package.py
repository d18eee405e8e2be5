#!/usr/bin/env python3
"""Build dist/stl_decomp_4j_spark.zip for spark-submit --py-files."""
from __future__ import annotations

import zipfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
PKG = ROOT / "stl_decomp_4j_spark"
DIST = ROOT / "dist"


def main() -> None:
    DIST.mkdir(exist_ok=True)
    out = DIST / "stl_decomp_4j_spark.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted(PKG.rglob("*.py")):
            z.write(p, p.relative_to(ROOT))
    print(out)


if __name__ == "__main__":
    main()
