#!/usr/bin/env python
"""Build dist/dragnet_spark.zip for spark-submit --py-files."""

from __future__ import annotations

import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> None:
    dist = REPO / "dist"
    dist.mkdir(exist_ok=True)
    out = dist / "dragnet_spark.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for f in sorted((REPO / "dragnet_spark").glob("*.py")):
            z.write(f, f"dragnet_spark/{f.name}")
    print(out)


if __name__ == "__main__":
    main()
