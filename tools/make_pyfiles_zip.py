"""Package pytimetk_spark as a --py-files zip for spark-submit."""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def build(out: str = "dist/pytimetk_spark.zip") -> str:
    out_path = REPO / out
    out_path.parent.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted((REPO / "pytimetk_spark").rglob("*.py")):
            zf.write(py, py.relative_to(REPO))
    return str(out_path)


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else "dist/pytimetk_spark.zip"))
