"""Package the engine for cluster submission:

    python scripts/make_pyfiles.py [outdir]   # -> outdir/er_spark.zip

    spark-submit --py-files er_spark.zip scripts/submit_pipeline.py \
        --stage all --warehouse hdfs://.../er_wh --entities 1000000

The zip contains only the package sources (no tests/bench); the driver
script `scripts/submit_pipeline.py` is shipped alongside, not inside.
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PKG = REPO / "entity_resolution_pipeline_spark"


def build(outdir: Path) -> Path:
    outdir.mkdir(parents=True, exist_ok=True)
    out = outdir / "er_spark.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted(PKG.rglob("*.py")):
            z.write(p, p.relative_to(REPO))
    return out


if __name__ == "__main__":
    dest = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / "dist"
    print(build(dest))
