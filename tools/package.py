"""Build dist/mindocr_spark.zip for spark-submit --py-files."""

from __future__ import annotations

import pathlib
import zipfile


def build(repo_root: str = ".") -> str:
    root = pathlib.Path(repo_root).resolve()
    dist = root / "dist"
    dist.mkdir(exist_ok=True)
    out = dist / "mindocr_spark.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for p in sorted((root / "mindocr_spark").rglob("*.py")):
            zf.write(p, p.relative_to(root))
    return str(out)


if __name__ == "__main__":
    print(build())
