"""Build the --py-files zip for spark-submit deployment.

Writes /tmp/horizon_ocr_python_spark.zip containing the package — the
artifact a real cluster submit ships to executors.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = "/tmp/horizon_ocr_python_spark.zip"


def main() -> None:
    pkg = os.path.join(REPO, "horizon_ocr_python_spark")
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for name in sorted(files):
                if not name.endswith(".py"):
                    continue
                full = os.path.join(root, name)
                zf.write(full, os.path.relpath(full, REPO))
    print(OUT)


if __name__ == "__main__":
    main()
