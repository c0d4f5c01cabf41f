"""Build the --py-files artifact for spark-submit (north_rule shipping).

    python scripts/package.py [out.zip]      # default /tmp/engine.zip

Zips the ``ebook_conversion_to_text_for_machine_learning_spark`` package
(sources only) so it can ship to executors with::

    spark-submit --py-files engine.zip \
        ebook_conversion_to_text_for_machine_learning_spark/plans/job.py ...
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PACKAGE = "ebook_conversion_to_text_for_machine_learning_spark"


def build(out_path: str) -> str:
    root = os.path.join(REPO, PACKAGE)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(root):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for name in sorted(filenames):
                if not name.endswith(".py"):
                    continue
                full = os.path.join(dirpath, name)
                zf.write(full, os.path.relpath(full, REPO))
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/engine.zip"
    print(build(out))
