#!/usr/bin/env python
"""Build engine.zip for ``spark-submit --py-files engine.zip job.py``."""

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(out="engine.zip"):
    out_path = os.path.join(ROOT, out)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg = os.path.join(ROOT, "archive_pdf_tools_spark")
        for dirpath, _dirs, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in files:
                # .c: compiled-kernel source (kernels/native) — read
                # through zipimport + importlib.resources on executors
                if fn.endswith((".py", ".c")):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, ROOT))
    print(out_path)


if __name__ == "__main__":
    main()
