#!/usr/bin/env python
"""Build the spark-submit --py-files archive for the engine.

Produces a deterministic zip (sorted member order, fixed timestamps, no
bytecode) of the ``dataflow_opinion_analysis_spark`` package, the unit a
cluster deployment ships:

    python scripts/make_pyfiles_zip.py [--out dist/dataflow_opinion_analysis_spark.zip]
    spark-submit --master <cluster> \
        --py-files dist/dataflow_opinion_analysis_spark.zip \
        scripts/submit_cli.py index --input ... --output ...

Determinism matters operationally: the same source tree always yields a
byte-identical artifact, so a content hash identifies the deployed code
version (per-partition lineage records can cite it).
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "dataflow_opinion_analysis_spark"

# fixed timestamp => byte-identical zip for identical sources
_EPOCH = (1980, 1, 1, 0, 0, 0)


def build_zip(out_path: str, repo: str = REPO) -> str:
    """Write the package zip to out_path; returns its sha256 hex digest."""
    pkg_root = os.path.join(repo, PKG)
    members: list[tuple[str, str]] = []  # (arcname, abspath)
    for dirpath, dirnames, filenames in os.walk(pkg_root):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if not fn.endswith(".py"):
                continue
            ap = os.path.join(dirpath, fn)
            arc = os.path.relpath(ap, repo)
            members.append((arc, ap))
    os.makedirs(os.path.dirname(os.path.abspath(out_path)) or ".", exist_ok=True)
    with zipfile.ZipFile(out_path, "w", compression=zipfile.ZIP_DEFLATED) as zf:
        for arc, ap in members:
            with open(ap, "rb") as f:
                data = f.read()
            info = zipfile.ZipInfo(arc, date_time=_EPOCH)
            info.external_attr = 0o644 << 16
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, data)
    h = hashlib.sha256()
    with open(out_path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--out", default=os.path.join(REPO, "dist", f"{PKG}.zip")
    )
    args = ap.parse_args()
    digest = build_zip(args.out)
    n = len(zipfile.ZipFile(args.out).namelist())
    print(f"{args.out}  members={n}  sha256={digest}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
