"""Build the ``--py-files`` deployment artifact: ``dist/etl_spark.zip``.

The north-star deployment contract is ``spark-submit --py-files
etl_spark.zip job.py`` on a multi-executor cluster (the reference ships its
worker as a container image per deployment,
/root/reference/k8s/data-pipeline/deployments/parser.yml:81-87 — the
PySpark-native equivalent of "the code travels to the workers" is the
py-files zip). This packager is deliberately boring and DETERMINISTIC:

* only ``etl_spark/**/*.py`` goes in — no tests, no tools, no artifacts;
* entries are sorted and timestamps zeroed, so the same tree always
  produces byte-identical zips (a stable artifact hash lets a deploy
  pipeline dedup pushes and lets ops diff "what actually changed");
* the zip is importable from its root (``import etl_spark`` works when
  the zip itself is on ``sys.path``, which is exactly what spark-submit
  does for both the driver and every executor's Python worker).

Usage:
    python tools/make_pyfiles.py [--out dist/etl_spark.zip]
Prints one JSON line: {"zip": path, "files": N, "bytes": N, "sha256": ...}.
"""

from __future__ import annotations

import argparse
import hashlib
import io
import json
import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(out_path: str) -> dict:
    pkg_root = os.path.join(REPO, "etl_spark")
    members: list[tuple[str, str]] = []  # (arcname, abspath)
    for dirpath, dirnames, filenames in os.walk(pkg_root):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if not fn.endswith(".py"):
                continue
            ap = os.path.join(dirpath, fn)
            arc = os.path.relpath(ap, REPO)
            members.append((arc, ap))
    buf = io.BytesIO()
    # ZIP_STORED: pyspark must read these on every Python worker start;
    # the package is ~1 MB of source, so decompression savings are noise
    # next to deterministic, dirt-cheap reads.
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        for arc, ap in members:
            with open(ap, "rb") as f:
                data = f.read()
            info = zipfile.ZipInfo(arc, date_time=(1980, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            zf.writestr(info, data)
    blob = buf.getvalue()
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(blob)
    return {
        "zip": os.path.abspath(out_path),
        "files": len(members),
        "bytes": len(blob),
        "sha256": hashlib.sha256(blob).hexdigest(),
    }


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "dist", "etl_spark.zip"))
    args = ap.parse_args(argv)
    print(json.dumps(build_zip(args.out)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
