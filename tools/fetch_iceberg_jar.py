"""Acquire the Iceberg Spark runtime jar so tests/test_iceberg_interop.py
can execute (it skips with a documented reason when no jar is present).

Usage:  python tools/fetch_iceberg_jar.py [dest_dir]

Tries, in order:
  1. jars already on disk (pyspark jars dir, ~/.ivy2, /opt, /usr/share) —
     the offline-friendly path;
  2. Maven Central download of
     iceberg-spark-runtime-{spark_mm}_{scala}-{ICEBERG_VERSION}.jar.

On success prints the jar path and the exact env line to run the test:

    ICEBERG_JAR=<path> python -m pytest tests/test_iceberg_interop.py -q

On failure prints the failure mode. The committed record of this
container's attempt lives in ICEBERG_ATTEMPT.md (this sandbox has no DNS:
every resolver call fails with EAI_NONAME, so acquisition is impossible
here by construction, not by omission — the script is the reproducible
recipe for any networked environment).
"""

from __future__ import annotations

import glob
import os
import socket
import sys
import urllib.request

ICEBERG_VERSION = "1.7.1"
SCALA = "2.13"


def find_local() -> str | None:
    import pyspark

    roots = [
        os.path.join(os.path.dirname(pyspark.__file__), "jars"),
        os.path.expanduser("~/.ivy2"),
        "/opt",
        "/usr/share/java",
    ]
    for root in roots:
        hits = glob.glob(
            os.path.join(root, "**", "*iceberg-spark-runtime*.jar"),
            recursive=True,
        )
        if hits:
            return hits[0]
    return None


def main() -> int:
    dest = sys.argv[1] if len(sys.argv) > 1 else "/tmp"
    local = find_local()
    if local:
        print(f"found local jar: {local}")
        print(f"run: ICEBERG_JAR={local} python -m pytest "
              f"tests/test_iceberg_interop.py -q")
        return 0
    import pyspark

    spark_mm = ".".join(pyspark.__version__.split(".")[:2])
    name = f"iceberg-spark-runtime-{spark_mm}_{SCALA}-{ICEBERG_VERSION}.jar"
    url = (
        "https://repo1.maven.org/maven2/org/apache/iceberg/"
        f"iceberg-spark-runtime-{spark_mm}_{SCALA}/{ICEBERG_VERSION}/{name}"
    )
    print(f"no local jar; trying {url}")
    try:
        socket.gethostbyname("repo1.maven.org")
    except OSError as e:
        print(f"FAILURE MODE: DNS resolution failed ({e}) — this "
              f"environment has no network; run this script where Maven "
              f"Central is reachable")
        return 1
    out = os.path.join(dest, name)
    try:
        urllib.request.urlretrieve(url, out)
    except OSError as e:
        print(f"FAILURE MODE: download failed: {e}")
        return 1
    print(f"downloaded: {out}")
    print(f"run: ICEBERG_JAR={out} python -m pytest "
          f"tests/test_iceberg_interop.py -q")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
