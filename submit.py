"""Package the engine and run it via spark-submit --py-files (N8).

Builds dist/transformio_spark.zip and launches bench.py (or any
entrypoint) through spark-submit exactly as a cluster run would —
the sandbox stand-in for shipping to N/4N executors.

Usage:
  python submit.py [--cores N] [--sf-dir DIR] [--entry bench.py]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import zipfile

ROOT = os.path.dirname(os.path.abspath(__file__))


def build_zip() -> str:
    dist = os.path.join(ROOT, "dist")
    os.makedirs(dist, exist_ok=True)
    zpath = os.path.join(dist, "transformio_spark.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(ROOT, "transformio_spark")
        for dirpath, _dirnames, filenames in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, ROOT))
    return zpath


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--entry", default="bench.py")
    args = ap.parse_args()

    zpath = build_zip()
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(args.cores)
    env["SPARK_GRAFT_SF_DIR"] = args.sf_dir
    cmd = [
        "spark-submit",
        "--master", f"local[{args.cores}]",
        "--py-files", zpath,
        os.path.join(ROOT, args.entry),
        "--cores", str(args.cores),
        "--sf-dir", args.sf_dir,
    ]
    print("+", " ".join(cmd), file=sys.stderr)
    raise SystemExit(subprocess.call(cmd, env=env))


if __name__ == "__main__":
    main()
