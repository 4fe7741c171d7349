"""Two-cluster-size scaling through the real deployment path.

Packages `building2osm_spark` into a zip and launches
scripts/job_flagship.py via `spark-submit --py-files` at local[8] and
local[32] on identical input — the sandbox stand-in for the north rule's
"N and 4N executors" (BASELINE.json; no real cluster here). Each level
runs in a fresh spark-submit JVM; interleaved `--sessions` repeats with
per-level minimum, same noise protocol as bench._scaling_for.

    python scripts/submit_scaling.py [--n 16000000] [--sessions 2]

Prints ONE JSON line with per-level throughput and efficiency.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_zip(path: str = "/tmp/b2o_spark.zip") -> str:
    pkg = os.path.join(REPO, "building2osm_spark")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))
    return path


def spark_submit_bin() -> str:
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def run_level(zip_path: str, cores: int, n: int, points: str) -> float:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    env["PYSPARK_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            spark_submit_bin(),
            "--master", f"local[{cores}]",
            "--conf", f"spark.sql.shuffle.partitions={max(cores * 2, 8)}",
            "--conf", "spark.driver.memory=8g",
            "--py-files", zip_path,
            os.path.join(REPO, "scripts", "job_flagship.py"),
            "--n", str(n),
            "--points", points,
        ],
        capture_output=True,
        text=True,
        timeout=1800,
        env=env,
    )
    for line in reversed(proc.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)["seconds"]
    raise RuntimeError(
        f"no JSON from spark-submit local[{cores}]:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16_000_000)
    ap.add_argument("--sessions", type=int, default=2)
    ap.add_argument("--levels", type=int, nargs=2, default=(8, 32))
    args = ap.parse_args()

    zip_path = make_zip()
    points = f"/tmp/bench_points_{args.n}.parquet"
    lo, hi = args.levels
    best = {lo: float("inf"), hi: float("inf")}
    for _ in range(args.sessions):
        for cores in (lo, hi):
            best[cores] = min(best[cores], run_level(zip_path, cores, args.n, points))
    thr = {c: args.n / best[c] for c in best}
    print(
        json.dumps(
            {
                "deploy": "spark-submit --py-files",
                "n": args.n,
                f"thr_{lo}": round(thr[lo], 1),
                f"sec_{lo}": round(best[lo], 3),
                f"thr_{hi}": round(thr[hi], 1),
                f"sec_{hi}": round(best[hi], 3),
                "efficiency": round((thr[hi] / thr[lo]) / (hi / lo), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
