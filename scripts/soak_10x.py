"""10× scale soak (VERDICT r3 #6): one exclusive-run tier a decade past
the standing bench scales, confirming the linearity claims —

  * PIP tile assignment at 160 M points (bench flagship: 16 M),
  * city conflation at 5 M buildings (bench: 1 M),
  * MinHash+LSH dedup at 5 M documents (bench: 500 k) — --with-dedup.

Inputs are the SAME executor-side deterministic generators the bench
uses (fixtures are pure functions of id — the driver never sees a row),
materialized to parquet first so the timed job reads columnar input like
the flagship protocol. Reports wall, rows/s, result counts, and the
peak driver RSS + peak system memory deltas (single-JVM local mode: the
executor heap IS the JVM; python workers add little here — both
pipelines are JVM/Arrow-side).

Run exclusively:  python scripts/soak_10x.py [--pip-n 160000000] [--conf-n 5000000]
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402 — reuse the bench fixtures/protocol
from building2osm_spark.session import get_spark  # noqa: E402


def peak_rss_gb() -> float:
    # driver process peak; the JVM is a child — track it via /proc below
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def jvm_rss_gb() -> float:
    """Sum of RSS over this session's java children (the executor heap)."""
    total = 0
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/comm") as f:
                if f.read().strip() != "java":
                    continue
            with open(f"/proc/{pid}/status") as f:
                for line in f:
                    if line.startswith("VmRSS:"):
                        total += int(line.split()[1])
        except OSError:
            continue
    return total / 1e6


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pip-n", type=int, default=160_000_000)
    ap.add_argument("--conf-n", type=int, default=5_000_000)
    ap.add_argument("--skip-pip", action="store_true")
    ap.add_argument("--skip-conflate", action="store_true")
    ap.add_argument("--with-dedup", action="store_true")
    ap.add_argument("--dedup-n", type=int, default=5_000_000)
    args = ap.parse_args()

    spark = get_spark(app="soak10x", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    out: dict = {}

    if not args.skip_pip:
        n = args.pip_n
        df = bench.points_table(spark, n)  # materializes parquet if absent
        bench.flagship_pip(spark, n, df=df)  # warm-up (codegen), protocol
        t0 = time.time()
        assigned = bench.flagship_pip(spark, n, df=df)
        dt = time.time() - t0
        out["pip"] = {
            "n_points": n,
            "n_assigned": assigned,
            "sec": round(dt, 2),
            "rows_per_sec": round(n / dt, 1),
            "jvm_rss_gb": round(jvm_rss_gb(), 2),
        }
        print(json.dumps({"pip": out["pip"]}))

    if not args.skip_conflate:
        from building2osm_spark.operators.conflate import conflate
        from building2osm_spark.sources.fixtures import distributed_city_conflation

        n = args.conf_n
        osm_p = bench.bench_path(f"osm_city{n}")
        imp_p = bench.bench_path(f"imp_city{n}")
        if not os.path.exists(os.path.join(osm_p, "_SUCCESS")):
            osm, imp = distributed_city_conflation(spark, n)
            osm.write.mode("overwrite").parquet(osm_p)
            imp.write.mode("overwrite").parquet(imp_p)
        job = lambda: conflate(  # noqa: E731
            spark.read.parquet(osm_p), spark.read.parquet(imp_p)
        ).count()
        job()  # warm-up
        t0 = time.time()
        matches = job()
        dt = time.time() - t0
        out["conflate"] = {
            "n_buildings": n,
            "matches": matches,
            "sec": round(dt, 2),
            "rows_per_sec": round(n / dt, 1),
            "jvm_rss_gb": round(jvm_rss_gb(), 2),
        }
        print(json.dumps({"conflate": out["conflate"]}))

    if args.with_dedup:
        from building2osm_spark.operators import dedupe as DD
        from building2osm_spark.sources.fixtures import distributed_documents

        n = args.dedup_n
        docs_p = bench.bench_path(f"docs_soak{n}")
        if not os.path.exists(os.path.join(docs_p, "_SUCCESS")):
            distributed_documents(spark, n).write.mode("overwrite").parquet(docs_p)
        docs = spark.read.parquet(docs_p)

        def dedup_job() -> int:
            sigs = DD.minhash_signatures(docs, base_hash="xxhash64")
            return DD.minhash_lsh_pairs(sigs, bands=16, threshold=0.5).count()

        dedup_job()  # warm-up
        t0 = time.time()
        pairs = dedup_job()
        dt = time.time() - t0
        out["dedup"] = {
            "n_docs": n,
            "pairs": pairs,
            # docs with id%10==0, id>0 are near-dups of their predecessor
            "planted": (n - 1) // 10,
            "sec": round(dt, 2),
            "rows_per_sec": round(n / dt, 1),
            "jvm_rss_gb": round(jvm_rss_gb(), 2),
        }
        print(json.dumps({"dedup": out["dedup"]}))

    out["driver_peak_rss_gb"] = round(peak_rss_gb(), 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
