"""8-core vs 32-core scaling at a compute-dominant data size (r14,
VERDICT r13 #6 / SCALE.md).

The sf0.1 bench queries finish in 0.2-1.0 s — fixed plan/schedule cost
dominates, so the driver's 8-vs-32-core ratios sit at 1.05-1.39 and say
nothing about parallel scaling. This tool replicates the fact tables
N× with key offsets (the measure_scaleup.py generator — PK/FK semantics
preserved, replica 0 byte-identical) into a temp dir ONCE, then runs
the chosen shuffle-heavy queries in two SUBPROCESSES — one at
SPARK_GRAFT_CPUS=8, one at 32 (master is fixed at session build, so a
per-core-count process is the honest form) — and prints the per-query
wall ratios. No bench-contract surface is touched.

Usage:
    python tools/measure_core_scaling.py [--factor N] [query ...]
    (internal) python tools/measure_core_scaling.py --time DIR q...
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    "top_customers_by_revenue",
    "chronology_orders_lifecycle",
    "pk_dedup_keep_first_lineitem",
    "events_hourly_agg",
    "revenue_by_nation",
]


def time_mode(data_dir: str, names: list[str]) -> None:
    import __spark_entry__ as entry
    from _data_engineering_pipeline_project_spark.session import get_spark

    spark = get_spark("core_scaling")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    out = {}
    for name in names:
        fn = qs[name]
        fn(spark, data_dir).count()  # warm (codegen/JIT/footers)
        best = None
        for _ in range(2):
            t0 = time.time()
            fn(spark, data_dir).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
    print("CORESCALE " + json.dumps(out))


def main() -> None:
    argv = sys.argv[1:]
    if argv and argv[0] == "--time":
        time_mode(argv[1], argv[2:])
        return
    factor = 20
    if argv and argv[0] == "--factor":
        factor = int(argv[1])
        argv = argv[2:]
    names = argv or DEFAULT_QUERIES

    from measure_scaleup import build_replicated  # noqa: E402

    from _data_engineering_pipeline_project_spark.session import get_spark

    spark = get_spark("core_scaling_build")
    rep_dir = tempfile.mkdtemp(prefix=f"corescale{factor}_")
    try:
        t0 = time.time()
        build_replicated(spark, rep_dir, factor)
        print(f"replicated {factor}x in {time.time() - t0:.1f}s -> {rep_dir}")
        spark.stop()
        results = {}
        for cpus in ("32", "8"):
            env = {**os.environ, "SPARK_GRAFT_CPUS": cpus}
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--time",
                 rep_dir, *names],
                env=env,
                capture_output=True,
                text=True,
                timeout=1800,
            )
            line = [
                ln for ln in proc.stdout.splitlines()
                if ln.startswith("CORESCALE ")
            ]
            if not line:
                print(proc.stdout[-2000:])
                print(proc.stderr[-2000:])
                raise RuntimeError(f"no CORESCALE line at cpus={cpus}")
            results[cpus] = json.loads(line[-1][len("CORESCALE "):])
            print(f"cpus={cpus}: {results[cpus]}")
        print(f"\nfactor={factor} ratios (8-core sec / 32-core sec; "
              "ideal 4.0):")
        for name in names:
            r8, r32 = results["8"][name], results["32"][name]
            print(f"  {name}: 32c={r32:.2f}s 8c={r8:.2f}s "
                  f"ratio={r8 / max(r32, 1e-9):.2f}")
    finally:
        shutil.rmtree(rep_dir, ignore_errors=True)


if __name__ == "__main__":
    sys.path.insert(
        0, os.path.dirname(os.path.abspath(__file__))
    )  # for measure_scaleup import
    main()
