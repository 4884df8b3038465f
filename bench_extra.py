#!/usr/bin/env python
"""Per-query isolation bench (guide §1.4) — NOT the driver contract.

Times individual registry queries with the noop sink, prints per-query
seconds, and can dump ``explain("formatted")`` plans to plans/r10/.

Usage:
    python bench_extra.py <sf_dir> <query> [query ...] [--repeats N]
        [--plan SUFFIX]     # dump plans/r10/<query>_<SUFFIX>.txt
        [--cpus N]

The Spark session is built with the same conf as the frozen bench.py
(make_spark) so numbers are comparable to the driver's methodology.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0]
    names = args[1:]
    repeats = 1
    plan_suffix = None
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--repeats":
            repeats = int(argv[i + 1])
            names = [n for n in names if n != argv[i + 1]]
        if a == "--plan":
            plan_suffix = argv[i + 1]
            names = [n for n in names if n != argv[i + 1]]
        if a == "--cpus":
            cpus = int(argv[i + 1])
            names = [n for n in names if n != argv[i + 1]]

    from bench import make_spark, _noop_write
    from archive_pdf_tools_spark.queries import QUERIES

    spark = make_spark(cpus, "bench-extra")
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    try:
        for name in names:
            fn, _sql = QUERIES[name]
            if plan_suffix:
                df = fn(spark, sf_dir)
                os.makedirs(os.path.join(REPO, "plans", "r10"),
                            exist_ok=True)
                path = os.path.join(REPO, "plans", "r10",
                                    f"{name}_{plan_suffix}.txt")
                with open(path, "w") as fh:
                    fh.write(df._jdf.queryExecution().explainString(
                        spark._jvm.org.apache.spark.sql.execution
                        .ExplainMode.fromString("formatted")))
                print(f"plan -> {path}")
            best = None
            samples = []
            for _ in range(repeats):
                spark.sparkContext.setJobDescription(f"bench_extra:{name}")
                t0 = time.perf_counter()
                _noop_write(fn(spark, sf_dir))
                el = time.perf_counter() - t0
                samples.append(round(el, 3))
                best = el if best is None else min(best, el)
            results[name] = round(best, 3)
            print(f"{name:24s} best={best:.3f}s  samples={samples}")
    finally:
        spark.stop()
    print(results)


if __name__ == "__main__":
    main()
