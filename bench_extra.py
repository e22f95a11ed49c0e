"""Round-6 optimization harness (bench.py is FROZEN for measurement; this
file exists so optimization work can time queries in isolation, repeat them,
and dump physical plans without touching the driver contract).

Usage:
    python bench_extra.py [--queries a,b,c] [--repeats N] [--plans DIR]
                          [--no-replay]

Prints one JSON line: {"queries": {name: [t1, t2, ...]}, ...}. Timing
methodology matches bench.py exactly (noop sink, wall seconds), but each
query is repeated --repeats times (first run includes codegen warmup) so a
median can be read off; --plans DIR writes <name>.txt with
explain("formatted") for every timed query.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import BENCH_QUERIES  # noqa: E402  (frozen list, reused verbatim)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=None)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--plans", default=None)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = os.environ.get("BENCH_MASTER", f"local[{cpus}]")

    from sfr_ingest_pipeline_spark.queries import QUERIES
    from sfr_ingest_pipeline_spark.session import get_spark

    spark = get_spark(master=master, app_name="bench_extra", extra_confs={
        "spark.ui.showConsoleProgress": "false",
    })
    spark.sparkContext.setLogLevel("ERROR")

    names = args.queries.split(",") if args.queries else list(BENCH_QUERIES)
    out: dict[str, list[float]] = {}
    for name in names:
        fn = QUERIES[name]
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            plan = fn(spark, sf_dir)._sc is not None and fn(
                spark, sf_dir
            )._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(os.path.join(args.plans, f"{name}.txt"), "w") as f:
                f.write(plan)
        ts = []
        for _ in range(args.repeats):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = ts
        print(f"# {name}: {ts}", file=sys.stderr)
    print(json.dumps({"queries": out, "sf_dir": sf_dir, "master": master}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
