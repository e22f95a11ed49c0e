"""Benchmark harness (driver contract): one JSON line on stdout.

Headline: end-to-end CDC replay (binlog -> streaming foreachBatch MERGE ->
converged snapshot table) on a seeded synthetic binlog sized by SF
(~5M events/SF), plus wall times for representative analytic queries at
$SPARK_GRAFT_SF_DIR. Queries materialize via the noop sink so the full plan
executes without driver collection.

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), BENCH_EVENTS (override event count),
BENCH_MASTER (override spark master for scaling runs).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "lww_latest_event_per_user",
    "session_count_30m",
    "pricing_summary",
    "top_revenue_orders",
    "region_revenue",
    "exact_dedup_docs",
    "minhash_signatures",
    "token_stats_by_lang",
    "cosine_topk",
    "normalized_documents",
]


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def _binlog_for(sf: float, n_events: int) -> str:
    """Deterministic binlog cached across runs (content is seed-fixed)."""
    from sfr_ingest_pipeline_spark.generator import generate_binlog

    cache = os.path.join(
        tempfile.gettempdir(), f"spark_graft_bench_binlog_{n_events}"
    )
    marker = os.path.join(cache, "_COMPLETE")
    if not os.path.exists(marker):
        shutil.rmtree(cache, ignore_errors=True)
        os.makedirs(cache, exist_ok=True)
        generate_binlog(
            cache,
            seed=42,
            n_conversations=max(200, n_events // 50),
            n_events=n_events,
            n_segments=16,
            zipf_s=1.05,
        )
        with open(marker, "w") as f:
            f.write("ok")
    return cache


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = os.environ.get("BENCH_MASTER", f"local[{cpus}]")
    sf = _sf_from_dir(sf_dir)
    n_events = int(os.environ.get("BENCH_EVENTS", str(int(5_000_000 * sf))))

    from sfr_ingest_pipeline_spark.config import EngineConfig
    from sfr_ingest_pipeline_spark.queries import QUERIES
    from sfr_ingest_pipeline_spark.session import get_spark
    from sfr_ingest_pipeline_spark.streaming.replay import replay_stream

    spark = get_spark(master=master, app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}

    # ---- headline: end-to-end CDC replay --------------------------------
    binlog = _binlog_for(sf, n_events)
    work = tempfile.mkdtemp(prefix="bench_cdc_")
    cfg = EngineConfig(n_buckets=32, n_salt=8, shuffle_partitions=int(cpus) if cpus.isdigit() else 32)
    t0 = time.time()
    results = replay_stream(
        spark,
        binlog,
        os.path.join(work, "table"),
        os.path.join(work, "ckpt"),
        config=cfg,
        max_files_per_trigger=4,
    )
    replay_sec = time.time() - t0
    rows_in = sum(r.rows_in for r in results)
    timings["cdc_replay"] = round(replay_sec, 3)
    shutil.rmtree(work, ignore_errors=True)

    # ---- analytic query suite -------------------------------------------
    for name in BENCH_QUERIES:
        fn = QUERIES[name]
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    out = {
        "metric": "e2e_cdc_replay_sec",
        "value": round(replay_sec, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cdc_events": rows_in,
        "cdc_events_per_sec": round(rows_in / replay_sec, 1),
        "cdc_batches": len(results),
        "master": master,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
