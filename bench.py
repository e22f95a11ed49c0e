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
    "simhash_docs",
    "srp_ann_topk",
    "embedding_near_dups",
    "ivf_ann_topk",
    "purchase_asof_view",
    "coalesce_field_lww",
    "date_ranges",
    "fuzzy_part_pairs",
    "tfidf_top_terms",
    "cross_doc_ngram_dup",
    "pii_redaction",
    "repetition_stats",
    "doc_chunks",
]


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def _work_base() -> str:
    """Benchmark I/O lives on tmpfs when available: the phenomenon under test
    is the engine's CPU/shuffle scaling, not this VM's single 590 MB/s virtual
    disk (a real cluster's aggregate disk bandwidth scales with executors)."""
    base = os.environ.get("BENCH_WORKDIR")
    if base:
        return base
    return "/dev/shm/spark_graft_bench" if os.path.isdir("/dev/shm") else tempfile.gettempdir()


def _binlog_for(sf: float, n_events: int) -> str:
    """Deterministic binlog cached across runs (content is seed-fixed)."""
    from sfr_ingest_pipeline_spark.generator import fast_binlog

    cache = os.path.join(_work_base(), f"binlog_v4_{n_events}")
    marker = os.path.join(cache, "_COMPLETE")
    if not os.path.exists(marker):
        shutil.rmtree(cache, ignore_errors=True)
        os.makedirs(cache, exist_ok=True)
        fast_binlog(
            cache,
            n_events=n_events,
            n_segments=16,
            n_conversations=max(200, n_events // 50),
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
    # 80M*sf -> 8M events at the driver's sf0.1 in 8 microbatches of ~1M:
    # compute-dominated (runs 2-3 of 3 reproduce within 1%; the 5M*sf
    # round-3 sizing was 2 batches of fixed-cost noise — VERDICT r3 item 6)
    n_events = int(os.environ.get("BENCH_EVENTS", str(int(80_000_000 * sf))))

    from sfr_ingest_pipeline_spark.config import EngineConfig
    from sfr_ingest_pipeline_spark.queries import QUERIES
    from sfr_ingest_pipeline_spark.session import get_spark
    from sfr_ingest_pipeline_spark.streaming.replay import replay_stream

    os.makedirs(_work_base(), exist_ok=True)
    spark = get_spark(
        master=master, app_name="bench",
        extra_confs={
            "spark.local.dir": os.path.join(_work_base(), "spark-local"),
            # keep stdout to exactly the one contract JSON line: console
            # progress bars write \r-frames that can glue onto it when the
            # driver captures a pty
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}

    # ---- headline: end-to-end CDC replay --------------------------------
    binlog = _binlog_for(sf, n_events)
    cfg = EngineConfig(
        n_buckets=32, n_salt=int(os.environ.get("BENCH_SALT", "1")),
        shuffle_partitions=int(cpus) if cpus.isdigit() else 32,
        merge_mode=os.environ.get("BENCH_MERGE_MODE", "mor"),
        compact_delta_files=1,   # compaction fires mid-run -> amortized-honest
        # BENCH_NO_BLOOM=1 for the A/B of per-file bloom harvest cost
        file_bloom_fpp=None if os.environ.get("BENCH_NO_BLOOM") else 0.01,
    )

    # warmup: tiny replay to absorb one-time JVM codegen + Python-worker
    # startup so the timed number reflects steady-state throughput (real
    # deployments run warm); sized ~1% of the benchmark
    warm_binlog = _binlog_for(sf, max(20_000, n_events // 10))
    warm = tempfile.mkdtemp(prefix="bench_warm_", dir=_work_base())
    replay_stream(
        spark, warm_binlog, os.path.join(warm, "table"),
        os.path.join(warm, "ckpt"), config=cfg,
    )
    shutil.rmtree(warm, ignore_errors=True)

    work = tempfile.mkdtemp(prefix="bench_cdc_", dir=_work_base())
    t0 = time.time()
    results = replay_stream(
        spark,
        binlog,
        os.path.join(work, "table"),
        os.path.join(work, "ckpt"),
        config=cfg,
        # 2 files/trigger over the 16-segment binlog = 8 microbatches: the
        # round-3 headline was a 2-batch run where per-batch fixed costs
        # dominated the number (VERDICT r3 item 6) — 8 batches measures the
        # steady-state foreachBatch loop and reproduces within a few
        # percent (3-run spread recorded in BENCH/BASELINE.md)
        max_files_per_trigger=int(os.environ.get("BENCH_FILES_PER_TRIGGER", "2")),
    )
    replay_sec = time.time() - t0
    rows_in = sum(r.rows_in for r in results)
    timings["cdc_replay"] = round(replay_sec, 3)
    shutil.rmtree(work, ignore_errors=True)

    # ---- analytic query suite -------------------------------------------
    if os.environ.get("BENCH_SKIP_QUERIES"):
        print(json.dumps({
            "metric": "e2e_cdc_replay_sec", "value": round(replay_sec, 3),
            "unit": "sec", "queries": timings, "sf": sf,
            "cdc_events": rows_in,
            "cdc_events_per_sec": round(rows_in / replay_sec, 1),
            "cdc_batches": len(results), "master": master,
        }))
        return 0
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
