"""Measure the shuffle-byte saving of config.source_dedup_horizon.

Round-2 verdict item 8 'done' criterion: converged table identical
with/without the source-side watermark dedup (exceptAll both ways empty)
PLUS the measured shuffle delta at ~5% transport redelivery. Shuffle bytes
come from the Spark event log (SparkListenerTaskEnd task metrics), the same
numbers the UI reports — not estimates.

    python scripts/dedup_bytes_bench.py [n_events] [dup_ratio]

Prints one JSON line. Uses tmpfs when available (the phenomenon under test
is shuffle volume, not this VM's virtual disk).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _work_base() -> str:
    return "/dev/shm/spark_graft_dedup" if os.path.isdir("/dev/shm") else (
        tempfile.mkdtemp()
    )


def _shuffle_bytes(eventlog_dir: str, app_id: str) -> dict:
    w = r = records = 0
    paths = glob.glob(os.path.join(eventlog_dir, f"{app_id}*")) + glob.glob(
        os.path.join(eventlog_dir, f"eventlog_v2_{app_id}", "events_*")
    )
    for path in paths:
        with open(path, encoding="utf-8") as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") != "SparkListenerTaskEnd":
                    continue
                tm = ev.get("Task Metrics") or {}
                sw = tm.get("Shuffle Write Metrics") or {}
                sr = tm.get("Shuffle Read Metrics") or {}
                w += sw.get("Shuffle Bytes Written", 0)
                r += sr.get("Local Bytes Read", 0) + sr.get("Remote Bytes Read", 0)
                records += sw.get("Shuffle Records Written", 0)
    return {"shuffle_write_bytes": w, "shuffle_read_bytes": r,
            "shuffle_records_written": records}


def _phase(binlog: str, base: str, name: str, horizon: str | None,
           eventlog_dir: str) -> None:
    """Child-process body: one replay with event logging; prints JSON."""
    from sfr_ingest_pipeline_spark.config import EngineConfig
    from sfr_ingest_pipeline_spark.session import get_spark
    from sfr_ingest_pipeline_spark.streaming.replay import replay_stream

    cfg = EngineConfig(n_buckets=32, n_salt=1, merge_mode="mor",
                       source_dedup_horizon=horizon,
                       shuffle_partitions=32)
    spark = get_spark(
        master=os.environ.get("BENCH_MASTER", "local[16]"),
        app_name=f"dedup-bench-{name}", config=cfg,
        extra_confs={"spark.eventLog.enabled": "true",
                     "spark.eventLog.dir": f"file://{eventlog_dir}",
                     "spark.eventLog.compress": "false",
                     "spark.eventLog.rolling.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    t0 = time.time()
    results = replay_stream(
        spark, binlog, f"{base}/table_{name}", f"{base}/ckpt_{name}",
        config=cfg, max_files_per_trigger=4,
    )
    wall = time.time() - t0
    rows_in = sum(r.rows_in for r in results)
    applied = sum(r.events_applied for r in results)
    spark.stop()
    print(json.dumps({"app_id": app_id, "wall_sec": round(wall, 2),
                      "rows_into_merge": rows_in, "events_applied": applied}))


def _run(binlog: str, base: str, name: str, horizon: str | None,
         eventlog_dir: str) -> dict:
    """Run one phase in a SUBPROCESS (py4j does not survive stop+recreate
    in one interpreter) and join its metrics with the event log."""
    import subprocess

    argv = [sys.executable, os.path.abspath(__file__), "--phase", name,
            binlog, base, eventlog_dir]
    if horizon:
        argv.append(horizon)
    proc = subprocess.run(argv, capture_output=True, text=True, check=True)
    info = json.loads(proc.stdout.strip().splitlines()[-1])
    time.sleep(1)
    out = _shuffle_bytes(eventlog_dir, info.pop("app_id"))
    out.update(info)
    return out


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--phase":
        name, binlog, base, eventlog_dir = sys.argv[2:6]
        horizon = sys.argv[6] if len(sys.argv) > 6 else None
        _phase(binlog, base, name, horizon, eventlog_dir)
        return 0
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    dup = float(sys.argv[2]) if len(sys.argv) > 2 else 0.05

    from sfr_ingest_pipeline_spark.generator import fast_binlog

    base = _work_base()
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base, exist_ok=True)
    eventlog_dir = os.path.join(base, "eventlog")
    os.makedirs(eventlog_dir, exist_ok=True)
    binlog = os.path.join(base, "binlog")
    fast_binlog(binlog, n_events=n_events, n_segments=16,
                duplicate_ratio=dup, zipf_s=1.05, seed=7)

    plain = _run(binlog, base, "plain", None, eventlog_dir)
    dedup = _run(binlog, base, "dedup", "10 minutes", eventlog_dir)

    # identical convergence (exceptAll both ways in a fresh subprocess)
    import subprocess

    code = (
        "import sys; sys.path.insert(0, %r); "
        "from pyspark.sql import SparkSession; "
        "from sfr_ingest_pipeline_spark.table.transcript_table import TranscriptTable; "
        "s = SparkSession.builder.master('local[16]').appName('diff').getOrCreate(); "
        "s.sparkContext.setLogLevel('ERROR'); "
        "a = TranscriptTable.load(%r).scan(s); "
        "b = TranscriptTable.load(%r).scan(s); "
        "print(a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0)"
    ) % (os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
         f"{base}/table_plain", f"{base}/table_dedup")
    res = subprocess.run([sys.executable, "-c", code],
                         capture_output=True, text=True, check=True)
    identical = res.stdout.strip().splitlines()[-1] == "True"

    merge_w_delta = plain["shuffle_write_bytes"] - dedup["shuffle_write_bytes"]
    print(json.dumps({
        "n_events": n_events, "dup_ratio": dup, "identical": identical,
        "plain": plain, "dedup": dedup,
        "net_shuffle_write_delta_bytes": merge_w_delta,
        "note": "dedup side INCLUDES the dropDuplicatesWithinWatermark "
                "shuffle itself; the delta is the honest net effect",
    }))
    shutil.rmtree(base, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
