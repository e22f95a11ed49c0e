"""Profile the CDC replay headline: run a bench-shaped replay with the UI
enabled and dump per-stage wall/task time so optimization targets the real
cost (guide §1). Usage:

    python scripts/profile_replay.py [n_events] [files_per_trigger]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _binlog_for, _work_base  # noqa: E402


def main() -> int:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 2_100_000
    fpt = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from sfr_ingest_pipeline_spark.config import EngineConfig
    from sfr_ingest_pipeline_spark.session import get_spark
    from sfr_ingest_pipeline_spark.streaming.replay import replay_stream

    os.makedirs(_work_base(), exist_ok=True)
    spark = get_spark(
        master="local[32]", app_name="profile_replay",
        extra_confs={
            "spark.local.dir": os.path.join(_work_base(), "spark-local"),
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "true",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    cfg = EngineConfig(
        n_buckets=32, n_salt=1, shuffle_partitions=32, merge_mode="mor",
        compact_delta_files=1, file_bloom_fpp=0.01,
    )
    binlog = _binlog_for(0.1, n_events)
    work = tempfile.mkdtemp(prefix="prof_cdc_", dir=_work_base())
    t0 = time.time()
    results = replay_stream(
        spark, binlog, os.path.join(work, "table"),
        os.path.join(work, "ckpt"), config=cfg, max_files_per_trigger=fpt,
    )
    wall = time.time() - t0
    rows = sum(r.rows_in for r in results)
    print(f"# wall={wall:.2f}s batches={len(results)} rows={rows} "
          f"ev/s={rows/wall:.0f}")
    for r in results:
        print(f"#   batch {r.batch_id}: {r.elapsed_sec:.2f}s rows_in={r.rows_in} "
              f"files_read={r.files_read} pruned={r.files_pruned}")

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    stages = json.load(urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/stages?status=COMPLETE"))
    # map stage -> job description (the setJobDescription labels) so the
    # table groups by PHASE, not by the (useless) lambda-site stage name
    jobs = json.load(urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/jobs"))
    stage_desc: dict[int, str] = {}
    for j in jobs:
        d = (j.get("description") or j.get("name") or "?").split("\n")[0]
        # strip the per-batch id so batches aggregate: "merge[3]: x" -> "merge: x"
        import re as _re

        d = _re.sub(r"\[\d+\]", "", d)[:80]
        for sid in j.get("stageIds", []):
            stage_desc[sid] = d
    agg: dict[str, list[float]] = {}
    for s in stages:
        name = stage_desc.get(
            s["stageId"], s["name"].split("\n")[0][:80]
        ) + (" | shuffle-read" if s.get("shuffleReadBytes") else " | map")
        dur = 0.0
        if s.get("firstTaskLaunchedTime") and s.get("completionTime"):
            from datetime import datetime

            fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
            t1 = datetime.strptime(s["firstTaskLaunchedTime"], fmt)
            t2 = datetime.strptime(s["completionTime"], fmt)
            dur = (t2 - t1).total_seconds()
        a = agg.setdefault(name, [0.0, 0.0, 0, 0.0, 0.0])
        a[0] += dur
        a[1] += s.get("executorRunTime", 0) / 1000.0
        a[2] += 1
        a[3] += s.get("shuffleReadBytes", 0) / 1e6
        a[4] += s.get("shuffleWriteBytes", 0) / 1e6
    print(f"{'stage':90s} {'wall_s':>8s} {'task_s':>8s} {'n':>3s} "
          f"{'shR_MB':>8s} {'shW_MB':>8s}")
    for name, (w, ts, n, srd, swr) in sorted(agg.items(), key=lambda kv: -kv[1][0]):
        print(f"{name:90s} {w:8.2f} {ts:8.1f} {n:3d} {srd:8.1f} {swr:8.1f}")
    shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
