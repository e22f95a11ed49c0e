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
