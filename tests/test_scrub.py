"""GDPR PII scrub (table/scrub.py): redaction UPDATE, the time-travel
leak it deliberately leaves, the expire step that closes it, the
residual-file audit, and the tag/branch erasure guard."""

import glob
import json

import pandas as pd
import pyarrow.parquet as pq
import pytest

from sfr_ingest_pipeline_spark.functions.pii import pii_counts_py, redact_pii_py
from sfr_ingest_pipeline_spark.operators.merge import apply_batch
from sfr_ingest_pipeline_spark.table.scrub import (
    pii_present_predicate,
    residual_pii_files,
    scrub_pii,
)
from sfr_ingest_pipeline_spark.table.transcript_table import (
    TranscriptTable,
    create_tag,
)

SSN = "987-65-4321"  # unique marker: greppable in raw files pre-expire

PII_TEXTS = [
    f"my ssn is {SSN} thanks",
    "mail bob.jones+x@corp.example.org about it",
    "call 555-123-4567 tonight",
    "login from 192.168.7.19 looked odd",
]
CLEAN_TEXTS = [
    "totally ordinary turn",
    "another clean message with numbers 12 and 3456789",
    "no contact data here",
]


def _segments():
    rows = []
    seq = 0
    for i, t in enumerate(PII_TEXTS + CLEAN_TEXTS):
        rows.append(
            dict(conv_id=f"c{i % 3}", turn_idx=i, op="I", role="user",
                 text=t, tool=None, ts_us=1_700_000_000_000_000 + seq,
                 event_seq=seq)
        )
        seq += 1
    # second batch: one more PII row + an update of a clean row
    b2 = [
        dict(conv_id="c9", turn_idx=0, op="I", role="user",
             text=f"backup ssn {SSN} again", tool=None,
             ts_us=1_700_000_000_100_000, event_seq=seq),
        dict(conv_id="c1", turn_idx=4, op="U", role="user",
             text="still clean after update", tool=None,
             ts_us=1_700_000_000_100_001, event_seq=seq + 1),
    ]
    return [pd.DataFrame(rows), pd.DataFrame(b2)]


@pytest.fixture()
def pii_table(spark, tmp_path, small_cfg):
    root = str(tmp_path / "pii_t")
    TranscriptTable.create(root, n_buckets=small_cfg.n_buckets)
    for i, seg in enumerate(_segments()):
        apply_batch(spark, root, spark.createDataFrame(seg), i, config=small_cfg)
    return root


def _scan(spark, root, sid=None):
    return (
        TranscriptTable.load(root, sid).scan(spark)
        .orderBy("conv_id", "turn_idx").toPandas().reset_index(drop=True)
    )


def _n_pii(texts):
    return sum(
        1 for t in texts if t is not None and any(pii_counts_py(t).values())
    )


def test_scrub_redacts_exactly_python_twin(spark, pii_table, small_cfg):
    before = _scan(spark, pii_table)
    n_dirty = _n_pii(before["text"])
    assert n_dirty == 5  # 4 from batch 0 + 1 from batch 1

    res = scrub_pii(spark, pii_table, config=small_cfg)
    assert res["dml"]["committed"] and res["dml"]["rows_matched"] == n_dirty
    assert res["expire"] is None

    after = _scan(spark, pii_table)
    # every text equals the python-twin redaction of its pre-scrub value
    assert list(after["text"]) == [redact_pii_py(t) for t in before["text"]]
    assert _n_pii(after["text"]) == 0
    # clean rows byte-identical (redaction is identity on them)
    clean = before["text"].map(lambda t: redact_pii_py(t) == t)
    pd.testing.assert_frame_equal(
        after[clean.values].reset_index(drop=True),
        before[clean.values].reset_index(drop=True),
        check_dtype=False,
    )


def test_scrub_without_expire_leaks_via_time_travel(spark, pii_table, small_cfg):
    parent_sid = TranscriptTable.load(pii_table).snapshot.snapshot_id
    scrub_pii(spark, pii_table, config=small_cfg)

    # time travel still reads the raw values — and the audit says so
    old = _scan(spark, pii_table, parent_sid)
    assert _n_pii(old["text"]) == 5
    offenders = residual_pii_files(spark, pii_table)
    assert offenders and all(f["n_pii"] > 0 for f in offenders)


def test_scrub_with_expire_erases_on_disk(spark, pii_table, small_cfg):
    res = scrub_pii(
        spark, pii_table, expire=True, keep_last=1, config=small_cfg
    )
    assert res["dml"]["committed"] and res["expire"] is not None

    # the distributed audit over every retained snapshot's files is clean
    assert residual_pii_files(spark, pii_table) == []

    # belt-and-braces: no parquet file under the table root still carries
    # the marker SSN in any string column (reads bytes the engine wrote,
    # independent of its own file listing)
    for path in glob.glob(f"{pii_table}/**/*.parquet", recursive=True):
        tbl = pq.read_table(path)
        for col in tbl.schema.names:
            if str(tbl.schema.field(col).type) == "string":
                vals = [v for v in tbl.column(col).to_pylist() if v]
                assert not any(SSN in v for v in vals), (path, col)

    # table still reads fine and has the expected redactions
    after = _scan(spark, pii_table)
    assert _n_pii(after["text"]) == 0
    assert (after["text"].str.contains("<SSN>", regex=False)).sum() == 2


def test_scrub_expire_refuses_while_tag_pins_history(spark, pii_table, small_cfg):
    create_tag(pii_table, "audit-freeze")
    with pytest.raises(ValueError, match="audit-freeze"):
        scrub_pii(spark, pii_table, expire=True, config=small_cfg)
    # without expire the redaction itself is still allowed
    res = scrub_pii(spark, pii_table, config=small_cfg)
    assert res["dml"]["committed"]


def test_scrub_prunes_clean_files(spark, tmp_path, small_cfg):
    """A table where PII lives in one conversation only: manifest pruning
    must skip files whose range can't hold a match row... at minimum the
    predicate itself matches only dirty rows."""
    root = str(tmp_path / "prune_t")
    TranscriptTable.create(root, n_buckets=small_cfg.n_buckets)
    rows = [
        dict(conv_id="dirty", turn_idx=0, op="I", role="user",
             text=f"ssn {SSN}", tool=None,
             ts_us=1_700_000_000_000_000, event_seq=0),
        dict(conv_id="clean", turn_idx=0, op="I", role="user",
             text="nothing here", tool=None,
             ts_us=1_700_000_000_000_001, event_seq=1),
    ]
    apply_batch(spark, root, spark.createDataFrame(pd.DataFrame(rows)), 0,
                config=small_cfg)
    res = scrub_pii(spark, root, conv_ids=["dirty"], config=small_cfg)
    assert res["dml"]["rows_matched"] == 1
    after = _scan(spark, root)
    assert list(after.sort_values("conv_id")["text"]) == [
        "nothing here", "ssn <SSN>",
    ]


def test_pii_present_predicate_is_valid_sql(spark):
    df = spark.createDataFrame(
        [("a@b.co",), ("clean",), (None,)], "text string"
    )
    got = df.filter(pii_present_predicate(("text",))).collect()
    assert [r.text for r in got] == ["a@b.co"]


def test_cli_scrub_surface(spark, pii_table, capsys):
    """CLI contract: audit-only exits 1 while residue exists, erasure mode
    self-audits to exit 0, tag-pinned erasure is a structured exit 3."""
    from sfr_ingest_pipeline_spark.cli import main

    def run(*argv):
        rc = main(list(argv))
        out = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
        return rc, json.loads(out[-1])

    rc, rep = run("scrub", "--table", pii_table, "--audit-only")
    assert rc == 1 and not rep["clean"] and rep["offending_files"]

    create_tag(pii_table, "pin")
    rc, rep = run("scrub", "--table", pii_table, "--expire")
    assert rc == 3 and rep["error"] == "erasure_pinned" and "pin" in rep["detail"]

    from sfr_ingest_pipeline_spark.table.transcript_table import delete_tag

    delete_tag(pii_table, "pin")
    rc, rep = run("scrub", "--table", pii_table, "--expire")
    assert rc == 0 and rep["audit_clean"] and rep["dml"]["committed"]
    assert rep["compacted_buckets"]

    rc, rep = run("scrub", "--table", pii_table, "--audit-only")
    assert rc == 0 and rep["clean"]
