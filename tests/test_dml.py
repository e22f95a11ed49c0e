"""Row-level DML (DELETE FROM / UPDATE ... SET ... WHERE) on the transcript
table: MoR delta-append semantics, LWW advancement, delete memory, time
travel, changelog visibility, manifest pruning, marker carry-forward."""

import pandas as pd
import pytest

from sfr_ingest_pipeline_spark.oracle import LOGICAL_COLS, simulate_replay
from sfr_ingest_pipeline_spark.operators.merge import apply_batch
from sfr_ingest_pipeline_spark.table.dml import delete_where, update_where
from sfr_ingest_pipeline_spark.table.transcript_table import TranscriptTable


def _build(spark, tmp_path, segments, cfg, name="t"):
    root = str(tmp_path / name)
    TranscriptTable.create(root, n_buckets=cfg.n_buckets)
    for i, seg in enumerate(segments):
        apply_batch(spark, root, spark.createDataFrame(seg), i, config=cfg)
    return root


def _table_pandas(spark, root, snapshot_id=None):
    return (
        TranscriptTable.load(root, snapshot_id)
        .scan(spark)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
        .reset_index(drop=True)
    )


def test_delete_where_predicate(spark, tmp_path, segments_basic, small_cfg):
    root = _build(spark, tmp_path, segments_basic, small_cfg)
    before = _table_pandas(spark, root)
    n_tool = int((before["role"] == "tool").sum())
    assert n_tool > 0, "fixture must contain tool turns"

    res = delete_where(spark, root, "role = 'tool'", config=small_cfg)
    assert res.committed and res.op == "delete"
    assert res.rows_matched == n_tool

    after = _table_pandas(spark, root)
    assert (after["role"] == "tool").sum() == 0
    # untouched rows byte-identical
    keep = before[before["role"] != "tool"].reset_index(drop=True)
    pd.testing.assert_frame_equal(after, keep, check_dtype=False)


def test_delete_no_match_no_commit(spark, tmp_path, segments_basic, small_cfg):
    root = _build(spark, tmp_path, segments_basic, small_cfg, "t2")
    sid = TranscriptTable.load(root).snapshot.snapshot_id
    res = delete_where(spark, root, "role = 'nonexistent-role'", config=small_cfg)
    assert not res.committed and res.rows_matched == 0
    assert TranscriptTable.load(root).snapshot.snapshot_id == sid


def test_delete_time_travel_and_changelog(spark, tmp_path, segments_basic, small_cfg):
    root = _build(spark, tmp_path, segments_basic, small_cfg, "t3")
    before = _table_pandas(spark, root)
    parent_sid = TranscriptTable.load(root).snapshot.snapshot_id
    res = delete_where(spark, root, "role = 'tool'", config=small_cfg)
    assert res.committed

    # the parent snapshot still resolves to the pre-DML state
    pd.testing.assert_frame_equal(
        _table_pandas(spark, root, parent_sid), before, check_dtype=False
    )
    # the changelog emits exactly the deleted keys as deletes
    t = TranscriptTable.load(root)
    ch = t.changes_between(spark, parent_sid).toPandas()
    assert set(ch["_change_type"]) == {"delete"}
    deleted_keys = set(
        map(tuple, before.loc[before["role"] == "tool", ["conv_id", "turn_idx"]].values)
    )
    assert set(map(tuple, ch[["conv_id", "turn_idx"]].values)) == deleted_keys


def test_dml_delete_blocks_late_cdc_event(spark, tmp_path, small_cfg):
    """A late CDC event older than the DML delete must not resurrect the row."""
    b0 = pd.DataFrame([
        {"op": "I", "conv_id": "c1", "turn_idx": 0, "role": "user",
         "text": "bad row", "tool": None,
         "ts": pd.Timestamp("2024-01-01 00:00:01"), "event_seq": 1},
    ])
    root = _build(spark, tmp_path, [b0], small_cfg, "t4")
    res = delete_where(spark, root, "text = 'bad row'", config=small_cfg)
    assert res.committed and res.rows_matched == 1

    late = pd.DataFrame([
        {"op": "U", "conv_id": "c1", "turn_idx": 0, "role": "user",
         "text": "late fill", "tool": None,
         "ts": pd.Timestamp("2024-01-01 00:00:02"), "event_seq": 2},
    ])
    apply_batch(spark, root, spark.createDataFrame(late), 1, config=small_cfg)
    assert len(_table_pandas(spark, root)) == 0


def test_update_where(spark, tmp_path, segments_basic, small_cfg):
    root = _build(spark, tmp_path, segments_basic, small_cfg, "t5")
    before = _table_pandas(spark, root)
    n_asst = int((before["role"] == "assistant").sum())
    assert n_asst > 0

    res = update_where(
        spark, root, "role = 'assistant'",
        {"text": "upper(text)", "tool": "'redacted'"},
        config=small_cfg,
    )
    assert res.committed and res.op == "update"
    assert res.rows_matched == n_asst

    after = _table_pandas(spark, root)
    assert len(after) == len(before)
    hit = after[after["role"] == "assistant"]
    exp = before[before["role"] == "assistant"]
    assert list(hit["text"]) == [t.upper() for t in exp["text"]]
    assert set(hit["tool"]) == {"redacted"}
    # an update stamps modification time: the DML ts advances past the old
    assert (hit["ts"].values >= exp["ts"].values).all()
    # non-matching rows untouched byte-for-byte
    pd.testing.assert_frame_equal(
        after[after["role"] != "assistant"].reset_index(drop=True),
        before[before["role"] != "assistant"].reset_index(drop=True),
        check_dtype=False,
    )


def test_update_changelog_pre_post(spark, tmp_path, segments_basic, small_cfg):
    root = _build(spark, tmp_path, segments_basic, small_cfg, "t6")
    parent_sid = TranscriptTable.load(root).snapshot.snapshot_id
    update_where(spark, root, "role = 'assistant'", {"text": "'X'"}, config=small_cfg)
    t = TranscriptTable.load(root)
    ch = t.changes_between(spark, parent_sid, pre_post=True).toPandas()
    assert set(ch["_change_type"]) == {"update_preimage", "update_postimage"}
    post = ch[ch["_change_type"] == "update_postimage"]
    assert set(post["text"]) == {"X"}
    pre = ch[ch["_change_type"] == "update_preimage"]
    assert "X" not in set(pre["text"])
    assert len(pre) == len(post)


def test_update_rejects_key_order_unknown(spark, tmp_path, segments_basic, small_cfg):
    root = _build(spark, tmp_path, segments_basic[:1], small_cfg, "t7")
    with pytest.raises(ValueError, match="key/order"):
        update_where(spark, root, "true", {"conv_id": "'x'"}, config=small_cfg)
    with pytest.raises(ValueError, match="key/order"):
        update_where(spark, root, "true", {"ts": "current_timestamp()"}, config=small_cfg)
    with pytest.raises(ValueError, match="unknown"):
        update_where(spark, root, "true", {"nope": "'x'"}, config=small_cfg)


def test_conv_ids_manifest_pruning(spark, tmp_path, segments_basic, small_cfg):
    root = _build(spark, tmp_path, segments_basic, small_cfg, "t8")
    before = _table_pandas(spark, root)
    target = before["conv_id"].iloc[0]
    n_target = int((before["conv_id"] == target).sum())

    res = delete_where(
        spark, root, "true", conv_ids=[target], config=small_cfg
    )
    assert res.committed and res.rows_matched == n_target
    assert res.files_pruned > 0, "bucket pruning must drop files"
    assert len(res.touched_buckets) == 1

    after = _table_pandas(spark, root)
    assert (after["conv_id"] == target).sum() == 0
    assert len(after) == len(before) - n_target


def test_dml_carries_batch_marker(spark, tmp_path, segments_basic, small_cfg):
    root = _build(spark, tmp_path, segments_basic, small_cfg, "t9")
    marker = TranscriptTable.load(root).last_batch_id
    delete_where(spark, root, "role = 'tool'", config=small_cfg)
    t = TranscriptTable.load(root)
    assert t.last_batch_id == marker, "DML must not move the batch marker"
    assert t.snapshot.properties["dml"]["op"] == "delete"
    assert "maintenance" not in t.snapshot.properties
    # exactly-once unchanged: re-delivering an applied batch still skips
    res = apply_batch(
        spark, root, spark.createDataFrame(segments_basic[0]), 0, config=small_cfg
    )
    assert res.skipped


def test_dml_then_replay_consistency(spark, tmp_path, segments_basic, small_cfg):
    """DML interleaved mid-replay: later CDC batches still apply normally and
    rows they re-write (with newer orders than the DML stamp? no — the DML
    stamp is 'now', far future of the fixture) stay at the DML state unless
    the key is re-inserted, while unmatched keys follow the oracle."""
    root = str(tmp_path / "t10")
    TranscriptTable.create(root, n_buckets=small_cfg.n_buckets)
    apply_batch(spark, root, spark.createDataFrame(segments_basic[0]), 0, config=small_cfg)
    mid = _table_pandas(spark, root)
    victim = mid["conv_id"].iloc[-1]
    delete_where(spark, root, "true", conv_ids=[victim], config=small_cfg)
    for i, seg in enumerate(segments_basic[1:], start=1):
        apply_batch(spark, root, spark.createDataFrame(seg), i, config=small_cfg)
    got = _table_pandas(spark, root)
    sim = simulate_replay(segments_basic).table
    # the victim conversation is gone (DML stamp outranks every fixture ts)
    assert (got["conv_id"] == victim).sum() == 0
    # everything else matches the oracle exactly
    exp = sim[sim["conv_id"] != victim].reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[got["conv_id"] != victim].reset_index(drop=True)[LOGICAL_COLS],
        exp[LOGICAL_COLS], check_dtype=False,
    )


# ---------------------------------------------------------------- MERGE INTO

def test_merge_into_update_insert(spark, tmp_path, small_cfg):
    from sfr_ingest_pipeline_spark.table.dml import merge_into

    b0 = pd.DataFrame([
        {"op": "I", "conv_id": "c1", "turn_idx": 0, "role": "user",
         "text": "old", "tool": None,
         "ts": pd.Timestamp("2024-01-01"), "event_seq": 1},
        {"op": "I", "conv_id": "c1", "turn_idx": 1, "role": "assistant",
         "text": "keep me", "tool": "search",
         "ts": pd.Timestamp("2024-01-01"), "event_seq": 2},
    ])
    root = _build(spark, tmp_path, [b0], small_cfg, "m1")
    src = spark.createDataFrame(
        [("c1", 0, "corrected"), ("c2", 0, "brand new")],
        ["conv_id", "turn_idx", "text"],
    )
    res = merge_into(spark, root, src, config=small_cfg)
    assert res.committed and res.op == "merge" and res.rows_matched == 2

    got = _table_pandas(spark, root)
    by_key = {(r.conv_id, r.turn_idx): r for r in got.itertuples()}
    # matched update: text replaced, untouched columns KEEP live values
    assert by_key[("c1", 0)].text == "corrected"
    assert by_key[("c1", 0)].role == "user"
    # unmatched insert: new row, absent payload columns null
    assert by_key[("c2", 0)].text == "brand new"
    assert by_key[("c2", 0)].role is None or pd.isna(by_key[("c2", 0)].role)
    # untouched key untouched
    assert by_key[("c1", 1)].text == "keep me"


def test_merge_into_delete_and_tombstone_revival(spark, tmp_path, small_cfg):
    from sfr_ingest_pipeline_spark.table.dml import delete_where, merge_into

    b0 = pd.DataFrame([
        {"op": "I", "conv_id": "c1", "turn_idx": 0, "role": "user",
         "text": "a", "tool": None,
         "ts": pd.Timestamp("2024-01-01"), "event_seq": 1},
        {"op": "I", "conv_id": "c2", "turn_idx": 0, "role": "user",
         "text": "b", "tool": None,
         "ts": pd.Timestamp("2024-01-01"), "event_seq": 2},
    ])
    root = _build(spark, tmp_path, [b0], small_cfg, "m2")
    delete_where(spark, root, "conv_id = 'c2'", config=small_cfg)

    # WHEN MATCHED DELETE only fires on live rows; tombstoned c2 is
    # not-matched, so with insert it REVIVES past its delete memory
    src = spark.createDataFrame(
        [("c1", 0, "x"), ("c2", 0, "revived")],
        ["conv_id", "turn_idx", "text"],
    )
    res = merge_into(spark, root, src, when_matched="delete",
                     when_not_matched="insert", config=small_cfg)
    assert res.committed
    got = _table_pandas(spark, root)
    keys = set(zip(got["conv_id"], got["turn_idx"]))
    assert ("c1", 0) not in keys, "matched row must be deleted"
    assert ("c2", 0) in keys, "tombstoned key must revive via insert"
    assert got.loc[got["conv_id"] == "c2", "text"].iloc[0] == "revived"


def test_merge_into_validation(spark, tmp_path, small_cfg):
    from sfr_ingest_pipeline_spark.table.dml import merge_into

    b0 = pd.DataFrame([
        {"op": "I", "conv_id": "c1", "turn_idx": 0, "role": "user",
         "text": "a", "tool": None,
         "ts": pd.Timestamp("2024-01-01"), "event_seq": 1},
    ])
    root = _build(spark, tmp_path, [b0], small_cfg, "m3")
    with pytest.raises(ValueError, match="key columns"):
        merge_into(spark, root, spark.createDataFrame([("x",)], ["text"]),
                   config=small_cfg)
    with pytest.raises(ValueError, match="not in the table"):
        merge_into(
            spark, root,
            spark.createDataFrame([("c1", 0, "y")], ["conv_id", "turn_idx", "bogus"]),
            config=small_cfg)
    with pytest.raises(ValueError, match="key-unique"):
        dupsrc = spark.createDataFrame(
            [("c1", 0, "y"), ("c1", 0, "z")], ["conv_id", "turn_idx", "text"])
        merge_into(spark, root, dupsrc, config=small_cfg)
    with pytest.raises(ValueError, match="no actions"):
        merge_into(spark, root,
                   spark.createDataFrame([("c1", 0)], ["conv_id", "turn_idx"]),
                   when_matched=None, when_not_matched=None, config=small_cfg)


def test_merge_into_changelog_and_late_cdc(spark, tmp_path, small_cfg):
    from sfr_ingest_pipeline_spark.table.dml import merge_into

    b0 = pd.DataFrame([
        {"op": "I", "conv_id": "c1", "turn_idx": 0, "role": "user",
         "text": "v1", "tool": None,
         "ts": pd.Timestamp("2024-01-01"), "event_seq": 1},
    ])
    root = _build(spark, tmp_path, [b0], small_cfg, "m4")
    pre_sid = TranscriptTable.load(root).snapshot.snapshot_id
    src = spark.createDataFrame(
        [("c1", 0, "merged"), ("c9", 0, "new")],
        ["conv_id", "turn_idx", "text"])
    merge_into(spark, root, src, config=small_cfg)

    t = TranscriptTable.load(root)
    ch = t.changes_between(spark, pre_sid).toPandas()
    types = dict(zip(zip(ch["conv_id"], ch["turn_idx"]), ch["_change_type"]))
    assert types == {("c1", 0): "update", ("c9", 0): "insert"}
    # marker carried; a late CDC event older than the merge loses LWW
    assert t.last_batch_id == 0
    late = pd.DataFrame([
        {"op": "U", "conv_id": "c1", "turn_idx": 0, "role": "user",
         "text": "late", "tool": None,
         "ts": pd.Timestamp("2024-01-02"), "event_seq": 5},
    ])
    apply_batch(spark, root, spark.createDataFrame(late), 1, config=small_cfg)
    got = _table_pandas(spark, root)
    assert got.loc[got["conv_id"] == "c1", "text"].iloc[0] == "merged"


def test_update_set_sees_pre_advance_order_values(
    spark, tmp_path, segments_basic, small_cfg
):
    """SET expressions evaluate against the row's CURRENT state: an
    expression referencing an order column (ts/event_seq) must see the
    stored value, not the advanced one the new version is committed with."""
    def _with_seq(root):
        # with_meta scan returns raw stored versions; resolve to the LWW
        # winner per key (newest event_seq) before comparing
        raw = (
            TranscriptTable.load(root)
            .scan(spark, with_meta=True)
            .select("conv_id", "turn_idx", "role", "tool", "event_seq")
            .toPandas()
        )
        return (
            raw.sort_values(["conv_id", "turn_idx", "event_seq"])
            .groupby(["conv_id", "turn_idx"], as_index=False)
            .last()
            .reset_index(drop=True)
        )

    root = _build(spark, tmp_path, segments_basic, small_cfg, "tset")
    before = _with_seq(root)
    res = update_where(
        spark, root, "role = 'user'",
        {"tool": "concat('seq=', cast(event_seq as string))"},
        config=small_cfg,
    )
    assert res.committed and res.rows_matched > 0
    after = _with_seq(root)
    merged = before.merge(
        after, on=["conv_id", "turn_idx"], suffixes=("_b", "_a")
    )
    upd = merged[merged["role_b"] == "user"]
    # SET saw the PRE-advance event_seq...
    assert (upd["tool_a"] == "seq=" + upd["event_seq_b"].astype(str)).all()
    # ...while the committed version's order still advanced past it (LWW)
    assert (upd["event_seq_a"] == upd["event_seq_b"] + 1).all()
