import pandas as pd

from sfr_ingest_pipeline_spark.generator import BinlogGenerator, GeneratorSpec
from sfr_ingest_pipeline_spark.oracle import (
    load_binlog_pandas,
    reduce_binlog,
    simulate_replay,
)


def test_generator_deterministic(tmp_path):
    a = BinlogGenerator(GeneratorSpec(seed=5, n_events=800, n_segments=3))
    b = BinlogGenerator(GeneratorSpec(seed=5, n_events=800, n_segments=3))
    for ta, tb in zip(a.iter_segments(), b.iter_segments()):
        assert ta.equals(tb)


def test_generator_covers_ops(segments_basic):
    ev = pd.concat(segments_basic, ignore_index=True)
    ops = set(ev["op"])
    assert ops == {"I", "U", "D"}
    # exact redelivery duplicates exist
    assert ev["event_seq"].duplicated().any()
    # ts ties exist (different event_seq, same ts)
    dup_ts = ev.drop_duplicates("event_seq")["ts"].duplicated().any()
    assert dup_ts


def test_reduce_matches_simulate(segments_basic):
    g = reduce_binlog(segments_basic)
    r = simulate_replay(segments_basic)
    pd.testing.assert_frame_equal(g, r.table, check_dtype=False)


def test_simulate_counters_conserve(segments_basic):
    r = simulate_replay(segments_basic)
    for c in r.counters:
        assert c.rows_in == c.dedup_dropped + c.events_applied + c.merge_conflicts


def test_late_events_cause_conflicts(binlog_basic):
    segs = load_binlog_pandas(binlog_basic[0])
    r = simulate_replay(segs)
    assert sum(c.merge_conflicts for c in r.counters) > 0


def test_evolving_binlog_schema(binlog_evolving):
    segs = load_binlog_pandas(binlog_evolving[0])
    assert "tool_meta" not in segs[0].columns
    assert "tool_meta" in segs[-1].columns
    g = reduce_binlog(segs)
    assert "tool_meta" in g.columns
