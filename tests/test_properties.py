"""Property-based tests (SURVEY.md §5.2.3) — pure-python oracle level, which
pins the *semantics* the Spark engine is separately tested against.

(a) permutation invariance: event order / batch boundaries don't change the
    converged table (LWW is commutative + associative + idempotent);
(b) idempotence: replaying any batch twice == once;
(c) redelivery: injecting exact duplicates changes nothing.
"""

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sfr_ingest_pipeline_spark.oracle import reduce_binlog, simulate_replay


@st.composite
def event_logs(draw):
    n = draw(st.integers(min_value=1, max_value=60))
    rows = []
    base_ts = pd.Timestamp("2024-01-01")
    for seq in range(n):
        conv = draw(st.integers(min_value=0, max_value=4))
        turn = draw(st.integers(min_value=0, max_value=3))
        op = draw(st.sampled_from(["I", "U", "D"]))
        ts_off = draw(st.integers(min_value=0, max_value=20))
        rows.append(
            {
                "op": op,
                "conv_id": f"c{conv}",
                "turn_idx": turn,
                "role": "user" if op != "D" else None,
                "text": f"t{seq}" if op != "D" else None,
                "tool": None,
                "ts": base_ts + pd.Timedelta(seconds=ts_off),
                "event_seq": seq,
            }
        )
    return pd.DataFrame(rows)


def _split(df: pd.DataFrame, k: int) -> list[pd.DataFrame]:
    if len(df) == 0:
        return [df]
    k = max(1, min(k, len(df)))
    size = (len(df) + k - 1) // k
    return [df.iloc[i : i + size].reset_index(drop=True) for i in range(0, len(df), size)]


@given(event_logs(), st.randoms(use_true_random=False), st.integers(1, 5))
@settings(max_examples=40, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_permutation_and_batching_invariance(events, rnd, k):
    base = reduce_binlog([events])
    perm = events.sample(frac=1.0, random_state=rnd.randint(0, 2**31)).reset_index(
        drop=True
    )
    shuffled = simulate_replay(_split(perm, k)).table
    pd.testing.assert_frame_equal(base, shuffled, check_dtype=False)


@given(event_logs(), st.integers(1, 4))
@settings(max_examples=25, deadline=None)
def test_duplicate_redelivery_invariance(events, k):
    base = simulate_replay(_split(events, k)).table
    doubled_batches = []
    for b in _split(events, k):
        doubled_batches.append(pd.concat([b, b], ignore_index=True))
    doubled = simulate_replay(doubled_batches).table
    pd.testing.assert_frame_equal(base, doubled, check_dtype=False)


@given(event_logs(), st.integers(1, 4))
@settings(max_examples=25, deadline=None)
def test_batch_replayed_twice_equals_once(events, k):
    batches = _split(events, k)
    base = simulate_replay(batches).table
    # replay each batch twice back-to-back — LWW + conflict drop make the
    # second application a no-op even without the batch-id marker layer
    twice = simulate_replay([b for b in batches for _ in (0, 1)]).table
    pd.testing.assert_frame_equal(base, twice, check_dtype=False)
