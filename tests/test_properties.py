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


# ---------------------------------------------------------------------------
# Field-level (coalesce) merge properties — round 3. Batch BOUNDARIES are
# part of coalesce semantics (committed state folds at its row order), so
# unlike row mode the properties fix the boundaries and vary what is
# allowed to vary: within-batch order, exact redeliveries, re-application.
# ---------------------------------------------------------------------------


@st.composite
def partial_event_logs(draw):
    n = draw(st.integers(min_value=1, max_value=60))
    rows = []
    base_ts = pd.Timestamp("2024-01-01")
    for seq in range(n):
        conv = draw(st.integers(min_value=0, max_value=4))
        turn = draw(st.integers(min_value=0, max_value=3))
        op = draw(st.sampled_from(["I", "U", "U", "D"]))
        ts_off = draw(st.integers(min_value=0, max_value=20))
        # partial updates: each payload field independently present
        has_role = op != "D" and draw(st.booleans())
        has_text = op != "D" and draw(st.booleans())
        has_tool = op != "D" and draw(st.booleans())
        rows.append(
            {
                "op": op,
                "conv_id": f"c{conv}",
                "turn_idx": turn,
                "role": "user" if has_role else None,
                "text": f"t{seq}" if has_text else None,
                "tool": "search" if has_tool else None,
                "ts": base_ts + pd.Timedelta(seconds=ts_off),
                "event_seq": seq,
            }
        )
    return pd.DataFrame(rows)


@given(partial_event_logs(), st.randoms(use_true_random=False), st.integers(1, 5))
@settings(max_examples=40, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_coalesce_within_batch_permutation_invariance(events, rnd, k):
    batches = _split(events, k)
    base = simulate_replay(batches, column_merge="coalesce").table
    shuffled_batches = [
        b.sample(frac=1.0, random_state=rnd.randint(0, 2**31)).reset_index(drop=True)
        for b in batches
    ]
    got = simulate_replay(shuffled_batches, column_merge="coalesce").table
    pd.testing.assert_frame_equal(base, got, check_dtype=False)


@given(partial_event_logs(), st.integers(1, 4))
@settings(max_examples=25, deadline=None)
def test_coalesce_duplicate_redelivery_invariance(events, k):
    batches = _split(events, k)
    base = simulate_replay(batches, column_merge="coalesce").table
    doubled = simulate_replay(
        [pd.concat([b, b], ignore_index=True) for b in batches],
        column_merge="coalesce",
    ).table
    pd.testing.assert_frame_equal(base, doubled, check_dtype=False)


@given(partial_event_logs(), st.integers(1, 4))
@settings(max_examples=25, deadline=None)
def test_coalesce_batch_replayed_twice_equals_once(events, k):
    batches = _split(events, k)
    base = simulate_replay(batches, column_merge="coalesce").table
    twice = simulate_replay(
        [b for b in batches for _ in (0, 1)], column_merge="coalesce"
    ).table
    pd.testing.assert_frame_equal(base, twice, check_dtype=False)


@given(partial_event_logs())
@settings(max_examples=25, deadline=None)
def test_coalesce_single_batch_equals_exact_fold(events):
    """With ONE batch (full per-column order info) the engine fold equals
    the exact global per-column LWW computed independently here."""
    got = simulate_replay([events], column_merge="coalesce").table
    ev = events.drop_duplicates(subset=["event_seq"]).sort_values(
        ["ts", "event_seq"], kind="mergesort"
    )
    state: dict = {}
    for r in ev.to_dict("records"):
        key = (r["conv_id"], r["turn_idx"])
        if r["op"] == "D":
            state[key] = {"_del": (r["ts"], r["event_seq"]), "cols": {},
                          "ord": (r["ts"], r["event_seq"])}
            continue
        cur = state.setdefault(key, {"_del": None, "cols": {}, "ord": None})
        cur["ord"] = (r["ts"], r["event_seq"])
        cur["_last_live"] = (r["ts"], r["event_seq"])
        for c in ("role", "text", "tool"):
            if r[c] is not None:
                cur["cols"][c] = r[c]
    rows = []
    for (conv, turn), cur in state.items():
        if cur.get("_last_live") is None or (
            cur["_del"] is not None and cur["_del"] > cur["_last_live"]
        ):
            continue  # tombstone at head
        rows.append({
            "conv_id": conv, "turn_idx": turn,
            "role": cur["cols"].get("role"),
            "text": cur["cols"].get("text"),
            "tool": cur["cols"].get("tool"),
            "ts": cur["ord"][0],
        })
    import pandas as _pd

    expect = _pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    ).sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["conv_id", "turn_idx", "role", "text", "tool", "ts"]],
        expect, check_dtype=False,
    )
