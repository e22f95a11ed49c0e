"""Build the checked-in golden replay fixtures (FIXTURES.md §A4).

Writes tests/fixtures/golden_basic/: a small seeded binlog (I/U/D, exact
duplicates, late events, ts ties, a mid-replay schema widening) plus the
expected converged table computed by the independent pandas oracle. The
fixtures are committed so correctness is pinned even if the generator
evolves. Regenerate ONLY deliberately:  python scripts/make_fixtures.py
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    import pandas as pd

    from sfr_ingest_pipeline_spark.generator import BinlogGenerator, GeneratorSpec
    from sfr_ingest_pipeline_spark.oracle import load_binlog_pandas, reduce_binlog

    base = os.path.join(REPO, "tests", "fixtures", "golden_basic")
    binlog = os.path.join(base, "binlog")
    os.makedirs(binlog, exist_ok=True)

    spec = GeneratorSpec(
        seed=1234, n_conversations=30, n_events=1500, n_segments=5,
        delete_ratio=0.1, duplicate_ratio=0.1, late_ratio=0.1,
        ts_tie_ratio=0.15, schema_v2_from_segment=3,
    )
    n = BinlogGenerator(spec).write_binlog(binlog)
    golden = reduce_binlog(load_binlog_pandas(binlog))
    golden.to_parquet(os.path.join(base, "expected.parquet"), index=False)
    pd.DataFrame([{"events": n, "spec": str(spec)}]).to_json(
        os.path.join(base, "MANIFEST.json"), orient="records"
    )
    print(f"{n} events, {len(golden)} expected rows -> {base}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
