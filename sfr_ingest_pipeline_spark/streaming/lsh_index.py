"""Incremental MinHash-LSH index maintenance: the near-dup dedup index
kept in sync with the transcripts table purely from its changelog —
O(changed documents) signature work per refresh, never O(corpus).

The batch pipeline (``functions/dedup.py lsh_candidate_pairs``) rehashes
every document's shingles on every run: one md5 per shingle over the whole
corpus. At 100 TB that recompute dwarfs the actual change volume (a CDC
table mutates a sliver of its documents per span), so the index here
follows the ``IncrementalAggView`` pattern (streaming/incremental.py):

* **stored state** — one row per live turn holding its exact-dup key
  (sha256 of text) and its ``n_bands`` MinHash band signatures. Signatures
  are a pure function of the text, so they never need revalidation —
  only changed keys are rehashed.
* **refresh** — tails ``changes_between(last, cur)``: insert/update rows
  get sha+signatures computed (the ONLY shingle hashing in the refresh,
  O(changed docs)); deletes append a tombstone version. Rows append
  stamped with the source snapshot id; the cursor persists AFTER the
  append, so a crash in between re-appends identical content under the
  same stamp (idempotent recovery — the same contract as the write-side
  batch marker).
* **read** — newest stamp per key wins, tombstones drop (the
  materialize.py serving-view resolution).
* **pairs** — ``candidate_pairs`` derives the SAME candidate set as the
  batch pipeline from the stored index: exact groups collapse to a
  canonical (min doc_id), members pair linearly against their canonical,
  canonical reps band-join through size-capped buckets. No text is read
  and nothing is rehashed — a few narrow-column shuffles over the index.
* **probe** — ``candidate_pairs_for`` restricts pair generation to the
  buckets a given doc set occupies (new docs probing the existing index):
  O(changes x bucket width) instead of O(index).

Equality contract (pinned by tests/test_lsh_index.py): after every
refresh, ``candidate_pairs`` equals ``lsh_candidate_pairs`` run from
scratch on the table's current resolved text — including the
exact-dedup-first collapse and the hot-bucket cap.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from sfr_ingest_pipeline_spark.functions.dedup import minhash_bands, sha_key
from sfr_ingest_pipeline_spark.table.transcript_table import TranscriptTable

STATE_FILE = "_LSH_STATE.json"

_ADD = ("insert", "update")


class IncrementalLshIndex:
    """MinHash-LSH signature index over a :class:`TranscriptTable`'s text,
    maintained from the changelog. ``index_root`` holds versioned parquet
    plus the refresh cursor; ``table_root`` is the source table."""

    def __init__(
        self,
        index_root: str,
        table_root: str,
        text_col: str = "text",
        n_bands: int = 4,
        k: int = 5,
        max_bucket_size: int = 256,
        rows_per_band: int = 2,
        mode: str = "word",
    ):
        self.index_root = index_root
        self.table_root = table_root
        self.text_col = text_col
        self.n_bands = n_bands
        self.k = k
        self.max_bucket_size = max_bucket_size
        self.rows_per_band = rows_per_band
        self.mode = mode
        os.makedirs(index_root, exist_ok=True)

    # ------------------------------------------------------------- cursor
    @property
    def _state_path(self) -> str:
        return os.path.join(self.index_root, STATE_FILE)

    @property
    def _data_dir(self) -> str:
        return os.path.join(self.index_root, "signatures")

    def last_refreshed_snapshot(self) -> int | None:
        if not os.path.exists(self._state_path):
            return None
        with open(self._state_path) as f:
            return json.load(f)["last_snapshot_id"]

    def _save_cursor(self, snapshot_id: int) -> None:
        tmp = f"{self._state_path}.tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump({"last_snapshot_id": snapshot_id,
                       "n_bands": self.n_bands, "k": self.k,
                       "rows_per_band": self.rows_per_band,
                       "mode": self.mode}, f)
        os.replace(tmp, self._state_path)

    # ---------------------------------------------------------- signature
    def _doc_id(self) -> F.Column:
        # stable string id so canonical selection (min) matches a batch run
        # using the same id construction
        return F.concat_ws("#", F.col("conv_id"),
                           F.col("turn_idx").cast("string"))

    def _signed(self, docs: DataFrame) -> DataFrame:
        """(conv_id, turn_idx, doc_id, _sha, sig_0..B-1) for live docs —
        the only place shingles are hashed."""
        base = docs.select(
            "conv_id", "turn_idx",
            self._doc_id().alias("doc_id"),
            F.col(self.text_col).alias("_text"),
        ).withColumn("_sha", sha_key("_text"))
        sigs = minhash_bands(base, "_text", self.n_bands, self.k,
                             self.rows_per_band, self.mode)
        return sigs.drop("_text").withColumn("_dead", F.lit(False))

    def _tombstones(self, keys: DataFrame) -> DataFrame:
        out = keys.select(
            "conv_id", "turn_idx", self._doc_id().alias("doc_id"),
            F.lit(None).cast("string").alias("_sha"),
        )
        for b in range(self.n_bands):
            out = out.withColumn(f"sig_{b}", F.lit(None).cast("string"))
        return out.withColumn("_dead", F.lit(True))

    # ------------------------------------------------------------ refresh
    def refresh(self, spark: SparkSession) -> dict:
        """Advance the index to the table's current snapshot: bootstrap on
        first call, O(changed docs) signature work afterwards."""
        table = TranscriptTable.load(self.table_root)
        cur = table.snapshot.snapshot_id
        last = self.last_refreshed_snapshot()
        if last == cur:
            return {"mode": "noop", "snapshot_id": cur, "docs_signed": 0,
                    "docs_tombstoned": 0}
        if last is None:
            signed = self._signed(table.scan(spark))
            obs = Observation(f"lshb_{uuid.uuid4().hex[:6]}")
            signed = signed.observe(obs, F.count(F.lit(1)).alias("n"))
            signed.withColumn("snapshot_id", F.lit(cur).cast("long")) \
                .write.mode("overwrite").parquet(self._data_dir)
            self._save_cursor(cur)
            return {"mode": "bootstrap", "snapshot_id": cur,
                    "docs_signed": int(obs.get["n"]), "docs_tombstoned": 0}

        changes = table.changes_between(spark, last, cur)
        ups = changes.filter(F.col("_change_type").isin(*_ADD))
        dels = changes.filter(F.col("_change_type") == "delete")
        obs_u = Observation(f"lshu_{uuid.uuid4().hex[:6]}")
        obs_d = Observation(f"lshd_{uuid.uuid4().hex[:6]}")
        out = (
            self._signed(ups).observe(obs_u, F.count(F.lit(1)).alias("n"))
            .unionByName(
                self._tombstones(dels)
                .observe(obs_d, F.count(F.lit(1)).alias("n"))
            )
            .withColumn("snapshot_id", F.lit(cur).cast("long"))
        )
        out.write.mode("append").parquet(self._data_dir)
        self._save_cursor(cur)
        return {"mode": "delta", "snapshot_id": cur,
                "docs_signed": int(obs_u.get["n"]),
                "docs_tombstoned": int(obs_d.get["n"])}

    # --------------------------------------------------------------- read
    def signatures(self, spark: SparkSession) -> DataFrame:
        """Current index: one row per live doc (newest stamp per key wins,
        tombstones drop)."""
        df = spark.read.parquet(self._data_dir)
        payload = [c for c in df.columns if c not in ("conv_id", "turn_idx")]
        winner = F.max_by(
            F.struct(*[F.col(c) for c in payload]), F.col("snapshot_id")
        ).alias("_w")
        cur = df.groupBy("conv_id", "turn_idx").agg(winner).select(
            "conv_id", "turn_idx",
            *[F.col(f"_w.{c}").alias(c) for c in payload],
        )
        return cur.filter(~F.col("_dead")).drop("_dead", "snapshot_id")

    def compact(self, spark: SparkSession) -> int:
        """Rewrite the index to one physical row per key (drops superseded
        versions and tombstones). Returns rows retained."""
        cur = self.signatures(spark).withColumn(
            "snapshot_id",
            F.lit(self.last_refreshed_snapshot() or 0).cast("long"),
        ).withColumn("_dead", F.lit(False))
        obs = Observation(f"lshc_{uuid.uuid4().hex[:6]}")
        cur = cur.observe(obs, F.count(F.lit(1)).alias("n"))
        tmp = f"{self._data_dir}.compact-{uuid.uuid4().hex[:8]}"
        cur.write.mode("overwrite").parquet(tmp)
        old = f"{self._data_dir}.old-{uuid.uuid4().hex[:8]}"
        os.replace(self._data_dir, old)
        os.replace(tmp, self._data_dir)
        import shutil

        shutil.rmtree(old)
        return int(obs.get["n"])

    # -------------------------------------------------------------- pairs
    def _pairs_from(self, idx: DataFrame,
                    restrict: DataFrame | None = None) -> DataFrame:
        """Batch-identical candidate derivation from stored signatures.
        ``restrict``: only emit pairs involving (directly, or through a
        shared bucket with) these doc_ids — the probe path."""
        groups = idx.groupBy("_sha").agg(F.min("doc_id").alias("_canon"))
        exact_members = idx.join(groups, "_sha")
        if restrict is not None:
            # probe: only exact groups containing a restricted doc
            shas_hit = (
                idx.join(restrict, idx["doc_id"] == restrict["_rid"])
                .select("_sha").distinct()
            )
            exact_members = exact_members.join(shas_hit, "_sha", "left_semi")
        exact_pairs = (
            exact_members
            .filter(F.col("doc_id") != F.col("_canon"))
            .select(F.col("_canon").alias("id_a"),
                    F.col("doc_id").alias("id_b"))
        )
        reps = idx.join(
            groups, (idx["_sha"] == groups["_sha"])
            & (idx["doc_id"] == groups["_canon"]),
        ).select(idx["doc_id"], *[f"sig_{b}" for b in range(self.n_bands)])
        pairs = exact_pairs
        for b in range(self.n_bands):
            sb = reps.select("doc_id", F.col(f"sig_{b}").alias("sig"))
            counts = sb.groupBy("sig").agg(F.count(F.lit(1)).alias("_n"))
            ok = counts.filter(
                (F.col("_n") > 1) & (F.col("_n") <= self.max_bucket_size)
            ).select("sig")
            if restrict is not None:
                # probe: only buckets some restricted doc occupies
                hit = (
                    sb.join(restrict, sb["doc_id"] == restrict["_rid"])
                    .select("sig").distinct()
                )
                ok = ok.join(hit, "sig", "left_semi")
            sb = sb.join(ok, "sig")
            left = sb.select(F.col("doc_id").alias("id_a"), "sig")
            right = sb.select(F.col("doc_id").alias("id_b"), "sig")
            p = (
                left.join(right, "sig")
                .filter(F.col("id_a") < F.col("id_b"))
                .select("id_a", "id_b")
            )
            pairs = pairs.unionByName(p)
        return pairs.distinct()

    def candidate_pairs(self, spark: SparkSession) -> DataFrame:
        """All near-dup candidate pairs in the current corpus — equals
        ``lsh_candidate_pairs`` on the table's resolved text, with zero
        shingle hashing (signatures come from the index)."""
        return self._pairs_from(self.signatures(spark))

    def candidate_pairs_for(
        self, spark: SparkSession, doc_ids: DataFrame
    ) -> DataFrame:
        """Pairs touching the given docs' buckets (``doc_ids``: one
        ``doc_id`` string column) — the new-docs-probe-the-index path."""
        restrict = doc_ids.select(F.col("doc_id").alias("_rid")).distinct()
        return self._pairs_from(self.signatures(spark), restrict=restrict)
