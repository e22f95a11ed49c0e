"""Iceberg-style snapshot-log Parquet table, built from scratch (SURVEY.md §7.3).

No Iceberg/Delta jars exist in this sandbox (SURVEY.md §0.4), so the table
layer the north rule assumes is implemented here with the same core ideas:

  * immutable Parquet data files + a JSON snapshot log under ``metadata/``;
  * a ``version-hint.text`` pointer updated by atomic rename — the single
    commit point (crash before rename = no commit, after = committed);
  * snapshots carry ``properties`` (idempotent batch-id markers, counters,
    per-partition lineage — BASELINE.json:6) and a schema (additive
    evolution, ALTER-on-write);
  * data files are clustered into hash buckets on ``conv_id``
    (pmod(xxhash64(conv_id), n_buckets)); the manifest records per-file
    bucket + row count + conv_id min/max so MERGE prunes to touched buckets
    and copy-on-write rewrites only those (untouched files are carried
    forward by reference into the child snapshot);
  * time travel: load any retained snapshot by id or by batch-id.

Physical row schema = logical transcript schema + ``event_seq`` (LWW minor
order of the winning write) + ``_deleted`` tombstone flag. Tombstones keep
late-arriving older events from resurrecting deleted turns; logical scans
filter them out.

At 100 TB: the JSON manifest holds one small record per data file — with
2^14 buckets × a few files each this is thousands of entries, fine for a
driver-side JSON read per microbatch. A production variant would shard
manifests (Iceberg manifest lists); the commit protocol here is the same.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import asdict, dataclass, field

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sfr_ingest_pipeline_spark.schema import TRANSCRIPT_SCHEMA

META_COLS = ("event_seq", "_deleted")


def bucket_expr(conv_col, n_buckets: int):
    """Bucket id for a conv_id column — the table's clustering transform."""
    return F.pmod(F.xxhash64(conv_col), F.lit(n_buckets)).cast("int")


def physical_schema(logical: T.StructType) -> T.StructType:
    fields = list(logical.fields)
    fields.append(T.StructField("event_seq", T.LongType(), True))
    fields.append(T.StructField("_deleted", T.BooleanType(), True))
    return T.StructType(fields)


@dataclass
class DataFileInfo:
    path: str            # relative to table root
    bucket: int
    rows: int
    live_rows: int       # rows minus tombstones (best-effort, for lineage)
    conv_id_min: str | None = None
    conv_id_max: str | None = None
    # "base": full bucket state (copy-on-write output / compaction output);
    # "delta": merge-on-read append containing only that batch's winners —
    # readers LWW-reduce base+deltas per key (SURVEY.md §4.3)
    kind: str = "base"


@dataclass
class Snapshot:
    snapshot_id: int
    parent_id: int | None
    created_us: int
    schema_id: int
    schema_json: dict
    n_buckets: int
    files: list[DataFileInfo] = field(default_factory=list)
    properties: dict = field(default_factory=dict)
    # natural key + LWW order persisted with the table so the merge-on-read
    # read path honors a non-default EngineConfig (they default for tables
    # created before this field existed)
    key_cols: list[str] = field(default_factory=lambda: ["conv_id", "turn_idx"])
    order_cols: list[str] = field(default_factory=lambda: ["ts", "event_seq"])

    @property
    def schema(self) -> T.StructType:
        return T.StructType.fromJson(self.schema_json)

    def to_json(self) -> dict:
        d = asdict(self)
        return d

    @staticmethod
    def from_json(d: dict) -> "Snapshot":
        files = [DataFileInfo(**f) for f in d.pop("files")]
        return Snapshot(files=files, **d)


def _atomic_write_json(path: str, payload: dict) -> None:
    tmp = f"{path}.tmp-{uuid.uuid4().hex}"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(payload, f, ensure_ascii=False, separators=(",", ":"))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)  # atomic on POSIX


def _atomic_write_text(path: str, text: str) -> None:
    tmp = f"{path}.tmp-{uuid.uuid4().hex}"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(text)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


class TranscriptTable:
    """Single-writer snapshot-log table rooted at ``root`` (local or shared FS)."""

    def __init__(self, root: str, snapshot: Snapshot):
        self.root = root
        self.snapshot = snapshot

    # ------------------------------------------------------------------ io
    @property
    def _meta_dir(self) -> str:
        return os.path.join(self.root, "metadata")

    @staticmethod
    def _snap_path(root: str, snapshot_id: int) -> str:
        return os.path.join(root, "metadata", f"v{snapshot_id:08d}.json")

    @classmethod
    def create(
        cls,
        root: str,
        schema: T.StructType = TRANSCRIPT_SCHEMA,
        n_buckets: int = 16,
        properties: dict | None = None,
        key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
        order_cols: tuple[str, ...] = ("ts", "event_seq"),
    ) -> "TranscriptTable":
        os.makedirs(os.path.join(root, "metadata"), exist_ok=True)
        os.makedirs(os.path.join(root, "data"), exist_ok=True)
        snap = Snapshot(
            snapshot_id=1,
            parent_id=None,
            created_us=int(time.time() * 1e6),
            schema_id=0,
            schema_json=schema.jsonValue(),
            n_buckets=n_buckets,
            files=[],
            properties=properties or {},
            key_cols=list(key_cols),
            order_cols=list(order_cols),
        )
        _atomic_write_json(cls._snap_path(root, 1), snap.to_json())
        _atomic_write_text(os.path.join(root, "metadata", "version-hint.text"), "1")
        return cls(root, snap)

    @classmethod
    def load(cls, root: str, snapshot_id: int | None = None) -> "TranscriptTable":
        if snapshot_id is None:
            hint = os.path.join(root, "metadata", "version-hint.text")
            with open(hint, encoding="utf-8") as f:
                snapshot_id = int(f.read().strip())
        with open(cls._snap_path(root, snapshot_id), encoding="utf-8") as f:
            snap = Snapshot.from_json(json.load(f))
        return cls(root, snap)

    @classmethod
    def exists(cls, root: str) -> bool:
        return os.path.exists(os.path.join(root, "metadata", "version-hint.text"))

    @classmethod
    def load_or_create(cls, root: str, **create_kwargs) -> "TranscriptTable":
        return cls.load(root) if cls.exists(root) else cls.create(root, **create_kwargs)

    def load_snapshot_as_of_batch(self, batch_id: int) -> "TranscriptTable":
        """Time travel: latest snapshot whose committed batch_id <= batch_id."""
        sid = self.snapshot.snapshot_id
        best = None
        for i in range(1, sid + 1):
            path = self._snap_path(self.root, i)
            if not os.path.exists(path):
                continue
            with open(path, encoding="utf-8") as f:
                s = Snapshot.from_json(json.load(f))
            b = s.properties.get("batch_id")
            if b is None or b <= batch_id:
                best = s
        if best is None:
            raise ValueError(f"no snapshot at or before batch {batch_id}")
        return TranscriptTable(self.root, best)

    # ------------------------------------------------------------ metadata
    @property
    def schema(self) -> T.StructType:
        return self.snapshot.schema

    @property
    def n_buckets(self) -> int:
        return self.snapshot.n_buckets

    @property
    def last_batch_id(self) -> int | None:
        return self.snapshot.properties.get("batch_id")

    def files_in_buckets(self, buckets: set[int] | None = None) -> list[DataFileInfo]:
        if buckets is None:
            return list(self.snapshot.files)
        return [f for f in self.snapshot.files if f.bucket in buckets]

    def history(self) -> list[Snapshot]:
        out = []
        for i in range(1, self.snapshot.snapshot_id + 1):
            path = self._snap_path(self.root, i)
            if os.path.exists(path):
                with open(path, encoding="utf-8") as f:
                    out.append(Snapshot.from_json(json.load(f)))
        return out

    # ---------------------------------------------------------------- scan
    def delta_file_counts(self, buckets: set[int] | None = None) -> dict[int, int]:
        """Distinct delta COMMITS per bucket (a commit may write several files
        per bucket via write-salting; compaction policy counts commits)."""
        commits: dict[int, set[str]] = {}
        for f in self.files_in_buckets(buckets):
            if f.kind == "delta":
                commit_dir = f.path.split("/")[1] if "/" in f.path else f.path
                commits.setdefault(f.bucket, set()).add(commit_dir)
        return {b: len(s) for b, s in commits.items()}

    def scan(
        self,
        spark: SparkSession,
        with_meta: bool = False,
        buckets: set[int] | None = None,
    ) -> DataFrame:
        """Read the table (optionally pruned to buckets) as a DataFrame.

        Old data files written before a schema widening lack the new columns;
        reading with the snapshot's explicit physical schema null-fills them
        (additive-evolution read path, BASELINE.json:6).

        With merge-on-read delta files present, a key may have several
        versions across base+deltas; ``with_meta=True`` returns the raw
        multi-version rows (the MERGE operator's fused aggregation resolves
        them along with the batch), while the logical scan LWW-reduces per
        key by (ts, event_seq) and drops tombstones.
        """
        phys = physical_schema(self.schema)
        files = self.files_in_buckets(buckets)
        if not files:
            df = spark.createDataFrame([], phys)
        else:
            paths = [os.path.join(self.root, f.path) for f in files]
            df = spark.read.schema(phys).parquet(*paths)
        if with_meta:
            return df
        if any(f.kind == "delta" for f in files):
            key_cols = list(self.snapshot.key_cols)
            payload = [c for c in df.columns if c not in key_cols]
            winner = F.max_by(
                F.struct(*[F.col(c) for c in payload]),
                F.struct(*[F.col(c) for c in self.snapshot.order_cols]),
            ).alias("_w")
            df = df.groupBy(*key_cols).agg(winner).select(
                *key_cols, *[F.col(f"_w.{c}").alias(c) for c in payload]
            )
        return df.filter(~F.col("_deleted")).drop(*META_COLS)

    def read_conversation(self, spark: SparkSession, conv_id: str) -> DataFrame:
        """Point lookup: one conversation's live turns.

        Prunes to the conv's hash bucket via the manifest, then drops files
        whose footer (conv_id min/max) excludes the key — O(bucket slice)
        I/O instead of a table scan. This is the engine's analog of the
        reference's identifier lookup (SURVEY.md §2.3 J1) on the read side."""
        # driver-side twin of bucket_expr (verified bit-exact vs Spark's
        # xxhash64 in tests) — no 1-row Spark job per lookup
        from sfr_ingest_pipeline_spark.functions.xxh import bucket_of

        bucket = bucket_of(conv_id, self.n_buckets)
        files = [
            f for f in self.files_in_buckets({bucket})
            if (f.conv_id_min is None or f.conv_id_min <= conv_id)
            and (f.conv_id_max is None or conv_id <= f.conv_id_max)
        ]
        phys = physical_schema(self.schema)
        if not files:
            df = spark.createDataFrame([], phys)
        else:
            df = spark.read.schema(phys).parquet(
                *[os.path.join(self.root, f.path) for f in files]
            )
        df = df.filter(F.col("conv_id") == conv_id)
        if any(f.kind == "delta" for f in files):
            key_cols = list(self.snapshot.key_cols)
            payload = [c for c in df.columns if c not in key_cols]
            winner = F.max_by(
                F.struct(*[F.col(c) for c in payload]),
                F.struct(*[F.col(c) for c in self.snapshot.order_cols]),
            ).alias("_w")
            df = df.groupBy(*key_cols).agg(winner).select(
                *key_cols, *[F.col(f"_w.{c}").alias(c) for c in payload],
            )
        return (
            df.filter(~F.col("_deleted")).drop(*META_COLS)
            .orderBy("turn_idx")
        )

    # -------------------------------------------------------------- commit
    def commit(
        self,
        replace_buckets: set[int],
        new_files: list[DataFileInfo],
        properties: dict,
        schema: T.StructType | None = None,
    ) -> "TranscriptTable":
        """Copy-on-write commit: replace all files of ``replace_buckets`` with
        ``new_files``; carry every other file forward by reference. The
        version-hint rename is the atomic commit point (SURVEY.md §4.3/§4.4)."""
        cur = self.snapshot
        kept = [f for f in cur.files if f.bucket not in replace_buckets]
        schema_json = (schema or self.schema).jsonValue()
        schema_id = cur.schema_id + (0 if schema_json == cur.schema_json else 1)
        snap = Snapshot(
            snapshot_id=cur.snapshot_id + 1,
            parent_id=cur.snapshot_id,
            created_us=int(time.time() * 1e6),
            schema_id=schema_id,
            schema_json=schema_json,
            n_buckets=cur.n_buckets,
            files=kept + new_files,
            properties=properties,
            key_cols=list(cur.key_cols),
            order_cols=list(cur.order_cols),
        )
        _atomic_write_json(self._snap_path(self.root, snap.snapshot_id), snap.to_json())
        # COMMIT POINT:
        _atomic_write_text(
            os.path.join(self._meta_dir, "version-hint.text"), str(snap.snapshot_id)
        )
        return TranscriptTable(self.root, snap)

    # -------------------------------------------------------- file harvest
    def harvest_files(
        self, commit_dir_rel: str, kind_for_bucket=None
    ) -> list[DataFileInfo]:
        """Collect DataFileInfo for files written under data/<commit_dir_rel>/
        (layout: _bucket=K/part-*.parquet from a partitionBy write). Reads
        only parquet footers (row counts + conv_id min/max stats)."""
        base = os.path.join(self.root, commit_dir_rel)
        out: list[DataFileInfo] = []
        for dirpath, _dirnames, filenames in os.walk(base):
            part = os.path.basename(dirpath)
            if not part.startswith("_bucket="):
                continue
            bucket = int(part.split("=", 1)[1])
            for fn in sorted(filenames):
                if not fn.endswith(".parquet"):
                    continue
                full = os.path.join(dirpath, fn)
                pf = pq.ParquetFile(full)
                md = pf.metadata
                rows = md.num_rows
                cmin = cmax = None
                live = rows
                schema_names = [md.schema.column(i).name for i in range(md.num_columns)]
                conv_idx = schema_names.index("conv_id") if "conv_id" in schema_names else None
                for rg in range(md.num_row_groups):
                    if conv_idx is not None:
                        st = md.row_group(rg).column(conv_idx).statistics
                        if st is not None and st.has_min_max:
                            mn, mx = st.min, st.max
                            cmin = mn if cmin is None else min(cmin, mn)
                            cmax = mx if cmax is None else max(cmax, mx)
                if "_deleted" in schema_names:
                    # exact live count: the bit-packed boolean chunk is tiny
                    # (~rows/8 bytes) so counting tombstones here is cheaper
                    # than a Spark job and keeps the documented semantics
                    # ('rows minus tombstones') honest
                    dcol = pf.read(columns=["_deleted"]).column("_deleted")
                    import pyarrow.compute as pc

                    live = rows - int(
                        pc.sum(pc.fill_null(dcol, False).cast("int64")).as_py() or 0
                    )
                rel = os.path.relpath(full, self.root)
                kind = (
                    kind_for_bucket(bucket) if callable(kind_for_bucket)
                    else (kind_for_bucket or "base")
                )
                out.append(
                    DataFileInfo(
                        path=rel, bucket=bucket, rows=rows, live_rows=live,
                        conv_id_min=cmin, conv_id_max=cmax, kind=kind,
                    )
                )
        return out
