"""Binlog/WAL sources: the change-event tail the engine consumes.

The reference tails four external feeds (HathiTrust CSV, Gutenberg RDF,
DOAB OAI-PMH, MET JSON — lambdas/sfr-*-reader in NYPL/sfr-ingest-pipeline,
reconstructed; SURVEY.md §2.1 S1-S4) and unions them into ONE pipeline over
Kinesis (S5/U1). Here each feed is a directory of append-only parquet
segment files with its own (possibly drifted) schema; multiple sources merge
via unionByName(allowMissingColumns=True), which doubles as the
schema-evolution merge on read (SURVEY.md §2.7 U1).

Structured Streaming tracks offsets per source inside one checkpoint, so a
multi-source replay resumes exactly like a single-source one.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from sfr_ingest_pipeline_spark.schema import CHANGE_EVENT_SCHEMA


@dataclass(frozen=True)
class BinlogSource:
    path: str
    schema: T.StructType = CHANGE_EVENT_SCHEMA
    # "parquet" or "jsonl" — the reference's transport is JSON envelopes on
    # Kinesis (SURVEY.md §1.1), so JSONL segment files are a first-class
    # wire format; schemas stay explicit (never inferred) either way.
    format: str = "parquet"
    # event_seq ranges must be disjoint across sources (generator contract);
    # nothing here enforces it — LWW ties on (ts, event_seq) across sources
    # would otherwise be payload-nondeterministic.

    def _load(self, reader):
        if self.format == "jsonl":
            return reader.json(self.path)
        return reader.parquet(self.path)


def _coerce(sources) -> list[BinlogSource]:
    if isinstance(sources, (str, BinlogSource)):
        sources = [sources]
    return [s if isinstance(s, BinlogSource) else BinlogSource(s) for s in sources]


def read_binlog(spark: SparkSession, sources) -> DataFrame:
    """Batch read of one or more binlog dirs, schema-unioned."""
    dfs = [s._load(spark.read.schema(s.schema)) for s in _coerce(sources)]
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out


def read_binlog_stream(
    spark: SparkSession,
    sources,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming tail of one or more binlog dirs, schema-unioned.

    ``maxFilesPerTrigger`` applies per source; at scale pick it so the sum of
    per-source microbatch shuffles fits executor memory."""
    streams = []
    for s in _coerce(sources):
        reader = spark.readStream.schema(s.schema)
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
        streams.append(s._load(reader))
    out = streams[0]
    for df in streams[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out
