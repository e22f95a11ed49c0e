"""Corpus-scale evidence for the composed dedup pipeline (round-4 verdict
item 7): run ``near_dedup_kept_docs`` (MinHash+LSH -> n-gram-Jaccard verify
-> connected components -> canonical anti-join) and ``cross_doc_ngram_dup``
end-to-end on a ~1M-document synthetic corpus, and report

  * wall-time per stage at full corpus size,
  * LSH hot-bucket cap trip counts (buckets dropped per band, docs inside),
  * a sampled-subset EXACTNESS check: the same two queries on a
    deterministic 1-in-``sample_mod`` subset, Spark vs the registered
    DuckDB oracle SQL (the identical strings the driver gate runs).

Corpus is synthesized fully engine-side (spark.range + xxhash64 position
draws + a broadcast join against the REAL testdata token stream — no
driver-side loops, no RNG), deterministic for any (n_docs, fractions).
Words are sampled by uniform position from the sf0.1 documents' token
instances, so the synthetic corpus reproduces the real tables' unigram
(and therefore Zipfian char-shingle frequency) distribution — this is
what makes single-min-per-band LSH bucket sizes realistic: a uniform
md5-word corpus has a 16^5 shingle pool, every min-shingle bucket
balloons, and candidate generation degenerates (measured before this
design: a 20k-doc hex corpus stalled the verify join).

  * ~88% unique docs: family == doc_id, 40-120 words;
  * ~5%  exact duplicates of a random earlier family (variant 0);
  * ~5%  near duplicates: variant v in 1..3 rewrites words at positions
         i % 29 == v % 29 (~3% of words -> char-5-gram Jaccard ~0.9);
  * ~2%  a single hot boilerplate family where every doc is a distinct
         few-words-off variant: thousands of distinct texts sharing band
         signatures -> the 256-distinct-text bucket cap genuinely trips.

Usage: python scripts/corpus_dedup_bench.py [n_docs] [sample_mod]
Prints one JSON line; paste the numbers into BENCH/SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _work_base() -> str:
    return "/dev/shm/spark_graft_corpus" if os.path.isdir("/dev/shm") else "/tmp/spark_graft_corpus"


def synthesize(
    spark,
    n_docs: int,
    out_dir: str,
    token_source: str = "/root/testdata/sf0.1/documents.parquet",
) -> dict:
    """Write documents.parquet with the shared test-table schema.

    Token stream: every word instance of the real sf0.1 documents, indexed
    by position; each synthetic word is drawn by xxhash64-uniform position,
    so unigram (hence shingle) frequencies match real text exactly."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    tokens = spark.read.parquet(token_source).select(
        F.explode(F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).alias("w")
    )
    # single-partition row_number is fine here: ~1M short strings, one-time
    # bench setup (the corpus itself is built distributed)
    tokens = tokens.select(
        (F.row_number().over(Window.orderBy(F.lit(1))) - 1).alias("pos"), "w"
    )
    tokens = tokens.persist()
    n_tok = tokens.count()

    n_uniq = int(n_docs * 0.88)
    n_exact = int(n_docs * 0.05)
    n_near = int(n_docs * 0.05)
    # remainder is the hot boilerplate family (reserved fam == n_uniq)
    b_exact = n_uniq + n_exact
    b_near = b_exact + n_near

    df = spark.range(0, n_docs, 1, 64).select(F.col("id").alias("doc_id"))
    fam = (
        F.when(F.col("doc_id") < n_uniq, F.col("doc_id"))
        .when(
            F.col("doc_id") < b_exact,
            F.abs(F.xxhash64(F.lit("e"), F.col("doc_id"))) % n_uniq,
        )
        .when(
            F.col("doc_id") < b_near,
            F.abs(F.xxhash64(F.lit("n"), F.col("doc_id"))) % n_uniq,
        )
        .otherwise(F.lit(n_uniq))
    )
    variant = (
        F.when(F.col("doc_id") < b_exact, F.lit(0))
        .when(F.col("doc_id") < b_near, (F.col("doc_id") % 3 + 1).cast("int"))
        .otherwise(F.col("doc_id").cast("int"))
    )
    words = (
        df.withColumn("fam", fam)
        .withColumn("variant", variant)
        .select(
            "doc_id",
            "fam",
            "variant",
            F.explode(F.sequence(F.lit(1), (F.lit(40) + F.col("fam") % 80).cast("int"))).alias("i"),
        )
        .withColumn(
            "pos",
            F.when(
                (F.col("variant") > 0) & (F.col("i") % 29 == F.col("variant") % 29),
                F.abs(F.xxhash64(F.lit("m"), F.col("fam"), F.col("i"), F.col("variant"))),
            ).otherwise(F.abs(F.xxhash64(F.lit("w"), F.col("fam"), F.col("i"))))
            % n_tok,
        )
    )
    docs = (
        words.join(F.broadcast(tokens), "pos")
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "w"))), lambda s: s["w"]
                ),
            ).alias("text")
        )
    )
    out = docs.select(
        "doc_id",
        "text",
        F.lit("en").alias("lang"),
        F.lit("synthetic").alias("source"),
        F.length("text").cast("long").alias("n_chars"),
    )
    t0 = time.time()
    out.repartition(32).write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))
    tokens.unpersist()
    return {
        "n_docs": n_docs,
        "n_tokens_pool": int(n_tok),
        "n_uniq": n_uniq,
        "n_exact": n_exact,
        "n_near": n_near,
        "n_hot": n_docs - b_near,
        "synth_sec": round(time.time() - t0, 2),
    }


def bucket_cap_trips(spark, sf_dir: str, max_bucket_size: int = 256) -> dict:
    """Count LSH band buckets over the cap (the pairs they would have
    emitted are the quadratic trap the cap exists to prevent)."""
    from pyspark.sql import functions as F

    from sfr_ingest_pipeline_spark.functions.dedup import minhash_bands, sha_key

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    base = docs.select("doc_id", "text").withColumn("_sha", sha_key("text"))
    reps = (
        base.groupBy("_sha").agg(F.min("doc_id").alias("doc_id"), F.min("text").alias("text"))
        .select("doc_id", "text")
    )
    sigs = minhash_bands(reps, "text", 4, 5, rows_per_band=2, mode="word")
    out = {}
    for b in range(4):
        sizes = sigs.groupBy(F.col(f"sig_{b}").alias("sig")).agg(F.count(F.lit(1)).alias("n"))
        row = sizes.agg(
            F.sum(F.when(F.col("n") > max_bucket_size, 1).otherwise(0)).alias("capped_buckets"),
            F.sum(F.when(F.col("n") > max_bucket_size, F.col("n")).otherwise(0)).alias("docs_in_capped"),
            F.sum(
                F.when(F.col("n") > max_bucket_size, F.col("n") * (F.col("n") - 1) / 2).otherwise(0)
            ).alias("pairs_avoided"),
        ).collect()[0]
        out[f"band_{b}"] = {
            "capped_buckets": int(row["capped_buckets"] or 0),
            "docs_in_capped": int(row["docs_in_capped"] or 0),
            "pairs_avoided": int(row["pairs_avoided"] or 0),
        }
    return out


def sampled_exactness(spark, sf_dir: str, sample_mod: int, work: str) -> dict:
    """Deterministic 1-in-sample_mod subset; Spark queries vs the registered
    DuckDB oracle SQL (the exact strings the driver gate runs)."""
    import duckdb

    import __spark_entry__ as entrymod
    from scripts.check_oracle import normalize_frame

    sub_dir = os.path.join(work, "subset")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    docs.filter(docs.doc_id % sample_mod == 0).repartition(8).write.mode("overwrite").parquet(
        os.path.join(sub_dir, "documents.parquet")
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sub_dir}/documents.parquet/*.parquet')"
    )
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    res = {}
    for name in ("near_dedup_kept_docs", "cross_doc_ngram_dup"):
        t0 = time.time()
        got = qs[name](spark, sub_dir).toPandas()
        t_spark = time.time() - t0
        t0 = time.time()
        exp = con.execute(oracles[name]).fetchdf()
        t_duck = time.time() - t0
        g, e = normalize_frame(got), normalize_frame(exp)
        res[name] = {
            "rows_spark": len(got),
            "rows_oracle": len(exp),
            "exact": bool(len(g) == len(e) and sorted(g.columns) == sorted(e.columns) and g.equals(e)),
            "spark_sec": round(t_spark, 2),
            "duckdb_sec": round(t_duck, 2),
        }
    return res


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    sample_mod = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    from pyspark.sql import functions as F

    from sfr_ingest_pipeline_spark.queries import (
        q_cross_doc_ngram_dup,
        q_near_dedup_kept_docs,
    )
    from sfr_ingest_pipeline_spark.session import get_spark

    work = _work_base()
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work, exist_ok=True)
    spark = get_spark(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"metric": "corpus_dedup_1m"}
    out["synth"] = synthesize(spark, n_docs, work)

    t0 = time.time()
    kept = q_near_dedup_kept_docs(spark, work).count()
    out["near_dedup_kept_docs"] = {
        "sec": round(time.time() - t0, 2),
        "kept_docs": int(kept),
        "dropped_docs": int(n_docs - kept),
    }

    t0 = time.time()
    row = q_cross_doc_ngram_dup(spark, work).agg(
        F.count(F.lit(1)).alias("docs"),
        F.round(F.avg("shared_frac"), 4).alias("avg_shared_frac"),
        F.sum(F.when(F.col("shared_frac") >= 0.5, 1).otherwise(0)).alias("docs_half_duplicated"),
    ).collect()[0]
    out["cross_doc_ngram_dup"] = {
        "sec": round(time.time() - t0, 2),
        "docs": int(row["docs"]),
        "avg_shared_frac": float(row["avg_shared_frac"]),
        "docs_half_duplicated": int(row["docs_half_duplicated"]),
    }

    t0 = time.time()
    out["bucket_cap"] = bucket_cap_trips(spark, work)
    out["bucket_cap"]["sec"] = round(time.time() - t0, 2)

    out["sampled_exactness"] = sampled_exactness(spark, work, sample_mod, work)
    out["sample_mod"] = sample_mod

    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
