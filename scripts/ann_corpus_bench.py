"""Corpus-scale ANN evidence: brute-force vs IVF vs PQ/ADC on a 1M-vector
synthetic embedding corpus with real cluster structure.

Corpus is engine-side and deterministic (no driver loops, no RNG): 1M
vectors of dim d in n_families gaussian-ish families — vector = family
centroid + hash-derived noise — so IVF/PQ face realistic cluster geometry
(uniform-random embeddings would make coarse quantization look better
than it is: every cell is equally boring).

Reports, for 64 query vectors (drawn from family centroids + noise, so
ground-truth neighbors exist):
  * build costs: IVF k-means train + assign; PQ codebook train + encode;
  * query wall per variant (brute / IVF nprobe in {1,4} / PQ, PQ+refine);
  * recall@10 of each ANN variant vs the exact brute-force result.

Usage: python scripts/ann_corpus_bench.py [n_vecs] [dim] [n_families]
Prints one JSON line; paste into BENCH/SCALE.md.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n_fam = int(sys.argv[3]) if len(sys.argv) > 3 else 1024

    from pyspark.sql import functions as F

    from sfr_ingest_pipeline_spark.functions import vector as V
    from sfr_ingest_pipeline_spark.session import get_spark

    base = "/dev/shm/spark_graft_ann" if os.path.isdir("/dev/shm") else "/tmp/spark_graft_ann"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    spark = get_spark(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    spark.sparkContext.setLogLevel("ERROR")

    def unit(col):  # hash-uniform in [-1, 1), pure codegen
        return (F.pmod(col, F.lit(2_000_003)).cast("double")
                / F.lit(1_000_001.5)) - F.lit(1.0)

    def vec_expr(seed, fam, noise):
        # centroid(fam)[d] + noise * u(seed, fam, d)
        return F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda d: (
                unit(F.xxhash64(F.lit("c"), fam, d))
                + F.lit(noise) * unit(F.xxhash64(F.lit(seed), fam, F.col("id"), d))
            ).cast("float"),
        )

    t0 = time.time()
    corpus = (
        spark.range(0, n_vecs, 1, 64)
        .withColumn("_fam", F.pmod(F.xxhash64(F.lit("f"), F.col("id")), F.lit(n_fam)))
        .select(F.col("id").alias("vec_id"),
                vec_expr("n", F.col("_fam"), 0.25).alias("embedding"))
    )
    corpus_path = os.path.join(base, "corpus.parquet")
    corpus.write.parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)
    out = {"metric": "ann_corpus_1m", "n_vecs": n_vecs, "dim": dim,
           "n_families": n_fam, "synth_sec": round(time.time() - t0, 2)}

    queries = (
        spark.range(0, 16, 1, 4)
        .withColumn("_fam", F.pmod(F.xxhash64(F.lit("qf"), F.col("id")), F.lit(n_fam)))
        .select((F.col("id") + n_vecs).alias("vec_id"),
                vec_expr("q", F.col("_fam"), 0.25).alias("embedding"))
    ).cache()
    queries.count()

    K = 10
    # exact ground truth the scale-honest way: per-partition BLAS top-k
    # (mapInPandas) + driver merge of the tiny partials. The pure-SQL
    # brute_force_topk stays the ORACLE shape at driver scale, but its
    # crossJoin EXPANDS the corpus q-fold — at 1M x 64 queries that is 64M
    # rows dragging two float arrays through a window shuffle (measured:
    # one >12-min stage); the gemm touches each vector once.
    import numpy as np
    import pandas as pd

    q_rows = sorted(queries.collect(), key=lambda r: r.vec_id)
    qids = np.asarray([r.vec_id for r in q_rows])
    Q = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in q_rows])
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)

    def part_topk(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
            S = Xn @ Qn.T  # (n, q)
            ids = pdf["vec_id"].to_numpy()
            n = S.shape[0]
            take = min(K, n)
            top = np.argpartition(-S, take - 1, axis=0)[:take]
            rows = {"query_id": [], "neighbor_id": [], "cos_sim": []}
            for j in range(S.shape[1]):
                for i in top[:, j]:
                    rows["query_id"].append(qids[j])
                    rows["neighbor_id"].append(ids[i])
                    rows["cos_sim"].append(S[i, j])
            yield pd.DataFrame(rows)

    t0 = time.time()
    parts = corpus.mapInPandas(
        part_topk, "query_id long, neighbor_id long, cos_sim double"
    ).toPandas()
    exact = set()
    for qid, grp in parts.groupby("query_id"):
        grp = grp.sort_values(["cos_sim", "neighbor_id"],
                              ascending=[False, True]).head(K)
        exact |= {(qid, int(n)) for n in grp["neighbor_id"]}
    out["exact_gemm_baseline"] = {"query_sec": round(time.time() - t0, 2)}

    def recall(rows):
        got = {(r.query_id, r.neighbor_id) for r in rows}
        return round(len(got & exact) / len(exact), 4)

    t0 = time.time()
    cents = V.train_ivf_centroids(corpus, k=128, iters=3, dim=dim).cache()
    cents.count()
    train_sec = round(time.time() - t0, 2)
    for nprobe in (1, 4):
        t0 = time.time()
        rows = V.ivf_topk(corpus, queries, cents, k=K, n_probes=nprobe).collect()
        out[f"ivf_nprobe{nprobe}"] = {
            "train_sec": train_sec, "query_sec": round(time.time() - t0, 2),
            "recall_at_10": recall(rows),
        }

    t0 = time.time()
    books = V.train_pq_codebooks(corpus, m=8, kc=64, iters=2, dim=dim)
    pq_train = round(time.time() - t0, 2)
    t0 = time.time()
    codes_path = os.path.join(base, "codes.parquet")
    V.pq_encode(corpus, books, dim=dim).write.parquet(codes_path)
    codes = spark.read.parquet(codes_path)
    pq_encode = round(time.time() - t0, 2)
    t0 = time.time()
    rows = V.pq_topk(codes, queries, books, k=K, dim=dim).collect()
    out["pq_adc"] = {"train_sec": pq_train, "encode_sec": pq_encode,
                     "query_sec": round(time.time() - t0, 2),
                     "recall_at_10": recall(rows)}
    t0 = time.time()
    rows = V.pq_topk(codes, queries, books, k=K, dim=dim, refine=4,
                     corpus=corpus).collect()
    out["pq_adc_refine4"] = {"query_sec": round(time.time() - t0, 2),
                             "recall_at_10": recall(rows)}

    # finer codes + deep refine: the recall-recovery knob when family-sized
    # clusters collapse to identical codes (see BENCH/SCALE.md geometry note)
    t0 = time.time()
    books16 = V.train_pq_codebooks(corpus, m=16, kc=64, iters=2, dim=dim)
    tr16 = round(time.time() - t0, 2)
    codes16_path = os.path.join(base, "codes16.parquet")
    V.pq_encode(corpus, books16, dim=dim).write.parquet(codes16_path)
    codes16 = spark.read.parquet(codes16_path)
    t0 = time.time()
    rows = V.pq_topk(codes16, queries, books16, k=K, dim=dim, refine=64,
                     corpus=corpus).collect()
    out["pq_m16_refine64"] = {"train_sec": tr16,
                              "query_sec": round(time.time() - t0, 2),
                              "recall_at_10": recall(rows)}

    print(json.dumps(out))
    shutil.rmtree(base, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
