import math

from pyspark.sql import functions as F

from sfr_ingest_pipeline_spark.functions import vector as V

SF = "/root/testdata/sf0.001"


def test_cosine_matches_python(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(10).collect()
    a, b = emb[0], emb[1]
    expected = V.cosine_pandas(a["embedding"], b["embedding"])
    df = spark.createDataFrame([(a["embedding"], b["embedding"])], ["va", "vb"])
    got = df.select(V.cosine(F.col("va"), F.col("vb")).alias("c")).collect()[0]["c"]
    assert math.isclose(got, expected, rel_tol=1e-9)


def test_brute_force_topk_self_excluded(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 3)
    top = V.brute_force_topk(emb, q, k=5).collect()
    assert all(r["query_id"] != r["neighbor_id"] for r in top)
    per_query = {}
    for r in top:
        per_query.setdefault(r["query_id"], []).append(r)
    for rows in per_query.values():
        assert len(rows) == 5
        sims = [r["cos_sim"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert sims == sorted(sims, reverse=True)


def test_srp_recall_vs_brute_force(spark):
    """The LSH path is approximate; assert it finds a usable fraction of the
    true neighbors (same-bucket candidates only)."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 20)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in V.brute_force_topk(emb, q, k=3).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in V.srp_topk(emb, q, dim=64, k=3, n_planes=3).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.2, f"SRP recall collapsed: {recall}"


def test_srp_bucket_deterministic(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(20)
    a = emb.select("vec_id", V.srp_bucket(F.col("embedding"), 64, 4).alias("b")).collect()
    b = emb.select("vec_id", V.srp_bucket(F.col("embedding"), 64, 4).alias("b")).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert all(0 <= r["b"] < 16 for r in a)


def test_srp_multiprobe_recall_dominates_single_probe(spark):
    """Multi-probe (Hamming radius 1) candidates are a superset of the
    single-probe bucket, so recall vs brute force can only improve — and on
    this corpus it must strictly help the candidate volume."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 20)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in V.brute_force_topk(emb, q, k=3).collect()
    }
    r0 = {
        (r["query_id"], r["neighbor_id"])
        for r in V.srp_topk(emb, q, dim=64, k=3, n_planes=3,
                            hamming_radius=0).collect()
    }
    r1 = {
        (r["query_id"], r["neighbor_id"])
        for r in V.srp_topk(emb, q, dim=64, k=3, n_planes=3,
                            hamming_radius=1).collect()
    }
    recall0 = len(exact & r0) / len(exact)
    recall1 = len(exact & r1) / len(exact)
    assert recall1 >= recall0, (recall0, recall1)
    assert recall1 >= 0.5, f"multi-probe recall too low: {recall1}"
