"""Driver-verifiable query surface (SURVEY.md §2 inventory -> queries()).

Every entry here has BOTH a Spark DataFrame implementation and (where
SQL-expressible) a matching DuckDB oracle in ORACLE_SQL — identical column
names/aliases, floats rounded on both sides for stable value-hash compare
(__spark_entry__.py contract).

Coverage map (SURVEY.md §2 refs in parens):
  CDC core:     lww_latest_event_per_user (A3/J6), dedup_dropped_per_user
                (W1), op_routing_counts (P4), session_count_30m (T4),
                hourly_event_stats (T3), max_gap_us (W3)
  Joins/aggs:   pricing_summary (A2), top_revenue_orders (J1+O3),
                region_revenue (J4 broadcast dims), top10_customers (O3),
                order_priority_rollup (A5), customers_without_orders (J2
                anti), active_customers_by_nation (J2 semi),
                open_minus_finished_custkeys (U2)
  Scalar fns:   json_props_stats (F5), monthly_order_volume (F2),
                normalized_documents (F1 pandas UDF), brand_identifier_clean
                (F4), binary_meta (multimodal plumbing)
  Training-data ops: exact_dedup_docs, token_stats_by_lang, quality_scores,
                lang_id_pred, doc_fingerprints, minhash_signatures,
                embedding_norms, cosine_topk (brute force), srp_ann_topk
                (multi-probe SRP-LSH, planes inlined in the oracle),
                simhash_docs (md5-slice hash family, exact oracle),
                embedding_near_dups (LSH-bucketed cosine pairs),
                weighted_quality_by_lang (GROUPED_AGG pandas UDF)
  Round 2 adds: open_and_finished_custkeys (U3), grouping_sets_order_stats
                (A5 grouping sets), purchase_asof_view (J6 general as-of
                join, DuckDB ASOF twin), fuzzy_part_pairs (J3
                block-band-verify levenshtein join), ivf_ann_topk (IVF
                coarse-quantizer ANN), minhash_lsh_dedup_pairs (full
                shingle->band->bucket-join->Jaccard-verify pipeline),
                simhash_near_dup_pairs (pigeonhole-banded hamming<=3,
                brute-force oracle proves banding lossless),
                bpe_token_stats, purchase_view_attribution (interval join
                in batch mode) — every query has an exact DuckDB twin
                (48/48 hash-verified)
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sfr_ingest_pipeline_spark.functions import dedup as D
from sfr_ingest_pipeline_spark.functions import pii as PII
from sfr_ingest_pipeline_spark.functions import text as TX
from sfr_ingest_pipeline_spark.functions import vector as V
from sfr_ingest_pipeline_spark.functions.multimodal import (
    extract_media_meta,
    with_binary_payload,
)
from sfr_ingest_pipeline_spark.functions.normalize import normalize_text_udf
from sfr_ingest_pipeline_spark.operators.lww import lww_reduce


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _spread(df: DataFrame) -> DataFrame:
    """Fan a narrow scan out to the session's parallelism (round 6).

    The sf test tables are single parquet files with ONE row group, so a
    bare scan is a single task — and Spark fuses all downstream map-side
    work (levenshtein verify, md5 shingling, n-gram building, cosine
    kernels) into that one task: measured, the whole corpus side of
    fuzzy_part_pairs / cross_doc_ngram_dup / minhash_signatures ran on 1 of
    32 cores. A round-robin repartition of a few MB buys 32x parallelism
    for the expensive part of those plans (guide §2.5 input skew).

    Scale-adaptive by construction: when the scan already carries at least
    defaultParallelism partitions (any real multi-file table at cluster
    scale) this is a NO-OP — no exchange is added to a 100 TB scan.

    Only used by queries whose results are partitioning-invariant (counts,
    deterministic hashes, per-row/per-pair values, max_by over a unique
    total order). Floating-point SUM/AVG rollups keep the bare scan: their
    partial-sum order would change with partitioning, and a reordered
    double sum can flip a round() boundary the oracle hash pins."""
    sc = df.sparkSession.sparkContext
    p = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= p:
        return df
    return df.repartition(p)


# --------------------------------------------------------------------------
# CDC core on the events stream table
# --------------------------------------------------------------------------

def q_lww_latest_event_per_user(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    latest = lww_reduce(ev, key_cols=["user_id"], order_cols=["ts", "event_id"],
                        n_salt=8)
    return latest.select(
        "user_id", "event_id", "event_type",
        F.round("value", 2).alias("value"), "ts",
    )


def q_dedup_dropped_per_user(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("rows_in"),
        (F.count(F.lit(1)) - F.lit(1)).alias("dedup_dropped"),
    )


def q_op_routing_counts(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


def q_session_count_30m(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    sess = ev.groupBy("user_id", F.session_window("ts", "30 minutes")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return sess.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_sessions"))


def q_hourly_event_stats(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    win = ev.groupBy(F.window("ts", "1 hour").alias("w")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
    return win.select(F.col("w.start").alias("hour_start"), "n_events", "sum_value")


def q_max_gap_us(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # session TZ is UTC, so the NTZ->LTZ cast for unix_micros is the identity
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gaps = ev.withColumn(
        "gap_us", us - F.lag(us).over(w)
    )
    return gaps.groupBy("user_id").agg(F.max("gap_us").alias("max_gap_us"))


# --------------------------------------------------------------------------
# Relational breadth on the TPC-H-ish star
# --------------------------------------------------------------------------

def q_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1999-12-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_top_revenue_orders(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


def q_region_revenue(spark, sf_dir):
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


def q_top10_customers_by_spend(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total_spend"))
        .orderBy(F.desc("total_spend"), F.asc("o_custkey"))
        .limit(10)
    )


def q_order_priority_rollup(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


def q_customers_without_orders(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


def q_active_customers_by_nation(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    active = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
    return active.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_active_customers")
    )


def q_open_minus_finished_custkeys(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    open_keys = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    fin_keys = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    return open_keys.exceptAll(fin_keys)


# --------------------------------------------------------------------------
# Scalar functions: json / dates / strings / binary
# --------------------------------------------------------------------------

def q_json_props_stats(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.round(F.avg(k), 4).alias("avg_k"),
        F.max(k).alias("max_k"),
        F.min(k).alias("min_k"),
    )


def q_monthly_order_volume(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy(
        F.date_trunc("month", "o_orderdate").alias("month")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_totalprice"),
    )


def q_normalized_documents(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", normalize_text_udf("text").alias("norm_text")
    )


def q_brand_identifier_clean(spark, sf_dir):
    part = _t(spark, sf_dir, "part")
    clean = F.regexp_replace(F.lower("p_brand"), r"[^a-z0-9]+", "")
    return part.groupBy(clean.alias("brand_id")).agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.round(F.avg("p_retailprice"), 2).alias("avg_price"),
    )


def q_binary_meta(spark, sf_dir):
    docs = with_binary_payload(_t(spark, sf_dir, "documents"))
    meta = extract_media_meta(docs, id_col="doc_id", binary_col="payload")
    return meta.select("doc_id", "n_bytes", "kind")


# --------------------------------------------------------------------------
# Training-data ops: dedup / text quality / fingerprints / vectors
# --------------------------------------------------------------------------

def q_exact_dedup_docs(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return D.exact_dedup_groups(docs, "text", "doc_id")


def q_token_stats_by_lang(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("lang", TX.token_count("text").alias("n_tok"))
    return toks.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("sum_tokens"),
        F.round(F.avg("n_tok"), 4).alias("avg_tokens"),
    )


def q_quality_scores(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.round(TX.quality_score("text"), 4).alias("quality")
    )


def q_lang_id_pred(spark, sf_dir):
    docs = _spread(_t(spark, sf_dir, "documents"))
    return docs.select("doc_id", TX.lang_id("text").alias("lang_pred"))


def q_doc_fingerprints(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", TX.fingerprint("text").alias("fp"))


def q_minhash_signatures(spark, sf_dir):
    docs = _spread(_t(spark, sf_dir, "documents"))
    return D.minhash_bands(docs.select("doc_id", "text"), "text", n_bands=4).drop(
        "text"
    )


def q_embedding_norms(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id", F.round(V.l2_norm(F.col("embedding")), 4).alias("l2_norm")
    )


def q_cosine_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    top = V.brute_force_topk(emb, queries, k=3)
    return top.select(
        "query_id", "neighbor_id", F.round("cos_sim", 4).alias("cos_sim"), "rank"
    )


def q_srp_ann_topk(spark, sf_dir):
    """Approximate ANN (SRP-LSH buckets, multi-probe Hamming radius 1) —
    hash-verified against a DuckDB twin whose seeded hyperplanes are inlined
    as literal arrays; recall vs brute force asserted in tests/test_vector.py."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    top = V.srp_topk(emb, queries, dim=64, k=3, n_planes=4, hamming_radius=1)
    return top.select(
        "query_id", "neighbor_id", F.round("cos_sim", 4).alias("cos_sim"), "rank"
    )


def q_simhash_docs(spark, sf_dir):
    """SimHash signatures over an md5-slice token-hash family — exact DuckDB
    twin (same pattern as the MinHash bands)."""
    docs = _spread(_t(spark, sf_dir, "documents"))
    return docs.select("doc_id", D.simhash32("text").alias("simhash"))




# --------------------------------------------------------------------------
# Coverage round 2: cube, exact percentiles, ordered string-agg, explode,
# window frames, date parts, multi-source schema-union ingest (SURVEY §2.4
# A5, §2.5 frames, §2.7 U1, §2.8 F2/F7)
# --------------------------------------------------------------------------

def q_cube_status_priority(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_totalprice"),
    )


def q_value_percentiles(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 4).alias("p90"),
    )


def q_user_event_type_sets(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.concat_ws(",", F.array_sort(F.collect_set("event_type"))).alias(
            "event_types"
        )
    )


def q_embedding_dim_stats(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    ex = emb.select(F.posexplode("embedding").alias("dim", "x"))
    return ex.groupBy("dim").agg(
        F.round(F.avg(F.col("x").cast("double")), 4).alias("avg_x"),
        F.round(F.max(F.col("x").cast("double")), 4).alias("max_x"),
    )


def q_running_value_sum(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id", "user_id",
        F.round(F.sum("value").over(w), 2).alias("running_value"),
    )


def q_orders_by_year(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy(F.year("o_orderdate").alias("order_year")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.avg("o_totalprice"), 2).alias("avg_totalprice"),
    )


def q_multi_source_union(spark, sf_dir):
    """U1: per-source streams with drifted schemas merge via unionByName
    (allowMissingColumns) — the reference unions hathi/gutenberg/doab/met
    feeds into one pipeline (SURVEY.md §2.7)."""
    ev = _t(spark, sf_dir, "events")
    src_a = ev.filter(F.col("event_id") % 2 == 0).select(
        "event_id", "user_id", "event_type", "value"
    )
    src_b = ev.filter(F.col("event_id") % 2 == 1).select(
        "event_id", "user_id", "event_type"
    )  # drifted: no value column
    merged = src_a.unionByName(src_b, allowMissingColumns=True)
    return merged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("value").alias("n_with_value"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


def q_weighted_quality_by_lang(spark, sf_dir):
    """Grouped-agg pandas UDF (SURVEY §2.10 fallback surface, implemented as
    a first-class demo): token-count-weighted mean quality score per lang,
    computed in an Arrow-batched GROUPED_AGG UDF. The DuckDB twin is the
    plain SQL sum(q*w)/sum(w)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def weighted_mean(q: pd.Series, w: pd.Series) -> float:
        tw = w.sum()
        return float((q * w).sum() / tw) if tw else 0.0

    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        "lang",
        TX.quality_score("text").alias("q"),
        TX.token_count("text").cast("double").alias("w"),
    )
    return scored.groupBy("lang").agg(
        F.round(weighted_mean("q", "w"), 4).alias("weighted_quality")
    )


def q_embedding_near_dups(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs (task-brief dedup family):
    SRP-bucketed candidates (Hamming radius 1 — same LSH as srp_ann_topk)
    filtered by exact cosine >= 0.4. Never a cross join on the Spark side;
    the oracle mirrors the bucket condition with bit_count(xor(...)) <= 1."""
    emb = _t(spark, sf_dir, "embeddings")
    # bucket + norm in one Arrow kernel (bit-identical fold — vector.py):
    # the interpreted srp_bucket HOFs measured ~1.4 ms/row AND the b
    # lineage is re-evaluated once per consuming branch (hot guard, left,
    # right — column pruning defeats exchange reuse), so the interpreted
    # cost was paid three times. The kernel runs BEFORE the _spread fan-out:
    # a narrow scan keeps each (vectorized, cheap) kernel evaluation to one
    # Python round trip, while the spread still widens the expensive
    # candidate-pair stage below (round-6)
    b = _spread(V.with_srp_buckets_arrow(
        emb.select("vec_id", "embedding"), "embedding", dim=64, n_planes=4,
        bucket_col="_bkt", norm_col="_norm",
    ))
    # hot-bucket guard (round-2 verdict item 6): pairs meet in the smaller
    # id's HOME bucket (the id_a < id_b filter keeps only that meeting), so
    # dropping hot home buckets from the left side caps pair work while the
    # oracle mirrors the same condition on a's bucket count
    hot = (
        b.groupBy("_bkt").agg(F.count(F.lit(1)).alias("_bn"))
        .filter(F.col("_bn") > 1024).select("_bkt")
    )
    left = b.join(F.broadcast(hot), "_bkt", "left_anti").select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("_va"),
        F.col("_norm").alias("_na"), F.col("_bkt").alias("_ba"),
    )
    probes = F.array(
        F.col("_bkt"), *[F.col("_bkt").bitwiseXOR(F.lit(1 << j)) for j in range(4)]
    )
    right = b.withColumn("_probe", F.explode(probes)).select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("_vb"),
        F.col("_norm").alias("_nb"), F.col("_probe"),
    )
    joined = left.join(right, left._ba == right._probe).filter(
        F.col("id_a") < F.col("id_b")
    )
    # cosine + threshold in ONE Arrow kernel over the candidate pairs:
    # bit-identical fold order to cosine_prenormed (vector.py), ~40% faster
    # than the interpreted per-pair HOF at this pair volume (round-6)
    pairs = V.pairwise_cosine_arrow(
        joined, "_va", "_vb", "_na", "_nb", min_cos=0.4
    )
    return pairs.select(
        "id_a", "id_b", F.round("_cos", 4).alias("cos_sim")
    ).distinct()


def q_open_and_finished_custkeys(spark, sf_dir):
    """U3 intersect: customers with BOTH an open and a finished order."""
    orders = _t(spark, sf_dir, "orders")
    open_keys = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    fin_keys = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_keys.intersect(fin_keys)


def q_grouping_sets_order_stats(spark, sf_dir):
    """A5 grouping sets: per-status, per-priority, and grand-total rollups in
    one pass (finer control than rollup/cube — exactly the three sets)."""
    orders = _t(spark, sf_dir, "orders")
    return orders.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"], []],
        "o_orderstatus", "o_orderpriority",
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.avg("o_totalprice"), 2).alias("avg_totalprice"),
    )


def q_conversation_reconstruction(spark, sf_dir):
    """Ordered per-key payload assembly: the ES-manager analog that the
    reference builds per work before indexing (SURVEY.md §3.1 E3)."""
    ev = _t(spark, sf_dir, "events")
    ordered = F.array_sort(
        F.collect_list(F.struct("ts", "event_id", "event_type"))
    )
    return ev.groupBy("user_id").agg(
        F.concat_ws(
            "|", F.transform(ordered, lambda x: x["event_type"])
        ).alias("event_seq_str")
    )


def q_purchase_asof_view(spark, sf_dir):
    """General as-of join (J6 generalized): every purchase event enriched
    with the latest at-or-before 'view' event of the same user — one shuffle
    on user_id via union + last(ignorenulls) window (operators/asof.py), no
    range join. DuckDB twin uses its native ASOF LEFT JOIN."""
    from sfr_ingest_pipeline_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "value"
    )
    out = asof_join(purchases, views, on="ts", by="user_id")
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.round("value", 4).alias("purchase_value"),
        F.col("ts_right").alias("last_view_ts"),
        F.round("value_right", 4).alias("last_view_value"),
    )


def q_fuzzy_part_pairs(spark, sf_dir):
    """Fuzzy match (J3): part-name pairs within edit distance 2, blocked on
    brand + pruned by length band before the JVM-side levenshtein verify
    (operators/fuzzy.py block-band-verify shape; never a raw cross join)."""
    from sfr_ingest_pipeline_spark.operators.fuzzy import fuzzy_self_pairs

    part = _spread(_t(spark, sf_dir, "part"))
    pairs = fuzzy_self_pairs(
        part, id_col="p_partkey", col="p_name", max_dist=2, block_on="p_brand"
    )
    return pairs.select(
        "p_brand", "id_a", "id_b", "p_name_a", "p_name_b", "edit_dist"
    )


def q_ivf_ann_topk(spark, sf_dir):
    """IVF coarse-quantizer ANN: corpus bucketed into nearest-centroid cells
    (centroids = embeddings with vec_id < 8, deterministic so the DuckDB
    twin can replicate them), queries probe their 2 nearest cells and
    brute-force only those members (functions/vector.py ivf_topk)."""
    emb = _t(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 8)
    queries = emb.filter(F.col("vec_id") < 5)
    top = V.ivf_topk(emb, queries, centroids, k=3, n_probes=2)
    return top.select(
        "query_id", "neighbor_id", F.round("cos_sim", 4).alias("cos_sim"), "rank"
    )


def q_bpe_token_stats(spark, sf_dir):
    """Token-cost accounting with a BPE-ish tokenizer (task brief: token
    counting = whitespace + a BPE-ish regex). Per language: document count,
    whitespace tokens, GPT-2-style pre-tokens, and their mean ratio."""
    docs = _t(spark, sf_dir, "documents")
    per_doc = docs.select(
        "lang",
        TX.token_count("text").alias("_ws"),
        TX.bpe_token_count("text").alias("_bpe"),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_ws").alias("ws_tokens"),
        F.sum("_bpe").alias("bpe_tokens"),
        F.round(
            F.avg(F.col("_bpe").cast("double") /
                  F.greatest(F.col("_ws").cast("double"), F.lit(1.0))), 4
        ).alias("avg_bpe_per_ws"),
    )


def q_purchase_view_attribution(spark, sf_dir):
    """Interval-join attribution (streaming/joins.py interval_join run in
    batch mode — same plan minus state): views within 30 minutes before each
    purchase, per purchase. Hash-verifies the interval-join semantics the
    streaming tests pin (inclusive bounds, leftOuter null emission)."""
    from sfr_ingest_pipeline_spark.streaming.joins import interval_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "value"
    )
    j = interval_join(
        purchases, views, key="user_id", lookback="30 minutes", how="leftOuter"
    )
    return j.groupBy(F.col("l_event_id").alias("event_id"), "user_id").agg(
        F.count("r_ts").alias("n_views_30m"),
        F.round(F.coalesce(F.sum("r_value"), F.lit(0.0)), 4).alias("sum_view_value"),
    )


def q_minhash_lsh_dedup_pairs(spark, sf_dir):
    """The FULL MinHash+LSH dedup pipeline as one query (task-brief dedup
    family): word-5-gram shingles (the corpus-scale setting — see
    functions/dedup.py gram_array for the measured char-shingle saturation
    rationale) -> md5-slice r=2 band minima -> band-bucket equi-join with
    hot-bucket guard (lsh_candidate_pairs) -> exact word-5-gram-Jaccard
    verification >= 0.5. The DuckDB twin mirrors every stage byte-for-byte
    (same md5 slices, same bucket cap, same gram construction)."""
    docs = _spread(_t(spark, sf_dir, "documents"))
    # fan the (id_a, id_b) candidate stream out before the verify joins:
    # the Jaccard verification (two tokenizations + gram builds per pair)
    # lands in the join condition of the stage ABOVE the candidate
    # exchange, and AQE coalesces that sub-MB exchange to 1-2 partitions —
    # the compute-dense verify then ran near-serial (round-6; user
    # repartitions are exempt from coalescing, and the pair rows are two
    # longs, so the extra exchange is noise at any scale)
    cand = D.lsh_candidate_pairs(docs, "doc_id", "text", n_bands=4, k=5)
    cand = cand.repartition(spark.sparkContext.defaultParallelism)
    a = docs.select(F.col("doc_id").alias("id_a"), F.col("text").alias("_ta"))
    b = docs.select(F.col("doc_id").alias("id_b"), F.col("text").alias("_tb"))
    scored = (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a", "id_b",
            D.ngram_jaccard(F.col("_ta"), F.col("_tb"), 5, mode="word").alias("_j"),
        )
    )
    return scored.filter(F.col("_j") >= 0.5).select(
        "id_a", "id_b", F.round("_j", 4).alias("jaccard")
    )


def q_near_dedup_kept_docs(spark, sf_dir):
    """THE composed training-data dedup pipeline, end to end in one query:
    MinHash+LSH candidate pairs -> exact n-gram-Jaccard verify (>= 0.5,
    q_minhash_lsh_dedup_pairs) -> connected-components clustering
    (functions/graph.py) -> keep one canonical doc (min doc_id) per
    near-dup cluster -> anti-join the corpus. Returns the KEPT doc_ids —
    what a corpus-construction job materializes. The oracle recomputes the
    whole chain in SQL: the full LSH+verify twin wrapped in a RECURSIVE
    transitive closure, then NOT IN the dropped set."""
    from sfr_ingest_pipeline_spark.functions.graph import connected_components

    docs = _spread(_t(spark, sf_dir, "documents"))
    pairs = q_minhash_lsh_dedup_pairs(spark, sf_dir)
    comp = connected_components(pairs, "id_a", "id_b")
    dropped = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    return docs.join(dropped, "doc_id", "left_anti").select("doc_id")


def q_simhash_near_dup_pairs(spark, sf_dir):
    """SimHash near-dup pairs at hamming <= 3 over a 64-bit simhash (two
    independent md5-word halves) via 4x16-bit pigeonhole banding with
    exact-dedup-first collapse and the LSH hot-bucket cap
    (functions/dedup.py simhash_near_dup_pairs). The oracle computes the
    pair set BRUTE-FORCE with the bucket cap mirrored as a pair-level
    condition — the hash match proves the banded plan (and the exact-group
    expansion and cap) exact, not merely self-consistent."""
    docs = _t(spark, sf_dir, "documents")
    return D.simhash_near_dup_pairs(docs, "doc_id", "text", max_hamming=3)


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "lww_latest_event_per_user": q_lww_latest_event_per_user,
    "dedup_dropped_per_user": q_dedup_dropped_per_user,
    "op_routing_counts": q_op_routing_counts,
    "session_count_30m": q_session_count_30m,
    "hourly_event_stats": q_hourly_event_stats,
    "max_gap_us": q_max_gap_us,
    "pricing_summary": q_pricing_summary,
    "top_revenue_orders": q_top_revenue_orders,
    "region_revenue": q_region_revenue,
    "top10_customers_by_spend": q_top10_customers_by_spend,
    "order_priority_rollup": q_order_priority_rollup,
    "customers_without_orders": q_customers_without_orders,
    "active_customers_by_nation": q_active_customers_by_nation,
    "open_minus_finished_custkeys": q_open_minus_finished_custkeys,
    "json_props_stats": q_json_props_stats,
    "monthly_order_volume": q_monthly_order_volume,
    "normalized_documents": q_normalized_documents,
    "brand_identifier_clean": q_brand_identifier_clean,
    "binary_meta": q_binary_meta,
    "exact_dedup_docs": q_exact_dedup_docs,
    "token_stats_by_lang": q_token_stats_by_lang,
    "quality_scores": q_quality_scores,
    "lang_id_pred": q_lang_id_pred,
    "doc_fingerprints": q_doc_fingerprints,
    "minhash_signatures": q_minhash_signatures,
    "embedding_norms": q_embedding_norms,
    "cosine_topk": q_cosine_topk,
    "srp_ann_topk": q_srp_ann_topk,
    "simhash_docs": q_simhash_docs,
    "cube_status_priority": q_cube_status_priority,
    "value_percentiles": q_value_percentiles,
    "user_event_type_sets": q_user_event_type_sets,
    "embedding_dim_stats": q_embedding_dim_stats,
    "running_value_sum": q_running_value_sum,
    "orders_by_year": q_orders_by_year,
    "multi_source_union": q_multi_source_union,
    "conversation_reconstruction": q_conversation_reconstruction,
    "open_and_finished_custkeys": q_open_and_finished_custkeys,
    "grouping_sets_order_stats": q_grouping_sets_order_stats,
    "weighted_quality_by_lang": q_weighted_quality_by_lang,
    "embedding_near_dups": q_embedding_near_dups,
    "purchase_asof_view": q_purchase_asof_view,
    "fuzzy_part_pairs": q_fuzzy_part_pairs,
    "ivf_ann_topk": q_ivf_ann_topk,
    "minhash_lsh_dedup_pairs": q_minhash_lsh_dedup_pairs,
    "near_dedup_kept_docs": q_near_dedup_kept_docs,
    "simhash_near_dup_pairs": q_simhash_near_dup_pairs,
    "bpe_token_stats": q_bpe_token_stats,
    "purchase_view_attribution": q_purchase_view_attribution,
}


# --------------------------------------------------------------------------
# DuckDB oracle SQL — identical aliases; floats rounded the same way.
# --------------------------------------------------------------------------

_MARKER_COUNT = "len(regexp_extract_all(lower(text), '{re}'))"
_LANG_RES = {
    "en": r"\b(the|and|of|to|is)\b",
    "de": r"\b(der|die|das|und|ist)\b",
    "fr": r"\b(le|la|les|et|est)\b",
    "es": r"\b(el|los|las|es|y)\b",
}
_STOP_RE = r"\b(the|a|an|of|and|or|to|in|is)\b"

_NORMALIZE_SQL = (
    "trim(regexp_replace(regexp_replace(replace(replace(nfc_normalize(text), "
    "chr(13) || chr(10), chr(10)), chr(13), chr(10)), "
    r"'[\x00-\x08\x0b-\x1f\x7f-\x9f]', '', 'g'), "
    r"'[ \t]+', ' ', 'g'), ' ' || chr(10) || chr(9))"
)

_MINHASH_SIG = (
    "list_min(list_transform(range(1, greatest(length(text) - 4, 1) + 1), "
    "i -> substr(md5(substr(text, i, 5)), 1 + 8 * {b}, 8)))"
)

ORACLE_SQL: dict[str, str] = {
    "lww_latest_event_per_user": """
        SELECT user_id, event_id, event_type, round(value, 2) AS value, ts
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    """,
    "dedup_dropped_per_user": """
        SELECT user_id, count(*) AS rows_in, count(*) - 1 AS dedup_dropped
        FROM events GROUP BY user_id
    """,
    "op_routing_counts": """
        SELECT event_type, count(*) AS n_events,
               round(sum(value), 2) AS sum_value
        FROM events GROUP BY event_type
    """,
    "session_count_30m": """
        WITH flagged AS (
            SELECT user_id,
                   CASE WHEN ts - lag(ts) OVER (
                            PARTITION BY user_id ORDER BY ts, event_id)
                        >= INTERVAL 30 MINUTE
                        OR lag(ts) OVER (
                            PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                   THEN 1 ELSE 0 END AS new_session
            FROM events
        )
        SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions
        FROM flagged GROUP BY user_id
    """,
    "hourly_event_stats": """
        SELECT date_trunc('hour', ts) AS hour_start, count(*) AS n_events,
               round(sum(value), 2) AS sum_value
        FROM events GROUP BY 1
    """,
    "max_gap_us": """
        SELECT user_id, max(gap_us) AS max_gap_us FROM (
            SELECT user_id, epoch_us(ts) - epoch_us(lag(ts) OVER (
                PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
            FROM events
        ) GROUP BY user_id
    """,
    "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(avg(l_quantity), 4) AS avg_qty,
               round(avg(l_discount), 4) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1999-12-01'
        GROUP BY l_returnflag, l_linestatus
    """,
    "top_revenue_orders": """
        SELECT o_orderkey, o_orderdate,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY o_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderkey ASC
        LIMIT 10
    """,
    "region_revenue": """
        SELECT r_name, n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    """,
    "top10_customers_by_spend": """
        SELECT o_custkey, round(sum(o_totalprice), 2) AS total_spend
        FROM orders GROUP BY o_custkey
        ORDER BY total_spend DESC, o_custkey ASC LIMIT 10
    """,
    "order_priority_rollup": """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
        FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    "customers_without_orders": """
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "active_customers_by_nation": """
        SELECT c_nationkey, count(*) AS n_active_customers FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_nationkey
    """,
    "open_minus_finished_custkeys": """
        SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
        EXCEPT
        SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    "json_props_stats": """
        SELECT event_type,
               round(avg(CAST(props ->> '$.k' AS INT)), 4) AS avg_k,
               max(CAST(props ->> '$.k' AS INT)) AS max_k,
               min(CAST(props ->> '$.k' AS INT)) AS min_k
        FROM events GROUP BY event_type
    """,
    "monthly_order_volume": """
        SELECT date_trunc('month', o_orderdate) AS month,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS sum_totalprice
        FROM orders GROUP BY 1
    """,
    "normalized_documents": f"""
        SELECT doc_id, {_NORMALIZE_SQL} AS norm_text FROM documents
    """,
    "brand_identifier_clean": """
        SELECT regexp_replace(lower(p_brand), '[^a-z0-9]+', '', 'g') AS brand_id,
               count(*) AS n_parts,
               round(avg(p_retailprice), 2) AS avg_price
        FROM part GROUP BY 1
    """,
    "binary_meta": """
        SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n_bytes,
               'blob' AS kind
        FROM documents
    """,
    "exact_dedup_docs": """
        SELECT sha256(text) AS text_sha, min(doc_id) AS canonical_id,
               count(*) AS n_copies
        FROM documents GROUP BY 1
    """,
    "token_stats_by_lang": r"""
        SELECT lang, count(*) AS n_docs,
               CAST(sum(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS sum_tokens,
               round(avg(len(regexp_extract_all(text, '\S+'))), 4) AS avg_tokens
        FROM documents GROUP BY lang
    """,
    "quality_scores": f"""
        SELECT doc_id, round(
            ln(1.0 + n_tok) * 0.5 + (stop / greatest(n_tok, 1.0)) * 2.0
            - (punct / greatest(n_tok, 1.0)), 4) AS quality
        FROM (
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text, '\\S+')) AS DOUBLE) AS n_tok,
                   CAST(len(regexp_extract_all(text, '{_STOP_RE}')) AS DOUBLE) AS stop,
                   CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) AS punct
            FROM documents
        )
    """,
    "lang_id_pred": f"""
        SELECT doc_id,
            CASE WHEN best = 0 THEN 'und'
                 WHEN en = best THEN 'en'
                 WHEN de = best THEN 'de'
                 WHEN fr = best THEN 'fr'
                 WHEN es = best THEN 'es'
                 ELSE 'und' END AS lang_pred
        FROM (
            SELECT doc_id, en, de, fr, es, greatest(en, de, fr, es) AS best
            FROM (
                SELECT doc_id,
                    {_MARKER_COUNT.format(re=_LANG_RES['en'])} AS en,
                    {_MARKER_COUNT.format(re=_LANG_RES['de'])} AS de,
                    {_MARKER_COUNT.format(re=_LANG_RES['fr'])} AS fr,
                    {_MARKER_COUNT.format(re=_LANG_RES['es'])} AS es
                FROM documents
            )
        )
    """,
    "doc_fingerprints": """
        SELECT doc_id,
               md5(regexp_replace(lower(text), '[^a-z0-9]+', '', 'g')) AS fp
        FROM documents
    """,
    "minhash_signatures": f"""
        SELECT doc_id,
               {_MINHASH_SIG.format(b=0)} AS sig_0,
               {_MINHASH_SIG.format(b=1)} AS sig_1,
               {_MINHASH_SIG.format(b=2)} AS sig_2,
               {_MINHASH_SIG.format(b=3)} AS sig_3
        FROM documents
    """,
    "embedding_norms": """
        SELECT vec_id,
               round(sqrt(list_sum(list_transform(embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm
        FROM embeddings
    """,
    "cosine_topk": """
        WITH scored AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   list_dot_product(CAST(q.embedding AS DOUBLE[]),
                                    CAST(c.embedding AS DOUBLE[]))
                   / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]),
                                            CAST(q.embedding AS DOUBLE[])))
                      * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]),
                                              CAST(c.embedding AS DOUBLE[]))))
                   AS cos_raw
            FROM embeddings q, embeddings c
            WHERE q.vec_id < 5 AND c.vec_id != q.vec_id
        ), ranked AS (
            SELECT query_id, neighbor_id, cos_raw,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cos_raw DESC, neighbor_id ASC) AS rank
            FROM scored
        )
        SELECT query_id, neighbor_id, round(cos_raw, 4) AS cos_sim,
               CAST(rank AS INT) AS rank
        FROM ranked WHERE rank <= 3
    """,
}

def _srp_bucket_sql(vec_expr: str, dim: int = 64, n_planes: int = 4,
                    seed: int = 42) -> str:
    """DuckDB twin of vector.srp_bucket: the seeded hyperplanes are inlined
    as literal DOUBLE[] arrays (python float repr round-trips exactly, and
    F.lit on the Spark side uses the same values)."""
    from sfr_ingest_pipeline_spark.functions.vector import _srp_planes

    planes = _srp_planes(dim, n_planes, seed)
    terms = []
    for i, p in enumerate(planes):
        lit = "[" + ",".join(repr(x) for x in p) + "]::DOUBLE[]"
        terms.append(
            f"(CASE WHEN list_dot_product(CAST({vec_expr} AS DOUBLE[]), {lit}) > 0 "
            f"THEN {1 << i} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


ORACLE_SQL.update({
    # token hash = ('0x' || first 8 hex of md5)::BIGINT — identical to the
    # Spark side's conv(substring(md5(t),1,8),16,10); one ±1 vote per (token,
    # bit), signature bit set where the vote is positive; docs with no
    # tokens get signature 0 on both sides
    "simhash_docs": r"""
        WITH tok AS (
            SELECT doc_id,
                   ('0x' || substr(md5(unnest(regexp_extract_all(text, '\S+'))), 1, 8))::BIGINT AS h
            FROM documents
        ), votes AS (
            SELECT doc_id, i, sum(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS v
            FROM tok CROSS JOIN range(32) r(i)
            GROUP BY doc_id, i
        ), sigs AS (
            SELECT doc_id, sum(CASE WHEN v > 0 THEN (1::BIGINT << i) ELSE 0 END) AS simhash
            FROM votes GROUP BY doc_id
        )
        SELECT d.doc_id, CAST(coalesce(s.simhash, 0) AS BIGINT) AS simhash
        FROM documents d LEFT JOIN sigs s USING (doc_id)
    """,
    "srp_ann_topk": f"""
        WITH b AS (
            SELECT vec_id, embedding,
                   {_srp_bucket_sql('embedding')} AS bkt
            FROM embeddings
        ), cnt AS (
            SELECT bkt, count(*) AS n FROM b GROUP BY bkt
        ), scored AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   list_dot_product(CAST(q.embedding AS DOUBLE[]),
                                    CAST(c.embedding AS DOUBLE[]))
                   / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]),
                                            CAST(q.embedding AS DOUBLE[])))
                      * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]),
                                              CAST(c.embedding AS DOUBLE[]))))
                   AS cos_raw
            FROM b q JOIN b c
              ON bit_count(xor(q.bkt::BIGINT, c.bkt::BIGINT)) <= 1
            JOIN cnt ON cnt.bkt = c.bkt
            WHERE q.vec_id < 5 AND c.vec_id != q.vec_id AND cnt.n <= 1024
        ), ranked AS (
            SELECT query_id, neighbor_id, cos_raw,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cos_raw DESC, neighbor_id ASC) AS rank
            FROM scored
        )
        SELECT query_id, neighbor_id, round(cos_raw, 4) AS cos_sim,
               CAST(rank AS INT) AS rank
        FROM ranked WHERE rank <= 3
    """,
    "cube_status_priority": """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS sum_totalprice
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    "value_percentiles": """
        SELECT event_type,
               round(quantile_cont(value, 0.5), 4) AS p50,
               round(quantile_cont(value, 0.9), 4) AS p90
        FROM events GROUP BY event_type
    """,
    "user_event_type_sets": """
        SELECT user_id,
               array_to_string(list_sort(list(DISTINCT event_type)), ',')
                   AS event_types
        FROM events GROUP BY user_id
    """,
    "embedding_dim_stats": """
        SELECT CAST(i - 1 AS INT) AS dim,
               round(avg(CAST(embedding[i] AS DOUBLE)), 4) AS avg_x,
               round(max(CAST(embedding[i] AS DOUBLE)), 4) AS max_x
        FROM embeddings,
             unnest(range(1, len(embedding) + 1)) AS t(i)
        GROUP BY 1
    """,
    "running_value_sum": """
        SELECT event_id, user_id,
               round(sum(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                   AS running_value
        FROM events
    """,
    "orders_by_year": """
        SELECT CAST(year(o_orderdate) AS INT) AS order_year,
               count(*) AS n_orders,
               round(avg(o_totalprice), 2) AS avg_totalprice
        FROM orders GROUP BY 1
    """,
    "multi_source_union": """
        WITH merged AS (
            SELECT event_id, user_id, event_type, value
            FROM events WHERE event_id % 2 = 0
            UNION ALL
            SELECT event_id, user_id, event_type, NULL AS value
            FROM events WHERE event_id % 2 = 1
        )
        SELECT event_type, count(*) AS n_events,
               count(value) AS n_with_value,
               round(sum(value), 2) AS sum_value
        FROM merged GROUP BY event_type
    """,
    "conversation_reconstruction": """
        SELECT user_id,
               string_agg(event_type, '|' ORDER BY ts, event_id)
                   AS event_seq_str
        FROM events GROUP BY user_id
    """,
    "open_and_finished_custkeys": """
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    "grouping_sets_order_stats": """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               round(avg(o_totalprice), 2) AS avg_totalprice
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    "weighted_quality_by_lang": f"""
        SELECT lang,
               round(CASE WHEN sum(w) > 0 THEN sum(q * w) / sum(w)
                          ELSE 0.0 END, 4) AS weighted_quality
        FROM (
            SELECT lang,
                   ln(1.0 + n_tok) * 0.5 + (stop / greatest(n_tok, 1.0)) * 2.0
                       - (punct / greatest(n_tok, 1.0)) AS q,
                   n_tok AS w
            FROM (
                SELECT lang,
                       CAST(len(regexp_extract_all(text, '\\S+')) AS DOUBLE) AS n_tok,
                       CAST(len(regexp_extract_all(text, '{_STOP_RE}')) AS DOUBLE) AS stop,
                       CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) AS punct
                FROM documents
            )
        ) GROUP BY lang
    """,
    "embedding_near_dups": f"""
        WITH b AS (
            SELECT vec_id, embedding,
                   {_srp_bucket_sql('embedding')} AS bkt
            FROM embeddings
        ), cnt AS (
            SELECT bkt, count(*) AS n FROM b GROUP BY bkt
        )
        SELECT a.vec_id AS id_a, c.vec_id AS id_b,
               round(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                      CAST(c.embedding AS DOUBLE[]))
               / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                        CAST(a.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]),
                                          CAST(c.embedding AS DOUBLE[])))), 4)
                   AS cos_sim
        FROM b a JOIN cnt ca ON ca.bkt = a.bkt
        JOIN b c
          ON a.vec_id < c.vec_id
         AND bit_count(xor(a.bkt::BIGINT, c.bkt::BIGINT)) <= 1
        WHERE ca.n <= 1024
          AND list_dot_product(CAST(a.embedding AS DOUBLE[]),
                               CAST(c.embedding AS DOUBLE[]))
              / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                       CAST(a.embedding AS DOUBLE[])))
                 * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]),
                                         CAST(c.embedding AS DOUBLE[]))))
              >= 0.4
    """,
})


def _cos_sql(a: str, b: str) -> str:
    """DuckDB cosine twin of functions.vector.cosine (sequential-fold dot)."""
    return (
        f"(list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"
        f" / (sqrt(list_dot_product(CAST({a} AS DOUBLE[]), CAST({a} AS DOUBLE[])))"
        f" * sqrt(list_dot_product(CAST({b} AS DOUBLE[]), CAST({b} AS DOUBLE[])))))"
    )


ORACLE_SQL.update({
    # DuckDB's native ASOF LEFT JOIN: inclusive (l.ts >= r.ts), exactly the
    # tie semantics asof_join pins (right rows sort before left at equal ts)
    "purchase_asof_view": """
        SELECT p.event_id, p.user_id, p.ts,
               round(p.value, 4) AS purchase_value,
               v.ts AS last_view_ts,
               round(v.value, 4) AS last_view_value
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
          ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
    # block on brand, length band implied by the distance bound, verify with
    # levenshtein — mirrors operators/fuzzy.py exactly
    "fuzzy_part_pairs": """
        SELECT a.p_brand, a.p_partkey AS id_a, b.p_partkey AS id_b,
               a.p_name AS p_name_a, b.p_name AS p_name_b,
               CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_dist
        FROM part a JOIN part b
          ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        WHERE abs(length(a.p_name) - length(b.p_name)) <= 2
          AND levenshtein(a.p_name, b.p_name) <= 2
    """,
    # IVF: centroids = vec_id < 8; every vector assigned to its nearest
    # centroid cell (argmax cosine, ties -> lowest centroid id, identical to
    # the Spark max(struct(cos, -cid)) reduction); queries probe their 2
    # nearest cells and rank candidates within
    "ivf_ann_topk": f"""
        WITH cent AS (
            SELECT vec_id AS cid, embedding AS cvec
            FROM embeddings WHERE vec_id < 8
        ), ascore AS (
            SELECT e.vec_id, e.embedding, c.cid,
                   {_cos_sql('e.embedding', 'c.cvec')} AS ccos
            FROM embeddings e CROSS JOIN cent c
        ), cells AS (
            SELECT vec_id, embedding, cid AS cell FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn
                FROM ascore) WHERE rn = 1
        ), probes AS (
            SELECT vec_id AS query_id, embedding AS qvec, cid AS cell FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn
                FROM ascore WHERE vec_id < 5) WHERE rn <= 2
        ), scored AS (
            SELECT p.query_id, c.vec_id AS neighbor_id,
                   {_cos_sql('p.qvec', 'c.embedding')} AS cos_raw
            FROM probes p JOIN cells c ON p.cell = c.cell
            WHERE c.vec_id != p.query_id
        ), ranked AS (
            SELECT query_id, neighbor_id, cos_raw,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cos_raw DESC, neighbor_id ASC)
                       AS rank
            FROM scored
        )
        SELECT query_id, neighbor_id, round(cos_raw, 4) AS cos_sim,
               CAST(rank AS INT) AS rank
        FROM ranked WHERE rank <= 3
    """,
})


def _lsh_band_sig_sql(b: int, rows_per_band: int = 2) -> str:
    """DuckDB twin of dedup.minhash_bands' band signature: r concatenated
    minima; hash h = b*r + j takes slice h%4 of digest list _md5s_{h//4}
    (same digest/slice mapping as the Spark side, byte-identical)."""
    mins = []
    for j in range(rows_per_band):
        h = b * rows_per_band + j
        d, sl = h // 4, h % 4
        mins.append(
            f"list_min(list_transform(_md5s_{d}, h -> substr(h, {1 + 8 * sl}, 8)))"
        )
    return " || ".join(mins)


_LSH_BAND_PAIRS_SQL = " UNION ALL ".join(
    f"""
    SELECT a.doc_id AS id_a, c.doc_id AS id_b
    FROM sigs a
    JOIN (SELECT sig_{b} FROM sigs GROUP BY sig_{b}
          HAVING count(*) > 1 AND count(*) <= 256) ok ON a.sig_{b} = ok.sig_{b}
    JOIN sigs c ON a.sig_{b} = c.sig_{b} AND a.doc_id < c.doc_id"""
    for b in range(4)
)

ORACLE_SQL.update({
    # stage-exact twin of lsh_candidate_pairs + ngram_jaccard: same sha256
    # exact-group collapse, same md5-slice band minima, same (1, 256] bucket
    # cap, same distinct-shingle Jaccard
    "minhash_lsh_dedup_pairs": f"""
        WITH base AS (
            SELECT doc_id, text, sha256(text) AS _sha FROM documents
        ), grp AS (
            SELECT _sha, min(doc_id) AS _canon, min(text) AS _text
            FROM base GROUP BY _sha
        ), exact_pairs AS (
            SELECT g._canon AS id_a, b.doc_id AS id_b
            FROM base b JOIN grp g USING (_sha) WHERE b.doc_id != g._canon
        ), reps AS (
            -- word-5-gram shingles (dedup.word_ngrams twin): empty for
            -- docs under 5 words, exactly like the Spark side
            SELECT _canon AS doc_id,
                   list_transform(range(1, greatest(len(_ws)-4, 0)+1),
                                  i -> md5(array_to_string(_ws[i:i+4], ' '))) AS _md5s_0,
                   list_transform(range(1, greatest(len(_ws)-4, 0)+1),
                                  i -> md5(array_to_string(_ws[i:i+4], ' ') || chr(1))) AS _md5s_1
            FROM (SELECT _canon,
                         regexp_extract_all(lower(_text), '[a-z0-9]+') AS _ws
                  FROM grp)
        ), sigs AS (
            SELECT doc_id, {_lsh_band_sig_sql(0)} AS sig_0,
                   {_lsh_band_sig_sql(1)} AS sig_1,
                   {_lsh_band_sig_sql(2)} AS sig_2,
                   {_lsh_band_sig_sql(3)} AS sig_3
            FROM reps
        ), band_pairs AS ({_LSH_BAND_PAIRS_SQL}
        ), cand AS (
            SELECT DISTINCT id_a, id_b FROM (
                SELECT * FROM exact_pairs UNION ALL SELECT * FROM band_pairs)
        ), shingle_sets AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                       range(1, greatest(len(_ws)-4, 0)+1),
                       i -> array_to_string(_ws[i:i+4], ' '))) AS sh
            FROM (SELECT doc_id,
                         regexp_extract_all(lower(text), '[a-z0-9]+') AS _ws
                  FROM documents)
        )
        SELECT id_a, id_b,
               round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
                     / CAST(len(list_distinct(list_concat(sa.sh, sb.sh)))
                            AS DOUBLE), 4) AS jaccard
        FROM cand JOIN shingle_sets sa ON cand.id_a = sa.doc_id
                  JOIN shingle_sets sb ON cand.id_b = sb.doc_id
        WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
              / CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS DOUBLE)
              >= 0.5
    """,
    # BRUTE-FORCE 64-bit pair set with the hot-bucket cap mirrored: a
    # distinct-text pair must share at least one band whose DISTINCT-text
    # population is <= 256 (exact-duplicate pairs always emit). Below the
    # cap this IS pure brute force (pytest pins that at sf0.001), so the
    # hash match proves the banding + exact-group expansion lossless AND
    # the cap semantics exact where real data trips it (sf0.1 has one
    # 291-text band bucket: simhash bits are majority votes, so band keys
    # cluster on common vocabulary — unlike MinHash bands)
    "simhash_near_dup_pairs": r"""
        WITH tok AS (
            SELECT doc_id, md5(unnest(regexp_extract_all(text, '\S+'))) AS m
            FROM documents
        ), h AS (
            SELECT doc_id, ('0x' || substr(m, 1, 8))::BIGINT AS hlo,
                   ('0x' || substr(m, 9, 8))::BIGINT AS hhi
            FROM tok
        ), votes AS (
            SELECT doc_id, i,
                   sum(CASE WHEN (hlo >> i) & 1 = 1 THEN 1 ELSE -1 END) AS vlo,
                   sum(CASE WHEN (hhi >> i) & 1 = 1 THEN 1 ELSE -1 END) AS vhi
            FROM h CROSS JOIN range(32) r(i) GROUP BY doc_id, i
        ), sigs AS (
            SELECT doc_id,
                   sum(CASE WHEN vlo > 0 THEN (1::BIGINT << i) ELSE 0 END) AS lo,
                   sum(CASE WHEN vhi > 0 THEN (1::BIGINT << i) ELSE 0 END) AS hi
            FROM votes GROUP BY doc_id
        ), k AS (
            SELECT d.doc_id, md5(d.text) AS sha,
                   coalesce(g.lo, 0) AS lo, coalesce(g.hi, 0) AS hi,
                   coalesce(g.lo, 0) & 65535 AS k0,
                   (coalesce(g.lo, 0) >> 16) & 65535 AS k1,
                   coalesce(g.hi, 0) & 65535 AS k2,
                   (coalesce(g.hi, 0) >> 16) & 65535 AS k3
            FROM documents d LEFT JOIN sigs g USING (doc_id)
        ), cnt AS (
            -- DISTINCT-text population per band bucket (the Spark side
            -- bands exact-dedup representatives, so the cap counts texts)
            SELECT band, key, count(DISTINCT sha) AS n FROM (
                SELECT 0 AS band, k0 AS key, sha FROM k
                UNION ALL SELECT 1, k1, sha FROM k
                UNION ALL SELECT 2, k2, sha FROM k
                UNION ALL SELECT 3, k3, sha FROM k
            ) GROUP BY band, key
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) AS INT) AS hamming
        FROM k a
        JOIN cnt c0 ON c0.band = 0 AND c0.key = a.k0
        JOIN cnt c1 ON c1.band = 1 AND c1.key = a.k1
        JOIN cnt c2 ON c2.band = 2 AND c2.key = a.k2
        JOIN cnt c3 ON c3.band = 3 AND c3.key = a.k3
        JOIN k b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 3
          AND (a.sha = b.sha
               OR (a.k0 = b.k0 AND c0.n <= 256)
               OR (a.k1 = b.k1 AND c1.n <= 256)
               OR (a.k2 = b.k2 AND c2.n <= 256)
               OR (a.k3 = b.k3 AND c3.n <= 256))
    """,
})


ORACLE_SQL.update({
    # same regexes verbatim; RE2 and Java agree on this pattern (asserted by
    # the hash compare; \s+(?!\S) lookahead deliberately excluded — RE2 has
    # no lookahead)
    "bpe_token_stats": r"""
        WITH per_doc AS (
            SELECT lang,
                   len(regexp_extract_all(text, '\S+')) AS ws,
                   len(regexp_extract_all(text,
                       '''s|''t|''re|''ve|''m|''ll|''d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+'))
                       AS bpe
            FROM documents
        )
        SELECT lang, count(*) AS n_docs,
               CAST(sum(ws) AS BIGINT) AS ws_tokens,
               CAST(sum(bpe) AS BIGINT) AS bpe_tokens,
               round(avg(CAST(bpe AS DOUBLE) / greatest(CAST(ws AS DOUBLE), 1.0)), 4)
                   AS avg_bpe_per_ws
        FROM per_doc GROUP BY lang
    """,
})


ORACLE_SQL.update({
    # inclusive interval bounds on both ends, exactly interval_join's
    # condition; LEFT JOIN so view-less purchases emit with count 0
    "purchase_view_attribution": """
        SELECT p.event_id, p.user_id,
               count(v.ts) AS n_views_30m,
               round(coalesce(sum(v.value), 0.0), 4) AS sum_view_value
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
          ON v.user_id = p.user_id
         AND v.ts >= p.ts - INTERVAL 30 MINUTE
         AND v.ts <= p.ts
        GROUP BY p.event_id, p.user_id
    """,
})


def q_coalesce_field_lww(spark, sf_dir):
    """Field-level LWW (column_merge="coalesce" semantics as a standalone
    operator, operators/lww.py coalesce_lww_reduce): per user, each payload
    column keeps its newest NON-NULL value by (ts, event_id); 'error'
    events act as tombstones cutting older candidates; users whose newest
    event is a tombstone drop out. Partial updates are synthesized
    deterministically by masking columns (value < 50 hides event_type,
    purchases hide value, event_id % 3 != 0 hides props), so most rows
    really are partial. The DuckDB twin re-derives the fold with
    arg_max ... FILTER over a rank ordering — independent formulation,
    same semantics."""
    from sfr_ingest_pipeline_spark.operators.lww import coalesce_lww_reduce

    ev = _t(spark, sf_dir, "events")
    src = ev.select(
        "user_id", "ts", "event_id",
        F.when(F.col("value") >= 50, F.col("event_type")).alias("etype"),
        F.when(F.col("event_type") != "purchase",
               F.round("value", 2)).alias("val"),
        F.when(F.col("event_id") % 3 == 0, F.col("props")).alias("props_k"),
        (F.col("event_type") == "error").alias("_del"),
    )
    out = coalesce_lww_reduce(
        src, ["user_id"], ["ts", "event_id"], deleted="_del", n_salt=4,
    )
    return out.select(
        "user_id", "etype", "val", "props_k", "ts",
        F.col("event_id").alias("last_event_id"),
    )


QUERIES["coalesce_field_lww"] = q_coalesce_field_lww
ORACLE_SQL.update({
    # brute-force formulation of the field-level fold: rank events per
    # user, take each column's arg_max over non-null candidates newer than
    # the latest tombstone; the newest row overall supplies (ts, event_id)
    # and tombstone-at-head drops the user
    "coalesce_field_lww": """
        WITH src AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN value >= 50 THEN event_type END AS etype,
                   CASE WHEN event_type <> 'purchase'
                        THEN round(value, 2) END AS val,
                   CASE WHEN event_id % 3 = 0 THEN props END AS props_k,
                   (event_type = 'error') AS del
            FROM events
        ), ord AS (
            SELECT *,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn,
                   count(*) OVER (PARTITION BY user_id) AS cnt
            FROM src
        ), delhw AS (
            SELECT user_id, max(rn) AS del_rn FROM ord WHERE del
            GROUP BY user_id
        ), vals AS (
            SELECT o.user_id,
                   arg_max(o.etype, o.rn) FILTER (
                       o.etype IS NOT NULL AND NOT o.del
                       AND (d.del_rn IS NULL OR o.rn > d.del_rn)) AS etype,
                   arg_max(o.val, o.rn) FILTER (
                       o.val IS NOT NULL AND NOT o.del
                       AND (d.del_rn IS NULL OR o.rn > d.del_rn)) AS val,
                   arg_max(o.props_k, o.rn) FILTER (
                       o.props_k IS NOT NULL AND NOT o.del
                       AND (d.del_rn IS NULL OR o.rn > d.del_rn)) AS props_k
            FROM ord o LEFT JOIN delhw d USING (user_id)
            GROUP BY o.user_id
        )
        SELECT w.user_id, v.etype, v.val, v.props_k, w.ts,
               w.event_id AS last_event_id
        FROM (SELECT * FROM ord WHERE rn = cnt) w
        JOIN vals v USING (user_id)
        WHERE NOT w.del
    """,
})


def q_date_ranges(spark, sf_dir):
    """Fuzzy display-date parsing (functions/dates.py parse_display_date,
    SURVEY.md §2.8 F2): display strings are synthesized deterministically
    from o_orderdate in seven reference-observed shapes ("1999", "[1999]",
    "May 1999", ISO day, "1999-05", "c1999.", "n.d.") and parsed back to
    (date_low, date_high) by the Arrow-batched pandas UDF. The DuckDB twin
    derives the expected range DIRECTLY from o_orderdate — an independent
    formulation, so the hash match proves the parser inverts every shape."""
    from sfr_ingest_pipeline_spark.functions.dates import parse_display_date

    o = _spread(_t(spark, sf_dir, "orders"))
    k = F.col("o_orderkey") % 7
    disp = (
        F.when(k == 0, F.date_format("o_orderdate", "yyyy"))
        .when(k == 1, F.concat(F.lit("["), F.date_format("o_orderdate", "yyyy"),
                               F.lit("]")))
        .when(k == 2, F.date_format("o_orderdate", "MMMM yyyy"))
        .when(k == 3, F.date_format("o_orderdate", "yyyy-MM-dd"))
        .when(k == 4, F.date_format("o_orderdate", "yyyy-MM"))
        .when(k == 5, F.concat(F.lit("c"), F.date_format("o_orderdate", "yyyy"),
                               F.lit(".")))
        .otherwise(F.lit("n.d."))
    )
    parsed = o.select(
        "o_orderkey", disp.alias("display_date")
    ).withColumn("_r", parse_display_date("display_date"))
    # timestamps, not dates: Spark dates surface in pandas as object
    # columns of datetime.date, which the frame compare can't align with
    # DuckDB's datetime64 — the value domain is unchanged
    return parsed.select(
        "o_orderkey", "display_date",
        F.col("_r.date_low").cast("timestamp").alias("date_low"),
        F.col("_r.date_high").cast("timestamp").alias("date_high"),
    )


QUERIES["date_ranges"] = q_date_ranges
ORACLE_SQL.update({
    # expected ranges derived straight from o_orderdate (never re-parsing
    # the display string) — independent of the UDF's regex rules
    "date_ranges": """
        SELECT o_orderkey,
               CASE o_orderkey % 7
                 WHEN 0 THEN strftime(o_orderdate, '%Y')
                 WHEN 1 THEN '[' || strftime(o_orderdate, '%Y') || ']'
                 WHEN 2 THEN strftime(o_orderdate, '%B %Y')
                 WHEN 3 THEN strftime(o_orderdate, '%Y-%m-%d')
                 WHEN 4 THEN strftime(o_orderdate, '%Y-%m')
                 WHEN 5 THEN 'c' || strftime(o_orderdate, '%Y') || '.'
                 ELSE 'n.d.' END AS display_date,
               CASE o_orderkey % 7
                 WHEN 2 THEN date_trunc('month', o_orderdate)::TIMESTAMP
                 WHEN 3 THEN o_orderdate::TIMESTAMP
                 WHEN 4 THEN date_trunc('month', o_orderdate)::TIMESTAMP
                 WHEN 6 THEN NULL
                 ELSE make_date(year(o_orderdate), 1, 1)::TIMESTAMP
               END AS date_low,
               CASE o_orderkey % 7
                 WHEN 2 THEN last_day(o_orderdate)::TIMESTAMP
                 WHEN 3 THEN o_orderdate::TIMESTAMP
                 WHEN 4 THEN last_day(o_orderdate)::TIMESTAMP
                 WHEN 6 THEN NULL
                 ELSE make_date(year(o_orderdate), 12, 31)::TIMESTAMP
               END AS date_high
        FROM orders
    """,
})


def q_part_name_clusters(spark, sf_dir):
    """Dedup clustering (iterative algorithm surface): connected components
    over the fuzzy part-name pair graph (functions/graph.py min-label
    propagation loop) -> (p_partkey, cluster) where cluster is the smallest
    reachable partkey. The DuckDB twin re-derives components with a
    RECURSIVE transitive-closure CTE — an entirely different formulation,
    so the hash match proves the Spark fixpoint exact."""
    from sfr_ingest_pipeline_spark.functions.graph import connected_components
    from sfr_ingest_pipeline_spark.operators.fuzzy import fuzzy_self_pairs

    part = _spread(_t(spark, sf_dir, "part"))
    pairs = fuzzy_self_pairs(
        part, id_col="p_partkey", col="p_name", max_dist=2, block_on="p_brand"
    )
    comp = connected_components(pairs, "id_a", "id_b")
    return comp.select(
        F.col("node").alias("p_partkey"),
        F.col("component").alias("cluster"),
    )


def q_part_name_clusters_bigstar(spark, sf_dir):
    """Same dedup clustering through the OTHER iterative algorithm:
    large-star/small-star (functions/graph.py algorithm="alternating",
    Kiveris et al. 2014 — the O(log^2 n)-round shape for
    adversarial-diameter graphs). Components are algorithm-independent, so
    this shares part_name_clusters' RECURSIVE-CTE oracle; a hash match
    here proves the alternating fixpoint exact on a real pair graph, not
    just on synthetic pytest graphs."""
    from sfr_ingest_pipeline_spark.functions.graph import connected_components
    from sfr_ingest_pipeline_spark.operators.fuzzy import fuzzy_self_pairs

    part = _spread(_t(spark, sf_dir, "part"))
    pairs = fuzzy_self_pairs(
        part, id_col="p_partkey", col="p_name", max_dist=2, block_on="p_brand"
    )
    comp = connected_components(pairs, "id_a", "id_b", algorithm="alternating")
    return comp.select(
        F.col("node").alias("p_partkey"),
        F.col("component").alias("cluster"),
    )


QUERIES["part_name_clusters"] = q_part_name_clusters
ORACLE_SQL.update({
    # recursive transitive closure over the SAME fuzzy pair graph: a node's
    # cluster is the least id among itself and everything reachable
    "part_name_clusters": """
        WITH RECURSIVE pairs AS (
            SELECT a.p_partkey AS id_a, b.p_partkey AS id_b
            FROM part a JOIN part b
              ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
            WHERE abs(length(a.p_name) - length(b.p_name)) <= 2
              AND levenshtein(a.p_name, b.p_name) <= 2
        ), edges AS (
            SELECT id_a AS a, id_b AS b FROM pairs
            UNION
            SELECT id_b, id_a FROM pairs
        ), reach(a, b) AS (
            SELECT a, b FROM edges
            UNION
            SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
        )
        SELECT a AS p_partkey, least(a, min(b)) AS cluster
        FROM reach GROUP BY a
    """,
})
QUERIES["part_name_clusters_bigstar"] = q_part_name_clusters_bigstar
# components are algorithm-independent: the alternating variant must match
# the SAME recursive-CTE closure, row for row
ORACLE_SQL["part_name_clusters_bigstar"] = ORACLE_SQL["part_name_clusters"]


def q_stratified_sample_docs(spark, sf_dir):
    """Deterministic stratified sampling (functions/sampling.py): keep 50%
    of English docs, 10% of German, 25% of everything else, keyed on
    md5(salt || doc_id) so membership is a pure row function (stable under
    repartitioning and engine-portable — the DuckDB twin computes the SAME
    hash slots and must select the SAME rows, hash-exact)."""
    from sfr_ingest_pipeline_spark.functions.sampling import (
        stratified_hash_sample,
    )
    from sfr_ingest_pipeline_spark.functions.text import lang_id

    docs = _spread(_t(spark, sf_dir, "documents")).withColumn(
        "lang", lang_id(F.col("text"))
    )
    kept = stratified_hash_sample(
        docs, "doc_id", "lang", {"en": 0.5, "de": 0.1},
        default_fraction=0.25, salt="corpus-v1",
    )
    return kept.select("doc_id", "lang")


QUERIES["stratified_sample_docs"] = q_stratified_sample_docs
ORACLE_SQL.update({
    # same md5 slot computation + same per-language thresholds; the twin
    # must select the SAME rows, not merely the same count
    "stratified_sample_docs": f"""
        WITH langed AS (
            SELECT doc_id,
                CASE WHEN best = 0 THEN 'und'
                     WHEN en = best THEN 'en'
                     WHEN de = best THEN 'de'
                     WHEN fr = best THEN 'fr'
                     WHEN es = best THEN 'es'
                     ELSE 'und' END AS lang
            FROM (
                SELECT doc_id, en, de, fr, es,
                       greatest(en, de, fr, es) AS best
                FROM (
                    SELECT doc_id,
                        {_MARKER_COUNT.format(re=_LANG_RES['en'])} AS en,
                        {_MARKER_COUNT.format(re=_LANG_RES['de'])} AS de,
                        {_MARKER_COUNT.format(re=_LANG_RES['fr'])} AS fr,
                        {_MARKER_COUNT.format(re=_LANG_RES['es'])} AS es
                    FROM documents
                )
            )
        ), slotted AS (
            SELECT l.doc_id, l.lang,
                   ('0x' || substr(md5('corpus-v1' || CAST(l.doc_id AS VARCHAR)), 1, 8))::BIGINT
                       % 10000 AS slot
            FROM langed l
        )
        SELECT doc_id, lang FROM slotted
        WHERE slot < CASE lang WHEN 'en' THEN 5000
                               WHEN 'de' THEN 1000
                               ELSE 2500 END
    """,
})


# Composed dedup pipeline oracle: the full LSH+verify twin becomes a
# derived table, a RECURSIVE CTE re-derives clusters, and the kept set is
# the corpus minus non-canonical cluster members — every stage recomputed
# independently of the engine.
ORACLE_SQL["near_dedup_kept_docs"] = f"""
    WITH RECURSIVE verified AS (
        SELECT id_a, id_b FROM ({ORACLE_SQL["minhash_lsh_dedup_pairs"]}) v
    ), edges AS (
        SELECT id_a AS a, id_b AS b FROM verified
        UNION
        SELECT id_b, id_a FROM verified
    ), reach(a, b) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ), comp AS (
        SELECT a AS node, least(a, min(b)) AS cluster FROM reach GROUP BY a
    ), dropped AS (
        SELECT node FROM comp WHERE node != cluster
    )
    SELECT doc_id FROM documents
    WHERE doc_id NOT IN (SELECT node FROM dropped)
"""


def q_tfidf_top_terms(spark, sf_dir):
    """Top-3 TF-IDF terms per document (functions/text.py tfidf_top_terms):
    the classic corpus-statistics operator a training-data pipeline uses for
    keyword extraction / topic tagging. Deterministic rank: (rounded score
    desc, term asc)."""
    docs = _t(spark, sf_dir, "documents")
    return TX.tfidf_top_terms(docs, "doc_id", "text", k=3)


def q_repetition_flags(spark, sf_dir):
    """Gopher-style within-document repetition stats (functions/text.py
    repetition_stats) + the quality flag a filter stage would gate on."""
    docs = _t(spark, sf_dir, "documents")
    stats = TX.repetition_stats(docs, "doc_id", "text")
    # n_words as double: the oracle's un-cast sum() is a DuckDB HUGEINT that
    # lands in pandas as float64, and the driver's value-hash distinguishes
    # 34 (int64) from 34.0 (float64) — CORRECTNESS_r05 hash_match=false.
    return stats.withColumn("n_words", F.col("n_words").cast("double")).withColumn(
        "flagged",
        (F.col("top_word_frac") > 0.2) | (F.col("dup_bigram_frac") > 0.2),
    )


QUERIES["tfidf_top_terms"] = q_tfidf_top_terms
QUERIES["repetition_flags"] = q_repetition_flags
ORACLE_SQL.update({
    "tfidf_top_terms": r"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
            FROM documents
        ), tf AS (
            SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
        ), df AS (
            SELECT term, count(*) AS df FROM tf GROUP BY 1
        ), n AS (
            SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents
        ), scored AS (
            SELECT doc_id, term, tf, df,
                   round(tf * ln(n_docs / df), 4) AS tfidf
            FROM tf JOIN df USING (term) CROSS JOIN n
        )
        SELECT doc_id, term, tf, df, tfidf, rk FROM (
            SELECT *, CAST(row_number() OVER (
                       PARTITION BY doc_id ORDER BY tfidf DESC, term
                   ) AS INT) AS rk
            FROM scored
        ) WHERE rk <= 3
    """,
    "repetition_flags": r"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
            FROM documents
        ), wcounts AS (
            SELECT doc_id, term, count(*) AS cnt FROM toks GROUP BY 1, 2
        ), wstats AS (
            SELECT doc_id, sum(cnt) AS n_words, max(cnt) AS top_cnt
            FROM wcounts GROUP BY 1
        ), warr AS (
            SELECT doc_id,
                   regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
            FROM documents
        ), bg AS (
            SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS bg
            FROM warr, unnest(range(1, len(ws))) AS t(i)
        ), bcounts AS (
            SELECT doc_id, bg, count(*) AS cnt FROM bg GROUP BY 1, 2
        ), bstats AS (
            SELECT doc_id, sum(cnt) AS n_bigrams,
                   count(*) AS n_distinct_bigrams
            FROM bcounts GROUP BY 1
        )
        SELECT w.doc_id, w.n_words,
               round(w.top_cnt / CAST(greatest(w.n_words, 1) AS DOUBLE), 4)
                   AS top_word_frac,
               round((coalesce(b.n_bigrams, 0) - coalesce(b.n_distinct_bigrams, 0))
                     / CAST(greatest(coalesce(b.n_bigrams, 0), 1) AS DOUBLE), 4)
                   AS dup_bigram_frac,
               (round(w.top_cnt / CAST(greatest(w.n_words, 1) AS DOUBLE), 4) > 0.2
                OR round((coalesce(b.n_bigrams, 0) - coalesce(b.n_distinct_bigrams, 0))
                         / CAST(greatest(coalesce(b.n_bigrams, 0), 1) AS DOUBLE), 4) > 0.2)
                   AS flagged
        FROM wstats w LEFT JOIN bstats b USING (doc_id)
    """,
})


def q_cross_doc_ngram_dup(spark, sf_dir):
    """Sub-document cross-corpus duplication (functions/dedup.py
    cross_doc_ngram_dup): per doc, the fraction of its distinct word
    5-grams that occur in >= 2 documents — catches boilerplate whole-doc
    hashing misses."""
    docs = _spread(_t(spark, sf_dir, "documents"))
    return D.cross_doc_ngram_dup(docs, "doc_id", "text", n=5)


def q_benchmark_decontamination(spark, sf_dir):
    """Benchmark decontamination (functions/dedup.py decontaminate_hits):
    benchmark = every 7th doc (deterministic holdout stand-in); flag
    corpus docs sharing any word 5-gram with it. The benchmark gram set
    broadcasts — the corpus side never shuffles for the probe."""
    docs = _spread(_t(spark, sf_dir, "documents"))
    bench = docs.filter(F.col("doc_id") % 7 == 0)
    corpus = docs.filter(F.col("doc_id") % 7 != 0)
    return D.decontaminate_hits(corpus, bench, "doc_id", "text", n=5)


QUERIES["cross_doc_ngram_dup"] = q_cross_doc_ngram_dup
QUERIES["benchmark_decontamination"] = q_benchmark_decontamination
_GRAMS_CTE = r"""
        warr AS (
            SELECT doc_id,
                   regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
            FROM documents
        ), grams AS (
            SELECT DISTINCT doc_id, array_to_string(ws[i:i+4], ' ') AS g
            FROM warr,
                 unnest(range(1, greatest(len(ws) - 4, 0) + 1)) AS t(i)
        )
"""
ORACLE_SQL.update({
    "cross_doc_ngram_dup": f"""
        WITH {_GRAMS_CTE}, gdf AS (
            SELECT g, count(*) AS gdf FROM grams GROUP BY 1
        )
        SELECT doc_id,
               count(*) AS n_grams,
               CAST(sum(CASE WHEN gdf >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_shared,
               round(sum(CASE WHEN gdf >= 2 THEN 1 ELSE 0 END)
                     / CAST(greatest(count(*), 1) AS DOUBLE), 4) AS shared_frac
        FROM grams JOIN gdf USING (g)
        GROUP BY doc_id
    """,
    "benchmark_decontamination": f"""
        WITH {_GRAMS_CTE}, bench AS (
            SELECT DISTINCT g FROM grams WHERE doc_id % 7 = 0
        )
        SELECT doc_id, count(*) AS n_hits
        FROM grams JOIN bench USING (g)
        WHERE doc_id % 7 != 0
        GROUP BY doc_id
    """,
})


# --------------------------------------------------------------------------
# PII detection + redaction (functions/pii.py, F10): scrubbing contact data
# out of conversation logs before a training corpus is as routine as dedup.
# The synthetic line is built from ONE dialect-shared SQL template (no
# backslashes, `||`/lpad/CAST only) so Spark and DuckDB feed byte-identical
# text into their respective regex engines; the patterns themselves are
# restricted to the Java-regex ∩ RE2 ∩ Python-`re` subset (pii.py docstring)
# so the redaction output is hash-exact, not approximate.
_PII_LINE = (
    "'Reach ' || lower(c_name) || '@example.com or call '"
    " || CAST(10 + c_nationkey AS STRING)"
    " || '-' || lpad(CAST((c_custkey * 37) % 1000 AS STRING), 3, '0')"
    " || '-' || lpad(CAST((c_custkey * 53) % 1000 AS STRING), 3, '0')"
    " || '-' || lpad(CAST((c_custkey * 91) % 10000 AS STRING), 4, '0')"
    " || ' (ssn ' || lpad(CAST(c_custkey % 1000 AS STRING), 3, '0')"
    " || '-' || lpad(CAST(c_custkey % 100 AS STRING), 2, '0')"
    " || '-' || lpad(CAST((c_custkey * 7) % 10000 AS STRING), 4, '0')"
    " || ', ip 10.' || CAST(c_nationkey AS STRING) || '.0.'"
    " || CAST(c_custkey % 256 AS STRING) || ')'"
)


def q_pii_redaction(spark, sf_dir):
    """Chained PII redaction + per-kind counts over a synthetic contact
    line per customer (functions/pii.py). Whole-stage-codegen projection —
    no UDF, no shuffle: at 100 TB this runs at parquet-scan speed."""
    cust = _spread(_t(spark, sf_dir, "customer")).withColumn("line", F.expr(_PII_LINE))
    return cust.select(
        "c_custkey",
        PII.redact_pii("line").alias("redacted"),
        PII.pii_count("line", "email").alias("n_email"),
        PII.pii_count("line", "ssn").alias("n_ssn"),
        PII.pii_count("line", "phone").alias("n_phone"),
        PII.pii_count("line", "ipv4").alias("n_ipv4"),
    )


QUERIES["pii_redaction"] = q_pii_redaction
ORACLE_SQL["pii_redaction"] = f"""
    WITH lines AS (
        SELECT c_custkey, {_PII_LINE} AS line FROM customer
    )
    SELECT c_custkey,
           {PII.redact_pii_sql('line', 'duckdb')} AS redacted,
           {PII.pii_count_sql('line', 'email', 'duckdb')} AS n_email,
           {PII.pii_count_sql('line', 'ssn', 'duckdb')} AS n_ssn,
           {PII.pii_count_sql('line', 'phone', 'duckdb')} AS n_phone,
           {PII.pii_count_sql('line', 'ipv4', 'duckdb')} AS n_ipv4
    FROM lines
"""


# --------------------------------------------------------------------------
# Repetition quality stats (Gopher-style filtering rules): duplicate-word
# and duplicate-bigram fractions are the standard "is this document
# degenerate boilerplate?" signals a training-corpus pipeline gates on.
# Linear shape: explode -> two-stage hash agg (map-side partial combine),
# never the O(words^2) array-only formulation — at 100 TB a long document
# must cost O(len), and the per-(doc, gram) agg shuffles once.
def q_repetition_stats(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    w = docs.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda x: x != F.lit("")).alias("ws"),
    )
    uni = (
        w.select("doc_id", F.explode("ws").alias("word"))
        .groupBy("doc_id", "word").count()
        .groupBy("doc_id").agg(
            F.sum("count").alias("n_words"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.max("count").alias("top_cnt"),
        )
    )
    bg = (
        w.select(
            "doc_id",
            F.explode(
                F.zip_with(
                    F.slice("ws", 1, F.size("ws") - 1),
                    F.slice("ws", 2, F.size("ws") - 1),
                    lambda a, b: F.concat(a, F.lit(" "), b),
                )
            ).alias("bigram"),
        )
        .groupBy("doc_id", "bigram").count()
        .groupBy("doc_id").agg(
            F.sum("count").alias("n_bigrams"),
            F.count(F.lit(1)).alias("n_distinct_bg"),
        )
    )
    return (
        uni.join(bg, "doc_id")
        .select(
            "doc_id",
            F.col("n_words").cast("long").alias("n_words"),
            F.round(F.col("n_distinct") / F.col("n_words"), 6)
            .alias("distinct_word_ratio"),
            F.round(F.col("top_cnt") / F.col("n_words"), 6)
            .alias("top_word_frac"),
            F.round(
                (F.col("n_bigrams") - F.col("n_distinct_bg"))
                / F.col("n_bigrams"), 6,
            ).alias("dup_bigram_frac"),
        )
    )


QUERIES["repetition_stats"] = q_repetition_stats
ORACLE_SQL["repetition_stats"] = """
    WITH w AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS ws
        FROM documents
    ), uni AS (
        SELECT doc_id, word, count(*) AS c
        FROM (SELECT doc_id, unnest(ws) AS word FROM w)
        GROUP BY doc_id, word
    ), unistats AS (
        SELECT doc_id, sum(c) AS n_words, count(*) AS n_distinct,
               max(c) AS top_cnt
        FROM uni GROUP BY doc_id
    ), bg AS (
        SELECT doc_id, bigram, count(*) AS c
        FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       range(1, len(ws)),
                       i -> ws[i] || ' ' || ws[i+1])) AS bigram
            FROM w
        )
        GROUP BY doc_id, bigram
    ), bgstats AS (
        SELECT doc_id, sum(c) AS n_bigrams, count(*) AS n_distinct_bg
        FROM bg GROUP BY doc_id
    )
    SELECT u.doc_id,
           CAST(u.n_words AS BIGINT) AS n_words,
           round(CAST(u.n_distinct AS DOUBLE) / u.n_words, 6)
               AS distinct_word_ratio,
           round(CAST(u.top_cnt AS DOUBLE) / u.n_words, 6) AS top_word_frac,
           round(CAST(b.n_bigrams - b.n_distinct_bg AS DOUBLE) / b.n_bigrams, 6)
               AS dup_bigram_frac
    FROM unistats u JOIN bgstats b USING (doc_id)
"""


# --------------------------------------------------------------------------
# Context-window chunking: split each document into 32-token windows with
# stride 24 (8-token overlap) — the canonical prep step between a cleaned
# corpus and a fixed-context trainer. Pure codegen fan-out: sequence +
# explode + slice on the token array, no UDF and no shuffle (the explode
# multiplies rows map-side); at 100 TB this is parquet-scan bound.
_CHUNK, _STRIDE = 32, 24


def q_doc_chunks(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    w = docs.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda x: x != F.lit("")).alias("ws"),
    )
    n_chunks = F.when(F.size("ws") <= _CHUNK, F.lit(1)).otherwise(
        F.ceil((F.size("ws") - _CHUNK) / F.lit(_STRIDE)).cast("long") + 1
    )
    return (
        w.withColumn("i", F.explode(F.sequence(F.lit(0), n_chunks - 1)))
        .select(
            "doc_id",
            F.col("i").cast("int").alias("chunk_idx"),
            F.array_join(
                F.slice("ws", F.col("i") * _STRIDE + 1, _CHUNK), " "
            ).alias("chunk_text"),
            F.size(
                F.slice("ws", F.col("i") * _STRIDE + 1, _CHUNK)
            ).cast("int").alias("n_tokens"),
        )
    )


QUERIES["doc_chunks"] = q_doc_chunks
ORACLE_SQL["doc_chunks"] = f"""
    WITH w AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS ws
        FROM documents
    ), n AS (
        SELECT doc_id, ws,
               CASE WHEN len(ws) <= {_CHUNK} THEN 1
                    ELSE CAST(ceil(CAST(len(ws) - {_CHUNK} AS DOUBLE)
                                   / {_STRIDE}) AS BIGINT) + 1
               END AS n_chunks
        FROM w
    )
    SELECT doc_id, CAST(i AS INT) AS chunk_idx,
           array_to_string(
               list_slice(ws, i*{_STRIDE} + 1, i*{_STRIDE} + {_CHUNK}), ' ')
               AS chunk_text,
           CAST(len(list_slice(ws, i*{_STRIDE} + 1, i*{_STRIDE} + {_CHUNK}))
                AS INT) AS n_tokens
    FROM n, unnest(range(n_chunks)) AS t(i)
"""


def q_pq_ann_topk(spark, sf_dir):
    """Product-quantization ANN (functions/vector.py pq_encode/pq_topk):
    vectors L2-normalized and split into 8 subspaces, each quantized to the
    matching slice of the 16 lowest-id vectors (fixed codebooks, so the
    DuckDB twin can replicate them exactly — same trick as ivf_ann_topk's
    seed centroids; real deployments train with train_pq_codebooks, pinned
    by pytest). Queries score candidates via the dot-product ADC lookup
    table over the 8 code bytes only — the 100 TB path never touches
    corpus float arrays."""
    emb = _spread(_t(spark, sf_dir, "embeddings"))
    seeds = emb.filter(F.col("vec_id") < 16).orderBy("vec_id").collect()

    def _norm(v):
        import math
        n = math.sqrt(sum(float(x) * float(x) for x in v))
        return [float(x) / n for x in v]

    sub = 8
    books = [
        [_norm(r["embedding"])[s * sub:(s + 1) * sub] for r in seeds]
        for s in range(8)
    ]
    codes = V.pq_encode(emb, books, dim=64)
    queries = emb.filter(F.col("vec_id") < 5)
    top = V.pq_topk(codes, queries, books, k=3, dim=64)
    return top.select(
        "query_id", "neighbor_id",
        F.round("adc_score", 4).alias("adc_score"),
        F.col("rank").cast("int").alias("rank"),
    )


QUERIES["pq_ann_topk"] = q_pq_ann_topk

_PQ_L2SQ = (
    "list_sum(list_transform(range(1, 9), "
    "i -> (d.sub[i] - c.sub[i]) * (d.sub[i] - c.sub[i])))"
)

ORACLE_SQL["pq_ann_topk"] = f"""
    WITH normed AS (
        SELECT vec_id,
               list_transform(CAST(embedding AS DOUBLE[]),
                   x -> x / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                                  CAST(embedding AS DOUBLE[])))) AS v
        FROM embeddings
    ), subs AS (
        SELECT vec_id, s, v[s*8+1 : s*8+8] AS sub
        FROM normed CROSS JOIN range(8) r(s)
    ), cb AS (
        SELECT s, vec_id AS j, sub FROM subs WHERE vec_id < 16
    ), dists AS (
        SELECT d.vec_id, d.s, c.j, {_PQ_L2SQ} AS dist
        FROM subs d JOIN cb c ON d.s = c.s
    ), codes AS (
        SELECT vec_id, s, j AS code FROM (
            SELECT *, row_number() OVER (
                PARTITION BY vec_id, s ORDER BY dist ASC, j ASC) AS rn
            FROM dists) WHERE rn = 1
    ), qsubs AS (
        SELECT vec_id AS query_id, s, sub AS qsub FROM subs WHERE vec_id < 5
    ), contribs AS (
        -- LUT[s][code]: dot(query subvector, codebook centroid of the
        -- DOC's code in subspace s)
        SELECT q.query_id, d.vec_id AS neighbor_id, d.s,
               list_dot_product(q.qsub, c.sub) AS contrib
        FROM codes d
        JOIN qsubs q ON q.s = d.s
        JOIN cb c ON c.s = d.s AND c.j = d.code
        WHERE d.vec_id != q.query_id
    ), scored AS (
        -- sequential fold in subspace order (matches the Spark aggregate)
        SELECT query_id, neighbor_id,
               list_sum(list(contrib ORDER BY s)) AS adc
        FROM contribs GROUP BY query_id, neighbor_id
    ), ranked AS (
        SELECT query_id, neighbor_id, adc,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY adc DESC, neighbor_id ASC) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, round(adc, 4) AS adc_score,
           CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 3
"""
