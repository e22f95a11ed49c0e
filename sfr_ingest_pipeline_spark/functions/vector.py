"""Vector/similarity-search operators over embedding columns (array<float>).

Brute-force exact cosine top-k as the correctness baseline, and an
LSH-bucketed (random-hyperplane / SRP) approximate variant as the scale
path. Dot products run JVM-side via F.aggregate/zip_with over arrays cast to
double (element-order-sequential fold — bit-identical to DuckDB's list_sum
over list_transform, which the oracle uses).

At 100 TB: brute-force is a broadcast of the (small) query set against the
corpus — O(Q*N) but embarrassingly parallel, no shuffle of the corpus; the
SRP variant shuffles once on bucket id, then joins only within buckets.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two float arrays, in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_prenormed(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine with per-row norms precomputed BEFORE a pairwise join.

    Bit-identical to ``cosine`` (same values, same fold, same operation
    order: dot / (norm_a * norm_b)) but evaluates ONE higher-order fold per
    pair instead of three — Spark interprets HOF lambdas rather than
    codegen-ing them, so on an M-pair candidate join this measures ~3x
    cheaper. (An unrolled 64-term codegen expression chain was also
    measured: 4x SLOWER than the fold — the giant tree defeats codegen —
    so the fold + prenorm is the kept design.) Precompute each side's norm
    once per ROW (O(N+M)), never per pair."""
    return dot(a, b) / (norm_a * norm_b)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Cross join with the QUERY side broadcast (queries << corpus at scale);
    rank per query by (cosine desc, neighbor id) for determinism."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        l2_norm(F.col(vec_col)).alias("_qnorm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cvec"),
        l2_norm(F.col(vec_col)).alias("_cnorm"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_prenormed(
                F.col("_qvec"), F.col("_cvec"), F.col("_qnorm"), F.col("_cnorm")
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _srp_planes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (pure python, seeded)."""
    import random

    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def srp_bucket(vec: Column, dim: int, n_planes: int = 8, seed: int = 42) -> Column:
    """Signed-random-projection LSH bucket id (0..2^n_planes-1)."""
    planes = _srp_planes(dim, n_planes, seed)
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(x) for x in p])
        bucket = bucket + F.when(dot(vec, plane) > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def srp_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_planes: int = 6,
    seed: int = 42,
    hamming_radius: int = 0,
    max_bucket_size: int | None = 1024,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's SRP bucket.

    ``max_bucket_size`` is the hot-bucket guard (same contract as
    ``lsh_candidate_pairs``): a corpus bucket holding more than this many
    vectors is degenerate for the chosen n_planes (e.g. near-identical
    embeddings) and contributes NO candidates, so a pathological corpus
    completes linearly instead of Q x N. Size n_planes so real buckets stay
    under the cap; None disables.

    ``hamming_radius=1`` enables multi-probe: the query additionally probes
    every bucket one bit-flip away (n_planes extra probes), trading
    (n_planes+1)x candidate volume for recall — the standard multi-probe LSH
    knob. The candidate set is then exactly {c : hamming(b(q), b(c)) <= 1},
    which the DuckDB oracle mirrors with bit_count(xor(...)) <= 1.

    Recall < 1 by construction; pytest asserts recall against brute force
    and that radius 1 strictly dominates radius 0.
    Scale path: one shuffle on bucket id instead of Q x N scoring; the
    corpus side never replicates (probes explode the small query side)."""
    # corpus-side bucket+norm via the Arrow kernel (bit-identical fold, see
    # with_srp_buckets_arrow): the interpreted HOF chain was the corpus
    # scan's dominant cost and is re-evaluated by the hot-bucket branch
    c = with_srp_buckets_arrow(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec")
        ),
        "_cvec", dim, n_planes, seed,
        bucket_col="_bucket", norm_col="_cnorm",
    )
    if max_bucket_size is not None:
        hot = (
            c.groupBy("_bucket").agg(F.count(F.lit(1)).alias("_bn"))
            .filter(F.col("_bn") > max_bucket_size).select("_bucket")
        )
        c = c.join(F.broadcast(hot), "_bucket", "left_anti")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        l2_norm(F.col(vec_col)).alias("_qnorm"),
        srp_bucket(F.col(vec_col), dim, n_planes, seed).alias("_qbucket"),
    )
    if hamming_radius >= 1:
        probes = F.array(
            F.col("_qbucket"),
            *[F.col("_qbucket").bitwiseXOR(F.lit(1 << j)) for j in range(n_planes)],
        )
    else:
        probes = F.array(F.col("_qbucket"))
    q = q.withColumn("_bucket", F.explode(probes)).drop("_qbucket")
    scored = (
        c.join(F.broadcast(q), "_bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_prenormed(
                F.col("_qvec"), F.col("_cvec"), F.col("_qnorm"), F.col("_cnorm")
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def assign_ivf_cells(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_rank: int = 1,
    method: str = "auto",
) -> DataFrame:
    """Assign each vector to its ``cell_rank`` nearest centroid cells by
    cosine (ties broken by centroid id asc). Output: (id_col, vec_col,
    _norm, _cell) — one row per (vector, probed cell); _norm is the row's
    precomputed L2 norm so downstream scoring pays one fold per pair.

    Two physical strategies, same result:

    * ``codegen`` — broadcast nested-loop join + partial-aggregable
      ``max(struct(cos, -cid))``: pure-SQL, oracle-twin-checkable, and the
      right plan for SMALL centroid sets (the driver queries run k<=8).
    * ``arrow`` — mapInPandas matrix argmax: each Arrow batch stacks to an
      (n x dim) matrix and one BLAS gemm against the broadcast (k x dim)
      centroid matrix scores every (vector, centroid) pair. For large k
      the join shape is wrong by construction — it EXPANDS the corpus k-fold
      (1M x 128 centroids = 128M rows each dragging the float array through
      the agg, ~34 GB of traffic measured at dim=64) while the gemm touches
      each vector once; measured 40x on that shape. Ties break to the
      lowest centroid id (np.argmax keeps the first maximum).

    ``auto`` picks arrow when the centroid count >= 32 and cell_rank == 1
    (the corpus-side path); queries-side probing (cell_rank > 1) stays on
    the window plan — that side is tiny."""
    if method not in ("auto", "codegen", "arrow"):
        raise ValueError(f"unknown method {method!r}")
    if method == "arrow" and cell_rank != 1:
        # an explicit strategy request must not silently fall through to
        # the window plan (ADVICE r5); top-r is not implemented in the
        # arrow kernel
        raise ValueError(
            "method='arrow' supports cell_rank=1 only; use method='auto' "
            "or 'codegen' for multi-cell probing"
        )
    if method != "codegen" and cell_rank == 1:
        cent_rows = centroids.select(id_col, vec_col).collect() \
            if method == "arrow" else None
        if cent_rows is None:  # auto: count first (centroids are tiny)
            n_cent = centroids.count()
            if n_cent >= 32:
                cent_rows = centroids.select(id_col, vec_col).collect()
        if cent_rows is not None:
            return _assign_ivf_cells_arrow(
                vectors, cent_rows, id_col, vec_col
            )
    cent = centroids.select(
        F.col(id_col).alias("_cid"),
        F.col(vec_col).alias("_centvec"),
        l2_norm(F.col(vec_col)).alias("_centnorm"),
    )
    vecs = vectors.select(
        id_col, vec_col, l2_norm(F.col(vec_col)).alias("_norm")
    )
    scored = vecs.crossJoin(F.broadcast(cent)).select(
        id_col,
        vec_col,
        "_norm",
        "_cid",
        cosine_prenormed(
            F.col(vec_col), F.col("_centvec"), F.col("_norm"), F.col("_centnorm")
        ).alias("_ccos"),
    )
    if cell_rank == 1:
        # argmax without a window: max(struct) keeps the combine map-side
        best = scored.groupBy(id_col).agg(
            F.max(F.struct(F.col("_ccos"), (-F.col("_cid")).alias("_ncid"))).alias("_m"),
            F.first(vec_col).alias(vec_col),
            F.first("_norm").alias("_norm"),
        )
        return best.select(id_col, vec_col, "_norm", (-F.col("_m._ncid")).alias("_cell"))
    w = Window.partitionBy(id_col).orderBy(F.desc("_ccos"), F.asc("_cid"))
    return (
        scored.withColumn("_crank", F.row_number().over(w))
        .filter(F.col("_crank") <= cell_rank)
        .select(id_col, vec_col, "_norm", F.col("_cid").alias("_cell"))
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_probes: int = 2,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: the coarse-quantizer ANN shape.

    Each corpus vector lives in exactly one cell (nearest centroid); each
    query probes its ``n_probes`` nearest cells and brute-forces only those
    cells' members. Candidate volume is ~ N * n_probes / K instead of N per
    query. Recall < 1 by construction (tested vs brute force).

    Scale path: ONE shuffle of the corpus on _cell (in a real deployment the
    assignment is precomputed/bucketed, so even that amortizes to zero);
    queries-with-probes stay small and broadcast. Centroids here are caller-
    supplied (deterministic — e.g. fixed ids or offline k-means), which keeps
    the operator oracle-checkable; plugging in trained centroids changes
    recall, not the plan."""
    cells = assign_ivf_cells(corpus, centroids, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cvec"),
        F.col("_norm").alias("_cnorm"),
        "_cell",
    )
    probes = assign_ivf_cells(
        queries, centroids, id_col, vec_col, cell_rank=n_probes
    ).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        F.col("_norm").alias("_qnorm"),
        "_cell",
    )
    scored = (
        cells.join(F.broadcast(probes), "_cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_prenormed(
                F.col("_qvec"), F.col("_cvec"), F.col("_qnorm"), F.col("_cnorm")
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def pairwise_cosine_arrow(
    pairs: DataFrame,
    a_vec: str,
    b_vec: str,
    a_norm: str,
    b_norm: str,
    min_cos: float,
    out_cols: tuple[str, str] = ("id_a", "id_b"),
    cos_col: str = "_cos",
) -> DataFrame:
    """Per-pair cosine with a >= ``min_cos`` filter, as ONE Arrow kernel.

    Bit-identical to ``cosine_prenormed`` + ``filter``: the fold runs
    dimension by dimension (acc = acc + a_d * b_d over float64 casts of the
    float32 elements), i.e. the exact left-to-right order and types of the
    Catalyst ``aggregate(zip_with(...))`` expression, but vectorized ACROSS
    the pair batch with NumPy. Catalyst interprets higher-order-function
    lambdas per element per pair (no codegen — and the unrolled 64-term
    codegen chain measured 4x slower still, see cosine_prenormed); on the
    multi-million-pair candidate joins this kernel measures ~40% faster
    end-to-end (embedding_near_dups sf0.1: 4.1s -> 2.5s, identical rows).

    ``pairs`` must carry exactly ``out_cols`` (long), the two vector
    columns (array<float>, all same length, no nulls — candidate joins
    guarantee this) and the two precomputed norms (double)."""
    import numpy as np
    import pyarrow as pa

    ia, ib = out_cols

    def kernel(batches):
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            na = batch.column(a_norm).to_numpy(zero_copy_only=False)
            nb = batch.column(b_norm).to_numpy(zero_copy_only=False)
            ca, cb = batch.column(a_vec), batch.column(b_vec)
            # list<float> columns are contiguous (values buffer + offsets);
            # every row has the same length, so a flatten + reshape is the
            # zero-copy way to the (n, dim) matrix
            va = ca.flatten().to_numpy(zero_copy_only=False).reshape(n, -1)
            vb = cb.flatten().to_numpy(zero_copy_only=False).reshape(n, -1)
            va = va.astype(np.float64)
            vb = vb.astype(np.float64)
            acc = np.zeros(n, dtype=np.float64)
            for d in range(va.shape[1]):
                acc = acc + va[:, d] * vb[:, d]
            cos = acc / (na * nb)
            m = cos >= min_cos
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(batch.column(ia).to_numpy(zero_copy_only=False)[m]),
                    pa.array(batch.column(ib).to_numpy(zero_copy_only=False)[m]),
                    pa.array(cos[m]),
                ],
                names=[ia, ib, cos_col],
            )

    return pairs.select(ia, ib, a_vec, b_vec, a_norm, b_norm).mapInArrow(
        kernel, f"{ia} long, {ib} long, {cos_col} double"
    )


def with_srp_buckets_arrow(
    df: DataFrame,
    vec_col: str,
    dim: int,
    n_planes: int,
    seed: int = 42,
    bucket_col: str = "_bkt",
    norm_col: str | None = None,
) -> DataFrame:
    """Append the SRP bucket id (and optionally the l2 norm) via ONE Arrow
    kernel instead of interpreted higher-order folds (guide §4.2).

    ``srp_bucket`` evaluates n_planes ``aggregate(zip_with(...))`` folds per
    row — Catalyst interprets HOF lambdas, measured ~1.4 ms/row at dim=64 —
    and branching query shapes re-evaluate the lineage per consumer because
    column pruning defeats exchange reuse. This kernel computes the same
    fold dimension-by-dimension in float64 vectorized ACROSS rows: per
    plane, acc = acc + v_d * p_d in the exact left-to-right order and
    float32->float64 casts of the JVM expression, so every sign decision
    (dot > 0) and every norm is bit-identical (same guarantee, same
    technique as pairwise_cosine_arrow)."""
    import numpy as np
    import pyarrow as pa

    planes = _srp_planes(dim, n_planes, seed)
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"{bucket_col} int"]
        + ([f"{norm_col} double"] if norm_col else [])
    )

    def kernel(batches):
        P = np.array(planes, dtype=np.float64)  # (n_planes, dim)
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            V = (
                batch.column(vec_col).flatten()
                .to_numpy(zero_copy_only=False)
                .astype(np.float64).reshape(n, -1)
            )
            bkt = np.zeros(n, dtype=np.int32)
            for i in range(len(planes)):
                acc = np.zeros(n, dtype=np.float64)
                for d in range(V.shape[1]):
                    acc = acc + V[:, d] * P[i, d]
                bkt |= (acc > 0).astype(np.int32) << i
            cols = list(batch.columns) + [pa.array(bkt, pa.int32())]
            if norm_col:
                nrm = np.zeros(n, dtype=np.float64)
                for d in range(V.shape[1]):
                    nrm = nrm + V[:, d] * V[:, d]
                cols.append(pa.array(np.sqrt(nrm), pa.float64()))
            names = list(batch.schema.names) + [bucket_col] + (
                [norm_col] if norm_col else []
            )
            yield pa.RecordBatch.from_arrays(cols, names=names)

    return df.mapInArrow(kernel, out_schema)


def cosine_pandas(a, b) -> float:
    """Scalar python mirror for tests."""
    num = sum(x * y for x, y in zip(a, b))
    da = math.sqrt(sum(x * x for x in a))
    db = math.sqrt(sum(y * y for y in b))
    return num / (da * db)


def _assign_ivf_cells_arrow(
    vectors: DataFrame,
    cent_rows,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Arrow gemm assignment (see :func:`assign_ivf_cells`): centroid matrix
    rides the closure (k x dim floats, metadata-scale); per batch ONE
    matrix multiply scores all pairs. Output schema matches the codegen
    path exactly: (id_col, vec_col, _norm, _cell)."""
    import numpy as np
    import pandas as pd

    cent_rows = sorted(cent_rows, key=lambda r: int(r[id_col]))
    cids = np.asarray([int(r[id_col]) for r in cent_rows], dtype=np.int64)
    C = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in cent_rows])
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)

    out_schema = f"{id_col} long, {vec_col} array<float>, _norm double, _cell long"

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            norms = np.linalg.norm(X, axis=1)
            Xn = X / np.maximum(norms, 1e-12)[:, None]
            # argmax keeps the FIRST maximum -> ties break to the lowest
            # centroid id (cids is sorted), matching the codegen
            # max(struct(cos, -cid)) tie rule
            best = (Xn @ Cn.T).argmax(axis=1)
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy(),
                vec_col: pdf[vec_col],
                "_norm": norms,
                "_cell": cids[best],
            })

    return vectors.select(id_col, vec_col).mapInPandas(assign, out_schema)


def _cell_means(cells, vec_col: str, dim: int) -> dict[int, list[float]]:
    """Element-wise mean vector per assigned cell, without a wide aggregate.

    Arrow-batched per-partition fold: each task yields at most one
    (partition, cell, count, sums) row per cell it saw; the tiny partial
    set (O(partitions * k) rows) collects to the driver and combines in
    sorted (cell, partition) order — float addition order is fixed, so the
    result is deterministic for a fixed input partitioning."""
    import numpy as np
    import pandas as pd

    def fold(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        acc: dict[int, list] = {}
        for pdf in batches:
            for cell, grp in pdf.groupby("_cell"):
                mat = np.stack(
                    [np.asarray(v, dtype=np.float64) for v in grp[vec_col]]
                )
                ent = acc.setdefault(int(cell), [0, np.zeros(dim)])
                ent[0] += mat.shape[0]
                ent[1] += mat.sum(axis=0)
        if acc:
            yield pd.DataFrame({
                "part": pid,
                "_cell": list(acc),
                "cnt": [v[0] for v in acc.values()],
                "sums": [v[1].tolist() for v in acc.values()],
            })

    parts = (
        cells.select("_cell", vec_col)
        .mapInPandas(fold, "part long, _cell int, cnt long, sums array<double>")
        .collect()
    )
    agg: dict[int, list] = {}
    for r in sorted(parts, key=lambda r: (r["_cell"], r["part"])):
        ent = agg.setdefault(int(r["_cell"]), [0, np.zeros(dim)])
        ent[0] += r["cnt"]
        ent[1] = ent[1] + np.asarray(r["sums"], dtype=np.float64)
    return {c: (s / n).tolist() for c, (n, s) in agg.items()}


def train_ivf_centroids(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 5,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic spherical k-means (Lloyd) for IVF coarse quantizers.

    Init = the k lowest-id vectors (deterministic, replay-stable — F8
    discipline). Each iteration: assign every vector to its max-cosine
    centroid (same broadcast + map-side argmax as assign_ivf_cells), then
    recompute each cell's centroid as the element-wise mean via an
    Arrow-batched mapInPandas partial-sum fold: each task emits at most k
    (cell, count, sum_vec) rows — O(partitions*k*dim) floats to the driver,
    NO shuffle and no per-dimension aggregate expressions (the round-3
    shape built `dim` avg(element_at(...)) aggregates, which bloats the
    Catalyst tree and agg buffer at embedding dims of 1024-4096; the fold
    is dimension-oblivious). Partials are combined driver-side in sorted
    (cell, partition) order so float addition order — and therefore the
    trained centroids — stay deterministic. Centroids come back to the
    driver between iterations — O(k*dim) floats, metadata-scale — so the
    plan never deepens with iters; empty cells keep their previous
    centroid.

    Offline use at 100 TB: train on a sample (vectors.sample(...)), then
    assign the full corpus once with assign_ivf_cells. Returns a DataFrame
    (id_col, vec_col) shaped like any other centroid set for ivf_topk.
    """
    spark = vectors.sparkSession
    current = [
        (int(r[id_col]), [float(x) for x in r[vec_col]])
        for r in vectors.select(id_col, vec_col)
        .orderBy(F.asc(id_col)).limit(k).collect()
    ]
    base = vectors.select(id_col, vec_col)
    for _ in range(iters):
        cent_df = spark.createDataFrame(
            [(i, vec) for i, (_, vec) in enumerate(current)],
            f"{id_col} long, {vec_col} array<float>",
        )
        cells = assign_ivf_cells(base, cent_df, id_col, vec_col)
        got = _cell_means(cells, vec_col, dim)
        current = [
            (cid, got.get(cid, vec)) for cid, (_, vec) in enumerate(current)
        ]
    return spark.createDataFrame(
        [(cid, vec) for cid, vec in current],
        f"{id_col} long, {vec_col} array<float>",
    )


# --------------------------------------------------------------------------
# Product quantization (PQ): compressed ANN for 100 TB embedding corpora.
# Splits each vector into m subvectors, k-means-quantizes each subspace to
# kc centroids, and stores only the m code bytes (dim * 4 bytes -> m bytes,
# 32x at dim=64/m=8). Queries score candidates with an ADC (asymmetric
# distance computation) lookup table — no corpus-side float arrays touched.


def _pq_slices(dim: int, m: int) -> list[tuple[int, int]]:
    """(1-based start, length) of each subspace slice; dim % m must be 0."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    d = dim // m
    return [(s * d + 1, d) for s in range(m)]


def _l2sq(a: Column, b: Column) -> Column:
    """Sequential-fold squared L2 distance, in double (ordered, so Spark
    and any mirror produce bit-identical sums)."""
    return F.aggregate(
        F.zip_with(
            a, b, lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double"))
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _codebook_lit(codebook: list[list[float]]) -> Column:
    return F.array(*[
        F.array(*[F.lit(float(x)) for x in c]) for c in codebook
    ])


def pq_encode(
    vectors: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    normalize: bool = True,
) -> DataFrame:
    """(id, codes array<int>) — per subspace, the index of the L2-nearest
    codebook centroid (ties -> lowest index, via array_position of the
    min). Pure codegen expressions over broadcast codebook literals: the
    corpus is scanned once, no shuffle, no Python. ``normalize`` encodes
    the L2-normalized vector so ADC dot products approximate cosine."""
    m = len(codebooks)
    d = len(codebooks[0][0]) * m
    if dim != d:
        raise ValueError(f"codebooks cover dim {d}, expected {dim}")
    kc = len(codebooks[0])
    if kc >= 32:
        # large codebooks: the transform-over-literal argmin exceeds the
        # codegen method limit and Catalyst falls back to INTERPRETED row
        # eval (~100x; jstack-verified on the 1M-vector bench at kc=64) —
        # use the Arrow gemm kernel instead. Small kc stays pure-SQL
        # (the oracle-twin-checkable driver shape).
        return _pq_codes_arrow(vectors, codebooks, id_col, vec_col, dim,
                               normalize)
    vec = F.col(vec_col)
    if normalize:
        norm = l2_norm(vec)
        vec = F.transform(vec, lambda x: x.cast("double") / norm)
    def _dist_fn(sub):
        return lambda c: _l2sq(sub, c)

    out_codes = []
    for s, (start, length) in enumerate(_pq_slices(dim, m)):
        sub = F.slice(vec, start, length)
        dists = F.transform(_codebook_lit(codebooks[s]), _dist_fn(sub))
        out_codes.append((F.array_position(dists, F.array_min(dists)) - 1).cast("int"))
    return vectors.select(F.col(id_col), F.array(*out_codes).alias("codes"))


def _pq_sub_codes(X, books_np):
    """per-subspace L2 argmin codes for an (n x dim) float64 matrix;
    ties to the lowest centroid index (np.argmin keeps the first min,
    matching array_position-of-array_min)."""
    import numpy as np

    m, _kc, sub_dim = books_np.shape
    out = np.empty((X.shape[0], m), dtype=np.int32)
    for s in range(m):
        sub = X[:, s * sub_dim:(s + 1) * sub_dim]
        # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; ||x||^2 constant per row
        cc = (books_np[s] * books_np[s]).sum(axis=1)
        out[:, s] = (cc[None, :] - 2.0 * (sub @ books_np[s].T)).argmin(axis=1)
    return out


def _pq_codes_arrow(
    vectors: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str,
    vec_col: str,
    dim: int,
    normalize: bool,
) -> DataFrame:
    import numpy as np
    import pandas as pd

    books_np = np.asarray(codebooks, dtype=np.float64)  # (m, kc, sub_dim)

    def encode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            if normalize:
                X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
            codes = _pq_sub_codes(X, books_np)
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy(),
                "codes": list(codes),
            })

    return vectors.select(id_col, vec_col).mapInPandas(
        encode, f"{id_col} long, codes array<int>"
    )


def train_pq_codebooks(
    vectors: DataFrame,
    m: int = 8,
    kc: int = 16,
    iters: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalize: bool = True,
) -> list[list[list[float]]]:
    """Deterministic per-subspace Lloyd k-means, ALL subspaces trained in
    the same pass: each iteration assigns every subvector to its nearest
    centroid with codegen argmin expressions (one corpus scan, no shuffle),
    then recomputes all m*kc centroids via ONE Arrow mapInPandas
    partial-sum fold keyed (subspace, cell) — O(partitions * m * kc *
    dim/m) floats to the driver, combined in sorted order so the trained
    codebooks are deterministic for a fixed input partitioning (same
    discipline as train_ivf_centroids). Init: subvector slices of the kc
    lowest-id vectors. At 100 TB: train on a sample, encode the full
    corpus once with pq_encode."""
    import numpy as np
    import pandas as pd

    sub_dim = dim // m
    seed_rows = (
        vectors.select(id_col, vec_col).orderBy(F.asc(id_col)).limit(kc).collect()
    )
    if len(seed_rows) < kc:
        raise ValueError(f"need >= {kc} vectors to seed {kc} centroids")

    def norm_vec(v):
        a = np.asarray(v, dtype=np.float64)
        n = float(np.sqrt((a * a).sum()))
        return (a / n if (normalize and n > 0) else a).tolist()

    seeds = [norm_vec(r[vec_col]) for r in seed_rows]
    books = [
        [seeds[j][s * sub_dim:(s + 1) * sub_dim] for j in range(kc)]
        for s in range(m)
    ]

    vec = F.col(vec_col)
    if normalize:
        nrm = l2_norm(vec)
        vec = F.transform(vec, lambda x: x.cast("double") / nrm)
    base = vectors.select(vec.alias("_v")).select(
        *[
            F.slice(F.col("_v"), start, length).alias(f"_sub_{s}")
            for s, (start, length) in enumerate(_pq_slices(dim, m))
        ]
    )

    def fold(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        acc: dict[tuple[int, int], list] = {}
        for pdf in batches:
            for s in range(m):
                codes = pdf[f"_code_{s}"].to_numpy()
                mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[f"_sub_{s}"]])
                for cell in np.unique(codes):
                    sel = mat[codes == cell]
                    ent = acc.setdefault((s, int(cell)), [0, np.zeros(sub_dim)])
                    ent[0] += sel.shape[0]
                    ent[1] += sel.sum(axis=0)
        if acc:
            yield pd.DataFrame({
                "part": pid,
                "sub": [k[0] for k in acc],
                "cell": [k[1] for k in acc],
                "cnt": [v[0] for v in acc.values()],
                "sums": [v[1].tolist() for v in acc.values()],
            })

    def fold_with_assign(books_now):
        # kc >= 32: the codegen argmin falls out of whole-stage codegen
        # into interpreted eval (see pq_encode) — assign in the SAME numpy
        # pass that folds the sums, one Arrow scan, zero Catalyst argmin
        books_np = np.asarray(books_now, dtype=np.float64)

        def run(batches):
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            acc: dict[tuple[int, int], list] = {}
            for pdf in batches:
                if not len(pdf):
                    continue
                mats = [
                    np.stack([np.asarray(v, dtype=np.float64) for v in pdf[f"_sub_{s}"]])
                    for s in range(m)
                ]
                X = np.concatenate(mats, axis=1)
                codes = _pq_sub_codes(X, books_np)
                for s in range(m):
                    for cell in np.unique(codes[:, s]):
                        sel = mats[s][codes[:, s] == cell]
                        ent = acc.setdefault((s, int(cell)), [0, np.zeros(sub_dim)])
                        ent[0] += sel.shape[0]
                        ent[1] += sel.sum(axis=0)
            if acc:
                yield pd.DataFrame({
                    "part": pid,
                    "sub": [k[0] for k in acc],
                    "cell": [k[1] for k in acc],
                    "cnt": [v[0] for v in acc.values()],
                    "sums": [v[1].tolist() for v in acc.values()],
                })

        return run

    for _ in range(iters):
        if kc >= 32:
            parts = base.mapInPandas(
                fold_with_assign(books),
                "part long, sub int, cell int, cnt long, sums array<double>",
            ).collect()
        else:
            def _dist_fn(col_name):
                return lambda c: _l2sq(F.col(col_name), c)

            assigned = base
            for s in range(m):
                dists = F.transform(_codebook_lit(books[s]), _dist_fn(f"_sub_{s}"))
                assigned = assigned.withColumn(
                    f"_code_{s}",
                    (F.array_position(dists, F.array_min(dists)) - 1).cast("int"),
                )
            parts = assigned.mapInPandas(
                fold, "part long, sub int, cell int, cnt long, sums array<double>"
            ).collect()
        agg: dict[tuple[int, int], list] = {}
        for r in sorted(parts, key=lambda r: (r["sub"], r["cell"], r["part"])):
            ent = agg.setdefault((int(r["sub"]), int(r["cell"])), [0, np.zeros(sub_dim)])
            ent[0] += r["cnt"]
            ent[1] = ent[1] + np.asarray(r["sums"], dtype=np.float64)
        books = [
            [
                (agg[(s, j)][1] / agg[(s, j)][0]).tolist()
                if (s, j) in agg else books[s][j]
                for j in range(kc)
            ]
            for s in range(m)
        ]
    return books


def pq_topk(
    codes: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    refine: int = 0,
    corpus: DataFrame | None = None,
) -> DataFrame:
    """ADC top-k: per query, score every encoded vector as
    sum_s LUT[s][code_s] where LUT[s][j] = dot(query_sub_s, codebook[s][j])
    — the dot-product ADC table, so the score approximates
    cosine(query, vector) when codes were built over normalized vectors.

    The LUT is computed engine-side per query row (queries are tiny and
    broadcast); the corpus side touches ONLY the m-byte codes — at 100 TB
    this is the point: the scan reads a 3-4 order-of-magnitude smaller
    column, and the only shuffle is the per-query top-k window over
    candidate rows. With ``refine`` > 0 the top k*refine ADC candidates
    join back to ``corpus`` for exact-cosine re-ranking (recall recovery
    at O(k*refine) exact distances per query)."""
    m = len(codebooks)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        l2_norm(F.col(vec_col)).alias("_qn"),
    )
    qnormed = F.transform(F.col("_qvec"), lambda x: x.cast("double") / F.col("_qn"))
    def _lut_fn(qsub):
        return lambda c: dot(qsub, c)

    luts = []
    for s, (start, length) in enumerate(_pq_slices(dim, m)):
        luts.append(
            F.transform(_codebook_lit(codebooks[s]), _lut_fn(F.slice(qnormed, start, length)))
        )
    q = q.select("query_id", F.array(*luts).alias("_lut"))

    scored = (
        codes.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.aggregate(
                F.zip_with(
                    F.col("codes"),
                    F.col("_lut"),
                    lambda c, l: F.element_at(l, c + 1),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("adc_score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("adc_score"), F.asc("neighbor_id")
    )
    if refine <= 0:
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )
    if corpus is None:
        raise ValueError("refine > 0 requires the corpus vectors")
    cand = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k * refine)
        .select("query_id", "neighbor_id", "adc_score")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cvec"),
        l2_norm(F.col(vec_col)).alias("_cn"),
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        l2_norm(F.col(vec_col)).alias("_qn2"),
    )
    exact = (
        cand.join(c, "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id", "neighbor_id", "adc_score",
            cosine_prenormed(
                F.col("_qv"), F.col("_cvec"), F.col("_qn2"), F.col("_cn")
            ).alias("cos_sim"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
    )
