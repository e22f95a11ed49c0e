"""Connected components over near-duplicate pair graphs — the cluster
step of a dedup pipeline (pairs from LSH / SimHash / fuzzy matching →
groups → one canonical document per group).

This is the engine's iterative-algorithm surface: component labels cannot
be expressed in one SQL/window pass, so the operator runs min-label
propagation as a driver-controlled loop of DataFrame joins:

    label(v) <- min(label(v), min over neighbours u of label(u))

until a fixpoint (no label changed). Each iteration is ONE shuffle (join
edges to labels + min-aggregate); convergence takes O(graph diameter)
iterations, and near-dup clusters are shallow by construction (every
member pairs with the canonical member through few hops). The loop
localCheckpoints per iteration so the lineage stays flat.

For adversarial long-diameter graphs, ``algorithm="alternating"`` runs
the large-star/small-star algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond", 2014): each round rewires every
node's strictly-larger neighbors (large-star) then its smaller-or-equal
neighbors (small-star) to the minimum of its closed neighborhood,
contracting path length geometrically — O(log^2 n) rounds on a chain
where label propagation needs O(n). Convergence is detected by an
edge-set fingerprint (count + sum of per-edge xxhash64) riding the
round's checkpoint as an Observation, so each half-round is still one
job. Default stays label propagation: dedup graphs are shallow, and the
per-round constant is smaller.

The DuckDB twin (queries.py ``part_name_clusters``) re-derives components
with a recursive CTE (transitive closure → min reachable id), a completely
different formulation — the hash match proves the fixpoint exact.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iter: int = 25,
    component_col: str = "component",
    algorithm: str = "label-propagation",
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; component =
    the smallest node id reachable through the undirected pair graph.

    ``algorithm``: "label-propagation" (default — O(diameter) rounds, the
    right constant for shallow dedup graphs) or "alternating" (large-star /
    small-star, O(log^2 n) rounds — for adversarial long-diameter graphs).

    Raises if the fixpoint is not reached within ``max_iter`` rounds (a
    dedup-pair graph that deep signals a pathological input, not a bigger
    loop budget).
    """
    if algorithm == "alternating":
        return _alternating_components(edges, src, dst, max_iter, component_col)
    if algorithm != "label-propagation":
        raise ValueError(
            f"unknown algorithm {algorithm!r}: label-propagation|alternating"
        )
    # materialize the edge lineage ONCE before undirecting: the two union
    # sides are different projections of the same (often expensive — e.g. a
    # fuzzy levenshtein join) pair computation, and Spark evaluated it per
    # side (round-6: 2x the pair-generation CPU). The checkpointed edge
    # list is O(pairs) — metadata-scale next to the computation it caps.
    e0 = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).localCheckpoint(eager=True)
    und = (
        e0.unionByName(e0.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
    )
    und = und.localCheckpoint(eager=True)
    labels = (
        und.groupBy("a")
        .agg(F.min("b").alias("_mb"))
        .select(
            F.col("a").alias("node"),
            F.least(F.col("a"), F.col("_mb")).alias("lbl"),
        )
    )
    # least(min(b), a): seed each node with the smallest of itself and its
    # direct neighbours — saves one propagation round for free
    labels = labels.localCheckpoint(eager=True)
    for _ in range(max_iter):
        neigh = (
            und.join(labels, und.b == labels.node)
            .groupBy("a").agg(F.min("lbl").alias("nlbl"))
            .select(F.col("a").alias("node"), "nlbl")
        )
        new_labels = (
            labels.join(neigh, "node", "left")
            .select(
                "node",
                F.least(F.col("lbl"), F.col("nlbl")).alias("lbl"),
                (F.col("nlbl") < F.col("lbl")).alias("_chg"),
            )
        )
        # convergence check rides the checkpoint materialization as an
        # Observation (CollectMetrics) — ONE job per round, not a second
        # driver-blocking count() over the checkpointed labels
        obs = Observation(f"cc_changed_{uuid.uuid4().hex[:6]}")
        new_labels = new_labels.observe(
            obs, F.sum(F.col("_chg").cast("long")).alias("changed")
        ).localCheckpoint(eager=True)
        changed = int(obs.get["changed"] or 0)
        labels = new_labels.drop("_chg")
        if changed == 0:
            return labels.select("node", F.col("lbl").alias(component_col))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(pathologically deep pair graph)"
    )


def _fingerprinted_checkpoint(df: DataFrame, a: str = "a", b: str = "b"):
    """Eagerly checkpoint an edge set and return (df, (count, hash_sum)) —
    the convergence fingerprint rides the same materialization as an
    Observation, so fixpoint detection costs no extra job. bit_xor of
    per-edge xxhash64 is overflow-free under ANSI mode and
    order-independent over the distinct edge set; a 64-bit collision
    between consecutive DIFFERENT edge sets is ~2^-64-improbable, and the
    final star extraction would still be a correct labelling of whatever
    fixpoint the loop settled on."""
    obs = Observation(f"cc_fp_{uuid.uuid4().hex[:6]}")
    out = df.observe(
        obs,
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64(F.col(a), F.col(b))).alias("h"),
    ).localCheckpoint(eager=True)
    m = obs.get
    return out, (int(m["n"] or 0), int(m["h"] or 0))


def _alternating_components(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iter: int,
    component_col: str,
) -> DataFrame:
    """Large-star/small-star (Kiveris et al. 2014, Algorithm 3).

    Edge set is kept as unordered pairs; each round:

      large-star(u): every STRICTLY LARGER neighbor of u rewires to
                     m(u) = min(closed neighborhood of u);
      small-star(u): u and every smaller-or-equal neighbor rewire to m(u)
                     (computed over the <=-side neighborhood).

    Both halves preserve connectivity and only ever decrease the potential
    (sum of path lengths to minima), so the edge set reaches a star forest
    — every edge (v, root) — in O(log^2 n) rounds; fingerprint equality of
    two consecutive rounds detects it."""
    # one materialization of the (possibly expensive) edge lineage; the
    # nodes union and the working edge set both derive from it (round-6 —
    # the previous shape evaluated `edges` three times)
    e0 = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).localCheckpoint(eager=True)
    nodes = (
        e0.select(F.col("a").alias("node"))
        .unionByName(e0.select(F.col("b").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    e = e0.filter(F.col("a") != F.col("b")).distinct()
    e, fp = _fingerprinted_checkpoint(e)

    def _sym(df: DataFrame) -> DataFrame:
        return df.unionByName(
            df.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )

    def _large_star(df: DataFrame) -> DataFrame:
        nbr = _sym(df)
        m = nbr.groupBy("a").agg(F.min("b").alias("_mb"))
        m = m.select("a", F.least(F.col("a"), F.col("_mb")).alias("_m"))
        return (
            nbr.join(m, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("_m").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )

    def _small_star(df: DataFrame) -> DataFrame:
        # orient each edge larger -> smaller, group on the larger end
        oriented = df.select(
            F.greatest(F.col("a"), F.col("b")).alias("a"),
            F.least(F.col("a"), F.col("b")).alias("b"),
        )
        m = oriented.groupBy("a").agg(F.min("b").alias("_m"))
        rewired = (
            oriented.join(m, "a")
            .select(F.col("b").alias("a"), F.col("_m").alias("b"))
        )
        centers = m.select(F.col("a"), F.col("_m").alias("b"))
        return (
            rewired.unionByName(centers)
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )

    for _ in range(max_iter):
        e, _ = _fingerprinted_checkpoint(_large_star(e))
        e, fp_new = _fingerprinted_checkpoint(_small_star(e))
        if fp_new == fp:
            break
        fp = fp_new
    else:
        raise RuntimeError(
            f"alternating connected components did not converge in "
            f"{max_iter} rounds"
        )
    # fixpoint is a star forest: every remaining edge is (member, root);
    # nodes with no edge (isolated or themselves the root) label themselves
    labels = e.select(
        F.greatest(F.col("a"), F.col("b")).alias("node"),
        F.least(F.col("a"), F.col("b")).alias("lbl"),
    ).groupBy("node").agg(F.min("lbl").alias("lbl"))
    return (
        nodes.join(labels, "node", "left")
        .select(
            "node",
            F.coalesce(F.col("lbl"), F.col("node")).alias(component_col),
        )
    )
