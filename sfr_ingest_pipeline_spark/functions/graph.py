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
localCheckpoints per iteration so the lineage stays flat. For adversarial
long-chain graphs at 10^12 edges the classic fix is large-star/small-star
(Kiveris et al., "Connected Components in MapReduce and Beyond") which
halves chain length per round — the propagation loop here is the right
shape for dedup graphs and keeps the plan to one join per round.

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
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; component =
    the smallest node id reachable through the undirected pair graph.

    Raises if the fixpoint is not reached within ``max_iter`` rounds (a
    dedup-pair graph that deep signals a pathological input, not a bigger
    loop budget).
    """
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
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
