"""Connected components over a pair-edge list — the clustering step that
turns near-dup PAIRS into dedup GROUPS (keep one canonical doc per
component).

Algorithm: iterative min-label propagation on the undirected edge list —
each node adopts the smallest label among itself and its neighbors until
fixpoint. Per iteration: one join edges⨝labels + one min-aggregate; the
iteration count is O(diameter) (near-dup graphs are shallow — dup
clusters are cliques-ish, so 2-4 rounds typically converge). The driver
loop only checks a convergence COUNT per round; all data stays
distributed. For graphs with giant components, switch to the
large-star/small-star algorithm (Kiveris et al.) — same building blocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 10,
) -> DataFrame:
    """(node, component) for every node in the edge list; component =
    smallest node id reachable. Converges in ≤ diameter iterations
    (bounded by ``max_iter``; raises if not converged — at scale, raise
    the bound or move to star-contraction rather than silently stopping).
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        # materialize ONCE — without this, every iteration's join re-executes
        # the full upstream lineage (e.g. the near-dup pair query) per round
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
    )
    for _ in range(max_iter):
        # each node's candidate label: min over its own and neighbors'
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("comp").alias("ncomp"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce("ncomp", F.col("comp"))).alias("comp"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)  # cut lineage per round
        changed = (
            labels.alias("o")
            .join(new_labels.alias("n"), "node")
            .filter(F.col("o.comp") != F.col("n.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(f"connected_components did not converge in {max_iter} iterations")


def dedup_clusters(
    pairs: DataFrame,
    doc_a: str = "doc_a",
    doc_b: str = "doc_b",
) -> DataFrame:
    """Near-dup pairs → (doc_id, cluster_id, is_canonical): cluster_id is
    the smallest doc_id in the component; that doc is the canonical
    survivor, the rest are drop candidates."""
    comp = connected_components(pairs, doc_a, doc_b)
    return comp.select(
        F.col("node").alias("doc_id"),
        F.col("comp").alias("cluster_id"),
        F.when(F.col("node") == F.col("comp"), 1).otherwise(0).alias("is_canonical"),
    )
