"""Graph operators for duplicate clustering.

A pair generator (``operators.dedup``) emits near-duplicate PAIRS; a
training-data pipeline needs CLUSTERS (keep one representative per group of
mutually-similar docs). Pairs → clusters is connected components.

The reference has no graph surface at all (its only structure is the PK-tree,
``/root/reference/include/pktree.hpp``); this is a north-star extension for
the 100 TB dedup pipeline.

Scale design: iterative min-label propagation — each round is one
shuffle-join (labels onto edge endpoints) plus one map-side-combined
``groupBy(node).min``. Rounds needed = graph diameter; near-dup clusters are
near-cliques (diameter 2-3), so convergence is fast in practice and bounded
by ``max_iter``. Lineage is truncated every round with ``localCheckpoint``
(eager) so the plan does not grow unboundedly — without it, round k replays
rounds 1..k-1 and the job is quadratic. The convergence test (did any label
change?) piggybacks on the same job that materializes the checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    *,
    src: str = "d1",
    dst: str = "d2",
    max_iter: int = 25,
) -> DataFrame:
    """(node, cluster) for every node appearing in ``pairs``; ``cluster`` is
    the minimum node id in the node's connected component.

    Raises ``RuntimeError`` if labels have not converged after ``max_iter``
    rounds (diameter > max_iter — not a near-dup-shaped graph).
    """
    # Pre-partition the (checkpointed-once) edge table on the lookup key so
    # every round's labels join is co-partitioned against it — checkpoint
    # preserves outputPartitioning, so rounds re-sort but never re-exchange
    # the edges.
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .repartition("b")
        .localCheckpoint(eager=True)
    )
    # label(v) = min(v, min neighbor) — already one propagation step.
    labels = edges.groupBy("a").agg(
        F.least(F.col("a"), F.min("b")).alias("lbl")
    ).select(F.col("a").alias("node"), "lbl")

    for _ in range(max_iter):
        # min label over each node's neighborhood (one shuffle join + agg)
        nbr = (
            edges.join(labels, edges["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        # Lazy checkpoint: the convergence aggregate below is the action
        # that materializes it — ONE job per round carries both the label
        # update and the did-anything-change flag (no separate count job).
        nxt = (
            labels.join(nbr, labels["node"] == nbr["a"], "left")
            .select(
                "node",
                F.least("lbl", F.coalesce("nbr_lbl", "lbl")).alias("lbl"),
                (F.col("lbl") != F.least("lbl", F.coalesce("nbr_lbl", "lbl"))).alias(
                    "_changed"
                ),
            )
            .localCheckpoint(eager=False)
        )
        changed = nxt.agg(F.max(F.col("_changed").cast("int"))).first()[0]
        labels = nxt.drop("_changed")
        if not changed:
            return labels.select("node", F.col("lbl").alias("cluster"))
    raise RuntimeError(f"connected_components: no convergence in {max_iter} rounds")


def dup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    src: str = "d1",
    dst: str = "d2",
) -> DataFrame:
    """Assign every document a ``cluster_id``: the component minimum for docs
    that appear in a duplicate pair, the doc's own id otherwise. The keep-rule
    is then ``cluster_id == doc_id``."""
    comp = connected_components(pairs, src=src, dst=dst)
    return docs.join(
        comp, docs[id_col] == comp["node"], "left"
    ).select(
        docs[id_col],
        F.coalesce("cluster", docs[id_col]).alias("cluster_id"),
    )
