"""Distributed connected components over an edge list.

Reference analog: none — the reference's fold algebra (Core.hs, Simple.hs)
has no graph operators.  This module is part of the north-star
LLM-data-pipeline surface: cluster-based near-dup deduplication.  LSH /
SimHash candidate generation (operators/dedup.py, operators/similarity.py)
emits *pairs*; real corpus dedup needs the transitive closure of those
pairs — A~B and B~C must collapse into ONE cluster even when A~C was never
surfaced — so the canonical-document choice is made per component, not per
pair.  That closure is exactly connected components.

Algorithm: hash-to-min label propagation (Rastogi et al., "Finding
Connected Components in Map-Reduce in Logarithmic Rounds", ICDE 2013 —
public literature).  Every node starts labeled with its own id; each round
every node takes the min label over itself and its neighbors; at fixpoint
the label is the component's min node id.  One round = one shuffle join
(labels into edges) + one min-aggregation — both map-side-combinable, no
driver-side data beyond a per-round convergence count.  Rounds needed =
graph diameter, which for near-dup clusters is small (clusters are
near-cliques: most members pair directly with most others), so 3-5 rounds
closes real corpora.  ``max_iter`` guards pathological chains; the
alternating small-star/large-star variant (same paper) is the documented
escalation for high-diameter graphs, not needed for the dedup topology.

100 TB shape: labels and edges shuffle on node id each round — linear in
|E|, never quadratic; per-round state is persisted and the previous round
unpersisted, with ``localCheckpoint`` lineage truncation every
``checkpoint_every`` rounds so the plan does not grow with the iteration
count.  The convergence check collects ONE count per round (bounded driver
traffic, inherent to an iterative fixpoint).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def symmetric_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected view of an edge list: both directions, deduplicated,
    self-loops dropped (they never change a component)."""
    fwd = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    rev = edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    return fwd.union(rev).where(F.col("u") != F.col("v")).distinct()


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Connected components of the undirected graph given by ``edges``.

    Returns one row per node appearing in ``edges``: ``(node, component)``
    where ``component`` is the minimum node id in the node's component —
    a deterministic canonical representative (the same convention as
    ``exact_dedup_keep_first``'s min-id winner).

    Iterative hash-to-min (module docstring); raises ``RuntimeError`` if
    the fixpoint is not reached within ``max_iter`` rounds rather than
    returning silently-wrong partial labels.
    """
    sym = symmetric_edges(edges, src, dst).persist()
    # seed: each node's label = min(self, direct neighbors) — this folds
    # the first propagation round into the seed aggregation for free
    labels = (
        sym.select("u", F.col("v").alias("label"))
        .union(sym.select("u", F.col("u").alias("label")))
        .groupBy("u").agg(F.min("label").alias("label"))
        .persist()
    )
    def label_sum(lb: DataFrame):
        # labels are per-node monotone non-increasing, so the exact total
        # (decimal(38) — no overflow at any node count) is a fixpoint
        # detector: sum unchanged ⇔ no label changed.  One tiny aggregate
        # per round instead of a new-vs-old join.
        return lb.agg(F.sum(F.col("label").cast("decimal(38,0)"))).first()[0]

    prev_sum = label_sum(labels)
    try:
        for it in range(max_iter):
            # propagate: every neighbor of u may inherit u's label
            prop = (
                sym.join(labels, "u")
                .select(F.col("v").alias("u"), "label")
                .union(labels)
                .groupBy("u").agg(F.min("label").alias("label"))
            )
            if (it + 1) % checkpoint_every == 0:
                # truncate lineage so plan depth stays O(checkpoint_every)
                prop = prop.localCheckpoint(eager=False)
            prop = prop.persist()
            cur_sum = label_sum(prop)
            labels.unpersist()
            labels = prop
            if cur_sum == prev_sum:
                return labels.select(F.col("u").alias("node"), "label") \
                    .withColumnRenamed("label", "component")
            prev_sum = cur_sum
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds — "
            "graph diameter exceeds max_iter; raise max_iter or use the "
            "small-star/large-star escalation (module docstring)"
        )
    finally:
        sym.unpersist()


def components_of_pairs(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b", **kw
) -> DataFrame:
    """Components of a near-dup PAIR stream (the dedup.py / similarity.py
    output shape): ``(node, component)``, component = min id (canonical
    doc).  Thin naming adapter over :func:`connected_components`."""
    return connected_components(pairs, id_a, id_b, **kw)


def dedup_by_components(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Cluster-based near-dup dedup: keep ONE canonical row (min id) per
    connected component of the pair graph, plus every row in no pair.

    The standard corpus-dedup topology: candidate pairs (MinHash / SimHash
    / embedding LSH) → transitive closure → per-cluster canonical.  A
    pairwise keep-min rule is NOT equivalent: with A~B and B~C only, B and
    C would both survive pairwise rules even though they share a cluster
    through B.  Anti-join + broadcastable component table (components are
    at most |nodes-in-pairs| rows, typically a tiny fraction of the
    corpus)."""
    comp = components_of_pairs(pairs, id_a, id_b)
    losers = comp.where(F.col("node") != F.col("component")) \
        .select(F.col("node").alias(id_col))
    return df.join(losers, id_col, "left_anti")
