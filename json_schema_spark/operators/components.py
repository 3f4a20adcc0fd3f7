"""Connected components over near-duplicate pair graphs, and the
keep-one-canonical-document-per-cluster dedup built on top.

The reference validates one document at a time and has no graph
operators; this is part of the LLM-training-data-pipeline extension
(north_star). A real dedup pipeline cannot stop at PAIRS: if A~B and
B~C, keeping "one of each pair" independently can drop both A and C or
keep near-identical A and C — the unit of deduplication is the
transitive CLUSTER. Pairs come from any of the family in
``operators/dedup.py`` (MinHash-LSH, SimHash, embedding-LSH, exact
n-gram Jaccard); this module turns them into ``(id, component)``
labels where ``component`` is the smallest id in the cluster.

Algorithm: alternating **large-star / small-star** (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) expressed as
pure DataFrame rounds:

* large-star: every node links each STRICTLY LARGER neighbor to the
  minimum of its neighborhood (including itself);
* small-star: edges directed larger->smaller; every node links its
  smaller-or-equal neighbors (and itself) to the neighborhood minimum.

Both steps preserve connectivity, strictly shrink non-star structures,
and converge to per-component stars in O(log n) rounds — the 100 TB
story: each round is one groupBy + one join over the EDGE set only
(never the documents), so a 10^12-doc corpus with a 0.1% dup rate
iterates over ~10^9 slim (long, long) rows, and round count grows with
the log of the largest cluster, not its diameter (a naive min-label
propagation would need diameter rounds — a 1M-doc template chain would
take 1M rounds; this takes ~20).

Every round ends in an EAGER ``localCheckpoint`` — ``persist`` alone
is not enough, because the LOGICAL plan still nests (~6x branching per
round: the symmetrization union, the min join, both star steps), and
Catalyst re-analyzes the whole tree each round even when cached data
short-circuits execution; by round 12 the plan string crosses 2 GB
(reproduced). Checkpointing truncates lineage so each round's plan is
O(1). Convergence = symmetric difference of consecutive edge sets
empty (two cheap scans over checkpointed rows per round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["connected_components", "dedup_keep_canonical"]


def _large_star(edges: DataFrame) -> DataFrame:
    """One large-star round: for each node u, connect every strictly
    larger neighbor v to min(N(u) ∪ {u})."""
    sym = edges.union(edges.select(F.col("dst").alias("src"),
                                   F.col("src").alias("dst")))
    mins = (
        sym.groupBy("src")
        .agg(F.min("dst").alias("mn"))
        .select("src", F.least(F.col("mn"), F.col("src")).alias("m"))
    )
    return (
        sym.join(mins, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round: direct edges larger->smaller, then connect
    each node's smaller neighbors (and itself) to the minimum."""
    directed = edges.select(
        F.greatest("src", "dst").alias("src"),
        F.least("src", "dst").alias("dst"),
    )
    mins = directed.groupBy("src").agg(F.min("dst").alias("m"))
    relinked = (
        directed.join(mins, "src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .union(mins.select("src", F.col("m").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    return relinked


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_rounds: int = 50,
) -> DataFrame:
    """``(id, component)`` for every id appearing in ``pairs``.

    ``component`` is the minimum id of the connected component, so the
    labels are deterministic and join-stable across runs and partition
    layouts. Ids must be orderable (the pair generators emit longs).
    Isolated documents (no pair) are simply absent — they are their own
    component; :func:`dedup_keep_canonical` accounts for them.
    """
    edges = (
        pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    rounds = 0
    converged = False
    while rounds < max_rounds:
        # eager localCheckpoint: materializes AND truncates lineage —
        # persist() alone leaves the logical plan nesting exponentially
        # (2 GB plan strings by round ~12, reproduced). On a cluster
        # with an unreliable-executor concern, swap for
        # sparkContext.setCheckpointDir + .checkpoint().
        nxt = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        # convergence = the edge relation is unchanged (stars are a
        # fixpoint of both steps); symmetric difference over the slim
        # checkpointed (src, dst) sets — two cheap scans
        changed = (nxt.exceptAll(edges).limit(1).count()
                   + edges.exceptAll(nxt).limit(1).count())
        edges = nxt
        rounds += 1
        if changed == 0:
            converged = True
            break
    if not converged:
        # exhausting the round budget mid-contraction would silently
        # return labels that are not yet component minima — surface it
        # instead of handing back wrong answers (rounds needed grow with
        # log2 of the largest cluster; 50 covers ~2^50 members)
        import warnings

        warnings.warn(
            f"connected_components did not converge after {max_rounds} rounds; "
            "labels may not be component minima — raise max_rounds",
            RuntimeWarning,
            stacklevel=2,
        )
    # stars: src > dst == component min; members are all srcs plus the
    # roots themselves
    labels = edges.select(F.col("src").alias("id"), F.col("dst").alias("component"))
    roots = edges.select(F.col("dst").alias("id"),
                         F.col("dst").alias("component")).distinct()
    out = labels.union(roots).distinct()
    return out


def dedup_keep_canonical(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Keep exactly one document per near-duplicate CLUSTER (the one
    with the smallest id — deterministic), plus every document that is
    in no cluster. The transitive-closure analogue of
    :func:`dedup.dedup_keep_first`, which handles exact duplicates."""
    comp = connected_components(pairs, src=src, dst=dst)
    drop = comp.where(F.col("id") != F.col("component")).select("id")
    return df.join(drop, df[id_col] == drop["id"], "left_anti")
