"""Link-graph signals: degrees and PageRank for web-corpus curation.

No reference counterpart (spec addition): production web pipelines use
link-graph centrality (PageRank over the host/URL graph) as a document
quality prior alongside classifier gates — this module computes it
Spark-first over an edge list.

Semantics (Page et al. 1998, public): iterate
``r'(v) = (1-d)/N + d * (Σ_{u→v} r(u)/outdeg(u) + dangling_mass/N)``
for a FIXED number of iterations (deterministic — no tolerance-based
stopping, so the result is engine-reproducible and the DuckDB oracle can
unroll the same iterations). Dangling nodes (no out-edges) redistribute
their mass uniformly, the standard correction that keeps ranks summing
to 1.

Scale shape per iteration: one equi-join of the rank frame to the edge
list on the source key and one groupBy on the destination — both hash
exchanges on graph keys; the dangling mass is a 1-row aggregate
broadcast back (never a driver round-trip). The edge list with
out-degrees is computed ONCE and cached; rank lineage is truncated with
``localCheckpoint`` every ``checkpoint_every`` iterations so the plan
does not grow with the iteration count (the connected_components
pattern). Duplicate edges count with multiplicity (parallel links weigh
more); pre-``distinct`` the edge list to change that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degrees(edges: DataFrame, src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """Per-node (node, out_degree, in_degree) over an edge list — one
    source-tagged union aggregation (the DSIR histogram shape), no join."""
    tagged = edges.select(
        F.col(src_col).alias("node"), F.lit(1).alias("__o"), F.lit(0).alias("__i")
    ).unionAll(
        edges.select(F.col(dst_col).alias("node"), F.lit(0), F.lit(1))
    )
    return tagged.groupBy("node").agg(
        F.sum("__o").alias("out_degree"), F.sum("__i").alias("in_degree")
    )


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    iterations: int = 10,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Fixed-iteration PageRank over an edge list: ``(node, rank)``.

    Ranks sum to 1 over the node set (sources ∪ destinations). Isolated
    semantics: a node appearing only as a destination is dangling (its
    mass redistributes uniformly). Deterministic up to floating-point
    fold order — round before hashing across engines.
    """
    if not 0.0 < damping < 1.0:
        raise ValueError("pagerank: damping must be in (0, 1)")
    if iterations < 0:
        raise ValueError("pagerank: iterations must be >= 0")
    if checkpoint_every < 1:
        raise ValueError(
            "pagerank: checkpoint_every must be >= 1 (use a value larger "
            "than iterations to never checkpoint)"
        )
    e = edges.select(
        F.col(src_col).alias("__s"), F.col(dst_col).alias("__d")
    )
    nodes = (
        e.select(F.col("__s").alias("node"))
        .unionAll(e.select(F.col("__d").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy("__s").agg(F.count(F.lit(1)).alias("__od"))
    # edges annotated with the source out-degree, computed once and reused
    # every iteration
    ew = e.join(outdeg, "__s").localCheckpoint(eager=False)
    nodes = nodes.localCheckpoint(eager=False)
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.select("node", F.lit(0.0).alias("rank"))

    d = float(damping)
    ranks = nodes.select("node", (F.lit(1.0) / F.lit(float(n_nodes))).alias("rank"))
    for i in range(iterations):
        contrib = (
            ew.join(ranks.withColumnRenamed("node", "__s"), "__s")
            .select("__d", (F.col("rank") / F.col("__od")).alias("__c"))
            .groupBy("__d")
            .agg(F.sum("__c").alias("__in"))
        )
        # dangling mass: total rank held by nodes with no out-edges —
        # a 1-row aggregate cross-joined back (broadcast), not collected
        dangling = (
            ranks.join(outdeg.withColumnRenamed("__s", "node"), "node", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm"))
        )
        ranks = (
            nodes.join(contrib.withColumnRenamed("__d", "node"), "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1.0 - d) / n_nodes)
                    + F.lit(d)
                    * (
                        F.coalesce(F.col("__in"), F.lit(0.0))
                        + F.col("__dm") / F.lit(float(n_nodes))
                    )
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            # truncate lineage so the plan stays O(checkpoint_every) deep
            ranks = ranks.localCheckpoint(eager=False)
    return ranks
