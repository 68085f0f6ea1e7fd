"""Iterative graph analytics as DataFrame loops.

The engine already runs one iterative algorithm — ``dedup.dedup_clusters``
(min-label propagation for connected components).  This module adds the
other canonical one, PageRank, as the template for iterative dataflow done
Spark-first: a driver-side Python loop over pure DataFrame joins/aggs, NO
RDDs, deterministic floats via ``sqlgen.fsum`` so a DuckDB oracle can
replay the unrolled recursion bitwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import sqlgen


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
    checkpoint_every: int | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank over an edge list; returns ``(node, r)``
    with ranks in the mean-1 formulation (``r`` averages 1.0; divide by
    node count for a probability).  Simplified recurrence (no dangling-
    mass redistribution — give sinks a self-loop or symmetric edges if
    every node must keep out-degree > 0):

        r_{k+1}(n) = (1 - d) + d * sum_{m -> n} r_k(m) / out_degree(m)

    Scale: each iteration is one src-keyed join (edges x ranks x degrees)
    and one dst-keyed aggregation — two shuffles, both partial-aggregable;
    the rank table is |nodes| rows, tiny next to |edges|, so at 100 TB the
    iteration cost is dominated by re-shuffling edges on ``src``.  AQE
    reuses the exchange within an iteration; set ``checkpoint_every`` to
    truncate the growing lineage on long runs (localCheckpoint — no
    checkpoint dir needed on a driver-owned session).

    Determinism: the per-node contribution sum uses ``sqlgen.fsum``
    (fixed-point int64 accumulation), so ranks are bit-identical across
    partitionings, engines, and reruns — the mean-1 scaling keeps values
    O(1) where fsum's 1e-6 quantization is ~1e-6 relative error.
    """
    d_lit = f"cast('{damping!r}' as double)"
    omd_lit = f"cast('{1.0 - damping!r}' as double)"

    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("od"))
    ranks = nodes.selectExpr("node", "cast(1 as double) as r")
    for i in range(iterations):
        contrib = (
            edges.join(ranks, edges[src] == ranks["node"])
            .join(deg, src)
            .selectExpr(f"{dst} as node", "r / od as c")
        )
        sums = contrib.groupBy("node").agg(F.expr(sqlgen.fsum("c")).alias("s"))
        ranks = nodes.join(sums, "node", "left").selectExpr(
            "node",
            f"{omd_lit} + {d_lit} * coalesce(s, cast(0 as double)) as r",
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
