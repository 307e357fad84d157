"""Graph analytics over the knowledge graph: PageRank.

The engine's KG output (triples / canonical entities, see
``operators/cc.py`` for the component side) invites the classic
"which entities matter" query; PageRank is the canonical answer and the
canonical *iterative* Spark workload, so it doubles as the engine's
second iterative-algorithm pattern next to connected components.

Semantics: the simplified textbook formulation over a directed edge
list (deduplicated):

    rank_0(v)   = 1 / N
    rank_t+1(v) = (1-d)/N + d * sum_{(u,v) in E} rank_t(u) / outdeg(u)

Dangling-node mass (nodes with no out-edges) is dropped, not
redistributed — the common simplification (also what the classic Spark
example does); ranks then sum to < 1. Deterministic: fixed iteration
count by default, so the DuckDB oracle (q_pagerank) reproduces the
run by unrolling the SAME recurrence `iterations` times; ranks are
rounded to 6 decimals at the edge to absorb summation-order float
noise.

Scale shape (per iteration): ONE aggregation shuffle for the
contribution sum (map-side partial agg collapses per-partition
contributions to a dst before the exchange) plus the nodes⨝contrib
join. The static (src, dst, outdeg) edge frame is checkpointed once —
without truncation its upstream lineage (e.g. a triple-extraction
pipeline) re-executes every iteration (the same trap measured 3-4x in
cc.py). Iteration state is lazily checkpointed so the final action
doesn't drag a 10-deep join lineage. With ``tol`` set, each iteration
pays one scalar action (max |Δrank| rides the same aggregate that
materializes the checkpoint — the cc.py trick) in exchange for early
exit. At production scale pass ``checkpoint_dir`` for reliable
checkpointing (executor loss mid-iteration otherwise kills the job —
same contract as connected_components).

Reference parity: beyond-reference capability (the reference holds one
in-memory document and has no graph analytics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 10,
    tol: float | None = None,
    checkpoint_dir: str | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """edges(src string, dst string) -> (node string, rank double).

    Fixed ``iterations`` rounds (deterministic, oracle-friendly); set
    ``tol`` to stop early once max |Δrank| < tol (adds one scalar
    action per iteration). ``stats`` gets {"iterations": n}.
    """
    spark = edges.sparkSession
    if checkpoint_dir:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    def _ckpt(df: DataFrame) -> DataFrame:
        if checkpoint_dir:
            return df.checkpoint(eager=False)
        return df.localCheckpoint(eager=False)

    e = (
        edges.select("src", "dst")
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .dropDuplicates(["src", "dst"])
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    nodes = _ckpt(nodes)
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    # static per-edge frame, checkpointed ONCE: joins into every iteration
    estatic = _ckpt(e.join(outdeg, "src"))
    base = (1.0 - damping) / n
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    iters = 0
    for _ in range(iterations):
        iters += 1
        contrib = (
            estatic.join(ranks, estatic.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("_c"))
            .withColumnRenamed("dst", "node")
        )
        new_ranks = (
            ranks.withColumnRenamed("rank", "_old")
            .join(contrib, "node", "left")
            .select(
                "node",
                (F.lit(base) + damping * F.coalesce("_c", F.lit(0.0))).alias(
                    "rank"
                ),
                "_old",
            )
        )
        new_ranks = _ckpt(new_ranks)
        if tol is not None:
            # the one action: materializes the checkpoint AND returns
            # the convergence signal (no separate job)
            delta = new_ranks.agg(
                F.max(F.abs(F.col("rank") - F.col("_old")))
            ).first()[0]
            ranks = new_ranks.drop("_old")
            if delta is not None and delta < tol:
                break
        else:
            ranks = new_ranks.drop("_old")
    if stats is not None:
        stats["iterations"] = iters
    return ranks.select("node", F.round("rank", 6).alias("rank"))


def triple_edges(triples: DataFrame) -> DataFrame:
    """KG triples (subj, pred, obj) -> directed subj->obj edge list for
    :func:`pagerank` (literal-valued predicates like hasName excluded
    by keeping only obj values that also appear as subjects is the
    caller's choice; this keeps every edge)."""
    return triples.select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )
