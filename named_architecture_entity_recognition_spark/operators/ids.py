"""Stable consecutive global row numbering without a single-partition
sort.

``row_number() OVER (ORDER BY key)`` is the textbook way to assign
consecutive ids 0..N-1 — and at 100 TB it is a job-killer: an unbounded
window funnels EVERY row through one reducer (``Exchange
SinglePartition``). The scalable shape, used here:

1. range-partition by the order key (``repartitionByRange`` — Spark
   samples boundaries, equal keys land in one partition, partitions are
   globally ordered);
2. number rows *within* each partition (window partitioned by
   ``spark_partition_id()`` — a parallel, per-partition sort);
3. compute each partition's global offset from the per-partition counts
   (a tiny aggregate: one row per partition — the only data that ever
   sees a single reducer) and add it.

Full-data shuffles: the range exchange + one hash exchange on the
partition id. Nothing row-sized is ever globally sorted on one node.
``monotonically_increasing_id`` is NOT a substitute: its ids are neither
consecutive nor order-correlated.

Caveats (asserted/doc-tested in tests/test_ids.py): the order key must
be unique (ties across a range boundary would make ranks
retry-dependent); ids are assigned for THIS snapshot — appending rows
later renumbers (use hash_split-style md5 keys for backfill-stable
identity; this operator is for positional ids, e.g. Arrow record
offsets or contiguous shard assignment).

Reference parity: the reference numbers sentences 1..N inside a single
in-memory document (`model/SoftwareArchitectureDocumentation.java`);
this is the corpus-scale generalization.

DuckDB oracle: plain ``row_number() OVER (ORDER BY key)`` — fine at
oracle scale, the thing this operator exists to avoid at production
scale (q_stable_row_ids in __spark_entry__.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stable_row_ids(
    df: DataFrame,
    order_by: str,
    id_col: str = "row_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``id_col``: consecutive longs 0..N-1 in ``order_by`` order.
    ``order_by`` must be a unique key."""
    parts = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    ranged = df.repartitionByRange(parts, F.col(order_by)).withColumn(
        "_p", F.spark_partition_id()
    )
    w = Window.partitionBy("_p").orderBy(order_by)
    local = ranged.withColumn("_i", F.row_number().over(w))
    # one row per partition; the cumulative window below runs on ~`parts`
    # rows, so its SinglePartition exchange is trivially small
    counts = local.groupBy("_p").agg(F.count("*").alias("_c"))
    wo = Window.orderBy("_p").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_p", F.coalesce(F.sum("_c").over(wo), F.lit(0)).alias("_off")
    )
    return (
        local.join(F.broadcast(offsets), "_p")
        .withColumn(id_col, (F.col("_off") + F.col("_i") - 1).cast("long"))
        .drop("_p", "_i", "_off")
    )
