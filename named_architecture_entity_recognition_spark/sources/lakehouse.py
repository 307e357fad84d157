"""Iceberg-first table IO with parquet fallback (sandbox has no
Iceberg runtime jar; a real cluster configures an Iceberg catalog and
the same calls hit it).

Production layout (north_rule):
  documents: Iceberg table partitioned by bucket(N_DOC_BUCKETS, doc_id)
             -> partition pruning for resume/anti-join by bucket
  triples:   Iceberg table partitioned by (pred, bucket(subj))
             -> predicate-pruned per-predicate scans; subj bucket
                co-locates an entity's triples for downstream CC joins
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_DOC_BUCKETS = 1024
N_SUBJ_BUCKETS = 256


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def read_documents(spark: SparkSession, source: str) -> DataFrame:
    """Read the documents table: Iceberg catalog name (prod) or a
    parquet path (sandbox). Catalyst prunes columns/partitions either
    way; the detection stage's scan only materializes spans.kind+text
    (see operators/mentions.py)."""
    if "/" not in source and iceberg_available(spark):
        return spark.read.table(source)
    return spark.read.parquet(source)


def write_triples(triples: DataFrame, target: str) -> None:
    """Write (subj, pred, obj): Iceberg `writeTo` with hidden
    partitioning when available, else parquet partitioned by pred with
    an explicit subj bucket column (same pruning behavior for readers
    that filter on pred / subj_bucket)."""
    spark = triples.sparkSession
    if "/" not in target and iceberg_available(spark):
        (
            triples.writeTo(target)
            .partitionedBy(F.col("pred"), F.bucket(N_SUBJ_BUCKETS, F.col("subj")))
            .createOrReplace()
        )
        return
    (
        triples.withColumn(
            "subj_bucket",
            F.pmod(F.xxhash64("subj"), F.lit(N_SUBJ_BUCKETS)).cast("int"),
        )
        .write.mode("overwrite")
        .partitionBy("pred")
        .parquet(target)
    )


def read_triples(spark: SparkSession, source: str) -> DataFrame:
    if "/" not in source and iceberg_available(spark):
        return spark.read.table(source)
    return spark.read.parquet(source)
