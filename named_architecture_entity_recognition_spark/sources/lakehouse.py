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


def subj_bucket_col(n_buckets: int = N_SUBJ_BUCKETS):
    """The parquet-fallback bucket expression for subj. Readers prune
    with `filter(subj_bucket == subj_bucket_value(s))`; both sides use
    the same xxhash64-pmod so the contract is one function."""
    return F.pmod(F.xxhash64("subj"), F.lit(n_buckets)).cast("int")


def write_triples(
    triples: DataFrame, target: str, n_buckets: int = N_SUBJ_BUCKETS
) -> None:
    """Write (subj, pred, obj) — the S7 sink (reference returns its
    entity set to the caller, `recognizer/NamedEntityRecognizer.java:57-81`;
    at 10^12 docs the "caller" is a partitioned lakehouse table).

    Iceberg branch (jar present): `writeTo` with hidden partitioning
    `(pred, bucket(subj))`. Parquet fallback (this sandbox): the SAME
    layout semantics executed via directory partitioning on
    `(pred, subj_bucket)` — a reader filtering on pred or on the bucket
    of a subject touches only its partition directories (asserted by
    input-file-count pruning tests in tests/test_sources.py)."""
    spark = triples.sparkSession
    if "/" not in target and iceberg_available(spark):
        (
            triples.writeTo(target)
            .partitionedBy(F.col("pred"), F.bucket(n_buckets, F.col("subj")))
            .createOrReplace()
        )
        return
    (
        triples.withColumn("subj_bucket", subj_bucket_col(n_buckets))
        .write.mode("overwrite")
        .partitionBy("pred", "subj_bucket")
        .parquet(target)
    )


def read_triples(spark: SparkSession, source: str) -> DataFrame:
    if "/" not in source and iceberg_available(spark):
        return spark.read.table(source)
    return spark.read.parquet(source)


def compact_table(
    spark: SparkSession,
    source: str,
    target: str,
    target_mb: int = 128,
) -> dict:
    """Rewrite a LOCAL parquet directory into ~``target_mb``-sized
    files — the lakehouse small-file maintenance job. This is the plain
    parquet form; on an Iceberg deployment the equivalent operation is
    the `rewrite_data_files` procedure (not dispatched here — the
    sandbox has no runtime jar, and Iceberg compaction is a catalog
    procedure call, not a DataFrame job). Input sizing uses local
    ``Path`` stats, so object-store/HDFS URIs are rejected explicitly
    rather than mis-reporting bytes_in=0.

    Why it exists here: long-running ingest jobs accumulate small
    files, and Spark's FilePartition packing then silently bins them
    into exactly one read task per core — ZERO wave slack, so one slow
    executor stalls every downstream job (this repo measured it:
    tools/scaling.py's 128 x 1.5 MB files collapsed to 32 tasks on
    local[32]). Compaction restores healthy task granularity at the
    source instead of every reader tuning maxPartitionBytes.

    Returns {"files_in", "bytes_in", "files_out", "n_rows"}.
    Row-preservation (count + content) is pytest-asserted; file count
    = ceil(bytes / target_mb) bounded below by 1.
    """
    import math
    from pathlib import Path

    if "://" in source and not source.startswith("file://"):
        raise ValueError(
            f"compact_table sizes input via local filesystem stats; "
            f"got non-local URI {source!r}"
        )
    src = Path(source.removeprefix("file://"))
    data_files = [p for p in src.rglob("*.parquet")]
    bytes_in = sum(p.stat().st_size for p in data_files)
    df = spark.read.parquet(source)
    n_files = max(1, math.ceil(bytes_in / (target_mb * 1024 * 1024)))
    # repartition(n) round-robins rows for even file sizes; writers of
    # sorted/clustered tables should use repartitionByRange on their
    # cluster key instead to keep data-skipping stats tight
    df.repartition(n_files).write.mode("overwrite").parquet(target)
    out_files = [p for p in Path(target).rglob("*.parquet")]
    return {
        "files_in": len(data_files),
        "bytes_in": bytes_in,
        "files_out": len(out_files),
        "n_rows": spark.read.parquet(target).count(),
    }


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist a table BUCKETED (and sorted) by its join key — the
    co-located-join layout for tables that are repeatedly joined on the
    same key (facts x facts: events x sessions, triples x triples for
    CC, postings x postings). Two tables bucketed by the same key into
    the same bucket count join with ZERO Exchange: at 100 TB that
    deletes the single most expensive stage of every repeated join
    (proof: test_sources.py asserts the bucketed sort-merge join plans
    no Exchange while the identical unbucketed join plans one, and
    that an equality filter prunes the scan to one bucket). The
    partition-local Sort remains by default — Spark only trusts
    per-file sortBy order under
    ``spark.sql.legacy.bucketedTableScan.outputOrdering`` (SPARK-28595)
    — but it is shuffle-free and spills never cross tasks.

    Spark-native bucketing (works on the built-in catalog, no Hive):
    ``bucketBy(n, key).sortBy(key).saveAsTable``. On Iceberg the same
    layout is declared as a ``bucket(n, key)`` partition transform +
    write-ordering — the jar-gated branch of this module's sink."""
    # align writer partitions with buckets (same Murmur3 hash, same N):
    # each task then holds exactly one bucket -> ONE file per bucket,
    # which lets the scan trust the per-file sortBy order and the join
    # drop its Sort nodes too (multi-file buckets only guarantee
    # per-file order, so Spark would re-sort)
    w = (
        df.repartition(n_buckets, F.col(key))
        .write.format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .mode(mode)
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)
