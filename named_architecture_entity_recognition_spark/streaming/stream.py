"""Structured Streaming wrapper: the same recognition stages running
incrementally over an append-only documents table.

The reference is batch-only (SURVEY §2.6); this module exists because
every stage of our pipeline is doc_id-local (mapInPandas detection) or
a per-doc aggregation, which makes it trivially streamable with
``foreachBatch``: each micro-batch of new documents produces its
mentions/entities/triples independently and appends to the sink —
exactly-once via Spark's checkpointed offsets + idempotent overwrite of
per-batch output paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from named_architecture_entity_recognition_spark.schema import DOCUMENTS


def read_documents_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 16
) -> DataFrame:
    return (
        spark.readStream.schema(DOCUMENTS)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def stream_triples(
    docs_stream: DataFrame,
    gazetteer_names,
    out_path: str,
    checkpoint_path: str,
    cfg=None,
    available_now: bool = True,
):
    """documents stream -> append-only triples sink via foreachBatch.

    ``available_now=True`` drains everything currently in the source and
    stops (test/batch-catchup mode); False runs continuously.
    """
    from named_architecture_entity_recognition_spark.plans.pipeline import (
        RecognizerPipeline,
    )

    pipe = RecognizerPipeline(gazetteer_names, cfg=cfg or None, validate=True)

    def process_batch(batch_df: DataFrame, batch_id: int):
        if batch_df.isEmpty():
            return
        pipe.triples(batch_df).write.mode("append").parquet(out_path)

    writer = docs_stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
