"""KG triple materialization (north_star output shape).

entities rows -> (subj, pred, obj):
  (entity_id, 'instanceOf',          entity_type)
  (entity_id, 'hasName',             name)
  (entity_id, 'hasAlternativeName',  alias)            per alias
  (entity_id, 'occursIn',            doc#s<no>#<ref>)  per occurrence
with entity_id = '<doc_id>#<lower(name)>'.

Narrow per-row transforms + one union; written partitioned by pred
(and bucketed by subj at real scale — Iceberg hidden partitioning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PREDICATES = ("instanceOf", "hasName", "hasAlternativeName", "occursIn")


def entity_id() -> "F.Column":
    return F.concat_ws("#", F.col("doc_id"), F.lower(F.col("name")))


def to_triples(entities: DataFrame) -> DataFrame:
    e = entities.withColumn("subj", entity_id())
    instance_of = e.select(
        "subj", F.lit("instanceOf").alias("pred"), F.col("entity_type").alias("obj")
    )
    has_name = e.select(
        "subj", F.lit("hasName").alias("pred"), F.col("name").alias("obj")
    )
    has_alt = e.select(
        "subj",
        F.lit("hasAlternativeName").alias("pred"),
        F.explode("alternative_names").alias("obj"),
    )
    occurs_in = (
        e.select("subj", "doc_id", F.explode("occurrences").alias("occ"))
        .select(
            "subj",
            F.lit("occursIn").alias("pred"),
            F.concat_ws(
                "#",
                F.col("doc_id"),
                F.concat(F.lit("s"), F.col("occ.sent_no").cast("string")),
                F.col("occ.ref_type"),
            ).alias("obj"),
        )
    )
    return (
        instance_of.unionByName(has_name)
        .unionByName(has_alt)
        .unionByName(occurs_in)
    )


def write_triples(triples: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Partitioned write; at production scale this is an Iceberg
    ``writeTo(...).partitionedBy('pred', bucket(N,'subj'))`` — parquet
    with partitionBy is the sandbox equivalent (no Iceberg runtime jar
    in this environment)."""
    triples.write.mode(mode).partitionBy("pred").parquet(path)
