"""Distributed re-implementation of the reference evaluation (E3).

Reference: test/.../TestProjectEvaluator.java:187-239 +
SimpleComponentOccurrence.java:18-28 + ClassificationMetricsCalculator.

Steps (per doc):
  1. lowercase all names both sides (:210-215)
  2. name pools: aliases U {cleanComponentName(name)} (:220-227)
  3. match recognized -> gold by pool intersection; unify names
     (:228-236). We generalize the reference's first-match loop to a
     deterministic join: each recognized entity maps to the gold
     entity sharing a pool name (min gold name on ties).
  4. flatten to distinct (name, sentence) pairs
  5. TP = inner join, FP = left anti, FN = right anti; P/R/F1 scalars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from named_architecture_entity_recognition_spark.operators.entities import (
    clean_component_name,
    lowercase_all_names,
)


def _pools(entities: DataFrame) -> DataFrame:
    """(doc_id, name, pool_name) — pool = aliases U {clean(name)}."""
    return entities.select(
        "doc_id",
        "name",
        F.explode(
            F.array_union(
                F.array(clean_component_name(F.col("name"))),
                F.col("alternative_names"),
            )
        ).alias("pool_name"),
    ).filter(F.length("pool_name") > 0)


def unify_names(recognized: DataFrame, gold_entities: DataFrame) -> DataFrame:
    """Map each recognized entity name to the pool name shared with a
    gold entity (reference matchComponentNames). Returns
    (doc_id, name, unified_name)."""
    rec_pool = _pools(recognized)
    gold_pool = _pools(gold_entities).select(
        "doc_id", F.col("pool_name"), F.col("name").alias("gold_name")
    )
    matches = rec_pool.join(gold_pool, ["doc_id", "pool_name"])
    w = Window.partitionBy("doc_id", "name").orderBy("gold_name", "pool_name")
    return (
        matches.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "name", F.col("pool_name").alias("unified_name"))
    )


def occurrence_pairs(
    entities: DataFrame, unified: DataFrame, mode: str = "simple"
) -> DataFrame:
    """Flatten to distinct occurrence pairs with unified names; unmatched
    entities keep cleanComponentName(name) (the reference leaves them
    under their own name).

    mode 'simple': (doc_id, name, sent_no) — the reference's
    SimpleComponentOccurrence identity ("in alignment with the
    information we currently have in the goldstandards",
    SimpleComponentOccurrence.java:10-12).
    mode 'complex': adds ref_type — the extension the reference's empty
    ComplexComponentOccurrence.java:4-6 placeholder names ("can be
    extended if the goldstandards are extended"): an INDIRECT mention at
    a gold-DIRECT sentence no longer counts as a hit.
    """
    e = entities.join(unified, ["doc_id", "name"], "left").withColumn(
        "final_name",
        F.coalesce("unified_name", clean_component_name(F.col("name"))),
    )
    cols = [
        F.col("doc_id"),
        F.col("final_name").alias("name"),
        F.col("occ.sent_no").alias("sent_no"),
    ]
    if mode == "complex":
        cols.append(F.col("occ.ref_type").alias("ref_type"))
    return (
        e.select("doc_id", "final_name", F.explode("occurrences").alias("occ"))
        .select(*cols)
        .dropDuplicates()
    )


def gold_as_entities(gold: DataFrame) -> DataFrame:
    """gold (doc_id, component_name, sentence) -> entities shape
    (GoldstandardParser.java:270-297: all DIRECT, no aliases)."""
    return gold.groupBy("doc_id", F.col("component_name").alias("name")).agg(
        F.array_sort(
            F.collect_set(
                F.struct(
                    F.col("sentence").cast("int").alias("sent_no"),
                    F.lit("DIRECT").alias("ref_type"),
                )
            )
        ).alias("occurrences")
    ).withColumn("entity_type", F.lit("COMPONENT")).withColumn(
        "alternative_names", F.array().cast("array<string>")
    )


def evaluate(
    recognized: DataFrame, gold: DataFrame, mode: str = "simple"
) -> DataFrame:
    """Per-doc precision/recall/F1 of occurrence pairs.

    recognized: entities shape. gold: (doc_id, component_name, sentence).
    mode 'simple' keys pairs by (name, sentence); 'complex' by
    (name, sentence, ref_type) — see occurrence_pairs. Gold rows are all
    DIRECT (GoldstandardParser.java:270-297), so in complex mode a
    recognized INDIRECT occurrence is both a FP and a FN.
    """
    if mode not in ("simple", "complex"):
        raise ValueError(f"unknown eval mode: {mode!r}")
    gold_e = lowercase_all_names(gold_as_entities(gold))
    rec_e = lowercase_all_names(recognized)
    unified = unify_names(rec_e, gold_e)
    rec_pairs = occurrence_pairs(rec_e, unified, mode)
    gold_cols = [
        F.col("doc_id"),
        clean_component_name(F.col("name")).alias("name"),
        F.col("occ.sent_no").alias("sent_no"),
    ]
    if mode == "complex":
        gold_cols.append(F.col("occ.ref_type").alias("ref_type"))
    gold_pairs = (
        gold_e.select("doc_id", "name", F.explode("occurrences").alias("occ"))
        .select(*gold_cols)
        .dropDuplicates()
    )
    keys = ["doc_id", "name", "sent_no"] + (
        ["ref_type"] if mode == "complex" else []
    )
    tp = rec_pairs.join(gold_pairs, keys).groupBy(
        "doc_id"
    ).agg(F.count("*").alias("tp"))
    fp = rec_pairs.join(
        gold_pairs, keys, "left_anti"
    ).groupBy("doc_id").agg(F.count("*").alias("fp"))
    fn = gold_pairs.join(
        rec_pairs, keys, "left_anti"
    ).groupBy("doc_id").agg(F.count("*").alias("fn"))
    out = (
        tp.join(fp, "doc_id", "full")
        .join(fn, "doc_id", "full")
        .fillna(0, ["tp", "fp", "fn"])
    )
    return out.select(
        "doc_id",
        "tp",
        "fp",
        "fn",
        (F.col("tp") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1))).alias(
            "precision"
        ),
        (F.col("tp") / F.greatest(F.col("tp") + F.col("fn"), F.lit(1))).alias(
            "recall"
        ),
    ).withColumn(
        "f1",
        F.when(
            (F.col("precision") + F.col("recall")) > 0,
            2 * F.col("precision") * F.col("recall")
            / (F.col("precision") + F.col("recall")),
        ).otherwise(F.lit(0.0)),
    )
