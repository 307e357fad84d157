"""Entity assembly: grouping, set/dedup semantics, canonical forms.

Reference semantics being reproduced:
  - A1/P3 group occurrences per (doc, entity name)
    (serialization/NamedEntityParser.java:79-98,152-159)
  - P4/P5 alias attach / rename-with-history (model/NamedEntity.java:77-107)
  - A3 entity set-dedup over (type, aliases, occurrences, name)
    (model/NamedEntity.java:151-165)
  - A4 TreeSet orderings -> canonical sorted arrays
  - F6 cleanComponentName (test/.../TestProjectEvaluator.java:40-43)
  - F7 makeAllNamesLowerCase (model/NamedEntity.java:112-126)

All built-in Catalyst expressions (whole-stage codegen); the single
shuffle is the groupBy (doc_id, name) hash aggregation with map-side
partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def clean_component_name(col) -> Column:
    """F6: strip the word 'component' (case-insensitive), collapse
    whitespace, trim — TestProjectEvaluator.java:40-43."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(c, r"(?i)\bcomponent\b", ""), r"\s+", " "
        )
    )


def assemble_entities(mentions: DataFrame) -> DataFrame:
    """mentions rows -> entities rows (schema.ENTITIES).

    One hash-agg shuffle on (doc_id, name); occurrences sorted by
    (sent_no, ref_type) like the reference's TreeSet<Occurrence>
    (model/NamedEntity.java:192-198), aliases sorted+distinct like
    TreeSet<String>.
    """
    # single conditional aggregation: one scan of mentions, one shuffle
    # (collect_set skips the NULLs produced by the other record kind)
    agg = (
        mentions.filter(F.col("record").isin("mention", "alias"))
        .groupBy("doc_id", "name")
        .agg(
            F.array_sort(
                F.collect_set(
                    F.when(
                        F.col("record") == "mention",
                        F.struct("sent_no", "ref_type"),
                    )
                )
            ).alias("occurrences"),
            F.array_sort(
                F.collect_set(F.when(F.col("record") == "alias", F.col("alias")))
            ).alias("alternative_names"),
        )
    )
    return agg.filter(F.size("occurrences") > 0).select(
        "doc_id",
        "name",
        F.lit("COMPONENT").alias("entity_type"),
        "alternative_names",
        "occurrences",
    )


def lowercase_all_names(entities: DataFrame) -> DataFrame:
    """F7 makeAllNamesLowerCase over name + aliases (sorted distinct)."""
    return entities.withColumn("name", F.lower("name")).withColumn(
        "alternative_names",
        F.array_sort(
            F.array_distinct(F.transform("alternative_names", F.lower))
        ),
    )


def change_name(entities: DataFrame, new_name: Column) -> DataFrame:
    """P5 changeName: old name joins the alias set, name := new.

    (model/NamedEntity.java:77-80)
    """
    return entities.withColumn(
        "alternative_names",
        F.array_sort(
            F.array_distinct(
                F.array_union("alternative_names", F.array(F.col("name")))
            )
        ),
    ).withColumn("name", new_name)


def dedup_entities(entities: DataFrame) -> DataFrame:
    """A3 LinkedHashSet semantics: distinct over the canonical tuple."""
    return entities.dropDuplicates(
        ["doc_id", "entity_type", "name", "alternative_names", "occurrences"]
    )


def occurrence_lines(entities: DataFrame) -> DataFrame:
    """A2 getOccurrenceLines: sorted distinct sentence numbers per entity."""
    return entities.withColumn(
        "occurrence_lines",
        F.array_sort(
            F.array_distinct(F.transform("occurrences", lambda o: o["sent_no"]))
        ),
    )


def flatten_occurrences(entities: DataFrame) -> DataFrame:
    """A5 entities -> distinct (doc_id, name, sent_no) pairs
    (test/.../SimpleComponentOccurrence.java:18-28)."""
    return (
        entities.select(
            "doc_id", "name", F.explode("occurrences").alias("occ")
        )
        .select("doc_id", "name", F.col("occ.sent_no").alias("sent_no"))
        .dropDuplicates(["doc_id", "name", "sent_no"])
    )
