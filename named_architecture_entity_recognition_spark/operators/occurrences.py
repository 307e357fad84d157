"""Occurrence resolution (J1) and DIRECT/INDIRECT classification (J2).

J1 — reference ``SoftwareArchitectureDocumentation.getLineNumber``
(model/SoftwareArchitectureDocumentation.java:145-168): for an emitted
occurrence string, score char-set Jaccard against every line of the
same doc (lowercased), take the first maximal line, accept iff score
>= 0.90 else -1 (dropped, F5 resilience:
serialization/NamedEntityParser.java:190-193).

Spark plan (doc-local, never a global theta join):
  1. FAST PATH, pure Catalyst: Jaccard == 1.0 iff the unique-char sets
     are equal, so an equi-join on (doc_id, charset_key) resolves every
     occurrence that has a char-set-identical line; winner = min
     sent_no (reference first-max tie-break). Whole-stage codegen, no
     Python.
  2. SLOW PATH for the remainder: equi-join on doc_id (Catalyst picks
     SMJ/broadcast; AQE handles skewed giant docs), score with an
     Arrow-vectorized pandas UDF, argmax via window
     (desc(score), asc(sent_no)) + row_number()==1, filter >= 0.90.

J2 — reference NamedEntityParser.java:188-204: DIRECT iff
lower(sentence) contains lower(name) or any lower(alias); pure SQL.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from named_architecture_entity_recognition_spark.functions.jaccard import (
    JACCARD_THRESHOLD,
    char_jaccard_series,
)


@pandas_udf(DoubleType())
def _jaccard_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return char_jaccard_series(a, b)


def charset_key(col) -> Column:
    """Canonical unique-char-set key of the lowercased string.

    Equal keys <=> char-set Jaccard == 1.0 (commons-text semantics).
    Pure built-in expressions (codegen'd)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.concat_ws(
        "", F.array_sort(F.array_distinct(F.split(F.lower(c), "")))
    )


def resolve_occurrences(
    occurrences: DataFrame,
    sentences: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
) -> DataFrame:
    """(doc_id, occ_id, occ_text) x (doc_id, sent_no, sentence)
    -> (doc_id, occ_id, sent_no).

    Unresolved occurrences (best score < threshold) are dropped —
    reference returns -1 and the parser skips them.
    """
    occ = occurrences.withColumn("ckey", charset_key("occ_text"))
    sent = sentences.withColumn("ckey", charset_key("sentence"))

    # fast path: char-set equality == score 1.0; first line wins
    fast = (
        occ.join(sent, ["doc_id", "ckey"])
        .groupBy("doc_id", "occ_id")
        .agg(F.min("sent_no").alias("sent_no"))
    )

    # slow path: only occurrences with no charset-equal line
    rest = occ.join(fast.select("doc_id", "occ_id"), ["doc_id", "occ_id"], "left_anti")
    pairs = rest.join(sent.drop("ckey"), "doc_id").withColumn(
        "score", _jaccard_udf(F.lower("sentence"), F.lower("occ_text"))
    )
    w = Window.partitionBy("doc_id", "occ_id").orderBy(
        F.desc("score"), F.asc("sent_no")
    )
    slow = (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("score") >= threshold))
        .select("doc_id", "occ_id", "sent_no")
    )
    return fast.unionByName(slow)


def classify_occurrences(
    resolved: DataFrame, sentences: DataFrame
) -> DataFrame:
    """Add ref_type to resolved occurrences.

    ``resolved``: (doc_id, name, alternative_names, sent_no, ...).
    DIRECT iff lower(sentence) contains lower(name) or any alias.
    """
    return (
        resolved.join(sentences, ["doc_id", "sent_no"])
        .withColumn(
            "ref_type",
            F.when(
                F.lower("sentence").contains(F.lower(F.col("name")))
                | F.exists(
                    "alternative_names",
                    lambda a: F.lower(F.col("sentence")).contains(F.lower(a)),
                ),
                F.lit("DIRECT"),
            ).otherwise(F.lit("INDIRECT")),
        )
        .drop("sentence")
    )
