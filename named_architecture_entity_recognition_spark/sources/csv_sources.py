"""CSV sources: gold standard + gazetteer (reference S3/S4 scans).

Reference parsers:
  - gold: test/.../GoldstandardParser.java:30-57 — skip header, split on
    ',', (componentName, sentence:int).
  - gazetteer: test/.../GoldstandardParser.java:92-114 — skip header,
    column 2 (componentName), trim, drop empties, distinct (TreeSet).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from named_architecture_entity_recognition_spark.schema import GAZETTEER


def read_gold_csv(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.read.option("header", True)
        .csv(str(path))
        .select(
            F.trim(F.col("componentName")).alias("component_name"),
            F.col("sentence").cast("int").alias("sentence"),
        )
    )


def read_gazetteer_csv(spark: SparkSession, path: str) -> DataFrame:
    """modelElementID_to_ComponentName.csv -> (entity_type, name)."""
    return (
        spark.read.option("header", True)
        .csv(str(path))
        .select(F.trim(F.col("componentName")).alias("name"))
        .filter(F.length("name") > 0)
        .dropDuplicates(["name"])
        .select(F.lit("COMPONENT").alias("entity_type"), "name")
    )


def gazetteer_from_names(spark: SparkSession, names: list) -> DataFrame:
    rows = [{"entity_type": "COMPONENT", "name": n} for n in sorted(set(names))]
    return spark.createDataFrame(rows, GAZETTEER)
