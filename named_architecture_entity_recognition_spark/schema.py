"""Fixed StructType schemas for every table flowing through the engine.

Mirrors the reference's data model (SURVEY.md §1): the reference is a
fixed-schema Java object model; our equivalent is explicit StructTypes
(documents shape mandated by BASELINE.json input_hint).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

#: BASELINE.json input_hint — interleaved text + media documents
SPAN = StructType(
    [
        StructField("kind", StringType(), False),  # 'text' | 'image' | ...
        StructField("text", StringType(), True),  # sentence when kind='text'
        StructField("media_ref", StringType(), True),  # uri when kind!='text'
        StructField("offset", IntegerType(), False),  # 1-indexed position
    ]
)

DOCUMENTS = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("spans", ArrayType(SPAN), False),
    ]
)

#: exploded text spans; sent_no is the 1-indexed ordinal among text spans
#: (reference: 1-indexed lines, model/SoftwareArchitectureDocumentation.java:117-124)
SENTENCES = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("sent_no", IntegerType(), False),
        StructField("sentence", StringType(), False),
    ]
)

#: output of mention detection (one row per detected mention or
#: doc-induced alias record)
MENTIONS = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("record", StringType(), False),  # 'mention' | 'alias'
        StructField("name", StringType(), False),  # canonical gazetteer name
        StructField("sent_no", IntegerType(), True),
        StructField("ref_type", StringType(), True),  # DIRECT | INDIRECT
        StructField("rule", StringType(), True),
        StructField("alias", StringType(), True),
    ]
)

OCCURRENCE = StructType(
    [
        StructField("sent_no", IntegerType(), False),
        StructField("ref_type", StringType(), False),
    ]
)

#: reference NamedEntity (model/NamedEntity.java:12-199) as a row
ENTITIES = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("name", StringType(), False),
        StructField("entity_type", StringType(), False),
        StructField("alternative_names", ArrayType(StringType()), False),
        StructField("occurrences", ArrayType(OCCURRENCE), False),
    ]
)

GAZETTEER = StructType(
    [
        StructField("entity_type", StringType(), False),
        StructField("name", StringType(), False),
    ]
)

GOLD = StructType(
    [
        StructField("component_name", StringType(), False),
        StructField("sentence", IntegerType(), False),
    ]
)

TRIPLES = StructType(
    [
        StructField("subj", StringType(), False),
        StructField("pred", StringType(), False),
        StructField("obj", StringType(), False),
    ]
)
