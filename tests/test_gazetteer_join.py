"""Join-based per-document gazetteer transport (the 100×-scale form).

The closure path (``detect_entities_df`` with ``{doc_id: names}``)
serializes EVERY doc's dictionary into EVERY task binary — fine for the
reference's per-project lists, O(all dictionaries) per task at 10^9
docs. ``detect_entities_df_joined`` replaces the closure with a
doc_id-local join against a (doc_id, name) dictionary TABLE; these
tests pin parity between the two transports and audit the plan.
"""

import pytest
from pyspark.sql import functions as F

from named_architecture_entity_recognition_spark.operators.mentions import (
    detect_entities_df,
    detect_entities_df_joined,
)
from named_architecture_entity_recognition_spark.schema import DOCUMENTS
from named_architecture_entity_recognition_spark.sources.sad import doc_row


def _docs(spark):
    return spark.createDataFrame(
        [
            doc_row(
                "d1",
                [
                    "The Billing Service handles payment.",
                    "It talks to the Audit Log.",
                    "The Audit Log stores events.",
                ],
            ),
            doc_row(
                "d2",
                [
                    "The Billing Service is unknown here.",
                    "The Query Planner optimizes requests.",
                ],
            ),
            doc_row("d3", ["Nothing relevant at all."]),
        ],
        DOCUMENTS,
    )


GAZ_MAP = {
    "d1": ["Billing Service", "Audit Log"],
    "d2": ["Query Planner"],
    # d3 deliberately absent: no dictionary -> no entities
}


def _rows(df):
    return sorted(
        (
            r.doc_id,
            r.name,
            r.entity_type,
            tuple(r.alternative_names),
            tuple((o.sent_no, o.ref_type) for o in r.occurrences),
        )
        for r in df.collect()
    )


def test_joined_path_matches_closure_path(spark):
    docs = _docs(spark)
    gaz_df = spark.createDataFrame(
        [(d, n) for d, names in GAZ_MAP.items() for n in names],
        "doc_id string, name string",
    )
    closure = detect_entities_df(docs, GAZ_MAP)
    joined = detect_entities_df_joined(docs, gaz_df)
    assert _rows(closure) == _rows(joined)
    # sanity on content: per-doc scoping respected (d2 must NOT link
    # Billing Service — it is only in d1's dictionary)
    got = {(r.doc_id, r.name) for r in joined.collect()}
    assert ("d1", "Billing Service") in got
    assert ("d2", "Query Planner") in got
    assert ("d2", "Billing Service") not in got
    assert not any(d == "d3" for d, _ in got)


def test_joined_path_typed_dictionary(spark):
    """entity_type column in the dictionary table types the entities
    (reference enum model/NamedEntityType.java:8); unknown types
    degrade to COMPONENT."""
    docs = _docs(spark)
    gaz_df = spark.createDataFrame(
        [
            ("d1", "Billing Service", "COMPONENT"),
            ("d1", "Audit Log", "INTERFACE"),
            ("d2", "Query Planner", "WEIRD"),
        ],
        "doc_id string, name string, entity_type string",
    )
    got = {
        (r.doc_id, r.name): r.entity_type
        for r in detect_entities_df_joined(docs, gaz_df).collect()
    }
    assert got[("d1", "Billing Service")] == "COMPONENT"
    assert got[("d1", "Audit Log")] == "INTERFACE"
    assert got[("d2", "Query Planner")] == "COMPONENT"


def test_joined_path_duplicate_dictionary_rows_are_idempotent(spark):
    docs = _docs(spark)
    gaz_df = spark.createDataFrame(
        [(d, n) for d, names in GAZ_MAP.items() for n in names] * 3,
        "doc_id string, name string",
    )
    dedup = detect_entities_df_joined(docs, gaz_df)
    assert _rows(dedup) == _rows(detect_entities_df(docs, GAZ_MAP))


def test_joined_path_plan_is_arrow_and_broadcastable(spark):
    """Plan audit (VERDICT r3 #6): no ArrowEvalPython/BatchEvalPython
    (the kernel is mapInArrow); with broadcast=True the documents side
    never shuffles — the ONLY hash exchange is the tiny dictionary
    pre-aggregation, and the join is a BroadcastHashJoin."""
    docs = _docs(spark)
    gaz_df = spark.createDataFrame(
        [(d, n) for d, names in GAZ_MAP.items() for n in names],
        "doc_id string, name string",
    )
    q = detect_entities_df_joined(docs, gaz_df, broadcast=True)
    plan = q._sc._jvm.PythonSQLUtils.explainString(
        q._jdf.queryExecution(), "simple"
    )
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 1, plan


@pytest.mark.parametrize("broadcast", [False, True])
def test_joined_path_broadcast_flag_is_result_invariant(spark, broadcast):
    docs = _docs(spark)
    gaz_df = spark.createDataFrame(
        [(d, n) for d, names in GAZ_MAP.items() for n in names],
        "doc_id string, name string",
    )
    got = _rows(detect_entities_df_joined(docs, gaz_df, broadcast=broadcast))
    assert got == _rows(detect_entities_df(docs, GAZ_MAP))
