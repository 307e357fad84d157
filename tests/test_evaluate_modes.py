"""Type-aware evaluation mode (the extension named by the reference's
empty placeholder test/.../ComplexComponentOccurrence.java:4-6):
occurrence identity (name, sentence, ref_type) vs the simple
(name, sentence) of SimpleComponentOccurrence.java:17-28."""

import pytest

from named_architecture_entity_recognition_spark.plans.evaluate import evaluate


@pytest.fixture(scope="module")
def rec_gold(spark):
    rec = spark.createDataFrame(
        [
            (
                "d1",
                "WebUI",
                "COMPONENT",
                ["ui"],
                [(1, "DIRECT"), (2, "INDIRECT"), (3, "DIRECT")],
            )
        ],
        "doc_id string, name string, entity_type string, "
        "alternative_names array<string>, "
        "occurrences array<struct<sent_no:int,ref_type:string>>",
    )
    gold = spark.createDataFrame(
        [("d1", "webui", 1), ("d1", "webui", 2)],
        "doc_id string, component_name string, sentence int",
    )
    return rec, gold


def test_simple_mode_ignores_ref_type(rec_gold):
    rec, gold = rec_gold
    row = evaluate(rec, gold, "simple").collect()[0]
    # pairs {1,2,3} vs gold {1,2}: the INDIRECT hit at sentence 2 counts
    assert (row.tp, row.fp, row.fn) == (2, 1, 0)


def test_complex_mode_faults_ref_type_mismatch(rec_gold):
    rec, gold = rec_gold
    row = evaluate(rec, gold, "complex").collect()[0]
    # gold is all-DIRECT (GoldstandardParser.java:270-297): the INDIRECT
    # occurrence at sentence 2 is now both a FP and a FN
    assert (row.tp, row.fp, row.fn) == (1, 2, 1)


def test_unknown_mode_rejected(rec_gold):
    rec, gold = rec_gold
    with pytest.raises(ValueError, match="unknown eval mode"):
        evaluate(rec, gold, "fancy")
