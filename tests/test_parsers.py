"""P1/P2/F4/L3 answer parsing — reference parity cases
(serialization/NamedEntityParser.java)."""

import pytest
from pyspark.sql import functions as F

from named_architecture_entity_recognition_spark.parsers.answers import (
    extract_window_expr,
    parse_json_answers,
    parse_structured_answers,
    resolve_parsed,
)

JSON_ANSWER = """Here is what I found:
[
 {"name": "WebUI", "type": "COMPONENT",
  "alternativeNames": ["UI"],
  "occurrences": ["The WebUI provides the front-end.",
                   "It renders pages for users."]},
 {"name": "Auth", "type": "COMPONENT",
  "alternativeNames": [],
  "occurrences": ["Auth checks the session.",
                   "completely unrelated text zzz 000"]}
]
Done."""

STRUCTURED_ANSWER = """BEGIN-OUTPUT
COMPONENT entities recognized:
WebUI, 'The WebUI provides the front-end.'
WebUI, 'It renders pages for users.'
Auth, 'Auth checks the session.'
Alternative names:
WebUI: UI, Frontend
Auth: None
END-OUTPUT"""


@pytest.fixture(scope="module")
def sentences(spark):
    rows = [
        ("d1", 1, "The WebUI provides the front-end."),
        ("d1", 2, "It renders pages for users."),
        ("d1", 3, "Auth checks the session."),
    ]
    return spark.createDataFrame(rows, "doc_id string, sent_no int, sentence string")


def test_window_extraction_json(spark):
    df = spark.createDataFrame([("x [1,2] y",)], "answer string")
    assert df.select(extract_window_expr("answer").alias("w")).head().w == "[1,2]"


def test_window_extraction_structured(spark):
    df = spark.createDataFrame(
        [("junk BEGIN-OUTPUT payload END-OUTPUT junk",)], "answer string"
    )
    assert df.select(extract_window_expr("answer").alias("w")).head().w == "payload"


def test_parse_json_entities(spark):
    answers = spark.createDataFrame([("d1", JSON_ANSWER)], "doc_id string, answer string")
    parsed = parse_json_answers(answers)
    rows = {r.name: r for r in parsed.filter(F.col("error").isNull()).collect()}
    assert set(rows) == {"WebUI", "Auth"}
    assert rows["WebUI"].alternative_names == ["UI"]
    assert len(rows["WebUI"].occ_texts) == 2


def test_parse_json_strict_type_quarantine(spark):
    bad = '[{"name":"X","type":"GIZMO","alternativeNames":[],"occurrences":[]}]'
    answers = spark.createDataFrame([("d1", bad)], "doc_id string, answer string")
    rows = parse_json_answers(answers).collect()
    assert rows and rows[0].error and "unknown entity type" in rows[0].error


def test_parse_json_unparseable_quarantined_not_fatal(spark):
    answers = spark.createDataFrame(
        [("d1", "no brackets at all")], "doc_id string, answer string"
    )
    rows = parse_json_answers(answers).collect()
    assert rows[0].error == "unparseable payload"


def test_parse_structured_state_machine(spark):
    answers = spark.createDataFrame(
        [("d1", STRUCTURED_ANSWER)], "doc_id string, answer string"
    )
    rows = {r.name: r for r in parse_structured_answers(answers).collect()}
    assert rows["WebUI"].alternative_names == ["Frontend", "UI"]
    assert rows["Auth"].alternative_names == []  # 'None' skipped
    assert rows["WebUI"].occ_texts == [
        "The WebUI provides the front-end.",
        "It renders pages for users.",
    ]


def test_parse_structured_error_modes(spark):
    answers = spark.createDataFrame(
        [
            ("d1", "BEGIN-OUTPUT\nWebUI, 'x.'\nEND-OUTPUT"),  # no type header
            ("d2", "BEGIN-OUTPUT\nCOMPONENT entities recognized:\nbadline\nEND-OUTPUT"),
        ],
        "doc_id string, answer string",
    )
    rows = {r.doc_id: r for r in parse_structured_answers(answers).collect()}
    assert "entity type not specified" in rows["d1"].error
    assert "invalid occurrence format" in rows["d2"].error


def test_resolve_parsed_end_to_end(spark, sentences):
    answers = spark.createDataFrame(
        [("d1", STRUCTURED_ANSWER)], "doc_id string, answer string"
    )
    parsed = parse_structured_answers(answers)
    entities = resolve_parsed(parsed, sentences)
    rows = {r.name: r for r in entities.collect()}
    webui_occ = [(o.sent_no, o.ref_type) for o in rows["WebUI"].occurrences]
    assert webui_occ == [(1, "DIRECT"), (2, "INDIRECT")]
    auth_occ = [(o.sent_no, o.ref_type) for o in rows["Auth"].occurrences]
    assert auth_occ == [(3, "DIRECT")]


def test_resolve_drops_unresolvable(spark, sentences):
    answers = spark.createDataFrame(
        [("d1", JSON_ANSWER)], "doc_id string, answer string"
    )
    entities = resolve_parsed(parse_json_answers(answers), sentences)
    rows = {r.name: r for r in entities.collect()}
    # Auth's second occurrence ('completely unrelated...') must be dropped
    assert [(o.sent_no, o.ref_type) for o in rows["Auth"].occurrences] == [
        (3, "DIRECT")
    ]
