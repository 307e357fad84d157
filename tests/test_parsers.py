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


# ---------------------------------------------------------------- L2/L3 repair
def test_repair_parse_three_stages(spark):
    """Two-stage repair flow (NamedEntityRecognizer.java:57-81): strict
    JSON first, structured-text repair second, quarantine last."""
    from named_architecture_entity_recognition_spark.parsers.answers import (
        ERR_NO_JSON_ARRAY,
        EXPECTED_JSON_FORMAT,
        repair_parse,
    )

    answers = spark.createDataFrame(
        [
            (
                "d_json",
                'prose [{"name":"WebUI","type":"COMPONENT",'
                '"alternativeNames":["UI"],"occurrences":["x"]}] tail',
            ),
            (
                "d_structured",
                "COMPONENT entities recognized:\n"
                "Auth, 'The Auth checks logins.'\n"
                "Alternative names:\nAuth: None",
            ),
            ("d_garbage", "no recognizable structure at all"),
            ("d_empty", ""),
        ],
        "doc_id string, answer string",
    )
    rows = {r.doc_id: r for r in repair_parse(answers).collect()}

    assert rows["d_json"].stage == "strict"
    assert rows["d_json"].name == "WebUI"
    assert rows["d_json"].alternative_names == ["UI"]
    assert rows["d_json"].error is None
    assert rows["d_json"].repair_prompt is None

    assert rows["d_structured"].stage == "repaired"
    assert rows["d_structured"].name == "Auth"
    assert rows["d_structured"].occ_texts == ["The Auth checks logins."]
    # the repair prompt carries format + invalid output + error, in the
    # reference's exact template order (NamedEntityRecognizer.java:65-67)
    rp = rows["d_structured"].repair_prompt
    assert rp.startswith("The following output is invalid.")
    assert EXPECTED_JSON_FORMAT in rp
    assert "Invalid output to reformat:\nCOMPONENT entities recognized:" in rp
    assert rp.endswith(ERR_NO_JSON_ARRAY)

    assert rows["d_garbage"].stage == "quarantined"
    assert "entity type not specified" in rows["d_garbage"].error
    assert rows["d_empty"].stage == "quarantined"
    assert rows["d_empty"].error == "empty payload"


def test_repair_parse_invalid_json_window_error(spark):
    """A present-but-malformed [..] window reports the invalid-JSON
    error, not the no-array error, in the repair prompt."""
    from named_architecture_entity_recognition_spark.parsers.answers import (
        ERR_INVALID_JSON,
        repair_parse,
    )

    answers = spark.createDataFrame(
        [("d1", "[not json at all]")], "doc_id string, answer string"
    )
    row = repair_parse(answers).collect()[0]
    assert row.stage == "quarantined"
    assert row.repair_prompt.endswith(ERR_INVALID_JSON)


def test_repair_parse_unknown_type_fails_whole_answer_into_repair(spark):
    """fromJson is all-or-nothing per answer (NamedEntityType.valueOf
    throws): one BOGUS-typed entity sends the ENTIRE answer to repair,
    not just the offending row."""
    from named_architecture_entity_recognition_spark.parsers.answers import (
        ERR_UNKNOWN_TYPE,
        repair_parse,
    )

    answers = spark.createDataFrame(
        [
            (
                "d1",
                '[{"name":"Good","type":"COMPONENT"},'
                '{"name":"Bad","type":"BOGUS"}]',
            ),
            ("d2", '[{"name":"NoType"}]'),
        ],
        "doc_id string, answer string",
    )
    rows = repair_parse(answers).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # neither doc produces a strict row — both went to repair (and then
    # quarantine, since JSON isn't the structured-text grammar either)
    assert all(r.stage == "quarantined" for r in by_doc["d1"])
    assert all(r.stage == "quarantined" for r in by_doc["d2"])
    assert all(ERR_UNKNOWN_TYPE in r.repair_prompt for r in by_doc["d1"])
