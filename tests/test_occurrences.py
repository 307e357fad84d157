"""J1 occurrence resolution (Jaccard argmax, threshold, tie-break) and
J2 DIRECT/INDIRECT classification — reference semantics edge cases."""

import pytest
from pyspark.sql import functions as F

from named_architecture_entity_recognition_spark.operators.occurrences import (
    classify_occurrences,
    resolve_occurrences,
)


@pytest.fixture(scope="module")
def sentences(spark):
    rows = [
        ("d1", 1, "The WebUI provides the front-end."),
        ("d1", 2, "Auth checks the session."),
        ("d1", 3, "abc."),
        ("d1", 4, "cba."),  # same char set as line 3
        ("d2", 1, "Something else entirely."),
    ]
    return spark.createDataFrame(rows, "doc_id string, sent_no int, sentence string")


def occ(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, occ_id int, occ_text string")


def test_exact_match_fast_path(spark, sentences):
    out = resolve_occurrences(
        occ(spark, [("d1", 1, "Auth checks the session.")]), sentences
    ).collect()
    assert [(r.occ_id, r.sent_no) for r in out] == [(1, 2)]


def test_charset_tie_takes_first_line(spark, sentences):
    # 'cba.' has char-set score 1.0 vs both line 3 and 4 -> first wins
    out = resolve_occurrences(occ(spark, [("d1", 1, "cba.")]), sentences).collect()
    assert out[0].sent_no == 3


def test_below_threshold_dropped(spark, sentences):
    out = resolve_occurrences(
        occ(spark, [("d1", 1, "qqqq zzzz 0123456789")]), sentences
    ).collect()
    assert out == []


def test_fuzzy_match_slow_path(spark, sentences):
    # slightly perturbed line still resolves (score >= 0.9)
    out = resolve_occurrences(
        occ(spark, [("d1", 1, "The WebUI provides the front-endd")]), sentences
    ).collect()
    assert [(r.occ_id, r.sent_no) for r in out] == [(1, 1)]


def test_doc_scoped_resolution(spark, sentences):
    # the same text in another doc resolves within that doc only
    out = resolve_occurrences(
        occ(spark, [("d2", 7, "Something else entirely.")]), sentences
    ).collect()
    assert [(r.doc_id, r.occ_id, r.sent_no) for r in out] == [("d2", 7, 1)]


def test_classify_direct_by_name(spark, sentences):
    resolved = spark.createDataFrame(
        [("d1", "WebUI", [], 1)],
        "doc_id string, name string, alternative_names array<string>, sent_no int",
    )
    out = classify_occurrences(resolved, sentences).collect()
    assert out[0].ref_type == "DIRECT"


def test_classify_direct_by_alias(spark, sentences):
    resolved = spark.createDataFrame(
        [("d1", "Authentication", ["auth"], 2)],
        "doc_id string, name string, alternative_names array<string>, sent_no int",
    )
    out = classify_occurrences(resolved, sentences).collect()
    assert out[0].ref_type == "DIRECT"


def test_classify_indirect(spark, sentences):
    resolved = spark.createDataFrame(
        [("d1", "Registry", [], 2)],
        "doc_id string, name string, alternative_names array<string>, sent_no int",
    )
    out = classify_occurrences(resolved, sentences).collect()
    assert out[0].ref_type == "INDIRECT"
