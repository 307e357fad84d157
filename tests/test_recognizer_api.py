"""Facade API parity (reference Builder/recognize shapes) + synth
determinism."""

import pytest
from pyspark.sql import functions as F

from named_architecture_entity_recognition_spark.plans.recognizer import (
    NamedEntityRecognizer,
)
from named_architecture_entity_recognition_spark.sources.sad import (
    documents_from_text,
)
from named_architecture_entity_recognition_spark.synth import synth_documents


@pytest.fixture(scope="module")
def docs(spark):
    return documents_from_text(
        spark,
        {
            "d1": "The WebUI renders pages.\nIt stores cookies for the session.",
            "d2": "The Registry tracks services.",
        },
    )


def test_builder_and_recognize(docs):
    rec = (
        NamedEntityRecognizer.Builder()
        .gazetteer(["WebUI", "Registry"])
        .build()
    )
    out = {(r.doc_id, r.name) for r in rec.recognize(docs).collect()}
    assert out == {("d1", "WebUI"), ("d2", "Registry")}


def test_recognize_with_explicit_gazetteer_overrides_default(docs):
    rec = NamedEntityRecognizer.Builder().gazetteer(["WebUI"]).build()
    out = rec.recognize(docs, possible_entities=["Registry"])
    assert {r.name for r in out.collect()} == {"Registry"}


def test_empty_gazetteer_yields_nothing(docs):
    rec = NamedEntityRecognizer.Builder().build()
    assert rec.recognize(docs).count() == 0


def test_recognize_triples(docs):
    rec = NamedEntityRecognizer.Builder().gazetteer(["WebUI"]).build()
    t = rec.recognize_triples(docs)
    preds = {r.pred for r in t.select("pred").distinct().collect()}
    assert "occursIn" in preds and "instanceOf" in preds


def test_synth_deterministic_across_partitioning(spark):
    a = synth_documents(spark, 30, seed=5, gazetteer_size=10, partitions=2)
    b = synth_documents(spark, 30, seed=5, gazetteer_size=10, partitions=7)
    ka = {(r.doc_id, len(r.spans), r.spans[0]["text"]) for r in a.collect()}
    kb = {(r.doc_id, len(r.spans), r.spans[0]["text"]) for r in b.collect()}
    assert ka == kb
    assert len(ka) == 30


def test_typed_gazetteer_map(spark):
    """Reference parity: recognize(docs, Map<NamedEntityType, names>)
    (recognizer/NamedEntityRecognizer.java:95-98) — entity_type follows
    the dictionary's type key."""
    from named_architecture_entity_recognition_spark.plans.recognizer import (
        NamedEntityRecognizer,
    )
    from named_architecture_entity_recognition_spark.schema import DOCUMENTS
    from named_architecture_entity_recognition_spark.sources.sad import doc_row

    docs = spark.createDataFrame(
        [doc_row("d", ["The WebUI uses the IMediaQuery interface heavily."])],
        DOCUMENTS,
    )
    rec = NamedEntityRecognizer.Builder().build()
    ents = rec.recognize(
        docs, {"COMPONENT": ["WebUI"], "INTERFACE": ["IMediaQuery"]}
    )
    got = {r.name: r.entity_type for r in ents.collect()}
    assert got == {"WebUI": "COMPONENT", "IMediaQuery": "INTERFACE"}
