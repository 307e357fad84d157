"""Connected components (alias canonicalization, J3 general form)."""

import pytest
from pyspark.sql import functions as F

from named_architecture_entity_recognition_spark.operators.cc import (
    canonicalize_aliases,
    connected_components,
)


def cc_map(edges_df):
    return {
        r.node: r.component for r in connected_components(edges_df).collect()
    }


def test_two_components(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "src string, dst string"
    )
    m = cc_map(edges)
    assert m["a"] == m["b"] == m["c"] == "a"
    assert m["x"] == m["y"] == "x"


def test_chain_converges(spark):
    # long path exercises >1 iteration of label propagation
    nodes = [f"n{i:02d}" for i in range(12)]
    edges = spark.createDataFrame(
        [(nodes[i], nodes[i + 1]) for i in range(11)], "src string, dst string"
    )
    m = cc_map(edges)
    assert set(m.values()) == {"n00"}


def test_deterministic_vs_partitioning(spark):
    rows = [("a", "b"), ("c", "d"), ("b", "c"), ("p", "q")]
    e1 = spark.createDataFrame(rows, "src string, dst string")
    e2 = spark.createDataFrame(rows, "src string, dst string").repartition(7)
    assert cc_map(e1) == cc_map(e2)


def test_wide_star_converges_fast(spark):
    """Hot-surface shape at scale: 10^5 entities all sharing one surface
    form make a star of 1e5 edges around one hub node. Min-label
    propagation + pointer jumping must converge in <=4 iterations (one
    action each), and every node must land on the hub-star's min label."""
    n = 100_000
    edges = (
        spark.range(n)
        .select(
            F.concat(F.lit("doc"), F.format_string("%06d", "id")).alias("src"),
            F.lit("name:hotterm").alias("dst"),
        )
    )
    stats = {}
    comp = connected_components(edges, stats=stats)
    rows = comp.collect()
    assert len(rows) == n + 1
    assert {r.component for r in rows} == {"doc000000"}
    assert stats["iterations"] <= 4


def test_reliable_checkpoint_dir_option(spark, tmp_path):
    """checkpoint_dir engages RELIABLE checkpointing (survives executor
    loss at scale): iteration state must be written under the dir and
    results identical to the localCheckpoint path."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "src string, dst string"
    )
    ckpt = tmp_path / "cc_ckpt"
    m = {
        r.node: r.component
        for r in connected_components(
            edges, checkpoint_dir=str(ckpt)
        ).collect()
    }
    assert m == cc_map(edges)
    assert any(ckpt.rglob("*"))  # reliable checkpoint files were written


def test_null_alternative_names_not_dropped(spark):
    """Entities read from external tables can carry NULL
    alternative_names; their own-name edge must survive (ADVICE r1) so
    cross-doc linking still unifies them."""
    from named_architecture_entity_recognition_spark.operators.cc import (
        canonicalize_corpus,
    )

    ents = spark.createDataFrame(
        [
            ("d1", "BBB web", "COMPONENT", None, []),
            ("d2", "bbb-web", "COMPONENT", None, []),
        ],
        "doc_id string, name string, entity_type string, "
        "alternative_names array<string>, occurrences array<struct<sent_no:int,ref_type:string>>",
    )
    canon = canonicalize_corpus(ents).select("doc_id", "canonical_id")
    rows = {r.doc_id: r.canonical_id for r in canon.collect()}
    assert rows["d1"] == rows["d2"]


def test_canonicalize_aliases_unifies_pools(spark):
    entities = spark.createDataFrame(
        [
            ("d1", "WebUI", "COMPONENT", ["UI"], []),
            ("d1", "Web User Interface", "COMPONENT", ["ui"], []),
            ("d1", "Auth", "COMPONENT", [], []),
            ("d2", "WebUI", "COMPONENT", ["UI"], []),  # other doc: own component
        ],
        "doc_id string, name string, entity_type string, "
        "alternative_names array<string>, occurrences array<struct<sent_no:int,ref_type:string>>",
    )
    out = canonicalize_aliases(entities)
    comp = {(r.doc_id, r.name): r.component for r in out.collect()}
    # WebUI and 'Web User Interface' share pool name 'ui' within d1
    assert comp[("d1", "WebUI")] == comp[("d1", "Web User Interface")]
    assert comp[("d1", "Auth")] != comp[("d1", "WebUI")]
    assert comp[("d2", "WebUI")] != comp[("d1", "WebUI")]  # doc-scoped


def test_corpus_canonicalization_links_across_docs(spark):
    """north_star: the same component mentioned with different surface
    conventions in different docs unifies under one canonical_id, via
    CC over normalized name/alias edges; unrelated entities stay apart."""
    from named_architecture_entity_recognition_spark.operators.cc import (
        canonicalize_corpus,
        sameas_triples,
    )

    ents = spark.createDataFrame(
        [
            ("d1", "BBB web", "COMPONENT", [], []),
            ("d2", "bbb-web", "COMPONENT", [], []),
            ("d3", "WebPortal", "COMPONENT", ["BBB Web"], []),
            ("d4", "Recommender", "COMPONENT", [], []),
        ],
        "doc_id string, name string, entity_type string, "
        "alternative_names array<string>, occurrences array<struct<sent_no:int,ref_type:string>>",
    )
    canon = canonicalize_corpus(ents).select("doc_id", "name", "canonical_id")
    rows = {r.doc_id: r.canonical_id for r in canon.collect()}
    assert rows["d1"] == rows["d2"] == rows["d3"]
    assert rows["d4"] != rows["d1"]
    triples = sameas_triples(canonicalize_corpus(ents))
    assert triples.filter("pred = 'sameAs'").count() == 4


def test_pipeline_canonicalize_flag_adds_sameas(spark):
    from named_architecture_entity_recognition_spark.plans.pipeline import (
        RecognizerPipeline,
    )
    from named_architecture_entity_recognition_spark.schema import DOCUMENTS
    from named_architecture_entity_recognition_spark.sources.sad import doc_row

    docs = spark.createDataFrame(
        [
            doc_row("a", ["The BBB web routes calls."]),
            doc_row("b", ["Here bbb-web handles requests."]),
        ],
        DOCUMENTS,
    )
    pipe = RecognizerPipeline(["BBB web"])
    t = pipe.triples(docs, canonicalize=True)
    same = t.filter("pred = 'sameAs'").select("obj").distinct()
    assert t.filter("pred = 'sameAs'").count() == 2
    assert same.count() == 1  # both docs' entities share one canonical id
