"""BM25 inverted-index search (operators/search.py)."""

import math

import pytest
from pyspark.sql import functions as F

from named_architecture_entity_recognition_spark.operators.search import (
    bm25_topk,
    build_index,
    search_topk,
)


def _docs(spark):
    rows = [
        ("d1", "spark spark spark shuffle"),
        ("d2", "spark join broadcast join"),
        ("d3", "quantile sketch merge"),
        ("d4", "spark"),
        ("d5", ""),  # token-less doc still counts toward N/avgdl
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def _bm25_expected(corpus, query, k1=1.2, b=0.75):
    """Plain-python reimplementation of the documented formula."""
    toks = {d: t.lower().split() for d, t in corpus}
    n = len(corpus)
    avgdl = sum(len(t) for t in toks.values()) / n
    scores = {}
    for term in sorted(set(query)):
        hits = {d: t.count(term) for d, t in toks.items() if term in t}
        if not hits:
            continue
        idf = math.log(1 + (n - len(hits) + 0.5) / (len(hits) + 0.5))
        for d, tf in hits.items():
            s = idf * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * len(toks[d]) / avgdl)
            )
            scores[d] = scores.get(d, 0.0) + s
    return {d: round(s, 4) for d, s in scores.items()}


def test_bm25_matches_reference_formula(spark):
    docs = _docs(spark)
    corpus = [(r.doc_id, r.text) for r in docs.collect()]
    query = ["spark", "join"]
    got = {r.doc_id: r.score for r in search_topk(docs, query, k=10).collect()}
    assert got == pytest.approx(_bm25_expected(corpus, query))


def test_bm25_ranking_and_k(spark):
    docs = _docs(spark)
    out = search_topk(docs, ["spark"], k=2).collect()
    assert len(out) == 2
    # d4 ("spark" alone, shortest doc) beats d1 (3x spark but longer):
    # wait — tf dominates at these lengths; assert order against the
    # reference formula instead of hand-waving
    exp = _bm25_expected([(r, t) for r, t in _docs(spark).collect()], ["spark"])
    ranked = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    assert [(r.doc_id, r.score) for r in out] == [
        (d, pytest.approx(s)) for d, s in ranked
    ]


def test_bm25_index_reuse_and_unknown_terms(spark):
    docs = _docs(spark)
    postings, stats = build_index(docs)
    postings = postings.cache()
    # unknown term contributes nothing; all-unknown query -> empty
    assert bm25_topk(postings, stats, ["nosuchterm"], k=5).count() == 0
    both = {
        r.doc_id: r.score
        for r in bm25_topk(postings, stats, ["sketch", "nosuchterm"], k=5).collect()
    }
    only = {
        r.doc_id: r.score
        for r in bm25_topk(postings, stats, ["sketch"], k=5).collect()
    }
    assert both == only and set(only) == {"d3"}
    # duplicate query terms are deduplicated
    dup = {
        r.doc_id: r.score
        for r in bm25_topk(postings, stats, ["sketch", "sketch"], k=5).collect()
    }
    assert dup == only
    postings.unpersist()


def test_bm25_rejects_empty_query(spark):
    with pytest.raises(ValueError, match="non-empty"):
        search_topk(_docs(spark), [], k=5)


def test_bm25_plan_broadcasts_tiny_sides(spark):
    """The query path must broadcast the term list / df / stats sides —
    the postings (big side) must never be shuffled for these joins —
    and the top-k must be TakeOrderedAndProject, not a global sort."""
    docs = _docs(spark)
    out = search_topk(docs, ["spark", "join"], k=3)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "TakeOrderedAndProject" in final, final
    assert "BroadcastHashJoin" in final or "BroadcastNestedLoopJoin" in final, final
    assert "SortMergeJoin" not in final, final
