"""Dedup (exact/minhash/ngram/simhash) and similarity-search operators."""

import pytest
from pyspark.sql import functions as F

from named_architecture_entity_recognition_spark.operators.dedup import (
    exact_dedup_groups,
    minhash_lsh_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    shingles,
    simhash64,
)
from named_architecture_entity_recognition_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_lsh,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, base + " with a tiny suffix"),  # near dup
        (4, "completely different content about spark shuffle partitions"),
        (5, "another unrelated text mentioning window functions and joins"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shingles(spark):
    df = spark.createDataFrame([("a b c d",)], "text string")
    out = df.select(shingles("text", 3).alias("s")).head().s
    assert out == ["a b c", "b c d"]


def test_exact_dedup(docs):
    groups = exact_dedup_groups(docs)
    dups = groups.filter(F.col("n_dups") > 1).collect()
    assert len(dups) == 1 and dups[0].n_dups == 2 and dups[0].keep_id == 1


def test_minhash_identical_signatures(docs):
    sigs = {
        r.doc_id: tuple(r.sig)
        for r in docs.select(
            "doc_id", minhash_signature(F.col("text"), 8).alias("sig")
        ).collect()
    }
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[4]


def test_lsh_finds_near_dups(docs):
    pairs = {
        (r.doc_a, r.doc_b) for r in minhash_lsh_pairs(docs, n_hashes=8, bands=4).collect()
    }
    assert (1, 2) in pairs
    assert (1, 3) in pairs or (2, 3) in pairs  # near-dup shares some bands
    assert (4, 5) not in pairs


def test_ngram_jaccard_verification(spark, docs):
    cands = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "doc_a long, doc_b long"
    )
    verified = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, cands, threshold=0.5).collect()
    }
    assert verified[(1, 2)] == 1.0
    assert (1, 3) in verified and verified[(1, 3)] < 1.0
    assert (1, 4) not in verified


def test_simhash_similar_docs_close(docs):
    sh = {r.doc_id: r.bits for r in docs.select(
        "doc_id", simhash64(F.col("text")).alias("bits")
    ).collect()}
    def hamming(a, b):
        return sum(x != y for x, y in zip(a, b))
    assert hamming(sh[1], sh[2]) == 0
    assert hamming(sh[1], sh[3]) < hamming(sh[1], sh[4])


@pytest.fixture(scope="module")
def embeddings(spark):
    import numpy as np

    rng = np.random.RandomState(3)
    rows = []
    for i in range(40):
        v = rng.standard_normal(16)
        rows.append((i, [float(x) for x in v / np.linalg.norm(v)]))
    # vec 100 = near-copy of vec 0
    base = np.array(rows[0][1])
    near = base + 0.01 * rng.standard_normal(16)
    rows.append((100, [float(x) for x in near / np.linalg.norm(near)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk_exact(spark, embeddings):
    qs = embeddings.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = cosine_topk(embeddings, qs, k=3).orderBy("rank").collect()
    assert out[0].neighbor_id == 0 and out[0].score == pytest.approx(1.0, abs=1e-4)
    assert out[1].neighbor_id == 100  # the planted near-duplicate
    assert out[0].rank == 1 and out[2].rank == 3


def test_cosine_topk_lsh_recalls_planted_neighbor(spark, embeddings):
    qs = embeddings.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = cosine_topk_lsh(embeddings, qs, k=3, n_planes=4).collect()
    ids = {r.neighbor_id for r in out}
    # the near-copy lands in the same hyperplane bucket as the query
    assert 0 in ids and 100 in ids
