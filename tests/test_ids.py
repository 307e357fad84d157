"""Stable row ids (operators/ids.py) and exact stratified sampling
(operators/corpus.py stratified_sample_exact)."""

import pytest
from pyspark.sql import functions as F

from named_architecture_entity_recognition_spark.operators.corpus import (
    sample_mixture,
    stratified_sample_exact,
)
from named_architecture_entity_recognition_spark.operators.ids import (
    stable_row_ids,
)


def test_row_ids_are_consecutive_in_key_order(spark):
    df = spark.createDataFrame(
        [(f"doc{999 - i:04d}", i) for i in range(500)], "doc_id string, x int"
    ).repartition(7)
    out = stable_row_ids(df, "doc_id", num_partitions=5).collect()
    by_key = sorted(out, key=lambda r: r.doc_id)
    assert [r.row_id for r in by_key] == list(range(500))
    # payload survives untouched
    assert all(r.doc_id == f"doc{999 - r.x:04d}" for r in out)


def test_row_ids_no_full_data_single_partition_sort(spark):
    """The raw-row path must never pass through a SinglePartition
    exchange; only the per-partition counts (tiny) may. We check that
    the plan's SinglePartition exchange sits above the count aggregate,
    not above the range exchange of raw rows."""
    df = spark.range(10000).select(F.col("id").cast("string").alias("doc_id"))
    out = stable_row_ids(df, "doc_id", num_partitions=8)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "rangepartitioning" in final, final
    # every SinglePartition section must be fed by the count aggregate
    sections = final.split("Exchange SinglePartition")[1:]
    assert all("count" in s[:600] for s in sections), final


def test_row_ids_default_partitions_and_determinism(spark):
    df = spark.createDataFrame(
        [(f"k{i:05d}",) for i in range(300)], "doc_id string"
    )
    a = {r.doc_id: r.row_id for r in stable_row_ids(df, "doc_id").collect()}
    b = {
        r.doc_id: r.row_id
        for r in stable_row_ids(df.repartition(11), "doc_id").collect()
    }
    assert a == b and a["k00000"] == 0 and a["k00299"] == 299


def test_stratified_exact_counts_and_determinism(spark):
    docs = spark.createDataFrame(
        [(f"d{i:05d}", ["web", "wiki", "code"][i % 3]) for i in range(600)],
        "doc_id string, source string",
    )
    got = stratified_sample_exact(docs, 25, key_col="source")
    counts = {r.source: r.n for r in got.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts == {"web": 25, "wiki": 25, "code": 25}
    # deterministic under repartition
    ids = lambda df: {r.doc_id for r in df.collect()}
    assert ids(got) == ids(
        stratified_sample_exact(docs.repartition(13), 25, key_col="source")
    )
    # small stratum: returns the whole stratum
    tiny = docs.filter("source = 'web'").limit(0).union(
        docs.filter("doc_id < 'd00006'")
    )
    out = stratified_sample_exact(tiny, 25, key_col="source")
    assert out.count() == tiny.count()


def test_stratified_composes_with_mixture_thinning(spark):
    """Pre-thinning with sample_mixture keeps the same k rows whenever
    the thinning retains them (hash order preserved under subsetting) —
    the documented hot-stratum escape hatch."""
    docs = spark.createDataFrame(
        [(f"d{i:05d}", "web") for i in range(2000)], "doc_id string, source string"
    )
    k = 10
    direct = {r.doc_id for r in stratified_sample_exact(docs, k).collect()}
    thinned = sample_mixture(docs, {"web": 0.5}, key_col="source")
    composed = {r.doc_id for r in stratified_sample_exact(thinned, k).collect()}
    survived = {
        r.doc_id for r in thinned.collect()
    }
    if direct <= survived:
        assert composed == direct
    else:
        # rows the thinning dropped are replaced by the next-smallest
        assert len(composed) == k and composed <= survived


def test_stratified_rejects_bad_k(spark):
    docs = spark.createDataFrame([("d1", "web")], "doc_id string, source string")
    with pytest.raises(ValueError, match="k must be"):
        stratified_sample_exact(docs, 0)


def test_weighted_sample_matches_python_oracle(spark):
    """Keys are deterministic md5 math — recompute them in python and
    assert the exact same k rows are chosen."""
    import hashlib
    import math

    from named_architecture_entity_recognition_spark.operators.corpus import (
        weighted_sample,
    )

    rows = [(f"d{i:04d}", (i % 17) + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id string, w int")
    k = 25
    got = {r.doc_id for r in weighted_sample(df, k, "w").collect()}

    def key(doc_id, w):
        v = int(hashlib.md5(f"wsample-v1{doc_id}".encode()).hexdigest()[:8], 16)
        return -math.log((v + 1.0) / 16**8) / w

    exp = {
        d for d, _ in sorted(rows, key=lambda r: (key(*r), r[0]))[:k]
    }
    assert got == exp
    # deterministic under repartition
    again = {r.doc_id for r in weighted_sample(df.repartition(9), k, "w").collect()}
    assert again == got


def test_weighted_sample_favors_heavy_and_filters_bad_weights(spark):
    import pytest as _pytest

    from named_architecture_entity_recognition_spark.operators.corpus import (
        weighted_sample,
    )

    rows = [(f"h{i:03d}", 1000.0) for i in range(50)] + [
        (f"l{i:03d}", 1.0) for i in range(50)
    ]
    rows += [("z1", 0.0), ("z2", None)]  # never selectable
    df = spark.createDataFrame(rows, "doc_id string, w double")
    got = [r.doc_id for r in weighted_sample(df, 20, "w").collect()]
    assert len(got) == 20 and "z1" not in got and "z2" not in got
    heavy = sum(1 for d in got if d.startswith("h"))
    assert heavy >= 17  # weight ratio 1000:1 -> sample almost all heavy
    with _pytest.raises(ValueError, match="k must be"):
        weighted_sample(df, 0, "w")
