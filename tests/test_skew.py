"""Salted join / two-phase aggregation for hot keys."""

import pytest
from pyspark.sql import functions as F

from named_architecture_entity_recognition_spark.operators.skew import (
    replicate_small_side,
    salted_count,
    salted_join,
    with_salt,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # 'hot' carries 90% of rows
    rows = [("hot", i) for i in range(900)] + [
        (f"k{i % 50}", i) for i in range(100)
    ]
    return spark.createDataFrame(rows, "key string, v int")


def test_salt_is_deterministic_and_spread(spark, skewed):
    a = with_salt(skewed, 8).collect()
    b = with_salt(skewed.repartition(13), 8).collect()
    assert {(r.key, r.v, r.salt) for r in a} == {(r.key, r.v, r.salt) for r in b}
    hot_salts = {r.salt for r in a if r.key == "hot"}
    assert len(hot_salts) == 8  # hot key spread over all salt buckets


def test_salted_join_matches_plain_join(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "H"), ("k1", "A"), ("k2", "B")], "key string, label string"
    )
    plain = skewed.join(dim, "key").select("key", "v", "label")
    salted = salted_join(skewed, dim, ["key"], n_salts=4).select(
        "key", "v", "label"
    )
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_replicate_small_side(spark):
    dim = spark.createDataFrame([("a",), ("b",)], "key string")
    out = replicate_small_side(dim, 3)
    assert out.count() == 6
    assert {r.salt for r in out.collect()} == {0, 1, 2}


def test_salted_count_matches_plain(spark, skewed):
    plain = {
        r.key: r["count"]
        for r in skewed.groupBy("key").count().collect()
    }
    salted = {r.key: r.n for r in salted_count(skewed, ["key"], 8).collect()}
    assert salted == plain
