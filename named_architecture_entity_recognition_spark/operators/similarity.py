"""Embedding similarity search over (vec_id, embedding array<float>).

Brute-force cosine top-k as the exact baseline, and an LSH-bucketed
variant (random-hyperplane signs) as the scale path: at 10^12 rows the
brute-force quadratic join is confined to LSH buckets, turning ANN into
an equi-join + per-bucket top-k.

All math is built-in higher-order functions over double — no UDFs —
so plans are codegen'd and a DuckDB oracle (list_cosine_similarity)
matches to float tolerance.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def _norm(a) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, x: acc + x * x)
    )


def cosine(a, b) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def _as_double(df: DataFrame, col: str) -> DataFrame:
    return df.withColumn(col, F.col(col).cast("array<double>"))


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k: for each query row, the k nearest corpus rows.

    queries: (query_id, embedding). Broadcast the (small) query side;
    the corpus streams through one codegen'd stage — no shuffle except
    the final per-query top-k window over k*|queries| rows.
    """
    corpus = _as_double(embeddings.select(id_col, vec_col), vec_col)
    qs = _as_double(queries, "embedding").select(
        F.col("query_id"), F.col("embedding").alias("q_emb")
    )
    scored = corpus.crossJoin(F.broadcast(qs)).select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine(F.col(vec_col), F.col("q_emb")), 6).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def hyperplane_bucket(vec_col, n_planes: int = 8, seed: int = 42) -> Column:
    """Random-hyperplane LSH bucket: sign pattern of <v, h_i> as a
    bit-string. Hyperplanes are deterministic pseudo-random from
    md5(seed, plane, dim) — reproducible across engines and runs."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    dim = F.size(v)
    # h_i[d] = (md5-derived uniform in [-1,1])
    def plane_dot(p):
        return F.aggregate(
            F.zip_with(
                v,
                F.sequence(F.lit(0), dim - 1),
                lambda x, d: x
                * (
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat_ws(
                                    ":", F.lit(seed), p.cast("string"), d.cast("string")
                                )
                            ),
                            1,
                            8,
                        ),
                        16,
                        10,
                    ).cast("double")
                    / F.lit(2147483648.0)
                    - 1.0
                ),
            ),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        )

    bits = F.transform(
        F.sequence(F.lit(0), F.lit(n_planes - 1)),
        lambda p: (plane_dot(p) >= 0).cast("int"),
    )
    return F.concat_ws("", bits)


def cosine_topk_lsh(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket (equi-join on bucket), then exact cosine + per-query top-k.
    Recall is tunable via n_planes/multi-probe; this is the shape that
    survives 10^12 rows (bucket join instead of cross join)."""
    corpus = _as_double(embeddings.select(id_col, vec_col), vec_col).withColumn(
        "bucket", hyperplane_bucket(vec_col, n_planes)
    )
    qs = (
        _as_double(queries, "embedding")
        .select("query_id", F.col("embedding").alias("q_emb"))
        .withColumn("bucket", hyperplane_bucket("q_emb", n_planes))
    )
    scored = corpus.join(F.broadcast(qs), "bucket").select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine(F.col(vec_col), F.col("q_emb")), 6).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )
