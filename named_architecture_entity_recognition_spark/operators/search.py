"""Full-text search over the corpus: inverted-index build + BM25
ranked retrieval.

The keyword complement to the embedding ANN operators in
``similarity.py`` — together they give the corpus both retrieval
modalities a training-data pipeline needs (lexical recall + semantic
match, e.g. for decontamination lookups or eval-set mining).

Scale shape (the part that matters at 100 TB):

- ``build_index`` is the one heavy job: explode tokens, ONE hash
  aggregate to (term, doc_id, tf, doc_len). Spark's partial map-side
  aggregation collapses duplicate (term, doc) pairs per partition
  before the shuffle, so shuffle volume is O(distinct pairs), not
  O(token occurrences). Corpus stats (N, avgdl) are a second tiny
  single-row aggregate off the same cached tokenized frame. The index
  is written once, partitioned/bucketed by term, and reused by every
  query — at production scale you NEVER re-tokenize per query.
- ``bm25_topk`` touches only the query's own postings: the first
  operation is a **broadcast semi-join of the (tiny) query-term list
  against the postings**, so everything downstream — the df aggregate,
  the per-doc score sum, the top-k — runs on the filtered sliver. The
  per-term document frequencies are a ~|q|-row aggregate broadcast
  back; the final top-k is TakeOrderedAndProject (per-partition heaps
  + driver merge), never a global sort.

Scoring is textbook BM25 (Robertson/Sparck Jones; the +1 idf variant
Lucene uses so idf stays positive):

    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(d, q) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

Everything is pure Catalyst expressions — codegen'd, and reproduced
term-for-term by the DuckDB oracle (q_bm25_topk in __spark_entry__.py).
Scores are rounded to 4 decimals and ties broken by doc_id so the
ranking is engine-portable.

Reference parity: beyond-reference capability (the reference holds one
document in memory and has no retrieval); tokenizer shared with
textstats.tokens so index terms match the rest of the text stack.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import tokens


def build_index(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame]:
    """Build the inverted index.

    Returns ``(postings, stats)``: postings = one row per (term,
    doc_id) with ``tf`` and the doc's token length ``dl``; stats = a
    single row (n_docs, avgdl) over ALL docs (token-less docs count
    toward both). Persist postings bucketed by ``term`` for reuse.
    """
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens(F.col(text_col))).alias("dl"),
        tokens(F.col(text_col)).alias("_toks"),
    )
    postings = (
        tok.select("doc_id", "dl", F.explode("_toks").alias("term"))
        # dl is functionally dependent on doc_id; keeping it in the key
        # costs nothing and saves a join later
        .groupBy("term", "doc_id", "dl")
        .agg(F.count("*").alias("tf"))
    )
    stats = tok.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    return postings, stats


def bm25_topk(
    postings: DataFrame,
    stats: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` docs for ``query_terms`` by BM25: (doc_id, score).

    Duplicate query terms are deduplicated (standard bag-of-words BM25
    scores each distinct term once with its in-document tf).
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    spark = postings.sparkSession
    qdf = spark.createDataFrame(
        [(t,) for t in sorted(set(query_terms))], "term string"
    )
    # broadcast semi-join first: every downstream op sees only the
    # query's postings
    hits = postings.join(F.broadcast(qdf), "term")
    df_by_term = hits.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        hits.join(F.broadcast(df_by_term), "term")
        .join(F.broadcast(stats))
        .withColumn(
            "_idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "_s",
            F.col("_idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.round(F.sum("_s"), 4).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def search_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """One-shot convenience: build the index and query it. For repeated
    queries, call :func:`build_index` once, persist, and reuse."""
    postings, stats = build_index(docs, text_col=text_col, id_col=id_col)
    return bm25_topk(postings, stats, query_terms, k=k, k1=k1, b=b)
