"""PySpark-native knowledge-graph construction engine.

Re-creates the deterministic semantics of the reference system
(ardoco/named-architecture-entity-recognition, read at /root/reference)
as a distributed Spark pipeline over Iceberg/parquet tables of
interleaved text+media documents:

    documents(doc_id string,
              spans array<struct<kind,text,media_ref,offset>>)
      -> sentence explode -> mention detection (gazetteer scoring)
      -> entity linking -> canonicalization (alias connected components)
      -> occurrence resolution (char-Jaccard argmax) -> DIRECT/INDIRECT
      -> (subj, pred, obj) triples

Everything is DataFrame-declarative; Python logic is confined to
Arrow-vectorized pandas UDFs / applyInPandas (never per-row Python).
"""

__version__ = "0.1.0"
