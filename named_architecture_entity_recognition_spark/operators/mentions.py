"""Distributed mention detection: mapInPandas over whole documents.

Anaphora (pronoun/head-noun rules) is doc-sequential state, so the unit
of parallelism is the document, not the sentence. Each Arrow batch of
document rows is processed in one Python call; the compiled gazetteer
rides along as a broadcast-like closure constant (it is small — the
reference's dictionaries are component lists; at 10^5+ entries the same
closure is still fine because compile happens once per executor via
lazy module-level cache).

No shuffle: documents in -> mention rows out, partition-preserving.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from named_architecture_entity_recognition_spark.operators.matching import (
    MatcherConfig,
    compile_gazetteer,
    detect_mentions,
    induce_aliases,
)
from named_architecture_entity_recognition_spark.schema import MENTIONS


def _line_is_valid(ln) -> bool:
    """Reference one-sentence-per-line invariant (F1): trimmed line is
    non-empty and ends with a sentence terminator
    (model/SoftwareArchitectureDocumentation.java:76-95)."""
    if ln is None:
        return False
    t = ln.strip()
    return bool(t) and t[-1] in ".!?"


def detect_mentions_df(
    docs: DataFrame,
    gazetteer_names,
    cfg: MatcherConfig | None = None,
    validate_format: bool = False,
) -> DataFrame:
    """documents(doc_id, spans) -> mentions rows (see schema.MENTIONS).

    ``gazetteer_names`` is either one corpus-wide name list, or a dict
    ``{doc_id: [names]}`` for per-document dictionaries (the reference
    evaluates each project against its own component list). The mapping
    rides in the task closure — broadcast semantics; dictionaries are
    compiled once per distinct name list per task.

    Emits 'mention' records (doc_id, name, sent_no, ref_type, rule) and
    'alias' records for doc-induced acronym aliases (KMS -> Kurento),
    which later join into the entities' alternative_names.
    """
    cfg = cfg or MatcherConfig()
    if isinstance(gazetteer_names, dict):
        gaz_map = {k: tuple(v) for k, v in gazetteer_names.items()}
        default_names: tuple = ()
    else:
        gaz_map = {}
        default_names = tuple(gazetteer_names)

    def process(batches):
        import pyarrow as pa

        compiled: dict = {}

        def gaz_for(doc_id):
            names = gaz_map.get(doc_id, default_names) if gaz_map else default_names
            if names not in compiled:
                compiled[names] = compile_gazetteer(list(names), cfg)
            return compiled[names]

        out_schema = pa.schema(
            [
                ("doc_id", pa.string()),
                ("record", pa.string()),
                ("name", pa.string()),
                ("sent_no", pa.int32()),
                ("ref_type", pa.string()),
                ("rule", pa.string()),
                ("alias", pa.string()),
            ]
        )
        for batch in batches:
            # columnar extraction: flatten the list<struct> ONCE per
            # batch instead of materializing a python dict per span
            # (the pandas path measurably throttled memory bandwidth
            # at high core counts)
            doc_ids = batch.column("doc_id").to_pylist()
            spans = batch.column("spans")
            if isinstance(spans, pa.ChunkedArray):
                spans = spans.combine_chunks()
            offsets = spans.offsets.to_pylist()
            structs = spans.values
            kinds = structs.field("kind").to_pylist()
            texts = structs.field("text").to_pylist()
            cols = {k: [] for k in (
                "doc_id", "record", "name", "sent_no", "ref_type", "rule", "alias"
            )}

            def emit(doc_id, record, name, sent_no, ref_type, rule, alias):
                cols["doc_id"].append(doc_id)
                cols["record"].append(record)
                cols["name"].append(name)
                cols["sent_no"].append(sent_no)
                cols["ref_type"].append(ref_type)
                cols["rule"].append(rule)
                cols["alias"].append(alias)

            for r, doc_id in enumerate(doc_ids):
                lo, hi = offsets[r], offsets[r + 1]
                lines = [texts[k] for k in range(lo, hi) if kinds[k] == "text"]
                if validate_format:
                    # F1 validation in the SAME pass (no extra doc scan):
                    # reference fails the doc; we quarantine + count
                    n_bad = sum(1 for ln in lines if not _line_is_valid(ln))
                    if n_bad:
                        emit(doc_id, "quarantined", "", n_bad, None, "F1", None)
                        continue
                gaz = gaz_for(doc_id)
                for sent_no, name, ref, rule in detect_mentions(lines, gaz, cfg):
                    emit(doc_id, "mention", name, sent_no, ref, rule, None)
                if cfg.enable_alias_induction:
                    for acro, (name, _rx) in induce_aliases(lines, gaz, cfg).items():
                        emit(doc_id, "alias", name, None, None, "R_ALIAS", acro)
            yield pa.RecordBatch.from_pydict(cols, schema=out_schema)

    return docs.mapInArrow(process, schema=MENTIONS)
