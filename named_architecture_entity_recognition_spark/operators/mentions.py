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

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        compiled: dict = {}

        def gaz_for(doc_id):
            names = gaz_map.get(doc_id, default_names) if gaz_map else default_names
            if names not in compiled:
                compiled[names] = compile_gazetteer(list(names), cfg)
            return compiled[names]

        for pdf in batches:
            out = {
                "doc_id": [],
                "record": [],
                "name": [],
                "sent_no": [],
                "ref_type": [],
                "rule": [],
                "alias": [],
            }
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                gaz = gaz_for(doc_id)
                lines = [s["text"] for s in spans if s["kind"] == "text"]
                if validate_format:
                    # F1 validation in the SAME pass (no extra doc scan):
                    # reference fails the doc; we quarantine + count
                    n_bad = sum(1 for ln in lines if not _line_is_valid(ln))
                    if n_bad:
                        out["doc_id"].append(doc_id)
                        out["record"].append("quarantined")
                        out["name"].append("")
                        out["sent_no"].append(n_bad)
                        out["ref_type"].append(None)
                        out["rule"].append("F1")
                        out["alias"].append(None)
                        continue
                for sent_no, name, ref, rule in detect_mentions(lines, gaz, cfg):
                    out["doc_id"].append(doc_id)
                    out["record"].append("mention")
                    out["name"].append(name)
                    out["sent_no"].append(sent_no)
                    out["ref_type"].append(ref)
                    out["rule"].append(rule)
                    out["alias"].append(None)
                if cfg.enable_alias_induction:
                    for acro, (name, _rx) in induce_aliases(lines, gaz, cfg).items():
                        out["doc_id"].append(doc_id)
                        out["record"].append("alias")
                        out["name"].append(name)
                        out["sent_no"].append(None)
                        out["ref_type"].append(None)
                        out["rule"].append("R_ALIAS")
                        out["alias"].append(acro)
            yield pd.DataFrame(out)

    return docs.mapInPandas(process, schema=MENTIONS)
