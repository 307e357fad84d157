"""SAD ingestion: one-sentence-per-line text -> interleaved documents rows.

Reference: model/SoftwareArchitectureDocumentation.java:32-71 reads a
file (or splits a string on any line break) into 1-indexed lines. Our
documents shape interleaves optional media spans; the text-span ordinal
(not the raw offset) is the sentence number, so inserting media spans
never perturbs sentence numbering.
"""

from __future__ import annotations

import re
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from named_architecture_entity_recognition_spark.schema import DOCUMENTS

_LINEBREAK = re.compile(r"\r\n|\r|\n|\v|\f|\x85| | ")  # Java \R


def split_sentences(text: str) -> list[str]:
    """Split on any line break, Java ``\\R`` semantics (reference :68)."""
    return _LINEBREAK.split(text)


def doc_row(doc_id: str, sentences: list[str], media_every: int = 0) -> dict:
    """Build one documents row; optionally interleave media spans
    deterministically every ``media_every`` sentences."""
    spans = []
    offset = 1
    for i, s in enumerate(sentences, 1):
        if media_every and i % media_every == 0:
            spans.append(
                {
                    "kind": "image",
                    "text": "",
                    "media_ref": f"media://{doc_id}/{offset}",
                    "offset": offset,
                }
            )
            offset += 1
        spans.append({"kind": "text", "text": s, "media_ref": "", "offset": offset})
        offset += 1
    return {"doc_id": doc_id, "spans": spans}


def read_sad_files(
    spark: SparkSession, paths: list, media_every: int = 3
) -> DataFrame:
    """Read one-sentence-per-line SAD files into a documents DataFrame.

    Driver-side file listing, executor-friendly shape: at real scale
    documents arrive as an Iceberg/parquet table already in this shape;
    this reader exists for the benchmark fixtures (reference S1 scan).
    """
    rows = []
    for p in paths:
        p = Path(p)
        sentences = [ln for ln in p.read_text().splitlines()]
        rows.append(doc_row(p.stem, sentences, media_every=media_every))
    return spark.createDataFrame(rows, schema=DOCUMENTS)


def discover_projects(root) -> dict:
    """S8 directory discovery (reference TestProjectEvaluator.java:150-178
    + GoldstandardParser.java:311-324): find, per project directory,
    the 1-sent-per-line SAD, the NER gold CSV, and the gazetteer CSV.

    Returns {project: {"sad": Path, "gold": Path, "gazetteer": Path}}.
    Driver-side (catalog listing), like the reference.
    """
    out = {}
    root = Path(root)
    for d in sorted(p for p in root.iterdir() if p.is_dir()):
        try:
            text_dir = next(
                p for p in d.iterdir() if p.is_dir() and "text_" in p.name
            )
            sad = next(
                p for p in text_dir.iterdir()
                if p.name.endswith("_1SentPerLine.txt")
            )
            gold = next(
                p for p in (d / "goldstandards").iterdir()
                if "goldstandard_NER.csv" in p.name
            )
            model_dir = next(
                p for p in d.iterdir()
                if p.is_dir() and p.name.startswith("model_")
            )
            gaz = model_dir / "uml" / "modelElementID_to_ComponentName.csv"
            if not gaz.exists():
                continue
            out[d.name] = {"sad": sad, "gold": gold, "gazetteer": gaz}
        except (StopIteration, FileNotFoundError):
            continue
    return out


def documents_from_text(
    spark: SparkSession, docs: dict, media_every: int = 0
) -> DataFrame:
    """{doc_id: sad_text} -> documents DataFrame (reference S2 scan)."""
    rows = [
        doc_row(doc_id, split_sentences(text), media_every=media_every)
        for doc_id, text in docs.items()
    ]
    return spark.createDataFrame(rows, schema=DOCUMENTS)
