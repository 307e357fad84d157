"""Multimodal span processing: media spans as opaque binary/URI columns
with typed metadata, decoded/feature-extracted via Arrow-batched
mapInPandas.

The container has no image/audio libraries, so the decode step is a
clearly-marked stub: ``decode='fake'`` produces deterministic synthetic
features (so the Spark-side plumbing — schema, batching, partitioning —
is fully real and testable), while ``decode='real'`` raises
NotImplementedError at the exact point a Pillow/ffmpeg call would go.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_FEATURES = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("media_ref", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("offset", IntegerType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("embedding", ArrayType(FloatType()), True),
    ]
)


def media_spans(docs: DataFrame) -> DataFrame:
    """Extract media spans (narrow): (doc_id, kind, media_ref, offset)."""
    return docs.select(
        "doc_id",
        F.explode(F.filter("spans", lambda s: s["kind"] != F.lit("text"))).alias("m"),
    ).select(
        "doc_id",
        F.col("m.kind").alias("kind"),
        F.col("m.media_ref").alias("media_ref"),
        F.col("m.offset").alias("offset"),
    )


def _fake_decode(media_ref: str, dim: int):
    """Deterministic stand-in for image decode + embedding: features are
    a pure function of the media_ref bytes."""
    h = hashlib.sha256(media_ref.encode()).digest()
    rng = np.random.RandomState(int.from_bytes(h[:4], "big"))
    width = 64 + int.from_bytes(h[4:6], "big") % 1984
    height = 64 + int.from_bytes(h[6:8], "big") % 1984
    vec = rng.standard_normal(dim).astype(np.float32)
    vec /= np.linalg.norm(vec)
    return width, height, [float(x) for x in vec]


def extract_media_features(
    docs: DataFrame, dim: int = 16, decode: str = "fake"
) -> DataFrame:
    """Media spans -> (dims, embedding) via Arrow-batched mapInPandas.

    decode='real' is the integration point for actual decoders (PIL /
    torchvision / ffmpeg) — unavailable in this container, hence:
    """
    spans = media_spans(docs)

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg, not present in "
                    "this container; wire the decoder here"
                )
            out = {
                "doc_id": pdf["doc_id"],
                "media_ref": pdf["media_ref"],
                "kind": pdf["kind"],
                "offset": pdf["offset"],
                "width": [],
                "height": [],
                "embedding": [],
            }
            for ref in pdf["media_ref"]:
                w, h, v = _fake_decode(ref, dim)
                out["width"].append(w)
                out["height"].append(h)
                out["embedding"].append(v)
            yield pd.DataFrame(out)

    return spans.mapInPandas(process, schema=MEDIA_FEATURES)
