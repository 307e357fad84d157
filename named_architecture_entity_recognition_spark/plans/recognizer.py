"""Public API facade with the reference's shape.

Reference surface (recognizer/NamedEntityRecognizer.java:57-151):

    recognizer = new NamedEntityRecognizer.Builder()
        .chatModel(model).prompt(prompt).build();
    Set<NamedEntity> out = recognizer.recognize(sad);                 // E1
    Set<NamedEntity> out = recognizer.recognize(sad, possibleEntities); // E2

Our equivalent: the detector is the pluggable stage (the reference's
Prompt/ChatModel pair). The default is the deterministic gazetteer
scorer; an LLM-backed detector slots in by emitting answer blobs in the
reference's JSON/structured-text formats and routing them through
``parsers.answers`` (same contract the reference's prompts define).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from named_architecture_entity_recognition_spark.operators.matching import (
    MatcherConfig,
)
from named_architecture_entity_recognition_spark.plans.pipeline import (
    RecognizerPipeline,
)


@dataclass
class NamedEntityRecognizer:
    """recognize(docs[, possible_entities]) -> entities DataFrame."""

    cfg: MatcherConfig = field(default_factory=MatcherConfig)
    validate: bool = True
    default_gazetteer: object = ()

    class Builder:
        def __init__(self):
            self._cfg = MatcherConfig()
            self._validate = True
            self._gazetteer = ()

        def matcher_config(self, cfg: MatcherConfig):
            self._cfg = cfg
            return self

        def validate_format(self, v: bool):
            self._validate = v
            return self

        def gazetteer(self, names):
            self._gazetteer = names
            return self

        def build(self) -> "NamedEntityRecognizer":
            return NamedEntityRecognizer(
                cfg=self._cfg,
                validate=self._validate,
                default_gazetteer=self._gazetteer,
            )

    def recognize(
        self, docs: DataFrame, possible_entities=None
    ) -> DataFrame:
        """E1/E2: documents -> entities. ``possible_entities`` is the
        gazetteer (one list, or {doc_id: names}); when omitted, the
        recognizer falls back to the builder's default dictionary
        (the reference without a gazetteer relies on the LLM's open
        vocabulary — our deterministic engine is dictionary-scoped by
        design, so an empty dictionary yields no mentions)."""
        gaz = possible_entities if possible_entities is not None else self.default_gazetteer
        pipe = RecognizerPipeline(gaz, cfg=self.cfg, validate=self.validate)
        return pipe.entities(docs)

    def recognize_triples(self, docs: DataFrame, possible_entities=None) -> DataFrame:
        gaz = possible_entities if possible_entities is not None else self.default_gazetteer
        pipe = RecognizerPipeline(gaz, cfg=self.cfg, validate=self.validate)
        return pipe.triples(docs)
