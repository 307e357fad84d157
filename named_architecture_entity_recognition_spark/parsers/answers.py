"""Answer-payload parsing (reference P1/P2/F4/L3) as Spark operators.

The reference parses LLM answers into entities; our deterministic
engine emits structured rows directly, but the parsing operators remain
first-class so an LLM-backed detector can be slotted back in: the
answer schema IS the reference's contract.

  P1 fromJson  (serialization/NamedEntityParser.java:39-67):
      JSON array [{name, type, alternativeNames[], occurrences[]}]
      -> Catalyst from_json + explode; occurrences are free-text lines
      resolved by J1 (resolve_occurrences) + classified by J2.
  F4 answer windowing (recognizer/JsonOutputPrompt.java:79-86 /
      StructuredTextOutputPrompt.java:107-115): substring between
      '['..']' / BEGIN-OUTPUT..END-OUTPUT markers.
  P2 fromString (serialization/NamedEntityParser.java:78-186): a
      stateful line machine; state is local to one answer blob, so it
      runs inside one Arrow-batched pandas iterator (mapInPandas),
      embarrassingly parallel across answers.
  L3 repair-retry (recognizer/NamedEntityRecognizer.java:61-79):
      strict parse failures fall through to a lenient second pass; rows
      that still fail are quarantined, never job-fatal.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

VALID_TYPES = ("COMPONENT", "INTERFACE", "CLASS")

ENTITY_JSON_SCHEMA = ArrayType(
    StructType(
        [
            StructField("name", StringType()),
            StructField("type", StringType()),
            StructField("alternativeNames", ArrayType(StringType())),
            StructField("occurrences", ArrayType(StringType())),
        ]
    )
)

#: parsed-but-unresolved entity rows; occ_text still needs J1 resolution
PARSED = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("name", StringType(), True),
        StructField("entity_type", StringType(), True),
        StructField("alternative_names", ArrayType(StringType()), True),
        StructField("occ_texts", ArrayType(StringType()), True),
        StructField("error", StringType(), True),
    ]
)


def extract_window_expr(col) -> "F.Column":
    """F4 via regexp (greedy bracket window or BEGIN/END-OUTPUT block)."""
    c = F.col(col) if isinstance(col, str) else col
    json_win = F.regexp_extract(c, r"(?s)(\[.*\])", 1)
    structured = F.regexp_extract(c, r"(?s)BEGIN-OUTPUT\s*(.*?)\s*END-OUTPUT", 1)
    return F.when(F.length(structured) > 0, structured).otherwise(
        F.when(F.length(json_win) > 0, json_win).otherwise(F.lit(None))
    )


def parse_json_answers(answers: DataFrame) -> DataFrame:
    """P1: answers(doc_id, answer) -> PARSED rows (strict, then quarantine).

    Strict-type rule: NamedEntityType.valueOf is strict upper-case; rows
    with unknown types carry an error marker instead of failing the job.
    """
    windowed = answers.select(
        "doc_id", extract_window_expr("answer").alias("payload")
    )
    parsed = windowed.select(
        "doc_id", F.from_json("payload", ENTITY_JSON_SCHEMA).alias("es"),
        "payload",
    )
    ok = (
        parsed.filter(F.col("es").isNotNull())
        .select("doc_id", F.explode("es").alias("e"))
        .select(
            "doc_id",
            F.col("e.name").alias("name"),
            F.col("e.type").alias("entity_type"),
            F.coalesce("e.alternativeNames", F.array().cast("array<string>")).alias(
                "alternative_names"
            ),
            F.coalesce("e.occurrences", F.array().cast("array<string>")).alias(
                "occ_texts"
            ),
        )
        .withColumn(
            "error",
            F.when(
                ~F.col("entity_type").isin(*VALID_TYPES),
                F.concat(F.lit("unknown entity type: "), F.col("entity_type")),
            ),
        )
    )
    failed = parsed.filter(F.col("es").isNull()).select(
        "doc_id",
        F.lit(None).cast("string").alias("name"),
        F.lit(None).cast("string").alias("entity_type"),
        F.lit(None).cast("array<string>").alias("alternative_names"),
        F.lit(None).cast("array<string>").alias("occ_texts"),
        F.lit("unparseable payload").alias("error"),
    )
    return ok.unionByName(failed)


def _parse_structured_text(doc_id: str, payload: str):
    """P2 state machine for ONE answer blob (local state, one value)."""
    entities: dict = {}
    order: list = []
    parsing_alt = False
    current_type = None
    occ_re = re.compile(r"^(.*?),\s*'(.*)'$")
    for raw in re.split(r"\r\n|\r|\n", payload or ""):
        line = raw.strip()
        if not line:
            continue
        if line.endswith("entities recognized:"):
            parsing_alt = False
            type_str = line[: line.index(" entities recognized:")].strip().upper()
            if type_str not in VALID_TYPES:
                return [(doc_id, None, None, None, None, f"unknown entity type: '{type_str}'")]
            current_type = type_str
            continue
        if line.lower() == "alternative names:":
            parsing_alt = True
            continue
        if current_type is None:
            return [(doc_id, None, None, None, None, f"entity type not specified before: '{line}'")]
        if not parsing_alt:
            m = occ_re.match(line)
            if not m:
                return [(doc_id, None, None, None, None, f"invalid occurrence format: '{line}'")]
            name = m.group(1).strip()
            occ_text = m.group(2)
            if name not in entities:
                entities[name] = {"type": current_type, "alts": [], "occs": []}
                order.append(name)
            entities[name]["occs"].append(occ_text)
        else:
            parts = line.split(":")
            if len(parts) != 2:
                return [(doc_id, None, None, None, None, f"invalid alternative names format: '{line}'")]
            name, alts = parts[0].strip(), parts[1].strip()
            if alts.lower() == "none":
                continue
            if name not in entities:
                return [(doc_id, None, None, None, None, f"alternative names for unknown entity: '{name}'")]
            entities[name]["alts"] += [a.strip() for a in alts.split(",")]
    return [
        (
            doc_id,
            name,
            entities[name]["type"],
            sorted(set(entities[name]["alts"])),
            entities[name]["occs"],
            None,
        )
        for name in order
    ]


def parse_structured_answers(answers: DataFrame) -> DataFrame:
    """P2: answers(doc_id, answer) -> PARSED rows via mapInPandas."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "name", "entity_type", "alternative_names", "occ_texts", "error"]
        for pdf in batches:
            rows = []
            for doc_id, answer in zip(pdf["doc_id"], pdf["answer"]):
                m = re.search(r"(?s)BEGIN-OUTPUT\s*(.*?)\s*END-OUTPUT", answer or "")
                payload = m.group(1) if m else (answer or "")
                rows += _parse_structured_text(doc_id, payload)
            yield pd.DataFrame(rows, columns=cols)

    return answers.mapInPandas(process, schema=PARSED)


#: the JSON structure a TwoPartPrompt answer must adhere to
#: (recognizer/TwoPartPrompt.java:89-99, getExpectedOutputFormat)
EXPECTED_JSON_FORMAT = (
    '[\n    {\n        "name": "...",\n        "type": "COMPONENT",\n'
    '        "alternativeNames": [...],\n        "occurrences": [...]\n'
    "    },\n    ...\n]"
)

#: reference error when an answer has no '['..']' window
#: (recognizer/TwoPartPrompt.java:140-141, parseAnswer)
ERR_NO_JSON_ARRAY = "No valid JSON array found."
ERR_INVALID_JSON = "invalid JSON entity array"
ERR_UNKNOWN_TYPE = "unknown entity type in payload"


def build_repair_prompt(answer_col, error_col) -> "F.Column":
    """L3 repair-prompt assembly (recognizer/NamedEntityRecognizer.java:
    65-67): expected output format + the invalid output + the parse
    error, verbatim in the reference's template. Pure Catalyst concat —
    codegen'd, no Python."""
    return F.concat(
        F.lit(
            "The following output is invalid. Reformat it so it precisely "
            "adheres to the following output format:\n"
        ),
        F.lit(EXPECTED_JSON_FORMAT),
        F.lit("\n\nInvalid output to reformat:\n"),
        answer_col,
        F.lit("\nThis error occurred when trying to parse it:\n"),
        error_col,
    )


#: PARSED plus the repair-flow bookkeeping columns
REPAIRED = StructType(
    PARSED.fields
    + [
        StructField("stage", StringType(), False),
        StructField("repair_prompt", StringType(), True),
    ]
)


def repair_parse(answers: DataFrame) -> DataFrame:
    """L2/L3 two-stage parse with repair-retry (recognizer/
    NamedEntityRecognizer.java:57-81).

    Stage 'strict': the answer's '['..']' window parsed as the strict
    JSON entity array (P1). Answers that parse cleanly never pay for
    stage two.

    Stage 'repaired': for answers whose strict parse failed, the repair
    prompt is assembled exactly as the reference does (expected format +
    invalid output + error message) and the deterministic stand-in for
    the repair model re-reads the invalid output as the reference's
    structured-text format (P2 state machine) — the reference's own
    two-part flow converts that same free-form format to JSON
    (TwoPartPrompt.java:119-131), so the P2 grammar IS the repairable
    language.

    Stage 'quarantined': still unparseable; the row carries the error
    and the repair prompt instead of failing the job (the reference
    throws UncheckedIOException at :78 — a 10^12-doc batch job records
    and moves on).

    Plan shape: one scan, two branches over it (Catalyst from_json for
    strict; Arrow-batched mapInPandas confined to the failed residue).
    No shuffle anywhere — every stage is per-row.
    """
    windowed = answers.select(
        "doc_id",
        "answer",
        F.regexp_extract("answer", r"(?s)(\[.*\])", 1).alias("win"),
    ).withColumn(
        "es",
        F.when(
            F.length("win") > 0, F.from_json("win", ENTITY_JSON_SCHEMA)
        ).otherwise(F.lit(None).cast(ENTITY_JSON_SCHEMA)),
    ).withColumn(
        # NamedEntityType.valueOf throws on unknown types, failing the
        # WHOLE answer into the repair path (NamedEntityParser.fromJson
        # is all-or-nothing per answer) — not just the offending row
        "bad_type",
        F.exists(
            "es",
            lambda e: e["type"].isNull() | ~e["type"].isin(*VALID_TYPES),
        ),
    )

    strict_ok = (
        windowed.filter(F.col("es").isNotNull() & ~F.col("bad_type"))
        .select("doc_id", F.explode("es").alias("e"))
        .select(
            "doc_id",
            F.col("e.name").alias("name"),
            F.col("e.type").alias("entity_type"),
            F.coalesce("e.alternativeNames", F.array().cast("array<string>")).alias(
                "alternative_names"
            ),
            F.coalesce("e.occurrences", F.array().cast("array<string>")).alias(
                "occ_texts"
            ),
            F.lit(None).cast("string").alias("error"),
            F.lit("strict").alias("stage"),
            F.lit(None).cast("string").alias("repair_prompt"),
        )
    )

    failed = windowed.filter(
        F.col("es").isNull() | F.col("bad_type")
    ).select(
        "doc_id",
        "answer",
        F.when(F.col("bad_type"), F.lit(ERR_UNKNOWN_TYPE))
        .when(F.length("win") > 0, F.lit(ERR_INVALID_JSON))
        .otherwise(F.lit(ERR_NO_JSON_ARRAY))
        .alias("parse_error"),
    )
    failed = failed.withColumn(
        "repair_prompt", build_repair_prompt(F.col("answer"), F.col("parse_error"))
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in REPAIRED.fields]
        for pdf in batches:
            rows = []
            for doc_id, answer, prompt in zip(
                pdf["doc_id"], pdf["answer"], pdf["repair_prompt"]
            ):
                parsed = _parse_structured_text(doc_id, answer or "")
                if not parsed:
                    parsed = [
                        (doc_id, None, None, None, None, "empty payload")
                    ]
                for r in parsed:
                    stage = "quarantined" if r[5] is not None else "repaired"
                    rows.append(r + (stage, prompt))
            yield pd.DataFrame(rows, columns=cols)

    repaired = failed.mapInPandas(process, schema=REPAIRED)
    return strict_ok.unionByName(repaired)


def resolve_parsed(parsed: DataFrame, sentences: DataFrame) -> DataFrame:
    """PARSED rows -> entities rows: resolve occ_texts by J1 then
    classify by J2, drop unresolved (reference -1 semantics)."""
    from named_architecture_entity_recognition_spark.operators.occurrences import (
        classify_occurrences,
        resolve_occurrences,
    )

    good = parsed.filter(F.col("error").isNull())
    occ = good.select(
        "doc_id",
        "name",
        "entity_type",
        "alternative_names",
        F.posexplode("occ_texts").alias("occ_pos", "occ_text"),
    ).withColumn(
        "occ_id", F.concat_ws("#", "name", F.col("occ_pos").cast("string"))
    )
    resolved = resolve_occurrences(
        occ.select("doc_id", "occ_id", "occ_text"), sentences
    )
    enriched = occ.join(resolved, ["doc_id", "occ_id"])
    classified = classify_occurrences(
        enriched.select(
            "doc_id", "name", "entity_type", "alternative_names", "sent_no"
        ),
        sentences,
    )
    return classified.groupBy("doc_id", "name", "entity_type").agg(
        F.first("alternative_names").alias("alternative_names"),
        F.array_sort(F.collect_set(F.struct("sent_no", "ref_type"))).alias(
            "occurrences"
        ),
    )
