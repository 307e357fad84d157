"""Deterministic distributed generator for interleaved documents.

Builds the BASELINE.json input_hint table shape at arbitrary scale with
NO driver-side row materialization: ``spark.range(n_docs)`` fans out and
each doc is generated inside ``mapInPandas`` from a RNG seeded by
``(seed, doc index)`` — the corpus is identical regardless of
parallelism/partitioning, which is what makes the N-vs-4N scaling
comparison apples-to-apples.

Knobs mirror FIXTURES.md §7: sentences/doc 12..197 (the benchmark SAD
range), media_ratio, hot-term skew (top gazetteer name appears in
``skew_frac`` of mention-bearing sentences), alias/abbreviation chains
and pronoun sentences to exercise every matcher rule.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from named_architecture_entity_recognition_spark.schema import DOCUMENTS

_FILLER = (
    "the system processes requests quickly and reliably",
    "data flows through the configured channels",
    "messages are routed according to the policy",
    "the deployment uses containers on the cluster",
    "responses are cached for later reuse",
    "users interact with the platform through the api",
    "events are persisted in the durable store",
    "load is balanced across the running instances",
)

_VERBS = ("handles", "stores", "provides", "manages", "coordinates", "renders")


def synth_gazetteer(n: int) -> list:
    """n deterministic component names exercising every surface shape."""
    stems = (
        "Alpha", "Beta", "Gamma", "Delta", "Omega", "Nova", "Zephyr",
        "Quartz", "Onyx", "Krypton", "Vertex", "Flux", "Pylon", "Cobalt",
    )
    kinds = ("Provider", "Manager", "Gateway", "Engine", "Broker", "Hub")
    names = []
    for i in range(n):
        stem = stems[i % len(stems)]
        kind = kinds[(i // len(stems)) % len(kinds)]
        variant = i % 4
        if variant == 0:
            names.append(f"{stem}{kind}{i}")  # CamelCase compound
        elif variant == 1:
            names.append(f"{stem} {kind} {i}")  # multi-word
        elif variant == 2:
            names.append(f"{stem}RTC-{kind[:3].upper()}{i}")  # hyphen+acronym
        else:
            names.append(f"{stem}{i}")
    return names


def _gen_doc(doc_idx: int, seed: int, gaz: list, sentences_lo: int,
             sentences_hi: int, media_ratio: float, skew_frac: float):
    rng = np.random.RandomState((seed * 1_000_003 + doc_idx) % (2**31 - 1))
    n_sent = int(rng.randint(sentences_lo, sentences_hi + 1))
    spans = []
    offset = 1
    for s in range(n_sent):
        r = rng.rand()
        if r < media_ratio:
            spans.append(
                {
                    "kind": "image" if rng.rand() < 0.7 else "diagram",
                    "text": "",
                    "media_ref": f"media://doc{doc_idx}/{offset}",
                    "offset": offset,
                }
            )
            offset += 1
        kind = rng.rand()
        if kind < 0.55:  # mention-bearing sentence
            name = gaz[0] if rng.rand() < skew_frac else gaz[
                int(rng.randint(0, len(gaz)))
            ]
            verb = _VERBS[int(rng.randint(0, len(_VERBS)))]
            other = gaz[int(rng.randint(0, len(gaz)))]
            text = f"The {name} {verb} requests from the {other}."
        elif kind < 0.7:  # pronoun follow-up
            verb = _VERBS[int(rng.randint(0, len(_VERBS)))]
            text = f"It {verb} the incoming data for every session."
        else:
            text = _FILLER[int(rng.randint(0, len(_FILLER)))].capitalize() + "."
        spans.append({"kind": "text", "text": text, "media_ref": "", "offset": offset})
        offset += 1
    return {"doc_id": f"doc{doc_idx:010d}", "spans": spans}


_HOLDOUT_GAZ = [
    "QuantumRouter",          # camel compound
    "Nebula Cache Service",   # multi-word (acronym NCS inducible)
    "Aurora Client",          # multi-word with role-head 'client'
    "StellarUI",              # camel with anaphoric head 'UI'
    "Krakatoa-Ingest",        # hyphenated
    "VortexScheduler",        # camel compound
    "Meridian Broker",        # multi-word
    "PulseEngine",            # camel compound
    "Storage",                # ambiguous common word (case discipline)
    "KYBER",                  # short acronym-like (fuzzy-typo scope)
]

_HOLDOUT_VERBS = (
    "routes", "validates", "persists", "forwards", "aggregates",
    "dispatches", "compresses", "replicates",
)

_HOLDOUT_FILLER = (
    "Every request carries a correlation identifier.",
    "Deployment happens twice a week without downtime.",
    "Metrics are exported to the monitoring stack.",
    "Failures trigger an automatic rollback procedure.",
    "Configuration changes require a review step.",
)


def synth_holdout_sad(doc_idx: int, seed: int = 7):
    """Held-out generalization SAD: gazetteer mentions under paraphrase
    / typo / anaphora transformations with vocabulary DISJOINT from the
    five ArDoCo benchmark texts (guards the matcher against benchmark
    memorization — its rules were tuned on those five gold CSVs).

    Returns (lines, gazetteer_names, gold) where gold is the exact set
    of (lowercase component name, 1-indexed sentence) pairs a correct
    recognizer should emit. Every sentence is generated from a template
    whose match outcome is known by construction, including negative
    templates (opinion framing, comparative 'than', quantity-of mass
    nouns) that must NOT produce occurrences.
    """
    rng = np.random.RandomState((seed * 7_919 + doc_idx) % (2**31 - 1))
    verbs = _HOLDOUT_VERBS

    def verb():
        return verbs[int(rng.randint(0, len(verbs)))]

    sents: list[tuple[str, list[str]]] = []  # (text, gold names)

    def exact(name):
        sents.append((f"The {name} {verb()} incoming requests.", [name]))

    # section 1: introduce each entity with an exact mention; the
    # multi-word service also induces its acronym alias (R_ALIAS)
    exact("QuantumRouter")
    sents.append(
        (
            f"The Nebula Cache Service NCS {verb()} hot records.",
            ["Nebula Cache Service"],
        )
    )
    exact("Aurora Client")
    exact("StellarUI")
    exact("Krakatoa-Ingest")
    exact("VortexScheduler")
    sents.append(
        (
            f"The PulseEngine {verb()} events to the Meridian Broker.",
            ["PulseEngine", "Meridian Broker"],
        )
    )
    sents.append(("The Storage persists all submitted records.", ["Storage"]))
    exact("KYBER")

    # section 2: transformed re-mentions, interleaved with filler and
    # negatives in seeded order
    blocks: list[list[tuple[str, list[str]]]] = []
    # normalized (case/hyphen/space collapsed) variants -> R_NORM
    blocks.append([(f"The quantum router {verb()} the payload.",
                    ["QuantumRouter"])])
    blocks.append([(f"The nebula-cache-service {verb()} every entry.",
                    ["Nebula Cache Service"])])
    blocks.append([(f"The krakatoa ingest {verb()} raw batches.",
                    ["Krakatoa-Ingest"])])
    # induced-acronym usage (definition is in section 1) -> R_ALIAS
    blocks.append([(f"The NCS {verb()} stale entries.",
                    ["Nebula Cache Service"])])
    # adjacent-character transposition, character set unchanged ->
    # R_FUZZY (the rule's designed scope is short acronym-like names,
    # 4-6 normalized chars, mirroring the reference's 0.90 charset-
    # Jaccard threshold; long-name typos are deliberately out of scope)
    blocks.append([(f"The KYBRE {verb()} control frames.", ["KYBER"])])
    # pronoun anaphora: action antecedent then 'It ...' -> R_PRONOUN
    blocks.append([
        (f"The VortexScheduler {verb()} deferred jobs.",
         ["VortexScheduler"]),
        (f"It {verb()} the backlog every minute.", ["VortexScheduler"]),
    ])
    blocks.append([
        (f"The Aurora Client {verb()} the dashboard.", ["Aurora Client"]),
        (f"It {verb()} user gestures locally.", ["Aurora Client"]),
    ])
    # head-noun / camel-head anaphora -> R_HEAD / R_CAMEL_HEAD
    blocks.append([(f"The client {verb()} cached views offline.",
                    ["Aurora Client"])])
    blocks.append([(f"The UI {verb()} the rendered fragments.",
                    ["StellarUI"])])
    # negatives: opinion framing, comparative, mass-noun quantity,
    # lowercase ambiguous word without qualifying evidence
    blocks.append([
        ("We think QuantumRouter is an amazing piece of software.", []),
    ])
    blocks.append([("Tools other than PulseEngine exist.", [])])
    blocks.append([
        ("Each node reserves some amount of storage for caching.", []),
    ])
    order = rng.permutation(len(blocks))
    for bi in order:
        if rng.rand() < 0.5:
            sents.append(
                (_HOLDOUT_FILLER[int(rng.randint(0, len(_HOLDOUT_FILLER)))],
                 [])
            )
        sents.extend(blocks[bi])

    lines = [t for t, _ in sents]
    gold = {
        (n.lower(), i + 1) for i, (_, names) in enumerate(sents)
        for n in names
    }
    return lines, list(_HOLDOUT_GAZ), gold


#: Adversarial held-out gazetteer (VERDICT r3 #7): distractor pairs
#: sharing substrings ("Zenith Gate" / "Zenith Gateway",
#: "Comet Archive" / "Comet Archiver"), an acronym collision
#: ("Orion Cache Service" / "Orion Compute Service" — both OCS), and
#: INTERFACE/CLASS-typed entries exercising the type dimension of the
#: reference enum (model/NamedEntityType.java:8). Vocabulary disjoint
#: from the five benchmark gazetteers (checked against the union of
#: modelElementID_to_ComponentName.csv names).
_ADV_GAZ = {
    "COMPONENT": [
        "Zenith Gateway",
        "Zenith Gate",
        "Comet Archiver",
        "Comet Archive",
        "Orion Cache Service",
        "Orion Compute Service",
    ],
    "INTERFACE": ["Ledger Port", "TelemetryBridge"],
    "CLASS": ["SessionToken", "Chronicle Record"],
}

_ADV_FILLER = (
    "Rollouts proceed one region at a time.",
    "Budgets are reviewed at the end of the quarter.",
    "Incident reviews happen within two days.",
    "The on-call rotation changes every week.",
)


def synth_holdout_adversarial(doc_idx: int, seed: int = 13):
    """Adversarial held-out SAD (VERDICT r3 #7 hardening): distractor
    gazetteers, pronoun chains with entity SWITCHES, and typed gold.

    Returns ``(lines, typed_gaz, gold, type_of)`` where ``typed_gaz``
    is the reference-shaped ``{COMPONENT|INTERFACE|CLASS: [names]}``
    map, ``gold`` the exact (lowercase name, 1-indexed sentence) pairs,
    and ``type_of`` maps lowercase name -> expected entity type. Gold
    is fixed by template semantics (standard linguistic reading), not
    by what the matcher happens to emit."""
    rng = np.random.RandomState((seed * 30_011 + doc_idx) % (2**31 - 1))
    verbs = _HOLDOUT_VERBS

    def verb():
        return verbs[int(rng.randint(0, len(verbs)))]

    sents: list[tuple[str, list[str]]] = []

    # section 1 — introductions (R_EXACT); every name appears once so
    # substring distractors must NOT cross-fire (boundary + subsumption)
    sents.append((f"The Zenith Gateway {verb()} inbound calls.", ["Zenith Gateway"]))
    sents.append((f"The Zenith Gate {verb()} admission tickets.", ["Zenith Gate"]))
    sents.append((f"The Comet Archiver {verb()} closed segments.", ["Comet Archiver"]))
    sents.append((f"The Comet Archive {verb()} weekly snapshots.", ["Comet Archive"]))
    sents.append(
        (
            f"The Orion Cache Service OCS {verb()} hot rows.",
            ["Orion Cache Service"],
        )
    )
    sents.append(
        (
            f"The Orion Compute Service {verb()} batch work.",
            ["Orion Compute Service"],
        )
    )
    sents.append((f"The Ledger Port {verb()} balance queries.", ["Ledger Port"]))
    sents.append((f"The TelemetryBridge {verb()} gauge samples.", ["TelemetryBridge"]))
    sents.append((f"The SessionToken {verb()} the tenant claims.", ["SessionToken"]))
    sents.append(
        (f"The Chronicle Record {verb()} one immutable event.", ["Chronicle Record"])
    )

    blocks: list[list[tuple[str, list[str]]]] = []
    # normalized re-mentions must bind the right side of each
    # substring-distractor pair
    blocks.append(
        [(f"The zenith gateway {verb()} the response.", ["Zenith Gateway"])]
    )
    blocks.append([(f"The zenith gate {verb()} late joins.", ["Zenith Gate"])])
    blocks.append([(f"The comet archive {verb()} old epochs.", ["Comet Archive"])])
    blocks.append(
        [(f"The comet archiver {verb()} the manifest.", ["Comet Archiver"])]
    )
    # the induced acronym binds the DEFINED entity, not its collision
    # twin (both initial to OCS; only Cache was defined in section 1)
    blocks.append([(f"The OCS {verb()} stale rows.", ["Orion Cache Service"])])
    # pronoun chain WITH AN ENTITY SWITCH: each 'It' binds the most
    # recent subject, and the switch must not leak the earlier focus
    blocks.append(
        [
            (f"The Zenith Gateway {verb()} deferred calls.", ["Zenith Gateway"]),
            (f"It {verb()} the retry queue.", ["Zenith Gateway"]),
            (f"The Comet Archiver {verb()} cold segments.", ["Comet Archiver"]),
            (f"It {verb()} the compaction plan.", ["Comet Archiver"]),
        ]
    )
    # two-entity sentence: subject-position antecedent wins the pronoun
    blocks.append(
        [
            (
                f"The TelemetryBridge {verb()} into the Chronicle Record.",
                ["TelemetryBridge", "Chronicle Record"],
            ),
            (f"It {verb()} the write batches.", ["TelemetryBridge"]),
        ]
    )
    # negatives: opinion framing, comparative, quantifier-generic head
    blocks.append(
        [("We consider the Comet Archiver design ideas interesting.", [])]
    )
    blocks.append([("Tools other than the Zenith Gateway exist.", [])])
    blocks.append([("Every tenant gets an archive quota.", [])])
    order = rng.permutation(len(blocks))
    for bi in order:
        if rng.rand() < 0.5:
            sents.append(
                (_ADV_FILLER[int(rng.randint(0, len(_ADV_FILLER)))], [])
            )
        sents.extend(blocks[bi])

    lines = [t for t, _ in sents]
    gold = {
        (n.lower(), i + 1) for i, (_, names) in enumerate(sents) for n in names
    }
    type_of = {
        n.lower(): t for t, names in _ADV_GAZ.items() for n in names
    }
    return lines, {t: list(v) for t, v in _ADV_GAZ.items()}, gold, type_of


def synth_documents(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    gazetteer_size: int = 200,
    sentences_lo: int = 12,
    sentences_hi: int = 197,
    media_ratio: float = 0.2,
    skew_frac: float = 0.3,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic documents table (input_hint shape)."""
    gaz = synth_gazetteer(gazetteer_size)
    base = spark.range(0, n_docs, numPartitions=partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                _gen_doc(
                    int(i), seed, gaz, sentences_lo, sentences_hi,
                    media_ratio, skew_frac,
                )
                for i in pdf["id"]
            ]
            yield pd.DataFrame(rows)

    return base.mapInPandas(gen, schema=DOCUMENTS)
