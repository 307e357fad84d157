"""Adversarial held-out suite (VERDICT r3 #7): distractor gazetteers
(shared substrings + acronym collisions), pronoun chains with entity
switches, and INTERFACE/CLASS-typed gold — the dimensions the r3
held-out suite did not pressure. Floors match that suite (0.9/0.9):
held-out means no tuning against this data. The suite already forced
one real generality fix: the opinion/comparative generic-framing guard
now applies to EVERY surface rule, not just R_EXACT (a suppressed
mention used to come back as an R_NORM window hit).
"""

from named_architecture_entity_recognition_spark.operators.matching import (
    MatcherConfig,
    compile_gazetteer,
    detect_mentions,
)
from named_architecture_entity_recognition_spark.synth import (
    synth_holdout_adversarial,
)

P_FLOOR = 0.9
R_FLOOR = 0.9
N_DOCS = 16


def _score(doc_range, seed=13):
    cfg = MatcherConfig()
    tp = fp = fn = 0
    misses = []
    for d in doc_range:
        lines, gaz_map, gold, _ = synth_holdout_adversarial(d, seed=seed)
        names = [n for v in gaz_map.values() for n in v]
        mentions = detect_mentions(lines, compile_gazetteer(names, cfg), cfg)
        rec = {(n.lower(), s) for s, n, _, _ in mentions}
        tp += len(rec & gold)
        fp += len(rec - gold)
        fn += len(gold - rec)
        misses += [
            (d, k, lines[k[1] - 1])
            for k in sorted((rec - gold) | (gold - rec))
        ]
    p = tp / (tp + fp) if tp + fp else 0.0
    r = tp / (tp + fn) if tp + fn else 0.0
    return p, r, misses


def test_adversarial_floor():
    p, r, misses = _score(range(N_DOCS))
    assert p >= P_FLOOR, (p, misses)
    assert r >= R_FLOOR, (r, misses)


def test_adversarial_second_seed():
    p, r, misses = _score(range(N_DOCS), seed=47)
    assert p >= P_FLOOR, (p, misses)
    assert r >= R_FLOOR, (r, misses)


def test_distractor_pairs_never_cross_fire():
    """Hard invariant (stronger than the floor): a mention of one side
    of a substring-distractor pair must never be attributed to the
    other side, in any document."""
    cfg = MatcherConfig()
    pairs = [
        ("zenith gateway", "zenith gate"),
        ("comet archiver", "comet archive"),
    ]
    for d in range(N_DOCS):
        lines, gaz_map, gold, _ = synth_holdout_adversarial(d)
        names = [n for v in gaz_map.values() for n in v]
        mentions = detect_mentions(lines, compile_gazetteer(names, cfg), cfg)
        rec = {(n.lower(), s) for s, n, _, _ in mentions}
        for a, b in pairs:
            for name, twin in ((a, b), (b, a)):
                for sent in {s for n, s in gold if n == name}:
                    assert (twin, sent) not in rec or (
                        (twin, sent) in gold
                    ), (d, name, twin, sent, lines[sent - 1])


def test_acronym_collision_binds_defined_entity():
    """OCS initials both 'Orion Cache Service' and 'Orion Compute
    Service'; only Cache is DEFINED ('... Service OCS caches ...'), so
    a bare OCS use must bind Cache and never Compute."""
    cfg = MatcherConfig()
    for d in range(N_DOCS):
        lines, gaz_map, gold, _ = synth_holdout_adversarial(d)
        names = [n for v in gaz_map.values() for n in v]
        mentions = detect_mentions(lines, compile_gazetteer(names, cfg), cfg)
        ocs_lines = [
            i + 1
            for i, ln in enumerate(lines)
            if ln.startswith("The OCS ")
        ]
        rec = {(n.lower(), s) for s, n, _, _ in mentions}
        for s in ocs_lines:
            assert ("orion cache service", s) in rec, (d, s, lines[s - 1])
            assert ("orion compute service", s) not in rec, (d, s)


def test_adversarial_through_typed_pipeline(spark):
    """Full Spark pipeline with the TYPED dictionary: floors hold and
    every emitted entity carries the dictionary's type (the reference
    enum dimension, model/NamedEntityType.java:8) — via BOTH dictionary
    transports (typed closure map and the joined (doc_id, name,
    entity_type) table)."""
    from named_architecture_entity_recognition_spark.operators.mentions import (
        detect_entities_df,
        detect_entities_df_joined,
    )
    from named_architecture_entity_recognition_spark.schema import DOCUMENTS
    from named_architecture_entity_recognition_spark.sources.sad import doc_row

    rows, gold_all, type_of = [], {}, {}
    gaz_map = None
    for d in range(3):
        lines, gaz_map, gold, types = synth_holdout_adversarial(d)
        doc = f"adv{d}"
        rows.append(doc_row(doc, lines, media_every=5))
        gold_all[doc] = gold
        type_of.update(types)
    docs = spark.createDataFrame(rows, DOCUMENTS)

    gaz_rows = [
        (f"adv{d}", n, t)
        for d in range(3)
        for t, names in gaz_map.items()
        for n in names
    ]
    gaz_df = spark.createDataFrame(
        gaz_rows, "doc_id string, name string, entity_type string"
    )

    for label, entities in (
        ("closure", detect_entities_df(docs, gaz_map)),
        ("joined", detect_entities_df_joined(docs, gaz_df)),
    ):
        got = entities.collect()
        # type dimension: every entity typed per the dictionary
        for r in got:
            assert r.entity_type == type_of[r.name.lower()], (label, r)
        # occurrence-level floors per doc
        for doc, gold in gold_all.items():
            rec = {
                (r.name.lower(), o.sent_no)
                for r in got
                if r.doc_id == doc
                for o in r.occurrences
            }
            tp = len(rec & gold)
            p = tp / len(rec) if rec else 0.0
            r_ = tp / len(gold) if gold else 1.0
            assert p >= P_FLOOR, (label, doc, p, sorted(rec - gold))
            assert r_ >= R_FLOOR, (label, doc, r_, sorted(gold - rec))
        # INTERFACE/CLASS entities actually present (the dimension is
        # exercised, not vacuously true)
        types_seen = {r.entity_type for r in got}
        assert {"COMPONENT", "INTERFACE", "CLASS"} <= types_seen, (
            label,
            types_seen,
        )
