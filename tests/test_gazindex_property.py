"""Property test for the inverted-index candidate generation: for ANY
gazetteer and line, every entry that would produce a surface match must
appear in GazIndex.candidates() — the index may over-approximate but
never under-approximate (else mentions are silently lost).

Pure-Python (no Spark session), so hypothesis can run many examples.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from named_architecture_entity_recognition_spark.operators.matching import (
    GazIndex,
    LineView,
    MatcherConfig,
    _surface_matches,
    compile_gazetteer,
)

CFG = MatcherConfig()

name_part = st.sampled_from(
    ["Alpha", "BBB", "WebRTC", "Hub", "Provider", "FSESL", "client",
     "logic", "pro14", "Data", "Store", "X9"]
)
name_strategy = st.builds(
    lambda parts, sep: sep.join(parts),
    st.lists(name_part, min_size=1, max_size=3),
    st.sampled_from([" ", "-", ""]),
)

word = st.sampled_from(
    ["the", "Alpha", "BBBHub", "bbb-hub", "WebRTC", "web", "rtc",
     "AlphaProvider", "alphaprovider", "fsels", "FSESL", "client",
     "Provider", "pro14", "DataStore", "datastores", "X9", "connects",
     "to", "It", "processes", "requests", "provider's", "A.B",
     "BigBlueButton", "Alpha Provider", "re-encoding"]
)
line_strategy = st.builds(
    lambda ws: " ".join(ws) + ".",
    st.lists(word, min_size=1, max_size=12),
)


@settings(max_examples=300, deadline=None)
@given(
    names=st.lists(name_strategy, min_size=1, max_size=12, unique=True),
    line=line_strategy,
)
def test_candidates_never_drop_a_matching_entry(names, line):
    gaz = compile_gazetteer(names, CFG)
    assert isinstance(gaz, GazIndex)
    lv = LineView(line)
    cand_ids = {id(e) for e in gaz.candidates(lv, CFG)}
    for entry in gaz:
        if _surface_matches(lv, entry, CFG):
            assert id(entry) in cand_ids, (
                f"entry {entry.name!r} matches line {line!r} "
                f"but was not generated as a candidate"
            )


cfg_strategy = st.builds(
    MatcherConfig,
    fuzzy_threshold=st.sampled_from([0.80, 0.87, 0.90, 0.95]),
    stem_min_prefix=st.sampled_from([5, 7]),
    max_window=st.sampled_from([3, 4]),
    enable_fuzzy=st.booleans(),
    enable_stem=st.booleans(),
)


@settings(max_examples=150, deadline=None)
@given(
    names=st.lists(name_strategy, min_size=1, max_size=8, unique=True),
    line=line_strategy,
    cfg=cfg_strategy,
)
def test_candidates_never_drop_under_any_config(names, line, cfg):
    """Same no-under-approximation invariant at NON-default configs
    (lower fuzzy threshold, stems toggled) — the index posting lists
    must stay complete for whatever cfg they were compiled with."""
    gaz = compile_gazetteer(names, cfg)
    lv = LineView(line)
    cand_ids = {id(e) for e in gaz.candidates(lv, cfg)}
    for entry in gaz:
        if _surface_matches(lv, entry, cfg):
            assert id(entry) in cand_ids, (
                f"entry {entry.name!r} matches line {line!r} under "
                f"{cfg} but was not generated as a candidate"
            )


@settings(max_examples=50, deadline=None)
@given(
    names=st.lists(name_strategy, min_size=1, max_size=8, unique=True),
    line=line_strategy,
    cfg=cfg_strategy,
)
def test_detect_doc_recompiles_on_cfg_mismatch(names, line, cfg):
    """detect_doc called with a cfg differing from the index's
    compile-time cfg must behave as if the index were compiled with the
    runtime cfg (it recompiles internally — ADVICE r1)."""
    from named_architecture_entity_recognition_spark.operators.matching import (
        detect_doc,
    )

    default_gaz = compile_gazetteer(names, CFG)
    fresh_gaz = compile_gazetteer(names, cfg)
    got = detect_doc([line], default_gaz, cfg)
    want = detect_doc([line], fresh_gaz, cfg)
    assert got == want


@settings(max_examples=100, deadline=None)
@given(
    names=st.lists(name_strategy, min_size=1, max_size=8, unique=True),
    line=line_strategy,
)
def test_candidates_deterministic_and_ordered(names, line):
    gaz = compile_gazetteer(names, CFG)
    lv = LineView(line)
    c1 = [e.name for e in gaz.candidates(lv, CFG)]
    c2 = [e.name for e in gaz.candidates(LineView(line), CFG)]
    assert c1 == c2
    order = {e.name: i for i, e in enumerate(gaz)}
    assert c1 == sorted(c1, key=order.__getitem__)


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=120, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_categories=("Cs",)
            ),
            max_size=120,
        ),
        max_size=12,
    )
)
def test_detect_doc_never_crashes_and_emits_valid_rows(lines):
    """Fuzz the cold path with arbitrary unicode lines (control chars,
    emoji, RTL, empties): detect_doc must never raise, and every
    emitted mention must reference a real 1-indexed line, a gazetteer
    name, and a valid ref type."""
    from named_architecture_entity_recognition_spark.operators.matching import (
        MatcherConfig,
        compile_gazetteer,
        detect_doc,
    )

    cfg = MatcherConfig()
    names = ["QuantumRouter", "Aurora Client", "KYBER", "Storage"]
    gaz = compile_gazetteer(names, cfg)
    mentions, aliases = detect_doc(lines, gaz, cfg)
    for sent_no, name, ref, rule in mentions:
        assert 1 <= sent_no <= len(lines)
        assert name in names
        assert ref in ("DIRECT", "INDIRECT")
        assert isinstance(rule, str) and rule
    for acro, (name, _rx) in aliases.items():
        assert name in names and acro
