"""Driver-contract guard: entry() runs and has a stable schema; every
queries() entry is callable at sf0.001; oracle_sql() keys line up with
queries() (rows-only exceptions listed explicitly); and (since r3) the
FIRST-50 window composition is pinned — the driver's per-round
correctness run verifies only the first 50 keys, and r2 lost the
flagship's external correctness signal to a silent mid-dict insert."""

import re
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"

#: operators with no SQL-expressible oracle. Empty since r4: the last
#: rows-only entry (q_media_features) became value-oracled when its
#: fake decoder switched to md5-derived features (engine-portable —
#: DuckDB recomputes width/height/embedding components bit-for-bit).
ROWS_ONLY = set()

#: queries that must NEVER leave the driver's 50-query verification
#: window (independent literal copy — editing WINDOW_PINNED in the
#: entry module cannot silently drop a core query without failing here)
WINDOW_REQUIRED = {
    # flagship
    "q_naer_triples", "q_naer_entities",
    # reference-core §2
    "q_gazetteer_link_j4", "q_alias_cc_j3", "q_structured_parse_p2",
    "q_json_parse_p1", "q_repair_parse", "q_answer_window_f4",
    "q_validate_f1", "q_line_projection_f2", "q_reassemble_f3",
    "q_none_filter_f5", "q_clean_name_f6", "q_lowercase_f7",
    "q_change_name_p5", "q_prompt_assembly_p6", "q_charset_key_j1",
    "q_jaccard_pairs_j1", "q_direct_classify_j2", "q_eval_pr_j5",
    "q_eval_pr_complex", "q_group_collect_a1", "q_occurrence_lines_a2",
    "q_dedup_a3", "q_set_ops", "q_argmax_window_a7",
}


def test_entry_runs_with_stable_schema(spark):
    df = entrymod.entry(spark)
    assert df.columns == ["subj", "pred", "obj"]
    assert df.count() >= 0


def test_oracle_keys_match_queries():
    q = set(entrymod.queries())
    o = set(entrymod.oracle_sql())
    assert o <= q, f"oracles without queries: {o - q}"
    assert q - o == ROWS_ONLY, (
        f"unexpected rows-only queries: {(q - o) ^ ROWS_ONLY}"
    )


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_is_lazy_and_well_formed(spark, name):
    """Building the DataFrame (no DELIBERATE execution) must succeed at
    sf0.001 — catches schema drift against the driver tables early.
    Caveat (ADVICE r4): this cannot mechanically detect an eager
    .collect() at build time — every spark.read.parquet runs small
    schema-inference jobs, so job-count deltas don't discriminate; the
    one eager builder that existed (q_audio_decode) was fixed at the
    source (_synth_media_df synthesizes bytes inside mapInPandas).
    Iterative operators (CC/PageRank/IVF seeding) legitimately execute
    during build by design."""
    df = entrymod.queries()[name](spark, SF)
    assert len(df.columns) > 0


def test_window_contains_flagship_and_core():
    keys = list(entrymod.queries())
    window = set(keys[: entrymod.WINDOW_SIZE])
    missing = WINDOW_REQUIRED - window
    assert not missing, (
        f"queries() positions 1-50 lost required queries: {sorted(missing)}"
        " — the driver will not re-verify them this round"
    )
    assert WINDOW_REQUIRED <= set(entrymod.WINDOW_PINNED)


def _last_hash_green_from_artifacts(max_round):
    """Independently recompute each query's last hash-green round from
    the committed CORRECTNESS_r0N.json artifacts (rounds 1..max_round).
    rows-only greens (err == no_oracle) do NOT count — the rotation is
    about value verification."""
    import json

    root = Path(entrymod.__file__).resolve().parent
    last = {}
    for rnd in range(1, max_round + 1):
        path = root / f"CORRECTNESS_r0{rnd}.json"
        for q, v in json.loads(path.read_text()).items():
            if v.get("hash_match"):
                last[q] = rnd
    return last


def test_rotation_table_matches_correctness_artifacts():
    """LAST_HASH_GREEN (the rotation schedule's input) must equal what
    the committed driver artifacts actually record, for every
    non-pinned query — a hand-maintained staleness table that drifts
    from reality fails HERE instead of silently starving a query of
    driver re-verification. Bump WINDOW_AS_OF_ROUND + refresh the table
    when a new CORRECTNESS_r0N.json lands."""
    actual = _last_hash_green_from_artifacts(entrymod.WINDOW_AS_OF_ROUND)
    pinned = set(entrymod.WINDOW_PINNED)
    expected = {
        q: r
        for q, r in actual.items()
        if q not in pinned and q in entrymod.queries()
    }
    assert entrymod.LAST_HASH_GREEN == expected


def test_window_rotation_fills_spare_slots_with_stalest_extras():
    """The spare window slots (after the pinned head) must hold exactly
    the stalest extras: never-hash-green first, then oldest hash-green
    round. Recomputed here without window_order so the ordering logic
    itself is under test."""
    keys = list(entrymod.queries())
    pinned = entrymod.WINDOW_PINNED
    assert keys[: len(pinned)] == pinned
    extras = [k for k in keys if k not in set(pinned)]
    expected = sorted(
        extras, key=lambda k: (entrymod.LAST_HASH_GREEN.get(k, 0), k)
    )
    assert keys[len(pinned):] == expected
    # and the rotation actually reaches the stale tail: every spare
    # slot is at least as stale as anything left outside the window
    spare = keys[len(pinned): entrymod.WINDOW_SIZE]
    outside = keys[entrymod.WINDOW_SIZE:]
    if spare and outside:
        stale = entrymod.LAST_HASH_GREEN.get
        assert max(stale(k, 0) for k in spare) <= min(
            stale(k, 0) for k in outside
        )


def test_staleness_bound_documented_accurately():
    """Worst-case rotation staleness is ceil(n_extras / n_spare_slots)
    rounds; the docstring above LAST_HASH_GREEN must state the current
    value so the bound stays visible as the contract grows (VERDICT r4
    #5 — the old comment said 2 after the contract had grown to 3)."""
    import math

    keys = list(entrymod.queries())
    n_extras = len(keys) - len(entrymod.WINDOW_PINNED)
    n_spare = entrymod.WINDOW_SIZE - len(entrymod.WINDOW_PINNED)
    bound = math.ceil(n_extras / n_spare)
    src = Path(entrymod.__file__).read_text()
    doc = src.split("LAST_HASH_GREEN = {", 1)[0].rsplit("#: Rotation", 1)[1]
    m = re.search(r"ceil\(\d+/\d+\)\s*=\s*(\d+)", doc)
    assert m, "rotation docstring must state the ceil(extras/slots) bound"
    assert int(m.group(1)) == bound, (
        f"documented staleness bound {m.group(1)} != actual {bound} "
        f"(ceil({n_extras}/{n_spare})) — update the comment above "
        "LAST_HASH_GREEN"
    )


def test_no_silent_window_shift_via_duplicate_keys():
    """Python dicts keep the FIRST occurrence's position on key
    re-assignment, so a duplicated literal in the queries() source
    would silently shift the window. The dict API already dedupes, so
    scan the source text."""
    src = Path(entrymod.__file__).read_text()
    body = src.split("def queries()", 1)[1].split("def ", 1)[0]
    keys = re.findall(r'"(q_\w+)":', body)
    dupes = {k for k in keys if keys.count(k) > 1}
    assert not dupes, f"duplicate keys in queries() source: {dupes}"
