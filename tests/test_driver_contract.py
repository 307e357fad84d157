"""Driver-contract guard: entry() runs and has a stable schema; every
queries() entry is callable at sf0.001; oracle_sql() keys line up with
queries() (rows-only exceptions listed explicitly)."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"

#: operators with no SQL-expressible oracle. Since r2 only the media
#: stub remains rows-only: the flagship pipeline, LSH ANN, SimHash and
#: the P2 state machine are all value-oracled (md5-portable exprs or a
#: provable reduction — see test_flagship_oracle.py).
ROWS_ONLY = {
    "q_media_features",
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
    """Building the DataFrame (no execution) must succeed at sf0.001 —
    catches schema drift against the driver tables early."""
    df = entrymod.queries()[name](spark, SF)
    assert len(df.columns) > 0
