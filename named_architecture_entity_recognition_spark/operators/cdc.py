"""Changelog compaction: latest-snapshot (CDC upsert resolution) and
SCD2 validity-interval history.

A training-data lakehouse ingests append-only changelogs (key, ts,
op, payload...). Two standard materializations:

- ``latest_snapshot``: one row per key = the newest non-deleted
  version. Implemented with ``max_by(struct(all), struct(ts,
  tiebreak))`` — a HASH AGGREGATE, not a window: partial aggregation
  runs map-side, so the shuffle carries one candidate row per key per
  map task instead of every version. At 100 TB of changelog with hot
  keys, that difference (agg with partial combine vs window sort of all
  versions) is the whole game. Deletes are dropped AFTER resolution:
  a delete that is the newest version removes the key; an older delete
  is superseded by a newer upsert.
- ``scd2_history``: every version becomes a validity interval
  ``[effective_from, effective_to)`` via ``lead(ts)`` per key
  (``effective_to`` null = current). This one is genuinely a window
  (each row needs its successor), so it shuffles+sorts per key — the
  unavoidable cost of interval construction; partition the OUTPUT by
  is_current so snapshot readers prune history.

Determinism: ties on ``ts`` are broken by ``tiebreak`` (e.g. a
changelog sequence number) in both operators — max_by alone on a tied
ts would be nondeterministic under retries, which silently corrupts a
resumed job.

Reference parity: the reference engine has no mutation model at all
(entities are rebuilt per run); this extends the engine for the
incremental-ingest tables the pipeline carries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_snapshot(
    changelog: DataFrame,
    key: str,
    ts: str,
    tiebreak: str,
    op: str | None = None,
    delete_value: str = "delete",
) -> DataFrame:
    """One row per ``key``: the version with the greatest
    ``(ts, tiebreak)``. If ``op`` is given, keys whose newest version is
    a ``delete_value`` row are removed. Output columns = input columns,
    original order."""
    payload = F.struct(*[F.col(c) for c in changelog.columns])
    latest = changelog.groupBy(key).agg(
        F.max_by(payload, F.struct(F.col(ts), F.col(tiebreak))).alias("_v")
    )
    out = latest.select(*[F.col("_v")[c].alias(c) for c in changelog.columns])
    if op is not None:
        out = out.filter(F.col(op) != delete_value)
    return out


def scd2_history(
    changelog: DataFrame,
    key: str,
    ts: str,
    tiebreak: str,
) -> DataFrame:
    """Every version as a validity interval: input columns +
    ``effective_from`` (= ts), ``effective_to`` (next version's ts,
    null for the newest) and ``is_current``."""
    w = Window.partitionBy(key).orderBy(F.col(ts), F.col(tiebreak))
    nxt = F.lead(F.col(ts)).over(w)
    return (
        changelog.withColumn("effective_from", F.col(ts))
        .withColumn("effective_to", nxt)
        .withColumn("is_current", F.col("effective_to").isNull())
    )
