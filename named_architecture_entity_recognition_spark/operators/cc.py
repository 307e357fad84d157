"""Connected components over alias edges (J3 general form).

The reference unifies entity names by pairwise alias-pool intersection
with in-place renames (test/.../TestProjectEvaluator.java:209-239) —
O(n^2) single-machine. The scalable generalization is connected
components over the bipartite graph (entity_key)---(alias_name): two
entities sharing any pool name land in one component, and the
component's canonical label (min name) plays the role of the
reference's unified name.

Algorithm: alternating min-label propagation (a.k.a. large-star /
small-star simplification) over an edge list, converging in
O(log(diameter)) Spark jobs. Alias chains are short (name variants of
one concept), so 2-4 iterations suffice; each iteration is two
hash-agg shuffles. Deterministic: labels are strings, min is total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    max_iter: int = 10,
    checkpoint_dir: str | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """edges(src string, dst string) -> (node string, component string).

    component = lexicographic min node id reachable. Undirected.

    One Spark action per iteration: the changed-label count rides as a
    column through the propagation plan, and the single
    ``agg(sum(changed))`` both materializes the (lazy) checkpoint and
    returns the convergence signal — no separate join+count job.

    ``checkpoint_dir``: when set, iterations use RELIABLE checkpointing
    (``df.checkpoint`` into that dir) so an executor loss mid-job
    recomputes from durable storage instead of failing the whole
    iterative job — required at production scale. Default is
    ``localCheckpoint`` (executor-memory lineage truncation), fine for
    the sandbox / short-lived jobs.

    ``stats``: optional dict filled with {"iterations": n} for tests.
    """
    spark = edges.sparkSession
    if checkpoint_dir:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    def _ckpt(df: DataFrame) -> DataFrame:
        # lazy: the checkpoint is persisted by this iteration's single
        # aggregate action below, not by an extra job here
        if checkpoint_dir:
            return df.checkpoint(eager=False)
        return df.localCheckpoint(eager=False)

    sym = (
        edges.select("src", "dst")
        .unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .dropDuplicates(["src", "dst"])
    )
    # the edge list joins into EVERY iteration; without truncation its
    # full upstream lineage (e.g. a 10^7-pair LSH band join) re-executes
    # per iteration — measured 3-4x the whole CC cost on dup-cluster
    # workloads. Lazy checkpoint: materialized by iteration 1's action,
    # reused afterwards.
    sym = _ckpt(sym)
    # label(node) = min(node, min neighbor label); iterate to fixpoint
    labels = (
        sym.groupBy("src")
        .agg(F.least(F.min("dst"), F.first("src")).alias("label"))
        .select(F.col("src").alias("node"), "label")
    )
    labels = _ckpt(labels.withColumn("label", F.least("node", "label")))
    iters = 0
    for _ in range(max_iter):
        iters += 1
        # propagate: new_label(node) = min over neighbors of their label
        neigh = (
            sym.join(labels.withColumnRenamed("node", "dst"), "dst")
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
            .select(F.col("src").alias("node"), "nlabel")
        )
        new_labels = (
            labels.join(neigh, "node", "left")
            .select(
                "node",
                F.col("label").alias("old_label"),
                F.least(
                    "label", F.coalesce("nlabel", F.col("label"))
                ).alias("label"),
            )
        )
        # label-pointer jumping: label -> label-of-label (path halving)
        ptr = labels.select(
            F.col("node").alias("label"), F.col("label").alias("plabel")
        )
        new_labels = (
            new_labels.join(ptr, "label", "left")
            .select(
                "node",
                F.least("label", F.coalesce("plabel", F.col("label"))).alias("label"),
                (
                    F.least("label", F.coalesce("plabel", F.col("label")))
                    != F.col("old_label")
                ).cast("long").alias("changed"),
            )
        )
        new_labels = _ckpt(new_labels)
        # THE one action: materializes the checkpoint blocks AND counts
        # changed labels (map-side partial sum, no extra shuffle stage
        # beyond the scalar aggregate)
        changed = new_labels.agg(F.sum("changed")).first()[0] or 0
        labels = new_labels.select("node", "label")
        if changed == 0:
            break
    if stats is not None:
        stats["iterations"] = iters
    return labels.select("node", F.col("label").alias("component"))


def canonicalize_aliases(entities: DataFrame) -> DataFrame:
    """Unify entities (within doc) whose name pools intersect.

    Name pool = {lower(name)} U lower(aliases) (reference J3). Returns
    the input with an added ``component`` column: the canonical
    (min) '<doc_id>#<pool name>' of the alias component, suitable as a
    grouping key for merged entities.
    """
    with_key = entities.withColumn(
        "node", F.concat_ws("#", "doc_id", F.lower("name"))
    )
    pool = with_key.select(
        F.col("node").alias("src"),
        "doc_id",
        F.explode(
            F.array_union(
                F.array(F.lower("name")),
                # NULL aliases (entity tables read from external
                # parquet/Iceberg) must not nullify the union and drop
                # the entity's own-name edge
                F.transform(
                    F.coalesce(
                        "alternative_names", F.array().cast("array<string>")
                    ),
                    F.lower,
                ),
            )
        ).alias("alias"),
    ).select(
        "src", F.concat_ws("#", "doc_id", F.col("alias")).alias("dst")
    )
    comp = connected_components(pool)
    return with_key.join(comp, "node", "left").withColumn(
        "component", F.coalesce("component", F.col("node"))
    ).drop("node")


def canonicalize_corpus(entities: DataFrame) -> DataFrame:
    """Corpus-level entity linking (north_star: "abbreviation/case
    canonicalization with connected-components union over alias edges"):
    entities from DIFFERENT docs unify when any of their surface forms
    (name or alias), case/hyphen/space-collapsed, coincide.

    Bipartite edges (doc#name) --- (name:<normalized surface>); CC over
    the union converges in ~2 propagation rounds (star-shaped
    components). Adds ``canonical_id``: the component's min label, a
    deterministic corpus-wide entity id. Hot surfaces make wide stars,
    which the min-aggregation handles with map-side partial aggs (no
    single-reducer hotspot).
    """
    def norm_col(c):
        # normalize_name in SQL: strip non-alnum, lowercase
        return F.lower(F.regexp_replace(c, r"[^A-Za-z0-9]+", ""))

    with_key = entities.withColumn(
        "node", F.concat_ws("#", "doc_id", F.lower("name"))
    )
    surfaces = with_key.select(
        F.col("node").alias("src"),
        F.explode(
            F.array_union(
                F.array(F.col("name")),
                F.coalesce(
                    "alternative_names", F.array().cast("array<string>")
                ),
            )
        ).alias("surface"),
    ).select(
        "src",
        F.concat(F.lit("name:"), norm_col(F.col("surface"))).alias("dst"),
    )
    comp = connected_components(surfaces)
    return (
        with_key.join(comp, "node", "left")
        .withColumn("canonical_id", F.coalesce("component", F.col("node")))
        .drop("component")
        .withColumnRenamed("node", "entity_id")
    )


def sameas_triples(canonical: DataFrame) -> DataFrame:
    """(entity_id, sameAs, canonical_id) rows for linked entities."""
    return canonical.select(
        F.col("entity_id").alias("subj"),
        F.lit("sameAs").alias("pred"),
        F.col("canonical_id").alias("obj"),
    )
