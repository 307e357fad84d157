"""Source readers: SAD files, gold/gazetteer CSVs, project discovery."""

import pytest
from pyspark.sql import functions as F

from named_architecture_entity_recognition_spark.sources.csv_sources import (
    gazetteer_from_names,
    read_gazetteer_csv,
    read_gold_csv,
)
from named_architecture_entity_recognition_spark.sources.sad import (
    discover_projects,
    read_sad_files,
    split_sentences,
)

from conftest import EVAL_RESOURCES


def test_split_sentences_java_R_semantics():
    # Java \R matches \r\n, \r, \n, unicode line separators
    assert split_sentences("a.\r\nb!\rc?\nd.") == ["a.", "b!", "c?", "d."]


def test_discover_projects():
    projects = discover_projects(EVAL_RESOURCES)
    assert set(projects) == {
        "bigbluebutton", "jabref", "mediastore", "teammates", "teastore",
    }
    for meta in projects.values():
        assert meta["sad"].exists() and meta["gold"].exists()
        assert meta["gazetteer"].exists()


def test_read_sad_files(spark):
    projects = discover_projects(EVAL_RESOURCES)
    df = read_sad_files(spark, [projects["teastore"]["sad"]], media_every=3)
    row = df.head()
    texts = [s["text"] for s in row["spans"] if s["kind"] == "text"]
    # 43 sentences: wc -l reports 42 newlines, final line unterminated
    assert len(texts) == 43
    assert texts[0].startswith("The TeaStore consists of 5")
    media = [s for s in row["spans"] if s["kind"] != "text"]
    assert media and all(s["media_ref"] for s in media)
    # offsets strictly increasing from 1
    offsets = [s["offset"] for s in row["spans"]]
    assert offsets == list(range(1, len(offsets) + 1))


def test_read_gold_csv(spark):
    projects = discover_projects(EVAL_RESOURCES)
    gold = read_gold_csv(spark, projects["teastore"]["gold"])
    rows = gold.collect()
    assert len(rows) == 27  # BASELINE.md gold count
    assert {type(r.sentence) for r in rows} == {int}


def test_read_gazetteer_csv(spark):
    projects = discover_projects(EVAL_RESOURCES)
    gaz = read_gazetteer_csv(spark, projects["teastore"]["gazetteer"])
    names = {r.name for r in gaz.collect()}
    assert "WebUI" in names and "Image Provider" in names
    assert gaz.filter(F.col("entity_type") != "COMPONENT").count() == 0


def test_gazetteer_from_names(spark):
    g = gazetteer_from_names(spark, ["B", "A", "B"])
    assert [r.name for r in g.orderBy("name").collect()] == ["A", "B"]


def test_lakehouse_roundtrip_and_partition_pruning(spark, tmp_path):
    """S7 sink executed for real (parquet fallback of the Iceberg
    `(pred, bucket(subj))` hidden partitioning): a pred filter and a
    subj-bucket filter must each cut the scanned input files, not just
    the rows — proven by inputFiles() counts, not plan text alone."""
    from pyspark.sql import functions as F

    from named_architecture_entity_recognition_spark.sources.lakehouse import (
        read_triples,
        write_triples,
    )

    triples = spark.createDataFrame(
        [
            (f"d1#e{i}", pred, f"obj{i}")
            for i in range(40)
            for pred in ("instanceOf", "hasName", "occursIn")
        ],
        "subj string, pred string, obj string",
    )
    target = str(tmp_path / "triples")
    write_triples(triples, target, n_buckets=8)
    back = read_triples(spark, target)
    assert back.count() == 120
    assert "subj_bucket" in back.columns

    def files_read(q):
        """numFiles metric of the executed scan — files AFTER partition
        pruning (inputFiles() lists the relation pre-pruning)."""
        q.collect()
        leaf = q._jdf.queryExecution().executedPlan().collectLeaves().apply(0)
        return leaf.metrics().apply("numFiles").value()

    total_files = files_read(back)
    by_pred = back.filter(back.pred == "hasName")
    assert by_pred.count() == 40
    pred_files = files_read(by_pred)
    assert 0 < pred_files < total_files
    plan = by_pred._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(pred" in plan

    # bucket pruning: compute the bucket of one subj with the SAME
    # expression the writer used, filter on it, assert fewer files read
    bucket = (
        spark.createDataFrame([("d1#e7",)], "subj string")
        .select(F.pmod(F.xxhash64("subj"), F.lit(8)).cast("int").alias("b"))
        .first()["b"]
    )
    by_bucket = back.filter(
        (back.pred == "hasName") & (back.subj_bucket == bucket)
    )
    assert by_bucket.filter(back.subj == "d1#e7").count() == 1
    assert 0 < files_read(by_bucket) < pred_files


def test_sink_roundtrip_both_branches(spark, tmp_path):
    """Runs the Iceberg branch of write_triples/read_triples when the
    runtime jar is present (writeTo + hidden partitioning on
    (pred, bucket(subj)), lakehouse.py). Without the jar (this sandbox
    has no network to fetch it — recorded in SURVEY §8), the SAME call
    semantics are executed through the parquet fallback against a
    catalog-style layout under tmp_path, so the dispatch logic and the
    production layout are exercised either way — no skip."""
    from named_architecture_entity_recognition_spark.sources.lakehouse import (
        iceberg_available,
        read_triples,
        write_triples,
    )

    triples = spark.createDataFrame(
        [("d1#a", "instanceOf", "COMPONENT"), ("d1#a", "hasName", "a")],
        "subj string, pred string, obj string",
    )
    if iceberg_available(spark):
        spark.conf.set(
            "spark.sql.catalog.sandbox_ice",
            "org.apache.iceberg.spark.SparkCatalog",
        )
        spark.conf.set("spark.sql.catalog.sandbox_ice.type", "hadoop")
        spark.conf.set(
            "spark.sql.catalog.sandbox_ice.warehouse",
            str(tmp_path / "warehouse"),
        )
        target = "sandbox_ice.db.triples"
    else:
        assert not iceberg_available(spark)
        target = str(tmp_path / "db.triples")
    write_triples(triples, target, n_buckets=4)
    back = read_triples(spark, target)
    assert back.count() == 2
    assert back.filter(back.pred == "hasName").count() == 1


def test_compact_table_preserves_rows_and_reduces_files(spark, tmp_path):
    """128 tiny files -> ceil(bytes/target) files; row count AND
    content identical; read parallelism no longer pinned to the
    original file count."""
    from pyspark.sql import functions as F

    from named_architecture_entity_recognition_spark.sources.lakehouse import (
        compact_table,
    )

    src = str(tmp_path / "small")
    spark.range(0, 20000).withColumn(
        "payload", F.md5(F.col("id").cast("string"))
    ).repartition(128).write.parquet(src)
    dst = str(tmp_path / "compact")
    stats = compact_table(spark, src, dst, target_mb=1)
    assert stats["files_in"] == 128
    assert stats["n_rows"] == 20000
    assert 1 <= stats["files_out"] < 128
    a = spark.read.parquet(src).select("id", "payload")
    b = spark.read.parquet(dst).select("id", "payload")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_bucketed_join_plans_no_exchange(spark, tmp_path):
    """Co-located join layout (write_bucketed): two tables bucketed by
    the same key into the same bucket count sort-merge-join with ZERO
    Exchange (the identical unbucketed join plans one), results are
    identical, and an equality filter prunes the scan to a single
    bucket — the three properties that make bucketing pay at 100 TB."""
    from named_architecture_entity_recognition_spark.sources.lakehouse import (
        write_bucketed,
    )

    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.range(0, 5000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("va")
        )
        b = spark.range(0, 5000).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
        )
        write_bucketed(a, "bkt_a", "k", 8, path=str(tmp_path / "bkt_a"))
        write_bucketed(b, "bkt_b", "k", 8, path=str(tmp_path / "bkt_b"))

        j = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
        plan = j._sc._jvm.PythonSQLUtils.explainString(
            j._jdf.queryExecution(), "simple"
        )
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan

        uj = a.join(b, "k")
        uplan = uj._sc._jvm.PythonSQLUtils.explainString(
            uj._jdf.queryExecution(), "simple"
        )
        assert "Exchange" in uplan

        assert sorted(map(tuple, j.collect())) == sorted(
            map(tuple, uj.collect())
        )

        # bucket pruning: an equality filter scans 1 of 8 buckets.
        # autoBucketedScan turns bucketed reading off when no operator
        # needs the distribution, which also forfeits pruning — a real
        # point-lookup job disables it exactly like this
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
        )
        f = spark.table("bkt_a").filter(F.col("k") == 42)
        fplan = f._sc._jvm.PythonSQLUtils.explainString(
            f._jdf.queryExecution(), "simple"
        )
        assert "SelectedBucketsCount: 1 out of 8" in fplan, fplan
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true"
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")
