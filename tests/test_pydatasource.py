"""Custom Python DataSource (sources/pydatasource.py): determinism,
partitioning, and doc_id filter pushdown into the generator."""

from __future__ import annotations

from pyspark.sql import functions as F

from similarity_analysis_big_data_spark.sources.pydatasource import (
    SyntheticDocsReader,
    _row,
    register_synthetic_docs,
)


def _read(spark, **opts):
    register_synthetic_docs(spark)
    r = spark.read.format("synthetic_docs")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_reads_deterministic_rows(spark):
    df = _read(spark, n_docs=200, partitions=4)
    assert df.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    rows = sorted(df.collect())
    assert len(rows) == 200
    assert [r["doc_id"] for r in rows] == list(range(200))
    # deterministic across reads and vs the driver-side generator
    again = sorted(_read(spark, n_docs=200, partitions=7).collect())
    assert rows == again
    assert tuple(rows[42]) == _row(42)
    # n_chars is consistent with text
    assert all(r["n_chars"] == len(r["text"]) for r in rows)


def test_generation_is_partitioned(spark):
    df = _read(spark, n_docs=100, partitions=5)
    n_parts = df.select(F.spark_partition_id().alias("p")).distinct().count()
    assert n_parts == 5


def test_docid_filters_prune_generation(spark):
    """EqualTo/GreaterThan on doc_id reach the reader (pushFilters) and
    shrink the generated id range — verified both by results and by the
    reader's own bookkeeping."""
    df = _read(spark, n_docs=1000, partitions=8).filter(
        (F.col("doc_id") > 990) & (F.col("lang") == "en")
    )
    rows = df.collect()
    assert all(r["doc_id"] > 990 and r["lang"] == "en" for r in rows)
    # driver-side check of the pushdown bookkeeping
    from pyspark.sql.datasource import EqualTo, GreaterThan

    rd = SyntheticDocsReader({"n_docs": "1000"})
    rest = list(rd.pushFilters([GreaterThan(("doc_id",), 990), EqualTo(("lang",), "en")]))
    assert rd.lo == 991 and rd.hi == 1000
    assert rest == [EqualTo(("lang",), "en")]  # lang stays with Spark
    assert sum(p.end - p.start for p in rd.partitions()) == 9


def test_point_lookup_generates_single_row(spark):
    df = _read(spark, n_docs=100000, partitions=8).filter(F.col("doc_id") == 77)
    rows = df.collect()
    assert len(rows) == 1 and tuple(rows[0]) == _row(77)


def test_stream_source_one_batch_deterministic(spark, tmp_path):
    """trigger(once): exactly one micro-batch of rows_per_batch events,
    content equal to the driver-side generator."""
    from similarity_analysis_big_data_spark.sources.pydatasource import (
        _event_row,
        register_synthetic_events,
    )

    register_synthetic_events(spark)
    stream = (
        spark.readStream.format("synthetic_events")
        .option("rows_per_batch", 40)
        .option("partitions", 3)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("synth_events_once")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = sorted(spark.sql("SELECT * FROM synth_events_once").collect())
    assert len(rows) == 40
    assert [tuple(r) for r in rows] == [_event_row(i) for i in range(40)]


def test_jsonl_dir_writer_commit_protocol(spark, tmp_path):
    """Python DataSource WRITER: values round-trip through the manifest-
    committed JSONL sink; only manifested files are readable; an orphan
    temp file (simulating a failed/zombie task) stays invisible."""
    import json
    import os

    from similarity_analysis_big_data_spark.sources.pydatasource import (
        register_jsonl_dir,
    )

    register_jsonl_dir(spark)
    path = str(tmp_path / "sink")
    df = spark.range(100).select(
        F.col("id"),
        F.md5(F.col("id").cast("string")).alias("digest"),
        (F.col("id") * 0.5).alias("score"),
    )
    df.repartition(4).write.format("jsonl_dir").option("path", path).mode(
        "append"
    ).save()

    manifest = json.load(open(os.path.join(path, "_MANIFEST.json")))
    assert manifest["rows"] == 100 and len(manifest["files"]) == 4
    assert sorted(manifest["columns"]) == ["digest", "id", "score"]
    # no temp files leaked past commit
    assert not [f for f in os.listdir(path) if f.startswith("_tmp-")]

    # drop an orphan "zombie task" file — the manifest-driven reader must
    # not see it
    with open(os.path.join(path, "_tmp-zombie.jsonl"), "w") as fh:
        fh.write(json.dumps({"id": 999_999, "digest": "x", "score": 0.0}) + "\n")

    back = spark.read.format("jsonl_dir").option("path", path).load()
    got = {(r["id"], r["digest"], r["score"]) for r in back.collect()}
    want = {(r["id"], r["digest"], r["score"]) for r in df.collect()}
    assert got == want


def test_jsonl_dir_append_then_overwrite_modes(spark, tmp_path):
    """ADVICE r3 (medium): append must MERGE into the existing manifest
    (unique part names, prior rows stay visible); overwrite must replace
    committed contents and delete the superseded part files."""
    import json
    import os

    from similarity_analysis_big_data_spark.sources.pydatasource import (
        register_jsonl_dir,
    )

    register_jsonl_dir(spark)
    path = str(tmp_path / "sink2")
    base = spark.range(0, 50).select(F.col("id"), F.lit("a").alias("tag"))
    delta = spark.range(50, 80).select(F.col("id"), F.lit("b").alias("tag"))

    base.repartition(3).write.format("jsonl_dir").option("path", path).mode(
        "append"
    ).save()
    delta.repartition(2).write.format("jsonl_dir").option("path", path).mode(
        "append"
    ).save()

    manifest = json.load(open(os.path.join(path, "_MANIFEST.json")))
    assert manifest["rows"] == 80 and len(manifest["files"]) == 5
    assert len(set(manifest["files"])) == 5  # no part-name collisions
    back = spark.read.format("jsonl_dir").option("path", path).load()
    assert back.count() == 80
    assert back.filter(F.col("tag") == "a").count() == 50

    # append with different columns is rejected, manifest untouched
    bad = spark.range(3).select(F.col("id"), F.lit(1).alias("other"))
    import pytest as _pytest

    with _pytest.raises(Exception, match="column mismatch"):
        bad.write.format("jsonl_dir").option("path", path).mode("append").save()
    assert json.load(open(os.path.join(path, "_MANIFEST.json")))["rows"] == 80

    # overwrite replaces contents and removes superseded part files
    fresh = spark.range(1000, 1010).select(F.col("id"), F.lit("c").alias("tag"))
    fresh.repartition(2).write.format("jsonl_dir").option("path", path).mode(
        "overwrite"
    ).save()
    manifest2 = json.load(open(os.path.join(path, "_MANIFEST.json")))
    assert manifest2["rows"] == 10 and len(manifest2["files"]) == 2
    on_disk = {f for f in os.listdir(path) if f.endswith(".jsonl")}
    assert on_disk == set(manifest2["files"])  # old parts actually deleted
    back2 = spark.read.format("jsonl_dir").option("path", path).load()
    assert {r["tag"] for r in back2.collect()} == {"c"}
    assert back2.count() == 10


def test_jsonl_dir_rejects_struct_fields(spark, tmp_path):
    """Non-flat schemas (struct fields) are rejected at writer
    construction with a clear contract error instead of corrupting the
    manifest (ADVICE r3: simpleString munging broke nested colons)."""
    import pytest as _pytest

    from similarity_analysis_big_data_spark.sources.pydatasource import (
        register_jsonl_dir,
    )

    register_jsonl_dir(spark)
    nested = spark.range(3).select(
        F.col("id"), F.struct(F.col("id").alias("c")).alias("b")
    )
    with _pytest.raises(Exception, match="unsupported field type"):
        nested.write.format("jsonl_dir").option(
            "path", str(tmp_path / "nested")
        ).mode("append").save()


def test_jsonl_dir_array_column_roundtrip(spark, tmp_path):
    """Arrays of atomics survive the JSONL round-trip under the
    schema.json() manifest (the old DDL munging couldn't express them)."""
    from similarity_analysis_big_data_spark.sources.pydatasource import (
        register_jsonl_dir,
    )

    register_jsonl_dir(spark)
    path = str(tmp_path / "arr")
    df = spark.range(5).select(
        F.col("id"), F.array(F.col("id"), F.col("id") * 2).alias("xs")
    )
    df.write.format("jsonl_dir").option("path", path).mode("append").save()
    back = spark.read.format("jsonl_dir").option("path", path).load()
    assert back.schema["xs"].dataType.simpleString() == "array<bigint>"
    got = {(r["id"], tuple(r["xs"])) for r in back.collect()}
    assert got == {(i, (i, 2 * i)) for i in range(5)}

def test_jsonl_dir_legacy_schema_manifest(spark, tmp_path):
    """ADVICE r4: manifests written before the schema_json migration carry
    a DDL string under 'schema' — the reader must still open them."""
    import json
    import os

    from similarity_analysis_big_data_spark.sources.pydatasource import (
        register_jsonl_dir,
    )

    register_jsonl_dir(spark)
    path = str(tmp_path / "legacy")
    os.makedirs(path)
    with open(os.path.join(path, "part-legacy-00000.jsonl"), "w") as fh:
        fh.write(json.dumps({"id": 1, "name": "a"}) + "\n")
        fh.write(json.dumps({"id": 2, "name": "b"}) + "\n")
    with open(os.path.join(path, "_MANIFEST.json"), "w") as fh:
        json.dump(
            {
                "schema": "id bigint, name string",  # legacy DDL key
                "files": ["part-legacy-00000.jsonl"],
                "rows": 2,
                "columns": ["id", "name"],
            },
            fh,
        )
    back = spark.read.format("jsonl_dir").option("path", path).load()
    assert {(r["id"], r["name"]) for r in back.collect()} == {(1, "a"), (2, "b")}

def test_jsonl_dir_vacuum_removes_orphans_only(spark, tmp_path):
    """vacuum_jsonl_dir deletes zombie temp files and orphaned parts but
    never manifested data; the relation reads identically afterward."""
    import json
    import os

    from similarity_analysis_big_data_spark.sources.pydatasource import (
        register_jsonl_dir,
        vacuum_jsonl_dir,
    )

    register_jsonl_dir(spark)
    path = str(tmp_path / "vac")
    df = spark.range(20).selectExpr("id", "id * 2 as dbl")
    df.repartition(2).write.format("jsonl_dir").option("path", path).mode(
        "append"
    ).save()
    # orphan part (as if a concurrent append lost the manifest race) and a
    # zombie temp file; plus an unrelated file that must be left alone
    for name in ("part-deadbeef-00000.jsonl", "_tmp-zombie.jsonl"):
        with open(os.path.join(path, name), "w") as fh:
            fh.write(json.dumps({"id": -1, "dbl": -2}) + "\n")
    with open(os.path.join(path, "README.txt"), "w") as fh:
        fh.write("not ours\n")

    before = {tuple(r) for r in spark.read.format("jsonl_dir").option("path", path).load().collect()}
    removed = vacuum_jsonl_dir(path)
    assert sorted(removed) == ["_tmp-zombie.jsonl", "part-deadbeef-00000.jsonl"]
    after = {tuple(r) for r in spark.read.format("jsonl_dir").option("path", path).load().collect()}
    assert before == after and len(after) == 20
    assert os.path.exists(os.path.join(path, "README.txt"))

def test_jsonl_dir_stream_writer_exactly_once(spark, tmp_path):
    """Python DataSource STREAM WRITER: micro-batches land as
    epoch-manifested part files; a replayed epoch (same batchId) is
    discarded instead of double-appended — exactly-once by manifest."""
    import json
    import os

    from similarity_analysis_big_data_spark.sources.pydatasource import (
        JsonlDirStreamWriter,
        register_jsonl_dir,
        register_synthetic_events,
    )

    register_jsonl_dir(spark)
    register_synthetic_events(spark)
    path = str(tmp_path / "stream_sink")
    ckpt = str(tmp_path / "ckpt")

    stream = (
        spark.readStream.format("synthetic_events")
        .option("rows_per_batch", "50")
        .option("partitions", "2")
        .load()
    )
    q = (
        stream.writeStream.format("jsonl_dir")
        .option("path", path)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        # wait for at least 2 committed epochs
        import time

        deadline = time.time() + 60
        while time.time() < deadline:
            if os.path.exists(os.path.join(path, "_MANIFEST.json")):
                m = json.load(open(os.path.join(path, "_MANIFEST.json")))
                if len(m.get("epochs", [])) >= 2:
                    break
            time.sleep(0.5)
    finally:
        q.stop()

    manifest = json.load(open(os.path.join(path, "_MANIFEST.json")))
    assert len(manifest["epochs"]) >= 2
    assert manifest["rows"] == 50 * len(manifest["epochs"])
    # the batch reader sees exactly the manifested rows
    back = spark.read.format("jsonl_dir").option("path", path).load()
    assert back.count() == manifest["rows"]
    assert back.select("event_id").distinct().count() == manifest["rows"]

    # simulate a replayed epoch: re-commit batchId=0 with a fresh temp file
    w = JsonlDirStreamWriter(
        {"path": path}, manifest["schema_json"], manifest["columns"]
    )
    tmp = os.path.join(path, "_tmp-replay.jsonl")
    with open(tmp, "w") as fh:
        fh.write(json.dumps(dict(zip(manifest["columns"], [999_999, 1, "view", 1.0]))) + "\n")

    class _Msg:
        tmp_path = tmp
        rows = 1

    w.commit([_Msg()], batchId=manifest["epochs"][0])
    after = json.load(open(os.path.join(path, "_MANIFEST.json")))
    assert after["rows"] == manifest["rows"]  # replay added nothing
    assert not os.path.exists(tmp)  # duplicate temp discarded
