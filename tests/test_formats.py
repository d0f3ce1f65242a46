"""JSONL/CSV interchange round-trips preserve rows exactly (incl. the
float array column through CSV's JSON-encoding path)."""

from pyspark.sql import functions as F

from homemade_vector_db_spark.sources import formats
from homemade_vector_db_spark.sources.tables import load_documents, load_embeddings
from tests.conftest import SF_SMOKE


def _rows(df, key):
    return sorted((tuple(r) for r in df.collect()), key=lambda t: t[key])


def test_documents_jsonl_roundtrip(spark, tmp_path):
    docs = load_documents(spark, SF_SMOKE)
    p = str(tmp_path / "docs_jsonl")
    formats.write_jsonl(docs, p)
    back = formats.read_jsonl(spark, p, formats.DOCUMENTS_SCHEMA)
    assert back.schema == formats.DOCUMENTS_SCHEMA
    assert _rows(back, 0) == _rows(docs, 0)


def test_embeddings_csv_roundtrip(spark, tmp_path):
    embs = load_embeddings(spark, SF_SMOKE)
    p = str(tmp_path / "embs_csv")
    formats.write_csv(embs, p)
    back = formats.read_csv(spark, p, formats.EMBEDDINGS_SCHEMA)
    assert back.schema == formats.EMBEDDINGS_SCHEMA
    a = {r.vec_id: (list(r.embedding), r.label) for r in back.collect()}
    b = {r.vec_id: (list(r.embedding), r.label) for r in embs.collect()}
    assert set(a) == set(b)
    for k in a:
        assert a[k][1] == b[k][1]
        assert a[k][0] == b[k][0]  # float32 survives json round-trip exactly


def test_documents_csv_roundtrip(spark, tmp_path):
    docs = load_documents(spark, SF_SMOKE)
    p = str(tmp_path / "docs_csv")
    formats.write_csv(docs, p)
    back = formats.read_csv(spark, p, formats.DOCUMENTS_SCHEMA)
    assert _rows(back, 0) == _rows(docs, 0)


def test_orc_roundtrip_documents(spark, tmp_path):
    from homemade_vector_db_spark.sources.formats import read_orc, write_orc
    from homemade_vector_db_spark.sources.tables import load_documents

    docs = load_documents(spark, SF_SMOKE)
    path = str(tmp_path / "docs_orc")
    write_orc(docs, path)
    back = read_orc(spark, path)
    assert back.schema == docs.schema
    assert back.count() == docs.count()
    a = {r.doc_id: r.text for r in docs.collect()}
    b = {r.doc_id: r.text for r in back.collect()}
    assert a == b


def test_orc_roundtrip_embeddings_arrays(spark, tmp_path):
    from homemade_vector_db_spark.sources.formats import read_orc, write_orc
    from homemade_vector_db_spark.sources.tables import load_embeddings

    embs = load_embeddings(spark, SF_SMOKE)
    path = str(tmp_path / "embs_orc")
    write_orc(embs, path)
    back = read_orc(spark, path)
    assert back.count() == embs.count()
    r0 = back.where(back.vec_id == 0).first()
    e0 = embs.where(embs.vec_id == 0).first()
    assert list(r0.embedding) == list(e0.embedding)


def test_compact_parquet_merges_small_files(spark, tmp_path):
    from homemade_vector_db_spark.sources.maintenance import compact_parquet
    from homemade_vector_db_spark.sources.tables import load_documents

    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    docs = load_documents(spark, SF_SMOKE)
    docs.repartition(16).write.parquet(src)  # simulate 16 tiny appends

    import glob

    assert len(glob.glob(src + "/*.parquet")) == 16
    n_out = compact_parquet(spark, src, dst, target_file_mb=256)
    assert n_out == 1
    assert len(glob.glob(dst + "/*.parquet")) == 1
    back = spark.read.parquet(dst)
    assert back.count() == docs.count()
    assert {r.doc_id for r in back.select("doc_id").collect()} == {
        r.doc_id for r in docs.select("doc_id").collect()
    }


def test_read_media_dir_binaryfile(spark, tmp_path):
    d = tmp_path / "media"
    d.mkdir()
    (d / "a.jpg").write_bytes(b"\xff\xd8fakejpeg-bytes")
    (d / "b.wav").write_bytes(b"RIFFfakewav")
    (d / "c.unknownext").write_bytes(b"???")
    df = formats.read_media_dir(spark, str(d))
    rows = {r.kind: r for r in df.collect()}
    assert set(rows) == {"image", "audio", "other"}
    assert rows["image"].mime == "image/jpeg"
    assert bytes(rows["image"].content) == b"\xff\xd8fakejpeg-bytes"
    assert rows["other"].mime == "application/octet-stream"
    # schema matches the multimodal MEDIA_SCHEMA column set
    from homemade_vector_db_spark.operators.multimodal import MEDIA_SCHEMA
    assert df.columns == [f.name for f in MEDIA_SCHEMA.fields]
    # deterministic ids across re-ingest
    again = {r.media_id for r in formats.read_media_dir(spark, str(d)).collect()}
    assert again == {r.media_id for r in rows.values()}
    # glob filter narrows to one extension
    only_jpg = formats.read_media_dir(spark, str(d), glob="*.jpg").collect()
    assert len(only_jpg) == 1 and only_jpg[0].kind == "image"


def test_read_media_dir_same_basename_distinct_ids(spark, tmp_path):
    """media_id hashes the root-relative path: two files with the SAME
    basename in different subdirectories must get different ids."""
    d = tmp_path / "media2"
    (d / "album1").mkdir(parents=True)
    (d / "album2").mkdir(parents=True)
    (d / "album1" / "cover.jpg").write_bytes(b"\xff\xd8one")
    (d / "album2" / "cover.jpg").write_bytes(b"\xff\xd8two")
    out = formats.read_media_dir(spark, str(d), recursive=True)
    ids = [r.media_id for r in out.collect()]
    assert len(ids) == 2 and len(set(ids)) == 2


def test_read_text_docs_whole_file(spark, tmp_path):
    from homemade_vector_db_spark.sources.formats import read_text_docs

    (tmp_path / "crawlA").mkdir()
    (tmp_path / "crawlB").mkdir()
    (tmp_path / "crawlA" / "a.txt").write_text("alpha beta\ngamma")
    (tmp_path / "crawlB" / "b.txt").write_text("delta")
    docs = read_text_docs(spark, str(tmp_path), recursive=True, glob="*.txt")
    rows = {r["source"]: r for r in docs.collect()}
    assert set(rows) == {"crawlA", "crawlB"}
    assert rows["crawlA"]["text"] == "alpha beta\ngamma"  # whole file, newline kept
    # ids stable across re-ingests of the same tree
    again = {r["source"]: r["doc_id"] for r in
             read_text_docs(spark, str(tmp_path), recursive=True, glob="*.txt").collect()}
    assert again == {s: r["doc_id"] for s, r in rows.items()}


def test_read_text_docs_per_line(spark, tmp_path):
    from homemade_vector_db_spark.sources.formats import read_text_docs

    (tmp_path / "src0").mkdir()
    (tmp_path / "src0" / "x.txt").write_text("line one\nline two\nline one\n")
    docs = read_text_docs(spark, str(tmp_path), whole_file=False, recursive=True)
    texts = sorted(r["text"] for r in docs.collect())
    assert texts == ["line one", "line one", "line two"]
    # identical lines share the id (exact dups by design)
    ids = {r["text"]: set() for r in docs.collect()}
    for r in docs.collect():
        ids[r["text"]].add(r["doc_id"])
    assert all(len(v) == 1 for v in ids.values())


def test_fake_docs_batch_partitioned_deterministic(spark):
    from homemade_vector_db_spark.sources import generator

    generator.register(spark)
    df = (
        spark.read.format("fake_docs")
        .option("n", 300)
        .option("numPartitions", 4)
        .load()
    )
    assert df.count() == 300
    assert df.rdd.getNumPartitions() == 4
    a = df.orderBy("doc_id").limit(5).collect()
    b = (
        spark.read.format("fake_docs").option("n", 300).load()
        .orderBy("doc_id").limit(5).collect()
    )
    assert a == b  # pure function of (seed, doc_id)
    assert all(r.n_chars == len(r.text) for r in a)


def test_fake_docs_no_pushdown_multi_scan_exact(spark):
    """Round 12: the source deliberately implements NO pushFilters —
    Spark reuses one reader per loaded relation across every scan of a
    plan, and a branch with un-pushable predicates (an OR) never calls
    pushFilters, so a range clamp set by a sibling branch silently
    pruned its rows (measured: doc_id 0 lost from base∪dups when the
    dups branch pushed doc_id > 0). With no source-side clamp, Spark
    post-applies every predicate and all sharing scenarios are exact."""
    from homemade_vector_db_spark.sources.generator import _FakeDocsReader
    from homemade_vector_db_spark.sources import generator

    # the reader must not advertise filter pushdown at all
    r = _FakeDocsReader({"n": "1000", "numpartitions": "4"})
    assert not hasattr(type(r), "pushFilters") or (
        type(r).pushFilters
        is type(r).__mro__[1].pushFilters  # inherited default only
    )
    parts = r.partitions()
    assert min(p.start for p in parts) == 0
    assert max(p.end for p in parts) == 1000

    generator.register(spark)
    # single-scan filters stay exact (Spark-side evaluation)
    df = (
        spark.read.format("fake_docs").option("n", 1000).load()
        .where("doc_id >= 100 AND doc_id < 120 AND lang IS NOT NULL")
    )
    assert df.count() == 20
    # the union-of-branches regression: one load(), two branch filters —
    # doc_id 0 must survive in every action
    docs = spark.read.format("fake_docs").option("n", 200).load()
    base = docs.where((F.col("doc_id") % 20 != 7) | (F.col("doc_id") == 0))
    dups = docs.where((F.col("doc_id") % 20 == 7) & (F.col("doc_id") > 0))
    u = base.select("doc_id").unionByName(dups.select("doc_id"))
    assert u.count() == 200
    assert sorted(r.doc_id for r in u.collect()) == list(range(200))


def test_fake_docs_stream_equals_batch(spark, tmp_path):
    from homemade_vector_db_spark.sources import generator

    generator.register(spark)
    stream = (
        spark.readStream.format("fake_docs")
        .option("rate", 40)
        .option("maxDocs", 120)
        .load()
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.read.parquet(str(tmp_path / "out")).orderBy("doc_id").collect()
    want = (
        spark.read.format("fake_docs").option("n", 120).load()
        .orderBy("doc_id").collect()
    )
    assert got == want  # streaming feed is byte-identical to its batch twin


def test_stats_sink_writer_manifest(spark, tmp_path):
    """Python DataSource WRITER: per-task commit messages fold into one
    driver-side manifest; the checksum is partitioning-invariant."""
    import json
    import os

    from homemade_vector_db_spark.sources.sink import StatsSinkDataSource

    spark.dataSource.register(StatsSinkDataSource)
    df = spark.range(1000).selectExpr("id", "concat('d-', id) AS s")

    p1 = str(tmp_path / "sink1")
    df.repartition(7).write.format("stats_sink").option("path", p1).mode(
        "append"
    ).save()
    m1 = json.load(open(os.path.join(p1, "manifest.json")))
    assert m1["rows"] == 1000
    assert m1["partitions"] == 7

    p2 = str(tmp_path / "sink2")
    df.repartition(3).write.format("stats_sink").option("path", p2).mode(
        "append"
    ).save()
    m2 = json.load(open(os.path.join(p2, "manifest.json")))
    assert m2["rows"] == 1000
    # same data, different partitioning → same order-insensitive digest
    assert m2["checksum"] == m1["checksum"]

    p3 = str(tmp_path / "sink3")
    df.where("id < 999").write.format("stats_sink").option("path", p3).mode(
        "append"
    ).save()
    m3 = json.load(open(os.path.join(p3, "manifest.json")))
    assert m3["checksum"] != m1["checksum"]


def test_fake_docs_stream_restart_resumes_exactly(spark, tmp_path):
    """Kill a query mid-feed, restart from the same checkpoint: the
    offset log is the source of truth, so the restarted query continues
    where the first stopped — no gaps, no duplicates."""
    from homemade_vector_db_spark.sources import generator

    generator.register(spark)

    def start():
        return (
            spark.readStream.format("fake_docs")
            .option("rate", 30)
            .option("maxDocs", 150)
            .load()
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("append")
            .start()
        )

    q1 = start()
    try:
        # let at least one batch commit, then stop mid-feed
        import time

        deadline = time.time() + 60
        while time.time() < deadline:
            try:
                if len(spark.read.parquet(str(tmp_path / "out")).take(1)) > 0:
                    break
            except Exception:
                pass  # sink dir not created yet
            time.sleep(0.5)
    finally:
        q1.stop()

    n_before = spark.read.parquet(str(tmp_path / "out")).count()
    assert 0 < n_before  # stopped with work still pending or just done

    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    got = spark.read.parquet(str(tmp_path / "out")).orderBy("doc_id").collect()
    want = (
        spark.read.format("fake_docs").option("n", 150).load()
        .orderBy("doc_id").collect()
    )
    assert got == want  # no gaps, no duplicates across the restart


def test_read_jsonl_audited_quarantines_bad_lines(spark, tmp_path):
    """PERMISSIVE + corrupt-record column: good rows come out
    schema-clean, malformed lines are preserved verbatim for repair."""
    import pyspark.sql.types as T

    from homemade_vector_db_spark.sources.formats import read_jsonl_audited

    p = tmp_path / "feed.jsonl"
    lines = [
        '{"doc_id": 1, "text": "ok one"}',
        'this is not json at all',
        '{"doc_id": 2, "text": "ok two"}',
        '{"doc_id": "NaN-ish", "text": 3}',  # schema-incompatible
        '{"doc_id": 3, "text": "ok three"}',
    ]
    p.write_text("\n".join(lines) + "\n")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    good, quarantine = read_jsonl_audited(spark, str(p), schema)
    assert sorted(r.doc_id for r in good.collect()) == [1, 2, 3]
    bad = sorted(r.raw_line for r in quarantine.collect())
    assert bad == sorted([lines[1], lines[3]])
    # good side carries no corrupt column
    assert "_corrupt_record" not in good.columns
