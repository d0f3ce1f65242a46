"""JSONL/CSV interchange round-trips preserve rows exactly (incl. the
float array column through CSV's JSON-encoding path)."""

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
