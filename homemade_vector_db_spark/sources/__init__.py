from homemade_vector_db_spark.sources.tables import (
    load_table,
    load_documents,
    load_embeddings,
    docs_with_embeddings,
    TABLES,
)

__all__ = [
    "load_table",
    "load_documents",
    "load_embeddings",
    "docs_with_embeddings",
    "TABLES",
]
