"""homemade_vector_db_spark — a PySpark-native analytics engine with the
query semantics of deshwalmahesh/homemade-vector-db.

The reference (/root/reference/local_db.py) is a single-process in-memory
vector database: BM25 lexical search, k-NN vector search (flat / HNSW /
IVF-PQ), metadata filtering, and weighted hybrid fusion. This package
re-expresses every operator Spark-first: declarative DataFrame plans that
Catalyst optimizes (filter pushdown, column pruning, TakeOrderedAndProject
top-k, broadcast joins), with ANN tiers built on MLlib-style LSH / KMeans-IVF
and large-scale extras (dedup, similarity join, text analytics) on top.

Design notes for 100 TB scale are in each module's docstring.
"""

from homemade_vector_db_spark.session import get_spark
from homemade_vector_db_spark.db import VectorDatabase

__all__ = ["get_spark", "VectorDatabase"]
__version__ = "0.1.0"
