"""vervectordb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of nev8rz/VerVectorDB, rebuilt Spark-first.

The reference (/root/reference/vervectordb/__init__.py) is a single-process,
in-memory vector database: float32 vector store + metadata bag, cosine
brute-force / HNSW / IVF search, PQ compression, CRUD, pickle persistence.
This package re-expresses every one of those operators as DataFrame
transformations so Catalyst/Tungsten provide pushdown, pruning, codegen,
partition pruning and distributed top-k — and adds the large-scale
training-data-pipeline operators (dedup, ANN similarity search, text
analysis, multimodal columns) the 100 TB north star requires.

Nothing here is a port: the reference tells us WHAT to compute (see
SURVEY.md §2); the HOW is idiomatic Spark.
"""

from vervectordb_spark.session import get_spark
from vervectordb_spark.store import VectorStore

__all__ = ["get_spark", "VectorStore"]

__version__ = "0.1.0"
