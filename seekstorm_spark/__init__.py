"""seekstorm_spark — a PySpark-native inverted-index build + BM25 query engine.

A from-scratch rebuild of the capabilities of SeekStorm (Rust,
https://github.com/SeekStorm/SeekStorm) on Apache Spark: posting-list
construction with delta+varbyte-compressed 65,536-docid blocks and
per-block max-score metadata, BM25(F) top-k scoring with block-max WAND
pruning, query algebra (AND/OR/NOT/phrase), facets, plus the
training-data-pipeline operators a 100 TB corpus needs (dedup,
similarity search, text analysis).

Architecture is Spark-first: DataFrame/SQL + Catalyst for everything
declarative; Arrow-vectorized pandas UDFs (`applyInPandas`,
`mapInPandas`) only for the posting-block codec and the WAND kernel,
which Catalyst cannot express.
"""

__version__ = "0.1.0"

from seekstorm_spark.client import SeekClient, SeekClientError  # noqa: F401
from seekstorm_spark.session import get_spark  # noqa: F401
