"""deltacat_spark — a PySpark-native multimodal lakehouse engine.

A from-scratch rebuild of the *capabilities* of ray-project/deltacat
(reference surveyed in SURVEY.md) on idiomatic Spark: a Pythonic catalog
API, an ACID filesystem-native table format with optimistic MVCC and time
travel, StructType schemas carrying lakehouse field metadata (merge keys,
merge order, event time, defaults), six write modes implemented as
DataFrame programs, and the large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns).

Public API mirrors the reference's ``deltacat/__init__.py:5-115`` surface
(``create_table``, ``read_table``, ``write_to_table``, namespace CRUD,
``dc.get/put/list``) re-expressed Spark-first.
"""

from deltacat_spark.session import build_session

__version__ = "0.1.0"

__all__ = ["build_session", "__version__"]
