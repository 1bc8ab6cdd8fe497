"""mapreducewordcounting_spark — a PySpark-native analytics engine.

A brand-new Spark-first engine with the query and data-processing
capabilities of the reference MapReduce word-count program
(``/root/reference/sendFileByFile.cpp``), generalized into a reusable
operator library (scan → tokenize → normalize → aggregate → shuffle →
sort → sink, see SURVEY.md §2) and extended with the LLM-data-pipeline
operators a 100 TB training-data pipeline needs: deduplication,
similarity search, multimodal columns, and text analysis.

Design stance (SURVEY.md §7.0):
- DataFrame/Catalyst first; RDDs only for the flagship word-count
  rendition mandated by BASELINE.json ("RDD map/reduce operations").
- No driver-side collect() in operator paths; everything distributed.
- Built-in ``pyspark.sql.functions`` in hot paths; Arrow-batched
  pandas UDFs only where built-ins can't express the semantics.
"""

from mapreducewordcounting_spark.session import get_spark
from mapreducewordcounting_spark.catalog import TABLES, load_table, load_tables

__all__ = ["get_spark", "TABLES", "load_table", "load_tables"]

__version__ = "0.1.0"
