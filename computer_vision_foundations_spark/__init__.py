"""computer_vision_foundations_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference repo
``databricks-industry-solutions/computer-vision-foundations``
(six Databricks notebooks forming a CV ingest/train/deploy pipeline),
rebuilt as a coherent, testable library on open-source Apache Spark:

- ``sources``    : batch/streaming file sources (binaryFile) and table loaders
- ``functions``  : column-level functions (filename parse, image UDFs, text,
                   vector math, portable hashing)
- ``operators``  : DataFrame-in/DataFrame-out operators (split, dedup,
                   similarity search, scoring, relational helpers)
- ``plans``      : declarative pipeline specs that compile to DataFrames
- ``streaming``  : structured-streaming ingest/inference pipelines, windows

Everything is DataFrame-first: logical plans go through Catalyst; Python
touches data only via Arrow-vectorized pandas UDFs where built-ins cannot
express the semantics. Designed for 100 TB scale: no driver-side collects
in any operator, explicit seeds everywhere, broadcast hints for small
dimensions, binary payload columns projected late.
"""

from computer_vision_foundations_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
