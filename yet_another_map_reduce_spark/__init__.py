"""yet_another_map_reduce_spark — a PySpark-native analytics engine with
the capability surface of harshapatil7/Yet-Another-Map-Reduce (see
SURVEY.md), extended with large-scale training-data-pipeline operators.

Layering:
    session    — SparkSession factory (cluster bootstrap, F8)
    sources    — readers/writers/catalog (F1, F2, F9, F10)
    operators  — relational + MapReduce-compat + pipeline extensions
    functions  — portable expression helpers (hashing, text, vectors)
    streaming  — Structured Streaming windows/state
    plans      — physical-plan assertions for scale hygiene
"""

from yet_another_map_reduce_spark.session import build_session

__version__ = "0.1.0"

__all__ = ["build_session", "__version__"]
