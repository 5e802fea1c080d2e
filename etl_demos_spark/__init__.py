"""etl_demos_spark — a PySpark-native analytics/ETL engine.

A from-scratch engine exposing the semantic surface of the reference
``rytakahas/etl-demos`` (a BigQuery+dbt medallion warehouse: typed ingest,
staging cast/rename contracts, window dedup, surrogate-key dimensions, date
spine, star-schema fact joins, conditional aggregation, data-quality
assertions, metadata-driven pipelines), re-expressed Spark-first, plus
large-scale training-data-pipeline operators (dedup families, similarity
search, multimodal columns, text analysis) engineered for 100 TB scale.

Everything here is pure PySpark DataFrame/SQL — Catalyst plans the physical
execution. Python/Pandas UDFs appear only where built-ins genuinely cannot
express the semantics.
"""

from etl_demos_spark.session import get_spark, configure_runtime

__all__ = ["get_spark", "configure_runtime"]
__version__ = "0.1.0"
