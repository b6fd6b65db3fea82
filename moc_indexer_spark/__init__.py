"""moc_indexer_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of money-on-chain/MOC-Indexer.

Not a port: the reference (an incremental blockchain ETL indexer + Mongo read
API, see SURVEY.md) is re-expressed Spark-first — DataFrame/SQL relational
operators optimized by Catalyst, DecimalType wei arithmetic, Structured
Streaming ingest with idempotent keyed upserts, and LLM-data-pipeline
operators (dedup / similarity / text analysis) designed for 100 TB scale.
"""

__version__ = "0.1.0"
