"""Sources & sinks: Cassandra snapshot ingestion (the reference's surface,
re-expressed as a Spark custom data source) and the Hadoop-side parquet sink."""
