"""Source readers: batch/streaming files, Kafka+Avro CDC, JDBC snapshots."""

from cdc_pipeline_spark.sources.files import load_table, load_tables  # noqa: F401
