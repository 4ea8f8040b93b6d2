"""Sources & sinks: deterministic synthetic pages generator and the
parquet/Iceberg table catalog used for stage checkpoints + metrics."""
