"""Sources/sinks: parquet IO helpers + the synthetic pages table."""
