"""Sources: NEM-CSV ingest (splitter + type inference) and the
evolved-schema parquet reader."""
