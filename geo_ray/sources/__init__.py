"""Sources & sinks: synthetic image table generator, image codecs,
parquet layout helpers."""
