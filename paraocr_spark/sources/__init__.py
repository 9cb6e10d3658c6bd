"""Sources & sinks: synthetic pages generator, iceberg-or-parquet IO."""
