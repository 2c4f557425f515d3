"""Sources & sinks: GeoJSON snapshot stream, partitioned parquet, size metrics."""
