"""Sources and sinks — file-based (Parquet/JSON) with quarantine and dedup."""
