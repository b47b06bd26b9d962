"""Dataset sources: parquet pages corpora + parallel synthetic generation."""
