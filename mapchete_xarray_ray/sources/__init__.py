"""Sources: parquet pages reader helpers + zarr-archive-as-input."""
