"""Table adapters: testdata parquet loading + snapshot-manifest helpers."""
