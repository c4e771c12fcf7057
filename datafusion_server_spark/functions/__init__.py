"""SQL dialect shims (DataFusion dialect -> Spark SQL)."""
