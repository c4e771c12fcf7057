"""Data-source ingestion (reference lib/src/data_source/*).

- ``readers``   buffered CSV / JSON array / ndJSON / Parquet from bytes,
                local paths, or HTTP — the eager-materialize path.
- ``jsonpath``  minimal JSONPath evaluator for the A4 extraction option.
- ``registry``  (format x scheme) dispatch; lazy listing registration for
                object stores; gated Avro / Delta / JDBC / Flight.
- ``plugins``   Python connector-plugin registry (scheme -> callable).
"""
