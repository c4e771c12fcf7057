"""datafusion_server_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of the reference system
``neural-runner/datafusion-server`` (a Rust HTTP/Arrow-Flight SQL server
wrapping Apache DataFusion; see SURVEY.md) as an idiomatic PySpark
engine: Spark SQL + Catalyst is the query engine, DataFrames are the
table abstraction, temp views per SparkSession.newSession() are the
session catalog.

Layout
------
- ``session``    SparkSession construction + the server-session registry
                 (reference: lib/src/context/session_manager.rs).
- ``schema``     JSON schema DSL <-> Spark StructType mapper
                 (reference: lib/src/data_source/schema.rs).
- ``sources``    data-source ingestion: csv/json/ndjson/parquet/avro/delta/
                 jdbc/flight/object stores (reference: lib/src/data_source/*).
- ``operators``  merge processor, dedup, similarity search, text analysis,
                 multimodal plumbing (reference: lib/src/context/session.rs:550-656
                 plus north-star extensions).
- ``functions``  SQL dialect shims (DataFusion dialect -> Spark SQL).
- ``queries``    the query inventory exported through __spark_entry__.py.
"""

__version__ = "0.1.0"
