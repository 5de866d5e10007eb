"""PySpark-native analytics engine with the query and data-processing
capabilities of ``streamingfast/substreams-sink-graph-load``.

The reference (see /root/reference, studied for behavior only) is a streaming
ETL injector: entity-change events -> SCD-2 versioned tables -> graph-node
compatible Postgres CSV, plus a proof-of-indexing hash chain.  This package
re-expresses every capability Spark-first:

- ``schema``     GraphQL entity schema -> Spark StructType (ref schema/entities.go)
- ``sources``    JSONL/parquet change-log scans (ref csvprocessor/processor.go)
- ``operators``  SCD-2 window composition, Postgres CSV rendering, bundling,
                 dedup / similarity / text-stats / multimodal extensions
- ``stablehash`` pure-Python port of the graph-node stable-hash + POI monoid
                 (ref stablehash/, poi/)
- ``plans``      named query registry exercised by the driver's DuckDB oracle
- ``streaming``  Structured Streaming wrapper for the `run` entry point
- ``sinks``      bundled CSV sink, Postgres COPY sink
"""

__version__ = "0.1.0"
