"""data_pipeline_for_autonomous_vehicles_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference fleet-telemetry pipeline (`Sai-Santhosh/data-pipeline-for-autonomous-vehicles`),
re-expressed Spark-first: DataFrame/SQL logical plans optimized by Catalyst,
Structured Streaming for the streaming rules, and Pandas-UDF-backed operators
only where built-ins genuinely cannot express the semantics.

Layout:
    session    — SparkSession factory tuned for local + cluster execution
    catalog    — table loading / view registration over parquet test data
    schemas    — fixed StructType schemas for every stream/table
    functions  — scalar expression helpers (coercion, geo, portable hashing)
    operators  — relational/metric/dedup/similarity/text operators
    sources    — file readers, simulator, OpenSky-style normalizers
    streaming  — alert rules + structured-streaming pipelines
"""

__version__ = "0.1.0"
