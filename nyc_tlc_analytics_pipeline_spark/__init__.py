"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference NYC-TLC analytics pipeline
(`pradrv/nyc-tlc-analytics-pipeline`), re-expressed Spark-first.

Layout
------
- ``core``       : SparkSession factory + pipeline config.
- ``sources``    : readers, schema registry, drift handling, generators,
                   sinks, testdata loaders.
- ``functions``  : scalar expression helpers shared across operators.
- ``operators``  : standardization (fact build), dimensions, aggregations,
                   quality checks, dedup, similarity, text analysis.
- ``plans``      : the conformance query catalog (testdata) and the 14
                   TLC analytics queries (domain).
- ``streaming``  : Structured Streaming jobs over the events stream.
"""

__version__ = "0.1.0"
