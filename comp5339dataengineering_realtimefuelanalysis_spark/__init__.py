"""PySpark-native analytics engine with the query and data-processing
capabilities of WYJ-Jason/COMP5339DataEngineering-RealTimeFuelAnalysis.

The reference is a single-process pandas/MQTT/SQLite streaming pipeline
(see SURVEY.md); this package re-expresses every one of its operators as
idiomatic, scale-ready Spark: StructType schemas, pure DataFrame->DataFrame
transforms (no row-at-a-time Python UDFs), Structured Streaming runners,
and Parquet at rest.

Layout:
  schemas            -- fixed StructTypes (reference contract, SURVEY.md §1.2)
  functions/         -- scalar/column expression helpers (SURVEY.md §2.10)
  operators/         -- named relational operators (SURVEY.md §2 inventory)
  sources/           -- batch + streaming readers, JSON envelope split
  sinks/             -- parquet append / quarantine / memory sinks
  plans/             -- query definitions (fuel Q1-Q3 + driver-table registry)
  streaming/         -- Structured Streaming wiring of the same operators
"""

__version__ = "0.1.0"
