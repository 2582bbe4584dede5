"""Sources & sinks (ref sp/input, sp/output).

parquet  — testdata star-schema loader (scale fixtures)
jdbc     — partitioned scan + DDL/append sink (ref MysqlStreamTable/MysqlOutputTable)
kafka    — JSON stream source/sink builders       (ref KafkaStreamTable/KafkaOutputTable)
memory   — programmatic batch/stream test source  (ref InsertableStreamTable)
"""

from table_computing_spark.sources.parquet import load_table, load_tables

__all__ = ["load_table", "load_tables"]
