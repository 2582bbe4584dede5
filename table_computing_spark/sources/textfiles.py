"""CSV / JSON-lines file sources and sinks.

The reference's only text-shaped inputs are Kafka/SLS message values
parsed as JSON (sp/input/KafkaStreamTable.java:71-194, SlsParser); the
file-based equivalents belong in a batch engine's source surface:
the same parse contract, but over data at rest. Both readers take an
EXPLICIT schema — schema inference reads the data twice and types
drift between runs, which is exactly the malformed-input class the
reference parses defensively at the source edge.

Malformed rows follow the reference's per-row discipline (SlsParser
surfaces bad records instead of failing the job): PERMISSIVE mode
plus a `_corrupt_record` column when `keep_corrupt=True`, so a 100 TB
ingest quarantines bad lines instead of dying at hour nine.

SEMANTICS TRAP (measured, r08): the corrupt flag is defined relative
to the PARSED schema, and Spark prunes the text parse to the columns a
query references — an aggregate touching only one field stops
flagging type errors in the others (45 vs 136 quarantined rows on the
same file). Quarantine queries must reference every schema field, or
land the full parse to parquet first. Spark also refuses plans whose
only referenced column is `_corrupt_record` (count() prunes to that);
cache the parse or persist it before counting.

Scale notes: CSV/JSON scans support column pruning but NOT parquet-
grade predicate pushdown or encodings — the intended pipeline is
read text once → write_compacted parquet (sources/compaction.py) →
everything downstream scans parquet. These readers are the ingest
edge, not the steady-state format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: T.StructType) -> T.StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(list(schema.fields) + [
        T.StructField(CORRUPT_COL, T.StringType(), True)
    ])


def load_csv(
    spark: SparkSession,
    path: str,
    schema: "T.StructType | str",
    header: bool = True,
    delimiter: str = ",",
    keep_corrupt: bool = False,
    **options: str,
) -> DataFrame:
    """CSV scan with an explicit schema; malformed rows land in
    `_corrupt_record` (keep_corrupt=True) or null out per-column
    (PERMISSIVE default) instead of failing the job."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if keep_corrupt:
        schema = _with_corrupt(schema)
    reader = (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("sep", delimiter)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def load_json(
    spark: SparkSession,
    path: str,
    schema: "T.StructType | str",
    keep_corrupt: bool = False,
    **options: str,
) -> DataFrame:
    """JSON-lines scan with an explicit schema — the file-at-rest twin
    of the Kafka value parser (sources/kafka.py json_value_columns):
    same nested-schema projection, same per-row malformed-input
    contract."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if keep_corrupt:
        schema = _with_corrupt(schema)
    reader = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def write_csv(df: DataFrame, path: str, header: bool = True,
              mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)
