"""Type lattice + schema builder.

The reference's entire type system is 5 scalar types
(table/Type.java:10-15) with a runtime-class mapping
(table/Type.java:22-45) and an insertion-ordered column→type builder
(table/ColumnTypeBuilder.java:8-21). We map them onto Spark types and
keep the builder API shape for source declarations; unlike the
reference, derived schemas come from Catalyst expression typing instead
of first-non-null inference (table/Column.java:154-198).
"""

from __future__ import annotations

import enum
from collections import OrderedDict

from pyspark.sql import types as T


class Type(enum.Enum):
    """ref table/Type.java:10-15 — the 5-type lattice, plus the Spark
    types the boundary APIs need (epoch-ms BIGINT doubles as time in the
    reference; we additionally admit TIMESTAMP at the API edge)."""

    VARCHAR = "varchar"
    INT = "int"
    BIGINT = "bigint"
    DOUBLE = "double"
    BIGDECIMAL = "bigdecimal"
    # Extensions beyond the reference lattice (needed for testdata and
    # the training-data operators; the reference has no nested types).
    TIMESTAMP = "timestamp"
    BOOLEAN = "boolean"
    FLOAT_ARRAY = "float_array"
    BINARY = "binary"

    def to_spark(self) -> T.DataType:
        return _SPARK_TYPES[self]

    @staticmethod
    def from_python(value: object) -> "Type":
        """ref table/Type.java:22-45 (runtime class → Type)."""
        if isinstance(value, str | bytes):
            return Type.VARCHAR
        if isinstance(value, bool):
            return Type.BOOLEAN
        if isinstance(value, int):
            # Java distinguishes Integer/Long; Python ints map by range.
            return Type.INT if -(2**31) <= value < 2**31 else Type.BIGINT
        if isinstance(value, float):
            return Type.DOUBLE
        import decimal

        if isinstance(value, decimal.Decimal):
            return Type.BIGDECIMAL
        raise TypeError(f"unsupported scalar type: {type(value).__name__}")


_SPARK_TYPES: dict[Type, T.DataType] = {
    Type.VARCHAR: T.StringType(),
    Type.INT: T.IntegerType(),
    Type.BIGINT: T.LongType(),
    Type.DOUBLE: T.DoubleType(),
    # Reference BigDecimal is arbitrary-precision (table/BigDecimalColumn.java);
    # DecimalType(38,18) is the widest portable bound.
    Type.BIGDECIMAL: T.DecimalType(38, 18),
    Type.TIMESTAMP: T.TimestampType(),
    Type.BOOLEAN: T.BooleanType(),
    Type.FLOAT_ARRAY: T.ArrayType(T.FloatType()),
    Type.BINARY: T.BinaryType(),
}


class ColumnTypeBuilder:
    """Insertion-ordered column→Type map → StructType.

    ref table/ColumnTypeBuilder.java:8-21. Usage mirrors the reference:

        schema = (ColumnTypeBuilder()
                  .column("__time__", Type.BIGINT)
                  .column("commodity_id", Type.INT)
                  .build())
    """

    def __init__(self) -> None:
        self._cols: OrderedDict[str, Type] = OrderedDict()

    def column(self, name: str, typ: Type) -> "ColumnTypeBuilder":
        if name in self._cols:
            raise ValueError(f"duplicate column {name!r}")
        self._cols[name] = typ
        return self

    def build(self) -> T.StructType:
        return T.StructType(
            [T.StructField(n, t.to_spark(), nullable=True) for n, t in self._cols.items()]
        )

    def types(self) -> "OrderedDict[str, Type]":
        return OrderedDict(self._cols)
