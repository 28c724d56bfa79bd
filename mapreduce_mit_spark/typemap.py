"""Cross-engine type contract: Spark schema ↔ DuckDB oracle types.

The driver's value hash is type-tagged: a DuckDB column that types to
HUGEINT (e.g. a bare ``sum(BIGINT)``) hashes differently from Spark's
LongType even when every value is bit-identical — that single fact
caused both r2 correctness failures (q15, q56). This module makes the
contract mechanical:

- ``duck_type_for(dt)`` — the canonical DuckDB type string a Spark
  column of DataType ``dt`` must produce in its oracle.
- ``HAZARD_TYPES`` — DuckDB result types that have NO Spark twin and
  must never appear in an oracle output column (HUGEINT, DECIMAL —
  write ``CAST(sum(x) AS BIGINT)`` / integer-cents instead).

Used by tests/test_oracle_parity.py (the regression gate) and
tools/verify_local.py ``--types`` (the full-value sweep).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Substrings that flag a DuckDB result type with no exact Spark analog.
HAZARD_TYPES = ("HUGEINT", "DECIMAL")

_ATOMIC = {
    T.LongType: "BIGINT",
    T.IntegerType: "INTEGER",
    T.ShortType: "SMALLINT",
    T.ByteType: "TINYINT",
    T.DoubleType: "DOUBLE",
    T.FloatType: "FLOAT",
    T.StringType: "VARCHAR",
    T.BooleanType: "BOOLEAN",
    T.DateType: "DATE",
    T.TimestampType: "TIMESTAMP",
    T.TimestampNTZType: "TIMESTAMP",
    T.BinaryType: "BLOB",
}


def duck_type_for(dt: T.DataType) -> str:
    """Canonical DuckDB type string for a Spark DataType (recursive)."""
    for cls, name in _ATOMIC.items():
        if isinstance(dt, cls):
            return name
    if isinstance(dt, T.ArrayType):
        return duck_type_for(dt.elementType) + "[]"
    if isinstance(dt, T.MapType):
        return f"MAP({duck_type_for(dt.keyType)}, {duck_type_for(dt.valueType)})"
    if isinstance(dt, T.StructType):
        inner = ", ".join(f"{f.name} {duck_type_for(f.dataType)}" for f in dt.fields)
        return f"STRUCT({inner})"
    raise ValueError(f"no DuckDB mapping for Spark type {dt!r}")


def type_mismatches(
    spark_schema: T.StructType, duck_cols: list[str], duck_types: list[object]
) -> list[str]:
    """Human-readable list of per-column contract violations.

    Compares by column NAME (the driver sorts columns by name before
    hashing, so positional order is irrelevant). Reports hazard types
    even when the Spark side is absent, and any duck type that is not
    the canonical mapping of the Spark type.
    """
    problems: list[str] = []
    spark_by_name = {f.name: f.dataType for f in spark_schema.fields}
    for col, dtype in zip(duck_cols, duck_types):
        ds = str(dtype).upper()
        if any(h in ds for h in HAZARD_TYPES):
            problems.append(f"{col}: oracle types to {dtype} (no Spark twin — CAST it)")
            continue
        if col not in spark_by_name:
            problems.append(f"{col}: in oracle output but not in Spark schema")
            continue
        want = duck_type_for(spark_by_name[col])
        if ds != want.upper():
            problems.append(f"{col}: oracle {dtype} vs Spark-implied {want}")
    for name in spark_by_name:
        if name not in duck_cols:
            problems.append(f"{name}: in Spark schema but not in oracle output")
    return problems
