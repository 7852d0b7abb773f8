"""Shared Spark<->DuckDB comparison mirroring the driver's correctness gate:
row count + column-name schema check + order-insensitive value comparison with
columns sorted by name, PLUS a type-strict gate the round-1 harness lacked.

Round-1 lesson (VERDICT.md): the driver canonicalizes values in a typed
domain, so DuckDB HUGEINT (int128) vs Spark BIGINT hash-mismatched on
`q_sessionize` while this module's str()-based compare said PASS. The fix is
structural, not per-query: both result sets are now reduced to a canonical
*type label* per column (via the DuckDB Arrow result schema and the Spark
logical schema) and any label mismatch fails parity before values are even
compared. This catches the whole class — HUGEINT-vs-BIGINT,
INT32-vs-INT64, DECIMAL-vs-DOUBLE — locally at sf0.01/sf0.1.
"""

from __future__ import annotations

import math
from datetime import date, datetime

import duckdb
import pyarrow as pa


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        return repr(v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def canon_arrow_type(t: pa.DataType) -> str:
    """Canonical label for an Arrow type (DuckDB result side)."""
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_unsigned_integer(t):
        return f"uint{t.bit_width}"
    if pa.types.is_integer(t):
        return f"int{t.bit_width}"
    if pa.types.is_floating(t):
        return f"float{t.bit_width}"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        # Round-5 lesson (VERDICT r5 #2): the driver's schema gate failed
        # q_day_over_day on DuckDB TIMESTAMPTZ (Arrow timestamp[us,
        # tz=Etc/UTC]) vs Spark TimestampType, while every naive
        # timestamp[us] oracle passed. Encode BOTH the unit and the
        # tz-awareness so the local sweep predicts the driver.
        if t.tz is not None:
            return f"timestamp[{t.unit},tz]"
        return f"timestamp[{t.unit}]"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return f"list<{canon_arrow_type(t.value_type)}>"
    if pa.types.is_struct(t):
        fields = sorted((t.field(i).name, canon_arrow_type(t.field(i).type)) for i in range(t.num_fields))
        return "struct<" + ",".join(f"{n}:{ty}" for n, ty in fields) + ">"
    if pa.types.is_map(t):
        return f"map<{canon_arrow_type(t.key_type)},{canon_arrow_type(t.item_type)}>"
    return str(t)


def canon_spark_type(dt) -> str:
    """Canonical label for a Spark logical type, aligned with canon_arrow_type."""
    from pyspark.sql import types as T

    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.ByteType):
        return "int8"
    if isinstance(dt, T.ShortType):
        return "int16"
    if isinstance(dt, T.IntegerType):
        return "int32"
    if isinstance(dt, T.LongType):
        return "int64"
    if isinstance(dt, T.FloatType):
        return "float32"
    if isinstance(dt, T.DoubleType):
        return "float64"
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision},{dt.scale})"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        # Spark collects both timestamp flavors as naive microsecond
        # datetimes, and the driver accepts them against DuckDB's naive
        # timestamp[us] (observed r1-r5) but NOT against TIMESTAMPTZ
        # (the r5 q_day_over_day red row) -> label them as naive us.
        return "timestamp[us]"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.ArrayType):
        return f"list<{canon_spark_type(dt.elementType)}>"
    if isinstance(dt, T.StructType):
        fields = sorted((f.name, canon_spark_type(f.dataType)) for f in dt.fields)
        return "struct<" + ",".join(f"{n}:{ty}" for n, ty in fields) + ">"
    if isinstance(dt, T.MapType):
        return f"map<{canon_spark_type(dt.keyType)},{canon_spark_type(dt.valueType)}>"
    return dt.simpleString()


def rows_to_multiset(columns: list[str], rows) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


def run_oracle(sql: str, sf_dir: str):
    """Run the oracle SQL; returns (cols, rows, {col: canon_type_label}).

    Types come from the Arrow result schema so HUGEINT/INT32/DECIMAL are
    visible, while values are fetched as Python objects for the multiset.
    """
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    tbl = con.execute(sql).fetch_arrow_table()
    con.close()
    cols = tbl.column_names
    types = {f.name: canon_arrow_type(f.type) for f in tbl.schema}
    rows = [tuple(row[c] for c in cols) for row in tbl.to_pylist()]
    return cols, rows, types


def compare_spark_duckdb(spark_df, oracle_query: str, sf_dir: str) -> tuple[bool, str]:
    s_rows = spark_df.collect()
    s_cols = spark_df.columns
    s_types = {f.name: canon_spark_type(f.dataType) for f in spark_df.schema.fields}
    d_cols, d_rows, d_types = run_oracle(oracle_query, sf_dir)
    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    type_diffs = {
        c: (s_types[c], d_types[c]) for c in s_cols if s_types[c] != d_types[c]
    }
    if type_diffs:
        return False, f"type mismatch (spark, duckdb): {type_diffs}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    sm = rows_to_multiset(s_cols, [[r[c] for c in s_cols] for r in s_rows])
    dm = rows_to_multiset(d_cols, d_rows)
    if sm != dm:
        diff_s = [r for r in sm if r not in dm][:3]
        diff_d = [r for r in dm if r not in sm][:3]
        return False, f"value mismatch; spark-only={diff_s} duckdb-only={diff_d}"
    return True, "ok"
