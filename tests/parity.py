"""Shared Spark<->DuckDB comparison mirroring the driver's correctness gate:
row count + schema-insensitive, order-insensitive value comparison with
columns sorted by name."""

from __future__ import annotations

import math
from datetime import date, datetime

import duckdb


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
    return str(v)


def rows_to_multiset(columns: list[str], rows) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def compare_spark_duckdb(spark_df, oracle_query: str, sf_dir: str) -> tuple[bool, str]:
    s_rows = spark_df.collect()
    s_cols = spark_df.columns
    d_cols, d_rows = run_oracle(oracle_query, sf_dir)
    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    sm = rows_to_multiset(s_cols, [[r[c] for c in s_cols] for r in s_rows])
    dm = rows_to_multiset(d_cols, d_rows)
    if sm != dm:
        diff_s = [r for r in sm if r not in dm][:3]
        diff_d = [r for r in dm if r not in sm][:3]
        return False, f"value mismatch; spark-only={diff_s} duckdb-only={diff_d}"
    return True, "ok"
