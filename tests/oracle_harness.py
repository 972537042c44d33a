"""Local mirror of the driver's correctness gate.

Runs each registered query on Spark AND its DuckDB oracle over the
same parquet tables, then compares row count, column names, and exact
values (floats bitwise — the engine is designed so both sides produce
identical bits; see queries.py determinism rules).
"""

from __future__ import annotations

import math
import os

import duckdb

from msstreamingstack_spark.schemas import TABLE_NAMES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _norm_cell(v):
    if v is None:
        return ("\x00null",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("\x00nan",)
        return ("f", repr(v))
    if isinstance(v, bool):
        return ("b", v)
    return (type(v).__name__[0], str(v))


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return sorted(cols), out


def compare(spark_df, con, sql: str, max_report: int = 5):
    """Return (ok, message). Exact value comparison after sorting
    columns by name and rows by value."""
    pdf = spark_df.toPandas()
    s_cols = list(pdf.columns)
    s_rows = [tuple(r) for r in pdf.itertuples(index=False, name=None)]
    d = con.execute(sql)
    d_cols = [c[0] for c in d.description]
    d_rows = d.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}"
    _, sn = _norm_rows(s_cols, s_rows)
    _, dn = _norm_rows(d_cols, d_rows)
    if sn == dn:
        return True, f"ok ({len(s_rows)} rows)"
    diffs = []
    for i, (a, b) in enumerate(zip(sn, dn)):
        if a != b:
            diffs.append(f"row {i}:\n  spark={a}\n  duck ={b}")
            if len(diffs) >= max_report:
                break
    return False, "value mismatch:\n" + "\n".join(diffs)
