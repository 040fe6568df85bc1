"""Local replica of the verify driver's DuckDB-oracle comparison.

The driver compares each ``queries()[name]`` DataFrame against
``oracle_sql()[name]`` run in DuckDB by row-count + schema +
order-insensitive value-hash (__spark_entry__.py:3-7). This module
re-implements that check so every operator is verified locally at
sf0.01 AND sf0.1 *before* being declared (SURVEY.md §2.X rule 7).

Normalization mirrors what an order-insensitive value hash sees:
columns sorted by name, rows sorted, cell values coerced to plain
Python (Decimal→float, numpy→python, tz-naive µs datetimes).
"""

from __future__ import annotations

import datetime
import decimal
import math
from dataclasses import dataclass

import duckdb

from insight_gp_import_spark.tables import TABLES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """In-process DuckDB with the driver's view names over the same parquet."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        # Tag floats so 29516.0 (DuckDB floor) != 29516 (Spark floor):
        # Python's 1.0 == 1 would otherwise mask type mismatches that a
        # stringifying value-hash (the driver's) will catch.
        return ("f", repr(v + 0.0))
    if isinstance(v, int):
        return int(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None)
    if hasattr(v, "item"):  # numpy scalar
        return _norm_cell(v.item())
    return v


def _sort_key(row):
    return tuple((c is None, str(type(c).__name__), str(c)) for c in row)


def normalize(cols: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    ncols = [cols[i] for i in order]
    nrows = sorted(
        (tuple(_norm_cell(r[i]) for i in order) for r in rows), key=_sort_key
    )
    return ncols, nrows


@dataclass
class ParityResult:
    name: str
    ok: bool
    detail: str = ""


def compare(name: str, spark_df, oracle: str, sf_dir: str) -> ParityResult:
    """Run the Spark DataFrame and the DuckDB oracle; compare like the driver."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    con = duckdb_connect(sf_dir)
    try:
        cur = con.execute(oracle)
        d_cols = [d[0] for d in cur.description]
        d_rows = cur.fetchall()
    finally:
        con.close()

    sc, sr = normalize(s_cols, s_rows)
    dc, dr = normalize(d_cols, d_rows)
    if sc != dc:
        return ParityResult(name, False, f"schema mismatch: spark={sc} duckdb={dc}")
    if len(sr) != len(dr):
        return ParityResult(
            name, False, f"row-count mismatch: spark={len(sr)} duckdb={len(dr)}"
        )
    if sr != dr:
        diffs = [
            f"  spark={a!r}\n  duck ={b!r}"
            for a, b in zip(sr, dr)
            if a != b
        ][:3]
        return ParityResult(
            name, False, "value mismatch (first 3 rows):\n" + "\n".join(diffs)
        )
    return ParityResult(name, True, f"{len(sr)} rows")
