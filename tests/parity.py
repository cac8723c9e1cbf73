"""Mirror of the driver's correctness gate: run a registered query on
Spark and its oracle SQL on DuckDB over the same parquet tables, compare
row count + column names + order-insensitive canonical values.

Stricter than a hash compare: reports the first differing cells so
mismatches are debuggable.
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

import duckdb

from bigdata_storage_and_proccess_job_data_spark.catalog import TABLES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if hasattr(v, "item"):  # numpy scalar
        return _canon(v.item())
    return v


def _rows(tbl):
    """Arrow table -> (sorted cols, canonical sorted rows)."""
    cols = sorted(tbl.column_names)
    data = {c: tbl.column(c).to_pylist() for c in cols}
    n = tbl.num_rows
    recs = [tuple(_canon(data[c][i]) for c in cols) for i in range(n)]
    return cols, sorted(recs, key=lambda r: tuple(str(x) for x in r))


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = parity)."""
    problems: list[str] = []
    sp = spark_df.toArrow()
    du = con.execute(sql).arrow()

    if sorted(sp.column_names) != sorted(du.column_names):
        problems.append(
            f"columns differ: spark={sorted(sp.column_names)} "
            f"duckdb={sorted(du.column_names)}"
        )
        return problems
    if sp.num_rows != du.num_rows:
        problems.append(
            f"row counts differ: spark={sp.num_rows} duckdb={du.num_rows}"
        )

    cols, sp_rows = _rows(sp)
    _, du_rows = _rows(du)
    n_bad = 0
    for i, (a, b) in enumerate(zip(sp_rows, du_rows)):
        if a != b:
            for c, (x, y) in zip(cols, zip(a, b)):
                if x != y:
                    problems.append(f"row {i} col {c}: spark={x!r} duckdb={y!r}")
                    n_bad += 1
                    if n_bad >= 5:
                        problems.append("... (truncated)")
                        return problems
    return problems
