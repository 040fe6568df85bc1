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
import hashlib
import json
import math
import os
from dataclasses import dataclass

import duckdb

from insight_gp_import_spark.tables import TABLES

# Certified oracle outputs (tools/certify_oracle.py): for oracles too
# slow to re-run every sweep (~1 h DuckDB recursive CTEs at sf0.1),
# compare() checks the Spark side against a committed digest of the
# oracle's normalized output instead of re-executing the SQL. The
# certificate is keyed by sha256 of the oracle text — any edit to the
# SQL invalidates it and compare() falls back to the live oracle.
_CERT_PATH = os.path.join(os.path.dirname(__file__), "certified_oracles.json")
_CERTS: dict | None = None


def _certificates() -> dict:
    global _CERTS
    if _CERTS is None:
        try:
            with open(_CERT_PATH) as f:
                _CERTS = json.load(f)
        except FileNotFoundError:
            _CERTS = {}
    return _CERTS


# Memo for per-file content hashes; (size, mtime_ns) is only the CACHE
# invalidation key — the digest value itself is pure content, so a
# copy/checkout/touch of byte-identical testdata keeps the same digest
# (r6 ADVICE: the old name/size/mtime_ns digest broke certificates on
# any mtime churn, silently dropping back to multi-minute live oracles).
_FILE_SHA: dict[tuple[str, int, int], str] = {}


def _content_sha(path: str, st: os.stat_result) -> str:
    key = (path, st.st_size, st.st_mtime_ns)
    if key not in _FILE_SHA:
        h = hashlib.sha256()
        with open(path, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        _FILE_SHA[key] = h.hexdigest()
    return _FILE_SHA[key]


def sf_dir_digest(sf_dir: str) -> str:
    """Fingerprint of the input parquet a certificate was minted against.

    Certificates key on (op, sf, oracle-SQL sha) — but the oracle's
    OUTPUT also depends on the INPUT data. If testdata is ever
    regenerated, a certificate would silently assert the stale output;
    binding each certificate to a digest of the parquet files
    (name, size, sha256-of-bytes) makes the fast path fall back to the
    live oracle the moment the data changes — and ONLY then: mtime is
    deliberately excluded so byte-identical copies keep certificates
    valid (full read is ~17 MB per sf dir, memoized per process).
    """
    entries = []
    for t in sorted(TABLES):
        p = os.path.join(sf_dir, f"{t}.parquet")
        try:
            st = os.stat(p)
            entries.append((t, st.st_size, _content_sha(p, st)))
        except FileNotFoundError:
            entries.append((t, -1, "missing"))
    return hashlib.sha256(repr(entries).encode()).hexdigest()


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


def _canon_duck_type(t: str) -> str:
    """Canonicalize a DuckDB DESCRIBE column_type to Spark simpleString form.

    Deliberately does NOT alias HUGEINT (int128) to bigint: the round-1
    driver hash failure (agg_funnel_conversion, CORRECTNESS_r01.json) was a
    DuckDB ``sum(int)`` → HUGEINT column whose *values* equalled Spark's
    BIGINT — the driver's serialization-sensitive value-hash still rejected
    it. Keeping hugeint distinct makes that class of failure fail locally,
    pre-declaration (ADVICE.md item 2).
    """
    t = t.strip()
    if t.endswith("[]"):
        return f"array<{_canon_duck_type(t[:-2])}>"
    u = t.upper()
    simple = {
        "VARCHAR": "string",
        "INTEGER": "int",
        "BIGINT": "bigint",
        "HUGEINT": "hugeint",
        "UBIGINT": "ubigint",
        "SMALLINT": "smallint",
        "TINYINT": "tinyint",
        "DOUBLE": "double",
        "FLOAT": "float",
        "BOOLEAN": "boolean",
        "DATE": "date",
        "TIMESTAMP": "timestamp",
        "BLOB": "binary",
    }
    if u in simple:
        return simple[u]
    if u.startswith("DECIMAL"):
        return u.lower().replace(" ", "")
    return u.lower()


def declared_types(con: duckdb.DuckDBPyConnection, oracle: str) -> dict[str, str]:
    """Column → canonical declared type for an oracle query (via DESCRIBE)."""
    con.execute(f"CREATE OR REPLACE TEMP VIEW __oracle_probe AS {oracle}")
    rows = con.execute("DESCRIBE __oracle_probe").fetchall()
    return {r[0]: _canon_duck_type(r[1]) for r in rows}


def type_family(canon: str) -> str:
    """Collapse a canonical type to its pandas/arrow value-representation.

    Calibrated against round-1 driver evidence: ops whose columns differ
    only within {tinyint..bigint} or {timestamp, timestamp_ntz} DID
    hash-match (text_normalize, sim_knn_join, text_tfidf — all driver
    pass), so width-only integer and tz-naive timestamp diffs are fine.
    HUGEINT did NOT (agg_funnel_conversion): int128 leaves the int64
    family when serialized (pandas → float64/object), so it is its own
    family and flags against bigint.
    """
    if canon.startswith("array<") and canon.endswith(">"):
        return f"array<{type_family(canon[6:-1])}>"
    if canon in ("tinyint", "smallint", "int", "bigint"):
        return "int"
    if canon in ("float", "double"):
        return "float"
    if canon in ("timestamp", "timestamp_ntz"):
        return "timestamp"
    if canon.startswith("decimal"):
        return "decimal"
    return canon


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


def _compare_certified(name: str, cert: dict, s_cols, s_types, s_rows) -> ParityResult:
    sc, sr = normalize(s_cols, s_rows)
    if sc != cert["cols"]:
        return ParityResult(
            name, False, f"schema mismatch vs certificate: spark={sc} cert={cert['cols']}"
        )
    s_fams = [type_family(s_types[c]) for c in sc]
    if s_fams != cert["type_families"]:
        return ParityResult(
            name, False,
            f"declared-type mismatch vs certificate: spark={s_fams} "
            f"cert={cert['type_families']}",
        )
    if len(sr) != cert["rows"]:
        return ParityResult(
            name, False, f"row-count mismatch: spark={len(sr)} cert={cert['rows']}"
        )
    payload = repr((sc, cert["type_families"], sr)).encode()
    if hashlib.sha256(payload).hexdigest() != cert["sha256"]:
        return ParityResult(
            name, False,
            "value-hash mismatch vs certificate (the certificate may be "
            "stale — re-check with `python tools/certify_oracle.py "
            "--verify`, which re-runs the live oracle)",
        )
    return ParityResult(name, True, f"{len(sr)} rows (certified oracle)")


def compare(name: str, spark_df, oracle: str, sf_dir: str) -> ParityResult:
    """Run the Spark DataFrame and the DuckDB oracle; compare like the driver."""
    s_cols = spark_df.columns
    s_types = {f.name: f.dataType.simpleString() for f in spark_df.schema.fields}
    s_rows = [tuple(r) for r in spark_df.collect()]
    cert = _certificates().get(name, {}).get(os.path.basename(sf_dir.rstrip("/")))
    if (
        cert
        and cert["sql_sha256"] == hashlib.sha256(oracle.encode()).hexdigest()
        and cert.get("sf_digest") == sf_dir_digest(sf_dir)
        # either guard failing (edited SQL / regenerated testdata / old
        # digest-less certificate) falls through to the live oracle below
    ):
        return _compare_certified(name, cert, s_cols, s_types, s_rows)
    con = duckdb_connect(sf_dir)
    try:
        d_types = declared_types(con, oracle)
        cur = con.execute(oracle)
        d_cols = [d[0] for d in cur.description]
        d_rows = cur.fetchall()
    finally:
        con.close()

    sc, sr = normalize(s_cols, s_rows)
    dc, dr = normalize(d_cols, d_rows)
    if sc != dc:
        return ParityResult(name, False, f"schema mismatch: spark={sc} duckdb={dc}")
    type_diffs = [
        f"{c}: spark={s_types[c]} duckdb={d_types[c]}"
        for c in sc
        if type_family(s_types[c]) != type_family(d_types[c])
    ]
    if type_diffs:
        return ParityResult(
            name, False, "declared-type mismatch: " + "; ".join(type_diffs)
        )
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
