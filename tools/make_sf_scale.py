"""Deterministic sf-scale-up generator (round-4 verdict item 6).

The driver corpus ships at sf0.001/0.01/0.1 without its generator, so
scaling-curve evidence needs a locally derived larger corpus. This tool
replicates an existing sf directory REP times with CONSISTENT key
offsets — every foreign key is shifted by the same replica stride as
its parent table, so join cardinalities, group counts and skew shapes
scale linearly and referential integrity is exact:

  customer +15000/rep, supplier +1000, part +20000, orders +150000
  (o_custkey follows customer), lineitem (all three FKs follow their
  parents), events +100000 (user_id follows customer), documents
  +5000, embeddings +2000.  region/nation are dims and stay fixed.

Documents get a per-replica TOKEN-ALPHABET mutation (tokens whose md5
starts with 0..4 are suffixed ``~r<i>`` in replica i>0): within a
replica the token alphabet is a bijection of the original, so every
original Jaccard relationship is preserved exactly; ACROSS replicas
roughly a third of the alphabet differs, so J(copy_r, copy_s) ≈ 0.5 —
far below the 0.8 near-dup threshold. Without this, every original
near-dup pair would fan out ×REP², making the dedup family
artificially quadratic; with it, near-dup pair volume scales ×REP,
like a real corpus growing. n_chars is recomputed from the mutated
text. Embeddings replicate exactly (cross-replica sim-1 pairs grow
linearly in groups, which is the realistic 'exact dup' shape).

Usage: python tools/make_sf_scale.py [src_dir] [dst_dir] [reps]
Defaults: /root/testdata/sf0.1 /tmp/igis_sf1 10   (≈ sf1)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/igis_sf1"
REP = int(sys.argv[3]) if len(sys.argv) > 3 else 10

STRIDES = {
    "customer": ("c_custkey", 15_000),
    "supplier": ("s_suppkey", 1_000),
    "part": ("p_partkey", 20_000),
    "orders": ("o_orderkey", 150_000),
    "documents": ("doc_id", 5_000),
    "embeddings": ("vec_id", 2_000),
    "events": ("event_id", 100_000),
}
CUST_STRIDE = STRIDES["customer"][1]

MUTATE = (
    "array_to_string(list_transform(string_split(text, ' '), "
    "t -> CASE WHEN r.i > 0 AND substr(md5(t), 1, 1) IN ('0','1','2','3','4') "
    "THEN t || '~' || r.i ELSE t END), ' ')"
)


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    rep = f"(SELECT unnest(range({REP})) AS i) r"

    def emit(name: str, select: str) -> None:
        con.execute(
            f"COPY ({select}) TO '{DST}/{name}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{DST}/{name}.parquet')"
        ).fetchone()[0]
        print(f"{name}: {n} rows")

    def src(name: str) -> str:
        return f"read_parquet('{SRC}/{name}.parquet')"

    for dim in ("region", "nation"):
        emit(dim, f"SELECT * FROM {src(dim)}")

    emit(
        "customer",
        f"SELECT c_custkey + r.i * {CUST_STRIDE} AS c_custkey, c_name, "
        f"c_nationkey, c_acctbal, c_mktsegment FROM {src('customer')}, {rep}",
    )
    emit(
        "supplier",
        f"SELECT s_suppkey + r.i * 1000 AS s_suppkey, s_name, s_nationkey, "
        f"s_acctbal FROM {src('supplier')}, {rep}",
    )
    emit(
        "part",
        f"SELECT p_partkey + r.i * 20000 AS p_partkey, p_name, p_brand, "
        f"p_type, p_size, p_retailprice FROM {src('part')}, {rep}",
    )
    emit(
        "orders",
        f"SELECT o_orderkey + r.i * 150000 AS o_orderkey, "
        f"o_custkey + r.i * {CUST_STRIDE} AS o_custkey, o_orderstatus, "
        f"o_totalprice, o_orderdate, o_orderpriority FROM {src('orders')}, {rep}",
    )
    emit(
        "lineitem",
        f"SELECT l_orderkey + r.i * 150000 AS l_orderkey, "
        f"l_partkey + r.i * 20000 AS l_partkey, "
        f"l_suppkey + r.i * 1000 AS l_suppkey, l_linenumber, l_quantity, "
        f"l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, "
        f"l_shipdate FROM {src('lineitem')}, {rep}",
    )
    emit(
        "events",
        f"SELECT event_id + r.i * 100000 AS event_id, ts, "
        f"user_id + r.i * {CUST_STRIDE} AS user_id, event_type, value, props "
        f"FROM {src('events')}, {rep}",
    )
    emit(
        "documents",
        f"SELECT doc_id + r.i * 5000 AS doc_id, {MUTATE} AS text, lang, "
        f"source, CAST(len({MUTATE}) AS BIGINT) AS n_chars "
        f"FROM {src('documents')}, {rep}",
    )
    emit(
        "embeddings",
        f"SELECT vec_id + r.i * 2000 AS vec_id, embedding, label "
        f"FROM {src('embeddings')}, {rep}",
    )


if __name__ == "__main__":
    main()
