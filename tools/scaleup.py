"""Generate a K×-scaled dataset DERIVED from the driver's sf0.1 tables.

Usage: python tools/scaleup.py [K] [out_dir] [--organic]
       (default: 10 /tmp/mms_scale/sf1.0)

Purpose: measure how the engine's headline plans behave when the FACT
tables grow 10× while dimensions stay fixed — the shape of real growth
— without inventing a new generator: every row derives from a driver
row, fact keys offset per replica so primary keys stay unique and the
orders⋈lineitem FK relation is preserved replica-locally.

Two modes:

- CLONE (default): replicas are byte-identical except the offset keys.
  Adversarial for dedup (10-deep exact-dup clusters) but compresses
  trivially for scans/aggregation — parquet dictionary/RLE encodes the
  repeated values, so a 10× clone fixture under-measures scan cost.
- ``--organic``: every replica's VALUES are deterministically
  perturbed by a per-(row, replica) hash — prices/quantities jitter a
  few percent, dates shift ±3 days, event values jitter, document
  texts get per-replica token substitutions (near-dup structure
  survives, exact-dup collapse doesn't), embeddings get small
  element-wise jitter. Cardinalities and distributions stay
  realistic; dictionary compression no longer collapses replicas, so
  scan/agg/join costs scale like real growth. Replica 0 is the
  original rows unchanged in both modes.

This is a PERFORMANCE fixture only (see SCALING.md for results); all
correctness gates run exclusively on the driver's own testdata.

Scaled K×: lineitem, orders (orderkey co-offset), events (event_id
offset), documents (doc_id offset), embeddings (vec_id offset).
Copied as-is: region, nation, customer, supplier, part. Facts are
written in multiple row groups so scans start parallel.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

COPY = ("region", "nation", "customer", "supplier", "part")
# table -> (key columns to offset, offset stride)
SCALE = {
    "orders": (("o_orderkey",), "orderkey"),
    "lineitem": (("l_orderkey",), "orderkey"),
    "events": (("event_id",), "event_id"),
    "documents": (("doc_id",), "doc_id"),
    "embeddings": (("vec_id",), "vec_id"),
}

# per-(table, replica) deterministic jitter expressions for --organic:
# {col: SQL using the original col and `J` (a [0,1) double derived from
# hash(key, replica))}. Only replicas i >= 1 are perturbed.
_J = "((hash({key} * 131 + {i}) % 10000) / 10000.0)"


def _organic_cols(table: str, cols: list[str], i: int) -> str:
    """SELECT list for replica ``i`` of ``table`` in organic mode."""
    keys, _stride = SCALE[table]
    key = keys[0]
    j = _J.format(key=key, i=i)
    out = []
    for c in cols:
        expr = c
        if table == "lineitem":
            if c == "l_extendedprice":
                expr = f"round(l_extendedprice * (0.95 + 0.1 * {j}), 2)"
            elif c == "l_quantity":
                expr = f"CAST(1 + ((CAST(l_quantity AS BIGINT) + CAST(50 * {j} AS BIGINT)) % 50) AS DOUBLE)"
            elif c == "l_discount":
                expr = f"round(((CAST(l_discount * 100 AS BIGINT) + CAST(10 * {j} AS BIGINT)) % 11) / 100.0, 2)"
            elif c == "l_shipdate":
                expr = f"l_shipdate + to_days(CAST(7 * {j} AS INTEGER) - 3)"
            elif c == "l_suppkey":
                # re-spread the FK so per-supplier groups grow organically
                expr = f"1 + ((l_suppkey + CAST(100 * {j} AS BIGINT)) % (SELECT max(s_suppkey) FROM read_parquet('{SRC}/supplier.parquet')))"
        elif table == "orders":
            if c == "o_totalprice":
                expr = f"round(o_totalprice * (0.95 + 0.1 * {j}), 2)"
            elif c == "o_orderdate":
                expr = f"o_orderdate + to_days(CAST(7 * {j} AS INTEGER) - 3)"
        elif table == "events":
            if c == "value":
                expr = f"round(value * (0.9 + 0.2 * {j}), 3)"
            elif c == "ts":
                # shift within ±30 s: window populations stay realistic
                # but timestamps stop being byte-identical across replicas
                expr = f"ts + to_microseconds(CAST(60000000 * {j} AS BIGINT) - 30000000)"
        elif table == "documents":
            if c == "n_chars":
                expr = "n_chars + 10"  # the appended ' v<i>x<hex6>' marker
            elif c == "text":
                # substitute a per-replica marker into ~every doc: exact
                # dups collapse within a replica as before, but replicas
                # are near-dups of each other, not byte clones
                expr = (
                    f"concat(text, ' v', CAST({i} AS VARCHAR), 'x', "
                    f"substr(md5(concat(CAST(doc_id AS VARCHAR), ':', CAST({i} AS VARCHAR))), 1, 6))"
                )
        elif table == "embeddings":
            if c == "embedding":
                expr = (
                    f"CAST(list_transform(embedding, x -> x + "
                    f"(hash(vec_id * 131 + {i}) % 100) / 2000.0 - 0.025) "
                    f"AS FLOAT[])"
                )
        out.append(f"{expr} AS {c}" if expr != c else c)
    return ", ".join(out)


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--organic"]
    organic = "--organic" in sys.argv[1:]
    k = int(argv[0]) if len(argv) > 0 else 10
    out = argv[1] if len(argv) > 1 else "/tmp/mms_scale/sf1.0"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads TO 16")

    strides = {
        "orderkey": con.sql(
            f"SELECT max(o_orderkey) + 1 FROM read_parquet('{SRC}/orders.parquet')"
        ).fetchone()[0],
        "event_id": con.sql(
            f"SELECT max(event_id) + 1 FROM read_parquet('{SRC}/events.parquet')"
        ).fetchone()[0],
        "doc_id": con.sql(
            f"SELECT max(doc_id) + 1 FROM read_parquet('{SRC}/documents.parquet')"
        ).fetchone()[0],
        "vec_id": con.sql(
            f"SELECT max(vec_id) + 1 FROM read_parquet('{SRC}/embeddings.parquet')"
        ).fetchone()[0],
    }

    for t in COPY:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT parquet)"
        )
        print(f"copied {t}")

    for t, (keys, stride_name) in SCALE.items():
        stride = strides[stride_name]
        all_cols = con.sql(
            f"SELECT * FROM read_parquet('{SRC}/{t}.parquet') LIMIT 0"
        ).columns
        reps = []
        for i in range(k):
            base = (
                _organic_cols(t, all_cols, i)
                if organic and i > 0
                else ", ".join(all_cols)
            )
            cols = ", ".join(
                f"{c} + {i * stride} AS {c}" if c in keys else c
                for c in all_cols
            )
            reps.append(
                f"SELECT {cols} FROM ("
                f"SELECT {base} FROM read_parquet('{SRC}/{t}.parquet'))"
            )
        union = " UNION ALL ".join(reps)
        con.execute(
            f"COPY ({union}) TO '{out}/{t}.parquet' "
            f"(FORMAT parquet, ROW_GROUP_SIZE {max(50_000, 600_000 * k // 80)})"
        )
        n = con.sql(
            f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"scaled {t}: {n} rows ({'organic' if organic else 'clone'})")
    print(f"done -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
