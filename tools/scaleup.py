"""Generate a K×-scaled dataset DERIVED from the driver's sf0.1 tables.

Usage: python tools/scaleup.py [K] [out_dir]   (default: 10 /tmp/mms_scale/sf1.0)

Purpose: measure how the engine's headline plans behave when the FACT
tables grow 10× while dimensions stay fixed — the shape of real growth
— without synthesizing any new values: every row is a driver row, fact
keys offset per replica so primary keys stay unique and the
orders⋈lineitem FK relation is preserved replica-locally.

This is a PERFORMANCE fixture only (see SCALING.md for results); all
correctness gates run exclusively on the driver's own testdata.

Scaled 10×: lineitem, orders (orderkey co-offset), events (event_id
offset; ts kept → same windows, 10× rows per window), documents
(doc_id offset; text kept → 10-deep exact-dup clusters), embeddings
(vec_id offset). Copied as-is: region, nation, customer, supplier,
part. Facts are written in 8 row groups so scans start parallel.
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


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/mms_scale/sf1.0"
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
        reps = []
        for i in range(k):
            cols = ", ".join(
                f"{c} + {i * stride} AS {c}" if c in keys else c
                for c in con.sql(f"SELECT * FROM read_parquet('{SRC}/{t}.parquet') LIMIT 0").columns
            )
            reps.append(f"SELECT {cols} FROM read_parquet('{SRC}/{t}.parquet')")
        union = " UNION ALL ".join(reps)
        con.execute(
            f"COPY ({union}) TO '{out}/{t}.parquet' "
            f"(FORMAT parquet, ROW_GROUP_SIZE {max(50_000, 600_000 * k // 80)})"
        )
        n = con.sql(f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')").fetchone()[0]
        print(f"scaled {t}: {n} rows")
    print(f"done -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
