"""Build a DIRTY copy of a testdata fixture for robustness sweeps.

Every real 100 TB corpus carries malformed rows — NULL/empty text,
empty token lists after normalization, NULL or zero-length embedding
vectors, NULL event times, NULL descriptive attributes — and under
Spark 4's ANSI defaults a single such row can be task-fatal (the
round-8 zero-norm-cosine and U+0130 incidents were exactly this
class, fixed ad hoc). This tool systematizes the sweep: it copies a
fixture directory, appending a small set of malformed rows to each
table WITHOUT changing any schema (pyarrow, original arrow schema
preserved — events keeps its TIMESTAMP(NANOS) physical type), so the
whole oracle harness (tools/verify_local.py) can replay against it.
Both engines read the same dirt; a query is robust when it still
matches its oracle, and task-fatal breakage shows up as a Spark error.

Used by tests/test_dirty_inputs.py (the catalog-wide property test)
and runnable standalone:

    python tools/dirty_fixture.py /root/testdata/sf0.001 /tmp/dirty_sf0.001
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

# doc_ids / vec_ids / event_ids far above any fixture's range
_BASE = 900_000


def _dirty_rows(table: str, schema: pa.Schema, src: pa.Table) -> list[dict]:
    """Malformed-but-schema-valid rows for one table. Keys are chosen
    outside the clean id range; 900_025 is divisible by 25 so the
    documents dirt lands on BOTH sides of the eval protocol."""
    if table == "documents":
        return [
            # NULL text — tokenize/md5/length must all pass NULL through
            dict(doc_id=_BASE + 1, text=None, lang="en", source="dirty", n_chars=None),
            # empty text — zero tokens, zero shingles, zero n-grams
            dict(doc_id=_BASE + 2, text="", lang="en", source="dirty", n_chars=0),
            # non-letter runs only — tokenizer yields an EMPTY token list
            dict(doc_id=_BASE + 3, text="12345 !!! ??? --- 678", lang="en",
                 source="dirty", n_chars=21),
            # NULL lang / NULL source — group keys go NULL
            dict(doc_id=_BASE + 4, text="plain enough words here", lang=None,
                 source="dirty", n_chars=23),
            dict(doc_id=_BASE + 6, text="more plain words here too", lang="en",
                 source=None, n_chars=25),
            # the EVAL side of the decontamination protocol gets a NULL
            # text row too (900025 % 25 == 0)
            dict(doc_id=_BASE + 25, text=None, lang="en", source="dirty",
                 n_chars=None),
        ]
    if table == "embeddings":
        dim = len(src.column("embedding")[0].as_py())
        return [
            dict(vec_id=_BASE + 1, embedding=None, label=0),       # NULL vector
            dict(vec_id=_BASE + 2, embedding=[], label=0),         # zero-length
            dict(vec_id=_BASE + 3, embedding=[0.0] * dim, label=0),  # zero-norm
            dict(vec_id=_BASE + 4,
                 embedding=[1.0 / (i + 1) for i in range(dim)], label=None),
        ]
    if table == "events":
        ts = src.column("ts")[0].as_py()  # a valid in-range timestamp
        return [
            dict(event_id=_BASE + 1, ts=ts, user_id=None, event_type="dirty",
                 value=1.0, props=None),
            dict(event_id=_BASE + 2, ts=ts, user_id=1, event_type=None,
                 value=None, props="{}"),
            # NULL event time — watermarked/windowed paths must agree
            # with the oracle on what happens to it
            dict(event_id=_BASE + 3, ts=None, user_id=1, event_type="dirty",
                 value=1.0, props="{}"),
        ]
    if table == "customer":
        nk = src.column("c_nationkey")[0].as_py()
        return [
            dict(c_custkey=_BASE + 1, c_name=None, c_nationkey=nk,
                 c_acctbal=None, c_mktsegment=None),
        ]
    if table == "orders":
        ck = src.column("o_custkey")[0].as_py()
        od = src.column("o_orderdate")[0].as_py()
        return [
            dict(o_orderkey=_BASE + 1, o_custkey=ck, o_orderstatus=None,
                 o_totalprice=None, o_orderdate=od, o_orderpriority=None),
        ]
    if table == "lineitem":
        ok = src.column("l_orderkey")[0].as_py()
        sd = src.column("l_shipdate")[0].as_py()
        return [
            dict(l_orderkey=ok, l_partkey=None, l_suppkey=None,
                 l_linenumber=_BASE + 1, l_quantity=None, l_extendedprice=None,
                 l_discount=None, l_tax=None, l_returnflag=None,
                 l_linestatus=None, l_shipdate=sd),
            dict(l_orderkey=ok, l_partkey=None, l_suppkey=None,
                 l_linenumber=_BASE + 2, l_quantity=1.0, l_extendedprice=1.0,
                 l_discount=0.0, l_tax=0.0, l_returnflag="D",
                 l_linestatus="D", l_shipdate=None),
        ]
    return []


def make_dirty(sf_src: str, out_dir: str) -> list[str]:
    """Copy every ``<table>.parquet`` from ``sf_src`` to ``out_dir``
    with that table's dirty rows appended (schema byte-preserved).
    Returns the list of tables that received dirt."""
    os.makedirs(out_dir, exist_ok=True)
    dirtied = []
    for fn in sorted(os.listdir(sf_src)):
        if not fn.endswith(".parquet"):
            continue
        table = fn[: -len(".parquet")]
        src = pq.read_table(os.path.join(sf_src, fn))
        rows = _dirty_rows(table, src.schema, src)
        if rows:
            extra = pa.Table.from_pylist(rows, schema=src.schema)
            src = pa.concat_tables([src, extra])
            dirtied.append(table)
        pq.write_table(src, os.path.join(out_dir, fn))
    return dirtied


if __name__ == "__main__":
    src, out = sys.argv[1], sys.argv[2]
    print("dirtied:", make_dirty(src, out))
