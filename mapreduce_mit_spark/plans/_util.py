"""Shared plan helpers.

Cross-engine float discipline: Spark and DuckDB may sum doubles in
different orders, so every aggregated double surfaced to the driver's
value-hash is wrapped in ``round(, N)``. Rounding a sum whose
order-dependent wobble is ~1e-10 relative makes the two engines
bit-identical except on astronomically unlikely boundary values.
Row-level arithmetic (same ops, same inputs) is bit-identical without
rounding, but we still round surfaced metrics for stable display.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.io import fan_out, load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def tw(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Wide load: ``load_table`` + ``fan_out`` — for pipelines whose cost
    is CPU-bound per-row compute (tokenize/minhash/simhash/vector math),
    where an under-parallelized scan serializes the whole stage."""
    return fan_out(load_table(spark, sf_dir, name))


def money_sum(col: str = "value", alias: str = "total_value") -> Column:
    """Order-independent money sum: accumulate integer cents, surface
    dollars. ``sum(bigint)/100.0`` is a deterministic function of an
    exact integer, so Spark and DuckDB produce bit-identical doubles
    regardless of partitioning/summation order. Shared by the batch
    window plans and their streaming twins."""
    return (F.sum(F.expr(f"CAST(round({col} * 100) AS BIGINT)")) / 100.0).alias(alias)


def rsum(col: Column | str, alias: str, nd: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c), nd).alias(alias)


def ravg(col: Column | str, alias: str, nd: int = 4) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.avg(c), nd).alias(alias)


def source_fingerprint(src_path: str) -> tuple:
    """The one fingerprint for a source file: (realpath, size,
    mtime_ns). realpath — not abspath — so an index saved against the
    real path and attached via a symlinked fixture dir (the stream
    staging dirs are symlinks) resolves to the SAME identity, and two
    path spellings of one file can't defeat the staleness check."""
    import os

    real = os.path.realpath(src_path)
    st = os.stat(real)
    return (real, st.st_size, st.st_mtime_ns)


def write_index_meta(
    out_dir: str, src_path: str, schemas: dict[str, str] | None = None
) -> None:
    """Stamp a persisted index with its source file's fingerprint
    (realpath + size + mtime_ns — the same triple the session cache
    keys on), so a later attach can detect staleness instead of
    silently serving an index fitted on superseded data.

    ``schemas`` maps sub-table name -> fitted ``schema.json()``. Loads
    use it to restore exact fitted types: parquet partition-column
    discovery re-infers types from directory values (an int-looking
    ``cluster=7`` reads back IntegerType even when the fitted column
    was LongType), and without the cast an attached index poisons the
    serving session's schema and fails the type-tagged value hash."""
    import json
    import os

    fp = source_fingerprint(src_path)
    meta = {"source": fp[0], "size": fp[1], "mtime_ns": fp[2]}
    if schemas:
        meta["schemas"] = schemas
    with open(os.path.join(out_dir, "_meta.json"), "w") as f:
        json.dump(meta, f)


def check_index_meta(out_dir: str, src_path: str) -> tuple:
    """Validate a persisted index against the CURRENT source file.
    Returns the session-cache key fingerprint tail (realpath, size,
    mtime_ns) on success; raises ValueError when the index predates a
    source regeneration (same staleness discipline as the in-session
    fingerprint keys — a stale index must refuse to serve, not
    quietly return results fitted on other data)."""
    import json
    import os

    with open(os.path.join(out_dir, "_meta.json")) as f:
        meta = json.load(f)
    cur = source_fingerprint(src_path)
    # realpath the STORED source too: indexes saved before the realpath
    # switch stamped abspath, so an index saved via a symlinked staging
    # dir would otherwise read as spuriously stale and force a refit.
    if cur != (os.path.realpath(meta["source"]), meta["size"], meta["mtime_ns"]):
        raise ValueError(
            f"persisted index at {out_dir} is stale: fitted on "
            f"{(meta['source'], meta['size'], meta['mtime_ns'])}, "
            f"current source is {cur} — refit (…_index_save) or point "
            "at the matching data"
        )
    return cur


def read_index_table(
    spark: SparkSession, out_dir: str, name: str, cols: list[str]
) -> DataFrame:
    """Read one persisted index sub-table and restore its FITTED
    schema from the ``_meta.json`` schema stamp (see
    :func:`write_index_meta`). Every ``*_index_load`` goes through
    this so partition-column type re-inference can never change the
    serving schema; indexes saved before schema stamping existed fall
    back to the raw parquet types."""
    import json
    import os

    from pyspark.sql.types import StructType

    df = spark.read.parquet(os.path.join(out_dir, name))
    try:
        with open(os.path.join(out_dir, "_meta.json")) as f:
            stamp = (json.load(f).get("schemas") or {}).get(name)
    except FileNotFoundError:
        stamp = None
    if stamp is None:
        return df.select(*cols)
    fitted = {
        f.name: f.dataType for f in StructType.fromJson(json.loads(stamp)).fields
    }
    return df.select(
        *[
            F.col(c).cast(fitted[c]).alias(c) if c in fitted else F.col(c)
            for c in cols
        ]
    )


def hex_int_sql(hexpr: str, start: int, length: int) -> str:
    """DuckDB: parse a hex substring into an integer via nibble
    positions — the SQL twin of Spark's ``conv(substring(<hex>, start,
    length), 16, 10)``. Shared by the multimodal oracles, q166's
    bucket hash, q168's query sample, and q169's checksum."""
    acc = "0"
    for i in range(length):
        nib = f"(strpos('0123456789abcdef', substr({hexpr}, {start + i}, 1)) - 1)"
        acc = f"(({acc}) * 16 + {nib})"
    return acc
