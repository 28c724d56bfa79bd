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


def write_index_meta(out_dir: str, src_path: str) -> None:
    """Stamp a persisted index with its source file's fingerprint
    (abspath + size + mtime_ns — the same triple the session cache
    keys on), so a later attach can detect staleness instead of
    silently serving an index fitted on superseded data."""
    import json
    import os

    st = os.stat(src_path)
    meta = {
        "source": os.path.abspath(src_path),
        "size": st.st_size,
        "mtime_ns": st.st_mtime_ns,
    }
    with open(os.path.join(out_dir, "_meta.json"), "w") as f:
        json.dump(meta, f)


def check_index_meta(out_dir: str, src_path: str) -> tuple:
    """Validate a persisted index against the CURRENT source file.
    Returns the session-cache key fingerprint tail (abspath, size,
    mtime_ns) on success; raises ValueError when the index predates a
    source regeneration (same staleness discipline as the in-session
    fingerprint keys — a stale index must refuse to serve, not
    quietly return results fitted on other data)."""
    import json
    import os

    with open(os.path.join(out_dir, "_meta.json")) as f:
        meta = json.load(f)
    st = os.stat(src_path)
    cur = (os.path.abspath(src_path), st.st_size, st.st_mtime_ns)
    if cur != (meta["source"], meta["size"], meta["mtime_ns"]):
        raise ValueError(
            f"persisted index at {out_dir} is stale: fitted on "
            f"{(meta['source'], meta['size'], meta['mtime_ns'])}, "
            f"current source is {cur} — refit (…_index_save) or point "
            "at the matching data"
        )
    return cur
