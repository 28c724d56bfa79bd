"""Table-maintenance / ops pack — the jobs that keep a 100 TB lakehouse
servable BETWEEN full recomputes: incremental materialized-aggregate
maintenance (q178, append-only; q184, full CDC with retractions; the
refresh fold), multi-dimensional data layout (q179 Z-order audit, q182
the rewrite with real parquet footers), and the key-skew audit (q180)
that sizes salting before a big join.

These close the "operations" side of the freshness story the catalog
already tells for dedup (q161) and ANN indexes (q175): the same
standing-snapshot + increment-merge discipline, applied to relational
aggregates — plus the two planning passes (layout, skew) a team runs
BEFORE committing a 1000-executor job shape. The streaming twins
(q181 maintenance, q185 state compaction) live in
streaming/stream_queries.py.

Cross-engine determinism: every surfaced sum is an exact integer
(cents / whole units) so merge order can never wobble a double; all
bucket and salt arithmetic is integer-only (``div`` / ``//``); hash
splits are md5-prefix predicates replayed verbatim by the oracles.

Reference analog: none of these exist in the reference (SURVEY §2.3
extensions); the incremental-merge contract mirrors the reference's
combiner discipline (partial aggregation before the shuffle,
wc.go:64-74's reduce over pre-grouped values) lifted to a persisted
snapshot.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ._util import fitted_family, t

# --- q178: incremental aggregate maintenance (tenth persisted family) ------

# Standing/increment split: first 4 hex chars of md5('agg1:' || orderkey)
# below this threshold ≈ the 90% of rows that were present at the last
# full refresh; the rest "arrived since". Keyed on l_orderkey so a whole
# order's lines land on the same side — increments arrive as orders, not
# as scattered line items.
Q178_STANDING_HEX = "e666"

# The boundary a REFRESHED snapshot stamps: lexicographically above
# every 4-hex-char md5 prefix ('f' < 'g'), so the increment carve
# `NOT (key < boundary)` is provably empty — everything is standing,
# zero pending increments. ('ffff' would be wrong: rows whose prefix IS
# 'ffff' would read as increments and double-count against a snapshot
# that already folded them.)
AGG_REFRESHED_HEX = "g000"


def agg_standing_hex(snap: DataFrame) -> str:
    """The increment-carve boundary is a property of the ATTACHED
    snapshot artifact, not of the serving code: read it from the
    ``_mms_fit_params`` tag the family factory stamps on every fitted
    or loaded artifact, so a refreshed snapshot (boundary moved to
    :data:`AGG_REFRESHED_HEX`) is served correctly by the SAME serve
    path — closing the lifecycle that used to end at a refusal."""
    return getattr(snap, "_mms_fit_params", {}).get(
        "standing_hex", Q178_STANDING_HEX
    )

# Exact-integer measures: revenue in cents, quantity in whole units.
# Integer partials merge associatively and commutatively, so
# snapshot-merge == full recompute BIT-FOR-BIT — the property the oracle
# checks (it recomputes from scratch; the Spark side merges).
_REV_CENTS = "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"
_QTY_INT = "CAST(round(l_quantity) AS BIGINT)"


def _agg_split_key() -> Column:
    """Replayed verbatim by the oracle (same idiom as q175's split).
    NULL orderkeys hash to NULL, which a bare ``< hex`` predicate drops
    from BOTH carves (NULL is neither < nor >=) — the coalesce routes
    them deterministically to the standing side instead of silently
    losing the row from the view."""
    return F.coalesce(
        F.substring(
            F.md5(F.concat(F.lit("agg1:"), F.col("l_orderkey").cast("string"))),
            1,
            4,
        ),
        F.lit("0000"),
    )


def _lineitem_partials(li: DataFrame) -> DataFrame:
    """Mergeable per-supplier partial aggregates — the ONLY shape the
    snapshot stores: counts, exact integer sums, min/max. avg is
    derived at serve time (sum/count), never stored — a stored average
    cannot be merged."""
    return li.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.expr(_QTY_INT)).alias("sum_qty"),
        F.sum(F.expr(_REV_CENTS)).alias("rev_cents"),
        F.min("l_shipdate").alias("ship_first"),
        F.max("l_shipdate").alias("ship_last"),
    )


def _standing_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIT-ONLY: the standing-split scan of the fact table. Kept as its
    own module-global hook so the cold-start test can poison it and
    prove an attached snapshot serves without ever rescanning the
    standing side (the serve path touches only the increment rows)."""
    return t(spark, sf_dir, "lineitem").where(_agg_split_key() < Q178_STANDING_HEX)


def _merge_partials(parts: DataFrame) -> DataFrame:
    """Fold any number of partial sets (tagged with ``has_new_i``) into
    final per-group aggregates. Because the measures are exact
    integers and min/max, this merge is associative and commutative —
    the algebra tests/test_maintenance.py checks split-invariance of."""
    return parts.groupBy("l_suppkey").agg(
        F.sum("n_items").alias("n_items"),
        F.sum("sum_qty").alias("sum_qty"),
        F.sum("rev_cents").alias("rev_cents"),
        F.min("ship_first").alias("ship_first"),
        F.max("ship_last").alias("ship_last"),
        (F.max("has_new_i") == 1).alias("has_new"),
    )


def _agg_snapshot_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The standing snapshot: per-supplier partials over the ~90% hash
    split — the materialized view a periodic offline job refreshes. At
    100 TB this is the table the refresh job REWRITES; between
    refreshes every serve merges it with increment partials without
    ever rescanning the standing fact table."""
    return _lineitem_partials(_standing_lineitem(spark, sf_dir)).localCheckpoint(
        eager=True
    )


# Aggregate-snapshot lifecycle via fitted_family — the TENTH persisted
# family. One sub-table (the partials); the split key and group key ride
# the param stamp so a snapshot built for a different split or grouping
# refuses to attach.
(
    agg_snapshot_for,
    agg_snapshot_save,
    agg_snapshot_load,
    agg_snapshot_attach,
) = fitted_family(
    "agg_snapshot",
    "lineitem.parquet",
    [
        (
            "partials",
            ["l_suppkey", "n_items", "sum_qty", "rev_cents", "ship_first", "ship_last"],
            None,
        )
    ],
    _agg_snapshot_fit,
    params={"standing_hex": Q178_STANDING_HEX, "group_key": "l_suppkey"},
    # standing_hex is MUTABLE: a refreshed snapshot legitimately moves
    # the boundary (to AGG_REFRESHED_HEX) and serving code reads the
    # stamped value back (agg_standing_hex) — group_key stays immutable
    mutable=("standing_hex",),
)


def _q178_oracle() -> str:
    new_pred = (
        "COALESCE(substr(md5('agg1:' || CAST(l_orderkey AS VARCHAR)), 1, 4), "
        f"'0000') >= '{Q178_STANDING_HEX}'"
    )
    return f"""
    WITH li AS (
      SELECT l_suppkey, {_QTY_INT} AS qty_i, {_REV_CENTS} AS rev_c, l_shipdate,
             ({new_pred}) AS is_new
      FROM lineitem
    ),
    g AS (
      SELECT l_suppkey,
             count(*) AS n_items,
             CAST(sum(qty_i) AS BIGINT) AS sum_qty,
             CAST(sum(rev_c) AS BIGINT) AS rev_cents,
             min(l_shipdate) AS ship_first,
             max(l_shipdate) AS ship_last,
             (max(CASE WHEN is_new THEN 1 ELSE 0 END) = 1) AS has_new
      FROM li GROUP BY l_suppkey
    )
    SELECT l_suppkey, n_items, sum_qty,
           rev_cents / 100.0 AS revenue,
           round(sum_qty * 1.0 / n_items, 4) AS avg_qty,
           ship_first, ship_last, has_new
    FROM g
    ORDER BY revenue DESC, l_suppkey
    LIMIT 25
    """


@register(
    "q178_incremental_agg_maintenance",
    oracle=_q178_oracle(),
    tags=("maintenance", "incremental", "aggregation", "training-pipeline"),
)
def q178_incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL MATERIALIZED-AGGREGATE MAINTENANCE: the freshness
    pattern (q161 dedup, q175 ANN) applied to relational aggregates —
    a per-supplier revenue view stays current by merging increment
    partials into a persisted standing snapshot, WITHOUT rescanning
    the standing fact table.

    The standing snapshot (per-supplier count / exact-integer sums /
    min-max over the ~90% hash split) is the tenth persisted family
    (:func:`agg_snapshot_for`, save/attach like every other). A serve
    call aggregates ONLY the increment rows to the same partial shape,
    unions the two partial sets, and folds them with the merge
    functions (sum-of-counts, sum-of-sums, min-of-mins, max-of-maxes);
    the average is DERIVED from merged sums, never stored. Because the
    stored measures are exact integers, merge order cannot wobble a
    double — the oracle recomputes the whole view from scratch and
    must match bit-for-bit: incremental maintenance == full recompute
    is the contract, not an approximation.

    Scale shape: at 100 TB the standing snapshot is group-cardinality-
    sized (suppliers, not line items) and the increment is the arrival
    batch, so the serve's work is O(increment + groups): one partial
    agg over the new rows (map-side combine does most of it), one
    merge shuffle on the group key over two group-sized inputs. The
    standing fact table is read ONLY by the periodic snapshot refresh.
    In production the increment is its own arrival partition (q176's
    ``batch_id=`` discipline); here it is carved from one table by the
    md5 split, per the fixture convention q161/q175 established.

    Reference analog: the combiner discipline (wc.go:64-74 — reduce
    over pre-grouped partials) persisted across job boundaries."""
    return _serve_agg_from(spark, sf_dir, agg_snapshot_for(spark, sf_dir))


def _serve_agg_from(spark: SparkSession, sf_dir: str, snap: DataFrame) -> DataFrame:
    """q178's serve against an EXPLICIT snapshot artifact: carve the
    increments at the snapshot's OWN stamped boundary
    (:func:`agg_standing_hex`) — a freshly-fitted snapshot carves at
    Q178_STANDING_HEX, a refreshed one at AGG_REFRESHED_HEX (empty
    increment) — merge, and derive the view. Shared by q178 and the
    refresh-serve q188."""
    li = t(spark, sf_dir, "lineitem")
    incr = li.where(~(_agg_split_key() < agg_standing_hex(snap)))
    merged = _merge_partials(
        snap.withColumn("has_new_i", F.lit(0)).unionByName(
            _lineitem_partials(incr).withColumn("has_new_i", F.lit(1))
        )
    )
    return (
        merged.select(
            "l_suppkey",
            "n_items",
            "sum_qty",
            (F.col("rev_cents") / 100.0).alias("revenue"),
            F.round(F.col("sum_qty") * 1.0 / F.col("n_items"), 4).alias("avg_qty"),
            "ship_first",
            "ship_last",
            "has_new",
        )
        .orderBy(F.col("revenue").desc(), "l_suppkey")
        .limit(25)
    )


# --- q179: Z-order layout audit — multi-dimensional file pruning -----------

# 16 bits per dimension -> 32-bit interleaved key; 64 files = top 6 bits.
_ZBITS = 16
_N_FILES = 64
# Pinned audit predicate: a one-year shipping window (days since the
# 1995-01-01 anchor), ALL customers — the case where a custkey-sorted
# layout prunes NOTHING and Z-order prunes ~(1 - window/span) of files.
Q179_DD_LO = 1096
Q179_DD_HI = 1460


def _z_terms(xcol: str, ycol: str) -> list[str]:
    """Bit-interleave terms: x's bit j lands at position 2j, y's at
    2j+1. Disjoint positions, so plain integer addition == bitwise OR
    — the same arithmetic runs verbatim in both engines modulo the
    shift spelling (Spark ``shiftright`` fn, DuckDB ``>>``)."""
    terms = []
    for j in range(_ZBITS):
        terms.append((xcol, j, 1 << (2 * j)))
        terms.append((ycol, j, 1 << (2 * j + 1)))
    return terms


def _z_expr_spark(xcol: str, ycol: str) -> str:
    return " + ".join(
        f"(shiftright({c}, {j}) & 1) * {w}" for c, j, w in _z_terms(xcol, ycol)
    )


def _z_expr_duck(xcol: str, ycol: str) -> str:
    return " + ".join(
        f"(({c} >> {j}) & 1) * {w}" for c, j, w in _z_terms(xcol, ycol)
    )


def _zorder_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared by q179 (audit) and q182 (rewrite): orders keyed by the
    32-bit Morton interleave of (custkey, days-since-anchor), both dims
    min-max-scaled to 16 bits by exact integer arithmetic."""
    scale = (1 << _ZBITS) - 1
    # rows missing a layout dimension are not layoutable — excluded in
    # both engines (a NULL zval would otherwise land in a
    # __HIVE_DEFAULT_PARTITION__ file with no usable zone map)
    o = (
        t(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("ck"),
            F.datediff(F.to_date("o_orderdate"), F.to_date(F.lit("1995-01-01")))
            .cast("long")
            .alias("dd"),
        )
        .where(F.col("ck").isNotNull() & F.col("dd").isNotNull())
    )
    ext = o.agg(
        F.min("ck").alias("ckmin"),
        F.max("ck").alias("ckmax"),
        F.min("dd").alias("ddmin"),
        F.max("dd").alias("ddmax"),
    )
    s = o.crossJoin(F.broadcast(ext)).select(
        "ck",
        "dd",
        F.expr(
            f"CAST(((ck - ckmin) * {scale}) div GREATEST(ckmax - ckmin, 1) AS BIGINT)"
        ).alias("x16"),
        F.expr(
            f"CAST(((dd - ddmin) * {scale}) div GREATEST(ddmax - ddmin, 1) AS BIGINT)"
        ).alias("d16"),
    )
    return s.select(
        "ck", "dd", "x16", F.expr(_z_expr_spark("x16", "d16")).alias("zval")
    )


# DuckDB twin of _zorder_frame, shared by the q179/q182 oracles.
_ZORDER_CTES = f"""
    o AS (
      SELECT o_custkey AS ck,
             date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS dd
      FROM orders
      WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
    ),
    ext AS (
      SELECT min(ck) AS ckmin, max(ck) AS ckmax,
             min(dd) AS ddmin, max(dd) AS ddmax
      FROM o
    ),
    s AS (
      SELECT ck, dd,
             CAST(((ck - ckmin) * {(1 << _ZBITS) - 1})
                  // GREATEST(ckmax - ckmin, 1) AS BIGINT) AS x16,
             CAST(((dd - ddmin) * {(1 << _ZBITS) - 1})
                  // GREATEST(ddmax - ddmin, 1) AS BIGINT) AS d16
      FROM o, ext
    ),
    z AS (SELECT ck, dd, x16, ({_z_expr_duck('x16', 'd16')}) AS zval FROM s)
"""


def _q179_oracle() -> str:
    zdiv = 1 << (2 * _ZBITS - 6)  # top 6 bits of the 32-bit key
    xdiv = 1 << (_ZBITS - 6)  # top 6 bits of the 16-bit dim
    return f"""
    WITH {_ZORDER_CTES},
    b AS (
      SELECT 'zorder' AS layout, CAST(zval // {zdiv} AS BIGINT) AS file_id,
             ck, dd FROM z
      UNION ALL
      SELECT 'custkey_linear' AS layout, CAST(x16 // {xdiv} AS BIGINT) AS file_id,
             ck, dd FROM z
    )
    SELECT layout, file_id, count(*) AS n_rows,
           min(ck) AS ck_min, max(ck) AS ck_max,
           min(dd) AS dd_min, max(dd) AS dd_max,
           (NOT (max(dd) < {Q179_DD_LO} OR min(dd) > {Q179_DD_HI})) AS touched
    FROM b
    GROUP BY layout, file_id
    ORDER BY layout, file_id
    """


@register(
    "q179_zorder_layout",
    oracle=_q179_oracle(),
    tags=("maintenance", "layout", "pruning"),
)
def q179_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER LAYOUT AUDIT: interleave the bits of two scan dimensions
    (customer, order date) into one clustering key, carve the keyspace
    into {n} equal files, and measure — per candidate layout — which
    files a pinned one-year date predicate would have to read, using
    exactly the min/max zone maps a lakehouse file footer stores.

    Two layouts over the same rows: ``zorder`` (files = ranges of the
    interleaved key — every file covers a small RECTANGLE in
    (custkey × date) space, so its min/max is tight in BOTH columns)
    and ``custkey_linear`` (files = custkey ranges — the 1-D sort every
    naive pipeline ships, whose per-file date range spans the whole
    table). ``touched`` is footer-only pruning: a file is read iff its
    [dd_min, dd_max] intersects the predicate window. On a date-only
    predicate the linear layout touches ALL files; Z-order touches the
    ~window/span fraction — the measured difference IS the result.

    All arithmetic is integer-exact cross-engine: dims min-max-scale to
    16 bits by integer floor-division, interleave by shift-and-mask
    (addition over disjoint bit positions), file ids are the key's top
    6 bits. The oracle replays it with DuckDB's operator spellings.

    Scale shape: one pass to compute extents (at 100 TB: a footer-stats
    read, not a scan), one map-side key computation, one shuffle to
    group by (layout, file) — the same cost as the write-side
    ``repartitionByRange(zval)`` that would PRODUCE this layout. The
    audit is the cheap planning pass you run before committing the
    rewrite of a 100 TB table.

    Reference analog: none (SURVEY §2.3 layout extension; Morton-order
    clustering per the public Delta/Iceberg OPTIMIZE ZORDER docs)."""
    zdiv = 1 << (2 * _ZBITS - 6)
    xdiv = 1 << (_ZBITS - 6)
    z = _zorder_frame(spark, sf_dir)
    # Both layouts from ONE scan: stack() emits two (layout, file_id)
    # rows per order instead of a union that would re-run the whole
    # scan + extent subtree per branch (the plan this replaced read
    # orders twice).
    b = z.select(
        "ck",
        "dd",
        F.expr(
            f"stack(2, 'zorder', CAST(zval div {zdiv} AS BIGINT), "
            f"'custkey_linear', CAST(x16 div {xdiv} AS BIGINT)) "
            "AS (layout, file_id)"
        ),
    )
    return (
        b.groupBy("layout", "file_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("ck").alias("ck_min"),
            F.max("ck").alias("ck_max"),
            F.min("dd").alias("dd_min"),
            F.max("dd").alias("dd_max"),
        )
        .select(
            "layout",
            "file_id",
            "n_rows",
            "ck_min",
            "ck_max",
            "dd_min",
            "dd_max",
            (
                ~(
                    (F.col("dd_max") < Q179_DD_LO)
                    | (F.col("dd_min") > Q179_DD_HI)
                )
            ).alias("touched"),
        )
        .orderBy("layout", "file_id")
    )


q179_zorder_layout.__doc__ = q179_zorder_layout.__doc__.format(n=_N_FILES)


# --- q180: key-skew audit — size the salt BEFORE the join ------------------

# Target reducer partitions the audit plans for (the session default).
_Q180_PARTITIONS = 32


def _q180_oracle() -> str:
    return f"""
    WITH k AS (SELECT user_id, count(*) AS n_events FROM events
               WHERE user_id IS NOT NULL GROUP BY user_id),
    tot AS (
      SELECT CAST(sum(n_events) AS BIGINT) AS total, count(*) AS n_keys FROM k
    )
    SELECT user_id, n_events,
           round(n_events * 100.0 / total, 4) AS share_pct,
           round(n_events * 1.0 * n_keys / total, 4) AS skew_x,
           CAST((n_events * {_Q180_PARTITIONS} + total - 1) // total AS BIGINT)
             AS salt_k,
           (n_events * 2 * n_keys > 3 * total) AS is_hot
    FROM k, tot
    ORDER BY n_events DESC, user_id
    LIMIT 15
    """


@register(
    "q180_skew_audit",
    oracle=_q180_oracle(),
    tags=("maintenance", "skew", "diagnostics"),
)
def q180_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEY-SKEW AUDIT: the planning pass that decides whether a join or
    aggregation key needs salting BEFORE the 1000-executor job runs —
    per hot key: its row share, its skew multiple vs a uniform key
    (``skew_x`` = share × distinct-keys), the salt fan-out that would
    level it (``salt_k`` = how many target-sized reducer partitions
    this one key fills, integer-ceil over {p} partitions), and an
    ``is_hot`` flag at the 1.5×-average threshold (integer-exact:
    2·n·keys > 3·total).

    ``salt_k`` is directly the replication factor q19_salted_join
    / q18_salted_agg take: a key with salt_k = 1 needs no salting; a
    key with salt_k = 8 is split across 8 sub-keys so no single
    reducer sees more than ~total/{p} rows of it. AQE's skew-join
    handles the sort-merge case at runtime; this audit is for the
    shapes AQE can't re-plan — broadcast-hash build sides, stateful
    streaming keys, ``applyInPandas`` groups — where the salt must be
    in the plan.

    Scale shape: one map-side-combined count per key (the shuffle
    carries one row per distinct key, not per event), one broadcast of
    the two global scalars, top-15 fused into TakeOrdered. At 100 TB
    the per-key count table is exactly what the shuffle write already
    materializes — this audit reads it instead of guessing.

    Reference analog: the reference hash-partitions by ihash(key) %
    R with no skew handling (mapreduce.go's partition loop, SURVEY
    §2.1 #4) — this is the measurement that tells you when that
    breaks."""
    # Lazy checkpoint: the per-key count table materializes once and
    # serves BOTH consumers (the audit rows and the two global
    # scalars) — without it the plan scans the fact table twice.
    # NULL keys are excluded in both engines: a NULL key never matches
    # an equi-join anyway, so it is not a salting subject — and its
    # sort position differs cross-engine (NULLS FIRST vs LAST) at the
    # top-15 cut.
    k = (
        t(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .localCheckpoint(eager=False)
    )
    tot = k.agg(
        F.sum("n_events").alias("total"), F.count(F.lit(1)).alias("n_keys")
    )
    return (
        k.crossJoin(F.broadcast(tot))
        .select(
            "user_id",
            "n_events",
            F.round(F.col("n_events") * 100.0 / F.col("total"), 4).alias(
                "share_pct"
            ),
            F.round(
                F.col("n_events") * 1.0 * F.col("n_keys") / F.col("total"), 4
            ).alias("skew_x"),
            F.expr(
                f"CAST((n_events * {_Q180_PARTITIONS} + total - 1) div total"
                " AS BIGINT)"
            ).alias("salt_k"),
            (
                F.col("n_events") * 2 * F.col("n_keys") > F.col("total") * 3
            ).alias("is_hot"),
        )
        .orderBy(F.col("n_events").desc(), "user_id")
        .limit(15)
    )


# --- q182: Z-order rewrite — real files, real footers ----------------------


def _q182_path(sf_dir: str) -> str:
    """Per-source scratch dir for the rewrite — fingerprint-keyed so two
    fixture dirs (or a regenerated one) can never serve each other's
    footers; overwritten on every run."""
    import os

    from ._util import source_fingerprint
    from .io_roundtrip import _scratch

    fp = source_fingerprint(os.path.join(sf_dir, "orders.parquet"))
    return os.path.join(
        _scratch("zorder"), f"{os.path.basename(fp[0])}-{fp[1]}-{fp[2]}"
    )


def _dd_footer_stats(spark: SparkSession, path: str) -> DataFrame:
    """DISTRIBUTED parquet-footer zone-map read over a
    ``file_id=K``-partitioned table (shared by q182's rewrite audit
    and q206's incremental OPTIMIZE): the driver only LISTS the
    partition directories (the same file-listing every parquet scan's
    planning does); the per-file metadata reads — ~100 bytes each —
    run as an Arrow-batched ``mapInPandas`` over the file list, so at
    the 10⁵-file scale a real lakehouse table reaches, the audit
    parallelizes across executors instead of serializing on the
    driver. A row group missing ``dd`` statistics raises a descriptive
    error naming the file — the contract depends on stamped
    statistics, so absence must refuse, not read as an empty zone
    map. Returns one row per file_id: (file_id, n_rows, dd_min,
    dd_max) folded across that Z-range's files and row groups."""
    import glob as _glob
    import os

    files = [
        (int(part.rsplit("file_id=", 1)[1]), f)
        for part in sorted(_glob.glob(os.path.join(path, "file_id=*")))
        for f in sorted(_glob.glob(os.path.join(part, "*.parquet")))
    ]

    def read_footers(batches):
        import pandas as pd
        import pyarrow.parquet as _pq

        for pdf in batches:
            out = []
            for file_id, f in zip(pdf["file_id"], pdf["path"]):
                md = _pq.ParquetFile(f).metadata
                dd_idx = {
                    md.schema.column(i).name: i for i in range(md.num_columns)
                }["dd"]
                dd_min, dd_max = None, None
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(dd_idx).statistics
                    if st is None or st.min is None or st.max is None:
                        raise ValueError(
                            f"parquet file {f} row group {rg} has no 'dd' "
                            "statistics — the zone-map audit requires footer "
                            "min/max; rewrite with statistics enabled"
                        )
                    dd_min = st.min if dd_min is None else min(dd_min, st.min)
                    dd_max = st.max if dd_max is None else max(dd_max, st.max)
                out.append((int(file_id), md.num_rows, dd_min, dd_max))
            yield pd.DataFrame(
                out, columns=["file_id", "n_rows", "dd_min", "dd_max"]
            )

    return (
        spark.createDataFrame(files, "file_id bigint, path string")
        .repartition(min(len(files), 32) or 1)
        .mapInPandas(
            read_footers,
            "file_id bigint, n_rows bigint, dd_min bigint, dd_max bigint",
        )
        .groupBy("file_id")
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.min("dd_min").alias("dd_min"),
            F.max("dd_max").alias("dd_max"),
        )
    )


def _q182_oracle() -> str:
    zdiv = 1 << (2 * _ZBITS - 6)
    return f"""
    WITH {_ZORDER_CTES},
    f AS (SELECT CAST(zval // {zdiv} AS BIGINT) AS file_id, dd FROM z)
    SELECT file_id, count(*) AS n_rows,
           min(dd) AS dd_min, max(dd) AS dd_max,
           (NOT (max(dd) < {Q179_DD_LO} OR min(dd) > {Q179_DD_HI})) AS touched
    FROM f
    GROUP BY file_id
    ORDER BY file_id
    """


@register(
    "q182_zorder_rewrite",
    oracle=_q182_oracle(),
    tags=("maintenance", "layout", "pruning", "sink"),
)
def q182_zorder_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER REWRITE — the act q179 planned: physically rewrite the
    table clustered by the interleaved key (one parquet file per
    Z-range), then read the REAL file footers back and report, per
    file, the row count and dd min/max the parquet writer actually
    stamped — the statistics a 100 TB scan's pruning decisions run on.

    The contract the oracle checks: real footer statistics == the zone
    maps computed from the data (the oracle group-bys the same rows;
    the Spark side reads ONLY parquet metadata, never the rewritten
    rows). A mismatch would mean the rewrite scattered a Z-range
    across files — i.e., the layout the planner promised is not the
    layout on disk. ``touched`` is the same footer-intersects-window
    rule as q179, now evaluated against stamped metadata.

    Determinism: ``file_id = zval div 2^26`` is an explicit column
    (NOT repartitionByRange, whose sampled boundaries differ run to
    run), written ``partitionBy(file_id)`` after a hash repartition on
    it, so each Z-range lands in exactly one file with
    reproducible contents. The footer read is DISTRIBUTED: the driver
    only lists the partition directories (the same file-listing every
    parquet scan's planning does), and the per-file metadata reads —
    ~100 bytes each — run as an Arrow-batched ``mapInPandas`` over the
    file list, so at the 10⁵-file scale a real lakehouse table
    reaches, the audit parallelizes across executors instead of
    serializing on the driver. A row group missing ``dd`` statistics (statistics
    disabled at write time) raises a descriptive error naming the file
    — the query's contract depends on stamped statistics, so absence
    must refuse, not read as an empty zone map.

    Scale shape: the rewrite is one map-side key computation + one
    shuffle on file_id + a partitioned write — identical cost to the
    OPTIMIZE ZORDER job it models; the audit after it is metadata-only
    and executor-parallel.

    Reference analog: none (SURVEY §2.3 layout extension; the
    write-side half of q179's Delta/Iceberg OPTIMIZE ZORDER pattern)."""
    zdiv = 1 << (2 * _ZBITS - 6)
    z = _zorder_frame(spark, sf_dir).select(
        "ck", "dd", F.expr(f"CAST(zval div {zdiv} AS BIGINT)").alias("file_id")
    )
    path = _q182_path(sf_dir)
    z.repartition("file_id").write.mode("overwrite").partitionBy(
        "file_id"
    ).parquet(path)

    stats = _dd_footer_stats(spark, path)
    return stats.select(
        "file_id",
        "n_rows",
        "dd_min",
        "dd_max",
        (
            ~((F.col("dd_max") < Q179_DD_LO) | (F.col("dd_min") > Q179_DD_HI))
        ).alias("touched"),
    ).orderBy("file_id")


# --- q184: retractable aggregate maintenance (inserts AND deletes) ---------

# ~5% of STANDING rows retract (a CDC delete feed carved from the same
# table, keyed so a whole order retracts together). Inserts are q178's
# increment carve. NULL-keyed rows coalesce to 'ffff' — never deleted.
Q184_DELETE_HEX = "0ccc"


def _delete_key() -> Column:
    return F.coalesce(
        F.substring(
            F.md5(F.concat(F.lit("del1:"), F.col("l_orderkey").cast("string"))),
            1,
            4,
        ),
        F.lit("ffff"),
    )


def _q184_oracle() -> str:
    standing = (
        "COALESCE(substr(md5('agg1:' || CAST(l_orderkey AS VARCHAR)), 1, 4), "
        f"'0000') < '{Q178_STANDING_HEX}'"
    )
    deleted = (
        f"(({standing}) AND COALESCE(substr(md5('del1:' || "
        "CAST(l_orderkey AS VARCHAR)), 1, 4), 'ffff') "
        f"< '{Q184_DELETE_HEX}')"
    )
    return f"""
    WITH li AS (
      SELECT l_suppkey, {_QTY_INT} AS qty_i, {_REV_CENTS} AS rev_c, l_shipdate,
             ({deleted}) AS is_del
      FROM lineitem
    ),
    g AS (
      SELECT l_suppkey,
             count(*) FILTER (WHERE NOT is_del) AS n_items,
             CAST(COALESCE(sum(qty_i) FILTER (WHERE NOT is_del), 0) AS BIGINT)
               AS sum_qty,
             CAST(COALESCE(sum(rev_c) FILTER (WHERE NOT is_del), 0) AS BIGINT)
               AS rev_cents,
             min(l_shipdate) FILTER (WHERE NOT is_del) AS ship_first,
             max(l_shipdate) FILTER (WHERE NOT is_del) AS ship_last,
             (max(CASE WHEN is_del THEN 1 ELSE 0 END) = 1) AS has_retraction
      FROM li GROUP BY l_suppkey
    )
    SELECT l_suppkey, n_items, sum_qty,
           rev_cents / 100.0 AS revenue,
           round(sum_qty * 1.0 / n_items, 4) AS avg_qty,
           ship_first, ship_last, has_retraction
    FROM g
    WHERE n_items > 0
    ORDER BY revenue DESC, l_suppkey
    LIMIT 25
    """


@register(
    "q184_retractable_agg_maintenance",
    oracle=_q184_oracle(),
    tags=("maintenance", "incremental", "aggregation", "cdc"),
)
def q184_retractable_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RETRACTABLE aggregate maintenance — q178 extended from
    append-only to a full CDC feed (inserts AND deletes), which splits
    the measures by their algebra:

    - **Invertible measures** (count, sums) maintain incrementally
      under deletion: delete partials fold in with sign −1, so the
      merged sums are snapshot + inserts − deletes with NO fact-table
      access — exact, because the stored measures are integers.
    - **Non-invertible measures** (min/max) cannot un-see a deleted
      extreme. They recompute from live rows ONLY for the groups a
      delete actually touched (``affected`` = distinct deleted group
      keys, broadcast; the live scan is semi-join-pruned to those
      groups). Unaffected groups keep the merged snapshot+insert
      extremes — exact, since deletes are the only way an extreme
      leaves.

    The served view coalesces the two: recomputed extremes where
    affected, merged elsewhere; groups whose rows all retracted drop
    out (``n_items > 0``). ``has_retraction`` marks the recomputed
    groups. The oracle recomputes everything from scratch over the
    live rows — maintenance == recompute is again the contract.

    Scale shape: the incremental path is O(changes + groups) exactly
    like q178; the recompute branch is O(rows of affected groups) —
    the quantity a production layout bounds by clustering the fact
    table on the group key (q182's rewrite), so the semi-join prunes
    files, not rows. Delete-heavy feeds degrade gracefully toward the
    full recompute they actually require; the split-by-algebra is what
    keeps the common mostly-insert case cheap.

    Reference analog: none (SURVEY §2.3 maintenance block; the
    invertible/non-invertible split is the standard materialized-view
    retraction treatment, e.g. Flink's retract streams)."""
    li = t(spark, sf_dir, "lineitem")
    standing = _agg_split_key() < Q178_STANDING_HEX
    del_pred = standing & (_delete_key() < Q184_DELETE_HEX)
    snap = agg_snapshot_for(spark, sf_dir)
    ins_p = _lineitem_partials(li.where(~standing))
    dels = li.where(del_pred)
    del_p = _lineitem_partials(dels)

    parts = (
        snap.withColumn("sign", F.lit(1))
        .unionByName(ins_p.withColumn("sign", F.lit(1)))
        .unionByName(del_p.withColumn("sign", F.lit(-1)))
    )
    merged = parts.groupBy("l_suppkey").agg(
        F.sum(F.col("n_items") * F.col("sign")).alias("n_items"),
        F.sum(F.col("sum_qty") * F.col("sign")).alias("sum_qty"),
        F.sum(F.col("rev_cents") * F.col("sign")).alias("rev_cents"),
        F.min(F.when(F.col("sign") > 0, F.col("ship_first"))).alias("ship_first_m"),
        F.max(F.when(F.col("sign") > 0, F.col("ship_last"))).alias("ship_last_m"),
        (F.max((F.col("sign") < 0).cast("int")) == 1).alias("has_retraction"),
    )

    affected = dels.select("l_suppkey").distinct()
    live_affected = li.where(~del_pred).join(
        F.broadcast(affected), "l_suppkey"
    )
    ext = live_affected.groupBy("l_suppkey").agg(
        F.min("l_shipdate").alias("ship_first_r"),
        F.max("l_shipdate").alias("ship_last_r"),
    )
    view = merged.join(ext, "l_suppkey", "left").select(
        "l_suppkey",
        "n_items",
        "sum_qty",
        (F.col("rev_cents") / 100.0).alias("revenue"),
        F.round(F.col("sum_qty") * 1.0 / F.col("n_items"), 4).alias("avg_qty"),
        F.coalesce("ship_first_r", "ship_first_m").alias("ship_first"),
        F.coalesce("ship_last_r", "ship_last_m").alias("ship_last"),
        "has_retraction",
    )
    return (
        view.where(F.col("n_items") > 0)
        .orderBy(F.col("revenue").desc(), "l_suppkey")
        .limit(25)
    )


def agg_snapshot_refresh(spark: SparkSession, sf_dir: str, out_dir: str) -> None:
    """The periodic REFRESH job the q178/q181 docstrings promise: fold
    the standing snapshot with the current increment partials into a
    NEW full-coverage snapshot artifact and persist it (the q163
    pointer-flip discipline applies at the directory level: write new,
    then swap). The refreshed artifact's param stamp moves the
    standing boundary to :data:`AGG_REFRESHED_HEX` — lexicographically
    above every md5 prefix, i.e. everything standing, zero pending
    increments. Because ``standing_hex`` is a MUTABLE family param and
    the serve path carves at the artifact's stamped boundary
    (:func:`agg_standing_hex`), the refreshed snapshot ATTACHES and
    SERVES through the ordinary lifecycle (q188 registers exactly
    that) — the increment feed restarts from empty, with no
    double-count possible at any boundary value.

    Cost: group-sized inputs only (snapshot + increment partials) —
    the fact table is scanned once for the increment side, exactly the
    q178 serve cost, NOT a full refit. The pytest contract: the
    refreshed partials equal a from-scratch ``_lineitem_partials`` over
    the whole table, bit-for-bit."""
    import os

    from ._util import write_index_meta

    li = t(spark, sf_dir, "lineitem")
    snap = agg_snapshot_for(spark, sf_dir)
    incr_p = _lineitem_partials(li.where(~(_agg_split_key() < agg_standing_hex(snap))))
    refreshed = _merge_partials(
        snap.withColumn("has_new_i", F.lit(0)).unionByName(
            incr_p.withColumn("has_new_i", F.lit(0))
        )
    ).drop("has_new")
    refreshed.write.mode("overwrite").parquet(os.path.join(out_dir, "partials"))
    write_index_meta(
        out_dir,
        os.path.join(sf_dir, "lineitem.parquet"),
        schemas={"partials": refreshed.schema.json()},
        params={"standing_hex": AGG_REFRESHED_HEX, "group_key": "l_suppkey"},
    )


def _q188_oracle() -> str:
    return f"""
    WITH li AS (
      SELECT l_suppkey, {_QTY_INT} AS qty_i, {_REV_CENTS} AS rev_c, l_shipdate
      FROM lineitem
    ),
    g AS (
      SELECT l_suppkey,
             count(*) AS n_items,
             CAST(sum(qty_i) AS BIGINT) AS sum_qty,
             CAST(sum(rev_c) AS BIGINT) AS rev_cents,
             min(l_shipdate) AS ship_first,
             max(l_shipdate) AS ship_last
      FROM li GROUP BY l_suppkey
    )
    SELECT l_suppkey, n_items, sum_qty,
           rev_cents / 100.0 AS revenue,
           round(sum_qty * 1.0 / n_items, 4) AS avg_qty,
           ship_first, ship_last, FALSE AS has_new
    FROM g
    ORDER BY revenue DESC, l_suppkey
    LIMIT 25
    """


@register(
    "q188_agg_refresh_serve",
    oracle=_q188_oracle(),
    tags=("maintenance", "incremental", "aggregation", "lifecycle"),
)
def q188_agg_refresh_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REFRESH-THEN-SERVE — the lifecycle act that closes q178's loop:
    run :func:`agg_snapshot_refresh` (fold snapshot + increment
    partials into a full-coverage artifact stamped at the MOVED
    boundary), ATTACH the refreshed artifact through the ordinary
    fingerprint+param gate (``standing_hex`` is a mutable param — the
    gate still refuses a wrong ``group_key`` or a stale fingerprint),
    and serve q178's view from it. The serve path carves increments at
    the artifact's stamped boundary (:func:`agg_standing_hex`), which
    for a refreshed snapshot is provably empty — so the view is the
    full-table aggregate with ``has_new = false`` everywhere, exactly
    what the oracle recomputes from scratch.

    The session cache entry is restored afterwards (the returned plan
    closes over the loaded artifact directly), so running q188 can
    never poison a later q178/q184 call in the same session with a
    moved boundary their oracles don't model.

    Scale shape: the refresh reads group-sized partials plus one
    increment carve — q178's serve cost, not a refit; the attach+serve
    adds a fingerprint check and an EMPTY increment scan. At 100 TB
    this is the nightly snapshot-rotation job, and the mutable-param
    gate is what lets one serving binary span the rotation.

    Reference analog: none (SURVEY §2.3 maintenance block — the
    refresh half of the materialized-view lifecycle)."""
    from ._util import refresh_then_serve

    return refresh_then_serve(
        spark, sf_dir,
        cache_family="agg_snapshot",
        src_table="lineitem.parquet",
        refresh_fn=agg_snapshot_refresh,
        attach_fn=agg_snapshot_attach,
        serve_fn=_serve_agg_from,
    )


# --- q187: mergeable-histogram quantile maintenance (eleventh family) ------

Q187_BUCKETS = 64
Q187_QS = (0.5, 0.9, 0.99)


def _hist_snapshot_fit(spark: SparkSession, sf_dir: str):
    """Equal-width histogram of o_totalprice over the STANDING carve:
    (bucket counts, [lo, hi] extent). Bucket counts are exact integers
    — the canonical MERGEABLE distribution sketch: snapshot + increment
    counts add, bit-for-bit. The boundaries are fitted on standing
    data and go STALE as increments arrive (out-of-range new values
    clamp into the edge buckets) — the same freshness trade as q175's
    codebook, with the in-band error audit as the retrain alarm."""
    standing = _standing_orders(spark, sf_dir)
    ext = standing.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    ).localCheckpoint(eager=True)
    counts = (
        standing.crossJoin(F.broadcast(ext))
        .select(_hist_bucket_col().alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    return (counts, ext)


def _standing_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIT-ONLY (the q178 ``_standing_lineitem`` discipline): the
    standing-split scan of orders, poisonable by the cold-start test to
    prove an attached histogram serves without rescanning standing."""
    return (
        t(spark, sf_dir, "orders")
        .where(F.col("o_totalprice").isNotNull())
        .where(_order_split_key() < Q178_STANDING_HEX)
    )


def _order_split_key() -> Column:
    """q178's split idiom keyed on o_orderkey (orders-side carve)."""
    return F.coalesce(
        F.substring(
            F.md5(F.concat(F.lit("agg1:"), F.col("o_orderkey").cast("string"))),
            1,
            4,
        ),
        F.lit("0000"),
    )


def _hist_bucket_col() -> Column:
    """Clamped equal-width bucket of o_totalprice against [lo, hi] —
    identical double arithmetic in both engines (same ops, same order
    → identical bits), clamp into the edge buckets for values outside
    the fitted range."""
    w = (F.col("hi") - F.col("lo")) / Q187_BUCKETS
    raw = F.floor((F.col("o_totalprice") - F.col("lo")) / w)
    return F.greatest(F.least(raw, F.lit(Q187_BUCKETS - 1)), F.lit(0)).cast("long")


(
    hist_snapshot_for,
    hist_snapshot_save,
    hist_snapshot_load,
    hist_snapshot_attach,
) = fitted_family(
    "hist_snapshot",
    "orders.parquet",
    [
        ("counts", ["bucket", "n"], None),
        ("extent", ["lo", "hi"], None),
    ],
    _hist_snapshot_fit,
    params={"standing_hex": Q178_STANDING_HEX, "n_buckets": Q187_BUCKETS},
    # standing_hex mutable for the same reason as the agg snapshot's:
    # a refreshed histogram (hist_snapshot_refresh) moves the boundary
    # and the serve path reads the stamped value; n_buckets stays
    # immutable — counts binned at 64 buckets served as 32 would be
    # silently wrong quantiles
    mutable=("standing_hex",),
)


def _q187_oracle(standing: str | None = None) -> str:
    """Parameterized over the standing predicate: q187 uses the md5
    carve (stale boundaries + clamped increments), q189 passes 'TRUE'
    (post-refresh: boundaries fitted on everything, zero clamps)."""
    if standing is None:
        standing = (
            "COALESCE(substr(md5('agg1:' || CAST(o_orderkey AS VARCHAR)), 1, 4), "
            f"'0000') < '{Q178_STANDING_HEX}'"
        )
    qs_rows = ", ".join(f"(CAST({q} AS DOUBLE))" for q in Q187_QS)
    return f"""
    WITH o AS (
      SELECT o_orderkey, o_totalprice, ({standing}) AS is_standing
      FROM orders WHERE o_totalprice IS NOT NULL
    ),
    ext AS (
      SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi
      FROM o WHERE is_standing
    ),
    b AS (
      SELECT GREATEST(LEAST(CAST(floor((o_totalprice - lo)
                                        / ((hi - lo) / {Q187_BUCKETS}))
                            AS BIGINT), {Q187_BUCKETS - 1}), 0) AS bucket,
             (o_totalprice < lo OR o_totalprice
                >= lo + ((hi - lo) / {Q187_BUCKETS}) * {Q187_BUCKETS}) AS clamped,
             is_standing
      FROM o, ext
    ),
    counts AS (
      SELECT bucket, count(*) AS n FROM b GROUP BY bucket
    ),
    cum AS (
      SELECT bucket, n,
             sum(n) OVER (ORDER BY bucket) AS c,
             sum(n) OVER (ORDER BY bucket) - n AS c_before
      FROM counts
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM counts),
    clamp AS (
      SELECT CAST(COALESCE(sum(CASE WHEN clamped AND NOT is_standing
                                    THEN 1 ELSE 0 END), 0) AS BIGINT)
               AS n_new_clamped
      FROM b
    ),
    qs(q) AS (VALUES {qs_rows}),
    tgt AS (
      SELECT q, CAST(ceil(q * total) AS BIGINT) AS rk FROM qs, tot
    ),
    est AS (
      SELECT t.q, t.rk, c.bucket, c.n, c.c_before,
             lo + ((hi - lo) / {Q187_BUCKETS})
                * (c.bucket + (t.rk - c.c_before) * 1.0 / c.n) AS est_val
      FROM tgt t JOIN cum c ON c.c >= t.rk AND c.c_before < t.rk, ext
    ),
    ranked AS (
      SELECT o_totalprice,
             row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rn
      FROM o
    ),
    exact AS (
      SELECT t.q, r.o_totalprice AS exact_val
      FROM tgt t JOIN ranked r ON r.rn = t.rk
    )
    SELECT e.q, round(e.est_val, 4) AS est,
           round(x.exact_val, 4) AS exact_val,
           round(abs(e.est_val - x.exact_val), 4) AS abs_err,
           round((hi - lo) / {Q187_BUCKETS}, 4) AS bucket_width,
           (abs(e.est_val - x.exact_val) <= (hi - lo) / {Q187_BUCKETS})
             AS audit_ok,
           clamp.n_new_clamped
    FROM est e JOIN exact x ON x.q = e.q, ext, clamp
    ORDER BY e.q
    """


@register(
    "q187_histogram_quantile_maintenance",
    oracle=_q187_oracle(),
    tags=("maintenance", "incremental", "sketch", "quantiles"),
)
def q187_histogram_quantile_maintenance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DISTRIBUTION-STAT MAINTENANCE: the mergeable equal-width
    histogram is the distribution analog of q178's partials — bucket
    counts are exact integers that ADD across snapshot and increment,
    so the standing histogram (the ELEVENTH persisted family,
    :func:`hist_snapshot_for`) serves current quantile estimates by
    bucketizing ONLY the increment against the fitted boundaries and
    summing. Like q175's codebook, the boundaries go stale: increment
    values outside the fitted [lo, hi] CLAMP into the edge buckets
    (surfaced as ``n_new_clamped`` — the retrain signal), and every
    estimate carries an IN-BAND audit against the exact rank-based
    quantile (|est − exact| ≤ one bucket width, the q16/q165
    falsifiability discipline; the exact path is the audit's cost,
    sampled in production, and runs q153's giant-group-safe rank
    strategy — ``operators.quantiles.global_ranks`` — never q17's
    single-task global-sort formulation).

    Estimate: target rank ``ceil(q·N)`` located in the cumulative
    bucket sums (a 64-row window — sketch-sized, never data-sized),
    linear interpolation within the bucket. All inputs to the float
    formula are exact integers and the fitted extent, computed with
    the same operations in both engines — bit-identical.

    Scale shape: serve cost = increment bucketize (map-side, broadcast
    extent) + a 64-row merge + a 64-row window. The full-data exact
    audit is the only data-sized stage and exists to falsify the
    estimate; drop it and the serve never touches the fact table.

    Reference analog: none (SURVEY §2.3 maintenance block; the
    mergeable-histogram pattern behind every approximate-quantile
    sketch, reduced to its exactly-testable core)."""
    counts_s, ext = hist_snapshot_for(spark, sf_dir)
    return _hist_quantile_view(spark, sf_dir, counts_s, ext)


def _hist_quantile_view(
    spark: SparkSession, sf_dir: str, counts_s: DataFrame, ext: DataFrame
) -> DataFrame:
    """q187's serve against an EXPLICIT histogram artifact: bucketize
    the increment against the artifact's boundaries, merge counts,
    interpolate quantiles, and audit in-band. The increment carve uses
    the artifact's STAMPED boundary (:func:`agg_standing_hex` — the
    same mutable-param discipline as the agg snapshot), so a refreshed
    histogram (q189) serves with a provably empty increment and zero
    clamps through this one code path."""
    o = t(spark, sf_dir, "orders").where(F.col("o_totalprice").isNotNull())
    incr = o.where(~(_order_split_key() < agg_standing_hex(counts_s)))
    incr_b = incr.crossJoin(F.broadcast(ext)).select(
        _hist_bucket_col().alias("bucket"),
        (
            (F.col("o_totalprice") < F.col("lo"))
            | (
                F.col("o_totalprice")
                >= F.col("lo")
                + ((F.col("hi") - F.col("lo")) / Q187_BUCKETS) * Q187_BUCKETS
            )
        ).alias("clamped"),
    )
    incr_counts = incr_b.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    n_clamped = incr_b.agg(
        F.coalesce(F.sum(F.col("clamped").cast("long")), F.lit(0)).alias(
            "n_new_clamped"
        )
    )
    counts = (
        counts_s.unionByName(incr_counts)
        .groupBy("bucket")
        .agg(F.sum("n").alias("n"))
    )
    from pyspark.sql.window import Window as W

    cum = counts.select(
        "bucket",
        "n",
        F.sum("n").over(W.orderBy("bucket")).alias("c"),
        (F.sum("n").over(W.orderBy("bucket")) - F.col("n")).alias("c_before"),
    )
    tot = counts.agg(F.sum("n").alias("total"))
    qs = spark.createDataFrame([(q,) for q in Q187_QS], "q double")
    tgt = qs.crossJoin(F.broadcast(tot)).select(
        "q", F.ceil(F.col("q") * F.col("total")).cast("long").alias("rk")
    )
    width = (F.col("hi") - F.col("lo")) / Q187_BUCKETS
    est = (
        tgt.join(
            cum, (F.col("c") >= F.col("rk")) & (F.col("c_before") < F.col("rk"))
        )
        .crossJoin(F.broadcast(ext))
        .select(
            "q",
            "rk",
            (
                F.col("lo")
                + width
                * (
                    F.col("bucket")
                    + (F.col("rk") - F.col("c_before")) * 1.0 / F.col("n")
                )
            ).alias("est_val"),
            width.alias("_w"),
        )
    )
    # exact rank lookup via the giant-group-safe rank strategy (q153's
    # operator, degenerate single-group case) — the audit no longer
    # carries q17's single-task global-sort pathology; the ordering is
    # total (orderkey tiebreak), matching the oracle's row_number
    from ..operators.quantiles import global_ranks

    ranked = global_ranks(
        o.select("o_totalprice", "o_orderkey"), ["o_totalprice", "o_orderkey"]
    ).select("o_totalprice", "rn")
    exact = tgt.join(ranked, F.col("rn") == F.col("rk")).select(
        F.col("q").alias("q_x"), F.col("o_totalprice").alias("exact_val")
    )
    return (
        est.join(exact, F.col("q") == F.col("q_x"))
        .crossJoin(F.broadcast(n_clamped))
        .select(
            "q",
            F.round("est_val", 4).alias("est"),
            F.round("exact_val", 4).alias("exact_val"),
            F.round(F.abs(F.col("est_val") - F.col("exact_val")), 4).alias(
                "abs_err"
            ),
            F.round("_w", 4).alias("bucket_width"),
            (F.abs(F.col("est_val") - F.col("exact_val")) <= F.col("_w")).alias(
                "audit_ok"
            ),
            "n_new_clamped",
        )
        .orderBy("q")
    )


def hist_snapshot_refresh(spark: SparkSession, sf_dir: str, out_dir: str) -> None:
    """The RETRAIN act q187's ``n_new_clamped`` alarm calls for —
    previously the histogram story ended at the alarm. Unlike q178's
    partials, equal-width bucket counts CANNOT be re-binned across
    moved boundaries without the data (a count bucketized at stale
    [lo, hi] says nothing about where its rows fall in the new grid),
    so the refresh is an honest ONE-PASS FULL REFIT: fit [lo, hi] on
    the whole table, re-bucketize everything, persist counts + extent
    stamped at the moved boundary (:data:`AGG_REFRESHED_HEX` —
    standing = everything, zero pending increments). This is the same
    cost class as the IVF codebook refit q177's churn signal gates:
    the alarm exists precisely because the retrain is not free.

    The refreshed artifact attaches through the ordinary gate
    (``standing_hex`` mutable, ``n_buckets`` immutable) and serves
    through :func:`_hist_quantile_view` unchanged — q189 registers the
    full lifecycle. Pytest contract: refreshed counts == a
    from-scratch full-data bucketize, bit-for-bit, and the post-
    refresh serve clamps nothing."""
    import os

    from ._util import write_index_meta

    o = t(spark, sf_dir, "orders").where(F.col("o_totalprice").isNotNull())
    ext = o.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    counts = (
        o.crossJoin(F.broadcast(ext))
        .select(_hist_bucket_col().alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    counts.write.mode("overwrite").parquet(os.path.join(out_dir, "counts"))
    ext.write.mode("overwrite").parquet(os.path.join(out_dir, "extent"))
    write_index_meta(
        out_dir,
        os.path.join(sf_dir, "orders.parquet"),
        schemas={"counts": counts.schema.json(), "extent": ext.schema.json()},
        params={"standing_hex": AGG_REFRESHED_HEX, "n_buckets": Q187_BUCKETS},
    )


@register(
    "q189_hist_refresh_serve",
    oracle=_q187_oracle("TRUE"),
    tags=("maintenance", "incremental", "sketch", "quantiles", "lifecycle"),
)
def q189_hist_refresh_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HISTOGRAM REFRESH-THEN-SERVE — q188's lifecycle act for the
    distribution sketch: run :func:`hist_snapshot_refresh` (full refit
    at current extent), ATTACH the refreshed artifact through the
    mutable-param gate, and serve q187's quantile view from it. With
    boundaries fitted on everything and the boundary stamp moved, the
    increment carve is provably empty and ``n_new_clamped`` is zero by
    construction — the oracle recomputes the same view with the
    standing predicate TRUE. ``audit_ok`` still runs the exact
    rank-based check: refresh must restore the |est − exact| ≤
    bucket-width bound that stale boundaries erode.

    The session cache entry is save/restored around the attach (the
    returned plan closes over the loaded artifact), so q189 never
    poisons a later q187 call whose oracle models the STALE boundary.

    Scale shape: the refresh is the one-pass refit (the alarm's
    documented cost); the serve afterwards is sketch-sized — a 64-row
    merge + window, an empty increment scan, and the deliberate exact
    audit.

    Reference analog: none (SURVEY §2.3 maintenance block — the
    retrain half of the distribution-sketch lifecycle)."""
    from ._util import refresh_then_serve

    return refresh_then_serve(
        spark, sf_dir,
        cache_family="hist_snapshot",
        src_table="orders.parquet",
        refresh_fn=hist_snapshot_refresh,
        attach_fn=hist_snapshot_attach,
        serve_fn=lambda s, d, art: _hist_quantile_view(s, d, *art),
    )


# --- q203: join-cardinality planning audit ----------------------------------

Q203_PRIORITY = "1-URGENT"


@register(
    "q203_join_cardinality_audit",
    oracle=f"""
    WITH o AS (
      SELECT o_orderkey FROM orders WHERE o_orderpriority = '{Q203_PRIORITY}'
    ),
    lc AS (SELECT l_orderkey AS k, count(*) AS nl FROM lineitem GROUP BY 1),
    oc AS (SELECT o_orderkey AS k, count(*) AS no_ FROM o GROUP BY 1),
    prod AS (
      SELECT lc.k, lc.nl * oc.no_ AS contrib FROM lc JOIN oc USING (k)
    ),
    est AS (
      SELECT CAST(coalesce(sum(contrib), 0) AS BIGINT) AS est_rows,
             CAST(coalesce(max(contrib), 0) AS BIGINT) AS top_contrib,
             CAST(coalesce(count(*), 0) AS BIGINT) AS n_keys
      FROM prod
    ),
    act AS (
      SELECT CAST(count(*) AS BIGINT) AS actual_rows
      FROM lineitem l JOIN o ON l.l_orderkey = o.o_orderkey
    )
    SELECT est_rows, actual_rows, (est_rows = actual_rows) AS exact_match,
           n_keys, top_contrib,
           CAST(CASE WHEN est_rows > 0
                     THEN top_contrib * 100 // est_rows ELSE 0 END
                AS BIGINT) AS top_share_pct
    FROM est, act
    """,
    tags=("maintenance", "planning", "join", "skew"),
)
def q203_join_cardinality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN-CARDINALITY PLANNING AUDIT — the pre-join pass that sizes
    a 1000-executor join BEFORE running it: per-key counts on both
    sides (group-sized aggregates) joined and multiplied give the
    join's output cardinality EXACTLY — Σ_k n_left(k)·n_right(k) is
    not an estimate, it is the equi-join row count, computable at
    group-size cost without materializing a single joined row. The
    query computes both (the count-product and the real join's count)
    and asserts their equality cross-engine; ``top_share_pct`` — the
    largest single key's share of the output — is the skew number
    that decides between a plain shuffle join, a salted join (q18's
    fan-out, sized by q180), and an AQE skew split.

    At 100 TB the count-product side costs two map-side-combined
    aggregates over key frequencies and one group-sized join — the
    real join costs a full fact-table shuffle. Running THIS first is
    how a pipeline avoids discovering a 10^14-row blowup at executor
    OOM time. (The actual-join column exists here to falsify the
    identity; production runs only the cheap side.)

    Reference analog: none (SURVEY §2.3 ops/planning extension —
    q180's skew audit lifted from one table to the join product)."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == Q203_PRIORITY
    ).select("o_orderkey")
    lc = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("nl")
    )
    oc = o.groupBy(F.col("o_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("no_")
    )
    prod = lc.join(oc, "k").select(
        "k", (F.col("nl") * F.col("no_")).alias("contrib")
    )
    est = prod.agg(
        F.coalesce(F.sum("contrib"), F.lit(0)).cast("long").alias("est_rows"),
        F.coalesce(F.max("contrib"), F.lit(0)).cast("long").alias("top_contrib"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
    )
    act = li.join(o, li.l_orderkey == o.o_orderkey).agg(
        F.count(F.lit(1)).cast("long").alias("actual_rows")
    )
    return est.crossJoin(F.broadcast(act)).select(
        "est_rows",
        "actual_rows",
        (F.col("est_rows") == F.col("actual_rows")).alias("exact_match"),
        "n_keys",
        "top_contrib",
        F.when(
            F.col("est_rows") > 0,
            F.expr("top_contrib * 100 div est_rows"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("top_share_pct"),
    )


@register(
    "q210_join_cardinality_plan",
    oracle=f"""
    WITH o AS (
      SELECT o_orderkey FROM orders WHERE o_orderpriority = '{Q203_PRIORITY}'
    ),
    lc AS (SELECT l_orderkey AS k, count(*) AS nl FROM lineitem GROUP BY 1),
    oc AS (SELECT o_orderkey AS k, count(*) AS no_ FROM o GROUP BY 1),
    prod AS (
      SELECT lc.k, lc.nl * oc.no_ AS contrib FROM lc JOIN oc USING (k)
    )
    SELECT CAST(coalesce(sum(contrib), 0) AS BIGINT) AS est_rows,
           CAST(coalesce(count(*), 0) AS BIGINT) AS n_keys,
           CAST(coalesce(max(contrib), 0) AS BIGINT) AS top_contrib,
           CAST(CASE WHEN coalesce(sum(contrib), 0) > 0
                     THEN coalesce(max(contrib), 0) * 100
                          // coalesce(sum(contrib), 0)
                     ELSE 0 END AS BIGINT) AS top_share_pct
    FROM prod
    """,
    tags=("maintenance", "planning", "join", "skew"),
)
def q210_join_cardinality_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q203's CHEAP ARM — the planning pass alone, as production runs
    it: per-key counts on both sides, the count-product, and the skew
    share — WITHOUT the real join q203 keeps for falsifiability. q203
    stays the oracle-checked identity proof (Σ n_l·n_r == join count);
    this is the shape a pipeline actually schedules before a 100 TB
    join, and the shape the bench should price: two map-side-combined
    aggregates + one group-sized join, never a fact-table shuffle.

    Reference analog: none (SURVEY §2.3 ops/planning extension —
    q203's production half, split out per the round-15 review)."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == Q203_PRIORITY
    ).select("o_orderkey")
    lc = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("nl")
    )
    oc = o.groupBy(F.col("o_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("no_")
    )
    prod = lc.join(oc, "k").select(
        "k", (F.col("nl") * F.col("no_")).alias("contrib")
    )
    est = prod.agg(
        F.coalesce(F.sum("contrib"), F.lit(0)).cast("long").alias("est_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.coalesce(F.max("contrib"), F.lit(0)).cast("long").alias("top_contrib"),
    )
    return est.select(
        "est_rows",
        "n_keys",
        "top_contrib",
        F.when(
            F.col("est_rows") > 0, F.expr("top_contrib * 100 div est_rows")
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("top_share_pct"),
    )


# --- q204: incremental layout maintenance — the compaction trigger ---------

# Standing/arrival carve on o_orderkey (the q178 idiom, 'lay1:' salt).
Q204_STANDING_HEX = "e666"
Q204_TAIL_FILES = 8
# Compact when the tail's share of window-scanned rows exceeds this
# integer percentage — the OPTIMIZE trigger.
Q204_TRIGGER_PCT = 20


def _q204_oracle() -> str:
    zdiv = 1 << (2 * _ZBITS - 6)
    standing = (
        "COALESCE(substr(md5('lay1:' || CAST(ck AS VARCHAR)), 1, 4), '0000') "
        f"< '{Q204_STANDING_HEX}'"
    )
    return f"""
    WITH {_ZORDER_CTES},
    lay AS (
      SELECT ck, dd,
             ({standing}) AS is_standing,
             CASE WHEN {standing} THEN CAST(zval // {zdiv} AS BIGINT)
                  ELSE 64 + (ck % {Q204_TAIL_FILES}) END AS file_id
      FROM z
    ),
    fs AS (
      SELECT CASE WHEN is_standing THEN 'standing_zorder'
                  ELSE 'arrival_tail' END AS layer,
             file_id, count(*) AS n_rows,
             min(dd) AS dd_min, max(dd) AS dd_max,
             (NOT (max(dd) < {Q179_DD_LO} OR min(dd) > {Q179_DD_HI}))
               AS touched
      FROM lay GROUP BY 1, 2
    ),
    agg AS (
      SELECT layer,
             CAST(count(*) AS BIGINT) AS n_files,
             CAST(sum(CASE WHEN touched THEN 1 ELSE 0 END) AS BIGINT)
               AS n_touched,
             CAST(sum(n_rows) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN touched THEN n_rows ELSE 0 END) AS BIGINT)
               AS rows_scanned
      FROM fs GROUP BY layer
    ),
    tot AS (
      -- empty-layer guards (cross-engine edge): a missing arrival_tail
      -- layer coalesces to 0 (not NULL), and scan_total is floored at 1
      -- so the integer division never divides by zero in either engine
      SELECT CAST(COALESCE(sum(rows_scanned), 0) AS BIGINT) AS scan_total,
             CAST(COALESCE((SELECT rows_scanned FROM agg
                            WHERE layer = 'arrival_tail'), 0) AS BIGINT)
               AS tail_scanned
      FROM agg
    )
    SELECT layer, n_files, n_touched, n_rows, rows_scanned,
           CAST(rows_scanned * 100 // greatest(scan_total, 1) AS BIGINT)
             AS scan_share_pct,
           (tail_scanned * 100 // greatest(scan_total, 1)
              >= {Q204_TRIGGER_PCT})
             AS compact_recommended
    FROM agg, tot
    ORDER BY layer
    """


@register(
    "q204_incremental_layout_audit",
    oracle=_q204_oracle(),
    tags=("maintenance", "layout", "pruning", "incremental"),
)
def q204_incremental_layout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL LAYOUT MAINTENANCE — the missing step between
    q179's audit and q182's rewrite: real tables DEGRADE. The standing
    90% sits in the Z-ordered layout the last OPTIMIZE produced (64
    files with tight zone maps); arrivals since then land in TAIL
    files in arrival order, whose dd zone maps span the whole table —
    every windowed scan touches every tail file. This query audits
    both layers under the pinned date window and emits the COMPACTION
    TRIGGER: when the unsorted tail's share of window-scanned rows
    crosses Q204_TRIGGER_PCT, run the incremental OPTIMIZE — q206 is
    that act, and provably clears this trigger (the Delta/Iceberg
    incremental-OPTIMIZE policy, as a measured decision instead of a
    timer).

    Scale shape: one scan, one (layer, file) aggregate — zone maps are
    group-sized facts; the decision arithmetic is integer percentages
    on a 2-row table. The audit never reads the window's rows; it
    PREDICTS what a scan would read from the zone maps, which is
    exactly what the planner does.

    Reference analog: none (SURVEY §2.3 ops extension — closes the
    q179 → q182 loop against arrival entropy)."""
    zdiv = 1 << (2 * _ZBITS - 6)
    z = _zorder_frame(spark, sf_dir)
    standing = F.coalesce(
        F.substring(
            F.md5(F.concat(F.lit("lay1:"), F.col("ck").cast("string"))), 1, 4
        ),
        F.lit("0000"),
    ) < Q204_STANDING_HEX
    lay = z.select(
        "ck",
        "dd",
        standing.alias("is_standing"),
        F.when(standing, F.expr(f"CAST(zval div {zdiv} AS BIGINT)"))
        .otherwise(F.lit(64) + F.col("ck") % Q204_TAIL_FILES)
        .alias("file_id"),
    )
    fs = (
        lay.groupBy(
            F.when(F.col("is_standing"), F.lit("standing_zorder"))
            .otherwise(F.lit("arrival_tail"))
            .alias("layer"),
            "file_id",
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("dd").alias("dd_min"),
            F.max("dd").alias("dd_max"),
        )
        .withColumn(
            "touched",
            ~((F.col("dd_max") < Q179_DD_LO) | (F.col("dd_min") > Q179_DD_HI)),
        )
    )
    agg = fs.groupBy("layer").agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum(F.col("touched").cast("long")).cast("long").alias("n_touched"),
        F.sum("n_rows").cast("long").alias("n_rows"),
        F.sum(F.when(F.col("touched"), F.col("n_rows")).otherwise(0))
        .cast("long")
        .alias("rows_scanned"),
    )
    # empty-layer guards mirror the oracle's: missing tail -> 0, and
    # scan_total floored at 1 so the div never hits zero
    tot = agg.agg(
        F.coalesce(F.sum("rows_scanned"), F.lit(0))
        .cast("long")
        .alias("scan_total"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("layer") == "arrival_tail", F.col("rows_scanned")
                ).otherwise(0)
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("tail_scanned"),
    )
    return (
        agg.crossJoin(F.broadcast(tot))
        .select(
            "layer",
            "n_files",
            "n_touched",
            "n_rows",
            "rows_scanned",
            F.expr("rows_scanned * 100 div greatest(scan_total, 1L)")
            .cast("long")
            .alias("scan_share_pct"),
            (
                F.expr("tail_scanned * 100 div greatest(scan_total, 1L)")
                >= Q204_TRIGGER_PCT
            ).alias("compact_recommended"),
        )
        .orderBy("layer")
    )


# --- q206: the incremental OPTIMIZE — q204's compaction act ------------------


def _q206_root(sf_dir: str) -> str:
    """Per-source scratch root for the staged two-layer table —
    fingerprint-keyed like q182's (two fixture dirs, or a regenerated
    one, never serve each other's footers); overwritten every run."""
    import os

    from ._util import source_fingerprint
    from .io_roundtrip import _scratch

    fp = source_fingerprint(os.path.join(sf_dir, "orders.parquet"))
    return os.path.join(
        _scratch("zorder_incr"), f"{os.path.basename(fp[0])}-{fp[1]}-{fp[2]}"
    )


def _q206_oracle() -> str:
    zdiv = 1 << (2 * _ZBITS - 6)
    return f"""
    WITH {_ZORDER_CTES},
    f AS (SELECT CAST(zval // {zdiv} AS BIGINT) AS file_id, dd FROM z)
    SELECT file_id, count(*) AS n_rows,
           min(dd) AS dd_min, max(dd) AS dd_max,
           (NOT (max(dd) < {Q179_DD_LO} OR min(dd) > {Q179_DD_HI})) AS touched,
           -- post-OPTIMIZE invariants: the arrival tail was folded into
           -- the Z-layout (its directory is gone), so the q204 trigger
           -- formula evaluates over tail_scanned = 0 — identically false
           CAST(0 AS BIGINT) AS tail_files_left,
           FALSE AS compact_recommended
    FROM f GROUP BY file_id ORDER BY file_id
    """


@register(
    "q206_incremental_optimize",
    oracle=_q206_oracle(),
    tags=("maintenance", "layout", "pruning", "incremental", "sink"),
)
def q206_incremental_optimize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL OPTIMIZE — the act q204's trigger calls for: rewrite
    ONLY the arrival tail into the Z-order layout and merge it into
    the standing files, then re-audit the merged table from its REAL
    parquet footers and re-evaluate the trigger — which clears.

    Three steps, each priced like the production job it models:

    1. STAGE the degraded table q204 audits (the fixture half): the
       standing ~90% lands Z-ordered as ``file_id = zval div 2^26``
       partitions; the arrival tail lands in arrival-order files whose
       dd zone maps span the whole table. The table-global (ck, dd)
       extents are persisted beside it — the stored layout metadata an
       incremental OPTIMIZE scales new keys against (recomputing them
       from data would make the rewrite table-sized).
    2. The OPTIMIZE itself — the only step a production run pays per
       trigger: read the TAIL ROWS ONLY, scale against the broadcast
       1-row extents artifact, compute each row's Z-range, and APPEND
       into the standing layout (one shuffle sized by the tail, one
       partitioned write touching only the Z-ranges the tail lands
       in). The consumed tail directory is then dropped — any leftover
       tail file raises rather than serving a wrong audit (a torn
       commit must refuse, not report clean).
    3. RE-AUDIT from stamped metadata: q182's distributed footer read
       (:func:`_dd_footer_stats`) over the merged layout. Each
       Z-range's zone map now folds standing + appended-tail files.

    The oracle replays the merged layout from the raw rows — the full
    q182 contract over the combined table: a rewrite that scattered a
    Z-range, dropped, or duplicated a tail row mismatches n_rows /
    dd_min / dd_max per file. ``compact_recommended`` re-evaluates
    q204's formula over the post-layout (tail_scanned = 0) — the
    trigger provably flips false, and tests/test_maintenance.py pins
    the before/after pair (q204 true → q206 false) plus row
    conservation.

    Scale shape: staging is the fixture; the recurring cost is step 2
    — tail-sized read + tail-sized shuffle + appends into O(touched
    Z-ranges) files — and the metadata-only audit. At 100 TB with a
    1% daily tail this is the nightly job that keeps q179's pruning
    ratios from decaying, at 1% of the full-rewrite cost q182 prices.

    Reference analog: none (SURVEY §2.3 ops extension — closes
    q204's alarm → act loop; the Delta/Iceberg incremental OPTIMIZE
    pattern)."""
    _q206_stage(spark, sf_dir)
    return _q206_optimize_and_audit(spark, sf_dir)


def _q206_stage(spark: SparkSession, sf_dir: str) -> None:
    """q206 step 1 — stage the degraded two-layer fixture (standing
    Z-layout + arrival-order tail + the persisted 1-row extents
    artifact). Split out so the bench can price it separately from
    the recurring arm: production pays staging never (the degraded
    table IS production state), the OPTIMIZE per trigger."""
    import os
    import shutil

    zdiv = 1 << (2 * _ZBITS - 6)
    root = _q206_root(sf_dir)
    table_dir = os.path.join(root, "table")
    tail_dir = os.path.join(root, "tail")
    ext_dir = os.path.join(root, "ext")
    shutil.rmtree(root, ignore_errors=True)
    z = _zorder_frame(spark, sf_dir)
    standing = F.coalesce(
        F.substring(
            F.md5(F.concat(F.lit("lay1:"), F.col("ck").cast("string"))), 1, 4
        ),
        F.lit("0000"),
    ) < Q204_STANDING_HEX
    lay = z.select("ck", "dd", F.expr(f"CAST(zval div {zdiv} AS BIGINT)").alias(
        "file_id"
    ), standing.alias("is_standing"))
    lay.where("is_standing").select("ck", "dd", "file_id").repartition(
        "file_id"
    ).write.mode("overwrite").partitionBy("file_id").parquet(table_dir)
    lay.where(~F.col("is_standing")).select(
        "ck", "dd", (F.lit(64) + F.col("ck") % Q204_TAIL_FILES).alias("tfile")
    ).repartition("tfile").write.mode("overwrite").partitionBy("tfile").parquet(
        tail_dir
    )
    # the stored layout metadata (1 row): global extents the rewrite
    # scales against — never recomputed from data at OPTIMIZE time
    t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("ck"),
        F.datediff(
            F.to_date("o_orderdate"), F.to_date(F.lit("1995-01-01"))
        ).cast("long").alias("dd"),
    ).where(F.col("ck").isNotNull() & F.col("dd").isNotNull()).agg(
        F.min("ck").alias("ckmin"), F.max("ck").alias("ckmax"),
        F.min("dd").alias("ddmin"), F.max("dd").alias("ddmax"),
    ).write.mode("overwrite").parquet(ext_dir)


def _q206_optimize_and_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q206 steps 2–3 — the RECURRING arm a production run pays per
    trigger: tail-only rewrite into the standing layout, then the
    metadata-only re-audit. Requires :func:`_q206_stage`'s fixture."""
    import glob as _glob
    import os
    import shutil

    zdiv = 1 << (2 * _ZBITS - 6)
    scale = (1 << _ZBITS) - 1
    root = _q206_root(sf_dir)
    table_dir = os.path.join(root, "table")
    tail_dir = os.path.join(root, "tail")
    ext_dir = os.path.join(root, "ext")

    # -- 2. the incremental OPTIMIZE: tail rows only --
    # empty-tail guard: an all-standing carve stages no tail files
    # (a partitioned write of zero rows leaves only _SUCCESS, which a
    # parquet read cannot infer a schema from) — nothing to optimize,
    # skip straight to the audit with the trigger already clear
    if not _glob.glob(os.path.join(tail_dir, "tfile=*", "*.parquet")):
        shutil.rmtree(tail_dir, ignore_errors=True)
        stats = _dd_footer_stats(spark, table_dir)
        return stats.select(
            "file_id", "n_rows", "dd_min", "dd_max",
            (~((F.col("dd_max") < Q179_DD_LO)
               | (F.col("dd_min") > Q179_DD_HI))).alias("touched"),
            F.lit(0).cast("long").alias("tail_files_left"),
            F.lit(False).alias("compact_recommended"),
        ).orderBy("file_id")
    ext = spark.read.parquet(ext_dir)
    tail = spark.read.parquet(tail_dir).select("ck", "dd")
    zt = tail.crossJoin(F.broadcast(ext)).select(
        "ck",
        "dd",
        F.expr(
            f"CAST(((ck - ckmin) * {scale}) div GREATEST(ckmax - ckmin, 1) AS BIGINT)"
        ).alias("x16"),
        F.expr(
            f"CAST(((dd - ddmin) * {scale}) div GREATEST(ddmax - ddmin, 1) AS BIGINT)"
        ).alias("d16"),
    ).select(
        "ck",
        "dd",
        F.expr(
            f"CAST(({_z_expr_spark('x16', 'd16')}) div {zdiv} AS BIGINT)"
        ).alias("file_id"),
    )
    zt.repartition("file_id").write.mode("append").partitionBy(
        "file_id"
    ).parquet(table_dir)
    shutil.rmtree(tail_dir, ignore_errors=True)
    leftover = _glob.glob(os.path.join(tail_dir, "tfile=*", "*.parquet"))
    if leftover:
        raise RuntimeError(
            f"incremental OPTIMIZE left {len(leftover)} tail files under "
            f"{tail_dir} — torn commit; refusing to audit a half-merged "
            "layout"
        )

    # -- 3. re-audit from real footers; the trigger re-evaluates false --
    stats = _dd_footer_stats(spark, table_dir)
    return stats.select(
        "file_id",
        "n_rows",
        "dd_min",
        "dd_max",
        (
            ~((F.col("dd_max") < Q179_DD_LO) | (F.col("dd_min") > Q179_DD_HI))
        ).alias("touched"),
        F.lit(0).cast("long").alias("tail_files_left"),
        # q204's formula over the post-layout: tail_scanned = 0 (the
        # leftover check above guarantees it), 0 * 100 div total = 0 < pct
        F.lit(False).alias("compact_recommended"),
    ).orderBy("file_id")
