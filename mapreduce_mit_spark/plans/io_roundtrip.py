"""Source/sink round-trips surfaced as driver-checkable queries.

The reference's serialization surface is JSON spill files between map
and reduce (/root/reference/src/mapreduce/common_map.go:84-98,
common_reduce.go:47-61: encode KeyValue to per-reduce JSON files, decode
on the reduce side) and a merged key-sorted ``"key: value"`` text sink
(master_splitmerge.go:39-48). These queries run the engine's JSON / CSV
/ sorted-text sources+sinks end-to-end — write to a scratch dir, read
back, aggregate — with the DuckDB oracle computed from the ORIGINAL
parquet, so a green row proves the round-trip is lossless, not merely
that it runs (SURVEY §2.1 #5, #12).

Scale notes: all writers shard one file per partition (no driver
funnel); the single-file collapse exists only inside
``write_sorted_text`` for reference golden parity and is documented
there. Scratch lives under the system temp dir, one dir per kind per
process (writers overwrite), removed at interpreter exit.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.io import (
    read_csv,
    read_json,
    read_orc,
    write_csv,
    write_json,
    write_orc,
    write_sorted_text,
)
from ._util import hex_int_sql, t

# One scratch dir per kind per PROCESS, removed at interpreter exit.
# Re-invoking a round-trip query in the same session reuses the path —
# safe because every writer runs mode="overwrite" — so repeated
# verify/test/bench runs no longer leak a full table copy per call.
_SCRATCH_DIRS: dict[str, str] = {}


def _cleanup_scratch() -> None:
    for d in _SCRATCH_DIRS.values():
        shutil.rmtree(d, ignore_errors=True)


atexit.register(_cleanup_scratch)


def _scratch(kind: str) -> str:
    if kind not in _SCRATCH_DIRS:
        _SCRATCH_DIRS[kind] = tempfile.mkdtemp(prefix=f"mms_{kind}_")
    return os.path.join(_SCRATCH_DIRS[kind], "data")


@register(
    "q55_json_roundtrip",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n_orders,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS total_price,
           CAST(max(o_orderdate) AS DATE) AS last_date
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    tags=("source", "sink", "json"),
)
def q55_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → JSON sink → JSON source → aggregate.

    The reference's map→reduce hand-off serializes every intermediate
    KeyValue as JSON (common_map.go:84-98); here the whole table makes
    the trip. Reading back with the writer's schema (not inference)
    pins types — dates included — and the oracle aggregates the
    original parquet, so any lossy encode/decode breaks the hash."""
    o = t(spark, sf_dir, "orders")
    path = _scratch("json")
    write_json(o, path)
    back = read_json(spark, path, schema=o.schema)
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            (F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")) / 100.0).alias(
                "total_price"
            ),
            F.max(F.col("o_orderdate").cast("date")).alias("last_date"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "q56_csv_roundtrip",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n_customers,
           sum(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0 AS total_balance,
           CAST(sum(length(c_name)) AS BIGINT) AS name_chars
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("source", "sink", "csv"),
)
def q56_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer → CSV sink → CSV source (explicit schema) → aggregate.

    ``name_chars`` totals free-text lengths, so broken
    quoting/escaping inside c_name shifts the sum and fails the hash —
    the string column exercises the delimiter/quote path, not just the
    numeric happy path."""
    c = t(spark, sf_dir, "customer")
    path = _scratch("csv")
    write_csv(c, path)
    back = read_csv(spark, path, schema=c.schema)
    return (
        back.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            (F.sum(F.expr("CAST(round(c_acctbal * 100) AS BIGINT)")) / 100.0).alias(
                "total_balance"
            ),
            F.sum(F.length("c_name")).alias("name_chars"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "q57_sorted_text_sink",
    oracle="""
    SELECT n_name || ': ' || CAST(n_customers AS VARCHAR) AS line
    FROM (
      SELECT n_name, count(*) AS n_customers
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name
    )
    ORDER BY line
    """,
    tags=("sink", "text", "golden"),
)
def q57_sorted_text_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate → merged key-sorted ``"key: value"`` text sink → text
    source.

    The reference's final output contract (master_splitmerge.go:39-48:
    one file, ``key: value`` lines, byte-sorted by key) driven end-to-
    end: per-nation customer counts go through ``write_sorted_text``
    and are read back as raw lines; the oracle builds the identical
    lines from the original tables."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    counts = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").cast("string").alias("n_customers"))
    )
    path = _scratch("text")
    write_sorted_text(counts, "n_name", "n_customers", path)
    return spark.read.text(path).select(F.col("value").alias("line")).orderBy("line")


@register(
    "q103_orc_roundtrip",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n_items,
           sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS total_price,
           CAST(max(l_shipdate) AS DATE) AS last_ship
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("source", "sink", "orc"),
)
def q103_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem → ORC sink → ORC source → aggregate.

    The third columnar format next to parquet (everywhere) and the
    row-ish text/CSV/JSON trips — ORC is Spark-native (vectorized
    reader, predicate pushdown) and needs no schema pin on read-back
    because the file embeds types. The oracle aggregates the ORIGINAL
    parquet, so a green row proves the encode/decode preserved doubles,
    strings and timestamps exactly."""
    li = t(spark, sf_dir, "lineitem")
    path = _scratch("orc")
    write_orc(li, path)
    back = read_orc(spark, path)
    return (
        back.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_items"),
            (
                F.sum(F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)")) / 100.0
            ).alias("total_price"),
            F.max(F.col("l_shipdate").cast("date")).alias("last_ship"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q105_shard_export",
    oracle="""
    SELECT (doc_id * 2654435761) % 8 AS shard,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           count(DISTINCT lang) AS n_langs
    FROM documents
    GROUP BY shard
    ORDER BY shard
    """,
    tags=("sink", "source", "export", "partitioned"),
)
def q105_shard_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard export: documents → deterministic shards →
    partitioned JSONL sink → read back → per-shard stats.

    The last mile of a training-data pipeline: trainers consume
    hash-sharded JSONL, one directory per shard, so data-parallel
    ranks read disjoint files. Shard = Knuth multiplicative hash of
    doc_id mod 8 — deterministic and engine-portable (unlike
    xxhash64), so the oracle recomputes the same assignment from the
    original parquet. ``partitionBy("shard")`` writes one directory
    per shard with one file per task — no driver funnel, and at 100 TB
    per-shard file counts follow upstream parallelism (tune with
    maxRecordsPerFile). Read-back recovers the shard from the
    directory key; stats hashing both sides proves no row crossed a
    shard boundary and no doc was lost."""
    d = t(spark, sf_dir, "documents")
    sharded = d.withColumn(
        "shard", (F.col("doc_id") * F.lit(2654435761)) % 8
    )
    path = _scratch("shards")
    write_json(sharded, path, partition_by=["shard"])
    back = read_json(spark, path, schema=sharded.schema)
    return (
        back.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.countDistinct("lang").alias("n_langs"),
        )
        .orderBy("shard")
    )


@register(
    "q114_bucketed_join",
    oracle="""
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_orders,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("sink", "source", "bucketed", "join"),
)
def q114_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed storage as the co-located-join primitive: both sides
    written ``bucketBy(8, key)`` into managed parquet tables, then
    joined WITHOUT shuffling either table — the bucket layout *is* the
    exchange, paid once at write time and amortized over every
    subsequent join on that key.

    Scale shape: this is the 100 TB answer to a fact-fact join that
    recurs (orders⋈customer on custkey here): pre-bucket both tables on
    the join key and every later join/aggregation on that key is
    exchange-free (plan-pinned — the only Exchange left is the final
    segment group-by, whose input is already partial-aggregated). The
    ``merge`` hint stands in for disabling broadcast so the plan shows
    the bucketed sort-merge path even at test SF; at real SF the
    optimizer picks it unaided. Writers run mode=overwrite, so
    re-invocation in one session is idempotent."""
    o = t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    for name, df, key in (
        ("mms_bkt_orders", o, "o_custkey"),
        ("mms_bkt_customer", c, "c_custkey"),
    ):
        # A managed-table LOCATION can outlive its catalog entry (the
        # in-memory catalog dies with the session, the directory does
        # not) — saveAsTable refuses the orphan dir, so clear both.
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        loc = os.path.join(warehouse.removeprefix("file:"), name)
        shutil.rmtree(loc, ignore_errors=True)
        (
            df.write.mode("overwrite")
            .format("parquet")
            .bucketBy(8, key)
            .sortBy(key)
            .saveAsTable(name)
        )
    bo = spark.table("mms_bkt_orders")
    bc = spark.table("mms_bkt_customer").hint("merge")
    return (
        bo.join(bc, bo.o_custkey == bc.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            (F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")) / 100.0).alias(
                "total_price"
            ),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "q138_wholefile_datasource",
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(length(text)) + count(*) AS BIGINT) AS n_chars
    FROM documents
    WHERE text IS NOT NULL AND lang IS NOT NULL
    GROUP BY lang
    ORDER BY lang
    """,
    tags=("source", "sink", "python-datasource"),
)
def q138_wholefile_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-file scan as a Spark 4 custom Python DataSource — the
    reference's input contract (one file = one map task, map sees
    (filename, contents); master.go:63-65, common_map.go:61) rebuilt as
    a planner-native ``format("wholefile_text")`` source
    (sources/pydatasource.py).

    Round-trip: documents are exported one text FILE PER LANGUAGE
    (repartition by lang + partitionBy sink — the whole-file layout),
    the custom source reads each file as one (path, content) row in its
    own partition, and per-lang doc/char counts are recomputed from the
    raw bytes: n_docs = newline count, n_chars = content length (each
    doc contributes len(text)+1). That arithmetic is only sound if no
    TEXT contains a newline, so the writer enforces it: a raise_error
    guard in the export projection fails the write on the first
    newline-bearing document instead of silently inflating n_docs.

    Scale posture: planning lists files driver-side only; each file is
    one task (the reference's exact parallelism model); a production
    variant would binpack small files per partition — that policy lives
    in WholeFileTextReader.partitions()."""
    from ..sources.pydatasource import register_wholefile_source

    d = t(spark, sf_dir, "documents")
    loc = os.path.join(_scratch("wholefile"), "docs_by_lang")
    # Export eligibility: a NULL text has no bytes to land and a NULL
    # lang has no partition to land IN — both are skipped with a
    # VISIBLE filter the oracle mirrors (the production dead-letter
    # split), not an error: unlike the newline case below, nothing
    # about the line-count arithmetic is silently corrupted by their
    # absence. (partitionBy would otherwise route NULL lang into a
    # __HIVE_DEFAULT_PARTITION__ directory the oracle can't name.)
    d = d.where(F.col("text").isNotNull() & F.col("lang").isNotNull())
    # newline-free contract, enforced at write time (see docstring):
    # a newline INSIDE a document would silently inflate n_docs, so it
    # fails the write loudly instead.
    guarded = F.when(F.instr("text", "\n") == 0, F.col("text")).otherwise(
        F.raise_error(
            F.concat(
                F.lit("q138: newline inside document text, doc_id="),
                F.coalesce(F.col("doc_id").cast("string"), F.lit("NULL")),
            )
        )
    )
    (
        d.select("lang", guarded.alias("value"))
        .repartition("lang")
        .write.mode("overwrite")
        .partitionBy("lang")
        .text(loc)
    )

    register_wholefile_source(spark)
    files = (
        spark.read.format("wholefile_text")
        .option("path", os.path.join(loc, "lang=*", "*.txt"))
        .load()
    )
    return (
        files.select(
            F.regexp_extract("path", r"lang=([^/]+)", 1).alias("lang"),
            F.length(F.regexp_replace("content", r"[^\n]", "")).cast("long").alias(
                "n_docs"
            ),
            F.length("content").cast("long").alias("n_chars"),
        )
        .groupBy("lang")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("n_chars").alias("n_chars"),
        )
        .orderBy("lang")
    )


_Q169_KEY_SQL = (
    "md5(CAST(doc_id AS VARCHAR) || ':' || CAST(text IS NULL AS VARCHAR)"
    " || ':' || coalesce(text, ''))"
)


@register(
    "q169_pydatasource_sink",
    oracle=f"""
    SELECT doc_id % 4 AS shard,
           count(*) AS n_docs,
           CAST(sum({hex_int_sql(_Q169_KEY_SQL, 1, 8)}) AS BIGINT) AS checksum
    FROM documents
    GROUP BY doc_id % 4
    ORDER BY shard
    """,
    tags=("sink", "source", "custom-datasource", "exactly-once"),
)
def q169_pydatasource_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python DataSource WRITER roundtrip — the OUTPUT half of
    the reference's file contract, completing q138's reader: documents
    are encoded one-row-per-line (tab fields, text HEX-encoded so
    embedded tabs/newlines in dirty rows can't break framing — hex,
    not base64: Spark's base64 emits MIME-chunked output with its own
    newlines every 76 chars; NULL text a distinct marker), written through
    ``format("wholefile_text")`` — one file per task, two-phase
    rename-commit (`sources/pydatasource.py` WholeFileTextWriter;
    common_reduce.go's mr.out-N shape with the Hadoop job-commit
    discipline) — then read BACK through the same source's reader,
    decoded, and reduced to per-shard (count, order-independent
    checksum). The checksum sums a 32-bit md5 prefix per ORIGINAL
    (doc_id, text) pair, so the oracle computes it from the parquet
    directly: equality proves no row was lost, duplicated, or
    corrupted through the write-read cycle.

    Scale posture: the encode is a pure map; the write publishes one
    file per upstream partition with no driver funnel; the read-back
    is partition-per-file; the only shuffle is the final 4-group
    aggregate. On a real cluster the rename-commit becomes the object
    store's manifest commit — the task/driver protocol is the same."""
    from ..sources.pydatasource import register_wholefile_source

    register_wholefile_source(spark)
    d = t(spark, sf_dir, "documents")
    line = F.concat(
        F.col("doc_id").cast("string"),
        F.lit("\t"),
        F.when(F.col("text").isNull(), F.lit("\\N")).otherwise(
            F.hex(F.encode(F.col("text"), "UTF-8"))
        ),
    )
    # Per-PROCESS scratch (mkdtemp at first use, like every io_roundtrip
    # sink), so concurrent SESSIONS never share this tree; within one
    # session the reset-then-write assumes the single-threaded query
    # execution the whole io_roundtrip family assumes. A shared
    # multi-writer tree would need q168's tree_lock lease instead.
    out_dir = _scratch("pysink")
    shutil.rmtree(out_dir, ignore_errors=True)
    d.select(line.alias("line")).write.format("wholefile_text").option(
        "path", out_dir
    ).mode("append").save()

    back = (
        spark.read.format("wholefile_text")
        .option("path", os.path.join(out_dir, "part-*.txt"))
        .load()
        .select(F.explode(F.split("content", "\n")).alias("ln"))
        .where(F.col("ln") != "")
        .select(
            F.split_part(F.col("ln"), F.lit("\t"), F.lit(1))
            .cast("long")
            .alias("doc_id"),
            F.split_part(F.col("ln"), F.lit("\t"), F.lit(2)).alias("enc"),
        )
        .select(
            "doc_id",
            F.when(F.col("enc") == "\\N", F.lit(None).cast("string"))
            .otherwise(F.decode(F.unhex(F.col("enc")), "UTF-8"))
            .alias("text"),
        )
    )
    key = F.md5(
        F.concat(
            F.col("doc_id").cast("string"),
            F.lit(":"),
            F.col("text").isNull().cast("string"),
            F.lit(":"),
            F.coalesce("text", F.lit("")),
        )
    )
    h = F.conv(F.substring(key, 1, 8), 16, 10).cast("long")
    # accumulate in decimal(38,0) — the oracle sums in DuckDB HUGEINT
    # then casts to BIGINT, so a LongType sum would hit ANSI overflow
    # ~4e9 rows before the oracle's cast does; decimal matches the
    # oracle's exact accumulation, and the final cast fails identically
    # on both sides iff the total genuinely exceeds BIGINT
    return (
        back.groupBy((F.col("doc_id") % 4).alias("shard"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(h.cast("decimal(38,0)")).cast("long").alias("checksum"),
        )
        .orderBy("shard")
    )


@register(
    "q174_binpacked_corpus_scan",
    oracle=f"""
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length(text)) + count(*) AS BIGINT) AS n_chars,
           CAST(sum(CASE WHEN text != ''
                         THEN {hex_int_sql("md5(text)", 1, 8)}
                         ELSE 0 END) AS BIGINT) AS content_sum
    FROM documents
    WHERE text IS NOT NULL AND lang IS NOT NULL
    """,
    tags=("source", "python-datasource", "binpack"),
)
def q174_binpacked_corpus_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BINPACKED whole-file scan, value-pinned: q138's layout read
    back through ``read_corpus(max_bytes_per_partition=...)`` — the
    crawl-scale path where small files greedily coalesce into
    multi-file tasks (sources/pydatasource.py) — and proven
    partitioning-INVARIANT against an oracle that never sees files at
    all: doc count (newline count), byte count, and an order-invariant
    per-doc content checksum (sum of md5-prefix ints) must all match
    the documents table exactly, whatever the packing.

    Layout: one text file per (lang, shard) — shard = crc-style md5
    bucket of doc_id, so the directory holds ~40 small files and a
    32 KiB cap genuinely packs several per task. The newline guard is
    q138's: a newline inside a document would corrupt the line
    arithmetic, so the write fails loudly instead. Scale shape: the
    scan schedules O(total_bytes / cap) tasks instead of O(n_files) —
    the difference between thousands and millions of tasks on a real
    crawl; everything after the read is one global aggregate."""
    from ..sources.io import read_corpus

    d = t(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & F.col("lang").isNotNull()
    )
    guarded = F.when(F.instr("text", "\n") == 0, F.col("text")).otherwise(
        F.raise_error(
            F.concat(
                F.lit("q174: newline inside document text, doc_id="),
                F.coalesce(F.col("doc_id").cast("string"), F.lit("NULL")),
            )
        )
    )
    shard = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1), 16, 10)
    loc = os.path.join(_scratch("binpack_scan"), "docs_sharded")
    (
        d.select("lang", shard.alias("shard"), guarded.alias("value"))
        .repartition("lang", "shard")
        .write.mode("overwrite")
        .partitionBy("lang", "shard")
        .text(loc)
    )
    corpus = read_corpus(
        spark,
        os.path.join(loc, "lang=*", "shard=*", "*.txt"),
        max_bytes_per_partition=32 * 1024,
    )
    # each whole-file row holds one newline-terminated line per doc;
    # empty docs contribute a line (and a newline) but no hash mass
    lines = corpus.select(
        F.explode(F.split(F.col("text"), "\n")).alias("doc_text")
    )
    doc_hash = F.conv(F.substring(F.md5(F.col("doc_text")), 1, 8), 16, 10).cast(
        "long"
    )
    per_file = corpus.select(
        F.length(F.regexp_replace("text", r"[^\n]", "")).cast("long").alias("nd"),
        F.length("text").cast("long").alias("nc"),
    )
    counts = per_file.agg(
        F.sum("nd").alias("n_docs"), F.sum("nc").alias("n_chars")
    )
    hashes = (
        lines.where(F.col("doc_text") != "")
        .agg(F.sum(doc_hash).alias("content_sum"))
    )
    return counts.crossJoin(hashes).select(
        "n_docs", "n_chars", F.col("content_sum").cast("long").alias("content_sum")
    )
