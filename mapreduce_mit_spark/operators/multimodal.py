"""Multimodal column plumbing.

Treats image/audio/video payloads as opaque ``binary`` columns with
typed metadata, processed by Arrow-batched ``mapInPandas`` — the
pattern for decode / feature-extract / resize / frame-sample stages at
100 TB (binary stays columnar end-to-end; Python sees pandas batches,
never rows).

The container has no image/audio codecs, so the real decoders are
STUBBED behind import guards (NotImplementedError with a clear message)
and a deterministic fake decoder exercises the full plumbing — schema,
batching, partitioning — for tests and the oracle-checked plan
(plans registered in streaming/stream_queries.py's sibling, see
q97_multimodal_meta below via register()).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..plans._util import t, tw
from ..registry import register

META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
    ]
)


def decode_image(payload: bytes) -> "object":
    """Real image decode — requires a codec library absent from this
    container. The Spark-side plumbing around it is fully tested with
    the deterministic fake below."""
    try:
        from PIL import Image  # noqa: F401
        import io

        return Image.open(io.BytesIO(payload))
    except ImportError as exc:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "image decoding requires PIL/pillow, not present in this "
            "environment; use fake_decode_meta for plumbing tests"
        ) from exc


def fake_decode_meta(payload: bytes) -> tuple[str, int, int]:
    """Deterministic stand-in for a decoder: md5 digest + fake
    dimensions derived from it. Pure function of the bytes, so the
    DuckDB oracle can reproduce it exactly."""
    digest = hashlib.md5(payload).hexdigest()
    width = int(digest[0:4], 16) % 1024
    height = int(digest[4:8], 16) % 1024
    return digest, width, height


def extract_image_meta(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """mapInPandas metadata extraction over a binary column.

    Arrow moves the binary batches; each pandas batch is processed
    vectorized-ish in Python. This is the slow-path escape hatch shape —
    anything expressible as built-ins should not be here."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payload (a failed fetch/decode upstream) yields a row
            # of NULL meta, never a task death — at 100 TB one bad object
            # per billion is a certainty, and the row must stay auditable
            metas = [
                fake_decode_meta(b) if b is not None else (None, None, None)
                for b in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": pd.array(
                        [len(b) if b is not None else None for b in pdf[payload_col]],
                        dtype="Int64",
                    ),
                    "content_md5": [m[0] for m in metas],
                    "width": pd.array([m[1] for m in metas], dtype="Int64"),
                    "height": pd.array([m[2] for m in metas], dtype="Int64"),
                }
            )

    return df.mapInPandas(process, META_SCHEMA)


from ..plans._util import hex_int_sql as _hex2int_sql  # shared SQL twin


@register(
    "q97_multimodal_meta",
    oracle=f"""
    WITH hashed AS (
      SELECT doc_id,
             CAST(strlen(text) AS BIGINT) AS n_bytes,
             md5(text) AS content_md5
      FROM documents
    )
    SELECT doc_id, n_bytes, content_md5,
           CAST({_hex2int_sql('content_md5', 1, 4)} % 1024 AS BIGINT) AS width,
           CAST({_hex2int_sql('content_md5', 5, 4)} % 1024 AS BIGINT) AS height
    FROM hashed
    ORDER BY doc_id
    """,
    tags=("multimodal", "pandas-udf"),
)
def q97_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end: text → binary payload column →
    Arrow-batched mapInPandas 'decode' → typed metadata.

    The fake decoder is a pure function of the payload bytes, so this
    whole Pandas-UDF pipeline is hash-checked against a pure-SQL oracle
    — proving the batch plumbing loses/garbles nothing."""
    d = t(spark, sf_dir, "documents")
    payloads = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return extract_image_meta(payloads).orderBy("doc_id")


FRAME_BYTES = 64
FRAME_STRIDE = 3

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("n_frame_bytes", T.LongType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Real image resize — needs a codec library absent here; the
    mapInPandas plumbing it would ride is exercised by extract_image_meta
    and sample_frames."""
    raise NotImplementedError(
        "image resize requires PIL/pillow, not present in this environment"
    )


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    frame_bytes: int = FRAME_BYTES,
    stride: int = FRAME_STRIDE,
) -> DataFrame:
    """Frame-sampling over binary payloads: split each payload into
    fixed-size frames and keep every ``stride``-th — the video
    frame-extraction shape (1 input row → N output rows) as an
    Arrow-batched ``mapInPandas`` flatMap. A real decoder would replace
    the byte-slicing with codec calls; the Spark-side contract (schema,
    batch iteration, row expansion) is identical."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sizes, digests = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    # flatMap semantics: an undecodable payload simply
                    # contributes zero frames (matches the oracle's
                    # range() over NULL producing no rows)
                    continue
                n_frames = (len(payload) + frame_bytes - 1) // frame_bytes
                for i in range(0, n_frames, stride):
                    frame = payload[i * frame_bytes : (i + 1) * frame_bytes]
                    ids.append(doc_id)
                    idxs.append(i)
                    sizes.append(len(frame))
                    digests.append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "n_frame_bytes": pd.Series(sizes, dtype="int64"),
                    "frame_md5": pd.Series(digests, dtype="object"),
                }
            )

    return df.mapInPandas(process, FRAME_SCHEMA)


@register(
    "q98_frame_sample",
    oracle=f"""
    WITH f AS (
      SELECT doc_id, text,
             unnest(range(0, CAST(ceil(strlen(text) / {FRAME_BYTES}.0) AS BIGINT),
                          {FRAME_STRIDE})) AS i
      FROM documents
    )
    SELECT doc_id,
           i AS frame_idx,
           CAST(strlen(substr(text, CAST(i * {FRAME_BYTES} + 1 AS INT), {FRAME_BYTES})) AS BIGINT)
               AS n_frame_bytes,
           md5(substr(text, CAST(i * {FRAME_BYTES} + 1 AS INT), {FRAME_BYTES})) AS frame_md5
    FROM f
    ORDER BY doc_id, frame_idx
    """,
    tags=("multimodal", "pandas-udf", "flatmap"),
)
def q98_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal frame-sampling end-to-end: binary payload → 64-byte
    frames → keep every 3rd → per-frame digest. One row fans out to many
    (the UDTF/flatMap shape) through mapInPandas; the byte-exact SQL
    oracle works because the documents are ASCII, so DuckDB's char
    offsets equal byte offsets."""
    d = t(spark, sf_dir, "documents")
    payloads = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return sample_frames(payloads).orderBy("doc_id", "frame_idx")


N_FEATURES = 8

FEATURE_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType())]
    + [T.StructField(f"f{i}", T.DoubleType()) for i in range(N_FEATURES)]
)


def extract_features(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Feature extraction over binary payloads → fixed-width float
    features, the embedding-production stage of a multimodal pipeline
    (a real model would replace the hash arithmetic; the Arrow-batched
    mapInPandas plumbing and the float-column contract are identical).
    Each feature is a pure function of the payload bytes: nibble-chunks
    of md5 mapped to [-1, 1). The value is a dyadic rational (16-bit
    int / 2^16) — exactly representable as a double, so NO rounding is
    applied: Python's round() is half-even while SQL round() is
    half-away, and exact .xxxxx5 values (which this arithmetic does
    produce) would disagree."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {id_col: pdf[id_col].astype("int64")}
            digs = [
                hashlib.md5(b).hexdigest() if b is not None else None
                for b in pdf[payload_col]
            ]
            for i in range(N_FEATURES):
                out[f"f{i}"] = [
                    int(d[i * 4 : i * 4 + 4], 16) / 65536.0 * 2.0 - 1.0
                    if d is not None
                    else None
                    for d in digs
                ]
            yield pd.DataFrame(out)

    return df.mapInPandas(process, FEATURE_SCHEMA)


_FEATURE_SQL = ", ".join(
    f"{_hex2int_sql('md5(text)', 1 + i * 4, 4)} / 65536.0 * 2.0 - 1.0 AS f{i}"
    for i in range(N_FEATURES)
)


@register(
    "q99_payload_features",
    oracle=f"""
    SELECT doc_id, {_FEATURE_SQL}
    FROM documents
    WHERE doc_id < 200
    ORDER BY doc_id
    """,
    tags=("multimodal", "pandas-udf", "feature-extraction"),
)
def q99_payload_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal feature extraction end-to-end: binary payload →
    mapInPandas 'model' → 8 float feature columns, hash-checked against
    a pure-SQL oracle. Downstream these columns feed the similarity
    operators (q85-q89) — payload → features → ANN is the full
    multimodal retrieval path."""
    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    payloads = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return extract_features(payloads).orderBy("doc_id")
