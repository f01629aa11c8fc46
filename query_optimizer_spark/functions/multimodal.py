"""Multimodal-column plumbing: opaque ``binary`` payloads + typed metadata,
processed with Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the decode step is STUBBED
(SURVEY-mandated): ``decode_image`` raises NotImplementedError unless
``fake=True``, in which case it produces deterministic pseudo-features
from the bytes.  Everything around the stub -- binary column creation,
schema, Arrow batch iteration, partition-parallel UDF shape -- is real
and is what would carry a 100 TB image corpus (binary parquet columns,
``spark.sql.files.maxPartitionBytes`` tuned so a batch of payloads fits
executor memory).

``binary_stats`` is the oracle-checked entry: its per-byte arithmetic is
reproducible in SQL (the payloads here are UTF-8 text bytes).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

CHECKSUM_MOD = 997

BINARY_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("checksum", T.IntegerType()),
        T.StructField("first_byte", T.IntegerType()),
        T.StructField("modality", T.StringType()),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
    ]
)


def with_binary_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with an opaque binary column (UTF-8 bytes of the text) and
    typed modality metadata -- the storage shape for multimodal corpora."""
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
    )


def binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-payload byte statistics via mapInPandas (Arrow batches of
    binary).  The pandas function is the template for any real decoder:
    it receives ``bytes`` objects batch-wise and emits typed rows."""
    df = with_binary_payload(spark, sf_dir)

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "checksum": payloads.map(
                        lambda b: sum(b) % CHECKSUM_MOD
                    ).astype("int32"),
                    "first_byte": payloads.map(
                        lambda b: b[0] if len(b) else -1
                    ).astype("int32"),
                    "modality": pdf["mime"].str.split("/").str[0],
                }
            )

    return df.mapInPandas(stats, BINARY_STATS_SCHEMA)


def binary_stats_oracle() -> str:
    """The payload is UTF-8 text, so byte stats are reproducible from the
    string column (the testdata text is pure ASCII; the test asserts it)."""
    return f"""
        SELECT doc_id,
               CAST(strlen(text) AS INT) AS n_bytes,
               CAST(coalesce(list_sum([ord(text[i]) for i in
                    generate_series(1, length(text))]), 0) % {CHECKSUM_MOD} AS INT)
                   AS checksum,
               CAST(CASE WHEN length(text) > 0 THEN ord(text[1]) ELSE -1 END AS INT)
                   AS first_byte,
               'text' AS modality
        FROM documents
    """


def decode_image(
    df: DataFrame, payload_col: str = "payload", fake: bool = False
) -> DataFrame:
    """Decode an image payload column into typed features.

    Real decoding needs an image codec (Pillow/opencv), which is not in
    this container -- calling with ``fake=False`` raises.  ``fake=True``
    derives deterministic pseudo-features from the bytes through the SAME
    mapInPandas plumbing a real decoder would use, so schema, batching,
    and partitioning are exercised end-to-end.
    """
    if not fake:
        raise NotImplementedError(
            "image codecs are unavailable in this environment; "
            "pass fake=True for the deterministic stub "
            "(real impl: PIL.Image.open(io.BytesIO(b)) per payload)"
        )

    def fake_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            b = pdf[payload_col]
            n = b.map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": (n % 640 + 1).astype("int32"),
                    "height": (n % 480 + 1).astype("int32"),
                    "n_channels": pd.Series([3] * len(pdf), dtype="int32"),
                    "mean_intensity": b.map(
                        lambda x: round(sum(x) / len(x), 6) if len(x) else 0.0
                    ),
                }
            )

    return df.mapInPandas(fake_decode, IMAGE_FEATURES_SCHEMA)


N_FRAMES = 4
FRAME_BYTES = 32

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("off", T.IntegerType()),
        T.StructField("checksum", T.IntegerType()),
        T.StructField("preview", T.StringType()),
    ]
)


def frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling over an opaque payload: N_FRAMES
    evenly-spaced fixed-size byte windows per payload, emitted as one
    row per frame -- the fan-out shape (1 input row -> N output rows
    inside the Arrow batch) a real frame extractor uses.  Payloads
    shorter than one frame emit nothing.  A real video decoder drops
    into the same mapInPandas slot; these deterministic byte windows
    keep the plumbing oracle-checkable."""
    df = with_binary_payload(spark, sf_dir)

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "off": [],
                   "checksum": [], "preview": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                if n < FRAME_BYTES:
                    continue
                step = (n - FRAME_BYTES) // (N_FRAMES - 1)
                for k in range(N_FRAMES):
                    off = k * step
                    window = payload[off:off + FRAME_BYTES]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(k)
                    out["off"].append(off)
                    out["checksum"].append(sum(window) % CHECKSUM_MOD)
                    out["preview"].append(window[:8].decode("ascii"))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                    "off": pd.Series(out["off"], dtype="int32"),
                    "checksum": pd.Series(out["checksum"], dtype="int32"),
                    "preview": pd.Series(out["preview"], dtype="object"),
                }
            )

    return df.mapInPandas(frames, FRAME_SCHEMA)


def frame_sample_oracle() -> str:
    """Byte windows over ASCII text are substring windows."""
    return f"""
        WITH d AS (SELECT doc_id, text, strlen(text) AS n FROM documents
                   WHERE strlen(text) >= {FRAME_BYTES}),
        f AS (
            SELECT doc_id, k AS frame_idx,
                   k * ((n - {FRAME_BYTES}) // ({N_FRAMES} - 1)) AS off,
                   substring(text,
                             k * ((n - {FRAME_BYTES}) // ({N_FRAMES} - 1)) + 1,
                             {FRAME_BYTES}) AS win
            FROM d, generate_series(0, {N_FRAMES} - 1) t(k)
        )
        SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
               CAST(off AS INT) AS off,
               CAST(list_sum([ord(win[i]) for i in
                    generate_series(1, length(win))]) % {CHECKSUM_MOD} AS INT)
                   AS checksum,
               substring(win, 1, 8) AS preview
        FROM f
    """


def shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed shard manifest: per source shard, payload
    count, total bytes, distinct content digests, and an
    ORDER-INDEPENDENT checksum (exact decimal sum of 48-bit digest
    prefixes, reduced mod 2^31-1) -- the dataset-versioning record a
    multimodal pipeline writes next to every shard so drift, silent
    corruption, and cross-shard duplication are detectable WITHOUT
    re-reading content.

    Shape for 100 TB: digests compute map-side from the binary payload;
    ONE hash aggregation on the shard key.  The checksum sum is kept in
    decimal(38,0) until the final mod so partial-aggregation order
    cannot change it (int64 would overflow at ~2^15 rows x 2^48;
    decimal and DuckDB's int128 both sum exactly).  The payload is the
    same opaque binary column the decode stubs consume (documents.text
    is ASCII, so md5(payload) == DuckDB's md5(text) byte-for-byte --
    guarded by test_text_is_ascii)."""
    return (
        with_binary_payload(spark, sf_dir)
        .join(
            spark.read.parquet(f"{sf_dir}/documents.parquet").select(
                "doc_id", "source"
            ),
            "doc_id",
        )
        .select(
            "source",
            F.expr("length(payload)").alias("nb"),
            F.md5("payload").alias("digest"),
        )
        .groupBy("source")
        .agg(
            F.count("*").cast("int").alias("n_payloads"),
            F.sum("nb").cast("bigint").alias("total_bytes"),
            F.countDistinct("digest").cast("int").alias("n_distinct"),
            F.expr(
                "cast(sum(cast(conv(substring(digest, 1, 12), 16, 10)"
                " as decimal(38, 0))) % 2147483647 as bigint)"
            ).alias("checksum"),
        )
    )


def shard_manifest_oracle() -> str:
    return """
        SELECT source, CAST(count(*) AS INT) AS n_payloads,
               CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
               CAST(count(DISTINCT md5(text)) AS INT) AS n_distinct,
               CAST(sum(('0x' || substr(md5(text), 1, 12))::BIGINT)
                    % 2147483647 AS BIGINT) AS checksum
        FROM documents
        GROUP BY source
    """
