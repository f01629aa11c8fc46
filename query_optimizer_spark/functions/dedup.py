"""Deduplication operators over ``documents`` / ``embeddings``.

Five dedup families, each blocked for scale (no unblocked cross join
except the clearly-marked small-N baseline) and each with a DuckDB oracle
generated from the same constants:

- exact           : hash-groupBy on normalized text (one shuffle).
- minhash_lsh     : word-shingles -> md5-derived 32-bit hash -> k=16
                    (a*x+b) mod P permutations -> 4x4 LSH bands ->
                    band-bucket self-join -> signature-estimated jaccard.
                    (Broder 1997 resemblance sketch; standard banding.)
- simhash         : 32-bit charikar-style signature from token counts ->
                    byte-band blocking (pigeonhole-complete for hamming<=3)
                    -> bit_count(xor) filter.
- ngram_jaccard   : exact trigram-shingle jaccard, candidates from a
                    shared-shingle join (inverted index), never all-pairs.
- embedding_cosine: exact cosine over integer-quantized vectors
                    (small-N baseline; the LSH scale path is
                    similarity.lsh_ann).

Integer-only hash/similarity arithmetic keeps both engines bit-identical;
floating point appears only in final ratios of exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .constants import (
    COSINE_DUP_THRESHOLD,
    EMB_QUANT,
    HASH_HEX_CHARS,
    JACCARD_THRESHOLD,
    MINHASH_A,
    MINHASH_B,
    MINHASH_BANDS,
    MINHASH_K,
    MINHASH_P,
    MINHASH_ROWS,
    MINHASH_SHINGLE,
    MINHASH_THRESHOLD,
    SIMHASH_BANDS,
    SIMHASH_BITS,
    SIMHASH_HAMMING,
    sql_hash32,
    sql_tokens,
)
from .text import TOKS

HASH32_SPARK = (
    f"cast(conv(substring(md5({{e}}), 1, {HASH_HEX_CHARS}), 16, 10) as bigint)"
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --- exact dedup -------------------------------------------------------------


def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group by whitespace-normalized text; survivor = min doc_id.
    One hash shuffle on the normalized text -- the 100 TB-safe shape
    (group key could be md5(norm) to shrink shuffle width)."""
    df = _docs(spark, sf_dir).select(
        "doc_id", F.expr(f"concat_ws(' ', {TOKS})").alias("norm")
    )
    return df.groupBy("norm").agg(
        F.min("doc_id").alias("survivor_id"),
        F.count("*").cast("int").alias("group_size"),
    ).select("survivor_id", "group_size")


def exact_dedup_oracle() -> str:
    toks = sql_tokens("text")
    return f"""
        SELECT min(doc_id) AS survivor_id, CAST(count(*) AS INT) AS group_size
        FROM (SELECT doc_id, array_to_string({toks}, ' ') AS norm FROM documents)
        GROUP BY norm
    """


# --- shingles (shared by minhash + ngram jaccard) ---------------------------

_SHINGLES_SPARK = (
    f"array_distinct(transform(sequence(0, size(toks) - {MINHASH_SHINGLE}), "
    "j -> concat(element_at(toks, j + 1), ' ', element_at(toks, j + 2), "
    "' ', element_at(toks, j + 3))))"
)


def _shingle_df(spark, sf_dir) -> DataFrame:
    """(doc_id, shingle) exploded distinct word-trigrams; docs shorter than
    one shingle are dropped (both engines filter identically)."""
    return (
        _docs(spark, sf_dir)
        .select("doc_id", F.expr(TOKS).alias("toks"))
        .filter(F.expr(f"size(toks) >= {MINHASH_SHINGLE}"))
        .select("doc_id", F.explode(F.expr(_SHINGLES_SPARK)).alias("sh"))
    )


def _sql_shingles_cte() -> str:
    toks = sql_tokens("text")
    return f"""
        toks AS (
            SELECT doc_id, {toks} AS w FROM documents
            WHERE len({toks}) >= {MINHASH_SHINGLE}
        ),
        shingles AS (
            SELECT doc_id, unnest(list_distinct(
                [w[j] || ' ' || w[j+1] || ' ' || w[j+2]
                 for j in generate_series(1, len(w) - {MINHASH_SHINGLE - 1})]
            )) AS sh
            FROM toks
        )
    """


# --- minhash + LSH -----------------------------------------------------------


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, m0..m15) minhash signature matrix."""
    sh = _shingle_df(spark, sf_dir).withColumn(
        "h", F.expr(HASH32_SPARK.format(e="sh"))
    )
    aggs = [
        F.min(((F.lit(a) * F.col("h") + F.lit(b)) % MINHASH_P)).alias(f"m{i}")
        for i, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate near-duplicate pairs via 4x4 banding, scored by the
    signature-estimated jaccard, thresholded.

    Scale shape: explode-to-bands + shuffle on band key (skew-safe:
    identical docs collide, unrelated docs don't), then a signature join
    -- never an all-pairs product."""
    sig = minhash_signatures(spark, sf_dir).cache()
    band_keys = [
        F.concat_ws(
            ",", *[F.col(f"m{b * MINHASH_ROWS + r}") for r in range(MINHASH_ROWS)]
        ).alias(f"bk{b}")
        for b in range(MINHASH_BANDS)
    ]
    bands = sig.select("doc_id", *band_keys).select(
        "doc_id",
        F.posexplode(F.array(*[F.col(f"bk{b}") for b in range(MINHASH_BANDS)])).alias(
            "band", "key"
        ),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sa = sig.alias("sa")
    sb = sig.alias("sb")
    matches = sum(
        F.when(F.col(f"sa.m{i}") == F.col(f"sb.m{i}"), 1).otherwise(0)
        for i in range(MINHASH_K)
    )
    return (
        cand.join(sa, cand.doc_a == F.col("sa.doc_id"))
        .join(sb, cand.doc_b == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.round(matches / F.lit(float(MINHASH_K)), 6).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= MINHASH_THRESHOLD)
    )


def minhash_lsh_oracle() -> str:
    perms = ", ".join(
        f"min(({a} * h + {b}) % {MINHASH_P}) AS m{i}"
        for i, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    )
    band_keys = ", ".join(
        "concat_ws(','," + ", ".join(
            f"m{bnd * MINHASH_ROWS + r}" for r in range(MINHASH_ROWS)
        ) + f") AS bk{bnd}"
        for bnd in range(MINHASH_BANDS)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {bnd} AS band, bk{bnd} AS key FROM band_keys"
        for bnd in range(MINHASH_BANDS)
    )
    match_sum = " + ".join(
        f"CASE WHEN sa.m{i} = sb.m{i} THEN 1 ELSE 0 END" for i in range(MINHASH_K)
    )
    return f"""
        WITH {_sql_shingles_cte()},
        hashed AS (SELECT doc_id, {sql_hash32('sh')} AS h FROM shingles),
        sig AS (SELECT doc_id, {perms} FROM hashed GROUP BY doc_id),
        band_keys AS (SELECT doc_id, {band_keys} FROM sig),
        bands AS ({band_rows}),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a, bands b
            WHERE a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
        )
        SELECT doc_a, doc_b,
               round(({match_sum}) / {float(MINHASH_K)}, 6) AS est_jaccard
        FROM cand
        JOIN sig sa ON sa.doc_id = doc_a
        JOIN sig sb ON sb.doc_id = doc_b
        WHERE round(({match_sum}) / {float(MINHASH_K)}, 6) >= {MINHASH_THRESHOLD}
    """


# --- exact n-gram jaccard ----------------------------------------------------


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact trigram jaccard >= threshold.  Candidates come from the
    inverted shingle index (pairs sharing >= 1 shingle) -- the join output
    is proportional to true overlap, not |docs|^2."""
    sh = _shingle_df(spark, sf_dir).cache()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    return (
        inter.join(sa, inter.doc_a == F.col("sa.doc_id"))
        .join(sb, inter.doc_b == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter") / (F.col("sa.n") + F.col("sb.n") - F.col("inter")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


def ngram_jaccard_oracle() -> str:
    return f"""
        WITH {_sql_shingles_cte()},
        sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
            FROM shingles a, shingles b
            WHERE a.sh = b.sh AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT doc_a, doc_b,
               round(inter / (sa.n + sb.n - inter), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE round(inter / (sa.n + sb.n - inter), 6) >= {JACCARD_THRESHOLD}
    """


# --- simhash ------------------------------------------------------------------


def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash from token frequencies (Charikar 2002 shape)."""
    toks = (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(F.expr(TOKS)).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("cnt"))
        .withColumn("h", F.expr(HASH32_SPARK.format(e="tok")))
    )
    bits = toks.select(
        "doc_id",
        "cnt",
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("bit"),
    ).select(
        "doc_id",
        "bit",
        F.expr(
            "CASE WHEN (shiftright(h, bit) & 1) = 1 THEN cnt ELSE -cnt END"
        ).alias("contrib"),
    )
    return (
        bits.groupBy("doc_id", "bit")
        .agg(F.sum("contrib").alias("s"))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.expr("CASE WHEN s > 0 THEN shiftleft(1L, bit) ELSE 0L END")
            ).alias("simhash")
        )
    )


def simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs with hamming(simhash) <= 3 via byte-band blocking (complete:
    3 flipped bits cannot touch all 4 bytes)."""
    sig = simhash_signatures(spark, sf_dir).cache()
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BANDS - 1))).alias("band"),
    ).withColumn("key", F.expr("shiftright(simhash, band * 8) & 255"))
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.expr("cast(bit_count(a.simhash ^ b.simhash) as int)").alias(
                "hamming"
            ),
        )
        .distinct()
        .filter(F.col("hamming") <= SIMHASH_HAMMING)
    )


def simhash_oracle() -> str:
    toks = sql_tokens("text")
    return f"""
        WITH tok AS (
            SELECT doc_id, unnest({toks}) AS tok FROM documents
        ),
        tf AS (
            SELECT doc_id, tok, count(*) AS cnt, {sql_hash32('tok')} AS h
            FROM tok GROUP BY doc_id, tok
        ),
        bits AS (
            SELECT doc_id, bit,
                   sum(CASE WHEN ((h >> bit) & 1) = 1 THEN cnt ELSE -cnt END) AS s
            FROM tf, generate_series(0, {SIMHASH_BITS - 1}) t(bit)
            GROUP BY doc_id, bit
        ),
        sig AS (
            SELECT doc_id,
                   sum(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS simhash
            FROM bits GROUP BY doc_id
        ),
        bands AS (
            SELECT doc_id, simhash, band, (simhash >> (band * 8)) & 255 AS key
            FROM sig, generate_series(0, {SIMHASH_BANDS - 1}) t(band)
        )
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
        FROM bands a, bands b
        WHERE a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
          AND bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_HAMMING}
    """


# --- embedding cosine near-dup (exact baseline) ------------------------------

QUANT_SPARK = (
    f"transform(embedding, x -> cast(round(cast(x as double) * {EMB_QUANT}, 0) as bigint))"
)
DOT_SPARK = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"


def embedding_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs exact cosine over quantized vectors.  SMALL-N BASELINE:
    O(n^2) compare -- correct reference implementation; the scale path is
    ``similarity.lsh_ann`` (bucketed).  Cosine computed from exact integer
    dot/norms so both engines agree bit-for-bit."""
    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", F.expr(QUANT_SPARK).alias("q"))
        .withColumn("n2", F.expr(DOT_SPARK.format(a="q", b="q")))
    )
    a, b = emb.alias("a"), emb.alias("b")
    dot = DOT_SPARK.format(a="a.q", b="b.q")
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.expr(
                f"round({dot} / (sqrt(cast(a.n2 as double)) * sqrt(cast(b.n2 as double))), 6)"
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= COSINE_DUP_THRESHOLD)
    )


def embedding_cosine_oracle() -> str:
    return f"""
        WITH q AS (
            SELECT vec_id,
                   list_transform(embedding, x -> round(x::DOUBLE * {EMB_QUANT})::BIGINT) AS q
            FROM embeddings
        ),
        n AS (
            SELECT vec_id, q,
                   list_sum([q[i] * q[i] for i in generate_series(1, len(q))]) AS n2
            FROM q
        )
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               round(list_sum([a.q[i] * b.q[i] for i in generate_series(1, len(a.q))])
                     / (sqrt(a.n2::DOUBLE) * sqrt(b.n2::DOUBLE)), 6) AS cosine
        FROM n a, n b
        WHERE a.vec_id < b.vec_id
          AND round(list_sum([a.q[i] * b.q[i] for i in generate_series(1, len(a.q))])
                    / (sqrt(a.n2::DOUBLE) * sqrt(b.n2::DOUBLE)), 6)
              >= {COSINE_DUP_THRESHOLD}
    """
