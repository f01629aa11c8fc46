"""Shared constants for the pipeline operators.

Both the Spark implementations and the generated DuckDB oracle SQL are
built from these values -- single source of truth so results match
bit-for-bit across engines.
"""

from __future__ import annotations

import random

# --- base hashing -----------------------------------------------------------
# 32-bit integer hash of a string: first 8 hex chars of md5.
#   spark : conv(substring(md5(s), 1, 8), 16, 10) cast to long
#   duckdb: ('0x' || substr(md5(s), 1, 8))::BIGINT
# Products a*h with a < 2^31 stay under 2^63 (no int64 overflow).
HASH_HEX_CHARS = 8

# Mersenne prime modulus for the permutation family h_i = (a*x + b) % P.
MINHASH_P = 2_147_483_647  # 2^31 - 1

# MinHash: 16 permutations, 4 bands x 4 rows (LSH threshold ~ (1/4)^(1/4)).
MINHASH_K = 16
MINHASH_BANDS = 4
MINHASH_ROWS = MINHASH_K // MINHASH_BANDS
_rng = random.Random(20260813)
MINHASH_A = [_rng.randrange(1, MINHASH_P) for _ in range(MINHASH_K)]
MINHASH_B = [_rng.randrange(0, MINHASH_P) for _ in range(MINHASH_K)]
MINHASH_SHINGLE = 3          # 3-word shingles
MINHASH_THRESHOLD = 0.5      # emit candidate pairs with est jaccard >= t

# incremental dedup (new batch vs stored band index): the batch is the
# deterministic FIXED-SIZE doc_id < INC_BATCH_N slice (both engines
# split identically), so probe cost is bounded by the batch at every
# corpus scale -- the incremental regime.  The stored index is laid out
# in INC_NSHARDS hash partitions of the band key so a probe reads only
# the batch's shards.
INC_BATCH_N = 50
INC_NSHARDS = 1024

# multi-batch ingest (r12, VERDICT r11 #2): two consecutive FIXED-SIZE
# daily batches against a shared stored index -- batch1 = doc_id in
# [0, MB_BATCH1_N), batch2 = [MB_BATCH1_N, MB_CORPUS_MIN), corpus =
# [MB_CORPUS_MIN, inf).  Both bounds derive from INC_BATCH_N so the
# batches stay corpus-independent at every scale (the incremental
# regime's defining property).
MB_BATCH1_N = 2 * INC_BATCH_N
MB_CORPUS_MIN = 4 * INC_BATCH_N

# n-gram (shingle) exact-jaccard dedup
JACCARD_THRESHOLD = 0.5

# SimHash: 32-bit, 4 one-byte bands, hamming radius 3 (pigeonhole: 3 bit
# errors cannot dirty all 4 bands, so band-blocking is lossless).
SIMHASH_BITS = 32
SIMHASH_BANDS = 4
SIMHASH_HAMMING = 3

# embedding similarity: quantize float32 -> round(x * 1000) as int64.
# (k + 0.5)/1000 is never exactly representable in binary floating point,
# so round() can never hit a tie -> both engines quantize identically.
EMB_QUANT = 1000
COSINE_DUP_THRESHOLD = 0.4   # near-dup pair threshold (data max ~0.51)
ANN_TOP_K = 5
ANN_N_QUERIES = 8            # first N vec_ids serve as the query set
RANGE_TAU = 0.2              # cosine threshold for range search
IVF_N_CENTROIDS = 32         # coarse quantizer size (vec_id < N as centroids)
IVF_NPROBE = 4               # probed inverted lists per query

# random-hyperplane LSH for ANN: 16 planes; component w[p][d] from an LCG
# so both engines can materialize the same planes.  Banding: 4 bands x 4
# bits -- a ~0.37-cosine neighbor agrees with ~62% of planes, giving
# ~48% per-band-family recall while random vectors collide on ~1/16 of a
# band (candidate set ~23% of corpus; tune bits-per-band up at scale).
LSH_PLANES = 16
LSH_BANDS = 4
LSH_BAND_BITS = LSH_PLANES // LSH_BANDS
LSH_LCG_A = 1103515245
LSH_LCG_C = 12345
LSH_LCG_M = 2_147_483_648  # 2^31


def lsh_plane_component(p: int, d: int) -> int:
    """Deterministic integer weight of hyperplane p at dimension d,
    centered on 0: ((A*(p*4096+d) + C) mod M) - M/2."""
    return (LSH_LCG_A * (p * 4096 + d) + LSH_LCG_C) % LSH_LCG_M - LSH_LCG_M // 2


# --- decontamination --------------------------------------------------------
# Benchmark decontamination: a document is contaminated when it shares a
# DECON_NGRAM-token shingle with the held-out eval slice (docs whose
# salted hash lands in bucket 0 of DECON_EVAL_MOD).  5-grams on random
# text collide only via genuine near-duplication.
DECON_SALT = "decon:v1:"
DECON_NGRAM = 5
DECON_EVAL_MOD = 20
# Bloom-filter variant: m bits (as m/64 int64 words, bit_or-merged),
# k probes via Kirsch-Mitzenmacher double hashing pos_i = h1 + i*h2
# mod m -- two md5-derived 32-bit halves, pure integer, cross-engine
# exact.  No false negatives by construction; the measured FP rate at
# this m/k and the eval-set size is what the op's output shows.
BLOOM_M_BITS = 1 << 16
BLOOM_K = 3

# --- stratified sampling ----------------------------------------------------
# Per-language keep-rate (percent); hash-based so the sample is a pure
# function of (salt, doc_id) -- stable under re-runs and corpus growth.
SAMPLE_SALT = "sample:v1:"
SAMPLE_RATES = {"en": 50, "fr": 30, "es": 30, "de": 30, "zh": 20}
SAMPLE_DEFAULT_RATE = 10

# --- boilerplate shingles -----------------------------------------------------
# A BOILER_NGRAM-token shingle present in >= BOILER_DF_MIN distinct docs
# is "boilerplate" (C4/CCNet-style template detection).
BOILER_NGRAM = 4
# duplicate-span detection (Lee et al. 2022 exact-substring dedup): a
# SUBSTR_NGRAM-token span occurring >= 2 times corpus-wide is a dup span
SUBSTR_NGRAM = 8

# BM25 ranked retrieval: fixed keyword queries (terms from the corpus
# vocabulary), k1 = 1.2, b = 0.75 -- carried as exact integer factors
# (22/10, 3, 9 -- see text.bm25_topk) so scoring stays rational
BM25_QUERIES: list[tuple[int, tuple[str, ...]]] = [
    (0, ("hash", "join", "table")),
    (1, ("stream", "window", "agg")),
    (2, ("fast", "scan", "filter")),
]
BM25_TOP_K = 10
BM25_QUANT = 1_000_000  # per-term contribution -> integer micro-score

# incremental ANN ingest: vec_ids [LO, LO+N) arrive as the new batch;
# the slice sits above every model row (centroids vec_id < 32, PQ
# codebook < 16, queries < 8), so the frozen model never sees the batch
IVF_APPEND_LO = 64
IVF_APPEND_N = 64
# reclustering (coarse-quantizer retrain after heavy deletion): the new
# centroid id range -- disjoint from BOTH the old range [0, 32) and the
# deleted slice [IVF_APPEND_LO, LO+N), so the reclustered index is
# provably a different model over the surviving corpus
IVF_RECLUSTER_CENT_LO = 128
BOILER_DF_MIN = 2

# --- weighted source mixing --------------------------------------------------
# Target mixture proportions (integer weights) for the training blend;
# sources absent from the dict get MIX_DEFAULT_WEIGHT.  Keep-rates are
# derived from the ACTUAL per-source counts (never upsampling), so the
# comparison stays in exact int64 arithmetic on both engines.
MIX_SALT = "mix:v1:"
MIX_WEIGHTS = {"src0": 8, "src1": 5, "src2": 5, "src3": 3}
MIX_DEFAULT_WEIGHT = 1

# --- deterministic global shuffle -> training shards --------------------------
SHARD_SALT = "shard:v1:"
N_SHARDS = 16

# --- k-means over quantized embeddings ---------------------------------------
# Integer-exact Lloyd's: vectors quantized via EMB_QUANT, centroids live in
# the same integer lattice (floor-division update), so assignment argmin and
# inertia are exact int64 on both engines -- no float accumulation order can
# change the result.  Init: the KMEANS_K smallest vec_ids seed the centroids
# (same convention as IVF_N_CENTROIDS).  KMEANS_ITERS assignment rounds.
KMEANS_K = 8
KMEANS_ITERS = 3

# --- int8 embedding quantization --------------------------------------------
# Symmetric per-vector scheme: scale = max |x|, q_i = round(x_i/scale*127).
# All arithmetic forced to float64 on both engines (Spark promotes
# float/float division to double; DuckDB keeps FLOAT unless cast).
QUANT_LEVELS = 127

# --- text -------------------------------------------------------------------
# tokenization: lower -> strip non [a-z0-9] to space -> trim -> split ' +'
TOKEN_CLEAN_RE = "[^a-z0-9 ]"
TOKEN_SPLIT_RE = " +"

# BPE-ish token regex: alpha runs, digit runs, single other symbols
BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"],
    "es": ["el", "la", "los", "de", "y", "un", "una", "es", "que", "para"],
    "de": ["der", "die", "das", "und", "ein", "eine", "ist", "zu", "mit", "von"],
}

# polynomial fingerprint: fp = sum(hash16(tok_i) * 31^(i mod 8)) mod P
FP_POWS = [31**i for i in range(8)]  # max 31^7 ~ 2^35; 16-bit hash -> 51 bits
FP_HEX_CHARS = 4  # 16-bit token hash


def sql_hash32(expr: str) -> str:
    """DuckDB: 32-bit md5-derived hash of a string expression."""
    return f"('0x' || substr(md5({expr}), 1, {HASH_HEX_CHARS}))::BIGINT"


def sql_hash16(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, {FP_HEX_CHARS}))::BIGINT"


def sql_tokens(expr: str) -> str:
    """DuckDB: tokenization identical to the Spark side."""
    return (
        f"list_filter(string_split_regex(trim(regexp_replace(lower({expr}), "
        f"'{TOKEN_CLEAN_RE}', ' ', 'g')), '{TOKEN_SPLIT_RE}'), x -> x <> '')"
    )


# --- count-min sketch ---------------------------------------------------------
# Token-frequency CM sketch (Cormode & Muthukrishnan 2005): CM_DEPTH
# salted md5-derived hash rows x CM_WIDTH counters.  Estimates
# overestimate only (min over rows); the report compares them against
# exact counts for the CM_REPORT_TOPK most frequent tokens.
CM_SALT = "cm:v1:"
CM_DEPTH = 4
CM_WIDTH = 256
CM_REPORT_TOPK = 20

# KMV (k-minimum-values / theta) set sketch: per-set state is the K
# smallest distinct 32-bit element hashes; jaccard between two sets is
# estimated on the K smallest values of the MERGED sketches (the theta
# intersection rule).  K=256 -> 1/256 jaccard resolution, 1 KiB of
# state per set.
KMV_K = 256
