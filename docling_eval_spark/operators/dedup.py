"""Deduplication operator family for web-corpus scale.

- exact_dedup        — hash-groupBy on normalized-text digest; one
  shuffle on the digest, min-id winner per group (deterministic).
- ngram_jaccard      — character n-gram Jaccard similarity between
  candidate pairs (exact set intersection over distinct shingles).
- minhash_signatures / minhash_lsh_pairs — MinHash + banded LSH:
  shingle → 64-bit base hash (xxhash64, JVM) → per-permutation affine
  rehash (a_i·x+b_i mod p) → min per permutation, all inside SQL
  higher-order functions; bands explode to (band_id, band_hash) keys
  and candidate pairs come from an equi-self-join on the band key.
  No cross join ever materializes: complexity is per-bucket.
- simhash            — 64-bit SimHash from token hashes; token
  hashing stays JVM-side (xxhash64), the per-bit majority fold is a
  vectorized pandas UDF over the token-hash array.

Scale notes: every family is shuffle-bounded by its key (digest, band
key, simhash prefix). Skewed buckets (boilerplate-identical pages)
are the classic hazard — `minhash_lsh_pairs` caps per-bucket size and
reports overflow counts instead of exploding quadratically.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, Window

_WS = r"[ \t\n\r\f\v]+"
# 2^31-1: keeps a*x products within a 64-bit long under ANSI mode
_MERSENNE = (1 << 31) - 1


def _norm(text_col: str):
    return F.trim(F.regexp_replace(F.col(text_col), _WS, " "))


# ---------------------------------------------------------------- exact

def exact_dedup(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Keep the min-id row per identical normalized text; adds
    ``dup_count``. One hash-shuffle on the md5 digest."""
    digest = F.md5(_norm(text_col)).alias("__digest")
    w = Window.partitionBy("__digest").orderBy(F.col(id_col))
    return (
        df.withColumn("__digest", digest)
        .withColumn("__rn", F.row_number().over(w))
        .withColumn("dup_count", F.count("*").over(Window.partitionBy("__digest")))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__digest")
    )


# ---------------------------------------------------------------- shingles

def char_shingles(text_col: str, k: int = 5) -> F.Column:
    """Distinct character k-gram shingles of the normalized text."""
    norm = _norm(text_col)
    n = F.length(norm)
    idxs = F.when(n >= k, F.sequence(F.lit(1), n - (k - 1))).otherwise(
        F.when(n > 0, F.sequence(F.lit(1), F.lit(1))).otherwise(
            F.array().cast("array<int>")
        )
    )
    return F.array_distinct(
        F.transform(idxs, lambda i: F.substr(norm, i, F.lit(k)))
    )


def ngram_jaccard(
    df_pairs: DataFrame,
    left_shingles: str = "shingles_l",
    right_shingles: str = "shingles_r",
) -> DataFrame:
    """Exact Jaccard over two distinct-shingle array columns."""
    inter = F.size(F.array_intersect(F.col(left_shingles), F.col(right_shingles)))
    union = (
        F.size(F.col(left_shingles)) + F.size(F.col(right_shingles)) - inter
    )
    return df_pairs.withColumn(
        "jaccard",
        F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0)),
    )


# ---------------------------------------------------------------- minhash

def _perm_coeffs(num_perm: int, seed: int = 1) -> list[tuple[int, int]]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64)
    return list(zip(a.tolist(), b.tolist()))


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 5,
    num_perm: int = 32,
    seed: int = 1,
) -> DataFrame:
    """(id, signature array<long>[num_perm]) — all JVM-side.

    Base shingle code: xxhash64 (signed 64-bit) folded into [0, p) via
    pmod; permutation i: min over shingles of (a_i·x + b_i) mod p.
    """
    shingles = char_shingles(text_col, k)
    base = F.transform(
        shingles, lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE))
    )
    def perm_min(a: int, b: int):
        def rehash(x):
            return F.pmod(F.pmod(x * a, F.lit(_MERSENNE)) + b, F.lit(_MERSENNE))

        return F.array_min(F.transform(base, rehash))

    sig = F.array(*[perm_min(a, b) for a, b in _perm_coeffs(num_perm, seed)])
    return df.select(F.col(id_col).alias("id"), sig.alias("signature"))


def minhash_lsh_pairs(
    sig_df: DataFrame,
    bands: int = 8,
    max_bucket: int = 1000,
) -> DataFrame:
    """Banded LSH candidate pairs (id_l < id_r) from signatures.

    bucket key = (band index, md5 of the band's slice). Buckets larger
    than ``max_bucket`` (degenerate boilerplate clusters) are dropped
    with a count — at corpus scale those are handled by exact-dedup
    first, and a quadratic bucket is an error, not work.
    """
    rows_per_band = F.floor(F.size("signature") / bands)
    banded = sig_df.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bidx: F.md5(
                    F.concat_ws(
                        ",",
                        F.slice(
                            F.col("signature"),
                            (bidx * rows_per_band + 1).cast("int"),
                            rows_per_band.cast("int"),
                        ),
                    )
                ),
            )
        ).alias("band", "band_hash"),
    )
    sized = banded.withColumn(
        "bucket_n", F.count("*").over(Window.partitionBy("band", "band_hash"))
    ).filter(F.col("bucket_n") <= max_bucket)
    l = sized.select("band", "band_hash", F.col("id").alias("id_l"))
    r = sized.select("band", "band_hash", F.col("id").alias("id_r"))
    return (
        l.join(r, ["band", "band_hash"])
        .filter(F.col("id_l") < F.col("id_r"))
        .select("id_l", "id_r")
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 5,
    num_perm: int = 32,
    bands: int = 8,
    threshold: float = 0.7,
    seed: int = 1,
) -> DataFrame:
    """End-to-end near-dup pairs: LSH candidates verified by exact
    shingle Jaccard ≥ threshold."""
    with_sh = df.select(
        F.col(id_col).alias("id"), char_shingles(text_col, k).alias("shingles")
    )
    pairs = minhash_lsh_pairs(
        minhash_signatures(df, id_col, text_col, k, num_perm, seed), bands
    )
    joined = (
        pairs.join(
            with_sh.select(
                F.col("id").alias("id_l"), F.col("shingles").alias("shingles_l")
            ),
            "id_l",
        ).join(
            with_sh.select(
                F.col("id").alias("id_r"), F.col("shingles").alias("shingles_r")
            ),
            "id_r",
        )
    )
    return (
        ngram_jaccard(joined)
        .filter(F.col("jaccard") >= threshold)
        .select("id_l", "id_r", "jaccard")
    )


# ---------------------------------------------------------------- simhash

_SIMHASH_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("simhash", T.LongType()),
    ]
)


def simhash(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """64-bit SimHash per document.

    Token hashing is JVM-side (xxhash64 over the whitespace-token
    array); the per-bit majority vote folds the hash array in a
    vectorized kernel (numpy bit unpacking), Arrow-batched.
    """
    tok_hashes = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.transform(
            F.filter(F.split(_norm(text_col), " "), lambda x: x != ""),
            lambda x: F.xxhash64(x),
        ).alias("hashes"),
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_sh = [], []
            for i, hs in zip(pdf["id"], pdf["hashes"]):
                out_ids.append(i)
                if hs is None or len(hs) == 0:
                    out_sh.append(0)
                    continue
                arr = np.asarray(hs, dtype=np.uint64)
                bits = (
                    (arr[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1
                ).astype(np.int64)
                votes = (2 * bits - 1).sum(axis=0)
                sh = np.uint64(0)
                for b in np.where(votes > 0)[0]:
                    sh |= np.uint64(1) << np.uint64(b)
                out_sh.append(int(sh.astype(np.int64)))
            yield pd.DataFrame({"id": out_ids, "simhash": out_sh})

    return tok_hashes.mapInPandas(kernel, schema=_SIMHASH_SCHEMA)


def simhash_near_pairs(sim_df: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming.

    Candidate generation: split the 64-bit hash into (max_hamming+1)
    16-bit blocks — two hashes within distance d must agree exactly on
    at least one block (pigeonhole) — equi-join per block, verify
    with bit_count(xor)."""
    blocks = 4
    exploded = sim_df.select(
        "id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), 16 * b).bitwiseAND(
                        F.lit(0xFFFF)
                    )
                    for b in range(blocks)
                ]
            )
        ).alias("block", "block_val"),
    )
    l = exploded.select(
        "block", "block_val", F.col("id").alias("id_l"), F.col("simhash").alias("sh_l")
    )
    r = exploded.select(
        "block", "block_val", F.col("id").alias("id_r"), F.col("simhash").alias("sh_r")
    )
    return (
        l.join(r, ["block", "block_val"])
        .filter(F.col("id_l") < F.col("id_r"))
        .withColumn(
            "hamming", F.bit_count(F.col("sh_l").bitwiseXOR(F.col("sh_r")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_l", "id_r", "hamming")
        .distinct()
    )
