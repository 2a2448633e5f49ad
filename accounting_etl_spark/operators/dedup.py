"""Near-duplicate detection at scale: MinHash-LSH and SimHash.

The exact shingle-Jaccard self-join (queries/text.py) is quadratic in
hot-shingle frequency; these are the 100 TB paths:

- MinHash-LSH: per-doc signature of ``num_hashes`` min-hashes over
  word shingles (computed array-native — one pass, no explode), cut
  into ``bands``; docs sharing any band key become candidate pairs
  (equi-join on the band key — linear in corpus + candidates), then
  candidates are verified with exact Jaccard. Probability a pair with
  Jaccard j collides: 1 - (1 - j^r)^b, r = num_hashes/bands.

- SimHash: 64-bit signature whose bit j is the majority vote of
  token-hash bit j; near-dups have small Hamming distance. Banding
  into 16-bit chunks gives candidates (pigeonhole: distance <= 3
  guarantees one exact chunk match with 4 chunks), verified with
  ``bit_count(xor)``.

Both are deterministic (xxhash64 seeded by column prefix) and
shuffle only on band keys — no all-pairs stage anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens_ws, word_shingles


def minhash_signature(shingles: Column, num_hashes: int) -> Column:
    """Array of ``num_hashes`` min-hashes (xxhash64, seed-prefixed)."""
    return F.array(
        *[
            F.array_min(
                F.transform(
                    shingles, lambda s, h=h: F.xxhash64(F.concat(F.lit(f"{h}:"), s))
                )
            )
            for h in range(num_hashes)
        ]
    )


def minhash_candidates(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    k_shingle: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) via banded MinHash."""
    if num_hashes % bands:
        raise ValueError("num_hashes must divide evenly into bands")
    r = num_hashes // bands
    # signatures via explode + one grouped aggregation of num_hashes
    # mins — ONE shuffle on the id, instead of num_hashes array passes
    # per row (the array-native minhash_signature form is ~10x slower
    # in codegen for large shingle sets)
    spread = df.repartition(
        df.sparkSession.sparkContext.defaultParallelism, id_col
    )  # small-file scans arrive single-partition; shingling is CPU-bound
    sh = spread.select(
        F.col(id_col).alias("__id"),
        F.explode(word_shingles(tokens_ws(F.col(text_col)), k_shingle)).alias(
            "__sh"
        ),
    )
    sig = sh.groupBy("__id").agg(
        *[
            F.min(F.xxhash64(F.concat(F.lit(f"{h}:"), F.col("__sh")))).alias(
                f"__h{h}"
            )
            for h in range(num_hashes)
        ]
    )
    banded = sig.select(
        "__id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            ",",
                            *[
                                F.col(f"__h{b * r + i}").cast("string")
                                for i in range(r)
                            ],
                        ).alias("key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("__id", "bk.band", "bk.key")
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .distinct()
    )


def simhash64(tokens: Column) -> Column:
    """63-bit SimHash of a token array (bit 63 unused — sign safety).

    Array-native majority vote: bit j is set when more than half the
    tokens have bit j set in their xxhash64. One expression tree, no
    shuffle, no UDF.
    """
    n = F.size(tokens)
    hashes = F.transform(tokens, lambda t: F.xxhash64(t))

    def _ones(j: int):
        # closure (not a default arg): aggregate's merge lambda must
        # have exactly two parameters or pyspark rejects it
        return F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc + F.shiftright(h, j).bitwiseAND(F.lit(1)).cast("int"),
        )

    out = F.lit(0).cast("bigint")
    for j in range(63):
        out = out + F.when(_ones(j) * 2 > n, F.lit(1 << j).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return out


def simhash_candidates(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    chunks: int = 4,
) -> DataFrame:
    """Near-dup pairs (id_a, id_b, hamming) with distance <= max_hamming.

    Pigeonhole banding: with 4 × 16-bit chunks, any pair within
    Hamming distance 3 shares at least one exact chunk, so the
    candidate join is an equi-join on (chunk_idx, chunk_value).
    """
    width = 64 // chunks
    mask = (1 << width) - 1
    sig = df.select(
        F.col(id_col).alias("__id"),
        simhash64(tokens_ws(F.col(text_col))).alias("__sim"),
    )
    chunked = sig.select(
        "__id",
        "__sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("__sim"), c * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("val"),
                    )
                    for c in range(chunks)
                ]
            )
        ).alias("cv"),
    ).select("__id", "__sim", "cv.chunk", "cv.val")
    a, b = chunked.alias("a"), chunked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.bit_count(
                F.col("a.__sim").bitwiseXOR(F.col("b.__sim"))
            ).cast("int").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
