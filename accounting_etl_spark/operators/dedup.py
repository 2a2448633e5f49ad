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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.checkpointing import stable_checkpoint
from ..functions.pairs import explode_bucket_pairs
from ..functions.spread import spread
from ..functions.text import (
    hashed_grams,
    hex15_int,
    token_hashes,
    tokens_ws,
    word_shingles,
)


def minhash_signature(shingles: Column, num_hashes: int) -> Column:
    """Array of ``num_hashes`` min-hashes.

    The shingle string is hashed ONCE (xxhash64 → bigint); each family
    member re-hashes the 64-bit key with the member index — integer
    mixing instead of ``num_hashes`` string concat+hash passes.
    """
    keyed = F.transform(shingles, lambda s: F.xxhash64(s))
    return F.array(
        *[
            F.array_min(
                F.transform(keyed, lambda k, h=h: F.xxhash64(k, F.lit(h)))
            )
            for h in range(num_hashes)
        ]
    )


def _minhash_sigs(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    k_shingle: int,
    num_hashes: int,
    family: str = "fast",
) -> DataFrame:
    """Per-doc signature table (__id, __h0..__h{n-1}) — the shared
    front half of minhash_bands / minhash_candidates; see
    minhash_bands for the plan rationale.

    ``family`` selects the hash family (VERDICT r8 Next #2):

    - ``"fast"`` (default): xxhash64-keyed hashed grams, each family
      member an integer re-mix of the 64-bit gram key — the hot path.
    - ``"portable"``: md5-nibble integers over the shingle STRING
      (``functions.text.hex15_int``), each member md5-ing the fixed
      32-hex gram key suffixed with the member index. ~4x the hash
      cost but every value is reproducible in ANSI SQL, so a DuckDB
      brute-force twin can pin the WHOLE signature construction
      (near_dup_jaccard 'mhp'). Identical plan shape: the shingle is
      hashed once, members re-hash the short key, one grouped
      aggregation of ``num_hashes`` mins.
    """
    wide = spread(df, id_col)
    if family == "portable":
        gs = stable_checkpoint(
            wide.select(
                F.col(id_col).alias("__id"),
                word_shingles(
                    tokens_ws(F.col(text_col)), k_shingle
                ).alias("__gs"),
            )
        )
        keyed = gs.select(
            "__id", F.explode("__gs").alias("__sh")
        ).select("__id", F.md5("__sh").alias("__kstr"))
        return keyed.groupBy("__id").agg(
            *[
                F.min(
                    hex15_int(F.concat(F.col("__kstr"), F.lit(f"|{h}")))
                ).alias(f"__h{h}")
                for h in range(num_hashes)
            ]
        )
    th = wide.select(
        F.col(id_col).alias("__id"),
        token_hashes(tokens_ws(F.col(text_col))).alias("__th"),
    )
    gs = stable_checkpoint(
        th.select(
            "__id", hashed_grams(F.col("__th"), k_shingle).alias("__gs")
        )
    )
    sh = gs.select("__id", F.explode("__gs").alias("__kh"))
    return sh.groupBy("__id").agg(
        *[
            F.min(F.xxhash64(F.col("__kh"), F.lit(h))).alias(f"__h{h}")
            for h in range(num_hashes)
        ]
    )


def _band_keys(
    sig: DataFrame, num_hashes: int, bands: int, family: str = "fast"
) -> DataFrame:
    """(__id, band, key) from a signature table — one 64-bit hash of
    each band's r signature slots (bigint shuffle key, no string
    concat); xxhash64 collisions only ADD candidates, which the
    downstream exact verification filters. The "portable" family
    md5-nibbles the '|'-joined decimal slot values instead — string
    concat, but engine-reproducible (see _minhash_sigs)."""
    r = num_hashes // bands

    def key(b: int) -> Column:
        slots = [F.col(f"__h{b * r + i}") for i in range(r)]
        if family == "portable":
            return hex15_int(
                F.concat_ws("|", *[s.cast("string") for s in slots])
            )
        return F.xxhash64(*slots)

    return (
        sig.select(
            "__id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            key(b).alias("key"),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("bk"),
        )
        .select("__id", "bk.band", "bk.key")
    )


def minhash_bands(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    k_shingle: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    family: str = "fast",
) -> DataFrame:
    """The LSH band-key table ``(id_col, band, key)`` — ``bands`` rows
    per document; docs sharing any (band, key) are near-dup candidates.

    This is the *index* form: persist it for a corpus once and
    incremental batches join against it (operators/incremental.py)
    instead of re-shingling the corpus, or feed it straight to the
    posting-list pair stage (:func:`minhash_candidates`).

    Signatures via explode + one grouped aggregation of ``num_hashes``
    mins — ONE shuffle on the id, instead of num_hashes array passes
    per row (the array-native minhash_signature form is ~10x slower in
    codegen for large shingle sets). Each shingle string is hashed
    ONCE to a 64-bit key; the hash family re-hashes that bigint with
    the member index — no per-member string concat. The band key is
    one 64-bit hash of the band's r signature slots (a bigint shuffle
    key, not a concatenated string); xxhash64 collisions only ever ADD
    candidates, which downstream exact verification filters.
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must divide evenly into bands")
    # shingle keys via the hashed-gram scheme (functions/text.py
    # hashed_grams): 64-bit keys from a materialized token-hash array,
    # checkpointed before the explode so InferFiltersFromGenerate's
    # inferred filter sees stored arrays, not the tokenize→hash tree.
    # The hash family re-hashes the key with the member index — any
    # uniform 64-bit key scheme gives the same MinHash semantics.
    # spread() fans out single-split local scans (no-op when wide).
    sig = _minhash_sigs(
        df,
        id_col=id_col,
        text_col=text_col,
        k_shingle=k_shingle,
        num_hashes=num_hashes,
        family=family,
    )
    return _band_keys(sig, num_hashes, bands, family).withColumnRenamed(
        "__id", id_col
    )


def minhash_candidates(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    k_shingle: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    max_bucket: int = 256,
    max_posting: int | None = 100_000,
    family: str = "fast",
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) via banded MinHash.

    ``max_bucket`` bounds per-row pair expansion: oversized buckets
    (boilerplate/near-identical corpora degenerate exactly here) are
    cut into chunk-pair rows first, so no row ever materializes more
    than max_bucket² pair structs (functions/pairs.py
    explode_bucket_pairs — the executor-OOM skew escape).

    Degenerate-mass bounds (VERDICT r6 #1 — same discipline as
    image_hash.hamming_banded_pairs):

    - **Identical-signature collapse**: docs whose FULL num_hashes
      signature is equal (identical/equal-shingle-set texts — the
      blank/boilerplate mass) fold to the min-id representative and
      emit STAR pairs (rep, member) directly — a group of n equal
      signatures is a candidate clique by construction, so the star
      (linear, connectivity-equivalent) replaces the n(n-1)/2 pairs
      and only the rep enters the banding.
    - **Hot-band cap** (``max_posting``): (band, key) buckets whose
      distinct-signature posting list exceeds the cap are skipped —
      no discriminative signal, O(posting²) cost. Deterministic skip;
      ``None`` disables.
    """
    sig = stable_checkpoint(
        _minhash_sigs(
            df,
            id_col=id_col,
            text_col=text_col,
            k_shingle=k_shingle,
            num_hashes=num_hashes,
            family=family,
        )
    )
    hcols = [f"__h{h}" for h in range(num_hashes)]
    marked = sig.withColumn(
        "__rep", F.min("__id").over(Window.partitionBy(*hcols))
    )
    zero = marked.where(F.col("__id") != F.col("__rep")).select(
        F.col("__rep").alias("id_a"), F.col("__id").alias("id_b")
    )
    reps = marked.where(F.col("__id") == F.col("__rep")).select(
        "__id", *hcols
    )
    # posting lists per (band, key) → local pair generation → one
    # distinct on the pair: no self-join of two exploded sides (the
    # same plan shape as the exact-Jaccard pair stage).
    postings = (
        _band_keys(reps, num_hashes, bands, family)
        .groupBy("band", "key")
        .agg(F.sort_array(F.collect_set("__id")).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    if max_posting is not None:
        postings = postings.filter(F.size("ids") <= max_posting)
    cross = (
        explode_bucket_pairs(
            postings,
            "ids",
            lambda x, y: F.struct(x.alias("id_a"), y.alias("id_b")),
            max_bucket,
        )
        .select(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .distinct()
    )
    # star pairs have a non-rep id_b, banded pairs are rep-to-rep:
    # disjoint by construction
    return zero.unionByName(cross)


def simhash64(tokens: Column, family: str = "fast") -> Column:
    """63-bit SimHash of a token array (bit 63 unused — sign safety).

    Array-native majority vote: bit j is set when more than half the
    tokens have bit j set in their xxhash64. ONE fold over the token
    hashes whose accumulator is the 63-element bit-count array
    (``zip_with`` add of each hash's bit vector), then one indexed
    fold assembles the signature — two aggregate subtrees total
    instead of 63 (the same codegen-bloat fix as the ANN shared
    sign-bit tree). ``pow(2, j)`` is exact in double for j <= 62.

    ``family="portable"`` swaps the token hash for the md5-nibble
    integer (60 meaningful bits — hex15_int < 2^60) so a DuckDB twin
    reproduces the signature bit-for-bit (the 'shp' oracle variant);
    same fold, same majority rule, 60-element bit vector.
    """
    n = F.size(tokens)
    if family == "portable":
        hashes = F.transform(tokens, lambda t: hex15_int(t))
        bit_idx = F.sequence(F.lit(0), F.lit(59))
    else:
        hashes = F.transform(tokens, lambda t: F.xxhash64(t))
        bit_idx = F.sequence(F.lit(0), F.lit(62))
    counts = F.aggregate(
        hashes,
        F.array_repeat(
            F.lit(0).cast("bigint"), 60 if family == "portable" else 63
        ),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(bit_idx, lambda j: F.getbit(h, j).cast("bigint")),
            lambda a, b: a + b,
        ),
    )
    indexed = F.zip_with(
        counts, bit_idx, lambda c, j: F.struct(c.alias("c"), j.alias("j"))
    )
    return F.aggregate(
        indexed,
        F.lit(0).cast("bigint"),
        lambda acc, s: acc
        + F.when(
            s["c"] * 2 > n, F.pow(F.lit(2.0), s["j"]).cast("bigint")
        ).otherwise(F.lit(0).cast("bigint")),
    )


def simhash_candidates(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    chunks: int = 4,
    max_bucket: int = 256,
    max_posting: int | None = 100_000,
    family: str = "fast",
) -> DataFrame:
    """Near-dup pairs (id_a, id_b, hamming) with distance <= max_hamming.

    Pigeonhole banding: with 4 × 16-bit chunks, any pair within
    Hamming distance 3 shares at least one exact chunk, so the
    candidate join is an equi-join on (chunk_idx, chunk_value). The
    pairing machinery is the shared
    :func:`~.image_hash.hamming_banded_pairs` (this plan was its
    template): signature checkpointed so the fold runs once,
    identical signatures collapsed to star pairs before banding
    (hamming 0 by definition), ``max_bucket`` chunk-pair rows bound
    per-row memory, ``max_posting`` skips non-discriminative hot
    bands.
    """
    from .image_hash import hamming_banded_pairs

    # small-file scans arrive single-partition and the signature fold
    # is CPU-bound; spread() no-ops when the scan is already wide
    wide = spread(df, id_col)
    sig = wide.select(
        F.col(id_col).alias("__id"),
        simhash64(tokens_ws(F.col(text_col)), family).alias("__sim"),
    )
    # the 63-bit signature is non-negative, so the generic pairing's
    # unsigned chunk shift equals the arithmetic shift used here before
    return hamming_banded_pairs(
        sig,
        id_col="__id",
        hash_col="__sim",
        max_hamming=max_hamming,
        chunks=chunks,
        max_bucket=max_bucket,
        max_posting=max_posting,
    )


def lsh_params(
    threshold: float,
    num_hashes: int,
    *,
    candidates: tuple[int, ...] | None = None,
) -> dict:
    """Choose the banding (bands, rows) for a target Jaccard threshold.

    The collision probability of a pair with similarity j under
    (b bands × r rows) is ``1 - (1 - j^r)^b`` — an s-curve whose
    inflection sits near ``(1/b)^(1/r)``. This picks, among the
    divisors of ``num_hashes``, the banding whose inflection lands
    closest to ``threshold`` (the standard MMDS ch.3 recipe), and
    reports the operating characteristics a pipeline owner needs to
    sanity-check recall/cost:

    - ``p_at_threshold``: collision probability exactly at the target,
    - ``fn_below`` / ``fp_above``: collision probability at 0.8× and
      1.25× the threshold (miss-rate proxy below, junk-rate above).

    Pure driver-side arithmetic — feed the result straight into
    :func:`minhash_candidates` / :func:`minhash_bands`.
    """
    if not 0 < threshold < 1:
        raise ValueError("threshold must be in (0, 1)")
    if candidates:
        bad = [b for b in candidates if num_hashes % b != 0]
        if bad:
            raise ValueError(
                f"candidate band counts {bad} do not divide "
                f"num_hashes={num_hashes}; the reported operating "
                "characteristics would not match the banding "
                "minhash_bands actually produces"
            )
    divs = candidates or tuple(
        b for b in range(1, num_hashes + 1) if num_hashes % b == 0
    )

    def collide(j: float, b: int, r: int) -> float:
        return 1.0 - (1.0 - j**r) ** b

    best = None
    for b in divs:
        r = num_hashes // b
        inflection = (1.0 / b) ** (1.0 / r)
        score = abs(inflection - threshold)
        if best is None or score < best[0]:
            best = (score, b, r, inflection)
    _, b, r, inflection = best
    return {
        "bands": b,
        "rows_per_band": r,
        "num_hashes": num_hashes,
        "inflection": inflection,
        "p_at_threshold": collide(threshold, b, r),
        "fn_below": collide(threshold * 0.8, b, r),
        "fp_above": collide(min(threshold * 1.25, 1.0), b, r),
    }
