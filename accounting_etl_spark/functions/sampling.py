"""Deterministic (hash-based) sampling — reproducible across engines,
runs, and partitionings.

``df.sample()``'s RNG is engine- and partitioning-specific, so
sampled pipelines can't be replayed or oracle-checked. The portable
form hashes (stratum, id) to a uniform value: the md5 hex prefix of
the key compares lexicographically exactly like the number it
encodes, so ``substring(md5(key), 1, 8) < cutoff_hex`` keeps each row
with probability ``rate`` identically in any engine with md5 — no
integer-hash conversion, no RNG state.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def rate_cutoff_hex(rate: float) -> str:
    """Cutoff string: P(md5_prefix < cutoff) == rate.

    ``rate >= 1.0`` returns ``"g"`` — one past ``'f'`` in ASCII, so
    every 8-hex-digit prefix (including ``"ffffffff"``) compares below
    it and a full stratum really keeps ALL rows (capping at
    ``16**8 - 1`` would silently drop rows hashing to exactly
    ``ffffffff``).
    """
    if rate >= 1.0:
        return "g"
    return format(max(int(rate * 16**8), 0), "08x")


def sample_hash(stratum: Column, uid: Column) -> Column:
    """Uniform [0,1) hash of (stratum, id) as an 8-hex string."""
    return F.substring(
        F.md5(
            F.concat_ws("#", stratum.cast("string"), uid.cast("string"))
        ),
        1,
        8,
    )


def stratified_keep(
    stratum: Column, uid: Column, rates: dict, *, default: float = 0.0
) -> Column:
    """Boolean keep-condition for per-stratum sampling rates."""
    h = sample_hash(stratum, uid)
    cond: Column = (
        h < F.lit(rate_cutoff_hex(default)) if default > 0 else F.lit(False)
    )
    for k, r in rates.items():
        cond = F.when(
            stratum == F.lit(k), h < F.lit(rate_cutoff_hex(r))
        ).otherwise(cond)
    return cond


def split_assign(
    key: Column, fractions: dict[str, float], *, salt: str = "split"
) -> Column:
    """Deterministic multi-way split label from a key's uniform hash.

    ``fractions`` maps split names to probabilities (must sum to ≤ 1;
    any remainder falls into the LAST listed split, so the canonical
    ``{"train": .8, "val": .1, "test": .1}`` is exact). Cumulative
    md5-prefix cutoffs, same portable scheme as :func:`stratified_keep`
    — identical assignment in any engine with md5, no RNG.

    Pass a DEDUP-CLUSTER label as ``key`` (not the doc id) to get a
    leakage-free split: every near-duplicate of a document lands in
    the same split, so eval can't score memorized training dupes.
    """
    total = sum(fractions.values())
    if not 0 < total <= 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total}; need (0, 1]")
    h = sample_hash(F.lit(salt), key)
    names = list(fractions)
    # band i covers [cum_{i-1}, cum_i); build the when() chain from the
    # innermost (largest cutoff) outward so evaluation tests the bands
    # in cumulative order and the remainder falls to the last split
    bands = []
    cum = 0.0
    for name in names[:-1]:
        cum += fractions[name]
        bands.append((name, rate_cutoff_hex(cum)))
    result: Column = F.lit(names[-1])
    for name, cutoff in reversed(bands):
        result = F.when(h < F.lit(cutoff), F.lit(name)).otherwise(result)
    return result
