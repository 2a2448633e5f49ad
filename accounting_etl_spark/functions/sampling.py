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
