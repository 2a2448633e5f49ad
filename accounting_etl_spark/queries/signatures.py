"""Synthetic-signature twins for the Hamming-banded pairing plan.

The perceptual near-dup operators (operators/image_hash.py,
operators/incremental.py, streaming/dedup.py) are driver rows-only
when their inputs come from decode UDFs — the hash VALUES are not
SQL-expressible. The PLAN is, though: collapse → banding → posting
cap → bit_count(xor) verify is pure integer relational algebra. These
variants derive deterministic int64 signatures from the ``documents``
table with expressions both engines evaluate identically (the md5
nibble-assembly precedent of the negative-sampling oracle,
operators/negatives.py), run the REAL operators on them, and give
DuckDB a brute-force twin — so the pigeonhole recall guarantee, the
identical-signature star collapse, the hot-band cap, and the
two-epoch admission state machine all become hash-checked
(VERDICT r7 Next #1/#3/#6).

Signature construction (id space sliced by ``m = doc_id % 10``,
family ``f = doc_id // 10``; base(f) is a 60-bit md5-nibble integer,
nonnegative so shift semantics agree across engines):

- ``m ∈ {0,1}``: ``base(f)`` twice → an identical-signature group per
  family (exercises the min-id star collapse).
- ``m = 2/3/4``: base with 1/3/5 distinct bit flips (offsets
  0,13,29,7,37 mod 48) → verified pairs at Hamming 1/3/2… and a
  Hamming-5 member that shares bands but FAILS the verify.
- ``m ∈ {5..9}``: md5-random signatures with the low 16 bits cleared
  — half the corpus lands in band ``(0, 0)``, which exceeds the
  posting cap and is skipped/audited (the blank-thumbnail regime).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

# pairing parameters: small cap so the sf-fixture hot band engages it
import itertools as _itertools

_ADMIT_SEQ = _itertools.count()  # per-invocation scratch suffix

_CHUNKS = 4
_WIDTH = 64 // _CHUNKS
_MASK = (1 << _WIDTH) - 1
_MAX_HAMMING = 3
_MAX_POSTING = 8
_FLIP_OFFSETS = (0, 13, 29, 7, 37)  # pairwise distinct mod 48


def _hex15_int(col):
    """First 15 md5 nibbles as a nonnegative int64 (< 2^60) — the
    engine-portable hash-to-integer idiom (operators/negatives.py)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def synthetic_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, sig) — deterministic SQL-derivable 60-bit signatures
    over ``documents`` (see module docstring for the slice layout)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    d = docs.withColumn("m", F.col("doc_id") % 10).withColumn(
        "f", F.expr("doc_id div 10")
    )
    base = _hex15_int(F.concat(F.lit("hbp|"), F.col("f").cast("string")))
    hot = _hex15_int(
        F.concat(F.lit("hot|"), F.col("doc_id").cast("string"))
    ).bitwiseAND(F.lit(-65536).cast("bigint"))

    def flip(off: int):
        return F.expr(f"shiftleft(1L, cast((f + {off}) % 48 as int))")

    def flips(n: int):
        out = F.lit(0).cast("bigint")
        for off in _FLIP_OFFSETS[:n]:
            out = out + flip(off)
        return out

    mask = (
        F.when(F.col("m") == 2, flips(1))
        .when(F.col("m") == 3, flips(3))
        .when(F.col("m") == 4, flips(5))
        .otherwise(F.lit(0).cast("bigint"))
    )
    sig = F.when(F.col("m") <= 4, base.bitwiseXOR(mask)).otherwise(hot)
    return d.select("doc_id", sig.alias("sig"))


def q_hbp_synth(
    spark: SparkSession, sf_dir: str, sigs: DataFrame | None = None
) -> DataFrame:
    """'hbp' variant: the REAL :func:`~..operators.image_hash.
    hamming_banded_pairs` (identical-signature collapse, pigeonhole
    banding, posting cap, bit_count verify) over synthetic signatures
    — the scale-critical pairing plan, hash-checked against a DuckDB
    brute-force twin that replicates each stage (VERDICT r7 Next #1).
    Columns: doc_a/doc_b = pair ids, inter = Hamming distance.
    ``sigs`` lets the merged entry share one checkpointed signature
    table across the four synthetic-signature variants (r12)."""
    from ..operators.image_hash import hamming_banded_pairs

    if sigs is None:
        sigs = synthetic_signatures(spark, sf_dir)
    pairs = hamming_banded_pairs(
        sigs,
        id_col="doc_id",
        hash_col="sig",
        max_hamming=_MAX_HAMMING,
        chunks=_CHUNKS,
        max_posting=_MAX_POSTING,
    )
    return pairs.select(
        F.col("id_a").alias("doc_a"),
        F.col("id_b").alias("doc_b"),
        F.col("hamming").cast("bigint").alias("inter"),
        F.lit(None).cast("bigint").alias("denom"),
        F.lit(None).cast("double").alias("score"),
    )


_HBPC_MAX_BUCKET = 3  # force multi-chunk pair expansion on 4-8 postings


def q_hbp_chunked_synth(
    spark: SparkSession, sf_dir: str, sigs: DataFrame | None = None
) -> DataFrame:
    """'hbpc' variant: chunked-expansion invariance, hash-checked —
    the same signatures and cap as 'hbp' but ``max_bucket=3``, so
    every posting list of 4..8 members is cut into chunk-pair rows
    and expanded through `explode_bucket_pairs`' off-diagonal cross
    product (the executor-memory bound for hot buckets). The oracle is
    the SAME brute-force SQL as 'hbp': chunking must never change the
    pair set, and any drift in the slice arithmetic or the diagonal /
    off-diagonal split hash-mismatches."""
    from ..operators.image_hash import hamming_banded_pairs

    if sigs is None:
        sigs = synthetic_signatures(spark, sf_dir)
    pairs = hamming_banded_pairs(
        sigs,
        id_col="doc_id",
        hash_col="sig",
        max_hamming=_MAX_HAMMING,
        chunks=_CHUNKS,
        max_bucket=_HBPC_MAX_BUCKET,
        max_posting=_MAX_POSTING,
    )
    return pairs.select(
        F.col("id_a").alias("doc_a"),
        F.col("id_b").alias("doc_b"),
        F.col("hamming").cast("bigint").alias("inter"),
        F.lit(None).cast("bigint").alias("denom"),
        F.lit(None).cast("double").alias("score"),
    )


def q_hot_band_audit_synth(
    spark: SparkSession, sf_dir: str, sigs: DataFrame | None = None
) -> DataFrame:
    """'hbaudit' variant: :func:`~..operators.image_hash.
    hot_band_audit` over the same signatures — the bands the cap
    SKIPS, as driver-visible rows (the no-silent-caps principle,
    VERDICT r7 Next #6). Columns: doc_a = chunk, doc_b = band value,
    inter = distinct-signature count."""
    from ..operators.image_hash import hot_band_audit

    if sigs is None:
        sigs = synthetic_signatures(spark, sf_dir)
    audit = hot_band_audit(
        sigs,
        hash_col="sig",
        chunks=_CHUNKS,
        max_posting=_MAX_POSTING,
    )
    return audit.select(
        F.col("chunk").cast("bigint").alias("doc_a"),
        F.col("val").cast("bigint").alias("doc_b"),
        F.col("n_sigs").cast("bigint").alias("inter"),
        F.lit(None).cast("bigint").alias("denom"),
        F.lit(None).cast("double").alias("score"),
    )


def q_admission_synth(
    spark: SparkSession, sf_dir: str, sigs: DataFrame | None = None
) -> DataFrame:
    """'admit' variant: the REAL :func:`~..streaming.dedup.
    perceptual_admission_batch` run as a deterministic two-epoch
    sequence over synthetic signatures (VERDICT r7 Next #3) — epoch 1
    (even doc_ids) admits against an empty index, epoch 2 (odd
    doc_ids) against epoch 1's admissions; the parquet index lives in
    per-application scratch wiped at entry so every invocation
    replays from empty. The DuckDB twin replicates the full state
    machine: batch collapse, exact-hit short-circuit, posting-capped
    banded index probe, greedy within-batch drop, grow-on-admit.
    Columns: doc_a = rep_id, doc_b = admitted signature, inter =
    n_members, denom = epoch."""
    from ..session import scratch_dir
    from ..streaming.dedup import perceptual_admission_batch

    if sigs is None:
        sigs = synthetic_signatures(spark, sf_dir)
    sigs = sigs.select("doc_id", F.col("sig").alias("dhash"))
    # scratch_dir wipes at entry: each invocation (the bench re-runs
    # variants) replays the identical from-empty two-epoch sequence.
    # The per-invocation counter suffix keeps concurrent evaluations
    # (merged entry + dotted variant scheduled in one session) from
    # wiping each other's index mid-replay (ADVICE r8); each dir is a
    # few KB and the application dir is age-swept by later sessions.
    # The index itself is a not-yet-existing subdir — an existing but
    # EMPTY directory reads as UNABLE_TO_INFER_SCHEMA, not the
    # missing-path condition the first-batch rule keys on.
    path = scratch_dir(spark, f"admit_synth_{next(_ADMIT_SEQ)}") + "/idx"
    out = []
    for epoch in (1, 2):
        batch = sigs.where(F.col("doc_id") % 2 == epoch - 1)
        admitted = perceptual_admission_batch(
            batch,
            path,
            max_hamming=_MAX_HAMMING,
            chunks=_CHUNKS,
            max_posting=_MAX_POSTING,
            append=True,
            batch_id=epoch,
        )
        out.append(
            admitted.select(
                F.col("rep_id").alias("doc_a"),
                F.col("sig").alias("doc_b"),
                F.col("n_members").cast("bigint").alias("inter"),
                F.lit(epoch).cast("bigint").alias("denom"),
                F.lit(None).cast("double").alias("score"),
            )
        )
    return out[0].unionByName(out[1])


# --- Portable MinHash-LSH (real text, engine-portable hash family) ----
#
# The last scale-critical dedup plan outside the hash line (VERDICT r8
# Next #2): minhash_candidates' signature CONSTRUCTION used xxhash64
# permutations DuckDB cannot replicate. family="portable" swaps in the
# md5-nibble integer idiom end to end — shingle key, the num_hashes
# member mins, the band keys — so the REAL operator runs over the real
# ``documents`` text and a DuckDB brute-force twin reproduces every
# value: signature construction AND banding AND the star collapse /
# posting cap / chunked pair expansion are all in the hash now.

_MH_K = 3  # word-shingle width (matches the exact-Jaccard baseline)
_MH_NUM_HASHES = 4
_MH_BANDS = 4  # r = 1 row/band: the high-recall banding, so the sf
# fixtures produce postings of up to 5 members — the cap and the
# chunked pair expansion both ENGAGE on real data (measured at
# sf0.01: bucket sizes {1: 1299, 2: 234, 3: 41, 4: 4, 5: 2})
_MH_MAX_POSTING = 4  # the two 5-member postings are skipped (cap path)
_MH_MAX_BUCKET = 3  # 4-member postings go through chunk-pair rows


def q_minhash_portable(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """'mhp' variant: the REAL :func:`~..operators.dedup.
    minhash_candidates` (shingle → per-member min → identical-signature
    star collapse → banded postings → posting cap → chunked pair
    expansion) with ``family="portable"`` over ``documents`` text.
    Columns: doc_a/doc_b = candidate pair; inter/denom/score NULL
    (candidate generation has no distance — verification is the
    'jaccard' variant's job)."""
    from ..operators.dedup import minhash_candidates

    if docs is None:
        docs = load_table(spark, sf_dir, "documents")
    docs = docs.select("doc_id", "text")
    pairs = minhash_candidates(
        docs,
        id_col="doc_id",
        text_col="text",
        k_shingle=_MH_K,
        num_hashes=_MH_NUM_HASHES,
        bands=_MH_BANDS,
        max_bucket=_MH_MAX_BUCKET,
        max_posting=_MH_MAX_POSTING,
        family="portable",
    )
    return pairs.select(
        F.col("id_a").alias("doc_a"),
        F.col("id_b").alias("doc_b"),
        F.lit(None).cast("bigint").alias("inter"),
        F.lit(None).cast("bigint").alias("denom"),
        F.lit(None).cast("double").alias("score"),
    )


def minhash_portable_sql() -> str:
    """Brute-force DuckDB twin of the portable-family
    minhash_candidates: same shingles, same md5-nibble member mins,
    same '|'-joined band keys, min-id star collapse, posting count in
    [2, cap], all C(n,2) bucket pairs deduped. ``max_bucket`` must
    never change the pair set, so the twin has no chunking stage."""
    r = _MH_NUM_HASHES // _MH_BANDS
    hcols = ", ".join(f"h{h}" for h in range(_MH_NUM_HASHES))
    mins = ",\n         ".join(
        "min(CAST(('0x' || substr(md5(kstr || '|" + str(h) + "'), 1, 15))"
        f" AS BIGINT)) AS h{h}"
        for h in range(_MH_NUM_HASHES)
    )

    def band_select(b: int) -> str:
        slots = " || '|' || ".join(
            f"CAST(h{b * r + i} AS VARCHAR)" for i in range(r)
        )
        return (
            f"SELECT id, {b} AS band, CAST(('0x' || "
            f"substr(md5({slots}), 1, 15)) AS BIGINT) AS key FROM mhreps"
        )

    bands = "\n  UNION ALL ".join(band_select(b) for b in range(_MH_BANDS))
    return f"""
WITH mhtok AS (
  SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents
), mhsh AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t) - {_MH_K - 2}),
                               i -> array_to_string(t[i:i+{_MH_K - 1}], ' ')))
           AS sh
  FROM mhtok WHERE len(t) >= {_MH_K}
), mhkey AS (
  SELECT doc_id, md5(sh) AS kstr FROM mhsh
), mhsig AS (
  SELECT doc_id, {mins}
  FROM mhkey GROUP BY doc_id
), mhrep AS (
  SELECT doc_id, {hcols},
         min(doc_id) OVER (PARTITION BY {hcols}) AS rep
  FROM mhsig
), mhzero AS (
  SELECT rep AS id_a, doc_id AS id_b FROM mhrep WHERE doc_id != rep
), mhreps AS (
  SELECT doc_id AS id, {hcols} FROM mhrep WHERE doc_id = rep
), mhband AS (
  {bands}
), mhgood AS (
  SELECT band, key FROM (
    SELECT band, key, count(*) AS n FROM mhband GROUP BY 1, 2
  ) WHERE n BETWEEN 2 AND {_MH_MAX_POSTING}
), mhcand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM mhband a
  JOIN mhband b ON a.band = b.band AND a.key = b.key AND a.id < b.id
  JOIN mhgood g ON g.band = a.band AND g.key = a.key
)
SELECT id_a AS doc_a, id_b AS doc_b,
       CAST(NULL AS BIGINT) AS inter,
       CAST(NULL AS BIGINT) AS denom, CAST(NULL AS DOUBLE) AS score
FROM (SELECT * FROM mhzero UNION ALL SELECT * FROM mhcand)
"""


# --- Portable SimHash (real text, engine-portable hash family) --------

_SH_MAX_HAMMING = 3
_SH_CHUNKS = 4
_SH_MAX_POSTING = 8  # measured at sf0.01: 11 hot buckets skipped


def q_simhash_portable(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """'shp' variant: the REAL :func:`~..operators.dedup.
    simhash_candidates` with ``family="portable"`` over ``documents``
    text — the 60-bit md5-nibble majority-vote signature (bit j set
    when more than half the token hashes carry bit j) followed by the
    shared Hamming-banded pairing. With 'mhp' this closes the last
    signature-construction gap in the near-dup family: the SimHash
    fold itself is now hash-checked bit-for-bit against a DuckDB
    twin, not just the pairing plan it feeds. Columns: doc_a/doc_b =
    pair, inter = Hamming distance."""
    from ..operators.dedup import simhash_candidates

    if docs is None:
        docs = load_table(spark, sf_dir, "documents")
    docs = docs.select("doc_id", "text")
    pairs = simhash_candidates(
        docs,
        id_col="doc_id",
        text_col="text",
        max_hamming=_SH_MAX_HAMMING,
        chunks=_SH_CHUNKS,
        max_posting=_SH_MAX_POSTING,
        family="portable",
    )
    return pairs.select(
        F.col("id_a").alias("doc_a"),
        F.col("id_b").alias("doc_b"),
        F.col("hamming").cast("bigint").alias("inter"),
        F.lit(None).cast("bigint").alias("denom"),
        F.lit(None).cast("double").alias("score"),
    )


def simhash_portable_sql() -> str:
    """Brute-force twin: per-token md5-nibble hashes, per-bit majority
    vote (counting repeated tokens per occurrence, like the Spark
    fold), 60-bit signature assembly, then the standard star-collapse
    / pigeonhole-band / posting-cap / bit_count verify replica."""
    w = 64 // _SH_CHUNKS
    return f"""
WITH shtok AS (
  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w
  FROM documents
), shh AS (
  SELECT doc_id, CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) AS h
  FROM shtok
), shn AS (
  SELECT doc_id, count(*) AS n FROM shh GROUP BY doc_id
), shbits AS (
  SELECT doc_id, j, sum((h >> CAST(j AS INTEGER)) & 1) AS ones
  FROM shh, (SELECT unnest(range(60)) AS j) GROUP BY 1, 2
), shsig AS (
  SELECT b.doc_id,
         sum(CASE WHEN ones * 2 > n
             THEN (CAST(1 AS BIGINT) << CAST(j AS INTEGER))
             ELSE CAST(0 AS BIGINT) END) AS sig
  FROM shbits b JOIN shn USING (doc_id) GROUP BY b.doc_id
), shrep AS (
  SELECT doc_id, sig, min(doc_id) OVER (PARTITION BY sig) AS rep
  FROM shsig
), shzero AS (
  SELECT rep AS id_a, doc_id AS id_b, CAST(0 AS BIGINT) AS hamming
  FROM shrep WHERE doc_id != rep
), shreps AS (
  SELECT doc_id AS id, sig FROM shrep WHERE doc_id = rep
), shband AS (
  SELECT id, sig, c, (sig >> (CAST(c AS INTEGER) * {w})) & {(1 << w) - 1}
           AS v
  FROM shreps, (SELECT unnest(range({_SH_CHUNKS})) AS c)
), shgood AS (
  SELECT c, v FROM (
    SELECT c, v, count(*) AS n FROM shband GROUP BY 1, 2
  ) WHERE n BETWEEN 2 AND {_SH_MAX_POSTING}
), shcand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
         CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
  FROM shband a
  JOIN shband b ON a.c = b.c AND a.v = b.v AND a.id < b.id
  JOIN shgood g ON g.c = a.c AND g.v = a.v
  WHERE bit_count(xor(a.sig, b.sig)) <= {_SH_MAX_HAMMING}
)
SELECT id_a AS doc_a, id_b AS doc_b, hamming AS inter,
       CAST(NULL AS BIGINT) AS denom, CAST(NULL AS DOUBLE) AS score
FROM (SELECT * FROM shzero UNION ALL SELECT * FROM shcand)
"""


# --- DuckDB oracle SQL -------------------------------------------------
#
# All CTEs are hb-prefixed to compose into the near_dup_jaccard union
# without name collisions. Generated so the chunk arithmetic and the
# cap/flip constants stay single-sourced with the Spark side.


def _sigs_sql() -> str:
    def flips(n: int) -> str:
        return " + ".join(
            f"(CAST(1 AS BIGINT) << CAST((hbf + {off}) % 48 AS INTEGER))"
            for off in _FLIP_OFFSETS[:n]
        )

    return f"""
  SELECT doc_id,
         CASE WHEN hbm <= 4 THEN xor(
           CAST(('0x' || substr(md5('hbp|' || CAST(hbf AS VARCHAR)), 1, 15))
                AS BIGINT),
           CASE hbm WHEN 2 THEN {flips(1)}
                    WHEN 3 THEN {flips(3)}
                    WHEN 4 THEN {flips(5)}
                    ELSE CAST(0 AS BIGINT) END)
         ELSE
           CAST(('0x' || substr(md5('hot|' || CAST(doc_id AS VARCHAR)), 1, 15))
                AS BIGINT) & CAST(-65536 AS BIGINT)
         END AS sig
  FROM (SELECT doc_id, doc_id % 10 AS hbm, doc_id // 10 AS hbf
        FROM documents)
"""


def _band_expr(sig: str = "sig") -> str:
    return f"({sig} >> (CAST(hbchunk AS INTEGER) * {_WIDTH})) & {_MASK}"


_CHUNK_TAB = f"(SELECT unnest(range({_CHUNKS})) AS hbchunk)"


def hbp_synth_sql() -> str:
    """Brute-force twin of hamming_banded_pairs over the synthetic
    signatures: star pairs from the min-id collapse, then distinct rep
    pairs that share >=1 band whose rep-posting count is within
    [2, cap], verified at bit_count(xor) <= max_hamming."""
    return f"""
WITH hbsigs AS ({_sigs_sql()}
), hbrep AS (
  SELECT doc_id, sig, min(doc_id) OVER (PARTITION BY sig) AS rep
  FROM hbsigs
), hbzero AS (
  SELECT rep AS id_a, doc_id AS id_b, CAST(0 AS BIGINT) AS hamming
  FROM hbrep WHERE doc_id != rep
), hbreps AS (
  SELECT doc_id AS id, sig FROM hbrep WHERE doc_id = rep
), hbbands AS (
  SELECT id, sig, hbchunk, {_band_expr()} AS hbval
  FROM hbreps, {_CHUNK_TAB}
), hbgood AS (
  SELECT hbchunk, hbval FROM (
    SELECT hbchunk, hbval, count(*) AS n FROM hbbands GROUP BY 1, 2
  ) WHERE n BETWEEN 2 AND {_MAX_POSTING}
), hbcand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
         CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
  FROM hbbands a
  JOIN hbbands b ON a.hbchunk = b.hbchunk AND a.hbval = b.hbval
                AND a.id < b.id
  JOIN hbgood g ON g.hbchunk = a.hbchunk AND g.hbval = a.hbval
  WHERE bit_count(xor(a.sig, b.sig)) <= {_MAX_HAMMING}
)
SELECT id_a AS doc_a, id_b AS doc_b, hamming AS inter,
       CAST(NULL AS BIGINT) AS denom, CAST(NULL AS DOUBLE) AS score
FROM (SELECT * FROM hbzero UNION ALL SELECT * FROM hbcand)
"""


def hot_band_audit_sql() -> str:
    return f"""
WITH hasigs AS ({_sigs_sql()}
), hadist AS (
  SELECT DISTINCT sig FROM hasigs
), habands AS (
  SELECT hbchunk, {_band_expr()} AS hbval
  FROM hadist, {_CHUNK_TAB}
)
SELECT CAST(hbchunk AS BIGINT) AS doc_a, CAST(hbval AS BIGINT) AS doc_b,
       CAST(count(*) AS BIGINT) AS inter,
       CAST(NULL AS BIGINT) AS denom, CAST(NULL AS DOUBLE) AS score
FROM habands GROUP BY 1, 2 HAVING count(*) > {_MAX_POSTING}
"""


def _epoch_sql(epoch: int) -> str:
    """Collapse + within-batch greedy drop for one epoch's batch;
    epoch 2 additionally probes epoch 1's admitted index (exact-hit
    equi-join, then banded near-hit with the index posting list capped
    at the first {cap} (rep_id, sig)-ordered entries — the
    hamming_against_index slice rule)."""
    par = epoch - 1
    sql = f"""ad{epoch}sig AS (
  SELECT sig, min(doc_id) AS rep_id,
         CAST(count(*) AS BIGINT) AS n_members
  FROM hbsigs WHERE doc_id % 2 = {par} GROUP BY sig
), ad{epoch}band AS (
  SELECT rep_id, sig, hbchunk, {_band_expr()} AS hbval
  FROM ad{epoch}sig, {_CHUNK_TAB}
), ad{epoch}good AS (
  SELECT hbchunk, hbval FROM (
    SELECT hbchunk, hbval, count(*) AS n
    FROM ad{epoch}band GROUP BY 1, 2
  ) WHERE n BETWEEN 2 AND {_MAX_POSTING}
), ad{epoch}within AS (
  SELECT DISTINCT b.rep_id
  FROM ad{epoch}band a
  JOIN ad{epoch}band b ON a.hbchunk = b.hbchunk AND a.hbval = b.hbval
                      AND a.rep_id < b.rep_id
  JOIN ad{epoch}good g ON g.hbchunk = a.hbchunk AND g.hbval = a.hbval
  WHERE bit_count(xor(a.sig, b.sig)) BETWEEN 1 AND {_MAX_HAMMING}
)"""
    if epoch == 1:
        return sql + """, ad1adm AS (
  SELECT s.sig, s.rep_id, s.n_members FROM ad1sig s
  WHERE s.rep_id NOT IN (SELECT rep_id FROM ad1within)
)"""
    return sql + f""", ad2hexact AS (
  SELECT DISTINCT s.rep_id FROM ad2sig s JOIN ad1adm i ON s.sig = i.sig
), ad2idx AS (
  SELECT rep_id, sig, hbchunk, hbval FROM (
    SELECT i.rep_id, i.sig, hbchunk, {_band_expr("i.sig")} AS hbval,
           row_number() OVER (
             PARTITION BY hbchunk, {_band_expr("i.sig")}
             ORDER BY i.rep_id, i.sig) AS rn
    FROM ad1adm i, {_CHUNK_TAB}
  ) WHERE rn <= {_MAX_POSTING}
), ad2hnear AS (
  SELECT DISTINCT b.rep_id
  FROM ad2band b
  JOIN ad2idx i ON b.hbchunk = i.hbchunk AND b.hbval = i.hbval
  WHERE bit_count(xor(b.sig, i.sig)) BETWEEN 1 AND {_MAX_HAMMING}
), ad2adm AS (
  SELECT s.sig, s.rep_id, s.n_members FROM ad2sig s
  WHERE s.rep_id NOT IN (SELECT rep_id FROM ad2hexact)
    AND s.rep_id NOT IN (SELECT rep_id FROM ad2hnear)
    AND s.rep_id NOT IN (SELECT rep_id FROM ad2within)
)"""


def admission_synth_sql() -> str:
    return f"""
WITH hbsigs AS ({_sigs_sql()}
), {_epoch_sql(1)}, {_epoch_sql(2)}
SELECT rep_id AS doc_a, sig AS doc_b, n_members AS inter,
       CAST(epoch AS BIGINT) AS denom, CAST(NULL AS DOUBLE) AS score
FROM (
  SELECT *, 1 AS epoch FROM ad1adm
  UNION ALL
  SELECT *, 2 AS epoch FROM ad2adm
)
"""
