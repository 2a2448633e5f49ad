"""Multimodal + scale-path dedup queries.

``multimodal_meta`` is oracle-checked (byte lengths + md5 checksums
are engine-portable). The mapInPandas feature extraction and the
MinHash/SimHash candidate generators are genuinely non-SQL-
expressible (hash internals differ per engine), so they take the
driver's rows-only check and are unit-tested against the exact
Jaccard baseline (tests/test_dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.spread import spread
from ..operators.dedup import minhash_candidates, simhash_candidates
from ..operators.multimodal import attach_payload, extract_media_features
from ..sources.tables import load_table
from . import Q


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over opaque payload bytes (oracle-checked)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("modality"),
        F.octet_length("text").cast("bigint").alias("n_bytes"),
        F.md5(F.encode(F.col("text"), "UTF-8")).alias("checksum"),
    )


def q_multimodal_fake_features(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """'feat' variant — the REAL :func:`~..operators.multimodal.
    extract_media_features` operator (Arrow ``mapInPandas``, the
    deterministic fake-decode path) hash-checked end-to-end (VERDICT
    r9 Next #4). The fake decoder's feature math is SQL-derivable —
    seed = first 8 md5 nibbles of the payload, then pure integer
    formulas per modality — so a DuckDB twin recomputes every
    width/height/n_frames/sample_rate value, pinning the UDF's batch
    iteration, schema, payload hashing, and per-modality feature
    assembly. Real decode (image/audio/video bytes) stays rows-only
    in ``multimodal_features`` — no SQL twin can decode pixels — but
    the surrounding plumbing and math are now inside the hash line."""
    docs = load_table(spark, sf_dir, "documents")
    return extract_media_features(attach_payload(docs)).select(
        "doc_id",
        "modality",
        "n_bytes",
        "checksum",
        "width",
        "height",
        "n_frames",
        "sample_rate",
    )


def q_multimodal_meta_merged(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Typed payload metadata ('meta', native exprs) + the real
    fake-decode feature operator ('feat', Arrow mapInPandas) in one
    union-tagged oracle-paired entry."""
    nulls = [
        F.lit(None).cast("int").alias(c)
        for c in ("width", "height", "n_frames", "sample_rate")
    ]
    meta = q_multimodal_meta(spark, sf_dir).select(
        F.lit("meta").alias("variant"),
        "doc_id",
        "modality",
        "n_bytes",
        "checksum",
        *nulls,
    )
    feat = q_multimodal_fake_features(spark, sf_dir).select(
        F.lit("feat").alias("variant"),
        "doc_id",
        "modality",
        "n_bytes",
        "checksum",
        "width",
        "height",
        "n_frames",
        "sample_rate",
    )
    return meta.unionByName(feat)


_META_SQL = """
SELECT 'meta' AS variant, doc_id,
       (['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INTEGER)] AS modality,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       md5(text) AS checksum,
       CAST(NULL AS INTEGER) AS width,
       CAST(NULL AS INTEGER) AS height,
       CAST(NULL AS INTEGER) AS n_frames,
       CAST(NULL AS INTEGER) AS sample_rate
FROM documents
UNION ALL
SELECT 'feat' AS variant, doc_id, modality, n_bytes, checksum,
       CAST(CASE WHEN modality IN ('image', 'video')
                 THEN 16 + seed % 4080 END AS INTEGER) AS width,
       CAST(CASE WHEN modality IN ('image', 'video')
                 THEN 16 + (seed >> 12) % 2144 END AS INTEGER) AS height,
       CAST(CASE WHEN modality = 'video' THEN 1 + (seed >> 4) % 7200
                 WHEN modality = 'image' THEN 1 END AS INTEGER)
         AS n_frames,
       CAST(CASE WHEN modality = 'audio'
                 THEN 8000 + (seed % 6) * 8000 END AS INTEGER)
         AS sample_rate
FROM (
  SELECT doc_id,
         (['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INTEGER)]
           AS modality,
         CAST(strlen(text) AS BIGINT) AS n_bytes,
         md5(text) AS checksum,
         CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) AS seed
  FROM documents
)
"""


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary decode/feature-extract pipeline (rows-only check).

    Real plumbing (binary column → Arrow-batched mapInPandas → typed
    feature rows); decode stubbed deterministically — codecs absent
    in this container (operators/multimodal.py).
    """
    docs = load_table(spark, sf_dir, "documents")
    return extract_media_features(attach_payload(docs))


def q_near_dup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidates (rows-only; the 100 TB near-dup path).

    Candidate pairs via banded min-hash signatures; engine-specific
    hashing (xxhash64) makes this non-oracle-expressible. Recall vs
    the exact-Jaccard baseline is unit-tested.
    """
    docs = load_table(spark, sf_dir, "documents")
    return minhash_candidates(
        docs, id_col="doc_id", text_col="text", num_hashes=16, bands=4
    )


def q_near_dup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs with Hamming <= 3 (rows-only)."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash_candidates(docs, id_col="doc_id", text_col="text")


def _token_plane(text: str) -> "np.ndarray":
    """Deterministic 8×9×3 'bag-of-bigrams' plane at dHash's native
    resolution: each word bigram claims the pixel crc32(bigram) % 72
    (highest-priority claimant wins; RGB from its hash bits).

    Why this shape: the shim must give the perceptual-hash dedup the
    structure a real image corpus has — duplicate texts byte-identical,
    near-dup texts (single-token edits, the fixture's actual near-dup
    mode) within a couple of dHash bits, unrelated texts far. Byte
    tiling fails the middle case (any edit shifts every downstream
    pixel) and unigram presence fails the last (the fixture vocabulary
    is small, so unrelated docs share most words); bigrams are
    order-sensitive enough to separate. Measured on sf0.01: near-dup
    pairs at Hamming 0-2, unrelated median 29, none <= 3."""
    import zlib

    import numpy as np

    toks = str(text).split()
    val = np.zeros((72, 3), np.uint8)
    if len(toks) >= 2:
        # vectorized winner-per-pixel (r11 optimization, guide §4.2):
        # the original per-bigram loop did scalar numpy indexing per
        # bigram (~1M interpreted iterations per 5k-doc corpus across
        # the four render shims). Selection semantics preserved
        # exactly: winner = max priority per pixel, FIRST bigram on
        # priority ties (`p > pr[pos]` never replaced an equal p) —
        # lexsort (pos asc, p desc, index asc) + first-row-per-pos.
        hs = np.fromiter(
            (
                zlib.crc32(f"{toks[i]} {toks[i + 1]}".encode("utf-8"))
                for i in range(len(toks) - 1)
            ),
            dtype=np.int64,
            count=len(toks) - 1,
        )
        pos = hs % 72
        # unsigned wrap keeps the low 31 bits exact — identical to the
        # unbounded python-int product masked to 31 bits
        p = (
            (hs.astype(np.uint64) * np.uint64(0x9E3779B1))
            & np.uint64(0x7FFFFFFF)
        ).astype(np.int64)
        order = np.lexsort((np.arange(hs.size), -p, pos))
        spos = pos[order]
        first = np.ones(spos.size, bool)
        first[1:] = spos[1:] != spos[:-1]
        win = order[first]
        wpos, wh = pos[win], hs[win]
        val[wpos, 0] = (wh >> 8) & 255
        val[wpos, 1] = (wh >> 16) & 255
        val[wpos, 2] = (wh >> 24) & 255
    return val.reshape(8, 9, 3)


def _render_doc_bmps(docs: DataFrame) -> DataFrame:
    """Deterministic 16×16 BMP per document (the binary shim for
    driver data — real pipelines land image payloads via binaryFile):
    the token-presence plane of :func:`_token_plane`, so duplicate/
    near-dup texts become identical/near-identical images and the
    perceptual-hash dedup has real duplicate structure to find."""
    from collections.abc import Iterator

    import pandas as pd

    def _render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..operators.media_codec import encode_bmp

        for pdf in batches:
            rows = [
                (int(did), encode_bmp(_token_plane(text)))
                for did, text in zip(pdf["doc_id"], pdf["text"])
            ]
            yield pd.DataFrame(rows, columns=["doc_id", "content"])

    return docs.select("doc_id", "text").mapInPandas(
        _render, schema="doc_id bigint, content binary"
    )


def q_near_dup_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'image' variant: perceptual-hash image near-dups
    (operators/image_hash.py) — dHash over per-doc rendered BMPs,
    SimHash-style pigeonhole banding, Hamming <= 3 verify. Rows-only
    (the hash is a decode-dependent UDF); exact-recall-vs-brute-force
    is unit-tested."""
    from ..operators.image_hash import image_hashes, near_dup_image_pairs

    # spread before the opaque Arrow render: a one-file local scan
    # would otherwise run the whole per-doc render+decode on ONE core
    # (r11 optimization, guide §2.5 input skew; no-op at real scale)
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    hashes = image_hashes(_render_doc_bmps(docs))
    return near_dup_image_pairs(hashes, max_hamming=3)


def _plane_pcm(text: str) -> "np.ndarray":
    """Deterministic int16 PCM clip whose acoustic fingerprint tracks
    the document's bigram plane: 9 audio frames (one per plane
    column), each a mix of the 7 usable log-band center tones whose
    amplitudes encode the column's gray pixels (plus a per-cell base
    offset so adjacent-frame band energies never tie — delta signs
    stay noise-proof). Near-dup texts change a few pixels → a few
    delta-sign bits; unrelated texts differ across the grid — the
    same separation the image render has, measured on sf0.01:
    near-dups Hamming 0-2, unrelated median 24, none <= 3. (The old
    byte-tiled PCM had no such structure: 3 of its 4 sf0.01 pairs
    were unrelated-doc collisions and true near-dups were missed.)"""
    import numpy as np

    plane = _token_plane(text)
    r, g, b = (plane[:, :, i].astype(np.uint32) for i in range(3))
    gray = ((r * 299 + g * 587 + b * 114) // 1000).astype(np.int64)
    tones = _band_tones()  # [7, L] doc-independent, cached
    # amp[b, c] = 12*gray + per-cell base; frames stack along axis 1
    bb = np.arange(7)[:, None]
    cc = np.arange(9)[None, :]
    amp = 12 * gray[:7, :] + 50 + 17 * ((3 * bb + 5 * cc) % 13)
    # [7, 9] x [7, L] -> per-frame mixes [9, L] in one matmul
    pcm = (amp.astype(np.float64).T @ tones).reshape(-1)
    return np.clip(np.round(pcm), -32768, 32767).astype(np.int16)


_TONES_CACHE: dict[int, "np.ndarray"] = {}


def _band_tones() -> "np.ndarray":
    """[7, 227] unit sine table at the 7 usable log-band center bins —
    the same edge layout audio_fp64 derives for 227-sample frames (its
    8th band is the empty [113,114) slice: constant-zero bits by
    design). Doc-independent; computed once per process."""
    import numpy as np

    if 0 not in _TONES_CACHE:
        L = 227
        m = L // 2
        edges = np.unique(np.geomspace(1, m, 9).astype(int))
        edges[0] = 0
        while edges.size < 9:
            edges = np.unique(np.append(edges, edges[-1] + 1))
        centers = [(edges[i] + edges[i + 1]) // 2 + 1 for i in range(7)]
        k = np.arange(L)
        _TONES_CACHE[0] = np.stack(
            [np.sin(2 * np.pi * c * k / L) for c in centers]
        )
    return _TONES_CACHE[0]


def _render_doc_wavs(docs: DataFrame) -> DataFrame:
    """Deterministic 8 kHz PCM clip per document (the audio twin of
    _render_doc_bmps): the bigram-plane band mix of :func:`_plane_pcm`,
    so duplicate/near-dup texts become identical/near-identical clips
    for the acoustic-fingerprint dedup to find."""
    from collections.abc import Iterator

    import pandas as pd

    def _render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..operators.media_codec import encode_wav

        for pdf in batches:
            rows = [
                (int(did), encode_wav(_plane_pcm(text), 8000))
                for did, text in zip(pdf["doc_id"], pdf["text"])
            ]
            yield pd.DataFrame(rows, columns=["doc_id", "content"])

    return docs.select("doc_id", "text").mapInPandas(
        _render, schema="doc_id bigint, content binary"
    )


def q_near_dup_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'audio' variant: acoustic-fingerprint near-dups
    (operators/audio_hash.py) — Haitsma-Kalker-style spectral-delta
    signs over per-doc rendered PCM clips, shared Hamming-banded
    pairing, distance <= 3. Rows-only (FFT UDF)."""
    from ..operators.audio_hash import (
        audio_fingerprints,
        near_dup_audio_pairs,
    )

    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    fps = audio_fingerprints(_render_doc_wavs(docs))
    return near_dup_audio_pairs(fps, max_hamming=3)


def _render_doc_clips(docs: DataFrame) -> DataFrame:
    """Deterministic 6-frame 8×9 BMPS clip per document (the video
    twin of _render_doc_bmps): a mostly-static scene — every frame is
    the document's bigram plane with one frame-indexed marker pixel
    (frames differ, content doesn't), so duplicate/near-dup texts
    become identical/near-identical clips and the majority-vote clip
    fingerprint keeps the plane's duplicate structure. (Rolling the
    plane per frame degenerates: the majority over unrelated rolled
    dHashes saturates every bit the same way for every doc.)"""
    from collections.abc import Iterator

    import pandas as pd

    def _render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..operators.media_codec import encode_bmps

        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                plane = _token_plane(text)
                frames = []
                for i in range(6):
                    fr = plane.copy()
                    fr[i % 8, 8] = (255, 128 + 16 * i, 32 * i)
                    frames.append(fr)
                rows.append((int(did), encode_bmps(frames, fps=6)))
            yield pd.DataFrame(rows, columns=["doc_id", "content"])

    return docs.select("doc_id", "text").mapInPandas(
        _render, schema="doc_id bigint, content binary"
    )


def q_near_dup_video(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'video' variant: clip-fingerprint near-dups
    (operators/image_hash.py::video_fp64 — per-bit majority over
    sampled frame dHashes) over per-doc rendered BMPS clips, shared
    Hamming-banded pairing, distance <= 3. Rows-only (decode UDF);
    container-invariance and frame-rate robustness are unit-tested."""
    from ..operators.image_hash import (
        hamming_banded_pairs,
        video_fingerprints,
    )

    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    fps = video_fingerprints(_render_doc_clips(docs))
    return hamming_banded_pairs(fps, hash_col="fp", max_hamming=3)


_INCR_BATCH_IDS = 50


def q_near_dup_incr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'incr' variant: INCREMENTAL perceptual dedup — the first
    _INCR_BATCH_IDS doc ids act as a new batch probing the signature
    index built from the rest of the corpus
    (operators/incremental.py::hamming_signature_index /
    hamming_against_index: exact-hit short-circuit + posting-capped
    banded probe; the corpus is never re-hashed per batch). Output
    (id_a = batch doc, id_b = corpus signature rep, hamming).
    Rows-only (decode UDF); index/self-join equivalence, degenerate
    collapse and hot-posting caps are unit-tested.

    Render-pass discipline (r11 optimization): the corpus/batch split
    happens on ``documents`` BEFORE the render — a ``doc_id`` filter
    cannot push below the opaque ``mapInPandas`` render+decode pass
    (guide §4.1), so splitting the HASHES frame re-rendered the whole
    corpus per branch; worse, ``hamming_against_index`` references its
    batch side twice (exact + banded) and the index twice (exact +
    posting lists), so one action ran FOUR full-corpus render+decode
    passes (plan-counted: 4 MapInPandas-pair subtrees). Now each doc
    renders exactly once (its own side), and both the signature index
    and the batch hashes are checkpointed so the double references
    re-read bounded materialized rows instead of re-decoding.
    ``eager=True`` on both checkpoints (r12, ADVICE r11): in
    reliable-checkpoint mode (``SPARK_GRAFT_CHECKPOINT_DIR`` set) a
    NON-eager ``Dataset.checkpoint`` computes the unpersisted subtree
    once for the first job and again for the checkpoint write — two
    extra full render passes on a cluster; eager materialization pins
    the single-render guarantee in both modes (localCheckpoint does
    the same total work either way)."""
    from ..functions.checkpointing import stable_checkpoint
    from ..operators.image_hash import image_hashes
    from ..operators.incremental import (
        hamming_against_index,
        hamming_signature_index,
    )

    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    corpus = image_hashes(
        _render_doc_bmps(docs.where(F.col("doc_id") >= _INCR_BATCH_IDS))
    )
    batch = stable_checkpoint(
        image_hashes(
            _render_doc_bmps(docs.where(F.col("doc_id") < _INCR_BATCH_IDS))
        ),
        eager=True,
    )
    links = hamming_against_index(
        batch,
        stable_checkpoint(hamming_signature_index(corpus), eager=True),
        max_hamming=3,
    )
    return links.select(
        F.col("batch_id").alias("id_a"),
        F.col("corpus_rep").alias("id_b"),
        "hamming",
    )


_CRAWL_PARTS = 4  # archives per epoch (one .warc.gz per partition)


def q_crawl_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'crawl' variant: the streaming crawl-ingestion state machine
    (streaming/crawl.py) replayed as a deterministic two-epoch batch
    sequence (VERDICT r8 Next #3 — the 'admit' pattern). Documents
    are templated into HTML, archived as real WARC/1.0 gzip files,
    then epoch 1 (even doc_ids) and epoch 2 (odd doc_ids) run the
    REAL ``crawl_admission_batch``: WARC parse → main-text extraction
    → left-anti admission against the prior epochs' content-hash
    index → min-doc_id within-epoch collapse → epoch-dir landing +
    index growth. One fixed scratch dir is wiped at entry, so every
    run replays from empty; the returned rows are eagerly
    local-checkpointed so they outlive the next invocation's wipe.

    The fixture corpus has no exact duplicates, so the crawl clones
    content deterministically by doc_id decade slice (m = doc_id%10):
    m=8 docs carry m=2's text (a WITHIN-epoch-1 dup → min-id
    collapse), m=7 docs carry m=0's (a CROSS-epoch dup → epoch 2's
    left-anti rejection against the persisted index), m=9 docs carry
    m=1's (within-epoch-2 collapse) — every admission path lands (or
    deterministically doesn't land) driver rows. Rows-only by design
    (filesystem side effects). Columns: id_a = admitted doc_id,
    id_b = md5-nibble int64 of the landed content_hash (pins
    extraction + normalization byte-for-byte), hamming = epoch."""
    from ..session import scratch_dir
    from ..sources.warc import write_warc_files
    from ..streaming.crawl import crawl_admission_batch

    raw = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    m = F.col("doc_id") % 10
    src = (
        F.when(m == 7, F.col("doc_id") - 7)
        .when(m == 8, F.col("doc_id") - 6)
        .when(m == 9, F.col("doc_id") - 8)
        .otherwise(F.col("doc_id"))
    )
    docs = (
        raw.select("doc_id", "text", src.alias("__src"))
        .join(
            raw.select(
                F.col("doc_id").alias("__src"),
                F.col("text").alias("__src_text"),
            ),
            "__src",
            "left",
        )
        .select(
            "doc_id",
            F.coalesce("__src_text", "text").alias("text"),
        )
        # both epoch WARC writes template from this same clone join;
        # persist so the self-join runs once, not once per epoch
        .persist()
    )
    esc = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), "&", "&amp;"), "<", "&lt;"
        ),
        ">",
        "&gt;",
    )
    # ONE fixed scratch dir; scratch_dir wipes it at entry (ADVICE
    # r10: the previous counter-suffix scheme deleted the PRIOR
    # invocation's dir at plan-BUILD time, a latent FileNotFound for
    # any caller holding an unmaterialized prior DataFrame). The wipe
    # is safe because the DataFrame this function RETURNS is eagerly
    # local-checkpointed below — it carries no on-disk dependency, so
    # a held result from a previous invocation survives this
    # invocation's wipe. The wipe itself is required for replay
    # determinism: epoch 1's admission reads every OTHER epoch index
    # dir, so a stale epoch=2 index from the prior invocation would
    # wrongly reject epoch 1's batch. Sequential invocations per
    # session (bench best_of, check_oracle, the merged entry) — not
    # safe for concurrent calls, which would race on the shared dir.
    base = scratch_dir(spark, "crawl_admit")
    out = []
    for epoch in (1, 2):
        pages = docs.where(F.col("doc_id") % 2 == epoch - 1).select(
            "doc_id",
            F.concat(
                F.lit("http://c.example/d/"),
                F.col("doc_id").cast("string"),
            ).alias("url"),
            F.concat(
                F.lit("<html><head><title>d"),
                F.col("doc_id").cast("string"),
                F.lit("</title></head><body><p>"),
                esc,
                F.lit("</p></body></html>"),
            ).alias("html"),
        ).repartition(
            max(_CRAWL_PARTS, spark.sparkContext.defaultParallelism)
        )  # one archive per core: scan parallelism IS the file count
        man = write_warc_files(pages, f"{base}/arc{epoch}").collect()
        admitted = crawl_admission_batch(
            spark,
            [r["file"] for r in man],
            out_dir=f"{base}/out",
            idx_dir=f"{base}/idx",
            epoch_id=epoch,
        )
        out.append(
            admitted.select(
                F.col("doc_id").alias("id_a"),
                F.conv(F.substring("content_hash", 1, 15), 16, 10)
                .cast("bigint")
                .alias("id_b"),
                F.lit(epoch).cast("int").alias("hamming"),
            )
        )
    docs.unpersist()
    # eager localCheckpoint: the returned rows live in executor
    # storage, not the scratch parquet — the next invocation's wipe
    # cannot invalidate a held result (tiny: admitted ids only)
    return out[0].unionByName(out[1]).localCheckpoint(eager=True)


def q_near_dup_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH + SimHash + perceptual-image-hash +
    acoustic-fingerprint + video-clip-fingerprint candidate
    generators in one union-tagged entry (driver cap: the correctness
    gate records at most 50 registry entries). variant 'minhash' has
    no distance column; 'simhash'/'image'/'audio'/'video' carry the
    Hamming distance; 'crawl' is the two-epoch crawl-admission replay
    (id_b = content-hash int, hamming = epoch). All banded equi-joins with identical-signature
    collapse and a hot-band cap — no all-pairs stage and no
    degenerate-mass blowup (operators/dedup.py, image_hash.py,
    audio_hash.py)."""
    mh = q_near_dup_minhash(spark, sf_dir).select(
        F.lit("minhash").alias("variant"),
        "id_a",
        "id_b",
        F.lit(None).cast("int").alias("hamming"),
    )
    sh = q_near_dup_simhash(spark, sf_dir).select(
        F.lit("simhash").alias("variant"),
        "id_a",
        "id_b",
        F.col("hamming").cast("int").alias("hamming"),
    )
    im = q_near_dup_images(spark, sf_dir).select(
        F.lit("image").alias("variant"),
        "id_a",
        "id_b",
        F.col("hamming").cast("int").alias("hamming"),
    )
    au = q_near_dup_audio(spark, sf_dir).select(
        F.lit("audio").alias("variant"),
        "id_a",
        "id_b",
        F.col("hamming").cast("int").alias("hamming"),
    )
    vi = q_near_dup_video(spark, sf_dir).select(
        F.lit("video").alias("variant"),
        "id_a",
        "id_b",
        F.col("hamming").cast("int").alias("hamming"),
    )
    inc = q_near_dup_incr(spark, sf_dir).select(
        F.lit("incr").alias("variant"),
        "id_a",
        "id_b",
        F.col("hamming").cast("int").alias("hamming"),
    )
    cr = q_crawl_admission(spark, sf_dir).select(
        F.lit("crawl").alias("variant"),
        "id_a",
        "id_b",
        F.col("hamming").cast("int").alias("hamming"),
    )
    return (
        mh.unionByName(sh)
        .unionByName(im)
        .unionByName(au)
        .unionByName(vi)
        .unionByName(inc)
        .unionByName(cr)
    )


QUERIES: dict[str, Q] = {
    "multimodal_meta": Q(
        q_multimodal_meta_merged,
        _META_SQL,
        variants={
            "meta": q_multimodal_meta,
            "feat": q_multimodal_fake_features,
        },
    ),
    "multimodal_features": Q(q_multimodal_features, None),
    "near_dup_hash": Q(
        q_near_dup_hash,
        None,
        variants={
            "minhash": q_near_dup_minhash,
            "simhash": q_near_dup_simhash,
            "image": q_near_dup_images,
            "audio": q_near_dup_audio,
            "video": q_near_dup_video,
            "incr": q_near_dup_incr,
            "crawl": q_crawl_admission,
        },
    ),
}
