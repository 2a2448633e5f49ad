"""Synthetic-signature twins of the Hamming-banded pairing plan
(queries/signatures.py): the REAL operators vs an independent
brute-force reimplementation, plus the two-epoch admission replay."""

from __future__ import annotations

from collections import defaultdict

from conftest import SF_SMOKE

CHUNKS = 4
WIDTH = 16
MAXH = 3
MAXPOST = 8


def _collect_sigs(spark):
    from accounting_etl_spark.queries.signatures import (
        synthetic_signatures,
    )

    return [
        (r["doc_id"], r["sig"])
        for r in synthetic_signatures(spark, SF_SMOKE).collect()
    ]


def _bands(sig: int):
    return [
        (c, (sig >> (c * WIDTH)) & ((1 << WIDTH) - 1)) for c in range(CHUNKS)
    ]


def _brute_pairs(sig_rows):
    """Independent reimplementation of hamming_banded_pairs:
    collapse → band → eligibility [2, cap] → all-pairs → verify."""
    bysig = defaultdict(list)
    for did, sig in sig_rows:
        bysig[sig].append(did)
    zero, reps = [], []
    for sig, ids in bysig.items():
        ids.sort()
        reps.append((ids[0], sig))
        zero += [(ids[0], i, 0) for i in ids[1:]]
    postings = defaultdict(list)
    for rid, sig in reps:
        for b in _bands(sig):
            postings[b].append((rid, sig))
    pairs = {}
    for members in postings.values():
        if not 2 <= len(members) <= MAXPOST:
            continue
        members.sort()
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                (ia, sa), (ib, sb) = members[i], members[j]
                h = (sa ^ sb).bit_count()
                if h <= MAXH:
                    pairs[(ia, ib)] = h
    return set(zero) | {(a, b, h) for (a, b), h in pairs.items()}


def test_hbp_matches_bruteforce(spark):
    from accounting_etl_spark.queries.signatures import q_hbp_synth

    got = {
        (r["doc_a"], r["doc_b"], r["inter"])
        for r in q_hbp_synth(spark, SF_SMOKE).collect()
    }
    assert got == _brute_pairs(_collect_sigs(spark))


def test_hbp_planted_structure(spark):
    """The constructed slices land where designed: per family f the
    m0/m1 identical group collapses to a star pair at distance 0, the
    1-flip member pairs at 1, the 3-flip member at 3, flips 1 vs 3 at
    2 — and the 5-flip member never pairs with the base (distance 5
    candidates are generated through shared bands but fail verify)."""
    from accounting_etl_spark.queries.signatures import q_hbp_synth

    got = {
        (r["doc_a"], r["doc_b"]): r["inter"]
        for r in q_hbp_synth(spark, SF_SMOKE).collect()
    }
    n_docs = len(_collect_sigs(spark))
    for f in range(n_docs // 10):
        b = 10 * f
        assert got[(b, b + 1)] == 0
        assert got[(b, b + 2)] == 1
        assert got[(b, b + 3)] == 3
        assert got[(b + 2, b + 3)] == 2
        assert (b, b + 4) not in got
    assert all(h <= MAXH for h in got.values())


def test_hot_band_audit_reports_skipped_band(spark):
    """Half the corpus hashes into band (0, 0) by construction — the
    audit reports exactly the over-cap bands with their distinct-
    signature mass, and the pairing emitted no pair whose ONLY shared
    band is an audited one."""
    from accounting_etl_spark.queries.signatures import (
        q_hot_band_audit_synth,
    )

    sig_rows = _collect_sigs(spark)
    per_band = defaultdict(set)
    for _, sig in sig_rows:
        for b in _bands(sig):
            per_band[b].add(sig)
    expected = {
        (c, v, len(sigs))
        for (c, v), sigs in per_band.items()
        if len(sigs) > MAXPOST
    }
    got = {
        (r["doc_a"], r["doc_b"], r["inter"])
        for r in q_hot_band_audit_synth(spark, SF_SMOKE).collect()
    }
    assert got == expected
    hot = {sig for did, sig in sig_rows if did % 10 >= 5}
    assert (0, 0, len(hot)) in got


def _brute_admission(sig_rows):
    """Independent two-epoch admission replay: epoch 1 = even ids vs
    an empty index, epoch 2 = odd ids vs epoch 1's admissions."""
    admitted = {}  # sig -> (rep_id, n_members, epoch)
    for epoch in (1, 2):
        batch = [(d, s) for d, s in sig_rows if d % 2 == epoch - 1]
        bysig = defaultdict(list)
        for d, s in batch:
            bysig[s].append(d)
        reps = sorted((min(ids), s) for s, ids in bysig.items())
        # index probe: exact hit, then banded near hit against the
        # posting-capped index band lists (rank by (rep_id, sig))
        idx_bands = defaultdict(list)
        for s, (rid, _n, _e) in admitted.items():
            for b in _bands(s):
                idx_bands[b].append((rid, s))
        for b in idx_bands:
            idx_bands[b] = sorted(idx_bands[b])[:MAXPOST]
        dropped = set()
        for rid, s in reps:
            if s in admitted:
                dropped.add(rid)
                continue
            for b in _bands(s):
                if any(
                    1 <= (s ^ isig).bit_count() <= MAXH
                    for _ir, isig in idx_bands.get(b, [])
                ):
                    dropped.add(rid)
                    break
        # within-batch greedy drop: id_b of any banded verified pair
        for a, b, h in _brute_pairs(batch):
            if 1 <= h <= MAXH:
                dropped.add(b)
        for rid, s in reps:
            if rid not in dropped:
                admitted[s] = (rid, len(bysig[s]), epoch)
    return {
        (rid, s, n, e) for s, (rid, n, e) in admitted.items()
    }


def test_admission_two_epochs_match_bruteforce(spark):
    from accounting_etl_spark.queries.signatures import q_admission_synth

    got = {
        (r["doc_a"], r["doc_b"], r["inter"], r["denom"])
        for r in q_admission_synth(spark, SF_SMOKE).collect()
    }
    assert got == _brute_admission(_collect_sigs(spark))
    # construction invariants: epoch 1 admits the family base + the
    # 5-flip member + the even hot slice; epoch 2 rejects the exact
    # base duplicate and the 3-flip near-dup, admitting only hot odds
    e1 = {a for a, _s, _n, e in got if e == 1}
    e2 = {a for a, _s, _n, e in got if e == 2}
    n_docs = len(_collect_sigs(spark))
    for f in range(n_docs // 10):
        assert 10 * f in e1 and 10 * f + 4 in e1
        assert 10 * f + 2 not in e1  # within-batch 1-flip drop
        assert 10 * f + 1 not in e2  # exact hit on the indexed base
        assert 10 * f + 3 not in e2  # banded near hit at distance 3
    assert all(a % 2 == 0 for a in e1) and all(a % 2 == 1 for a in e2)


def test_admission_replay_is_deterministic(spark):
    """A re-invocation (the bench re-runs variants) wipes the scratch
    index and replays the identical from-empty sequence."""
    from accounting_etl_spark.queries.signatures import q_admission_synth

    first = sorted(map(tuple, q_admission_synth(spark, SF_SMOKE).collect()))
    again = sorted(map(tuple, q_admission_synth(spark, SF_SMOKE).collect()))
    assert first == again and len(first) > 0


def test_hbp_chunked_expansion_invariance(spark):
    """max_bucket=3 forces multi-chunk pair expansion; the pair set
    must be identical to the single-chunk run (the 'hbpc' driver
    variant pins the same invariance through the DuckDB oracle)."""
    from accounting_etl_spark.queries.signatures import (
        q_hbp_chunked_synth,
        q_hbp_synth,
    )

    a = sorted(map(tuple, q_hbp_synth(spark, SF_SMOKE).collect()))
    b = sorted(map(tuple, q_hbp_chunked_synth(spark, SF_SMOKE).collect()))
    assert a == b and len(a) > 0


def _brute_pairs_param(sig_rows, *, chunks, maxh, maxpost):
    """Parameterized brute model (unsigned 64-bit domain)."""
    width = 64 // chunks
    mask = (1 << width) - 1
    u = lambda s: s & ((1 << 64) - 1)  # noqa: E731
    bysig = defaultdict(list)
    for did, sig in sig_rows:
        bysig[sig].append(did)
    zero, reps = [], []
    for sig, ids in bysig.items():
        ids.sort()
        reps.append((ids[0], sig))
        zero += [(ids[0], i, 0) for i in ids[1:]]
    postings = defaultdict(list)
    for rid, sig in reps:
        for c in range(chunks):
            postings[(c, (u(sig) >> (c * width)) & mask)].append((rid, sig))
    pairs = {}
    for members in postings.values():
        if not 2 <= len(members) <= maxpost:
            continue
        members.sort()
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                (ia, sa), (ib, sb) = members[i], members[j]
                h = (u(sa) ^ u(sb)).bit_count()
                if h <= maxh:
                    pairs[(ia, ib)] = h
    return set(zero) | {(a, b, h) for (a, b), h in pairs.items()}


import random as _random

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=5, deadline=None)
@given(seed=st.integers(0, 2**31))
def test_banded_pairs_random_signatures_match_brute(spark, seed):
    """The REAL hamming_banded_pairs equals the brute model on RANDOM
    signature multisets and RANDOM (chunks, max_hamming, max_posting,
    max_bucket) — generalizes the planted-construction tests: random
    cluster structure incl. identical-signature groups, negative
    int64 signatures (sign-bit chunks), caps that engage mid-list,
    and bucket chunking that splits postings."""
    from accounting_etl_spark.operators.image_hash import (
        hamming_banded_pairs,
    )

    rng = _random.Random(seed)
    chunks = rng.choice([4, 8])
    maxh = rng.randint(1, chunks - 1)
    maxpost = rng.randint(2, 10)
    max_bucket = rng.choice([2, 3, 256])
    rows, seen = [], []
    for i in range(60):
        if i % 7 == 0 or not seen:
            s = rng.getrandbits(64)
        else:
            s = rng.choice(seen)
            for _ in range(rng.randint(0, maxh + 2)):
                s ^= 1 << rng.randrange(64)
        seen.append(s)
        rows.append((i, s - (1 << 64) if s >= 1 << 63 else s))
    df = spark.createDataFrame(rows, "doc_id long, sig long")
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in hamming_banded_pairs(
            df,
            hash_col="sig",
            max_hamming=maxh,
            chunks=chunks,
            max_bucket=max_bucket,
            max_posting=maxpost,
        ).collect()
    }
    assert got == _brute_pairs_param(
        rows, chunks=chunks, maxh=maxh, maxpost=maxpost
    )
