"""Property-based tests (SURVEY §5.4, hypothesis): invariances the
oracle can't observe — input-order independence, row-offset jitter
within the clustering tolerance, salting equivalence, sessionize vs
a python reference model.
"""

from __future__ import annotations

import random

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from accounting_etl_spark.plans import fixtures as FX


def _base_output(spark):
    from accounting_etl_spark.plans.statement import extract_transactions

    out = extract_transactions(FX.words_df(spark))
    return sorted(
        (r.src_path, r.page, r.stmt_date_str, r.description, r.amount)
        for r in out.collect()
    )


@settings(max_examples=5, deadline=None)
@given(seed=st.integers(0, 2**31))
def test_statement_invariant_under_shuffle_and_row_jitter(spark, seed):
    """Shuffling input row order and shifting whole rows by a uniform
    offset < (gap - row span) must not change the parse (mirrors the
    3pt clustering tolerance, reference pdf_parser.py:271)."""
    from accounting_etl_spark.plans.statement import extract_transactions

    rng = random.Random(seed)
    # group fixture words into visual rows by (path, page, int(top/15))
    # — the fixture's rows are >=14pt apart, spans <=2.1pt, so a
    # ±0.4pt whole-row offset stays well inside the tolerance
    jitter: dict[tuple, float] = {}
    rows = []
    for (path, page, text, x0, x1, top, bottom) in FX.WORDS_ROWS:
        key = (path, page, round(top / 15))
        if key not in jitter:
            jitter[key] = rng.uniform(-0.4, 0.4)
        d = jitter[key]
        rows.append((path, page, text, x0, x1, top + d, bottom + d))
    rng.shuffle(rows)

    out = extract_transactions(
        spark.createDataFrame(rows, FX.WORDS_DDL)
    )
    got = sorted(
        (r.src_path, r.page, r.stmt_date_str, r.description, r.amount)
        for r in out.collect()
    )
    assert got == _base_output(spark)


@settings(max_examples=10, deadline=None)
@given(
    gaps=st.lists(st.floats(0.1, 10.0, allow_nan=False), min_size=1, max_size=40),
    threshold=st.floats(1.0, 5.0, allow_nan=False),
)
def test_sessionize_matches_python_model(spark, gaps, threshold):
    """Lag-based sessionize == the obvious sequential model."""
    from accounting_etl_spark.operators.sessionize import sessionize

    xs = []
    acc = 0.0
    for g in gaps:
        acc += g
        xs.append(acc)
    df = spark.createDataFrame(
        [(1, i, x) for i, x in enumerate(xs)], "k int, i int, x double"
    )
    out = sessionize(df, ["k"], "x", threshold, tiebreak_cols=["i"])
    got = [r.session_id for r in out.orderBy("i").collect()]

    # the model must diff the accumulated positions exactly as the
    # operator does — (acc+g)-acc != g in floats, and hypothesis finds
    # gaps within an ulp of the threshold
    expected, sid = [], 0
    for j in range(len(xs)):
        if j > 0 and xs[j] - xs[j - 1] >= threshold:
            sid += 1
        expected.append(sid)
    assert got == expected


def test_salted_agg_equals_plain_agg(spark):
    from accounting_etl_spark.operators.salting import salted_agg
    from accounting_etl_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    li = load_table(spark, SF_SMOKE, "lineitem").withColumn(
        "qty_dec", F.col("l_quantity").cast("decimal(12,2)")
    )
    salted = salted_agg(
        li,
        ["l_returnflag"],
        [
            ("total_qty", "sum", "qty_dec"),
            ("n", "count", "l_orderkey"),
            ("min_qty", "min", "qty_dec"),
            ("max_qty", "max", "qty_dec"),
        ],
        num_salts=8,
    ).toPandas().set_index("l_returnflag").sort_index()
    plain = (
        li.groupBy("l_returnflag")
        .agg(
            F.sum("qty_dec").alias("total_qty"),
            F.count("l_orderkey").alias("n"),
            F.min("qty_dec").alias("min_qty"),
            F.max("qty_dec").alias("max_qty"),
        )
        .toPandas()
        .set_index("l_returnflag")
        .sort_index()
    )
    assert (salted["total_qty"] == plain["total_qty"]).all()
    assert (salted["n"] == plain["n"]).all()
    assert (salted["min_qty"] == plain["min_qty"]).all()
    assert (salted["max_qty"] == plain["max_qty"]).all()


def test_salted_agg_rejects_non_decomposable(spark):
    import pytest

    from accounting_etl_spark.operators.salting import salted_agg
    from accounting_etl_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    li = load_table(spark, SF_SMOKE, "lineitem")
    with pytest.raises(ValueError, match="non-decomposable"):
        salted_agg(li, ["l_returnflag"], [("x", "avg", "l_quantity")])


@settings(max_examples=5, deadline=None)
@given(seed=st.integers(0, 2**31))
def test_coa_random_grids_match_python_model(spark, seed):
    """Random COA grids (noisy headers, junk rows, dup codes, empty
    cells) must extract exactly what a sequential model of the
    reference's logic (pdf_parser.py:406-512) extracts."""
    import re

    from accounting_etl_spark.plans.coa import extract_codes

    rng = random.Random(seed)
    header_pool = {
        "funder": ["FUNDER CODE", "Funder"],
        "gl": ["EXP/GL CODE", "GL CODE"],
        "location": ["LOC CODE", "LOCATION CODE"],
        "program": ["PROG CODE", "PROGRAM CODE"],
        "dept": ["DEPT CODE", "DEPARTMENT CODE"],
    }
    code_gen = {
        "funder": lambda: str(rng.randint(1000, 9999)),
        "gl": lambda: str(rng.randint(10000, 99999)),
        "location": lambda: f"{rng.randint(0, 99):02d}",
        "program": lambda: str(rng.randint(0, 999)),
        "dept": lambda: str(rng.randint(0, 999)),
    }
    gates = {
        "funder": r"^\d{4}$", "gl": r"^\d{5}$", "location": r"^\d{2}$",
        "program": r"^\d+$", "dept": r"^\d+$",
    }
    rows = []
    for page in range(1, 3):
        for tbl in range(3):
            ctype = rng.choice(list(header_pool))
            classified = rng.random() < 0.8
            hdr = (
                [rng.choice(header_pool[ctype]), "NAME"]
                if classified
                else ["MISC", "STUFF"]
            )
            rows.append(("p.pdf", page, tbl, 0, hdr))
            for ridx in range(1, rng.randint(2, 6)):
                roll = rng.random()
                if roll < 0.2:
                    cells = ["", "Empty"]
                elif roll < 0.3:
                    cells = [code_gen[ctype](), None]
                elif roll < 0.4:
                    cells = ["ABC", "Not Numeric"]
                else:
                    cells = [code_gen[ctype](), f"Name {rng.randint(0, 99)}"]
                rows.append(("p.pdf", page, tbl, ridx, cells))

    # sequential model of the reference logic
    expected: dict[tuple, str] = {}
    for page in range(1, 3):
        for tbl in range(3):
            t_rows = [r for r in rows if r[1] == page and r[2] == tbl]
            ttype = None
            for r in sorted(t_rows, key=lambda r: r[3])[:3]:
                txt = " ".join((c or "").upper() for c in r[4])
                for cand, pats in [
                    ("funder", ["FUNDER"]),
                    ("gl", ["EXP CODE", "GL CODE"]),
                    ("location", ["LOC CODE", "LOCATION CODE"]),
                    ("program", ["PROG CODE", "PROGRAM CODE"]),
                    ("dept", ["DEPT CODE", "DEPARTMENT CODE"]),
                ]:
                    extra = (
                        ("EXP" in txt and "CODE" in txt) if cand == "gl"
                        else ("LOC" in txt and "CODE" in txt) if cand == "location"
                        else ("PROG" in txt and "CODE" in txt) if cand == "program"
                        else ("DEPT" in txt and "CODE" in txt) if cand == "dept"
                        else False
                    )
                    if any(p in txt for p in pats) or extra:
                        ttype = cand
                        break
                if ttype:
                    break
            if not ttype:
                continue
            for r in sorted(t_rows, key=lambda r: r[3]):
                code = (r[4][0] or "").strip()
                name = (r[4][1] or "").strip() if len(r[4]) > 1 else ""
                if not code or not name:
                    continue
                if "CODE" in code.upper() or "CODE" in name.upper():
                    continue
                if re.match(gates[ttype], code):
                    expected[(ttype, code)] = name

    df = spark.createDataFrame(
        rows,
        "path string, page int, table_idx int, row_idx int, cells array<string>",
    )
    got = {(r.code_type, r.code): r.name for r in extract_codes(df).collect()}
    assert got == expected


@settings(max_examples=5, deadline=None)
@given(seed=st.integers(0, 2**31))
def test_two_tier_lookup_random_containment_structures(spark, seed):
    """Random fact/dim universes (exact hits, substring-only hits,
    multi-candidate containment, short keys, total misses): both
    lookup strategies must match the sequential reference model
    (exact equality, else min containing vendor, else miss)."""
    from accounting_etl_spark.operators.lookup_join import two_tier_lookup_join

    rng = random.Random(seed)
    frags = ["al", "bor", "cux", "dee", "eph", "fi", "go", "hy"]

    def word():
        return "".join(rng.choice(frags) for _ in range(rng.randint(1, 3)))

    dims = {}
    for i in range(rng.randint(3, 12)):
        dims[f"{word().upper()} {word()}"] = i
    dim_keys = list(dims)
    facts = []
    for i in range(rng.randint(5, 25)):
        roll = rng.random()
        if roll < 0.25 and dim_keys:  # exact hit
            facts.append((i, rng.choice(dim_keys)))
        elif roll < 0.55 and dim_keys:  # substring of some dim key
            v = rng.choice(dim_keys)
            a = rng.randint(0, max(0, len(v) - 2))
            b = rng.randint(a + 1, len(v))
            facts.append((i, v[a:b]))
        elif roll < 0.65:  # short key (trigram fallback routing)
            facts.append((i, rng.choice("abxz")))
        else:  # random (usually a miss)
            facts.append((i, word()))

    expected = {}
    for fid, fkey in facts:
        if fkey in dims:
            expected[fid] = (fkey, 1)
        else:
            cands = [v for v in dim_keys if fkey.lower() in v.lower()]
            expected[fid] = (min(cands), 2) if cands else (None, 0)

    fact_df = spark.createDataFrame(facts, "fid int, fkey string")
    dim_df = spark.createDataFrame(
        [(k, v) for k, v in dims.items()], "vendor string, ref int"
    )
    for strategy in ("broadcast", "trigram"):
        out = two_tier_lookup_join(
            fact_df,
            dim_df,
            fact_id="fid",
            fact_key="fkey",
            dim_key="vendor",
            dim_cols=["ref"],
            prefilter=strategy,
        )
        got = {r.fid: (r.vendor, r.tier) for r in out.collect()}
        assert got == expected, f"strategy={strategy} seed={seed}"


@settings(max_examples=5, deadline=None)
@given(seed=st.integers(0, 2**31))
def test_asof_join_random_times_match_python_model(spark, seed):
    """Random left/right event times (with duplicate timestamps and
    keys missing on either side): both as-of directions must match the
    obvious sequential model."""
    from accounting_etl_spark.operators.asof import asof_join

    rng = random.Random(seed)
    keys = [1, 2, 3]
    left = [
        (i, rng.choice(keys + [9]), rng.randint(0, 50))
        for i in range(rng.randint(3, 20))
    ]
    right = [
        (100 + j, rng.choice(keys), rng.randint(0, 50))
        for j in range(rng.randint(0, 15))
    ]

    def model(direction):
        out = {}
        for lid, k, lt in left:
            cands = [(rid, rt) for rid, rk, rt in right if rk == k]
            if direction == "backward":
                cands = [c for c in cands if c[1] <= lt]
                # max time, then max tiebreak (rid)
                pick = max(cands, key=lambda c: (c[1], c[0])) if cands else None
            else:
                if cands:
                    best = min(abs(rt - lt) for _, rt in cands)
                    tied = [c for c in cands if abs(c[1] - lt) == best]
                    back = [c for c in tied if c[1] <= lt]
                    pool = back if back else tied
                    # backward ties: max rid; forward ties: min rid
                    pick = (
                        max(pool, key=lambda c: c[0])
                        if back
                        else min(pool, key=lambda c: c[0])
                    )
                else:
                    pick = None
            out[lid] = pick[0] if pick else None
        return out

    ldf = spark.createDataFrame(left, "lid int, k int, t bigint")
    rdf = spark.createDataFrame(right, "rid int, k int, t bigint")
    for direction in ("backward", "nearest"):
        got = {
            r.lid: r.rid
            for r in asof_join(
                ldf.select("lid", "k", "t"),
                rdf,
                on="k",
                left_time="t",
                right_time="t",
                payload=["rid"],
                tiebreak=["rid"],
                direction=direction,
            ).collect()
        }
        assert got == model(direction), f"direction={direction} seed={seed}"


@settings(max_examples=5, deadline=None)
@given(seed=st.integers(0, 2**31))
def test_range_self_join_matches_brute_force(spark, seed):
    """Bucketized range self-join == brute-force O(n²) model on random
    timelines, including bucket-boundary-straddling pairs."""
    from accounting_etl_spark.operators.range_join import range_self_join

    rng = random.Random(seed)
    window = rng.choice([7, 10, 100])
    rows = [
        (rng.randint(1, 3), i, rng.randint(0, 40 * window))
        for i in range(rng.randint(2, 40))
    ]
    expected = {
        (ka, ia, ib, tb - ta)
        for (ka, ia, ta) in rows
        for (kb, ib, tb) in rows
        if ka == kb and ia < ib and abs(tb - ta) <= window
    }
    df = spark.createDataFrame(rows, "k int, eid bigint, t bigint")
    got = sorted(
        (r.k, r.id_a, r.id_b, r.dt)
        for r in range_self_join(
            df, key="k", time_col="t", id_col="eid", window=window
        ).collect()
    )
    # sorted-list compare: each true pair must appear EXACTLY once
    # (the operator has no trailing distinct — duplicates would show)
    assert got == sorted(expected), f"seed={seed} window={window}"


# ---- PDF codec round-trip properties (no Spark) ---------------------

_pdf_word = st.text(
    alphabet=st.characters(
        min_codepoint=33, max_codepoint=126  # printable, no space
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=25, deadline=None)
@given(
    words=st.lists(
        st.tuples(
            _pdf_word,
            st.floats(20, 500),   # x
            st.floats(20, 700),   # y from top
            st.floats(6, 24),     # size
        ),
        min_size=1,
        max_size=12,
    ),
    compress=st.booleans(),
)
def test_pdf_codec_round_trip_properties(words, compress):
    """write_pdf → extract_words recovers every word with Courier-
    metric positions regardless of text content (escaping incl. parens
    and backslashes), draw order, or stream compression."""
    from accounting_etl_spark.sources import pdf_codec

    # keep draws on distinct baselines so fragment merging is not in
    # play (merge semantics are pinned by the TJ unit test); hypothesis
    # jitter would otherwise place two draws at near-identical (x, y)
    laid = [
        (t, x, 30.0 + 50.0 * i, s)
        for i, (t, x, _y, s) in enumerate(words[:12])
    ]
    payload = pdf_codec.write_pdf([laid], compress=compress)
    got = pdf_codec.extract_words(payload)
    assert len(got) == len(laid)
    got_sorted = sorted(got, key=lambda w: w[4])  # by top == draw order
    for (text, x, y, size), (page, gtext, gx0, gx1, gtop, gbot) in zip(
        laid, got_sorted
    ):
        assert page == 1
        assert gtext == text
        assert abs(gx0 - x) < 0.02  # writer rounds coords to 2dp
        assert abs((gx1 - gx0) - 0.6 * size * len(text)) < 0.05
        assert abs(gtop - (y - 0.629 * size)) < 0.05
        assert gbot > gtop
