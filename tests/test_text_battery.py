"""Gopher/C4 quality-rule battery — independent pure-Python reference.

The Spark side (queries/text.py q_text_metrics) synthesizes a
deterministic lined page from (doc_id, whitespace tokens) and runs the
Rae et al. 2021 / Raffel et al. 2020 line- and word-level rules over
it. This test recomputes the whole battery in plain Python from the
raw parquet text and compares every derived column — an implementation
genuinely independent of both Spark and the DuckDB oracle (which
test_oracle_parity already cross-checks).
"""

from __future__ import annotations

import math
import re

import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_SMOKE

GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _reference_battery(doc_id: int, text: str) -> dict:
    ws = text.strip().split(" ")
    n_ws = len(ws)
    k = doc_id % 7 + 5
    n_lines = math.ceil(n_ws / k)
    lines = []
    for i in range(n_lines):
        body = " ".join(ws[i * k : (i + 1) * k])
        prefix = "- " if (doc_id + i) % 4 == 1 else ""
        m = (doc_id + i) % 5
        suffix = {0: ".", 1: "...", 3: "!"}.get(m, "")
        lines.append(prefix + body + suffix)
    n_punct = sum(1 for l in lines if re.search(r"[.!?]$", l))
    n_bullet = sum(1 for l in lines if l.startswith("- "))
    n_ellipsis = sum(1 for l in lines if l.endswith("..."))
    n_c4_kept = sum(
        1
        for l in lines
        if re.search(r"[.!?]$", l)
        and len(re.findall(r"[A-Za-z0-9]+", l)) >= 5
    )
    n_alpha = sum(1 for t in ws if re.search(r"[A-Za-z]", t))
    n_sym = len(re.findall(r"#", text)) + len(re.findall(r"\.\.\.", text))
    toks = re.findall(r"[A-Za-z0-9]+", text)
    sum_len = sum(len(t) for t in toks)
    wsl = [t.lower() for t in ws]
    n_stops = sum(1 for s in GOPHER_STOPS if s in wsl)
    rules = [
        50 <= len(toks) <= 100_000,
        3 * len(toks) <= sum_len <= 10 * len(toks),
        10 * n_sym <= n_ws,
        10 * n_bullet <= n_lines,
        10 * n_ellipsis <= 3 * n_lines,
        5 * n_alpha >= 4 * n_ws,
        n_stops >= 2,
    ]
    return {
        "n_lines": n_lines,
        "frac_line_punct": n_punct / n_lines,
        "frac_line_bullet": n_bullet / n_lines,
        "frac_line_ellipsis": n_ellipsis / n_lines,
        "n_c4_kept_lines": n_c4_kept,
        "alpha_word_frac": n_alpha / n_ws,
        "symbol_word_ratio": n_sym / n_ws,
        "n_gopher_stops": n_stops,
        "n_gopher_violations": sum(0 if r else 1 for r in rules),
        "gopher_pass": all(rules),
        "c4_clean": (
            "lorem ipsum" not in text.lower()
            and "{" not in text
            and n_c4_kept >= 1
        ),
    }


@pytest.fixture(scope="module")
def battery(spark):
    from accounting_etl_spark.queries.text import q_text_metrics

    rows = q_text_metrics(spark, SF_SMOKE).collect()
    return {r["doc_id"]: r for r in rows}


def test_battery_matches_python_reference(battery):
    tbl = pq.read_table(
        f"{SF_SMOKE}/documents.parquet", columns=["doc_id", "text"]
    ).to_pylist()
    assert len(tbl) == len(battery)
    for rec in tbl:
        exp = _reference_battery(rec["doc_id"], rec["text"])
        got = battery[rec["doc_id"]]
        for col, want in exp.items():
            assert got[col] == pytest.approx(want), (
                rec["doc_id"],
                col,
                got[col],
                want,
            )


def test_handcrafted_rule_edges():
    # A doc engineered to pass all seven rules: doc_id=27 gives an
    # 11-word line width and an undecorated single line (27%4 != 1,
    # 27%5 != 1), hyphenated words carry 6 regex tokens each so 11
    # whitespace words hold 56 tokens >= 50, mean token length 3.95.
    good = "the be " + " ".join(["abcd-abcd-abcd-abcd-abcd-abcd"] * 9)
    ref = _reference_battery(27, good)
    assert ref["n_lines"] == 1
    assert ref["gopher_pass"] and ref["n_gopher_violations"] == 0
    assert ref["n_gopher_stops"] == 2
    # same doc under a bullet-decorating doc_id: (25+0)%4 == 1 makes
    # the single line a bullet -> 100% bullet lines violates rule 4
    # (doc_id=25 also has k=25%7+5=8 -> 2 lines, both decorated)
    ref = _reference_battery(25, good)
    assert not ref["gopher_pass"]
    # symbol-heavy text violates the symbol-ratio and stop-word rules
    sym = " ".join("#tag" for _ in range(60))
    ref = _reference_battery(27, sym)
    assert not ref["gopher_pass"]
    assert ref["n_gopher_stops"] == 0
    assert ref["symbol_word_ratio"] == 1.0
    # short doc: the word-count rule fails even with all 8 stopwords
    short = "the be to of and that have with"
    ref = _reference_battery(3, short)
    assert not ref["gopher_pass"] and ref["n_gopher_stops"] == 8
