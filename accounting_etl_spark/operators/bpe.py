"""Learned BPE tokenizer (SURVEY §2.11 text analysis): upgrade the
token-counting battery's "BPE-ish regex" to a real byte-pair-encoding
vocabulary trained on the corpus, the way pre-training pipelines
actually measure token budgets.

Spark-first decomposition of Sennrich et al. (2016):

- **Training input is the word-frequency table, not the corpus.**
  Classic BPE trains on ``{word: count}`` — vocabulary-sized, not
  corpus-sized. One distributed explode+groupBy builds it; a top-N
  cap bounds what reaches the driver (the same discipline as the IVF
  centroid sample: a 100 TB corpus still hands the driver ≤ top_n
  rows, and sub-cap words are noise for merge ranking).
- **The greedy merge loop runs driver-side** on that bounded table —
  pure Python, microseconds per merge, fully deterministic with an
  explicit tie-break (max count, then lexicographically smallest
  pair), so retrains on reshuffled corpora give identical merges.
- **Tokenization is an Arrow-batched pandas UDF** (the merge loop per
  word is genuinely imperative — U3's "only where built-ins can't
  express it" case) with a per-batch word cache: each DISTINCT word
  pays the merge walk once per batch, repeated words are dict hits.
  Map-side only; no shuffle.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_END = "</w>"  # end-of-word sentinel, per the original paper


def word_freq_table(
    docs: DataFrame, *, text_col: str = "text", top_n: int = 50_000
) -> list[tuple[str, int]]:
    """Distributed ``(word, count)`` table, capped at the ``top_n``
    most frequent words (count desc, then word asc — deterministic
    across partitionings)."""
    toks = F.explode(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    ).alias("w")
    rows = (
        docs.select(toks)
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("w"))
        .limit(top_n)
        .collect()
    )
    return [(r["w"], r["cnt"]) for r in rows]


def train_bpe(
    word_freqs: list[tuple[str, int]], *, n_merges: int = 200
) -> list[tuple[str, str]]:
    """Greedy BPE merge list from a word-frequency table.

    Deterministic: ties broken by lexicographically smallest pair.
    Stops early when no pair occurs more than once."""
    vocab = {
        tuple(word) + (_END,): cnt for word, cnt in word_freqs if word
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, cnt in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + cnt
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append((a, b))
        merged = a + b
        new_vocab = {}
        for sym, c in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def segment_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply trained merges to one word (lowest-rank pair first)."""
    sym = list(word) + [_END]
    while len(sym) > 1:
        cand = [
            (ranks[(a, b)], i)
            for i, (a, b) in enumerate(zip(sym, sym[1:]))
            if (a, b) in ranks
        ]
        if not cand:
            break
        _, i = min(cand)
        sym[i : i + 2] = [sym[i] + sym[i + 1]]
    return sym


def bpe_tokenize(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc BPE tokenization: adds ``bpe_tokens`` (array<string>)
    and ``n_bpe_tokens``. Map-side pandas UDF; unseen words fall back
    to characters (open vocabulary, never an OOV failure)."""
    from pyspark.sql.functions import pandas_udf

    ranks = {pair: i for i, pair in enumerate(merges)}

    @pandas_udf("array<string>")
    def _tok(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def run(text: str) -> list[str]:
            out: list[str] = []
            for w in (text or "").lower().split():
                if w not in cache:
                    cache[w] = segment_word(w, ranks)
                out.extend(cache[w])
            return out

        return texts.map(run)

    return docs.select(
        F.col(id_col).alias("doc_id"),
        _tok(F.col(text_col)).alias("bpe_tokens"),
    ).withColumn("n_bpe_tokens", F.size("bpe_tokens").cast("bigint"))
