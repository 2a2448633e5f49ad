"""Scale a testdata SF directory N× by key-offset replication.

Usage: python tools/make_scale.py SRC_DIR DST_DIR N [--perturb] [--degenerate]

``--perturb`` tags every 3rd word of replica i>0 document texts with
``_r{i}`` (and recomputes n_chars): replicas stop being near-dups of
each other, so the near-dup/dedup queries scale over a mostly-UNIQUE
corpus (the realistic shape) instead of N-sized duplicate groups
whose pair output grows quadratically by construction.

``--degenerate`` plants the blank-thumbnail/silent-clip regime
(VERDICT r6 #1 scale control): every 15th document (~6.7%) in EVERY
replica becomes a single run of 'a's whose LENGTH varies by doc and
replica — TEXT bytes all differ (exact text dedup cannot fold the
length-forms together) while the perceptual signatures collapse: a
single token has no bigram, so every degenerate doc renders the same
zero plane / base-tone clip → ONE signature group the size of the
whole planted mass. At N×, the identical-signature group grows N× and the
banded pairing must stay linear in it (the identical-signature
collapse + hot-band cap under test).

Each replica i adds ``i * STRIDE`` to every join/id key, so
referential integrity (orders↔customer, lineitem↔orders/part/supplier,
events.user_id↔customer) and key uniqueness are preserved while fact
volume scales N×. Dimension-free small tables (region, nation) copy
once. Non-key columns replicate verbatim — document texts repeat, so
dedup queries see N-sized duplicate groups (deliberately: that's the
skew a larger corpus actually exhibits). Schemas are preserved
exactly (offsets cast back to the source dtype).

The point (VERDICT r2 next-round item #2): one 10× run catches
super-linear surprises — posting-list skew, banding explosion — that
plan audits at sf0.1 cannot show.
"""

from __future__ import annotations

import os
import sys

import duckdb

STRIDE = 100_000_000

# table -> columns that get the replica offset
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_ONCE = ["region", "nation"]


def main() -> None:
    src, dst, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
    perturb = "--perturb" in sys.argv[4:]
    degenerate = "--degenerate" in sys.argv[4:]
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    # a 1000-replica build (the third-decade control) nests the UNION
    # ALL past DuckDB's default parser depth
    con.sql("SET max_expression_depth TO 25000")
    # COPY preserves insertion order by default, which buffers the
    # ENTIRE union in RAM before writing (observed ~96 GB on the
    # 600M-row lineitem build). Replica order is meaningless here —
    # stream instead.
    con.sql("SET preserve_insertion_order = false")
    for t in COPY_ONCE:
        con.sql(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")
    for t, keys in KEYED.items():
        # resume support for the multi-hour large builds: COPY goes to
        # a .tmp name and renames on completion — but files written by
        # the pre-r9 direct-COPY version (or an interrupted out-of-band
        # copy) can be partial, so the skip VALIDATES the candidate
        # (ADVICE r9): footer must parse and the row count must be
        # exactly n × source rows (both metadata-only reads).
        dst_file = f"{dst}/{t}.parquet"
        if os.path.exists(dst_file) and os.path.getsize(dst_file) > 0:
            try:
                src_rows = con.sql(
                    f"SELECT count(*) FROM '{src}/{t}.parquet'"
                ).fetchone()[0]
                dst_rows = con.sql(
                    f"SELECT count(*) FROM '{dst_file}'"
                ).fetchone()[0]
            except Exception as exc:  # unreadable footer → rebuild
                print(f"{t}: existing file unreadable ({exc}); rebuilding")
                os.remove(dst_file)
            else:
                if dst_rows == n * src_rows:
                    print(f"{t}: exists ({dst_rows} rows, valid), skipped")
                    continue
                print(
                    f"{t}: existing file has {dst_rows} rows, expected "
                    f"{n * src_rows}; rebuilding"
                )
                os.remove(dst_file)
        cols = [
            (r[0], r[1])
            for r in con.sql(
                f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'"
            ).fetchall()
        ]
        selects = []
        for i in range(n):
            def col_expr(c: str, typ: str) -> str:
                if c in keys:
                    return f"CAST({c} + {i * STRIDE} AS {typ}) AS {c}"
                # the source stores events.ts as nanosecond int64
                # (Spark reads it as bigint and converts itself);
                # DuckDB would silently rewrite it as a us TIMESTAMP
                if (
                    t == "events"
                    and c == "ts"
                    and typ.upper().startswith("TIMESTAMP")
                ):
                    return f"epoch_ns({c}) AS {c}"
                if t == "documents" and (degenerate or (perturb and i > 0)):
                    text_expr = "text"
                    if perturb and i > 0:
                        text_expr = (
                            "array_to_string(list_transform("
                            "string_split(text, ' '), (w, j) -> "
                            f"CASE WHEN j % 3 = 0 THEN w || '_r{i}' "
                            "ELSE w END), ' ')"
                        )
                    if degenerate:
                        # byte-distinct (length varies by doc AND
                        # replica), signature-identical blank mass
                        text_expr = (
                            "CASE WHEN doc_id % 15 = 0 THEN "
                            f"repeat('a', 40 + doc_id % 37 + {i}) "
                            f"ELSE {text_expr} END"
                        )
                    if c == "text":
                        return f"{text_expr} AS text"
                    if c == "n_chars":
                        return (
                            f"CAST(length({text_expr}) AS BIGINT)"
                            " AS n_chars"
                        )
                return c

            proj = ", ".join(col_expr(c, typ) for c, typ in cols)
            selects.append(f"SELECT {proj} FROM '{src}/{t}.parquet'")
        union = " UNION ALL ".join(selects)
        con.sql(
            f"COPY ({union}) TO '{dst_file}.tmp' (FORMAT PARQUET)"
        )
        os.replace(f"{dst_file}.tmp", dst_file)
        cnt = con.sql(f"SELECT count(*) FROM '{dst_file}'").fetchone()[0]
        print(f"{t}: {cnt} rows")


if __name__ == "__main__":
    main()
