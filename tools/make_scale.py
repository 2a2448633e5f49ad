"""Scale a testdata SF directory N× by key-offset replication.

Usage: python tools/make_scale.py SRC_DIR DST_DIR N

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
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in COPY_ONCE:
        con.sql(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")
    for t, keys in KEYED.items():
        cols = [
            (r[0], r[1])
            for r in con.sql(
                f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'"
            ).fetchall()
        ]
        selects = []
        for i in range(n):
            proj = ", ".join(
                f"CAST({c} + {i * STRIDE} AS {typ}) AS {c}"
                if c in keys
                # the source stores events.ts as nanosecond int64
                # (Spark reads it as bigint and converts itself);
                # DuckDB would silently rewrite it as a us TIMESTAMP
                else (f"epoch_ns({c}) AS {c}" if t == "events" and c == "ts" else c)
                for c, typ in cols
            )
            selects.append(f"SELECT {proj} FROM '{src}/{t}.parquet'")
        union = " UNION ALL ".join(selects)
        con.sql(
            f"COPY ({union}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        cnt = con.sql(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {cnt} rows")


if __name__ == "__main__":
    main()
