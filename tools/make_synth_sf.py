"""Regenerate the key-shifted synthetic scale-up used for the NOTES
scaling read-outs (e.g. ``.sf1_synth`` = 10× sf0.1).

Scheme (inferred requirements of the scaling demos, kept deterministic):
each fact/entity table is replicated ``factor`` times with every
PRIMARY key and REPLICATED foreign key shifted by
``replica * (max_key + 1)``; timestamps, text, and the dimension
tables (region/nation/part/supplier) are left untouched. Replicated
documents therefore carry IDENTICAL text under new doc_ids — which is
why near-dup-style queries see a quadratic blowup of TRUE pairs on
this data (a data-shape artifact, not a plan property; both engines
pay it — see NOTES).

Usage:
    python tools/make_synth_sf.py /root/testdata/sf0.1 OUT_DIR [factor]
"""

from __future__ import annotations

import os
import sys

import duckdb

#: per-table shifted key columns (PKs and the FKs that reference a
#: replicated table). Dims (region/nation/part/supplier) copy as-is.
SHIFTS = {
    "events": ["event_id", "user_id"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "customer": ["c_custkey"],
}
COPY = ["region", "nation", "part", "supplier"]


def main() -> int:
    src, out = sys.argv[1], sys.argv[2]
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in COPY:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet')"
            f" TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t, keys in SHIFTS.items():
        bases = {
            k: con.execute(
                f"SELECT max({k}) + 1 FROM '{src}/{t}.parquet'"
            ).fetchone()[0]
            for k in keys
        }
        shifted_cols = ", ".join(
            f"{k} + r * {bases[k]} AS {k}" for k in keys
        )
        others = [
            d[0]
            for d in con.execute(
                f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'"
            ).fetchall()
            if d[0] not in keys
        ]
        sel = ", ".join([shifted_cols] + others)
        con.execute(
            f"COPY (SELECT {sel} FROM '{src}/{t}.parquet'"
            f" CROSS JOIN (SELECT unnest(range({factor})) AS r))"
            f" TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM '{out}/{t}.parquet'"
        ).fetchone()[0]
        print(f"{t}: {n} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
