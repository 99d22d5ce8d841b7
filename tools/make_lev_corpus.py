"""Linear-pair text corpus for edit_near_dup / near-dup scaling
evidence: unique random-token documents plus 3% planted one-edit
twins, so TRUE pair count scales linearly with corpus size (the
key-shifted .sf1_synth replicates documents verbatim, which makes
near-dup true pairs quadratic in the replication factor — a data-shape
artifact, not a plan property; see NOTES). The bench_phash_scale
philosophy applied to text.

Usage:
    python tools/make_lev_corpus.py SRC_TABLES_DIR OUT_DIR N_DOCS
(SRC_TABLES_DIR supplies the non-document tables verbatim.)
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np


def main() -> int:
    src_tables, out, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(out, exist_ok=True)
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "embeddings",
    ]:
        shutil.copyfile(
            f"{src_tables}/{t}.parquet", f"{out}/{t}.parquet"
        )

    rng = np.random.default_rng(42)
    vocab = np.array([f"w{i:04d}" for i in range(5000)])
    n_base = int(n / 1.03)
    toks = vocab[rng.integers(0, len(vocab), size=(n_base, 40))]
    texts = [" ".join(t) for t in toks]
    rows = list(enumerate(texts))
    doc_id = n_base
    planted = rng.choice(n_base, size=n - n_base, replace=False)
    for p in planted:
        tk = texts[p].split()
        tk[20] += "x"
        rows.append((doc_id, " ".join(tk)))
        doc_id += 1

    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
        "source": pa.array(
            [f"src{r[0] % 20}" for r in rows], pa.string()
        ),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
    })
    pq.write_table(tbl, f"{out}/documents.parquet")
    print("docs:", len(rows), "planted twins:", len(planted))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
