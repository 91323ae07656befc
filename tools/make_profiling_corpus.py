"""Generate the sf1.0-LIKE profiling corpus used by the round-6
continuation session (OPTIMIZATION_r06.md "Continuation session").

The driver's own sf1.0 tables are generated at measurement time and are
not available between rounds, so relative A/B profiling at that scale
uses this stand-in: 50k documents drawn from sf0.1's EMPIRICAL unigram
and doc-length distributions with ~6% planted near-dups (5% token
perturbation of an earlier doc) and ~4% exact dups, plus 20k dim-64
embeddings in 10 Gaussian clusters with ~2% planted near-dup vectors —
schema-matched to the driver tables (float32 embeddings, int32 labels).

It reproduces the driver's sf1.0 cost profile well (session-start:
cosine_highsim_pairs ~14.5 s, containment_pairs ~10.4 s,
minhash_lsh_pairs ~2.3 s, ivf_topk_exact ~4.0 s vs the round's sf1.0
best-window 9.8 / 6.7 / 1.8 / 3.4 s — same ordering, same dominant
stages).  PROFILING ONLY: claimed numbers always come from the frozen
bench.py on the real testdata.

Usage: python tools/make_profiling_corpus.py [out_dir]  (default
/root/profdata/sf1like; requires /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys
from collections import Counter

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

out_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/profdata/sf1like"
os.makedirs(out_dir, exist_ok=True)
rng = np.random.default_rng(123)

rows = duckdb.sql(
    "SELECT text, lang, source FROM read_parquet('/root/testdata/sf0.1/documents.parquet')"
).fetchall()
wc: Counter = Counter()
lens = []
langs = [r[1] for r in rows]
sources = [r[2] for r in rows]
for t, _, _ in rows:
    ws = t.split(" ")
    wc.update(ws)
    lens.append(len(ws))
vocab = list(wc.keys())
probs = np.array([wc[w] for w in vocab], dtype=float)
probs /= probs.sum()
lens_arr = np.array(lens)

N = 50_000
texts: list[str] = []
base_n = int(N * 0.9)
for _ in range(base_n):
    L = int(rng.choice(lens_arr))
    texts.append(" ".join(rng.choice(vocab, size=L, p=probs)))
while len(texts) < int(N * 0.96):  # planted near-dups
    ws = texts[rng.integers(0, base_n)].split(" ")
    for j in rng.choice(len(ws), size=max(1, len(ws) // 20), replace=False):
        ws[j] = vocab[rng.integers(0, len(vocab))]
    texts.append(" ".join(ws))
while len(texts) < N:  # exact dups
    texts.append(texts[rng.integers(0, base_n)])
texts = [texts[i] for i in rng.permutation(N)]
pq.write_table(
    pa.table(
        {
            "doc_id": pa.array(range(N), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array([langs[i % len(langs)] for i in range(N)]),
            "source": pa.array([sources[i % len(sources)] for i in range(N)]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    ),
    os.path.join(out_dir, "documents.parquet"),
    row_group_size=1_000_000,
)

rng = np.random.default_rng(42)
M = 20_000
cents = rng.normal(size=(10, 64))
lab = rng.integers(0, 10, M)
emb = (cents[lab] + rng.normal(scale=0.6, size=(M, 64))).astype(np.float32)
dup_idx = rng.choice(M, size=M // 50, replace=False)
emb[dup_idx] = emb[(dup_idx + 7) % M] + rng.normal(
    scale=0.01, size=(len(dup_idx), 64)
).astype(np.float32)
pq.write_table(
    pa.table(
        {
            "vec_id": pa.array(range(M), pa.int64()),
            "embedding": pa.array([e.tolist() for e in emb], pa.list_(pa.float32())),
            "label": pa.array([int(x) for x in lab], pa.int32()),
        }
    ),
    os.path.join(out_dir, "embeddings.parquet"),
    row_group_size=1_000_000,
)
print(f"wrote {N} docs + {M} embeddings to {out_dir}")
