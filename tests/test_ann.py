"""ANN tests: brute-force exactness vs numpy oracle; LSH-bucketed recall."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql.types import ArrayType, FloatType, IntegerType, LongType, StructField, StructType

from wdedup_spark.operators.ann import (
    brute_force_topk,
    exact_cosine_pairs,
    lsh_bucketed_topk,
    lsh_cosine_pairs,
)

DIM = 16


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(11)
    # 8 well-separated centroids with 25 points each → meaningful neighbors
    cents = rng.standard_normal((8, DIM)) * 4
    vecs = []
    for i in range(200):
        c = cents[i % 8]
        vecs.append((c + rng.standard_normal(DIM) * 0.3).astype(np.float32))
    pdf = pd.DataFrame({"vec_id": range(200), "embedding": [v.tolist() for v in vecs]})
    schema = StructType([
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(FloatType()), False),
    ])
    df = spark.createDataFrame(pdf, schema=schema)
    return df.localCheckpoint(eager=True), np.stack(vecs).astype(np.float64)


def _numpy_topk(mat, qids, k):
    norms = np.linalg.norm(mat, axis=1)
    out = {}
    for q in qids:
        scores = mat @ mat[q] / (norms * norms[q])
        scores[q] = -np.inf
        order = np.lexsort((np.arange(len(mat)), -scores))
        out[q] = list(order[:k])
    return out


def test_brute_force_matches_numpy(spark, emb):
    df, mat = emb
    queries = df.filter("vec_id < 5")
    got = brute_force_topk(df, queries, k=5).collect()
    want = _numpy_topk(mat, range(5), 5)
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"], r["score"]))
    for q in range(5):
        ranked = [n for _, n, _ in sorted(by_q[q])]
        assert ranked == want[q], f"query {q}: {ranked} != {want[q]}"
        for _, n, s in by_q[q]:
            true = float(mat[q] @ mat[n] / (np.linalg.norm(mat[q]) * np.linalg.norm(mat[n])))
            assert abs(s - true) < 1e-6


def _numpy_pairs(mat, t):
    norms = np.linalg.norm(mat, axis=1)
    S = (mat @ mat.T) / np.outer(norms, norms)
    ii, jj = np.nonzero(np.triu(S >= t, k=1))
    return {(int(a), int(b)) for a, b in zip(ii, jj)}


def test_exact_cosine_pairs_matches_numpy_multiblock(spark, emb):
    df, mat = emb
    # block_size 48 over 200 vectors → 5 hash blocks, 15 block pairs:
    # exercises diagonal triu, cross-block ordering, and the tile join
    got = exact_cosine_pairs(df, threshold=0.8, block_size=48)
    rows = got.collect()
    pairs = {(r["vec_a"], r["vec_b"]) for r in rows}
    want = _numpy_pairs(mat, 0.8)
    assert pairs == want
    assert all(r["vec_a"] < r["vec_b"] for r in rows)
    assert len(rows) == len(pairs)  # no duplicate emissions
    by_pair = {(r["vec_a"], r["vec_b"]): r["cosine"] for r in rows}
    norms = np.linalg.norm(mat, axis=1)
    for (a, b), c in list(by_pair.items())[:20]:
        true = float(mat[a] @ mat[b] / (norms[a] * norms[b]))
        assert abs(c - true) < 1e-9


def test_exact_cosine_pairs_single_block(spark, emb):
    df, mat = emb
    got = {(r["vec_a"], r["vec_b"]) for r in exact_cosine_pairs(df, 0.8, block_size=4096).collect()}
    assert got == _numpy_pairs(mat, 0.8)


def test_exact_cosine_pairs_block_table_is_distributed(spark, emb):
    """VERDICT r2 #2: block pairs must be enumerated JVM-side (spark.range
    self-join), never as an O(nblocks²) driver-side Python list."""
    df, mat = emb
    got = exact_cosine_pairs(df, threshold=0.8, block_size=8)  # 25 blocks, 325 tiles
    plan = got._jdf.queryExecution().optimizedPlan().toString().lower()
    assert "range (0, 25" in plan, "block-pair table must derive from spark.range"
    assert "localrelation" not in plan and "scan existingrdd" not in plan
    pairs = {(r["vec_a"], r["vec_b"]) for r in got.collect()}
    assert pairs == _numpy_pairs(mat, 0.8)


def test_lsh_cosine_pairs_recall_at_high_threshold(spark, emb):
    df, mat = emb
    # clustered fixture: same-centroid points sit at cosine >= ~0.9;
    # defaults are sized for recall ~1 at this threshold
    got = lsh_cosine_pairs(df, threshold=0.9, dim=DIM)
    pairs = {(r["vec_a"], r["vec_b"]) for r in got.collect()}
    want = _numpy_pairs(mat, 0.9)
    assert want, "fixture must contain high-cosine pairs"
    assert pairs <= want  # exact verify: zero false positives
    recall = len(pairs & want) / len(want)
    assert recall >= 0.995, f"recall {recall}"


def test_lsh_bucketed_recall(spark, emb):
    df, mat = emb
    queries = df.filter("vec_id < 20")
    approx = lsh_bucketed_topk(df, queries, dim=DIM, k=5, n_bits=8)
    want = _numpy_topk(mat, range(20), 5)
    by_q = {}
    for r in approx.collect():
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    # multi-probe LSH over clustered data: recall@5 well above random
    hits = sum(len(by_q.get(q, set()) & set(want[q])) for q in range(20))
    assert hits / (20 * 5) >= 0.6, f"LSH recall {hits / 100}"


def test_lsh_bucketed_recall_md5_planes(spark, emb):
    """The oracle-checkable plane mode (VERDICT r4 #1): md5-derived ±1
    Rademacher planes must (a) be deterministic/seedless and (b) keep
    multi-probe recall in the same regime as the Gaussian planes — the
    SQL-expressibility must not cost the operator its accuracy."""
    import numpy as np

    from wdedup_spark.operators.ann import md5_planes

    w = md5_planes(16, 4)
    assert np.array_equal(w, md5_planes(16, 4))  # deterministic
    assert set(np.unique(w)) == {-1.0, 1.0}
    # first entry pinned to the documented rule: md5('0:0') nibble parity
    import hashlib

    nib = int(hashlib.md5(b"0:0").hexdigest()[0], 16)
    assert w[0, 0] == (1.0 if nib % 2 == 1 else -1.0)

    df, mat = emb
    queries = df.filter("vec_id < 20")
    approx = lsh_bucketed_topk(df, queries, dim=DIM, k=5, n_bits=8, plane_mode="md5")
    want = _numpy_topk(mat, range(20), 5)
    by_q = {}
    for r in approx.collect():
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(by_q.get(q, set()) & set(want[q])) for q in range(20))
    assert hits / (20 * 5) >= 0.6, f"md5-plane LSH recall {hits / 100}"


def test_ivf_topk_recall_and_exact_degradation(spark, emb):
    from wdedup_spark.operators.ann import ivf_topk

    df, mat = emb
    queries = df.filter("vec_id < 20")
    want = _numpy_topk(mat, range(20), 5)

    # n_probe == n_lists must be EXACT brute force (ranks identical;
    # score is cosine because vectors are unit-normalized first)
    exact = ivf_topk(df, queries, k=5, n_lists=8, n_probe=8, n_iter=2)
    by_q = {}
    for r in exact.collect():
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
    for qid in range(20):
        assert [n for _, n in sorted(by_q[qid])] == want[qid]

    # probing 4 of 16 lists on the clustered fixture keeps high recall
    approx = ivf_topk(df, queries, k=5, n_lists=16, n_probe=4, n_iter=3)
    hit = tot = 0
    got = {}
    for r in approx.collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for qid in range(20):
        hit += len(got.get(qid, set()) & set(want[qid]))
        tot += 5
    assert hit / tot >= 0.9, f"IVF recall {hit/tot}"


def test_lsh_cosine_pairs_sparse_matches_dense_and_numpy(spark):
    """The sparse entry point must find the same pairs as the dense path
    and the numpy all-pairs oracle, with exact cosine values (verify is an
    exact sparse dot over shared indices)."""
    import pandas as pd

    from wdedup_spark.operators.ann import lsh_cosine_pairs_sparse

    dim = 512
    rng = np.random.default_rng(23)
    # sparse non-negative histograms: 30 base docs, each with a planted
    # near-dup (small perturbation) → cosine >= ~0.95; unrelated pairs low
    ids, idxs, vals = [], [], []
    dense = {}
    for i in range(30):
        nnz = rng.integers(20, 60)
        ii = np.sort(rng.choice(dim, size=nnz, replace=False))
        vv = rng.integers(1, 9, size=nnz).astype(np.float64)
        for j, pert in ((2 * i, 0), (2 * i + 1, 1)):
            v2 = vv.copy()
            if pert:
                v2[0] += 1.0  # tiny perturbation keeps cosine high
            ids.append(j)
            idxs.append(ii.tolist())
            vals.append(v2.tolist())
            d = np.zeros(dim)
            d[ii] = v2
            dense[j] = d
    pdf = pd.DataFrame({"vec_id": ids, "idxs": idxs, "vals": vals})
    df = spark.createDataFrame(pdf)
    got = lsh_cosine_pairs_sparse(
        df, threshold=0.9, dim=dim, n_bits=8, n_tables=32, oversize_policy="all"
    ).collect()
    mat = np.stack([dense[i] for i in sorted(dense)])
    want = _numpy_pairs(mat, 0.9)
    pairs = {(r["vec_a"], r["vec_b"]) for r in got}
    assert pairs <= want, "exact verify must kill false positives"
    assert len(pairs & want) / len(want) >= 0.99, f"recall {len(pairs & want) / len(want)}"
    norms = np.linalg.norm(mat, axis=1)
    for r in got:
        a, b = r["vec_a"], r["vec_b"]
        true = float(mat[a] @ mat[b] / (norms[a] * norms[b]))
        assert abs(r["cosine"] - true) < 1e-9
    # the actual sparse/dense contract: same seed + config → the DENSE
    # path over densified vectors finds the same pair set with matching
    # cosines (the sparse _sigs batch scatter must reproduce the dense
    # matmul's bits; divergence in plane seeding / reshape order / weights
    # would break this even with the numpy oracle still green)
    dpdf = pd.DataFrame(
        {"vec_id": sorted(dense), "embedding": [dense[i].tolist() for i in sorted(dense)]}
    )
    ddf = spark.createDataFrame(dpdf)
    dgot = lsh_cosine_pairs(
        ddf, threshold=0.9, dim=dim, n_bits=8, n_tables=32, oversize_policy="all"
    ).collect()
    dense_pairs = {(r["vec_a"], r["vec_b"]): r["cosine"] for r in dgot}
    sparse_pairs = {(r["vec_a"], r["vec_b"]): r["cosine"] for r in got}
    assert set(sparse_pairs) == set(dense_pairs), "sparse/dense pair-set parity"
    for k in sparse_pairs:
        assert abs(sparse_pairs[k] - dense_pairs[k]) < 1e-9


def test_ivf_topk_leaves_no_cached_blocks(spark, emb):
    """VERDICT r3 #4: ivf_topk must unpersist its normalized corpus before
    returning — repeated calls in a long-running driver must not accumulate
    MEMORY_AND_DISK blocks.  (The eager localCheckpoint of the index is the
    one deliberate exception: it IS the returned data and is released with
    the DataFrame, not leaked per-call as a hidden side effect — we assert
    the *persist* count, which checkpointed RDDs don't enter via cache().)"""
    from wdedup_spark.operators.ann import ivf_topk

    df, _ = emb
    spark.catalog.clearCache()
    jsc = spark.sparkContext._jsc.sc()
    base = jsc.getPersistentRDDs().size()
    out = ivf_topk(df, df.filter("vec_id < 3"), k=3, n_lists=4, n_probe=2, n_iter=1)
    out.write.mode("overwrite").format("noop").save()
    after = jsc.getPersistentRDDs().size()
    # the only allowed growth is the localCheckpoint backing the RETURNED
    # index (1 RDD); the persisted corpus must be gone
    assert after - base <= 1, f"leaked cached RDDs: {after - base}"


def test_ivf_topk_zero_norm_vector_is_harmless(spark):
    """ADVICE r3: an all-zero embedding must not emit NaNs into centroid
    training or scores — it scores 0 against everything and ranks last."""
    import pandas as pd

    from wdedup_spark.operators.ann import ivf_topk

    rng = np.random.default_rng(7)
    vecs = [rng.standard_normal(8).tolist() for _ in range(20)]
    vecs[5] = [0.0] * 8  # corpus zero vector
    pdf = pd.DataFrame({"vec_id": range(20), "embedding": vecs})
    schema = StructType([
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(FloatType()), False),
    ])
    df = spark.createDataFrame(pdf, schema=schema)
    rows = ivf_topk(df, df.filter("vec_id < 3"), k=19, n_lists=2, n_probe=2, n_iter=2).collect()
    assert rows, "result must not be empty"
    assert all(r["score"] == r["score"] for r in rows), "NaN score leaked"
    # the zero vector scores exactly 0 against every query
    for r in rows:
        if r["neighbor_id"] == 5:
            assert r["score"] == 0.0
