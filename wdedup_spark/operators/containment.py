"""Set-containment similarity join — prefix-filtered AllPairs/PPJoin.

The asymmetric case the Jaccard channels structurally miss: a short
document quoted inside a much longer one has containment
``|A∩B| / min(|A|,|B|) ≈ 1`` but Jaccard ``≈ |A|/|B| → 0``, and
MinHash-LSH band collisions vanish with the Jaccard, so no number of
bands recovers the pair.  This operator finds all pairs with
containment ≥ t EXACTLY, using the prefix-filtering principle of the
set-similarity-join literature (Bayardo et al. "Scaling Up All Pairs
Similarity Search", WWW'07; PPJoin, Xiao et al. WWW'08):

  order every set consistently by ascending global token frequency
  (rarest first); if ``|S∩L| ≥ α`` then ANY ``|S|-α+1`` elements of S
  contain at least one intersection element (pigeonhole).  With
  ``α = t·min(|S|,|L|)`` and S the smaller set, S's first
  ``|S| - ⌈t·|S|⌉ + 1`` tokens must hit the intersection — so indexing
  ONLY those prefix tokens per set, and probing with EVERY token of
  candidate larger sets, is lossless.

Plan shape (all JVM until the exact verify):

* global token frequencies: one aggregate over the exploded sets;
* per-set frequency-ascending order: one groupBy(id) re-collect (the
  only place a whole set sits in one aggregation buffer — bounded by
  document size, same bound the signing stage carries);
* candidate generation: inverted-index equi-join ``prefix(tk) ⨝
  tokens(tk)`` with ``size_index ≤ size_probe`` — the index side posts
  each set's RAREST tokens, so posting lists are short by construction
  (the whole point of frequency ordering: hot tokens almost never make
  a prefix);
* exact containment verify on the surviving pairs only (vectorized
  intersect over the pre-distinct arrays).

At a corpus whose documents are near-identical tiny sets the prefix
lists degenerate toward full lists (classic PPJoin worst case) — run
exact dedup first (the pipeline invariant) and the degenerate mass
collapses to single representatives before this join sees it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


@pandas_udf(DoubleType())
def containment_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Exact containment-in-smaller |A∩B| / min(|A|,|B|) of two
    pre-distinct array columns (1.0 when both empty, 0.0 when exactly
    one is empty).

    Batched (VERDICT r4 #6, re-done after an end-to-end regression):
    string identity is resolved ONCE per Arrow batch — ``pd.factorize``
    over the flattened values of both sides (each distinct token hashed
    once, exact integer codes) — and the per-row work drops to sorted
    int64 intersects over batch offsets.  The first batched attempt
    (flattened (row, token) pandas merge + groupby) won its small
    micro-bench but REGRESSED the real query ~50% (containment_pairs
    6-7 s → 8.8-16 s at sf0.1: the merge re-hashes every token of every
    row into a join hash table, and the groupby adds a pass).  Measured
    at the query's real shapes (20k pairs × 30-250 string shingles):
    looped intersect1d 2.23 s, merge 3.38 s, THIS kernel 1.66 s —
    kernels must be judged end-to-end, not on toy shapes."""
    n = len(a)
    if n == 0:
        return pd.Series(np.empty(0, dtype=np.float64))
    la = np.fromiter((len(x) for x in a), dtype=np.int64, count=n)
    lb = np.fromiter((len(x) for x in b), dtype=np.int64, count=n)
    out = np.where((la == 0) & (lb == 0), 1.0, 0.0)
    mask = (la > 0) & (lb > 0)
    if mask.any():
        flat = np.concatenate(list(a) + list(b))
        codes, _ = pd.factorize(flat)
        split = int(la.sum())
        ca, cb = codes[:split], codes[split:]
        oa = np.concatenate(([0], np.cumsum(la)))
        ob = np.concatenate(([0], np.cumsum(lb)))
        cnt = np.zeros(n, dtype=np.float64)
        # no pre-sort: intersect1d concatenates and sorts internally
        # regardless of input order, so sorting here would be two extra
        # O(L log L) passes per pair for nothing (review r5)
        for i in np.flatnonzero(mask):
            cnt[i] = np.intersect1d(
                ca[oa[i]:oa[i + 1]], cb[ob[i]:ob[i + 1]], assume_unique=True
            ).size
        denom = np.minimum(la, lb).astype(np.float64)
        denom[denom == 0] = 1.0
        out = np.where(mask, cnt / denom, out)
    return pd.Series(out)


# (r6 negative result: marking this kernel non-deterministic to stop
# the guide-§4.4 double evaluation regressed containment_pairs 8.7 s →
# 39.6 s at sf1.0 — the marker also blocks optimizations the candidate
# join needs.  The double eval is tolerated here; see verify.py for the
# kernels where the marker is a measured win.)

def prefix_bound_len(sz_col, t: float):
    """Lossless prefix length |X| − ⌈t·|X|⌉ + 1 (≥ 1) as a Column.

    round-before-ceil: in binary floating point ``0.9*10 ==
    9.000000000000002`` and a naive ceil would shrink the prefix below
    the lossless bound exactly at threshold-boundary overlaps.  The ONE
    copy of this numeric trick — the streaming probe imports it, and a
    Spark-grid test pins this very expression against exact rational
    arithmetic (tests/test_containment.py)."""
    return (sz_col - F.ceil(F.round(sz_col * t, 6)) + 1).cast("int")


def containment_join(
    shingled: DataFrame,
    threshold: float = 0.9,
    id_col: str = "conv_id",
    shingle_col: str = "shingles",
    new_col: str | None = None,
) -> DataFrame:
    """All pairs with containment ≥ ``threshold`` over pre-distinct
    shingle-set arrays → ``(conv_a, conv_b, containment)`` with
    ``conv_a < conv_b``.  Exact (prefix filtering is lossless); see the
    module docstring for the candidate-generation argument.

    ``new_col``: incremental mode — ``shingled`` carries a boolean batch
    flag and only pairs TOUCHING a flagged set are generated (old×old
    pairs were emitted by previous increments).  The token order is
    recomputed over old ∪ new each day — the prefix filter is lossless
    for ANY single consistent total order, so no frozen-frequency state
    needs committing; the old side costs one narrow JVM re-explode of
    the committed shingle arrays (the same economy as the LSH channel's
    re-banding), never re-tokenization or Python."""
    t = float(threshold)
    if not (0.0 < t <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {t}")
    flag = [F.col(new_col).alias("nw")] if new_col else []
    sets = shingled.select(
        F.col(id_col).alias("id"), F.array_distinct(F.col(shingle_col)).alias("sh"),
        *flag,
    )
    sized = sets.withColumn("sz", F.size("sh")).filter(F.col("sz") > 0)
    tok = sized.select(
        "id", "sz", F.explode("sh").alias("tk"), *(["nw"] if new_col else [])
    )

    # global ascending frequency; ties broken by token value so every
    # set is ordered by the SAME total order (required for the filter)
    freq = tok.groupBy("tk").agg(F.count(F.lit(1)).alias("df"))
    # checkpoint: the ordered sets feed BOTH the prefix index and (r6)
    # the position-carrying probe side
    ordered = (
        tok.join(freq, "tk")
        .groupBy("id")
        .agg(
            F.first("sz").alias("sz"),
            *( [F.first("nw").alias("nw")] if new_col else [] ),
            F.transform(
                F.array_sort(F.collect_list(F.struct("df", "tk"))), lambda s: s.tk
            ).alias("otoks"),
        )
        .localCheckpoint(eager=False)
    )
    # l-PREFIX candidate generation (r6).  The plain 1-prefix filter is
    # nearly unselective on corpora whose "rare" tokens still have
    # document frequency in the tens: at sf1.0 it admitted 16.9M
    # candidate pairs — ~1.3% of ALL pairs — and the exact array verify
    # on them was the whole query's cost.  The l-prefix generalization
    # (the pigeonhole extended by l−1: with prefix length
    # |S| − α + l, any pair with |A∩B| ≥ α shares ≥ l tokens of the
    # prefix — cf. the adaptive-prefix framework of Wang/Li/Feng,
    # SIGMOD'12) lets us demand l=2 shared prefix tokens via a count
    # aggregate, which kills the one-shared-token junk mass before
    # anything ships a set array.  α = ceil(t·|S|) is the integral
    # minimum intersection (round-before-ceil guard as everywhere);
    # sets with α < l fall back to l_eff = α, so tiny sets keep the
    # plain lossless bound.
    L_PREFIX = 2
    alpha = F.ceil(F.round(F.col("sz") * t, 6))
    l_eff = F.least(F.lit(L_PREFIX), alpha)
    plen = (F.col("sz") - alpha + l_eff).cast("int")
    prefix = ordered.select(
        F.col("id").alias("id_i"),
        F.col("sz").alias("sz_i"),
        *( [F.col("nw").alias("nw_i")] if new_col else [] ),
        F.posexplode(F.slice("otoks", 1, plen)).alias("pos_i", "tk"),
    )
    probe = ordered.select(
        F.col("id").alias("id_p"), F.col("sz").alias("sz_p"),
        *( [F.col("nw").alias("nw_p")] if new_col else [] ),
        F.posexplode("otoks").alias("pos_p", "tk"),
    )
    # positional filter (PPJoin, Xiao et al. WWW'08 §3.2), loosened by
    # l_eff so it can never drop one of the first l_eff common tokens a
    # qualifying pair must present: the j-th common token (j <= l_eff)
    # of a pair with |A∩B| ≥ α satisfies
    #   α <= j + min(sz_i − 1 − pos_i, sz_p − 1 − pos_p)
    # because both lists share one global total order.
    alpha_i = F.ceil(F.round(F.col("sz_i") * t, 6))
    l_eff_i = F.least(F.lit(L_PREFIX), alpha_i)
    matched = prefix.join(probe, "tk").filter(
        (F.col("sz_i") <= F.col("sz_p"))
        & (F.col("id_i") != F.col("id_p"))
        & (
            l_eff_i + F.least(
                F.col("sz_i") - 1 - F.col("pos_i"),
                F.col("sz_p") - 1 - F.col("pos_p"),
            )
            >= alpha_i
        )
    )
    if new_col:
        matched = matched.filter(F.col("nw_i") | F.col("nw_p"))
    # count shared prefix tokens per DIRECTED (smaller, larger) pair and
    # demand l_eff of them; equal-size pairs appear in both directions
    # with the same count, and least/greatest + distinct then emits each
    # unordered pair once, exactly as before
    counted = matched.groupBy("id_i", "id_p").agg(
        F.count(F.lit(1)).alias("_cnt"), F.min("sz_i").alias("_szi")
    )
    cands = (
        counted.filter(
            F.col("_cnt")
            >= F.least(F.lit(L_PREFIX), F.ceil(F.round(F.col("_szi") * t, 6)))
        )
        .select(
            F.least("id_i", "id_p").alias("conv_a"),
            F.greatest("id_i", "id_p").alias("conv_b"),
        )
        .distinct()
    )
    a = sets.select(F.col("id").alias("conv_a"), F.col("sh").alias("sh_a"))
    b = sets.select(F.col("id").alias("conv_b"), F.col("sh").alias("sh_b"))
    return (
        cands.join(a, "conv_a")
        .join(b, "conv_b")
        .withColumn("containment", containment_udf(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("containment") >= t)
        .select("conv_a", "conv_b", "containment")
    )
