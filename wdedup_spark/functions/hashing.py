"""Deterministic 64-bit hashing kernels shared by all signature stages.

The reference packs each word's first 8 bytes into an integer so most
comparisons are one CPU op (/root/reference/include/wbloom.hpp:50-108).
We go one step further — every token becomes a full 64-bit digest and all
downstream math is numpy ``uint64`` with C wrap-around semantics.  blake2b
is keyed-seedable, stable across processes/platforms (unlike Python's
``hash``), and implemented in C.

Everything here is batch-vectorized: one call processes a whole Arrow
batch; the per-batch token memo exploits Zipfian token distributions
(the hot tokens hash once per batch, not once per occurrence).
"""

from __future__ import annotations

from hashlib import blake2b

import numpy as np

# Odd multipliers for polynomial shingle combination (splitmix64 constants).
_C1 = np.uint64(0x9E3779B97F4A7C15)
_C2 = np.uint64(0xBF58476D1CE4E5B9)
_C3 = np.uint64(0x94D049BB133111EB)

U64 = np.uint64


def token_hash(tok: str, _memo: dict | None = None) -> int:
    """Stable 64-bit hash of one token."""
    return int.from_bytes(blake2b(tok.encode("utf-8"), digest_size=8).digest(), "little")


class TokenHasher:
    """Batch-scoped memoizing token hasher."""

    def __init__(self) -> None:
        self._memo: dict[str, int] = {}

    def hash_tokens(self, tokens: list[str]) -> np.ndarray:
        memo = self._memo
        out = np.empty(len(tokens), dtype=np.uint64)
        for i, t in enumerate(tokens):
            h = memo.get(t)
            if h is None:
                h = token_hash(t)
                memo[t] = h
            out[i] = h
        return out


def shingle_hashes_seq(token_h: np.ndarray, k: int) -> np.ndarray:
    """Positional k-shingle hashes (one per window, order preserved).

    Polynomial combination over a sliding window, fully vectorized:
    ``sh[i] = C1*h[i] + C2*h[i+1] + ... (mod 2^64)``.  For k > len(tokens)
    the whole document is one shingle.
    """
    n = len(token_h)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if n < k:
        k = n
    consts = (_C1 * (np.arange(1, k + 1, dtype=np.uint64) * _C2 + _C3)) | U64(1)
    m = n - k + 1
    acc = np.zeros(m, dtype=np.uint64)
    for j in range(k):  # k is small (3-16); loop over window offset, vector over positions
        acc += token_h[j : j + m] * consts[j]
    acc *= _C1
    acc ^= acc >> U64(31)
    return acc


def shingle_hashes(token_h: np.ndarray, k: int) -> np.ndarray:
    """Distinct k-shingle hashes (the shingle *set* for Jaccard/MinHash)."""
    return np.unique(shingle_hashes_seq(token_h, k))


def minhash_params(n_perms: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Fixed multiply-shift permutation parameters (odd a, any b).

    Determinism contract: same (n_perms, seed) → same signatures, the
    analog of the reference's deterministic merge planner
    (/root/reference/include/wdedup.hpp:114-116).
    """
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 2**63, size=n_perms, dtype=np.uint64) | U64(1)
    b = rng.integers(0, 2**63, size=n_perms, dtype=np.uint64)
    return a, b


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash signature: ``sig[j] = min_s (a[j]*s + b[j] mod 2^64)``.

    Empty shingle set → all-max sentinel (never collides with real docs).
    """
    if len(shingles) == 0:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    # (n_shingles, n_perms) — chunk shingles to bound the temporary
    out = np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    CHUNK = 4096
    for i in range(0, len(shingles), CHUNK):
        s = shingles[i : i + CHUNK]
        out = np.minimum(out, (s[:, None] * a[None, :] + b[None, :]).min(axis=0))
    return out


_BIT_SHIFTS = np.arange(64, dtype=np.uint64)


def simhash(token_h: np.ndarray, weights: np.ndarray | None = None) -> int:
    """64-bit SimHash: weighted bitwise majority of token hashes
    (Charikar 2002).  Returns a Python int in [0, 2^64)."""
    if len(token_h) == 0:
        return 0
    vals, counts = np.unique(token_h, return_counts=True)
    w = counts.astype(np.int64) if weights is None else weights
    bits = ((vals[:, None] >> _BIT_SHIFTS[None, :]) & U64(1)).astype(np.int64)
    v = (bits * w[:, None]).sum(axis=0) * 2 - w.sum()
    sig = np.uint64(0)
    for i in range(64):
        if v[i] > 0:
            sig |= U64(1) << U64(i)
    return int(sig)


def md5_shingle_hashes(tokens: list[str], k: int) -> np.ndarray:
    """Positional k-shingle hashes derived from md5 of the shingle STRING
    (first 8 digest bytes, big-endian) — duplicates preserved.

    This is the oracle-mirrorable feature hash: DuckDB computes the exact
    same value as ``('0x' || substr(md5(s), 1, 16))::UBIGINT``, so SimHash
    bit majorities built on these features can be verified by SQL.  Slower
    than the blake2b/polynomial kernel (string join + md5 per window) —
    used by the oracle-checked query paths, not the pipeline hot path.
    """
    from hashlib import md5

    n = len(tokens)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    kk = min(k, n)
    return np.fromiter(
        (
            int.from_bytes(md5(" ".join(tokens[i : i + kk]).encode("utf-8")).digest()[:8], "big")
            for i in range(n - kk + 1)
        ),
        dtype=np.uint64,
        count=n - kk + 1,
    )


def to_i64(x: np.ndarray | int):
    """Reinterpret uint64 → int64 for Spark LongType transport."""
    if isinstance(x, np.ndarray):
        return x.view(np.int64)
    x = int(x)
    return x - (1 << 64) if x >= (1 << 63) else x
