"""Fingerprint kernels: shingle hashing, MinHash signatures, SimHash.

Graft analog of the UMI itself (reference ``lib/umi_data.py:5``): where the
reference carries a fixed-length ACGT barcode per read, we derive a MinHash
signature (``array<int>``) and a 64-bit SimHash fingerprint (``long``) per
document. All kernels are Arrow-vectorized pandas UDFs with numpy bodies —
no per-row Python (BASELINE.json input_hint mandate). The Hamming-distance
predicate itself stays JVM-side (``F.bit_count(a ^ b)``), mirroring
``lib/sequence_error.py:22-25``.

Hash functions:
* token/shingle hash: 64-bit blake2b per unique token (cached per Arrow
  batch, C speed), combined per shingle with a vectorized uint64
  polynomial — deterministic across runs/processes (unlike Python
  ``hash``). At cluster scale one would swap in xxhash64; semantics equal.
* MinHash permutations: h_i(x) = (a_i*x + b_i) mod p with p = 2^31-1
  (Mersenne). Keeping the permutation space at 31 bits makes a_i*x fit
  exactly in uint64 (fully vectorized, no bigint fallback) and signature
  values fit int32 — and the same arithmetic is expressible in ANSI SQL
  for the DuckDB correctness oracle.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

MERSENNE31 = np.uint64((1 << 31) - 1)
_POLY = np.uint64(1099511628211)  # FNV prime as shingle combiner multiplier
_FNV_BASIS = np.uint64(1469598103934665603)


def _token_hash64(token: str) -> int:
    return int.from_bytes(hashlib.blake2b(token.encode(), digest_size=8).digest(), "little")


def shingle_hashes(text: str, k: int, _cache: dict | None = None) -> np.ndarray:
    """Distinct uint64 hashes of the k-token shingles of ``text``.

    Vectorized: per-unique-token blake2b (C), then a sliding-window
    polynomial combine in numpy. Docs with <= k tokens hash as one shingle.
    """
    toks = text.split()
    if not toks:
        toks = [""]
    cache = _cache if _cache is not None else {}
    th = np.empty(len(toks), dtype=np.uint64)
    for i, t in enumerate(toks):
        v = cache.get(t)
        if v is None:
            v = _token_hash64(t)
            cache[t] = v
        th[i] = v
    n = len(th)
    with np.errstate(over="ignore"):
        if n <= k:
            acc = _FNV_BASIS
            for h in th:
                acc = acc * _POLY + h  # wrapping uint64
            return np.array([acc], dtype=np.uint64)
        win = np.lib.stride_tricks.sliding_window_view(th, k)
        acc = np.full(win.shape[0], _FNV_BASIS, dtype=np.uint64)
        for j in range(k):
            acc = acc * _POLY + win[:, j]
    return np.unique(acc)


@lru_cache(maxsize=8)
def minhash_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Seeded (a, b) permutation parameters for h_i(x) = (a_i*x+b_i) mod p."""
    rng = np.random.RandomState(seed)
    p = int(MERSENNE31)
    a = rng.randint(1, p, size=num_perm).astype(np.uint64)
    b = rng.randint(0, p, size=num_perm).astype(np.uint64)
    return a, b


def minhash_signature(hashes: np.ndarray, num_perm: int, seed: int) -> np.ndarray:
    """MinHash signature (int32[num_perm]) of a set of uint64 shingle hashes.

    sig_i = min over shingles x of (a_i * (x mod p) + b_i) mod p, p = 2^31-1.
    a*x <= (2^31)^2 < 2^64, so the arithmetic is exact in uint64.
    """
    a, b = minhash_params(num_perm, seed)
    x = (hashes % MERSENNE31)[:, None]  # (n, 1) uint64
    vals = (x * a[None, :] + b[None, :]) % MERSENNE31  # (n, num_perm)
    return np.min(vals, axis=0).astype(np.int32)


def simhash64(hashes: np.ndarray) -> int:
    """64-bit SimHash of a set of uint64 shingle hashes (signed int64)."""
    bits = np.unpackbits(
        hashes.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
    )
    votes = 2 * bits.sum(axis=0, dtype=np.int64) - len(hashes)
    fp = np.uint64(0)
    for bpos in np.flatnonzero(votes > 0):
        fp |= np.uint64(1) << np.uint64(bpos)
    return int(fp.astype(np.int64))


def _fingerprint_batch(
    texts: pd.Series, k: int, num_perm: int, seed: int
) -> tuple[list[np.ndarray], np.ndarray]:
    cache: dict = {}
    sigs: list[np.ndarray] = []
    sims = np.empty(len(texts), dtype=np.int64)
    for idx, t in enumerate(texts):
        h = shingle_hashes(t if isinstance(t, str) else "", k, cache)
        sigs.append(minhash_signature(h, num_perm, seed))
        sims[idx] = simhash64(h)
    return sigs, sims


def make_fingerprint_udf(k: int, num_perm: int, seed: int):
    """pandas_udf: text -> struct(minhash array<int>, simhash long).

    One UDF computes both fingerprints so shingles are hashed once per doc.
    """
    schema = T.StructType(
        [
            T.StructField("minhash", T.ArrayType(T.IntegerType())),
            T.StructField("simhash", T.LongType()),
        ]
    )

    @F.pandas_udf(schema)
    def fingerprint_udf(texts: pd.Series) -> pd.DataFrame:
        sigs, sims = _fingerprint_batch(texts, k, num_perm, seed)
        return pd.DataFrame({"minhash": sigs, "simhash": sims})

    return fingerprint_udf


def make_minhash_udf(k: int, num_perm: int, seed: int):
    """pandas_udf: text -> array<int> MinHash signature."""

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def minhash_udf(texts: pd.Series) -> pd.Series:
        sigs, _ = _fingerprint_batch(texts, k, num_perm, seed)
        return pd.Series(sigs)

    return minhash_udf


def make_simhash_udf(k: int):
    """pandas_udf: text -> long 64-bit SimHash fingerprint."""

    @F.pandas_udf(T.LongType())
    def simhash_udf(texts: pd.Series) -> pd.Series:
        cache: dict = {}
        out = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            out[i] = simhash64(shingle_hashes(t if isinstance(t, str) else "", k, cache))
        return pd.Series(out)

    return simhash_udf


def hamming64(col_a, col_b):
    """JVM-side Hamming distance between two 64-bit fingerprints —
    ``bit_count(a XOR b)``; mirrors reference ``lib/sequence_error.py:22-25``."""
    return F.bit_count(col_a.bitwiseXOR(col_b))


def minhash_jaccard(col_a, col_b):
    """JVM-side estimated Jaccard from two MinHash signatures:
    fraction of equal positions (zip_with + aggregate, no Python)."""
    eq = F.zip_with(col_a, col_b, lambda x, y: (x == y).cast("int"))
    return F.aggregate(eq, F.lit(0), lambda acc, v: acc + v).cast("double") / F.size(col_a)
