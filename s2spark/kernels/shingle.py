"""Batched NumPy shingle / MinHash kernels for the text dedup ops.

The SQL formulation in ops/text.py (explode one row per 5-char
shingle, 6 substring/ascii expressions per row, 12 mix-hash aggregate
expressions) is value-exact but pays Catalyst ~20 scalar expression
evaluations per character of corpus.  These kernels compute the SAME
int64 values (tri-dialect mix from sources/geo.mix_np, identical
positional 7-bit shingle codes) vectorized over a whole Arrow batch:
one uint32 codepoint array for the concatenated batch text, five
shifted adds for the positional codes, and segment-reduced minima for
the signatures.  Pure integer arithmetic -> bit-identical to the SQL
dialects (the driver's DuckDB oracle is unchanged).

Shingle definition (ops/text.py:_shingle_hash, mirrored in the
__spark_entry__ oracles): code(i) = sum_k codepoint(text[i+k]) *
128**k for k in 0..4, one shingle per start position (stride 1),
docs shorter than 5 chars contribute nothing.
"""

from __future__ import annotations

import numpy as np

from ..sources import geo

SHINGLE = 5
_POW = np.array([128 ** k for k in range(SHINGLE)], dtype=np.int64)


def _codepoints(texts) -> tuple[np.ndarray, np.ndarray]:
    """Concatenate a batch of strings -> (uint32 codepoints, int64
    per-doc lengths).  UTF-32 decode = exact codepoints, matching
    Spark/DuckDB ascii()/unicode() on every input, not just 7-bit."""
    lens = np.fromiter((len(t) for t in texts), count=len(texts),
                       dtype=np.int64)
    blob = "".join(texts).encode("utf-32-le")
    cp = np.frombuffer(blob, dtype=np.uint32)
    return cp, lens


def shingle_codes_batch(texts) -> tuple[np.ndarray, np.ndarray]:
    """All positional shingle codes for a batch of docs.

    -> (codes int64 [total_shingles], n_shingles int64 [n_docs]) with
    codes grouped by doc in input order; n_shingles = max(len-4, 0).
    """
    cp, lens = _codepoints(texts)
    n = cp.shape[0]
    if n < SHINGLE:
        return (np.empty(0, dtype=np.int64),
                np.zeros(len(lens), dtype=np.int64))
    c = cp.astype(np.int64)
    m = n - (SHINGLE - 1)
    codes = c[:m] * _POW[0]
    for k in range(1, SHINGLE):
        codes = codes + c[k:k + m] * _POW[k]
    # window starts whose 5 chars stay inside one doc: global start
    # position p is valid iff p + 5 <= end(doc containing p)
    ends = np.cumsum(lens)
    starts = ends - lens
    n_sh = np.maximum(lens - (SHINGLE - 1), 0)
    keep = np.zeros(m + 1, dtype=np.int64)
    valid = n_sh > 0
    np.add.at(keep, starts[valid].clip(max=m), 1)
    np.add.at(keep, (starts[valid] + n_sh[valid]).clip(max=m), -1)
    mask = np.cumsum(keep[:-1]) > 0
    return codes[mask], n_sh


def minhash_batch(texts, salt: int, n_hashes: int) -> np.ndarray:
    """MinHash signatures -> int64 [n_docs, n_hashes].  Docs with no
    shingle get int64-max sentinel rows (the SQL MIN over an empty
    group is NULL — callers filter length >= 5 first, matching
    ops/text.py, so sentinels never reach a result)."""
    codes, n_sh = shingle_codes_batch(texts)
    out = np.full((len(n_sh), n_hashes), np.iinfo(np.int64).max,
                  dtype=np.int64)
    has = n_sh > 0
    if not codes.shape[0]:
        return out
    bounds = np.concatenate(([0], np.cumsum(n_sh[has])))[:-1]
    for j in range(n_hashes):
        h = geo.mix_np(codes, salt + j)
        out[has, j] = np.minimum.reduceat(h, bounds)
    return out


def sorted_inter_counts(sa, sb) -> np.ndarray:
    """|a ∩ b| for a batch of pairs of SORTED-DISTINCT int64 arrays
    (the shingle_sets_batch output contract) -> int64 [n_pairs].

    Fully vectorized: pack (pair_ordinal << 36 | code) for both sides,
    one global sort, count adjacent equals per pair — no per-pair
    Python.  Values must fit 36 bits (shingle codes do: < 2^35 for
    7-bit text, guarded); falls back to per-pair set intersection for
    wider values."""
    n = len(sa)
    la = np.fromiter((len(a) for a in sa), count=n, dtype=np.int64)
    lb = np.fromiter((len(b) for b in sb), count=n, dtype=np.int64)
    if not n or int(la.sum() + lb.sum()) == 0:
        return np.zeros(n, dtype=np.int64)
    flat_a = (np.concatenate([np.asarray(a, dtype=np.int64) for a in sa])
              if la.sum() else np.empty(0, np.int64))
    flat_b = (np.concatenate([np.asarray(b, dtype=np.int64) for b in sb])
              if lb.sum() else np.empty(0, np.int64))
    hi = max(flat_a.max(initial=0), flat_b.max(initial=0))
    lo = min(flat_a.min(initial=0), flat_b.min(initial=0))
    if lo < 0 or hi >= (1 << 36):
        return np.fromiter(
            (len(np.intersect1d(a, b)) for a, b in zip(sa, sb)),
            count=n, dtype=np.int64)
    ids = np.arange(n, dtype=np.int64)
    packed = np.concatenate([
        (np.repeat(ids, la) << 36) | flat_a,
        (np.repeat(ids, lb) << 36) | flat_b])
    packed.sort(kind="stable")
    dup = packed[1:] == packed[:-1]
    return np.bincount((packed[1:][dup] >> 36), minlength=n)


def shingle_sets_batch(texts) -> list[np.ndarray]:
    """Per-doc DISTINCT shingle codes (sorted ascending) -> list of
    int64 arrays.  One global sort: codes < 2^35 pack with the doc
    ordinal into one int64 key."""
    codes, n_sh = shingle_codes_batch(texts)
    n_docs = len(n_sh)
    if not codes.shape[0]:
        return [np.empty(0, dtype=np.int64)] * n_docs
    seg = np.repeat(np.arange(n_docs, dtype=np.int64), n_sh)
    if codes.max() >= (1 << 36):  # non-BMP text: codes outgrow the pack
        return [np.unique(codes[seg == i]) for i in range(n_docs)]
    key = np.unique((seg << 36) | codes)
    kseg = key >> 36
    kcode = key & ((np.int64(1) << 36) - 1)
    cuts = np.searchsorted(kseg, np.arange(n_docs + 1))
    return [kcode[cuts[i]:cuts[i + 1]] for i in range(n_docs)]
