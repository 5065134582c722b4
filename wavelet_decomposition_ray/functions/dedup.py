"""Deduplication operators over the ``documents`` table: exact,
MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (SURVEY.md §4.2; ray_guide patterns): content hashes are
computed vectorized inside ``map_batches``; the wide step is always a
``groupby`` on a SMALL derived key (hash / band bucket), never on raw text;
candidate pairs are verified exactly before being reported. At 10^12 rows
the same shapes hold — the groupby keys are fixed-width ints and the
verification joins are per-bucket.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

MERSENNE = (1 << 61) - 1


def _stable_u64(s: str) -> int:
    return struct.unpack("<Q", hashlib.md5(s.encode()).digest()[:8])[0]


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

def exact_hash_batch(batch: pa.Table) -> pa.Table:
    """Add a content hash (md5 hex) — the groupby key for exact dedup."""
    texts = batch["text"].to_pylist()
    h = [hashlib.md5(t.encode()).hexdigest() for t in texts]
    return batch.append_column("content_hash", pa.array(h, type=pa.string()))


def keep_first_group(group) -> "object":
    """map_groups fn: keep the row with the smallest doc_id per hash."""
    return group.nsmallest(1, "doc_id")


# --------------------------------------------------------------------------
# shingles / minhash
# --------------------------------------------------------------------------

def char_shingles(text: str, k: int = 5) -> np.ndarray:
    """Distinct k-char shingles as stable uint64s (vectorized rolling view)."""
    b = np.frombuffer(text.encode(), dtype=np.uint8)
    if len(b) < k:
        b = np.pad(b, (0, k - len(b)))
    win = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
    weights = (np.uint64(257) ** np.arange(k, dtype=np.uint64)).astype(np.uint64)
    hashes = (win * weights).sum(axis=1, dtype=np.uint64)
    # finalize with a 64-bit mix (splitmix64) for dispersion
    h = hashes + np.uint64(0x9E3779B97F4A7C15)
    h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    h = h ^ (h >> np.uint64(31))
    return np.unique(h)


class MinHasher:
    """MinHash signatures (n_perm universal-hash permutations) — stateful:
    the permutation coefficients are drawn once per actor from a fixed seed."""

    def __init__(self, n_perm: int = 64, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.n_perm = n_perm
        self.a = (rng.integers(1, MERSENNE, n_perm, dtype=np.int64) | 1).astype(np.uint64)
        self.b = rng.integers(0, MERSENNE, n_perm, dtype=np.int64).astype(np.uint64)

    def signature(self, shingle_hashes: np.ndarray) -> np.ndarray:
        if len(shingle_hashes) == 0:
            return np.full(self.n_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        x = shingle_hashes[:, None]
        # (a*x+b) mod p via uint64 wrap then mod — universal enough for LSH
        hashed = (x * self.a[None, :] + self.b[None, :]) % np.uint64(MERSENNE)
        return hashed.min(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        sigs = np.stack([self.signature(char_shingles(t)) for t in texts])
        flat = sigs.ravel().astype(np.uint64).view(np.int64)
        off = np.arange(len(texts) + 1, dtype=np.int64) * self.n_perm
        from .listops import numpy_to_list

        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "minhash": numpy_to_list(flat, off, pa.int64()),
            }
        )


def lsh_bands_batch(batch: pa.Table, n_bands: int = 16) -> pa.Table:
    """Explode signatures to (band_id, band_hash, doc_id) rows — the LSH
    bucket key for the near-dup groupby."""
    from .listops import list_to_numpy

    sig_flat, off = list_to_numpy(batch["minhash"])
    n_docs = len(off) - 1
    n_perm = int(off[1] - off[0]) if n_docs else 0
    rows_per_band = n_perm // n_bands
    sigs = sig_flat.reshape(n_docs, n_perm).view(np.uint64)
    band_hashes = np.empty((n_docs, n_bands), dtype=np.uint64)
    for b in range(n_bands):
        seg = sigs[:, b * rows_per_band : (b + 1) * rows_per_band]
        h = np.uint64(1469598103934665603)
        for c in range(rows_per_band):
            h = (h ^ seg[:, c]) * np.uint64(1099511628211)
        band_hashes[:, b] = h
    rep = pa.array(np.repeat(np.arange(n_docs), n_bands))
    doc_col = batch["doc_id"]
    if isinstance(doc_col, pa.ChunkedArray):
        doc_col = doc_col.combine_chunks()
    return pa.table(
        {
            "band_id": pa.array(np.tile(np.arange(n_bands, dtype=np.int32), n_docs)),
            "band_hash": pa.array(band_hashes.ravel().view(np.int64)),
            "doc_id": doc_col.take(rep),
        }
    )


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two distinct-shingle sets (sorted unique arrays)."""
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(a) + len(b) - inter
    return inter / union if union else 1.0


# --------------------------------------------------------------------------
# simhash
# --------------------------------------------------------------------------

def simhash64(text: str) -> int:
    """64-bit SimHash over word unigrams with stable md5-derived hashes."""
    acc = np.zeros(64, dtype=np.int64)
    for w in text.split():
        h = _stable_u64(w)
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def simhash_batch(batch: pa.Table) -> pa.Table:
    hs = [simhash64(t) for t in batch["text"].to_pylist()]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "simhash": pa.array(np.array(hs, dtype=np.uint64).view(np.int64)),
        }
    )


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a.view(np.uint64), b.view(np.uint64))
    cnt = np.zeros(len(x), dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x = x >> np.uint64(1)
    return cnt


# --------------------------------------------------------------------------
# word n-gram jaccard
# --------------------------------------------------------------------------

def word_ngrams(text: str, n: int = 3) -> set[str]:
    ws = text.split()
    return {" ".join(ws[i : i + n]) for i in range(max(len(ws) - n + 1, 0))}
