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


# splitmix64 finalizer constants (public domain, Steele et al. / Vigna)
SPLITMIX_C1 = 0x9E3779B97F4A7C15
SPLITMIX_C2 = 0xBF58476D1CE4E5B9
SPLITMIX_C3 = 0x94D049BB133111EB
# per-use salts so each sampling decision is decorrelated from the others;
# derived once from the old string-salt convention (two md5 calls at import)
SPLIT_SALT = _stable_u64("split:")
MIX_SALT = _stable_u64("mix:")


def salted_split_u64(ids: np.ndarray, salt: int) -> np.ndarray:
    """Vectorized deterministic per-id hash: splitmix64(doc_id XOR salt).

    This is the content-addressed sampling hash (train/holdout split,
    mixture sampling, corpus_clean): one integer mix over the whole ids
    array instead of a per-row Python md5 loop (VERDICT r3 #3), with a
    bit-exact HUGEINT SQL twin (data_queries._splitmix_bucket_sql)."""
    z = ids.astype(np.uint64) ^ np.uint64(salt)
    z = z + np.uint64(SPLITMIX_C1)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(SPLITMIX_C2)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(SPLITMIX_C3)
    return z ^ (z >> np.uint64(31))


def salted_bucket(ids: np.ndarray, salt: int, mod: int = 1000) -> np.ndarray:
    """Per-mille (or mod-``mod``) sampling bucket from the salted hash."""
    return (salted_split_u64(ids, salt) % np.uint64(mod)).astype(np.int64)


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


def exact_hash_part_batch(batch: pa.Table, n_parts: int) -> pa.Table:
    """(doc_id, text) -> (doc_id, content_hash, part): md5 hex plus a
    coarse partition id from the digest's first two bytes — computed in the
    same per-row loop, so the partition key costs nothing extra. Feeds the
    coarse-partition non-survivor fold (``_dropped_dup_ids``)."""
    texts = batch["text"].to_pylist()
    digests = [hashlib.md5(t.encode()).digest() for t in texts]
    part = np.array(
        [int.from_bytes(d[:2], "little") % n_parts for d in digests],
        dtype=np.int32,
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "content_hash": pa.array([d.hex() for d in digests],
                                     type=pa.string()),
            "part": pa.array(part),
        }
    )


def non_survivor_fold(df):
    """map_groups fn over a coarse hash partition: emit the doc_ids that are
    NOT the per-content_hash minimum — the dropped duplicates. Output is
    duplicates-only (<< corpus), the broadcast-safe complement of the
    survivor set (VERDICT r3 #2)."""
    m = df.groupby("content_hash")["doc_id"].transform("min")
    return df.loc[df["doc_id"] != m, ["doc_id"]]


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
# set blobs: distinct-element sets as packed int64 bytes. Arrow list columns
# are rejected as join payloads by the hash join (Acero), so the per-doc
# shingle/gram sets travel through Dataset.join as binary blobs instead.
# --------------------------------------------------------------------------

def set_blob(arr: np.ndarray) -> bytes:
    """Sorted unique uint64 set -> little-endian bytes."""
    return np.ascontiguousarray(arr, dtype=np.uint64).astype("<u8").tobytes()


def blob_set(b: bytes) -> np.ndarray:
    return np.frombuffer(b, dtype="<u8")


def shingle_sets_batch(batch: pa.Table, k: int = 5) -> pa.Table:
    """(doc_id, text) -> (doc_id, set_blob, set_size): the distinct char-k
    shingle set per doc, packed for join transport.

    Vectorized across the WHOLE batch: one sliding-window hash over the
    concatenated utf-8 bytes (windows crossing doc boundaries are simply
    never indexed), one lexsort for the per-doc distinct sets — identical
    output to per-doc :func:`char_shingles`, which remains the reference
    and the fallback for sub-k texts."""
    texts = batch["text"].to_pylist()
    n = len(texts)
    enc = [t.encode() for t in texts]
    lens = np.array([len(b) for b in enc], dtype=np.int64)
    if n == 0 or (lens < k).any():
        # rare short-text path: keep the scalar reference semantics
        blobs = [set_blob(char_shingles(t, k)) for t in texts]
        sizes = np.array([len(b) // 8 for b in blobs], dtype=np.int64)
    else:
        buf = np.frombuffer(b"".join(enc), dtype=np.uint8)
        weights = (np.uint64(257) ** np.arange(k, dtype=np.uint64)).astype(
            np.uint64
        )
        # flat k-term accumulation (no (N, k) window materialization)
        m_len = len(buf) - k + 1
        h = np.zeros(m_len, dtype=np.uint64)
        for m in range(k):
            h += buf[m : m + m_len].astype(np.uint64) * weights[m]
        h = h + np.uint64(0x9E3779B97F4A7C15)
        h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        h = h ^ (h >> np.uint64(31))
        off = np.concatenate([[0], np.cumsum(lens)])
        n_win = lens - (k - 1)
        doc_of = np.repeat(np.arange(n), n_win)
        pos = np.arange(len(doc_of)) - np.repeat(
            np.cumsum(n_win) - n_win, n_win
        )
        hv = h[off[:-1][doc_of] + pos]
        order = np.lexsort((hv, doc_of))
        dv, hvs = doc_of[order], hv[order]
        keep = np.ones(len(dv), dtype=bool)
        keep[1:] = (dv[1:] != dv[:-1]) | (hvs[1:] != hvs[:-1])
        dv, hvs = dv[keep], hvs[keep]
        sizes = np.bincount(dv, minlength=n).astype(np.int64)
        soff = np.concatenate([[0], np.cumsum(sizes)])
        raw = np.ascontiguousarray(hvs).astype("<u8").tobytes()
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "set_blob": blob_array_from_flat(raw, soff),
                "set_size": pa.array(sizes),
            }
        )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "set_blob": pa.array(blobs, type=pa.binary()),
            "set_size": pa.array(sizes),
        }
    )


def blob_array_from_flat(raw: bytes, set_off: np.ndarray) -> pa.Array:
    """Zero-copy pa.binary array over one flat value buffer: element i =
    raw[set_off[i]*8 : set_off[i+1]*8] — no per-doc byte slicing."""
    byte_off = (set_off * 8).astype(np.int32)
    assert len(raw) < (1 << 31), "binary column over 2 GiB: split the batch"
    return pa.Array.from_buffers(
        pa.binary(), len(byte_off) - 1,
        [None, pa.py_buffer(byte_off.tobytes()), pa.py_buffer(raw)],
    )


class WordHasher:
    """Stable word -> uint64 hashes with a per-actor cache. The synthetic
    corpora (and natural text) reuse a small vocabulary, so hashing each
    distinct word once per actor removes the per-token md5 loop."""

    def __init__(self):
        self.cache: dict[str, int] = {}

    def hash_words(self, words: list[str]) -> np.ndarray:
        cache = self.cache
        out = np.empty(len(words), dtype=np.uint64)
        for i, w in enumerate(words):
            h = cache.get(w)
            if h is None:
                h = _stable_u64(w)
                cache[w] = h
            out[i] = h
        return out


def _mix3(h0: np.ndarray, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    """Combine three word hashes into a 3-gram hash (order-sensitive,
    vectorized). Distinct grams map to distinct hashes w.h.p., which is all
    Jaccard-over-distinct-sets needs."""
    h = (
        h0 * np.uint64(0x9E3779B97F4A7C15)
        + h1 * np.uint64(0xC2B2AE3D27D4EB4F)
        + h2 * np.uint64(0x165667B19E3779F9)
    )
    h = (h ^ (h >> np.uint64(29))) * np.uint64(0xBF58476D1CE4E5B9)
    return h ^ (h >> np.uint64(32))


class GramSets:
    """Actor/batch fn: (doc_id, text) -> (doc_id, set_blob, set_size) of
    distinct word-3-gram hashes. Word hashes come from the cached
    :class:`WordHasher`; the gram combine is one vectorized mix over all
    grams of the batch (no per-gram Python)."""

    def __init__(self, n: int = 3):
        assert n == 3, "only 3-grams wired (reference query uses n=3)"
        self.wh = WordHasher()

    def __call__(self, batch: pa.Table) -> pa.Table:
        # batch-vectorized like shingle_sets_batch: one _mix3 over the
        # concatenated word-hash stream (grams straddling a doc boundary
        # are masked out), one lexsort for the per-doc distinct sets, one
        # flat buffer for all blobs — no per-doc Python loop
        texts = batch["text"].to_pylist()
        words_per_doc = [t.split() for t in texts]
        flat = [w for ws in words_per_doc for w in ws]
        hw = self.wh.hash_words(flat)
        n = len(texts)
        lens = np.array([len(ws) for ws in words_per_doc], dtype=np.int64)
        doc_of = np.repeat(np.arange(n), lens)
        if len(hw) >= 3:
            valid = doc_of[:-2] == doc_of[2:]
            gh = _mix3(hw[:-2], hw[1:-1], hw[2:])[valid]
            gd = doc_of[:-2][valid]
            order = np.lexsort((gh, gd))
            gd, gh = gd[order], gh[order]
            keep = np.ones(len(gd), dtype=bool)
            keep[1:] = (gd[1:] != gd[:-1]) | (gh[1:] != gh[:-1])
            gd, gh = gd[keep], gh[keep]
        else:
            gd = np.empty(0, dtype=np.int64)
            gh = np.empty(0, dtype=np.uint64)
        sizes = np.bincount(gd, minlength=n).astype(np.int64)
        soff = np.concatenate([[0], np.cumsum(sizes)])
        raw = np.ascontiguousarray(gh).astype("<u8").tobytes()
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "set_blob": blob_array_from_flat(raw, soff),
                "set_size": pa.array(sizes),
            }
        )


def minhash_from_sets_batch(batch: pa.Table, hasher: "MinHasher") -> pa.Table:
    """(doc_id, set_blob) -> (doc_id, minhash list<int64>)."""
    blobs = batch["set_blob"].to_pylist()
    sigs = np.stack([hasher.signature(blob_set(b)) for b in blobs]) if blobs else (
        np.empty((0, hasher.n_perm), dtype=np.uint64)
    )
    flat = sigs.ravel().astype(np.uint64).view(np.int64)
    off = np.arange(len(blobs) + 1, dtype=np.int64) * hasher.n_perm
    from .listops import numpy_to_list

    return pa.table(
        {"doc_id": batch["doc_id"], "minhash": numpy_to_list(flat, off, pa.int64())}
    )


def make_capped_pairs(cap: int):
    """map_groups fn factory: emit all id pairs of a candidate bucket,
    skipping buckets larger than ``cap`` (O(cap^2) bound per bucket — the
    hot-key guard). Skips are LOGGED, never silent: a warning names the
    bucket key and size. Pairs lost this way can only be pairs whose every
    shared band/gram is that hot — recall is re-checked by the planted-dup
    pytest gate."""
    import logging

    log = logging.getLogger("wavelet_decomposition_ray.dedup")

    def capped_pairs(group):
        import pandas as pd

        ids = np.unique(group["doc_id"].to_numpy())
        if len(ids) > cap:
            key_cols = [c for c in group.columns if c != "doc_id"]
            key = {c: group[c].iloc[0] for c in key_cols}
            log.warning(
                "dropping candidate bucket %s: %d docs > cap %d",
                key, len(ids), cap,
            )
            return pd.DataFrame({"doc_a": [], "doc_b": []}, dtype=np.int64)
        i, j = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"doc_a": ids[i], "doc_b": ids[j]})

    return capped_pairs


DROP_FRACTION_ALERT = 0.10  # error-level log past this dropped-mass share


def make_partition_pairs(key_cols: list[str], cap: int):
    """map_groups fn factory over a COARSE partition (``part`` column):
    emits all id pairs per exact candidate key inside the partition. One
    Ray group per partition instead of one per bucket — thousands of
    micro-groups through groupby().map_groups() measured ~100x slower than
    the underlying pair arithmetic.

    Oversized buckets drop with a logged warning, and the partition's
    TOTAL dropped candidate mass (sum of C(n,2) over dropped buckets, as a
    fraction of all candidate mass) is surfaced at the end — at error
    level past DROP_FRACTION_ALERT, so a corpus whose buckets are
    systematically over the cap (recall silently collapsing toward 0)
    fails loudly in the logs rather than returning a quietly-empty pair
    set (ADVICE r2)."""
    import logging

    log = logging.getLogger("wavelet_decomposition_ray.dedup")

    def partition_pairs(df):
        import pandas as pd

        outs_a, outs_b = [], []
        kept_mass = 0
        dropped_mass = 0
        dropped_buckets = 0
        for key, sub in df.groupby(key_cols, sort=False):
            ids = np.unique(sub["doc_id"].to_numpy())
            mass = len(ids) * (len(ids) - 1) // 2
            if len(ids) > cap:
                dropped_mass += mass
                dropped_buckets += 1
                log.warning(
                    "dropping candidate bucket %s=%s: %d docs > cap %d",
                    key_cols, key, len(ids), cap,
                )
                continue
            kept_mass += mass
            i, j = np.triu_indices(len(ids), k=1)
            outs_a.append(ids[i])
            outs_b.append(ids[j])
        if dropped_mass:
            frac = dropped_mass / max(kept_mass + dropped_mass, 1)
            lvl = log.error if frac > DROP_FRACTION_ALERT else log.warning
            lvl(
                "partition dropped %d candidate pairs across %d hot "
                "buckets (%.1f%% of candidate mass; cap=%d) — recall is "
                "below 1 for pairs confined to those buckets",
                dropped_mass, dropped_buckets, 100.0 * frac, cap,
            )
        if not outs_a:
            return pd.DataFrame(
                {"doc_a": np.empty(0, np.int64), "doc_b": np.empty(0, np.int64)}
            )
        return pd.DataFrame(
            {"doc_a": np.concatenate(outs_a), "doc_b": np.concatenate(outs_b)}
        )

    return partition_pairs


def add_part_column(t: pa.Table, key_col: str, n_parts: int) -> pa.Table:
    """Coarse partition id from a bucket-key column (vectorized)."""
    k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
    part = ((k % n_parts) + n_parts) % n_parts
    return t.append_column("part", pa.array(part.astype(np.int32)))


def jaccard_sorted(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two SORTED unique arrays (the set_blob layout) via
    a searchsorted merge — no re-sort, unlike np.intersect1d. Matches
    :func:`jaccard` exactly."""
    if len(a) > len(b):
        a, b = b, a
    if len(a) == 0:
        return 1.0 if len(b) == 0 else 0.0
    idx = np.searchsorted(b, a)
    idx[idx == len(b)] = len(b) - 1
    inter = int((b[idx] == a).sum())
    union = len(a) + len(b) - inter
    return inter / union


def containment_sorted(a: np.ndarray, b: np.ndarray) -> float:
    """Exact one-way containment |A∩B| / min(|A|,|B|) of two SORTED unique
    arrays (Broder's containment, the asymmetric complement to Jaccard:
    it stays high when a short doc is quoted inside a long one, where
    Jaccard collapses). Same searchsorted merge as :func:`jaccard_sorted`."""
    if len(a) > len(b):
        a, b = b, a
    if len(a) == 0:
        return 1.0 if len(b) == 0 else 0.0
    idx = np.searchsorted(b, a)
    idx[idx == len(b)] = len(b) - 1
    inter = int((b[idx] == a).sum())
    return inter / len(a)


def verify_containment_blob_batch(t: pa.Table, tau: float) -> pa.Table:
    """(doc_a, doc_b, blob_a, blob_b) -> exact-containment-verified pairs."""
    a = t["doc_a"].to_numpy(zero_copy_only=False)
    b = t["doc_b"].to_numpy(zero_copy_only=False)
    ba = t["blob_a"].to_pylist()
    bb = t["blob_b"].to_pylist()
    c = np.array(
        [containment_sorted(blob_set(x), blob_set(y))
         for x, y in zip(ba, bb)],
        dtype=np.float64,
    )
    keep = c >= tau
    return pa.table(
        {
            "doc_a": pa.array(a[keep]),
            "doc_b": pa.array(b[keep]),
            "containment": pa.array(np.round(c[keep], 6)),
        }
    )


def verify_pairs_blob_batch(t: pa.Table, tau: float) -> pa.Table:
    """(doc_a, doc_b, blob_a, blob_b) -> exact-Jaccard-verified pairs."""
    a = t["doc_a"].to_numpy(zero_copy_only=False)
    b = t["doc_b"].to_numpy(zero_copy_only=False)
    ba = t["blob_a"].to_pylist()
    bb = t["blob_b"].to_pylist()
    j = np.array(
        [jaccard_sorted(blob_set(x), blob_set(y)) for x, y in zip(ba, bb)],
        dtype=np.float64,
    )
    keep = j >= tau
    return pa.table(
        {
            "doc_a": pa.array(a[keep]),
            "doc_b": pa.array(b[keep]),
            "jaccard": pa.array(np.round(j[keep], 6)),
        }
    )


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


class SimHasher:
    """Vectorized SimHash (identical output to :func:`simhash64`): hash only
    the batch's DISTINCT words (per-actor cache), expand each distinct hash
    to a ±1 bit-vote row once, then per-doc votes are one ``add.reduceat``
    over the word stream — no per-word Python in the hot path."""

    def __init__(self):
        self.wh = WordHasher()
        self._shifts = np.arange(64, dtype=np.uint64)
        # precomputed: uint64 left-shift-by-array is pathologically slow here
        self._pow2 = np.uint64(1) << self._shifts

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        words_per_doc = [t.split() for t in texts]
        lens = np.array([len(ws) for ws in words_per_doc], dtype=np.int64)
        off = np.concatenate([[0], np.cumsum(lens)])
        flat = [w for ws in words_per_doc for w in ws]
        out = np.zeros(len(texts), dtype=np.uint64)
        if flat:
            uniq, inv = np.unique(np.array(flat, dtype=object), return_inverse=True)
            hu = self.wh.hash_words(uniq.tolist())
            bits = ((hu[:, None] >> self._shifts[None, :]) & np.uint64(1)).astype(
                np.int32
            ) * 2 - 1  # (U, 64) ±1 votes
            stream = bits[inv]  # (total_words, 64)
            nonempty = lens > 0
            votes = np.add.reduceat(stream, off[:-1][nonempty], axis=0)
            codes = votes > 0
            packed = (codes.astype(np.uint64) * self._pow2).sum(
                axis=1, dtype=np.uint64
            )
            out[nonempty] = packed
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "simhash": pa.array(out.view(np.int64)),
            }
        )


def simhash_batch(batch: pa.Table) -> pa.Table:
    """Stateless wrapper (scalar-path compatible) around :class:`SimHasher`."""
    return SimHasher()(batch)


_POPCNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized popcount(xor): bytewise table lookup (no 64-step shift
    loop; left shifts on uint64 are pathologically slow here anyway)."""
    x = np.bitwise_xor(
        np.ascontiguousarray(a).view(np.uint64),
        np.ascontiguousarray(b).view(np.uint64),
    )
    return _POPCNT8[x.view(np.uint8).reshape(len(x), 8)].sum(axis=1)


# 7 bands over 64 bits (10+9*6): pigeonhole needs MORE bands than the max
# hamming distance (6) for a guaranteed clean band; 7 is the minimum, which
# maximizes per-band width (512-1024 buckets/band vs 256 for byte bands) —
# 2-4x more selective before the occupancy cap starts dropping buckets
# (ADVICE r2: byte-band occupancy N/256 overwhelmed the cap past ~65k docs)
SIMHASH_BAND_BITS = (10, 9, 9, 9, 9, 9, 9)


# ---- large-corpus SimHash banding (Manku et al., WWW'07) ----------------
# The minimal 7-band split buckets N/512..N/1024 docs together, so past
# ~100k docs even fully random hashes produce quadratic candidate mass
# (measured: 1M diverse docs -> billions of candidate pairs). The
# scale-correct scheme keys each band on a COMBINATION of hash blocks:
# split 64 bits into 9 blocks; a pair at hamming <= 6 has >= 3 clean
# blocks, so keying every C(9,3)=84 block-triple guarantees at least one
# exact-match band — recall stays EXACTLY 1 — while each key is ~22 bits
# wide (4M buckets/band), collapsing random collisions by ~2^12.
SIMHASH_BLOCK_BITS = (8, 7, 7, 7, 7, 7, 7, 7, 7)  # 9 blocks, 64 bits
_SIMHASH_BLOCK_SHIFTS = np.cumsum((0,) + SIMHASH_BLOCK_BITS[:-1]).astype(
    np.uint64
)
_SIMHASH_BLOCK_MASKS = np.array(
    [(1 << b) - 1 for b in SIMHASH_BLOCK_BITS], dtype=np.uint64
)


def _simhash_families() -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    from itertools import combinations

    f = np.array(list(combinations(range(len(SIMHASH_BLOCK_BITS)), 3)),
                 dtype=np.int64)
    return f[:, 0], f[:, 1], f[:, 2]


_FAM_I, _FAM_J, _FAM_K = _simhash_families()
SIMHASH_N_FAMILIES = len(_FAM_I)  # 84
# switch to block banding once the minimal split's expected bucket
# occupancy (N / 512) would dominate candidate volume
SIMHASH_BLOCK_THRESHOLD = 100_000


def simhash_block_bands_batch(batch: pa.Table) -> pa.Table:
    """Explode 64-bit simhashes into the 84 block-triple bands (same
    output schema as :func:`simhash_bands_batch`): band_id = triple index,
    band_hash = the three block values packed 8 bits apart (block values
    are < 2^8, so the key fits int32)."""
    h = batch["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
    n = len(h)
    blocks = (h[:, None] >> _SIMHASH_BLOCK_SHIFTS[None, :]) & \
        _SIMHASH_BLOCK_MASKS[None, :]  # (n, 9)
    keys = (
        blocks[:, _FAM_I]
        | (blocks[:, _FAM_J] << np.uint64(8))
        | (blocks[:, _FAM_K] << np.uint64(16))
    )  # (n, 84)
    nb = SIMHASH_N_FAMILIES
    rep = np.repeat(np.arange(n), nb)
    doc = batch["doc_id"]
    if isinstance(doc, pa.ChunkedArray):
        doc = doc.combine_chunks()
    return pa.table(
        {
            "band_id": pa.array(np.tile(np.arange(nb, dtype=np.int32), n)),
            "band_hash": pa.array(keys.ravel().astype(np.int32)),
            "doc_id": doc.take(pa.array(rep)),
        }
    )
_SIMHASH_SHIFTS = np.cumsum((0,) + SIMHASH_BAND_BITS[:-1]).astype(np.uint64)
_SIMHASH_MASKS = np.array(
    [(1 << b) - 1 for b in SIMHASH_BAND_BITS], dtype=np.uint64
)


def simhash_bands_batch(batch: pa.Table) -> pa.Table:
    """Explode 64-bit simhashes into the 7 pigeonhole bands: any pair at
    hamming <= 6 differs in at most 6 of the 7 bands, so at least one band
    matches exactly — candidate recall for the hamming<=6 predicate is
    EXACTLY 1 *before* the occupancy cap; buckets past the cap are dropped
    loudly (make_partition_pairs), which is the only recall loss channel."""
    h = batch["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
    n = len(h)
    nb = len(SIMHASH_BAND_BITS)
    # (n, nb) band values: right shift is fast in this numpy build
    vals = (h[:, None] >> _SIMHASH_SHIFTS[None, :]) & _SIMHASH_MASKS[None, :]
    rep = np.repeat(np.arange(n), nb)
    doc = batch["doc_id"]
    if isinstance(doc, pa.ChunkedArray):
        doc = doc.combine_chunks()
    return pa.table(
        {
            "band_id": pa.array(np.tile(np.arange(nb, dtype=np.int32), n)),
            "band_hash": pa.array(vals.ravel().astype(np.int32)),
            "doc_id": doc.take(pa.array(rep)),
        }
    )


# --------------------------------------------------------------------------
# word n-gram jaccard
# --------------------------------------------------------------------------

def word_ngrams(text: str, n: int = 3) -> set[str]:
    ws = text.split()
    return {" ".join(ws[i : i + n]) for i in range(max(len(ws) - n + 1, 0))}
