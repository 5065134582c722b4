"""Text-analysis operators over the ``documents`` table: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

All batch fns are vectorized (pandas string kernels / numpy) and designed
for ``map_batches``; the stateful ones (compiled regexes, language profiles)
are callable classes so they run as actor pools with setup in ``__init__``.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa


def token_count_batch(batch: pa.Table) -> pa.Table:
    """Whitespace token count + byte-level stats per document.
    SQL-checkable: splits on whitespace runs, ignoring leading/trailing."""
    import pandas as pd

    text = batch["text"].to_pandas()
    n_words = text.str.split().str.len().fillna(0).astype(np.int64)
    word_chars = text.str.replace(r"\s", "", regex=True).str.len().astype(np.int64)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_words": pa.array(n_words.to_numpy()),
            "word_chars": pa.array(word_chars.to_numpy()),
        }
    )


def quality_batch(batch: pa.Table) -> pa.Table:
    """Quality signals: word count, mean word length, type-token ratio.
    The length/ratio family of heuristics used for training-data filtering."""
    import pandas as pd

    text = batch["text"].to_pandas()
    words = text.str.split()
    n_words = words.str.len().fillna(0).astype(np.int64)
    word_chars = text.str.replace(r"\s", "", regex=True).str.len().astype(np.int64)
    avg_wl = np.where(n_words > 0, word_chars / np.maximum(n_words, 1), 0.0)
    uniq = words.map(lambda ws: len(set(ws)) if isinstance(ws, list) else 0)
    ttr = np.where(n_words > 0, uniq / np.maximum(n_words, 1), 0.0)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_words": pa.array(n_words.to_numpy()),
            "avg_word_len": pa.array(np.round(avg_wl, 6)),
            "type_token_ratio": pa.array(np.round(ttr, 6)),
        }
    )


class LangId:
    """Character-n-gram language-ID heuristic (actor-pool stage).

    Profiles are built once per actor in ``__init__`` from tiny built-in
    trigram tables; scoring is a vectorized count of profile hits. This is
    deterministic and self-contained (no model downloads) — the point at
    engine level is the actor-pool plumbing + stable schema, not SOTA
    accuracy (test data's ``lang`` labels are synthetic and uncorrelated
    with its word-soup text, so correctness is determinism, not recovery).
    """

    PROFILES = {
        "en": ("the", "and", "ing", " th", "of ", "ion"),
        "de": ("der", "die", "und", "ein", "sch", "cht"),
        "fr": ("les", "ent", "de ", "que", "ion", "eau"),
        "es": ("que", "los", "ión", "de ", "ado", "nte"),
        "zh": ("de5", "shi", "zho", "ng ", "ian", "uan"),
    }

    def __init__(self):
        import re

        self.langs = sorted(self.PROFILES)
        # compile once per actor (stateful-stage pattern)
        self.patterns = {
            l: [re.compile(re.escape(g)) for g in self.PROFILES[l]] for l in self.langs
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        text = batch["text"].to_pandas().str.lower()
        scores = np.zeros((len(text), len(self.langs)), dtype=np.int64)
        for j, lang in enumerate(self.langs):
            for pat in self.patterns[lang]:
                scores[:, j] += (
                    text.str.count(pat).fillna(0).to_numpy().astype(np.int64)
                )
        best = np.argmax(scores, axis=1)
        pred = np.array(self.langs, dtype=object)[best]
        conf = scores[np.arange(len(text)), best]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "pred_lang": pa.array(pred.tolist(), type=pa.string()),
                "lang_score": pa.array(conf),
            }
        )


class BpeishTokenizer:
    """BPE-ish regex token counting (GPT-2-style segmentation classes:
    contractions, letter runs, digit runs, punctuation runs, whitespace) —
    the compiled pattern is per-actor state; counting is one findall per
    doc via pandas str.count on the compiled regex."""

    PATTERN = r"'[a-z][a-z]?| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"

    def __init__(self):
        import re

        self.rx = re.compile(self.PATTERN)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        text = batch["text"].to_pandas()
        n_tokens = text.str.count(self.rx).fillna(0).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_bpe_tokens": pa.array(n_tokens.to_numpy()),
            }
        )


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Document fingerprints: md5 (content identity, SQL-checkable against
    DuckDB's md5()) and a rolling polynomial hash (Rabin-Karp mod 2^61-1)
    over the utf-8 bytes — the shingle-friendly fingerprint family."""
    MOD = (1 << 61) - 1
    BASE = 257
    texts = batch["text"].to_pylist()
    md5s = [hashlib.md5(t.encode()).hexdigest() for t in texts]
    rolls = []
    for t in texts:
        h = 0
        for b in t.encode():
            h = (h * BASE + b) % MOD
        rolls.append(h)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "md5": pa.array(md5s, type=pa.string()),
            "rolling_hash": pa.array(np.array(rolls, dtype=np.int64)),
        }
    )


def crc32_of(texts: list[str]) -> np.ndarray:
    return np.array([zlib.crc32(t.encode()) for t in texts], dtype=np.int64)
