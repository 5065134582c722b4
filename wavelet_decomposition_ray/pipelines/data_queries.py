"""Training-data-pipeline queries over the driver's ``documents`` /
``embeddings`` tables: dedup (exact, MinHash-LSH, SimHash, n-gram Jaccard),
similarity search (brute-force cosine + LSH-bucketed ANN), text analysis,
and multimodal plumbing. Same contract as ``queries.py``: Ray callable +
DuckDB oracle SQL where expressible.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..functions import dedup as dd
from ..functions import multimodal as mm
from ..functions import similarity as sim
from ..functions import text as tx
from ..functions.listops import numpy_to_list

NEAR_DUP_TAU = 0.5       # char-5-shingle / word-3-gram Jaccard threshold
EMBED_TAU = 0.4          # cosine near-dup threshold (data max is ~0.51)
SIMHASH_MAX_HAMMING = 6


def _docs(sf_dir: str, columns=("doc_id", "text")) -> "ray.data.Dataset":
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=list(columns))


def _emb(sf_dir: str) -> "ray.data.Dataset":
    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                 columns=["vec_id", "embedding"])


# --------------------------------------------------------------------------
# text analysis
# --------------------------------------------------------------------------

def q_token_count(sf_dir: str):
    return _docs(sf_dir).map_batches(tx.token_count_batch, batch_format="pyarrow")


TOKEN_COUNT_SQL = (
    "SELECT doc_id,"
    " CAST(length(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS BIGINT) AS n_words,"
    " CAST(length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT) AS word_chars"
    " FROM documents"
)


def q_text_quality(sf_dir: str):
    return _docs(sf_dir).map_batches(tx.quality_batch, batch_format="pyarrow")


TEXT_QUALITY_SQL = (
    "WITH w AS (SELECT doc_id,"
    " list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws,"
    " CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE) AS wc"
    " FROM documents)"
    " SELECT doc_id, CAST(length(ws) AS BIGINT) AS n_words,"
    " round(wc / greatest(length(ws), 1), 6) AS avg_word_len,"
    " round(CAST(length(list_distinct(ws)) AS DOUBLE) / greatest(length(ws), 1), 6)"
    "   AS type_token_ratio"
    " FROM w"
)


def q_lang_id(sf_dir: str):
    return _docs(sf_dir).map_batches(
        tx.LangId, batch_format="pyarrow", batch_size=256, concurrency=2
    )


def q_fingerprint(sf_dir: str):
    ds = _docs(sf_dir).map_batches(tx.fingerprint_batch, batch_format="pyarrow")
    return ds.map_batches(lambda t: t.select(["doc_id", "md5"]),
                          batch_format="pyarrow")


FINGERPRINT_SQL = "SELECT doc_id, md5(text) AS md5 FROM documents"


def q_fingerprint_rolling(sf_dir: str):
    return _docs(sf_dir).map_batches(tx.fingerprint_batch, batch_format="pyarrow")


# --------------------------------------------------------------------------
# dedup
# --------------------------------------------------------------------------

def q_dedup_exact(sf_dir: str):
    from ray.data.aggregate import Count, Min

    ds = _docs(sf_dir).map_batches(dd.exact_hash_batch, batch_format="pyarrow")
    agg = ds.groupby("content_hash").aggregate(
        Min("doc_id", alias_name="keep_id"), Count(alias_name="dup_count")
    )
    return agg.map_batches(
        lambda t: pa.table(
            {"keep_id": t["keep_id"],
             "dup_count": pc.cast(t["dup_count"], pa.int64())}
        ),
        batch_format="pyarrow",
    )


DEDUP_EXACT_SQL = (
    "SELECT min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS dup_count "
    "FROM documents GROUP BY text"
)


def q_dedup_minhash(sf_dir: str):
    """MinHash+LSH near-dup pairs: shingle -> minhash -> band buckets ->
    groupby(band) candidates -> exact-Jaccard verify (>= NEAR_DUP_TAU).

    The groupby key is (band_id, band_hash): fixed-width ints, the shape
    that survives 10^12 docs. Verification texts are broadcast via ray.put
    here (small side); at scale the verify is a per-bucket join instead."""
    # NB stateless instance-fns, not actor pools: at test scale a second
    # fixed pool can reserve every CPU of a tiny cluster and starve the
    # shuffle between the pools (pool-sizing rule, SURVEY.md §4.2.3); on a
    # real cluster these become map_batches(cls, concurrency=(a, b))
    ds = _docs(sf_dir).map_batches(
        dd.MinHasher(), batch_format="pyarrow", batch_size=512
    )
    bands = ds.map_batches(dd.lsh_bands_batch, batch_format="pyarrow")

    def emit_pairs(group):
        import pandas as pd

        ids = sorted(set(group["doc_id"].tolist()))
        out = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]]
        return pd.DataFrame(out, columns=["doc_a", "doc_b"])

    cand = bands.groupby(["band_id", "band_hash"]).map_groups(
        emit_pairs, batch_format="pandas"
    )
    # a pair can collide in several bands: dedupe before the (expensive)
    # exact verification
    from ray.data.aggregate import Count

    cand = (
        cand.groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )

    import pyarrow.parquet as pq

    texts = dict(
        zip(
            *[
                pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
                .column(i)
                .to_pylist()
                for i in (0, 1)
            ]
        )
    )
    texts_ref = ray.put(texts)

    class Verify:
        def __init__(self):
            self.texts = ray.get(texts_ref)
            self.cache = {}

        def sh(self, d):
            if d not in self.cache:
                self.cache[d] = dd.char_shingles(self.texts[d])
            return self.cache[d]

        def __call__(self, batch: pa.Table) -> pa.Table:
            a = batch["doc_a"].to_pylist()
            b = batch["doc_b"].to_pylist()
            j = np.array([dd.jaccard(self.sh(x), self.sh(y)) for x, y in zip(a, b)])
            keep = j >= NEAR_DUP_TAU
            return pa.table(
                {
                    "doc_a": pa.array(np.array(a)[keep]),
                    "doc_b": pa.array(np.array(b)[keep]),
                    "jaccard": pa.array(np.round(j[keep], 6)),
                }
            )

    pairs = cand.map_batches(Verify(), batch_format="pyarrow", batch_size=1024)
    return pairs


def q_dedup_simhash(sf_dir: str):
    """Per-doc 64-bit SimHash (deterministic); pair extraction is covered by
    pytest (hamming <= SIMHASH_MAX_HAMMING over the planted near-dups)."""
    return _docs(sf_dir).map_batches(dd.simhash_batch, batch_format="pyarrow",
                                     batch_size=256)


def q_ngram_jaccard(sf_dir: str):
    """Word-3-gram Jaccard pairs >= τ, distributed shape: explode distinct
    grams -> groupby(gram) -> per-bucket pairs -> count per pair -> verify
    with broadcast set sizes."""
    ds = _docs(sf_dir)

    def explode(batch: pa.Table) -> pa.Table:
        rows_doc, rows_gram = [], []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            for g in dd.word_ngrams(t, 3):
                rows_doc.append(d)
                rows_gram.append(dd._stable_u64(g) & ((1 << 63) - 1))
        return pa.table(
            {"doc_id": pa.array(rows_doc, type=pa.int64()),
             "gram": pa.array(np.array(rows_gram, dtype=np.int64))}
        )

    grams = ds.map_batches(explode, batch_format="pyarrow")

    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    sizes = {
        d: len(dd.word_ngrams(t, 3))
        for d, t in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist())
    }
    sizes_ref = ray.put(sizes)

    def bucket_pairs(group):
        import pandas as pd

        ids = sorted(set(group["doc_id"].tolist()))
        out = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]]
        return pd.DataFrame(out, columns=["doc_a", "doc_b"])

    cand = grams.groupby("gram").map_groups(bucket_pairs, batch_format="pandas")

    from ray.data.aggregate import Count

    counts = cand.groupby(["doc_a", "doc_b"]).aggregate(Count(alias_name="c"))

    class Jacc:
        def __init__(self):
            self.sizes = ray.get(sizes_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            a = t["doc_a"].to_pylist()
            b = t["doc_b"].to_pylist()
            c = t["c"].to_numpy(zero_copy_only=False).astype(np.float64)
            na = np.array([self.sizes[x] for x in a], dtype=np.float64)
            nb = np.array([self.sizes[x] for x in b], dtype=np.float64)
            j = c / (na + nb - c)
            keep = j >= NEAR_DUP_TAU
            return pa.table(
                {
                    "doc_a": pa.array(np.array(a, dtype=np.int64)[keep]),
                    "doc_b": pa.array(np.array(b, dtype=np.int64)[keep]),
                    "jaccard": pa.array(np.round(j[keep], 6)),
                }
            )

    return counts.map_batches(Jacc(), batch_format="pyarrow")


NGRAM_JACCARD_SQL = (
    "WITH w AS (SELECT doc_id,"
    " list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws FROM documents),"
    " g AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS gram"
    "   FROM w, UNNEST(range(1, greatest(length(ws)-2, 0)+1)) AS t(i)),"
    " sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),"
    " inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c"
    "   FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id GROUP BY 1, 2)"
    " SELECT doc_a, doc_b, round(CAST(c AS DOUBLE)/(sa.n + sb.n - c), 6) AS jaccard"
    " FROM inter JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b"
    f" WHERE CAST(c AS DOUBLE)/(sa.n + sb.n - c) >= {NEAR_DUP_TAU}"
)


# --------------------------------------------------------------------------
# similarity search
# --------------------------------------------------------------------------

def q_knn_cosine(sf_dir: str):
    """Brute-force cosine top-10 against the query vector (vec_id=0):
    numpy matmul per batch vs the broadcast query; global top-k via
    sort+limit on the tiny candidate set."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = tbl["vec_id"].to_numpy()
    q = np.asarray(tbl["embedding"].to_pylist()[int(np.nonzero(ids == 0)[0][0])],
                   dtype=np.float64)
    q_ref = ray.put(q[None, :])

    ds = _emb(sf_dir).map_batches(
        sim.CosineTopK(q_ref, [0]), batch_format="pyarrow", batch_size=512
    )
    top = ds.sort(["cos_sim", "vec_id"], descending=[True, False]).limit(10)
    return top.map_batches(lambda t: t.select(["vec_id", "cos_sim"]),
                           batch_format="pyarrow")


KNN_COSINE_SQL = (
    "WITH e AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,"
    " generate_subscripts(embedding, 1) AS i FROM embeddings),"
    " n AS (SELECT vec_id, sqrt(sum(v*v)) AS nrm FROM e GROUP BY vec_id),"
    " q AS (SELECT i, v FROM e WHERE vec_id = 0),"
    " qn AS (SELECT sqrt(sum(v*v)) AS nrm FROM q),"
    " d AS (SELECT e.vec_id, sum(e.v * q.v) AS dot FROM e JOIN q USING (i)"
    "   GROUP BY e.vec_id)"
    " SELECT d.vec_id, round(d.dot / (n.nrm * (SELECT nrm FROM qn)), 6) AS cos_sim"
    " FROM d JOIN n USING (vec_id)"
    " ORDER BY cos_sim DESC, vec_id LIMIT 10"
)


def q_ann_lsh(sf_dir: str):
    """LSH bucket codes per vector (the ANN scale path's partitioning);
    recall vs brute force is pytest-checked."""
    return _emb(sf_dir).map_batches(sim.lsh_code_batch, batch_format="pyarrow").map_batches(
        lambda t: t.select(["vec_id", "lsh_bucket"]), batch_format="pyarrow"
    )


def q_ann_ivf(sf_dir: str):
    """IVF ANN: train the coarse quantizer on the (small) corpus once,
    broadcast it, assign list ids per batch, then answer the vec_id=0 query
    by scoring only the probed lists — partition-pruned search."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet")
    mat = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float64)
    ids_all = tbl["vec_id"].to_numpy()
    index = sim.IvfIndex(n_lists=16).train(mat)
    index_ref = ray.put(index)
    q = mat[int(np.nonzero(ids_all == 0)[0][0])]
    probes = set(index.probe_lists(q, n_probe=4).tolist())
    q_ref = ray.put(q[None, :])

    assigned = _emb(sf_dir).map_batches(
        lambda t: sim.ivf_assign_batch(t, index_ref), batch_format="pyarrow"
    )
    pruned = assigned.map_batches(
        lambda t: t.filter(
            pa.array(np.isin(t["ivf_list"].to_numpy(zero_copy_only=False),
                             list(probes)))
        ),
        batch_format="pyarrow",
    )
    scored = pruned.map_batches(
        sim.CosineTopK(q_ref, [0]), batch_format="pyarrow", batch_size=512
    )
    top = scored.sort(["cos_sim", "vec_id"], descending=[True, False]).limit(10)
    return top.map_batches(lambda t: t.select(["vec_id", "cos_sim"]),
                           batch_format="pyarrow")


def q_embed_dedup(sf_dir: str):
    """Embedding-cosine near-dup pairs >= EMBED_TAU via broadcast matrix
    matmul per batch (no shuffle; both sides of every pair scored once,
    a < b)."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids_all = tbl["vec_id"].to_numpy()
    mat = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float64)
    ref = ray.put((ids_all, sim.normalize_rows(mat)))

    class PairFinder:
        def __init__(self):
            self.ids, self.mat = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = sim.normalize_rows(sim.embedding_matrix(batch))
            vids = batch["vec_id"].to_numpy(zero_copy_only=False)
            sims = m @ self.mat.T
            rows, cols = np.nonzero(sims >= EMBED_TAU)
            a = vids[rows]
            b = self.ids[cols]
            keep = a < b
            return pa.table(
                {
                    "vec_a": pa.array(a[keep]),
                    "vec_b": pa.array(b[keep]),
                    "cos_sim": pa.array(np.round(sims[rows, cols][keep], 6)),
                }
            )

    return _emb(sf_dir).map_batches(PairFinder(), batch_format="pyarrow",
                                    batch_size=256)


EMBED_DEDUP_SQL = (
    "WITH e AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,"
    " generate_subscripts(embedding, 1) AS i FROM embeddings),"
    " n AS (SELECT vec_id, sqrt(sum(v*v)) AS nrm FROM e GROUP BY vec_id),"
    " d AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, sum(a.v * b.v) AS dot"
    "   FROM e a JOIN e b USING (i) WHERE a.vec_id < b.vec_id GROUP BY 1, 2)"
    " SELECT vec_a, vec_b, round(dot/(na.nrm*nb.nrm), 6) AS cos_sim"
    " FROM d JOIN n na ON na.vec_id = vec_a JOIN n nb ON nb.vec_id = vec_b"
    f" WHERE dot/(na.nrm*nb.nrm) >= {EMBED_TAU}"
)


# --------------------------------------------------------------------------
# multimodal plumbing
# --------------------------------------------------------------------------

def q_multimodal_features(sf_dir: str):
    ds = _docs(sf_dir).map_batches(mm.text_to_payload_batch, batch_format="pyarrow")
    feats = ds.map_batches(mm.MediaFeatures(), batch_format="pyarrow",
                           batch_size=256)
    return feats.map_batches(lambda t: t.select(["doc_id", "n_bytes", "head_byte"]),
                             batch_format="pyarrow")


MULTIMODAL_SQL = (
    "SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,"
    " CAST(ascii(text) AS BIGINT) AS head_byte FROM documents"
)


def q_frame_sample(sf_dir: str):
    ds = _docs(sf_dir).map_batches(mm.text_to_payload_batch, batch_format="pyarrow")
    return ds.map_batches(mm.FrameSampler(), batch_format="pyarrow",
                          batch_size=256)


DATA_QUERIES = {
    "token_count": (q_token_count, TOKEN_COUNT_SQL),
    "text_quality": (q_text_quality, TEXT_QUALITY_SQL),
    "lang_id": (q_lang_id, None),
    "fingerprint_md5": (q_fingerprint, FINGERPRINT_SQL),
    "fingerprint_rolling": (q_fingerprint_rolling, None),
    "dedup_exact": (q_dedup_exact, DEDUP_EXACT_SQL),
    "dedup_minhash": (q_dedup_minhash, None),
    "dedup_simhash": (q_dedup_simhash, None),
    "ngram_jaccard": (q_ngram_jaccard, NGRAM_JACCARD_SQL),
    "knn_cosine": (q_knn_cosine, KNN_COSINE_SQL),
    "ann_lsh": (q_ann_lsh, None),
    "ann_ivf": (q_ann_ivf, None),
    "embed_dedup": (q_embed_dedup, EMBED_DEDUP_SQL),
    "multimodal_features": (q_multimodal_features, MULTIMODAL_SQL),
    "frame_sample": (q_frame_sample, None),
}
