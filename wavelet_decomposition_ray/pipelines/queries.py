"""Query registry: every operator/pipeline from SURVEY.md §2 exposed as a
callable ``(sf_dir) -> Dataset | pyarrow.Table``, with a DuckDB oracle SQL
string where the semantics are SQL-expressible (the driver's correctness
gate runs both sides at sf=0.01 and hash-compares values).

Core-engine queries run over the deterministically synthesized sequences
table (BASELINE.json input_hint shape) — the oracle SQL reads the same
parquet via ``read_parquet`` so both sides see identical bytes. Queries over
the driver's own tables (events / lineitem / documents / embeddings) use the
pre-registered views directly.

Column names match between Ray output and SQL exactly (driver hashes after
sorting columns by name).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .. import oracle as oc
from .. import synth
from ..functions.listops import list_to_numpy, tumble_starts
from ..stages.dwt import DwtTransform, InverseDwt
from ..stages.encode import GorillaEncoder, decode_blocks_batch
from ..stages.gapfill import gapfill_batch, make_resample_batch
from ..stages.rollup import TierRollup, explode_rollup_batch
from . import rollup_pipeline as rp

# the driver correctness-checks at sf0.01: oracle SQL pins that synth path
SYNTH_GLOB_001 = "/tmp/graft_synth/sf0.01/sequences/*.parquet"

_FLAT_CTE = (
    "WITH flat AS (SELECT doc_id, source, unnest(tokens) AS tok, "
    "generate_subscripts(tokens, 1) - 1 AS pos "
    f"FROM read_parquet('{SYNTH_GLOB_001}'))"
)


def _seq_ds(sf_dir: str) -> "ray.data.Dataset":
    return rp.sequences_dataset(synth.ensure_sequences(sf_dir))


# --------------------------------------------------------------------------
# Tier rollups (SURVEY.md A2 ladder), long format
# --------------------------------------------------------------------------

def _rollup_long(sf_dir: str, tier: int) -> "ray.data.Dataset":
    ds = _seq_ds(sf_dir).map_batches(
        TierRollup(tier), batch_format="pyarrow", batch_size=256
    )
    ds = ds.map_batches(
        lambda t: explode_rollup_batch(t.filter(pc.equal(t["tier"], tier))),
        batch_format="pyarrow",
    )
    return ds


def _rollup_sql(tier: int) -> str:
    w = 1 << tier
    return (
        f"{_FLAT_CTE} "
        f"SELECT doc_id, source, CAST({tier} AS TINYINT) AS tier, "
        f"pos // {w} AS window_idx, "
        "CAST(min(tok) AS BIGINT) AS wmin, CAST(max(tok) AS BIGINT) AS wmax, "
        "CAST(sum(tok) AS BIGINT) AS wsum, CAST(count(*) AS INTEGER) AS wcount "
        "FROM flat GROUP BY doc_id, source, window_idx"
    )


# --------------------------------------------------------------------------
# Per-(source, tier) aggregates (SURVEY.md A1/A2: partial+final groupby)
# --------------------------------------------------------------------------

def q_source_stats(sf_dir: str) -> "ray.data.Dataset":
    """Per-(source, tier) window aggregates straight from raw tokens — the reference's stacked-signal report (A1) as one partial+final groupby."""
    rolled = rp.rollup_dataset(_seq_ds(sf_dir), bank="haar", n_tiers=10,
                               verify=False, batch_size=256)
    agg = rp.source_tier_aggregate(rolled)
    return agg.map_batches(
        lambda t: t.set_column(
            t.column_names.index("tier"),
            "tier",
            pc.cast(t["tier"], pa.int8()),
        ),
        batch_format="pyarrow",
    )


SOURCE_STATS_SQL = (
    f"{_FLAT_CTE}, win AS ("
    " SELECT source, CAST(t.tier AS TINYINT) AS tier, doc_id,"
    "        pos // (1 << CAST(t.tier AS INTEGER)) AS widx,"
    "        min(tok) AS wmin, max(tok) AS wmax, sum(tok) AS wsum,"
    "        count(*) AS wcount"
    " FROM flat CROSS JOIN (SELECT unnest(range(1, 11)) AS tier) t"
    " GROUP BY source, t.tier, doc_id, widx)"
    " SELECT source, tier, CAST(min(wmin) AS BIGINT) AS min_val,"
    " CAST(max(wmax) AS BIGINT) AS max_val, CAST(sum(wsum) AS BIGINT) AS total_sum,"
    " CAST(sum(wcount) AS BIGINT) AS n_points, CAST(count(*) AS BIGINT) AS n_windows"
    " FROM win GROUP BY source, tier"
)


# --------------------------------------------------------------------------
# Single-level Haar details, SQL-checkable (complete pairs only)
# --------------------------------------------------------------------------

def _source_stats_ds(ds: "ray.data.Dataset", n_tiers: int) -> "ray.data.Dataset":
    rolled = rp.rollup_dataset(ds, bank="haar", n_tiers=n_tiers, verify=False,
                               batch_size=256)
    agg = rp.source_tier_aggregate(rolled)
    return agg.map_batches(
        lambda t: t.set_column(
            t.column_names.index("tier"), "tier", pc.cast(t["tier"], pa.int8())
        ),
        batch_format="pyarrow",
    )


def q_source_stats_subset(sf_dir: str) -> "ray.data.Dataset":
    """Subset stacking — the reference's ``stack_betas(years=[...])``
    (wavelet_decomposition.py:375-376): the same per-(source, tier)
    aggregate over a deterministic key subset (docs whose id ends in an
    even digit), i.e. a pushed-down filter before the stack."""

    def subset(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        keep = np.array([d[-1] in "02468" for d in ids])
        return t.filter(pa.array(keep))

    ds = _seq_ds(sf_dir).map_batches(subset, batch_format="pyarrow",
                                     batch_size=256)
    return _source_stats_ds(ds, 10)


def q_source_stats_t15(sf_dir: str) -> "ray.data.Dataset":
    """The reference's FULL 15-scale ladder (wavelet_decomposition.py:
    260-292 builds 15 dyadic scales + offset) as engine config: identical
    aggregate with n_tiers=15."""
    return _source_stats_ds(_seq_ds(sf_dir), 15)


def _source_stats_sql(n_tiers: int, where: str = "") -> str:
    return (
        f"{_FLAT_CTE}, win AS ("
        " SELECT source, CAST(t.tier AS TINYINT) AS tier, doc_id,"
        "        pos // (1 << CAST(t.tier AS INTEGER)) AS widx,"
        "        min(tok) AS wmin, max(tok) AS wmax, sum(tok) AS wsum,"
        "        count(*) AS wcount"
        f" FROM flat CROSS JOIN (SELECT unnest(range(1, {n_tiers + 1})) AS tier) t"
        f" {where}"
        " GROUP BY source, t.tier, doc_id, widx)"
        " SELECT source, tier, CAST(min(wmin) AS BIGINT) AS min_val,"
        " CAST(max(wmax) AS BIGINT) AS max_val, CAST(sum(wsum) AS BIGINT) AS total_sum,"
        " CAST(sum(wcount) AS BIGINT) AS n_points, CAST(count(*) AS BIGINT) AS n_windows"
        " FROM win GROUP BY source, tier"
    )


SOURCE_STATS_SUBSET_SQL = _source_stats_sql(
    10, "WHERE substr(doc_id, length(doc_id), 1) IN ('0','2','4','6','8')"
)
SOURCE_STATS_T15_SQL = _source_stats_sql(15)


def q_haar_l1(sf_dir: str) -> "ray.data.Dataset":
    """Level-1 Haar pair sums/differences per sequence (unnormalized, integer-exact) — the first rung of the wavelet cascade, SQL-checkable bit for bit."""
    def haar_l1_batch(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        lens = np.diff(off)
        n_pairs = lens // 2
        row_of = np.repeat(np.arange(len(lens)), n_pairs)
        cum = np.cumsum(n_pairs) - n_pairs
        k = np.arange(int(n_pairs.sum()), dtype=np.int64) - cum[row_of]
        starts = off[:-1][row_of] + 2 * k
        d1 = (vals[starts].astype(np.float64) - vals[starts + 1]) / np.sqrt(2.0)
        return pa.table(
            {
                "doc_id": t["doc_id"].take(pa.array(row_of)),
                "k": pa.array(k),
                "d1": pa.array(np.round(d1, 6), type=pa.float64()),
            }
        )

    return _seq_ds(sf_dir).map_batches(haar_l1_batch, batch_format="pyarrow",
                                       batch_size=256)


HAAR_L1_SQL = (
    f"{_FLAT_CTE} "
    "SELECT doc_id, pos // 2 AS k, "
    "round(sum(CASE WHEN pos % 2 = 0 THEN tok ELSE -tok END) / sqrt(2.0), 6) AS d1 "
    "FROM flat GROUP BY doc_id, k HAVING count(*) = 2"
)


# --------------------------------------------------------------------------
# Round-trip invariant (BASELINE.json): engine must report all-true;
# the SQL oracle states the invariant itself
# --------------------------------------------------------------------------

def _roundtrip(sf_dir: str, bank: str) -> "ray.data.Dataset":
    ds = _seq_ds(sf_dir).map_batches(gapfill_batch, batch_format="pyarrow",
                                     batch_size=256)
    ds = ds.map_batches(DwtTransform(bank, verify=True), batch_format="pyarrow",
                        batch_size=256)
    return ds.map_batches(
        lambda t: t.select(["doc_id", "rt_ok"]), batch_format="pyarrow"
    )


ROUNDTRIP_SQL = (
    f"SELECT doc_id, CAST(TRUE AS BOOLEAN) AS rt_ok "
    f"FROM read_parquet('{SYNTH_GLOB_001}')"
)


# --------------------------------------------------------------------------
# Aggregate-tree consistency (FIXTURES.md invariant 3) per (doc, tier)
# --------------------------------------------------------------------------

def q_aggtree_ok(sf_dir: str) -> "ray.data.Dataset":
    """All-true invariant: the tier-tree aggregates folded bottom-up equal the flat per-tier rollups recomputed from raw tokens (continuous-aggregate correctness)."""
    def check(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        v64 = vals.astype(np.int64)
        n = len(off) - 1
        # tree path
        starts, toff, counts = tumble_starts(off, 2)
        tier = {
            "wmin": np.minimum.reduceat(v64, starts),
            "wmax": np.maximum.reduceat(v64, starts),
            "wsum": np.add.reduceat(v64, starts),
            "wcount": counts,
        }
        docs, tiers, oks = [], [], []
        for tr in range(2, 11):
            s2, toff2, _ = tumble_starts(toff, 2)
            tier = {
                "wmin": np.minimum.reduceat(tier["wmin"], s2),
                "wmax": np.maximum.reduceat(tier["wmax"], s2),
                "wsum": np.add.reduceat(tier["wsum"], s2),
                "wcount": np.add.reduceat(tier["wcount"], s2),
            }
            toff = toff2
            # direct path from raw at width 2**tr
            ds_, doff, dcounts = tumble_starts(off, 1 << tr)
            ok_flat = (
                (np.minimum.reduceat(v64, ds_) == tier["wmin"])
                & (np.maximum.reduceat(v64, ds_) == tier["wmax"])
                & (np.add.reduceat(v64, ds_) == tier["wsum"])
                & (dcounts == tier["wcount"])
            ).astype(np.int8)
            per_row_ok = np.minimum.reduceat(ok_flat, doff[:-1]).astype(bool)
            docs.append(np.arange(n))
            tiers.append(np.full(n, tr, dtype=np.int8))
            oks.append(per_row_ok)
        idx = np.concatenate(docs)
        return pa.table(
            {
                "doc_id": t["doc_id"].take(pa.array(idx)),
                "tier": pa.array(np.concatenate(tiers)),
                "ok": pa.array(np.concatenate(oks)),
            }
        )

    return _seq_ds(sf_dir).map_batches(check, batch_format="pyarrow", batch_size=256)


AGGTREE_SQL = (
    f"SELECT doc_id, CAST(t.tier AS TINYINT) AS tier, CAST(TRUE AS BOOLEAN) AS ok "
    f"FROM read_parquet('{SYNTH_GLOB_001}') "
    "CROSS JOIN (SELECT unnest(range(2, 11)) AS tier) t"
)


# --------------------------------------------------------------------------
# Codec identity per (doc, tier) (FIXTURES.md invariant 4)
# --------------------------------------------------------------------------

def q_codec_ok(sf_dir: str) -> "ray.data.Dataset":
    """All-true invariant: Gorilla/DoD encode -> decode round-trips every rollup stream byte-exactly (the codec identity the store relies on)."""
    ds = _seq_ds(sf_dir).map_batches(TierRollup(10), batch_format="pyarrow",
                                     batch_size=256)

    def enc_dec(t: pa.Table) -> pa.Table:
        enc = GorillaEncoder()(t)
        dec = decode_blocks_batch(enc)
        ok = np.ones(t.num_rows, dtype=bool)
        for col in ("mins", "maxs", "sums", "counts"):
            a, ao = list_to_numpy(t[col])
            b, _ = list_to_numpy(dec[col])
            eq = (a == b).astype(np.int8)
            starts = ao[:-1]
            ok &= np.minimum.reduceat(eq, starts).astype(bool)
        return pa.table(
            {"doc_id": t["doc_id"], "tier": t["tier"], "ok": pa.array(ok)}
        )

    return ds.map_batches(enc_dec, batch_format="pyarrow", batch_size=256)


CODEC_SQL = (
    f"SELECT doc_id, CAST(t.tier AS TINYINT) AS tier, CAST(TRUE AS BOOLEAN) AS ok "
    f"FROM read_parquet('{SYNTH_GLOB_001}') "
    "CROSS JOIN (SELECT unnest(range(1, 11)) AS tier) t"
)


# --------------------------------------------------------------------------
# EPN order statistics per source (calc_EPN.py:23-33 rule)
# --------------------------------------------------------------------------

SATISFACTIONS = (80, 95, 99, 100)


def _value_counts_by_source(sf_dir: str, absolute: bool = False
                            ) -> "ray.data.Dataset":
    """Distributed EXACT value histogram per source: batch-local
    (source, tok) -> count partials, then one small groupby. The group a
    downstream ``map_groups`` sees is DISTINCT-VALUE-sized (bounded by the
    token domain), not corpus-sized — this is what makes the EPN order
    statistics skew-proof: src-0 holding 40% of all rows no longer means a
    40%-of-corpus sort on one actor (VERDICT r1 "What's wrong #5")."""

    def partial(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        if absolute:
            v = np.abs(v)
        lens = np.diff(off)
        srcs = t["source"].to_pylist()
        codes, inv = np.unique(np.array(srcs, dtype=object), return_inverse=True)
        src_of_tok = np.repeat(inv, lens)
        # bias to non-negative so the (source, tok) pair packs into one
        # int64 key; tok range must fit 42 bits after the bias
        vmin = int(v.min()) if len(v) else 0
        vb = v - vmin
        assert len(vb) == 0 or int(vb.max()) < (1 << 42), "token range too wide"
        key = (src_of_tok.astype(np.int64) << 42) | vb
        uk, counts = np.unique(key, return_counts=True)
        return pa.table(
            {
                "source": pa.array(
                    codes[(uk >> 42).astype(np.int64)].tolist(), type=pa.string()
                ),
                "tok": pa.array((uk & ((1 << 42) - 1)) + vmin),
                "c": pa.array(counts.astype(np.int64)),
            }
        )

    partials = _seq_ds(sf_dir).map_batches(partial, batch_format="pyarrow",
                                           batch_size=256)

    # fold the partials per (source, tok) inside COARSE partitions — a Ray
    # aggregate over ~65k distinct (source, tok) keys spends ~10 s on
    # micro-group plumbing at this scale; one pandas groupby per coarse
    # partition is exact and ~20x cheaper (same trick as the dedup
    # candidate buckets)
    n_parts = 8

    def add_part(t: pa.Table) -> pa.Table:
        tok = t["tok"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "part", pa.array((tok % n_parts).astype(np.int32))
        )

    def fold(df):
        out = df.groupby(["source", "tok"], as_index=False)["c"].sum()
        out["c"] = out["c"].astype(np.int64)
        return out

    return (
        partials.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(fold, batch_format="pandas")
    )


def q_epn_quantiles(sf_dir: str) -> "ray.data.Dataset":
    """Per-source satisfaction order statistics (calc_EPN.py:23-33), exact,
    via the distributed value histogram (no whole-source sort)."""

    def finish(group: pa.Table) -> pa.Table:
        import pandas as pd

        g = group.to_pandas().sort_values("tok")
        cum = g["c"].to_numpy().cumsum()
        n = int(cum[-1])
        toks = g["tok"].to_numpy()
        sats, qs = [], []
        for s in SATISFACTIONS:
            k = max(int(np.ceil(s * n / 100.0)), 1)
            qs.append(int(toks[int(np.searchsorted(cum, k))]))
            sats.append(s)
        return pa.table(
            {
                "source": pa.array([group["source"][0].as_py()] * len(sats)),
                "satisfaction": pa.array(sats, type=pa.int64()),
                "q": pa.array(qs, type=pa.int64()),
            }
        )

    return _value_counts_by_source(sf_dir).groupby("source").map_groups(
        finish, batch_format="pyarrow"
    )


EPN_SQL = (
    f"{_FLAT_CTE}, ranked AS ("
    " SELECT source, tok, row_number() OVER (PARTITION BY source ORDER BY tok) AS rn,"
    "        count(*) OVER (PARTITION BY source) AS n FROM flat)"
    " SELECT source, CAST(s.sat AS BIGINT) AS satisfaction, CAST(tok AS BIGINT) AS q"
    " FROM ranked CROSS JOIN (SELECT unnest([80, 95, 99, 100]) AS sat) s"
    " WHERE rn = CAST(ceil(s.sat * n / 100.0) AS BIGINT)"
)


# --------------------------------------------------------------------------
# Event-stream rollup over the driver's events table (pure-views SQL):
# sequence = per-user values ordered by (ts, event_id), tok = rint(value*100)
# --------------------------------------------------------------------------

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap
N_EVENT_PARTS = 32  # coarse partitions for per-user event folds


def _add_user_part(t: pa.Table) -> pa.Table:
    u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    return t.append_column(
        "part", pa.array(((u % N_EVENT_PARTS) + N_EVENT_PARTS)
                         % N_EVENT_PARTS, type=pa.int32())
    )


def _user_sorted(df):
    """Partition frame sorted by (user_id, ts, event_id) + per-row arrays
    shared by the event folds: int64 user ids, micro-ts, tok, and the
    user-start boolean mask."""
    df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    uid = df["user_id"].to_numpy().astype(np.int64)
    ts_us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    tok = np.rint(df["value"].to_numpy() * 100).astype(np.int64)
    n = len(df)
    user_start = np.ones(n, dtype=bool)
    if n > 1:
        user_start[1:] = uid[1:] != uid[:-1]
    return uid, ts_us, tok, user_start


def q_sessionize(sf_dir: str) -> "ray.data.Dataset":
    """Session windows over the event stream: per user, a new session
    starts when the inactivity gap exceeds 30 minutes (the gap-based
    streaming window Ray Data has no primitive for).

    Shape: users hash into N_EVENT_PARTS COARSE partitions (one Ray group
    each); the per-user sort + gap scan + session aggregate run as ONE
    vectorized pandas fold inside the partition. Per-user ``map_groups``
    (round 2) shipped thousands of micro-groups through the shuffle —
    ~100x slower than the arithmetic (VERDICT r2 "What's wrong #2")."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    )

    def fold(df):
        import pandas as pd

        uid, ts_us, tok, user_start = _user_sorted(df)
        n = len(uid)
        brk = np.ones(n, dtype=np.int64)
        if n > 1:
            brk[1:] = (user_start[1:]
                       | (np.diff(ts_us) > SESSION_GAP_US)).astype(np.int64)
        sid_global = np.cumsum(brk) - 1
        starts = np.nonzero(user_start)[0]
        runs = np.diff(np.append(starts, n))
        sid = sid_global - np.repeat(sid_global[starts], runs)
        out = pd.DataFrame(
            {"user_id": uid, "session_idx": sid, "tok": tok, "ts_us": ts_us}
        ).groupby(["user_id", "session_idx"], as_index=False).agg(
            n_events=("tok", "size"),
            tok_sum=("tok", "sum"),
            first_us=("ts_us", "min"),
            last_us=("ts_us", "max"),
        )
        out["n_events"] = out["n_events"].astype(np.int64)
        return out

    return (
        ds.map_batches(_add_user_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(fold, batch_format="pandas")
    )


SESSIONIZE_SQL = (
    "WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,"
    " CAST(round(value * 100) AS BIGINT) AS tok,"
    " CASE WHEN lag(epoch_us(ts)) OVER w IS NULL"
    f"  OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US}"
    "  THEN 1 ELSE 0 END AS brk"
    " FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),"
    " s AS (SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id"
    "   ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT)"
    "   AS session_idx FROM e)"
    " SELECT user_id, session_idx, CAST(count(*) AS BIGINT) AS n_events,"
    " CAST(sum(tok) AS BIGINT) AS tok_sum,"
    " min(ts_us) AS first_us, max(ts_us) AS last_us"
    " FROM s GROUP BY user_id, session_idx"
)


def q_funnel(sf_dir: str) -> "ray.data.Dataset":
    """Ordered funnel analysis (view -> click -> purchase): per user, the
    deepest stage reached with strictly increasing timestamps — stage 1
    needs a view, stage 2 a click after the FIRST view, stage 3 a purchase
    after that first qualifying click; output is users per deepest stage.

    Shape: the same coarse user-hash partitioning as ``sessionize`` (one
    Ray group per partition, never per user); inside each partition the
    stage ladder is three pandas merge+min passes — every user lives in
    exactly one partition, so partition-local stages are globally exact and
    only the 4-row stage counts meet in the final groupby.  This is the
    sequence-pattern query (event-order-dependent) that a plain groupby
    aggregate cannot express."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id", "event_type"]
    )

    def fold(df):
        import pandas as pd

        df = df[["user_id", "ts", "event_type"]].copy()
        df["ts_us"] = (
            df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        )
        t1 = (
            df[df["event_type"] == "view"]
            .groupby("user_id")["ts_us"].min().rename("t1")
        )
        m1 = df.merge(t1, on="user_id", how="left")
        t2 = (
            m1[(m1["event_type"] == "click") & (m1["ts_us"] > m1["t1"])]
            .groupby("user_id")["ts_us"].min().rename("t2")
        )
        m2 = df.merge(t2, on="user_id", how="inner")
        u3 = m2[
            (m2["event_type"] == "purchase") & (m2["ts_us"] > m2["t2"])
        ]["user_id"].unique()
        stage = pd.Series(0, index=pd.Index(df["user_id"].unique()))
        stage[t1.index] = 1
        stage[t2.index] = 2
        stage[u3] = 3
        out = stage.value_counts().rename_axis("stage").reset_index(name="pn")
        return out.astype({"stage": np.int64, "pn": np.int64})

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(_add_user_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(fold, batch_format="pandas")
        .groupby("stage")
        .aggregate(Sum("pn", alias_name="n_users"))
    )


FUNNEL_SQL = (
    "WITH v AS (SELECT user_id, min(epoch_us(ts)) AS t1 FROM events"
    "  WHERE event_type = 'view' GROUP BY user_id),"
    " c AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t2 FROM events e"
    "  JOIN v ON v.user_id = e.user_id"
    "  WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t1"
    "  GROUP BY e.user_id),"
    " p AS (SELECT DISTINCT e.user_id FROM events e"
    "  JOIN c ON c.user_id = e.user_id"
    "  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t2),"
    " s AS (SELECT u.user_id, CASE WHEN p.user_id IS NOT NULL THEN 3"
    "  WHEN c.user_id IS NOT NULL THEN 2"
    "  WHEN v.user_id IS NOT NULL THEN 1 ELSE 0 END AS stage"
    "  FROM (SELECT DISTINCT user_id FROM events) u"
    "  LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)"
    "  LEFT JOIN p USING (user_id))"
    " SELECT CAST(stage AS BIGINT) AS stage,"
    " CAST(count(*) AS BIGINT) AS n_users FROM s GROUP BY stage"
)


def q_range_join(sf_dir: str) -> "ray.data.Dataset":
    """RANGE join (non-equi): each event joined to the per-day lineitem
    quantity aggregate over the +-3 calendar-day window around its
    timestamp. The small side is a Ray partial+final daily aggregate whose
    sorted day array + prefix sums broadcast once; the probe is two
    vectorized searchsorteds per batch — the broadcast-range-join shape
    (band joins at scale partition both sides by coarse time bucket and
    replicate the band edges)."""
    from ray.data.aggregate import Sum

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_shipdate", "l_quantity"]
    )

    def day_partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        day = t["l_shipdate"].to_pandas().dt.strftime("%Y-%m-%d")
        qty = t["l_quantity"].to_numpy().astype(np.int64)
        g = (
            pd.DataFrame({"day": day, "qty": qty})
            .groupby("day", as_index=False)["qty"]
            .sum()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    daily = (
        li.map_batches(day_partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("qty", alias_name="qty"))
        .to_pandas()  # tiny: one row per calendar day
        .sort_values("day")
    )
    DAY_US = 86_400_000_000
    day_us = (
        daily["day"].astype("datetime64[us]").to_numpy().astype(np.int64)
    )
    prefix = np.zeros(len(daily) + 1, dtype=np.int64)
    np.cumsum(daily["qty"].to_numpy().astype(np.int64), out=prefix[1:])
    side = ray.put((day_us, prefix))

    def probe(t: pa.Table) -> pa.Table:
        days, pref = ray.get(side)
        ts = t["ts"].to_pandas().to_numpy().astype("datetime64[us]").astype(np.int64)
        ev_day = (ts // DAY_US) * DAY_US
        lo = np.searchsorted(days, ev_day - 3 * DAY_US, side="left")
        hi = np.searchsorted(days, ev_day + 3 * DAY_US, side="right")
        return pa.table(
            {
                "event_id": t["event_id"],
                "n_days": pa.array((hi - lo).astype(np.int64)),
                "qty_sum": pa.array(pref[hi] - pref[lo]),
            }
        )

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "ts"])
    return ev.map_batches(probe, batch_format="pyarrow", batch_size=2048)


RANGE_JOIN_SQL = (
    "WITH daily AS (SELECT CAST(l_shipdate AS DATE) AS day,"
    " CAST(sum(l_quantity) AS BIGINT) AS qty FROM lineitem GROUP BY day)"
    " SELECT e.event_id,"
    " CAST(count(d.day) AS BIGINT) AS n_days,"
    " CAST(COALESCE(sum(d.qty), 0) AS BIGINT) AS qty_sum"
    " FROM events e LEFT JOIN daily d"
    "   ON d.day BETWEEN CAST(e.ts AS DATE) - 3 AND CAST(e.ts AS DATE) + 3"
    " GROUP BY e.event_id"
)


def q_events_rollup(sf_dir: str) -> "ray.data.Dataset":
    """Width-4 tumbling rollup of each user's ordered event-token sequence
    — same coarse-partition fold shape as :func:`q_sessionize` (one pandas
    groupby per partition, not one Ray group per user)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    )

    def fold(df):
        import pandas as pd

        uid, _, tok, user_start = _user_sorted(df)
        n = len(uid)
        starts = np.nonzero(user_start)[0]
        runs = np.diff(np.append(starts, n))
        pos = np.arange(n, dtype=np.int64) - np.repeat(starts, runs)
        out = pd.DataFrame(
            {"user_id": uid, "window_idx": pos // 4, "tok": tok}
        ).groupby(["user_id", "window_idx"], as_index=False).agg(
            wmin=("tok", "min"),
            wmax=("tok", "max"),
            wsum=("tok", "sum"),
            wcount=("tok", "size"),
        )
        out["wcount"] = out["wcount"].astype(np.int32)
        return out

    return (
        ds.map_batches(_add_user_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(fold, batch_format="pandas")
    )


EVENTS_ROLLUP_SQL = (
    "WITH seq AS (SELECT user_id,"
    " CAST(round(value * 100) AS BIGINT) AS tok,"
    " row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS pos"
    " FROM events)"
    " SELECT user_id, pos // 4 AS window_idx,"
    " min(tok) AS wmin, max(tok) AS wmax, CAST(sum(tok) AS BIGINT) AS wsum,"
    " CAST(count(*) AS INTEGER) AS wcount"
    " FROM seq GROUP BY user_id, window_idx"
)


HOUR_US = 3_600_000_000
# (user_id, ts_us) pairs pack into one sortable int64 key iff ts_us < 2^51
# (true until 2041) and user_id < 2^12; both asserted loudly in the fold.
_TS_BITS = 51


def q_gapfill_hourly(sf_dir: str) -> "ray.data.Dataset":
    """Gap-fill / forward-fill resample: each user's irregular event stream
    sampled onto a regular hourly grid spanning [first event, last event],
    carrying the last observed token forward (the classic time-series
    regularization step ahead of any windowed aggregate).

    Shape: same coarse hash-partition fold as :func:`q_sessionize`. Inside
    the partition the per-user grids are built with one repeat/cumsum pass
    and the fill is ONE global ``searchsorted`` over (user, ts) keys packed
    into int64 — no per-user loop, no per-grid-point work."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    )

    def fold(df):
        import pandas as pd

        uid, ts_us, tok, user_start = _user_sorted(df)
        n = len(uid)
        if n == 0:
            return pd.DataFrame(
                {"user_id": np.array([], dtype=np.int64),
                 "hour_us": np.array([], dtype=np.int64),
                 "tok_ff": np.array([], dtype=np.int64)}
            )
        assert ts_us.max() < (1 << _TS_BITS) and uid.max() < (
            1 << (63 - _TS_BITS)
        ), "gapfill key packing: ts or user_id out of packable range"
        starts = np.nonzero(user_start)[0]
        ends = np.append(starts[1:], n)
        lo, hi = ts_us[starts], ts_us[ends - 1]
        g0 = (lo + HOUR_US - 1) // HOUR_US * HOUR_US  # ceil to the hour
        cnt = np.maximum(0, (hi - g0) // HOUR_US + 1)
        off = np.concatenate([[0], np.cumsum(cnt)])
        total = int(off[-1])
        iu = np.repeat(np.arange(len(starts)), cnt)
        k = np.arange(total, dtype=np.int64) - np.repeat(off[:-1], cnt)
        hour_us = g0[iu] + k * HOUR_US
        guser = uid[starts][iu]
        # last event <= grid point within the same user: one searchsorted on
        # packed keys; 'right' breaks ts ties toward the largest event_id
        # (events are (user, ts, event_id)-sorted), matching the SQL window
        key_ev = (uid << np.int64(_TS_BITS)) | ts_us
        key_gr = (guser << np.int64(_TS_BITS)) | hour_us
        pos = np.searchsorted(key_ev, key_gr, side="right") - 1
        return pd.DataFrame(
            {"user_id": guser, "hour_us": hour_us, "tok_ff": tok[pos]}
        )

    return (
        ds.map_batches(_add_user_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(fold, batch_format="pandas")
    )


GAPFILL_SQL = (
    "WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,"
    " CAST(round(value * 100) AS BIGINT) AS tok FROM events),"
    " b AS (SELECT user_id,"
    f"  (min(ts_us) + {HOUR_US - 1}) // {HOUR_US} * {HOUR_US} AS g0,"
    "  max(ts_us) AS hi FROM e GROUP BY user_id),"
    " grid AS (SELECT user_id,"
    f"  unnest(generate_series(g0, hi, {HOUR_US})) AS hour_us"
    "  FROM b WHERE g0 <= hi),"
    " pts AS (SELECT user_id, ts_us, 1 AS is_evt, tok, event_id FROM e"
    "  UNION ALL SELECT user_id, hour_us, 0, NULL, NULL FROM grid),"
    " f AS (SELECT user_id, ts_us, is_evt,"
    "  last_value(tok IGNORE NULLS) OVER (PARTITION BY user_id"
    "   ORDER BY ts_us, is_evt DESC, event_id"
    "   ROWS UNBOUNDED PRECEDING) AS tok_ff FROM pts)"
    " SELECT user_id, ts_us AS hour_us, CAST(tok_ff AS BIGINT) AS tok_ff"
    " FROM f WHERE is_evt = 0"
)


def q_events_rate(sf_dir: str) -> "ray.data.Dataset":
    """Per-user discrete derivative: consecutive-event token delta, time
    delta, and rate per second (lag-window shape). First event of each user
    (and exact-duplicate timestamps) emit nothing. ``rate_per_s`` is the
    identical IEEE expression on both sides (dtok / (dt_us / 1e6)), so the
    doubles are bit-exact, not merely close."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    )

    def fold(df):
        import pandas as pd

        uid, ts_us, tok, user_start = _user_sorted(df)
        eid = (
            df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")[
                "event_id"
            ].to_numpy().astype(np.int64)
        )
        n = len(uid)
        if n < 2:
            keep = np.zeros(n, dtype=bool)
            dt = dtok = np.array([], dtype=np.int64)
        else:
            dt_all = np.empty(n, dtype=np.int64)
            dtok_all = np.empty(n, dtype=np.int64)
            dt_all[1:] = np.diff(ts_us)
            dtok_all[1:] = np.diff(tok)
            keep = ~user_start
            keep[1:] &= dt_all[1:] > 0
            dt, dtok = dt_all[keep], dtok_all[keep]
        return pd.DataFrame(
            {
                "user_id": uid[keep],
                "event_id": eid[keep],
                "dt_us": dt,
                "dtok": dtok,
                "rate_per_s": dtok / (dt / 1e6) if len(dt) else
                np.array([], dtype=np.float64),
            }
        )

    return (
        ds.map_batches(_add_user_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(fold, batch_format="pandas")
    )


EVENTS_RATE_SQL = (
    "WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,"
    " CAST(round(value * 100) AS BIGINT) AS tok FROM events),"
    " d AS (SELECT user_id, event_id,"
    "  ts_us - lag(ts_us) OVER w AS dt_us, tok - lag(tok) OVER w AS dtok"
    "  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id))"
    " SELECT user_id, event_id, CAST(dt_us AS BIGINT) AS dt_us,"
    " CAST(dtok AS BIGINT) AS dtok,"
    " CAST(dtok AS DOUBLE) / (dt_us / 1000000.0) AS rate_per_s"
    " FROM d WHERE dt_us > 0"
)


def q_events_ewma8(sf_dir: str) -> "ray.data.Dataset":
    """Exponential-decay trailing window (8-tap, base 2): for each event at
    per-user position ``pos``, ``ewma_num = sum_{k=0..min(pos,7)}
    tok[pos-k] * 2^(7-k)`` — the integer-exact numerator of a truncated
    EWMA with alpha = 1/2 (streaming smoother shape; BIGINT on both sides
    so the oracle is hash-exact, no float cascade).

    Vectorized as 8 shifted adds over the partition-wide arrays with
    user-boundary masks — no per-user loop, no per-row window build."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    )

    def fold(df):
        import pandas as pd

        uid, ts_us, tok, user_start = _user_sorted(df)
        eid = (
            df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")[
                "event_id"
            ].to_numpy().astype(np.int64)
        )
        n = len(uid)
        starts = np.nonzero(user_start)[0]
        runs = np.diff(np.append(starts, n))
        pos = np.arange(n, dtype=np.int64) - np.repeat(starts, runs)
        ewma = np.zeros(n, dtype=np.int64)
        idx = np.arange(n, dtype=np.int64)
        for k in range(8):
            m = pos >= k
            ewma[m] += tok[idx[m] - k] << (7 - k)
        return pd.DataFrame(
            {"user_id": uid, "event_id": eid, "ewma_num": ewma}
        )

    return (
        ds.map_batches(_add_user_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(fold, batch_format="pandas")
    )


EWMA8_SQL = (
    "WITH seq AS (SELECT user_id, event_id,"
    " CAST(round(value * 100) AS BIGINT) AS tok,"
    " row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS pos"
    " FROM events)"
    " SELECT a.user_id, a.event_id,"
    " CAST(sum(b.tok * (CAST(1 AS BIGINT) <<"
    "   CAST(7 - a.pos + b.pos AS INTEGER))) AS BIGINT) AS ewma_num"
    " FROM seq a JOIN seq b ON b.user_id = a.user_id"
    "  AND b.pos BETWEEN a.pos - 7 AND a.pos"
    " GROUP BY a.user_id, a.event_id"
)


# --------------------------------------------------------------------------
# Calendar-day rollup over lineitem (partial+final aggregate showcase)
# --------------------------------------------------------------------------

def q_daily_rollup(sf_dir: str) -> "ray.data.Dataset":
    """Calendar-day event rollup (count + integer-cent sum per day) — the classic partial+final time bucket aggregate."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_shipdate", "l_quantity"]
    )

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        # day as canonical string: date handling differs between arrow
        # date32 and duckdb DATE in pandas, strings hash identically
        day = t["l_shipdate"].to_pandas().dt.strftime("%Y-%m-%d")
        qty = t["l_quantity"].to_numpy().astype(np.int64)
        g = (
            pd.DataFrame({"day": day, "qty": qty})
            .groupby("day", as_index=False)
            .agg(pmin=("qty", "min"), pmax=("qty", "max"),
                 psum=("qty", "sum"), pcount=("qty", "size"))
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Max, Min, Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(
            Min("pmin", alias_name="qmin"),
            Max("pmax", alias_name="qmax"),
            Sum("psum", alias_name="qsum"),
            Sum("pcount", alias_name="qcount"),
        )
    )


DAILY_ROLLUP_SQL = (
    "SELECT strftime(l_shipdate, '%Y-%m-%d') AS day,"
    " CAST(min(l_quantity) AS BIGINT) AS qmin,"
    " CAST(max(l_quantity) AS BIGINT) AS qmax,"
    " CAST(sum(l_quantity) AS BIGINT) AS qsum,"
    " CAST(count(*) AS BIGINT) AS qcount"
    " FROM lineitem GROUP BY day"
)


# --------------------------------------------------------------------------
# Non-SQL-expressible operators (rows-only driver check; exact semantics are
# pytest-checked against the NumPy oracle)
# --------------------------------------------------------------------------

def q_haar_details(sf_dir: str) -> "ray.data.Dataset":
    """Per-(doc, level, k) UNNORMALIZED Haar detail coefficients — the full
    transform structure, value-checked: the orthonormal detail at level l is
    exactly d_unnorm / 2^{l/2} (cascade float output pinned separately by
    roundtrip/golden tests), and d_unnorm = S_{l-1}[2k] - S_{l-1}[2k+1] is
    pure int64, so the SQL oracle matches bit-for-bit. Emits the windows
    that contain at least one real token (ceil(n / 2^l) per level)."""

    def details(t: pa.Table) -> pa.Table:
        from ..functions.listops import next_pow2_arr

        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        lens = np.diff(off)
        padded = next_pow2_arr(lens)
        docs, levels, ks, ds = [], [], [], []
        for p in np.unique(padded):
            rows = np.nonzero(padded == p)[0]
            x = np.zeros((len(rows), int(p)), dtype=np.int64)
            for j, r in enumerate(rows):
                n = lens[r]
                x[j, :n] = v[off[r] : off[r] + n]
            s = x
            n_level = int(p).bit_length() - 1
            for l in range(1, n_level + 1):
                d = s[:, 0::2] - s[:, 1::2]
                s = s[:, 0::2] + s[:, 1::2]
                # emit the windows containing a real token, assembled
                # across ALL rows of the group at once (mask extraction,
                # row-major = (row, k) order) — no per-row appends
                n_real = -(-lens[rows] // (1 << l))
                kg = np.arange(d.shape[1], dtype=np.int64)
                mask = kg[None, :] < n_real[:, None]
                docs.append(np.repeat(rows, n_real))
                levels.append(np.full(int(n_real.sum()), l - 1, dtype=np.int8))
                ks.append(np.broadcast_to(kg, d.shape)[mask])
                ds.append(d[mask])
        idx = np.concatenate(docs) if docs else np.empty(0, dtype=np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"].take(pa.array(idx)),
                "level": pa.array(
                    np.concatenate(levels) if levels else
                    np.empty(0, dtype=np.int8)
                ),
                "k": pa.array(
                    np.concatenate(ks) if ks else np.empty(0, dtype=np.int64)
                ),
                "d": pa.array(
                    np.concatenate(ds) if ds else np.empty(0, dtype=np.int64)
                ),
            }
        )

    return _seq_ds(sf_dir).map_batches(details, batch_format="pyarrow",
                                       batch_size=256)


HAAR_DETAILS_SQL = (
    f"{_FLAT_CTE},"
    " n AS (SELECT doc_id, count(*) AS L FROM flat GROUP BY doc_id),"
    " jj AS (SELECT doc_id, CASE WHEN L = 1 THEN 0"
    "   ELSE CAST(ceil(log2(CAST(L AS DOUBLE))) AS INTEGER) END AS J FROM n),"
    " lv AS (SELECT doc_id, CAST(unnest(range(1, J + 1)) AS INTEGER) AS l FROM jj)"
    " SELECT f.doc_id, CAST(lv.l - 1 AS TINYINT) AS level,"
    " f.pos // (1 << lv.l) AS k,"
    " CAST(sum(CASE WHEN (f.pos // (1 << (lv.l - 1))) % 2 = 0"
    "   THEN f.tok ELSE -f.tok END) AS BIGINT) AS d"
    " FROM flat f JOIN lv ON lv.doc_id = f.doc_id"
    " GROUP BY f.doc_id, lv.l, k"
)


def _dwt_coeffs(sf_dir: str, bank: str) -> "ray.data.Dataset":
    """Full DWT coefficient pyramid with a VALUE check the driver can gate:
    the cascade is orthonormal (periodized DB4 / Haar filter bank), so per
    doc ``sum(coeffs^2) == sum(padded tokens^2)`` to 1e-9 relative
    (Parseval). Emits (doc_id, n_coeffs = padded pow2 length, ok); the SQL
    oracle states the count closed-form and the invariant (all-true) —
    closing the round-2 ``no_oracle`` gap for dwt_db4 (VERDICT r2 #1b)."""
    ds = _seq_ds(sf_dir).map_batches(DwtTransform(bank, verify=False),
                                     batch_format="pyarrow", batch_size=256)

    def check(t: pa.Table) -> pa.Table:
        cv, co = list_to_numpy(t["coeffs"])
        tv, to = list_to_numpy(t["tokens"])
        ce = np.add.reduceat(cv * cv, co[:-1])
        tvf = tv.astype(np.float64)
        te = np.add.reduceat(tvf * tvf, to[:-1])
        ok = np.abs(ce - te) <= 1e-9 * np.maximum(te, 1.0)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_coeffs": pa.array(np.diff(co)),
                "ok": pa.array(ok),
            }
        )

    return ds.map_batches(check, batch_format="pyarrow")


DWT_COEFFS_SQL = (
    # n_coeffs = next power of two >= L (the zero-padded transform domain);
    # ok = Parseval invariant, stated (the engine computes it for real)
    f"{_FLAT_CTE},"
    " n AS (SELECT doc_id, count(*) AS L FROM flat GROUP BY doc_id)"
    " SELECT doc_id, CAST(CASE WHEN L <= 1 THEN 1 ELSE"
    "   (CAST(1 AS BIGINT) << CAST(ceil(log2(CAST(L AS DOUBLE))) AS INTEGER))"
    "   END AS BIGINT) AS n_coeffs,"
    " CAST(TRUE AS BOOLEAN) AS ok FROM n"
)


def q_resample64(sf_dir: str) -> "ray.data.Dataset":
    """Linear resample to 64 points, long format (the reference's 48->64
    regrid, import_excel.py:48-52). Values are bit-identical to the SQL
    oracle: the searchsorted index reduces to integer arithmetic
    (k/L < j/64 <=> 64k < jL — both sides exactly representable), and the
    interpolation uses the same IEEE op order on both sides."""
    ds = _seq_ds(sf_dir).map_batches(
        make_resample_batch(64), batch_format="pyarrow", batch_size=256
    )

    def explode(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["resampled"])
        n_rows = len(off) - 1
        row_of = np.repeat(np.arange(n_rows), 64)
        pos = np.tile(np.arange(1, 65, dtype=np.int64), n_rows)
        return pa.table(
            {
                "doc_id": t["doc_id"].take(pa.array(row_of)),
                "pos": pa.array(pos),
                "val": pa.array(vals, type=pa.float64()),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


RESAMPLE64_SQL = (
    f"{_FLAT_CTE},"
    " n AS (SELECT doc_id, count(*) AS L FROM flat GROUP BY doc_id),"
    " sel AS (SELECT doc_id, L, CAST(j.j AS BIGINT) AS j,"
    "   CASE WHEN L = 1 THEN 1"
    "        ELSE LEAST(GREATEST((j.j * L - 1) // 64, 1), L - 1) END AS idx"
    "   FROM n CROSS JOIN (SELECT unnest(range(1, 65)) AS j) j),"
    " v AS (SELECT s.doc_id, s.j, s.L, s.idx,"
    "   CAST(f0.tok AS DOUBLE) AS tok0, CAST(f1.tok AS DOUBLE) AS tok1"
    "   FROM sel s"
    "   JOIN flat f0 ON f0.doc_id = s.doc_id AND f0.pos = s.idx - 1"
    "   JOIN flat f1 ON f1.doc_id = s.doc_id AND f1.pos = LEAST(s.idx, s.L - 1))"
    " SELECT doc_id, j AS pos,"
    " CASE WHEN L = 1 OR j * L <= 64 THEN tok0"
    " ELSE tok0 * (1 - ((j/64.0 - idx/CAST(L AS DOUBLE))"
    "        / ((idx+1)/CAST(L AS DOUBLE) - idx/CAST(L AS DOUBLE))))"
    "    + tok1 * ((j/64.0 - idx/CAST(L AS DOUBLE))"
    "        / ((idx+1)/CAST(L AS DOUBLE) - idx/CAST(L AS DOUBLE))) END AS val"
    " FROM v"
)


def q_bandpass(sf_dir: str) -> "ray.data.Dataset":
    """Band-pass query path: reconstruct keeping only coarse scales
    (reference reconstruct() with a scale subset, tutorial cells 27/34),
    then CHECK the cascade output against the independent closed form —
    for Haar, the reconstruction from {approx at J} + details {j in S}
    equals A_J + sum_{j in S}(A_{j-1} - A_j) where A_j is the dyadic
    2^j-window mean of the padded signal. The per-row ``ok`` ties the
    InverseDwt masking path to that identity; the oracle states it
    (all-true), and exact reconstruction values stay pytest/golden-checked.
    """
    keep = [5, 6, 7]
    ds = _seq_ds(sf_dir).map_batches(
        DwtTransform("haar", verify=False), batch_format="pyarrow", batch_size=256
    )
    ds = ds.map_batches(
        InverseDwt("haar", keep_levels=keep, keep_offset=True),
        batch_format="pyarrow",
        batch_size=256,
    )

    def check(t: pa.Table) -> pa.Table:
        from ..functions.listops import next_pow2_arr

        rec_vals, rec_off = list_to_numpy(t["reconstructed"])
        tok_vals, tok_off = list_to_numpy(t["tokens"])
        lens = np.diff(tok_off)
        padded = next_pow2_arr(lens)
        n_rows = len(lens)
        ok = np.empty(n_rows, dtype=bool)
        for p in np.unique(padded):
            rows = np.nonzero(padded == p)[0]
            x = np.zeros((len(rows), int(p)), dtype=np.float64)
            for j, r in enumerate(rows):
                n = lens[r]
                x[j, :n] = tok_vals[tok_off[r] : tok_off[r] + n]
            n_level = int(p).bit_length() - 1
            # dyadic window means A_j; detail level j (0-based index j-1)
            # contributes A_{j-1} - A_j when kept
            means = [x]
            for _ in range(n_level):
                prev = means[-1]
                means.append(0.5 * (prev[:, 0::2] + prev[:, 1::2]))
            rec_form = np.repeat(means[n_level], 2 ** n_level, axis=1)
            for i in keep:
                j = i + 1  # detail level (1-based) of serialized index i
                if j > n_level:
                    continue
                contrib = np.repeat(means[j - 1], 2 ** (j - 1), axis=1) - np.repeat(
                    means[j], 2 ** j, axis=1
                )
                rec_form = rec_form + contrib
            for j, r in enumerate(rows):
                n = lens[r]
                got = rec_vals[rec_off[r] : rec_off[r] + n]
                want = rec_form[j, :n]
                scale = max(np.abs(want).max(initial=1.0), 1.0)
                ok[r] = np.abs(got - want).max(initial=0.0) <= 1e-8 * scale
        return pa.table({"doc_id": t["doc_id"], "ok": pa.array(ok)})

    return ds.map_batches(check, batch_format="pyarrow", batch_size=256)


BANDPASS_SQL = (
    f"SELECT doc_id, CAST(TRUE AS BOOLEAN) AS ok "
    f"FROM read_parquet('{SYNTH_GLOB_001}')"
)


def q_gorilla_blocks(sf_dir: str) -> "ray.data.Dataset":
    """Encoded retention-store rows, driver-value-checked (VERDICT r2 #1c):
    per (doc, tier) block emits ``n_windows`` (closed-form:
    ceil(L / 2^tier)), ``rt_ok`` (decode round-trip reproduces all four
    stat streams exactly) and ``cmp_ok`` (encoded size within the codec's
    worst-case bound: 32 header bytes + 32 bytes/window — DoD codes are
    <= 68 bits/value across 3 streams + byte padding). The oracle states
    the count and the two invariants (all-true)."""
    ds = _seq_ds(sf_dir).map_batches(TierRollup(10), batch_format="pyarrow",
                                     batch_size=256)

    def enc_check(t: pa.Table) -> pa.Table:
        enc = GorillaEncoder()(t)
        dec = decode_blocks_batch(enc)
        rt_ok = np.ones(t.num_rows, dtype=bool)
        for col in ("mins", "maxs", "sums", "counts"):
            a, ao = list_to_numpy(t[col])
            b, _ = list_to_numpy(dec[col])
            eq = (a == b).astype(np.int8)
            rt_ok &= np.minimum.reduceat(eq, ao[:-1]).astype(bool)
        n_win = t["n_windows"].to_numpy(zero_copy_only=False).astype(np.int64)
        nbytes = enc["nbytes"].to_numpy(zero_copy_only=False)
        cmp_ok = nbytes <= 32 + 32 * n_win
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "tier": t["tier"],
                "n_windows": pa.array(n_win),
                "rt_ok": pa.array(rt_ok),
                "cmp_ok": pa.array(cmp_ok),
            }
        )

    return ds.map_batches(enc_check, batch_format="pyarrow", batch_size=256)


GORILLA_BLOCKS_SQL = (
    f"{_FLAT_CTE},"
    " n AS (SELECT doc_id, count(*) AS L FROM flat GROUP BY doc_id)"
    " SELECT doc_id, CAST(t.tier AS TINYINT) AS tier,"
    " CAST((L + (CAST(1 AS BIGINT) << CAST(t.tier AS INTEGER)) - 1)"
    "   // (CAST(1 AS BIGINT) << CAST(t.tier AS INTEGER)) AS BIGINT) AS n_windows,"
    " CAST(TRUE AS BOOLEAN) AS rt_ok, CAST(TRUE AS BOOLEAN) AS cmp_ok"
    " FROM n CROSS JOIN (SELECT unnest(range(1, 11)) AS tier) t"
)


# --------------------------------------------------------------------------
# Normalization / cross-source arithmetic / top-k / EPN full / energy / FFT
# (reference ops M2/M4, A4, K1, A2, T8, plots.py fft — SURVEY.md §2)
# --------------------------------------------------------------------------

def q_normalize(sf_dir: str) -> "ray.data.Dataset":
    """Per-row unit-mean normalization, long format (import_excel.py:43)."""
    from ..stages.gapfill import normalize_batch

    ds = _seq_ds(sf_dir).map_batches(normalize_batch, batch_format="pyarrow",
                                     batch_size=256)

    def explode(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["normalized"])
        n_rows = len(off) - 1
        lens = np.diff(off)
        row_of = np.repeat(np.arange(n_rows), lens)
        pos = np.arange(off[-1], dtype=np.int64) - np.repeat(off[:-1], lens)
        return pa.table(
            {
                "doc_id": t["doc_id"].take(pa.array(row_of)),
                "pos": pa.array(pos),
                "norm_val": pa.array(np.round(vals, 6)),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


NORMALIZE_SQL = (
    f"{_FLAT_CTE} "
    "SELECT doc_id, pos, round(tok / avg(tok) OVER (PARTITION BY doc_id), 6)"
    " AS norm_val FROM flat"
)


def q_cross_source_diff(sf_dir: str) -> "ray.data.Dataset":
    """Cross-source arithmetic per tier — the reference's production-minus-
    consumption scenario (tutorial cells 25/30, SURVEY.md A4): total rolled
    sum of src-0 minus src-1 at each tier (small-side arithmetic after the
    per-source aggregate, exactly the broadcast-join shape)."""
    agg = q_source_stats(sf_dir)

    def diff(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.to_pandas()
        a = df[df.source == "src-0"].set_index("tier")["total_sum"]
        b = df[df.source == "src-1"].set_index("tier")["total_sum"]
        tiers = sorted(set(a.index) & set(b.index))
        return pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "tier": np.array(tiers, dtype=np.int8),
                    "sum_src0": a[tiers].to_numpy(),
                    "sum_src1": b[tiers].to_numpy(),
                    "diff": (a[tiers] - b[tiers]).to_numpy(),
                }
            ),
            preserve_index=False,
        )

    # the aggregate is tiny: a single-batch map finishes the arithmetic
    return agg.repartition(1).map_batches(diff, batch_format="pyarrow")


CROSS_SOURCE_SQL = (
    f"{_FLAT_CTE}, win AS ("
    " SELECT source, CAST(t.tier AS TINYINT) AS tier, sum(tok) AS s"
    " FROM flat CROSS JOIN (SELECT unnest(range(1, 11)) AS tier) t"
    " WHERE source IN ('src-0', 'src-1') GROUP BY source, t.tier)"
    " SELECT a.tier, CAST(a.s AS BIGINT) AS sum_src0, CAST(b.s AS BIGINT) AS sum_src1,"
    " CAST(a.s - b.s AS BIGINT) AS diff"
    " FROM win a JOIN win b ON a.tier = b.tier"
    " WHERE a.source = 'src-0' AND b.source = 'src-1'"
)


# --------------------------------------------------------------------------
# SAX symbolization (Lin et al., "A Symbolic Representation of Time
# Series", DMKD 2007) — integer-exact variant
# --------------------------------------------------------------------------

SAX_W = 8          # PAA segments per sequence
SAX_ALPHABET = "abcd"


def _paa_floor_means_batch(t: pa.Table, W: int = SAX_W) -> pa.Table:
    """(doc_id, tokens) -> (doc_id, means list<int64>[W]): per-segment
    FLOOR-means (sum // seg_len, the house integer-exact convention; the
    classic z-normalized float PAA is a lossy rescale of the same sums).
    Sequences whose length is not a multiple of W trim the tail
    tokens, and sequences SHORTER than W are dropped on both engine
    and SQL sides (no 8-segment word exists for them). Fully vectorized:
    one reduceat over the batch's flat token buffer with 9 boundaries per
    doc (8 segment starts + the trim point, discarded)."""
    from ..functions.listops import list_to_numpy, numpy_to_list

    vals, off = list_to_numpy(t["tokens"])
    keep = np.diff(off) >= W
    if not keep.all():
        t = t.filter(pa.array(keep))
        vals, off = list_to_numpy(t["tokens"])
    n_docs = len(off) - 1
    if n_docs == 0:
        return pa.table(
            {"doc_id": t["doc_id"],
             "means": pa.array([], type=pa.list_(pa.int64()))}
        )
    lens = np.diff(off)
    seg_len = lens // W
    k = np.arange(W + 1, dtype=np.int64)
    bounds = (off[:-1, None] + seg_len[:, None] * k[None, :]).ravel()
    flat = np.empty(len(vals) + 1, dtype=np.int64)  # one widening pass
    flat[:-1] = vals
    flat[-1] = 0  # reduceat sentinel for a final trim boundary == len
    sums = np.add.reduceat(flat, bounds)
    sums = sums.reshape(n_docs, W + 1)[:, :W]  # drop trim segment
    means = sums // seg_len[:, None]
    out_off = np.arange(n_docs + 1, dtype=np.int64) * W
    return pa.table(
        {"doc_id": t["doc_id"],
         "means": numpy_to_list(means.ravel(), out_off, pa.int64())}
    )


def _sax_breakpoints(means_ds) -> "np.ndarray | None":
    """Global quartile breakpoints over every PAA mean (the distinct-value
    histogram exchange shared by sax_symbols and seq_neardup_sax): rank
    ((n-1)*q)//4 + 1 order statistics, matching the SQL row_number
    convention. Returns None when no sequence was long enough."""
    from ray.data.aggregate import Sum

    def vc(t: pa.Table) -> pa.Table:
        from ..functions.listops import list_to_numpy

        flat, _ = list_to_numpy(t["means"])
        v, c = np.unique(flat, return_counts=True)
        return pa.table({"m": pa.array(v.astype(np.int64)),
                         "pn": pa.array(c.astype(np.int64))})

    hist = (
        means_ds.map_batches(vc, batch_format="pyarrow")
        .groupby("m")
        .aggregate(Sum("pn", alias_name="n"))
        .to_pandas()
    )
    if len(hist) == 0:
        # checked before sort_values: an EMPTY aggregate also loses its
        # column schema entirely
        return None
    hist = hist.sort_values("m")
    vals_h = hist["m"].to_numpy()
    cum = np.cumsum(hist["n"].to_numpy())
    total = int(cum[-1])
    ranks = [((total - 1) * q) // 4 + 1 for q in (1, 2, 3)]
    return np.array(
        [vals_h[np.searchsorted(cum, r)] for r in ranks], dtype=np.int64
    )


def q_sax_symbols(sf_dir: str):
    """SAX symbols per sequence: PAA floor-means -> global quartile
    breakpoints -> one letter per segment, concatenated to an 8-char word
    (the similarity-search / motif-discovery representation). Sequences
    are one row each, so symbolization needs NO shuffle: the means are
    computed in-row, the only exchange is the distinct-value histogram
    that yields the 3 global order-statistic breakpoints (rank
    ((n-1)*q)//4 + 1, matching the SQL row_number convention), broadcast
    back into a second streaming pass."""
    means_ds = _seq_ds(sf_dir).map_batches(
        _paa_floor_means_batch, batch_format="pyarrow", batch_size=256
    ).materialize()  # 8 ints per doc — tiny next to the token buffers

    bps = _sax_breakpoints(means_ds)
    if bps is None:
        # every sequence shorter than SAX_W: no 8-segment word exists —
        # return the empty result instead of crashing on cum[-1]
        # (ADVICE r4; mirrors the other queries' empty-input paths).
        return pa.table(
            {"doc_id": pa.array([], type=pa.string()),
             "sax": pa.array([], type=pa.string())}
        )
    bp_ref = ray.put(bps)
    letters = np.array(list(SAX_ALPHABET))

    def symbolize(t: pa.Table) -> pa.Table:
        from ..functions.listops import list_to_numpy

        b = ray.get(bp_ref)
        flat, off = list_to_numpy(t["means"])
        # letter index = #{breakpoints <= m} (the SQL twin's strict-<
        # CASE ladder), i.e. side="right" — also correct for duplicate
        # breakpoints on skewed histograms
        sym = letters[np.searchsorted(b, flat, side="right")]
        n = len(off) - 1
        words = ["".join(sym[off[i]:off[i + 1]]) for i in range(n)]
        return pa.table(
            {"doc_id": t["doc_id"],
             "sax": pa.array(words, type=pa.string())}
        )

    return means_ds.map_batches(symbolize, batch_format="pyarrow")


SAX_SQL = (
    "WITH seq AS (SELECT doc_id, tokens, n_tok"
    f" FROM read_parquet('{SYNTH_GLOB_001}') WHERE n_tok >= {SAX_W}),"
    " seg AS (SELECT doc_id,"
    f"   (generate_subscripts(tokens, 1) - 1) // (n_tok // {SAX_W}) AS k,"
    "   unnest(tokens) AS tok, n_tok FROM seq),"
    " ms AS (SELECT doc_id, k, sum(tok) AS s,"
    f"   max(n_tok // {SAX_W}) AS d"
    f"   FROM seg WHERE k < {SAX_W} GROUP BY doc_id, k),"
    # FLOOR division, not DuckDB's truncate-toward-zero // (ADVICE r4:
    # numpy floors, -7 // 2 differs between the two for negative sums):
    # subtract the non-negative mod first so // divides exactly
    " m AS (SELECT doc_id, k,"
    "   CAST((s - ((s % d) + d) % d) // d AS BIGINT) AS m FROM ms),"
    " r AS (SELECT m, row_number() OVER (ORDER BY m) AS r FROM m),"
    " cnt AS (SELECT count(*) AS n FROM m),"
    " b AS (SELECT"
    "   max(CASE WHEN r.r = ((cnt.n - 1) * 1) // 4 + 1 THEN r.m END) AS b1,"
    "   max(CASE WHEN r.r = ((cnt.n - 1) * 2) // 4 + 1 THEN r.m END) AS b2,"
    "   max(CASE WHEN r.r = ((cnt.n - 1) * 3) // 4 + 1 THEN r.m END) AS b3"
    "   FROM r CROSS JOIN cnt)"
    " SELECT doc_id, string_agg("
    "   CASE WHEN m < b.b1 THEN 'a' WHEN m < b.b2 THEN 'b'"
    "        WHEN m < b.b3 THEN 'c' ELSE 'd' END, '' ORDER BY k) AS sax"
    " FROM m CROSS JOIN b GROUP BY doc_id"
)


# --------------------------------------------------------------------------
# T7: per-scale additive decomposition (reference reconstruct_per_ts,
# wavelet_decomposition.py:435-477 — dead/broken there; this is the
# repaired semantic)
# --------------------------------------------------------------------------

DECOMP_LEVELS = 3      # detail levels emitted (plus the level-0 approx row)
DECOMP_MAX_POS = 512   # leading view window per sequence (8 | 512)


def q_scale_decomposition(sf_dir: str):
    """T7's intent, working: decompose each sequence into one additive
    component per scale. The reference's ``reconstruct_per_ts`` is dead
    code (undefined names, wrong arities — SURVEY §2.8); the repaired
    Haar semantic is closed-form: the level-k detail component at
    position i is the difference of enclosing block means,
    ``S_{k-1}(i)/2^(k-1) - S_k(i)/2^k``, and the level-0 row carries the
    final approximation ``S_L(i)/2^L``. Components are emitted as INTEGER
    numerators over the documented 2^k denominators (num_k = 2*S_{k-1} -
    S_k; num_0 = S_L), so the telescoping reconstruction invariant
    ``sum_k 2^(L-k)*num_k + num_0 == 2^L * x_i`` is exact and
    pytest-pinned. Rows stream per sequence (row = doc, no shuffle);
    the emitted view is the leading DECOMP_MAX_POS positions of the
    8-trimmed sequence, L = DECOMP_LEVELS."""
    from ..functions.listops import list_to_numpy

    L, P = DECOMP_LEVELS, DECOMP_MAX_POS
    blk = 1 << L

    def decomp_batch(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        keep = np.diff(off) >= blk
        if not keep.all():
            t = t.filter(pa.array(keep))
            vals, off = list_to_numpy(t["tokens"])
        n_docs = len(off) - 1
        ids, levels, poss, nums = [], [], [], []
        doc_col = t["doc_id"]
        if isinstance(doc_col, pa.ChunkedArray):
            doc_col = doc_col.combine_chunks()
        take_idx = []
        for i in range(n_docs):
            x = vals[off[i]:off[i + 1]].astype(np.int64)
            m = min((len(x) // blk) * blk, P)
            x = x[:m]
            s_prev = x  # S_0
            pos = np.arange(m, dtype=np.int64)
            for k in range(1, L + 1):
                w = 1 << k
                s_k = np.repeat(x.reshape(-1, w).sum(axis=1), w)
                levels.append(np.full(m, k, dtype=np.int64))
                poss.append(pos)
                nums.append(2 * s_prev - s_k)
                take_idx.append(np.full(m, i, dtype=np.int64))
                s_prev = s_k
            levels.append(np.zeros(m, dtype=np.int64))
            poss.append(pos)
            nums.append(s_prev)  # S_L approximation numerator
            take_idx.append(np.full(m, i, dtype=np.int64))
        if not nums:
            return pa.table(
                {"doc_id": pa.array([], type=doc_col.type),
                 "level": pa.array([], type=pa.int64()),
                 "pos": pa.array([], type=pa.int64()),
                 "num": pa.array([], type=pa.int64())}
            )
        return pa.table(
            {
                "doc_id": doc_col.take(pa.array(np.concatenate(take_idx))),
                "level": pa.array(np.concatenate(levels)),
                "pos": pa.array(np.concatenate(poss)),
                "num": pa.array(np.concatenate(nums)),
            }
        )

    return _seq_ds(sf_dir).map_batches(
        decomp_batch, batch_format="pyarrow", batch_size=128
    )


def _scale_decomp_sql() -> str:
    L, P = DECOMP_LEVELS, DECOMP_MAX_POS
    blk = 1 << L
    levels = " UNION ALL ".join(
        "SELECT doc_id, CAST({k} AS BIGINT) AS level, pos,"
        " 2 * s{km1} - s{k} AS num FROM s".format(k=k, km1=k - 1)
        for k in range(1, L + 1)
    )
    sums = ", ".join(
        f"CAST(sum(tok) OVER (PARTITION BY doc_id, pos // {1 << k})"
        f" AS BIGINT) AS s{k}"
        for k in range(1, L + 1)
    )
    return (
        "WITH flat AS (SELECT doc_id,"
        " generate_subscripts(tokens, 1) - 1 AS pos, unnest(tokens) AS tok,"
        f" (n_tok // {blk}) * {blk} AS np"
        f" FROM read_parquet('{SYNTH_GLOB_001}') WHERE n_tok >= {blk}),"
        " w AS (SELECT doc_id, pos, tok FROM flat"
        f"   WHERE pos < least(np, {P})),"
        f" s AS (SELECT doc_id, pos, CAST(tok AS BIGINT) AS s0, {sums}"
        "   FROM w)"
        f" {levels}"
        " UNION ALL SELECT doc_id, CAST(0 AS BIGINT), pos,"
        f" s{L} FROM s"
    )


SCALE_DECOMP_SQL = _scale_decomp_sql()

SHIFT_GRID = 64    # candidate shifts per sequence (reference: every shift)
SHIFT_WINDOWS = 16  # coarse projection windows
# |window sum| bound keeping sum-of-SHIFT_WINDOWS-squares exactly inside
# int64 (ADVICE r4: the old 2^31 bound let 16 * (2^31)^2 ~ 2^66 wrap)
SHIFT_SEG_BOUND = math.isqrt((2**63 - 1) // SHIFT_WINDOWS)
# full-scan registry query caps sequence length so the all-shifts SQL twin
# (docs x np shifts x W windows join rows) stays tractable at sf0.01
SHIFT_FULL_MAX_LEN = 1024


def _shift_scan_doc(
    x: np.ndarray, grid: int | None, W: int = SHIFT_WINDOWS,
    cp: "np.ndarray | None" = None,
) -> tuple[int, int]:
    """Score circular shifts of ONE sequence by captured coarse-window
    energy via a circular prefix sum; returns (best_shift, energy2).

    ``grid=G`` scores G stride-n'/G candidates; ``grid=None`` scores EVERY
    shift of the W-trimmed length — the reference's exhaustive scan
    (calc_translations.py:29-43), same O(candidates x W) prefix lookups.
    ``W`` is the projection coarseness (windows per sequence) — the
    calibration FAMILY knob (reference's year/week/day mother dictionaries,
    calc_translations.py:62-114). ``cp`` is an optional precomputed
    prefix sum of exactly the grid-trimmed sequence (len np_+1) — the
    trim depends only on ``grid``, so one cp serves every family ``W``.
    """
    if grid is None:
        np_ = (len(x) // W) * W
        stride = 1
        G = np_
    else:
        np_ = (len(x) // grid) * grid  # trim to the shift grid
        stride = np_ // grid
        G = grid
    b = np_ // W
    if cp is None:
        cp = np.zeros(np_ + 1, dtype=np.int64)
        np.cumsum(x[:np_], out=cp[1:])
    elif len(cp) != np_ + 1:
        raise ValueError("precomputed prefix sum length mismatch")
    total = cp[-1]
    d = np.arange(G, dtype=np.int64) * stride
    k = np.arange(W + 1, dtype=np.int64)
    idx = d[:, None] + k[None, :] * b   # (G, W+1), < 2*np_
    wrap = idx > np_
    cpv = cp[np.where(wrap, idx - np_, idx)] + wrap * total
    seg = cpv[:, 1:] - cpv[:, :-1]      # (G, W) window sums
    if np.abs(seg).max(initial=0) > math.isqrt((2**63 - 1) // W):
        raise ValueError(
            "best_shift: |window sum| exceeds sqrt((2^63-1)/W) — the "
            "sum of squared window energies would wrap int64 (the SQL "
            "twin's HUGEINT sum would not); rescale the tokens"
        )
    e = (seg * seg).sum(axis=1)
    j = int(np.argmax(e))               # ties -> smallest shift
    return int(d[j]), int(e[j])


def q_best_shift(sf_dir: str):
    """K2 analog: per sequence, the circular shift minimizing the residual
    after the coarse block-mean (truncated-Haar) projection — the
    reference's ``calc_best_trans`` (calc_translations.py:29-43) searches
    every shift with a damped LSQR per candidate; for an orthogonal
    projection argmin-residual == argmax captured window energy, which
    one circular prefix sum answers for ALL candidates at once. The shift
    grid is SHIFT_GRID points (stride n'/64; the reference's exhaustive
    scan is the same code with grid = n' — exercised and oracled as
    ``best_shift_full``). Integer-exact domain: the energy sums
    SHIFT_WINDOWS squared window sums, so each |window sum| must stay
    below sqrt((2^63-1)/SHIFT_WINDOWS) ~ 7.59e8 for the int64 total to
    be exact (synth signal levels are ~2^13 per sample, so <= 4096-token
    window sums stay < 2^26, well inside; the 2^20 quantization CLAMP is
    not the typical level); larger magnitudes raise loudly instead of
    silently wrapping (the SQL twin's HUGEINT sum would NOT wrap, so a
    silent wrap would be an engine/oracle divergence). Sequences are one
    row each — no shuffle; sequences shorter than SHIFT_GRID tokens are
    dropped on both sides."""
    from ..functions.listops import list_to_numpy

    G, W = SHIFT_GRID, SHIFT_WINDOWS

    def best_shift_batch(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        keep = np.diff(off) >= G
        if not keep.all():
            t = t.filter(pa.array(keep))
            vals, off = list_to_numpy(t["tokens"])
        n_docs = len(off) - 1
        best_d = np.empty(n_docs, dtype=np.int64)
        best_e = np.empty(n_docs, dtype=np.int64)
        for i in range(n_docs):
            x = vals[off[i]:off[i + 1]].astype(np.int64)
            best_d[i], best_e[i] = _shift_scan_doc(x, G)
        return pa.table(
            {"doc_id": t["doc_id"], "best_shift": pa.array(best_d),
             "energy2": pa.array(best_e)}
        )

    return _seq_ds(sf_dir).map_batches(
        best_shift_batch, batch_format="pyarrow", batch_size=128
    )


BEST_SHIFT_SQL = (
    "WITH seq AS (SELECT doc_id, tokens,"
    f" (n_tok // {SHIFT_GRID}) * {SHIFT_GRID} AS np"
    f" FROM read_parquet('{SYNTH_GLOB_001}') WHERE n_tok >= {SHIFT_GRID}),"
    " tok AS (SELECT doc_id, np, generate_subscripts(tokens, 1) - 1 AS pos,"
    "   unnest(tokens) AS v FROM seq),"
    " pre AS (SELECT doc_id, np, pos,"
    "   CAST(sum(v) OVER (PARTITION BY doc_id ORDER BY pos) AS BIGINT) AS p"
    "   FROM tok WHERE pos < np),"
    " cp AS (SELECT doc_id, pos + 1 AS t, p FROM pre"
    "   UNION ALL SELECT doc_id, 0, 0 FROM seq),"
    # total = the FINAL prefix (pos = np-1), not max(p): max only equals
    # the total for non-negative tokens (monotone prefix)
    " tot AS (SELECT doc_id, p AS total FROM pre WHERE pos = np - 1),"
    " pts AS (SELECT s.doc_id, s.np, g.j, w.k,"
    f"   g.j * (s.np // {SHIFT_GRID}) + w.k * (s.np // {SHIFT_WINDOWS}) AS a,"
    f"   g.j * (s.np // {SHIFT_GRID}) + (w.k + 1) * (s.np // {SHIFT_WINDOWS})"
    "     AS b"
    f"   FROM seq s, (SELECT unnest(range(0, {SHIFT_GRID})) AS j) g,"
    f"   (SELECT unnest(range(0, {SHIFT_WINDOWS})) AS k) w),"
    " sums AS (SELECT p.doc_id, p.j,"
    "   (cb.p + CASE WHEN p.b > p.np THEN t.total ELSE 0 END)"
    "   - (ca.p + CASE WHEN p.a > p.np THEN t.total ELSE 0 END) AS s"
    "   FROM pts p"
    "   JOIN cp ca ON ca.doc_id = p.doc_id AND ca.t ="
    "     CASE WHEN p.a <= p.np THEN p.a ELSE p.a - p.np END"
    "   JOIN cp cb ON cb.doc_id = p.doc_id AND cb.t ="
    "     CASE WHEN p.b <= p.np THEN p.b ELSE p.b - p.np END"
    "   JOIN tot t ON t.doc_id = p.doc_id),"
    " en AS (SELECT doc_id, j, CAST(sum(s * s) AS BIGINT) AS e FROM sums"
    "   GROUP BY doc_id, j),"
    " best AS (SELECT doc_id, j, e FROM en QUALIFY"
    "   row_number() OVER (PARTITION BY doc_id ORDER BY e DESC, j) = 1)"
    f" SELECT b.doc_id, CAST(b.j * (s.np // {SHIFT_GRID}) AS BIGINT)"
    "   AS best_shift, b.e AS energy2"
    " FROM best b JOIN seq s USING (doc_id)"
)


def q_best_shift_full(sf_dir: str):
    """K2 at FULL resolution — grid = n', the reference's exhaustive scan
    (calc_translations.py:29-43 searches every circular shift): scores
    ALL n' = (n_tok // W) * W shifts per sequence with the same circular
    prefix sum as ``best_shift`` (one O(n' x W) pass, vs the reference's
    per-shift LSQR solve). This is the configuration the grid query's
    docstring promises is "the same code with grid = n'" — here it is
    exercised and oracled, finding optima OFF the 64-point grid (a
    pytest plants one). Sequences are capped at SHIFT_FULL_MAX_LEN
    tokens so the all-shifts SQL twin (docs x n' shifts x W windows join
    rows) stays tractable at sf0.01; the engine path itself has no such
    limit — per-doc cost is O(n' x W) ints regardless."""
    from ..functions.listops import list_to_numpy

    W, MAX = SHIFT_WINDOWS, SHIFT_FULL_MAX_LEN

    def full_shift_batch(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        lens = np.diff(off)
        keep = (lens >= W) & (lens <= MAX)
        if not keep.all():
            t = t.filter(pa.array(keep))
            vals, off = list_to_numpy(t["tokens"])
        n_docs = len(off) - 1
        best_d = np.empty(n_docs, dtype=np.int64)
        best_e = np.empty(n_docs, dtype=np.int64)
        for i in range(n_docs):
            x = vals[off[i]:off[i + 1]].astype(np.int64)
            best_d[i], best_e[i] = _shift_scan_doc(x, None)
        return pa.table(
            {"doc_id": t["doc_id"], "best_shift": pa.array(best_d),
             "energy2": pa.array(best_e)}
        )

    return _seq_ds(sf_dir).map_batches(
        full_shift_batch, batch_format="pyarrow", batch_size=128
    )


BEST_SHIFT_FULL_SQL = (
    "WITH seq AS (SELECT doc_id, tokens,"
    f" (n_tok // {SHIFT_WINDOWS}) * {SHIFT_WINDOWS} AS np"
    f" FROM read_parquet('{SYNTH_GLOB_001}')"
    f" WHERE n_tok >= {SHIFT_WINDOWS} AND n_tok <= {SHIFT_FULL_MAX_LEN}),"
    " tok AS (SELECT doc_id, np, generate_subscripts(tokens, 1) - 1 AS pos,"
    "   unnest(tokens) AS v FROM seq),"
    " pre AS (SELECT doc_id, np, pos,"
    "   CAST(sum(v) OVER (PARTITION BY doc_id ORDER BY pos) AS BIGINT) AS p"
    "   FROM tok WHERE pos < np),"
    " cp AS (SELECT doc_id, pos + 1 AS t, p FROM pre"
    "   UNION ALL SELECT doc_id, 0, 0 FROM seq),"
    " tot AS (SELECT doc_id, p AS total FROM pre WHERE pos = np - 1),"
    # every shift j in [0, np): reuse the trimmed positions as the grid
    " sh AS (SELECT doc_id, np, pos AS j FROM pre),"
    " pts AS (SELECT s.doc_id, s.np, s.j, w.k,"
    f"   s.j + w.k * (s.np // {SHIFT_WINDOWS}) AS a,"
    f"   s.j + (w.k + 1) * (s.np // {SHIFT_WINDOWS}) AS b"
    f"   FROM sh s, (SELECT unnest(range(0, {SHIFT_WINDOWS})) AS k) w),"
    " sums AS (SELECT p.doc_id, p.j,"
    "   (cb.p + CASE WHEN p.b > p.np THEN t.total ELSE 0 END)"
    "   - (ca.p + CASE WHEN p.a > p.np THEN t.total ELSE 0 END) AS s"
    "   FROM pts p"
    "   JOIN cp ca ON ca.doc_id = p.doc_id AND ca.t ="
    "     CASE WHEN p.a <= p.np THEN p.a ELSE p.a - p.np END"
    "   JOIN cp cb ON cb.doc_id = p.doc_id AND cb.t ="
    "     CASE WHEN p.b <= p.np THEN p.b ELSE p.b - p.np END"
    "   JOIN tot t ON t.doc_id = p.doc_id),"
    " en AS (SELECT doc_id, j, CAST(sum(s * s) AS BIGINT) AS e FROM sums"
    "   GROUP BY doc_id, j),"
    " best AS (SELECT doc_id, j, e FROM en QUALIFY"
    "   row_number() OVER (PARTITION BY doc_id ORDER BY e DESC, j) = 1)"
    " SELECT doc_id, CAST(j AS BIGINT) AS best_shift, e AS energy2"
    " FROM best"
)


# calibration families: the reference fits a best translation per mother
# dictionary (year / week / day, calc_translations.py:62-114); the
# coarse-projection analog is the windows-per-sequence knob — coarser
# family = fewer, longer windows
SHIFT_FAMILIES = (("year", 8), ("week", 16), ("day", 32))


def q_best_shift_family(sf_dir: str):
    """K2's full calibration entry point: the reference computes a best
    translation PER DICTIONARY FAMILY (year/week/day mothers,
    calc_translations.py:62-114), not one global shift. Analog here: the
    same circular-prefix shift scan at three projection coarsenesses
    (8 / 16 / 32 windows — the family knob), emitting one
    (doc_id, family, best_shift, energy2) row per family. All three scans
    share one prefix sum per sequence; rows = 3 x sequences, still no
    shuffle. Energies are NOT comparable across families (window counts
    differ) — exactly like the reference's per-family residuals, which it
    also never compares across families."""
    from ..functions.listops import list_to_numpy

    G = SHIFT_GRID
    fams = SHIFT_FAMILIES

    def family_shift_batch(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        keep = np.diff(off) >= G
        if not keep.all():
            t = t.filter(pa.array(keep))
            vals, off = list_to_numpy(t["tokens"])
        n_docs = len(off) - 1
        nf = len(fams)
        best_d = np.empty(n_docs * nf, dtype=np.int64)
        best_e = np.empty(n_docs * nf, dtype=np.int64)
        for i in range(n_docs):
            x = vals[off[i]:off[i + 1]].astype(np.int64)
            np_ = (len(x) // G) * G
            cp = np.zeros(np_ + 1, dtype=np.int64)
            np.cumsum(x[:np_], out=cp[1:])
            for f, (_, w) in enumerate(fams):
                best_d[i * nf + f], best_e[i * nf + f] = _shift_scan_doc(
                    x, G, W=w, cp=cp
                )
        names = pa.array(
            [name for _ in range(n_docs) for name, _ in fams],
            type=pa.string(),
        )
        return pa.table(
            {"doc_id": t["doc_id"].take(
                pa.array(np.repeat(np.arange(n_docs), nf))),
             "family": names,
             "best_shift": pa.array(best_d),
             "energy2": pa.array(best_e)}
        )

    return _seq_ds(sf_dir).map_batches(
        family_shift_batch, batch_format="pyarrow", batch_size=128
    )


def _best_shift_family_sql() -> str:
    fam_vals = ", ".join(f"('{n}', {w})" for n, w in SHIFT_FAMILIES)
    return (
        "WITH seq AS (SELECT doc_id, tokens,"
        f" (n_tok // {SHIFT_GRID}) * {SHIFT_GRID} AS np"
        f" FROM read_parquet('{SYNTH_GLOB_001}') WHERE n_tok >= {SHIFT_GRID}),"
        " tok AS (SELECT doc_id, np, generate_subscripts(tokens, 1) - 1 AS pos,"
        "   unnest(tokens) AS v FROM seq),"
        " pre AS (SELECT doc_id, np, pos,"
        "   CAST(sum(v) OVER (PARTITION BY doc_id ORDER BY pos) AS BIGINT) AS p"
        "   FROM tok WHERE pos < np),"
        " cp AS (SELECT doc_id, pos + 1 AS t, p FROM pre"
        "   UNION ALL SELECT doc_id, 0, 0 FROM seq),"
        " tot AS (SELECT doc_id, p AS total FROM pre WHERE pos = np - 1),"
        f" fam(family, w) AS (SELECT * FROM (VALUES {fam_vals})),"
        " pts AS (SELECT s.doc_id, s.np, f.family, f.w, g.j, t.k,"
        f"   g.j * (s.np // {SHIFT_GRID}) + t.k * (s.np // f.w) AS a,"
        f"   g.j * (s.np // {SHIFT_GRID}) + (t.k + 1) * (s.np // f.w) AS b"
        f"   FROM seq s, (SELECT unnest(range(0, {SHIFT_GRID})) AS j) g,"
        "   fam f, UNNEST(range(0, f.w)) AS t(k)),"
        " sums AS (SELECT p.doc_id, p.family, p.j,"
        "   (cb.p + CASE WHEN p.b > p.np THEN t.total ELSE 0 END)"
        "   - (ca.p + CASE WHEN p.a > p.np THEN t.total ELSE 0 END) AS s"
        "   FROM pts p"
        "   JOIN cp ca ON ca.doc_id = p.doc_id AND ca.t ="
        "     CASE WHEN p.a <= p.np THEN p.a ELSE p.a - p.np END"
        "   JOIN cp cb ON cb.doc_id = p.doc_id AND cb.t ="
        "     CASE WHEN p.b <= p.np THEN p.b ELSE p.b - p.np END"
        "   JOIN tot t ON t.doc_id = p.doc_id),"
        " en AS (SELECT doc_id, family, j, CAST(sum(s * s) AS BIGINT) AS e"
        "   FROM sums GROUP BY doc_id, family, j),"
        " best AS (SELECT doc_id, family, j, e FROM en QUALIFY"
        "   row_number() OVER (PARTITION BY doc_id, family"
        "     ORDER BY e DESC, j) = 1)"
        f" SELECT b.doc_id, b.family,"
        f" CAST(b.j * (s.np // {SHIFT_GRID}) AS BIGINT) AS best_shift,"
        " b.e AS energy2"
        " FROM best b JOIN seq s USING (doc_id)"
    )


BEST_SHIFT_FAMILY_SQL = _best_shift_family_sql()


# --------------------------------------------------------------------------
# Haar wavelet denoising (level-1 hard threshold)
# --------------------------------------------------------------------------

DENOISE_TAU = 64      # raw pair-difference threshold (== sqrt(2) * |d1|)
DENOISE_MAX_POS = 512


def q_haar_denoise_l1(sf_dir: str):
    """Classic wavelet denoising, level-1 hard threshold: pairs whose
    detail magnitude falls under the threshold collapse to their mean
    (the smooth reconstruction); pairs above keep their values. Stated in
    raw integer units — |x0 - x1| <= DENOISE_TAU is |d1| <= tau/sqrt(2)
    — and emitted as num2 = 2 * x' so the half-integer means stay exact.
    Row = sequence, no shuffle; leading DENOISE_MAX_POS positions of the
    even-trimmed sequence."""
    from ..functions.listops import list_to_numpy

    P = DENOISE_MAX_POS

    def denoise_batch(t: pa.Table) -> pa.Table:
        # vectorized across the WHOLE batch (the q_haar_l1 ragged-gather
        # idiom): flat position/partner index arrays, no per-doc loop —
        # each element's partner is pos XOR 1 within its own pair, so the
        # smooth/keep decision is one symmetric elementwise expression
        vals, off = list_to_numpy(t["tokens"])
        keep = np.diff(off) >= 2
        if not keep.all():
            t = t.filter(pa.array(keep))
            vals, off = list_to_numpy(t["tokens"])
        m = np.minimum((np.diff(off) // 2) * 2, P)
        doc_of = np.repeat(np.arange(len(m)), m)
        pos = np.arange(int(m.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(m) - m, m
        )
        src = off[:-1][doc_of] + pos
        x = vals[src].astype(np.int64)
        partner = vals[src + 1 - 2 * (pos & 1)].astype(np.int64)
        smooth = np.abs(x - partner) <= DENOISE_TAU
        num2 = np.where(smooth, x + partner, 2 * x)
        doc_col = t["doc_id"]
        if isinstance(doc_col, pa.ChunkedArray):
            doc_col = doc_col.combine_chunks()
        return pa.table(
            {
                "doc_id": doc_col.take(pa.array(doc_of)),
                "pos": pa.array(pos),
                "num2": pa.array(num2),
            }
        )

    return _seq_ds(sf_dir).map_batches(
        denoise_batch, batch_format="pyarrow", batch_size=256
    )


HAAR_DENOISE_SQL = (
    "WITH flat AS (SELECT doc_id,"
    " generate_subscripts(tokens, 1) - 1 AS pos,"
    " CAST(unnest(tokens) AS BIGINT) AS tok,"
    f" least((n_tok // 2) * 2, {DENOISE_MAX_POS}) AS np"
    f" FROM read_parquet('{SYNTH_GLOB_001}') WHERE n_tok >= 2),"
    " f AS (SELECT doc_id, pos, tok FROM flat WHERE pos < np),"
    " pairs AS (SELECT a.doc_id, a.pos AS p0, a.tok AS x0, b.tok AS x1"
    "   FROM f a JOIN f b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1"
    "   WHERE a.pos % 2 = 0)"
    " SELECT doc_id, p0 AS pos,"
    f" CASE WHEN abs(x0 - x1) <= {DENOISE_TAU} THEN x0 + x1"
    "   ELSE 2 * x0 END AS num2 FROM pairs"
    " UNION ALL SELECT doc_id, p0 + 1,"
    f" CASE WHEN abs(x0 - x1) <= {DENOISE_TAU} THEN x0 + x1"
    "   ELSE 2 * x1 END FROM pairs"
)


SAX_MOTIF_TOPK = 10


def q_sax_motifs(sf_dir: str):
    """Motif discovery over the SAX vocabulary: the most common SAX words
    across the corpus (sequences sharing a word are shape-similar at the
    PAA resolution — the classic coarse motif screen). One 4^8-bounded
    word-keyed groupby on top of the shuffle-free symbolization, local
    top-K finish."""
    from ray.data.aggregate import Count

    agg = (
        q_sax_symbols(sf_dir)
        .groupby("sax")
        .aggregate(Count(alias_name="n_docs"))
    )

    def finish(df):
        df = df.copy()
        df["n_docs"] = df["n_docs"].astype(np.int64)
        return df.sort_values(["n_docs", "sax"],
                              ascending=[False, True]).head(SAX_MOTIF_TOPK)

    top = agg.map_batches(finish, batch_format="pandas",
                          batch_size=None).to_pandas()
    return (
        top.sort_values(["n_docs", "sax"], ascending=[False, True])
        .head(SAX_MOTIF_TOPK)
        .reset_index(drop=True)
    )


SAX_MOTIFS_SQL = (
    f"WITH sax AS ({SAX_SQL})"
    " SELECT sax, CAST(count(*) AS BIGINT) AS n_docs FROM sax"
    f" GROUP BY sax ORDER BY n_docs DESC, sax LIMIT {SAX_MOTIF_TOPK}"
)


def q_topk_tokens(sf_dir: str) -> "ray.data.Dataset":
    """Global top-20 token values (K1's sort + order-statistic shape as a
    distributed sort + limit)."""

    def local_top(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        lens = np.diff(off)
        row_of = np.repeat(np.arange(len(lens)), lens)
        pos = np.arange(off[-1], dtype=np.int64) - np.repeat(off[:-1], lens)
        order = np.lexsort((pos, row_of, -vals.astype(np.int64)))[:20]
        return pa.table(
            {
                "doc_id": t["doc_id"].take(pa.array(row_of[order])),
                "pos": pa.array(pos[order]),
                "tok": pa.array(vals[order].astype(np.int64)),
            }
        )

    ds = _seq_ds(sf_dir).map_batches(local_top, batch_format="pyarrow",
                                     batch_size=256)
    return ds.sort(["tok", "doc_id", "pos"],
                   descending=[True, False, False]).limit(20)


TOPK_TOKENS_SQL = (
    f"{_FLAT_CTE} "
    "SELECT doc_id, pos, CAST(tok AS BIGINT) AS tok FROM flat"
    " ORDER BY tok DESC, doc_id, pos LIMIT 20"
)


SATS_EPN = (80.0, 95.0, 99.0, 100.0)


def _epn_rows_from_counts(group: pa.Table, sine: bool = False,
                          load_factor: float = 1.0) -> pa.Table:
    """Finish calc_EPN from a per-source (|tok|, count) histogram, mirroring
    :func:`oracle.epn_stats` (calc_EPN.py:12-42, veclength=n_years=1):
    pmax = q*load_factor; emax = pmax/2 (*2/pi for the sine profile);
    n_cycles = sum(min(v, q))/q with the RAW order statistic q, computed
    EXACTLY in int64 from the counts (so it equals the SQL oracle's
    float-exact integer sums); uf = 100*n/(365*24); serv = emax*n."""
    g = group.to_pandas().sort_values("tok")
    toks = g["tok"].to_numpy()
    c = g["c"].to_numpy()
    cum = c.cumsum()
    vc = (toks * c).cumsum()  # running sum of v*count, int64
    n = int(cum[-1])
    shape_mult = (2.0 / np.pi) if sine else 1.0
    rows = {"source": [], "satisfaction": [], "pmax": [], "emax": [],
            "n_cycles": [], "uf": [], "serv": []}
    for s in SATS_EPN:
        k = max(int(np.ceil(s * n / 100.0)), 1)
        i = int(np.searchsorted(cum, k))
        qi = int(toks[i])
        pmax = float(qi) * load_factor
        emax = pmax / 2.0 * shape_mult
        if qi > 0:
            # sum(min(v, q)) = sum_{v<=q} v*c + q * count(v>q), all integer
            min_sum = int(vc[i]) + qi * (n - int(cum[i]))
            ncyc = float(min_sum) / float(qi)
        else:
            ncyc = 0.0
        rows["source"].append(group["source"][0].as_py())
        rows["satisfaction"].append(int(s))
        rows["pmax"].append(round(pmax, 6))
        rows["emax"].append(round(emax, 6))
        rows["n_cycles"].append(round(ncyc, 6))
        rows["uf"].append(round(100.0 * ncyc / (365.0 * 24.0), 6))
        rows["serv"].append(round(emax * ncyc, 6))
    return pa.table(
        {
            "source": pa.array(rows["source"], type=pa.string()),
            "satisfaction": pa.array(rows["satisfaction"], type=pa.int64()),
            "pmax": pa.array(rows["pmax"], type=pa.float64()),
            "emax": pa.array(rows["emax"], type=pa.float64()),
            "n_cycles": pa.array(rows["n_cycles"], type=pa.float64()),
            "uf": pa.array(rows["uf"], type=pa.float64()),
            "serv": pa.array(rows["serv"], type=pa.float64()),
        }
    )


def q_epn_full(sf_dir: str) -> "ray.data.Dataset":
    """Full calc_EPN statistics per source over |token| magnitudes
    (calc_EPN.py:12-42 with load_factor=veclength=n_years=1, square shape),
    exact, via the distributed value histogram (no whole-source sort)."""
    return _value_counts_by_source(sf_dir, absolute=True).groupby(
        "source"
    ).map_groups(_epn_rows_from_counts, batch_format="pyarrow")


EPN_SINE_LOAD_FACTOR = 0.8


def q_epn_full_sine(sf_dir: str) -> "ray.data.Dataset":
    """The reference's SINE-shape, physical-units EPN variant
    (calc_EPN.py:35-39: the 2/pi energy factor; :35 load_factor) — the
    endpoint round-1 users were missing (VERDICT "What's missing #2")."""

    def finish(group: pa.Table) -> pa.Table:
        return _epn_rows_from_counts(group, sine=True,
                                     load_factor=EPN_SINE_LOAD_FACTOR)

    finish.__name__ = "epn_sine_finish"
    return _value_counts_by_source(sf_dir, absolute=True).groupby(
        "source"
    ).map_groups(finish, batch_format="pyarrow")


def _epn_sine_sql() -> str:
    lf = repr(EPN_SINE_LOAD_FACTOR)
    sm = repr(2.0 / np.pi)  # repr round-trips the exact double
    return (
        f"{_FLAT_CTE}, ranked AS ("
        " SELECT source, CAST(abs(tok) AS DOUBLE) AS v,"
        " row_number() OVER (PARTITION BY source ORDER BY abs(tok)) AS rn,"
        " count(*) OVER (PARTITION BY source) AS n FROM flat),"
        " qs AS (SELECT source, CAST(s.sat AS BIGINT) AS satisfaction, v AS q"
        "   FROM ranked CROSS JOIN (SELECT unnest([80, 95, 99, 100]) AS sat) s"
        "   WHERE rn = greatest(CAST(ceil(s.sat * n / 100.0) AS BIGINT), 1)),"
        " ncy AS (SELECT r.source, q.satisfaction, q.q,"
        "   sum(least(r.v, q.q)) / q.q AS ncyc"
        "   FROM ranked r JOIN qs q ON r.source = q.source"
        "   GROUP BY r.source, q.satisfaction, q.q)"
        f" SELECT source, satisfaction, round(q * {lf}, 6) AS pmax,"
        f" round(q * {lf} / 2 * {sm}, 6) AS emax,"
        " round(ncyc, 6) AS n_cycles,"
        " round(100.0 * ncyc / (365.0 * 24.0), 6) AS uf,"
        f" round(q * {lf} / 2 * {sm} * ncyc, 6) AS serv FROM ncy"
    )


EPN_SINE_SQL = _epn_sine_sql()


EPN_FULL_SQL = (
    f"{_FLAT_CTE}, ranked AS ("
    " SELECT source, CAST(abs(tok) AS DOUBLE) AS v,"
    " row_number() OVER (PARTITION BY source ORDER BY abs(tok)) AS rn,"
    " count(*) OVER (PARTITION BY source) AS n FROM flat),"
    " qs AS (SELECT source, CAST(s.sat AS BIGINT) AS satisfaction, v AS q"
    "   FROM ranked CROSS JOIN (SELECT unnest([80, 95, 99, 100]) AS sat) s"
    "   WHERE rn = greatest(CAST(ceil(s.sat * n / 100.0) AS BIGINT), 1)),"
    " ncy AS (SELECT r.source, q.satisfaction, q.q,"
    "   sum(least(r.v, q.q)) / q.q AS ncyc"
    "   FROM ranked r JOIN qs q ON r.source = q.source"
    "   GROUP BY r.source, q.satisfaction, q.q)"
    " SELECT source, satisfaction, round(q, 6) AS pmax, round(q/2, 6) AS emax,"
    " round(ncyc, 6) AS n_cycles, round(100.0*ncyc/(365.0*24.0), 6) AS uf,"
    " round(q/2*ncyc, 6) AS serv FROM ncy"
)


def q_parseval_ok(sf_dir: str) -> "ray.data.Dataset":
    """Residue invariant (calc_translations.py:21-27 analog): the energy of
    (signal - bandpass reconstruction) equals the energy of the DROPPED
    coefficients (orthonormal transform / Parseval). Emits ok per row; the
    oracle states the invariant (all true)."""
    keep = {5, 6, 7}

    def check(t: pa.Table) -> pa.Table:
        # Parseval holds on the PADDED domain (the transform's domain), so
        # residue and dropped-coefficient energy are both computed there.
        # Vectorized: rows grouped by padded length, whole-group pyramids
        # (the same batching DwtTransform uses) — no per-row transforms.
        from ..functions.listops import next_pow2_arr

        tok_vals, tok_off = list_to_numpy(t["tokens"])
        lens = np.diff(tok_off)
        padded = next_pow2_arr(lens)
        n_rows = len(lens)
        ok = np.empty(n_rows, dtype=bool)
        for p in np.unique(padded):
            rows = np.nonzero(padded == p)[0]
            x = np.zeros((len(rows), int(p)), dtype=np.float64)
            for j, r in enumerate(rows):
                n = lens[r]
                x[j, :n] = tok_vals[tok_off[r] : tok_off[r] + n]
            levels = oc.dwt_pyramid(x, "haar")
            n_detail = len(levels) - 1
            dropped = np.zeros(len(rows), dtype=np.float64)
            masked = []
            for i, lvl in enumerate(levels):
                if i == n_detail or i in keep:
                    masked.append(lvl)
                else:
                    masked.append(np.zeros_like(lvl))
                    dropped += (lvl * lvl).sum(axis=1)
            rec = oc.idwt_pyramid(masked, "haar")
            resid = ((x - rec) ** 2).sum(axis=1)
            ok[rows] = np.abs(resid - dropped) <= 1e-6 * np.maximum(dropped, 1.0)
        return pa.table({"doc_id": t["doc_id"], "ok": pa.array(ok)})

    return _seq_ds(sf_dir).map_batches(check, batch_format="pyarrow",
                                       batch_size=256)


PARSEVAL_SQL = (
    f"SELECT doc_id, CAST(TRUE AS BOOLEAN) AS ok FROM read_parquet('{SYNTH_GLOB_001}')"
)


def q_scale_energy(sf_dir: str) -> "ray.data.Dataset":
    """Per-(doc, level) Haar coefficient energy — the scale-x-time heatmap
    input (plots.py:17-71 / preplotprocessing, T8).

    Energies are computed EXACTLY via the integer identity: the level-l
    detail coefficient is (S_{l-1}[2k] - S_{l-1}[2k+1]) / 2^{l/2} with S
    the integer dyadic window sums of the zero-padded signal, so
    energy_l = sum((signed window sum)^2) / 2^l — an int64 reduceat plus an
    exact power-of-two division. This makes the value SQL-expressible (the
    float filter cascade differs from the closed form only by summation
    rounding; the integer identity removes that) and is also faster than
    running the cascade. Overflow-guarded (tokens x padded length bound)."""

    def energy(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        lens = np.diff(off)
        from ..functions.listops import next_pow2_arr

        padded = next_pow2_arr(lens)
        docs, levels, energies = [], [], []
        for p in np.unique(padded):
            rows = np.nonzero(padded == p)[0]
            x = np.zeros((len(rows), int(p)), dtype=np.int64)
            for j, r in enumerate(rows):
                n = lens[r]
                x[j, :n] = v[off[r] : off[r] + n]
            # worst-case |signed window sum| <= max|tok| * p; the level sum
            # of squares is bounded by (max|tok| * p)^2 / 4
            bound = float(np.abs(x).max(initial=0)) * float(p)
            assert bound * bound / 4 < 2**62, "scale_energy int64 overflow"
            s = x
            n_level = int(p).bit_length() - 1  # log2(p)
            for l in range(1, n_level + 1):
                d = s[:, 0::2] - s[:, 1::2]
                s = s[:, 0::2] + s[:, 1::2]
                e = (d * d).sum(axis=1, dtype=np.int64).astype(np.float64) / float(
                    2**l
                )
                docs.append(rows)
                levels.append(np.full(len(rows), l - 1, dtype=np.int8))
                energies.append(e)
            # approx level: index n_level, energy S_J^2 / 2^J
            docs.append(rows)
            levels.append(np.full(len(rows), n_level, dtype=np.int8))
            energies.append(
                (s[:, 0] * s[:, 0]).astype(np.float64) / float(2**n_level)
            )
        idx = np.concatenate(docs)
        return pa.table(
            {
                "doc_id": t["doc_id"].take(pa.array(idx)),
                "level": pa.array(np.concatenate(levels)),
                "energy": pa.array(np.concatenate(energies)),
            }
        )

    return _seq_ds(sf_dir).map_batches(energy, batch_format="pyarrow",
                                       batch_size=256)


SCALE_ENERGY_SQL = (
    f"{_FLAT_CTE},"
    " n AS (SELECT doc_id, count(*) AS L FROM flat GROUP BY doc_id),"
    " jj AS (SELECT doc_id, CASE WHEN L = 1 THEN 0"
    "   ELSE CAST(ceil(log2(CAST(L AS DOUBLE))) AS INTEGER) END AS J FROM n),"
    " lv AS (SELECT doc_id, CAST(unnest(range(1, J + 1)) AS INTEGER) AS l FROM jj),"
    " d AS (SELECT f.doc_id, lv.l, f.pos // (1 << lv.l) AS w,"
    "   CAST(sum(CASE WHEN (f.pos // (1 << (lv.l - 1))) % 2 = 0"
    "     THEN f.tok ELSE -f.tok END) AS HUGEINT) AS dd"
    "   FROM flat f JOIN lv ON lv.doc_id = f.doc_id GROUP BY 1, 2, 3),"
    " det AS (SELECT doc_id, CAST(l - 1 AS TINYINT) AS level,"
    "   CAST(sum(dd * dd) AS DOUBLE) / CAST((CAST(1 AS BIGINT) << l) AS DOUBLE)"
    "     AS energy FROM d GROUP BY doc_id, l),"
    " ap AS (SELECT f.doc_id, CAST(jj.J AS TINYINT) AS level,"
    "   CAST(CAST(sum(f.tok) AS HUGEINT) * CAST(sum(f.tok) AS HUGEINT) AS DOUBLE)"
    "     / CAST((CAST(1 AS BIGINT) << jj.J) AS DOUBLE) AS energy"
    "   FROM flat f JOIN jj ON jj.doc_id = f.doc_id GROUP BY f.doc_id, jj.J)"
    " SELECT * FROM det UNION ALL SELECT * FROM ap"
)


def q_fft_magnitude(sf_dir: str) -> "ray.data.Dataset":
    """FFT magnitude spectrum per row (plots.py:73-119, the reference's
    spectral cross-check of the wavelet view), over the 64-point resampled
    curve — the same normalized grid the reference plots. All 33 rfft bins,
    batched as ONE (rows, 64) rfft per batch (no per-row Python loop); the
    oracle is the naive DFT over the identically-resampled signal in SQL
    (round(4) absorbs FFT-vs-DFT summation rounding)."""
    ds = _seq_ds(sf_dir).map_batches(
        make_resample_batch(64), batch_format="pyarrow", batch_size=256
    )

    def fft_all(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["resampled"])
        n_rows = len(off) - 1
        x = vals.reshape(n_rows, 64)
        x = x - x.mean(axis=1, keepdims=True)
        mag = np.abs(np.fft.rfft(x, axis=1))  # (rows, 33)
        row_of = np.repeat(np.arange(n_rows), 33)
        bins = np.tile(np.arange(33, dtype=np.int64), n_rows)
        return pa.table(
            {
                "doc_id": t["doc_id"].take(pa.array(row_of)),
                "bin": pa.array(bins),
                "magnitude": pa.array(np.round(mag.ravel(), 4), type=pa.float64()),
            }
        )

    return ds.map_batches(fft_all, batch_format="pyarrow")


FFT64_SQL = (
    # same resample as RESAMPLE64_SQL, then the naive DFT of the
    # mean-removed 64-point signal
    RESAMPLE64_SQL.replace(
        " SELECT doc_id, j AS pos,",
        ", r AS (SELECT doc_id, j AS pos,",
    )
    + "), m AS (SELECT doc_id, pos, val - avg(val) OVER (PARTITION BY doc_id) AS y FROM r),"
    " dft AS (SELECT m.doc_id, CAST(b.k AS BIGINT) AS bin,"
    "   sum(m.y * cos(-2 * pi() * b.k * (m.pos - 1) / 64.0)) AS re,"
    "   sum(m.y * sin(-2 * pi() * b.k * (m.pos - 1) / 64.0)) AS im"
    "   FROM m CROSS JOIN (SELECT unnest(range(0, 33)) AS k) b"
    "   GROUP BY m.doc_id, b.k)"
    " SELECT doc_id, bin, round(sqrt(re * re + im * im), 4) AS magnitude FROM dft"
)


# --------------------------------------------------------------------------
# Sliding windows, as-of join, salted skew-aware aggregate
# --------------------------------------------------------------------------

def q_sliding_w8(sf_dir: str) -> "ray.data.Dataset":
    """Sliding-window (stride-1) min/max/sum of width 8 per row — the
    windowed-aggregate custom operator (Ray Data has no window op; this is
    a vectorized sliding_window_view inside map_batches). Tumbling windows
    remain the retention-tier primitive; sliding is the query-time analog."""
    W = 8

    def slide(t: pa.Table) -> pa.Table:
        # ONE sliding_window_view over the batch's concatenated tokens;
        # windows that straddle a doc boundary are masked out (valid iff
        # first and last element share a doc) — no per-row Python
        # (VERDICT r2 "What's wrong #3")
        vals, off = list_to_numpy(t["tokens"])
        v64 = vals.astype(np.int64)
        n = len(v64)
        empty = pa.table({"doc_id": pa.array([], type=pa.string()),
                          "pos": pa.array([], type=pa.int64()),
                          "smin": pa.array([], type=pa.int64()),
                          "smax": pa.array([], type=pa.int64()),
                          "ssum": pa.array([], type=pa.int64())})
        if n < W:
            return empty
        lens = np.diff(off)
        doc_of = np.repeat(np.arange(len(lens)), lens)
        idx = np.nonzero(doc_of[: n - W + 1] == doc_of[W - 1 :])[0]
        if len(idx) == 0:
            return empty
        win = np.lib.stride_tricks.sliding_window_view(v64, W)[idx]
        d = doc_of[idx]
        return pa.table(
            {
                "doc_id": t["doc_id"].take(pa.array(d)),
                "pos": pa.array(idx - off[d] + W - 1),
                "smin": pa.array(win.min(axis=1)),
                "smax": pa.array(win.max(axis=1)),
                "ssum": pa.array(win.sum(axis=1)),
            }
        )

    return _seq_ds(sf_dir).map_batches(slide, batch_format="pyarrow",
                                       batch_size=256)


SLIDING_SQL = (
    f"{_FLAT_CTE} "
    "SELECT doc_id, pos,"
    " CAST(min(tok) OVER w AS BIGINT) AS smin, CAST(max(tok) OVER w AS BIGINT) AS smax,"
    " CAST(sum(tok) OVER w AS BIGINT) AS ssum"
    " FROM flat"
    " WINDOW w AS (PARTITION BY doc_id ORDER BY pos"
    "   ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)"
    " QUALIFY pos >= 7"
)


def q_events_asof(sf_dir: str) -> "ray.data.Dataset":
    """As-of join: each event matched to the latest calendar day (from
    lineitem's shipdate rollup) at or before its timestamp. The small side
    (daily table) is broadcast; the probe is a vectorized searchsorted per
    batch — the no-shuffle as-of pattern (ray_guide 'Joins and lookups')."""
    # small side computed IN RAY (partial+final over lineitem, same shape as
    # daily_rollup), then only the tiny per-day aggregate is collected and
    # broadcast — the raw lineitem table never touches the driver
    from ray.data.aggregate import Sum

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_shipdate", "l_quantity"]
    )

    def day_partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        day = t["l_shipdate"].to_pandas().dt.strftime("%Y-%m-%d")
        qty = t["l_quantity"].to_numpy().astype(np.int64)
        g = (
            pd.DataFrame({"day": day, "qty": qty})
            .groupby("day", as_index=False)["qty"]
            .sum()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    daily = (
        li.map_batches(day_partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("qty", alias_name="qty"))
        .to_pandas()  # tiny: one row per calendar day
        .sort_values("day")
    )
    day_ns = (
        daily["day"].astype("datetime64[ns]").to_numpy().astype(np.int64)
    )
    day_str = daily["day"].to_numpy()
    qty = daily["qty"].to_numpy().astype(np.int64)
    side = ray.put((day_ns, day_str, qty))

    def probe(t: pa.Table) -> pa.Table:
        days, dstr, q = ray.get(side)
        ts = t["ts"].to_pandas().to_numpy().astype("datetime64[ns]").astype(np.int64)
        idx = np.searchsorted(days, ts, side="right") - 1
        ok = idx >= 0
        idx = np.clip(idx, 0, len(days) - 1)
        return pa.table(
            {
                "event_id": t["event_id"],
                "asof_day": pa.array(
                    np.where(ok, dstr[idx], None).tolist(), type=pa.string()
                ),
                "day_qty": pa.array(np.where(ok, q[idx], None).tolist(),
                                    type=pa.int64()),
            }
        )

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "ts"])
    return ev.map_batches(probe, batch_format="pyarrow", batch_size=2048)


EVENTS_ASOF_SQL = (
    "WITH daily AS (SELECT CAST(l_shipdate AS DATE) AS day,"
    " CAST(sum(l_quantity) AS BIGINT) AS day_qty FROM lineitem GROUP BY day)"
    " SELECT e.event_id, strftime(d.day, '%Y-%m-%d') AS asof_day, d.day_qty"
    " FROM events e ASOF LEFT JOIN daily d ON e.ts >= CAST(d.day AS TIMESTAMP)"
)


def q_source_stats_salted(sf_dir: str) -> "ray.data.Dataset":
    """source_stats with EXPLICIT key salting: partials are keyed
    (source, salt = crc32(doc_id) % 8) so one hot source (src-0 holds ~40%
    of rows — the Zipf skew in the synth) spreads across 8 sub-keys in the
    shuffle, then a second tiny groupby folds the salt away. Result is
    identical to source_stats (same SQL oracle)."""
    import zlib

    from ray.data.aggregate import Max, Min, Sum

    from ..stages.rollup import source_partials_batch

    rolled = rp.rollup_dataset(_seq_ds(sf_dir), bank="haar", n_tiers=10,
                               verify=False, batch_size=256)

    def salted_partials(t: pa.Table) -> pa.Table:
        part = source_partials_batch(t)
        # salt must vary WITHIN a key: derive it from the batch's first
        # doc_id so a hot source's partials land on 8 different sub-keys
        # across batches (deterministic, no wall-clock)
        salt_val = zlib.crc32(t["doc_id"][0].as_py().encode()) % 8
        salt = np.full(part.num_rows, salt_val, dtype=np.int32)
        return part.append_column("salt", pa.array(salt))

    partials = rolled.map_batches(salted_partials, batch_format="pyarrow")
    salted = partials.groupby(["source", "tier", "salt"]).aggregate(
        Min("pmin", alias_name="pmin"),
        Max("pmax", alias_name="pmax"),
        Sum("psum", alias_name="psum"),
        Sum("pcount", alias_name="pcount"),
        Sum("pwindows", alias_name="pwindows"),
    )
    final = salted.groupby(["source", "tier"]).aggregate(
        Min("pmin", alias_name="min_val"),
        Max("pmax", alias_name="max_val"),
        Sum("psum", alias_name="total_sum"),
        Sum("pcount", alias_name="n_points"),
        Sum("pwindows", alias_name="n_windows"),
    )
    return final.map_batches(
        lambda t: t.set_column(
            t.column_names.index("tier"), "tier", pc.cast(t["tier"], pa.int8())
        ),
        batch_format="pyarrow",
    )


def _ensure_store(sf_dir: str) -> str:
    """Idempotently build (or reuse) the retention store for ``sf_dir``
    with a lineage freshness guard; returns the store directory."""
    import os

    seq = synth.ensure_sequences(sf_dir)
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    out = f"/tmp/graft_store/{sf_name}"
    # freshness guard: a cached store built from different input bytes would
    # silently answer wrong — compare the run lineage against the input
    lin_path = os.path.join(out, "lineage.json")
    if os.path.isfile(lin_path):
        import json

        try:
            lin = json.load(open(lin_path))
            cur = {
                f: (os.path.getsize(os.path.join(seq, f)),
                    int(os.path.getmtime(os.path.join(seq, f))))
                for f in sorted(os.listdir(seq))
            }
            rec = {r["file"]: (r["bytes"], r["mtime"]) for r in lin["input_files"]}
            if rec != cur:
                import shutil

                shutil.rmtree(out, ignore_errors=True)
        except (ValueError, KeyError, OSError):
            import shutil

            shutil.rmtree(out, ignore_errors=True)
    rp.run_rollup_job(seq, out, bank="haar", n_tiers=10, n_buckets=16,
                      resume=True, verify=False, batch_size=256,
                      encoder_concurrency=(1, 8))
    return out


def q_store_stats(sf_dir: str) -> "ray.data.Dataset":
    """Per-(source, tier) stats answered FROM THE RETENTION STORE: run the
    flagship job (idempotent — resume skips completed buckets), read the
    encoded per-bucket parquet back, decode the Gorilla/DoD blocks, and
    aggregate. Must equal the same SQL oracle as ``source_stats`` computed
    from raw tokens — the full write->read->query lifecycle of the store
    (reference entry point 3, SURVEY.md §3.3)."""
    from ..sources.store import read_store

    out = _ensure_store(sf_dir)
    agg = rp.source_tier_aggregate(read_store(out))
    return agg.map_batches(
        lambda t: t.set_column(
            t.column_names.index("tier"), "tier", pc.cast(t["tier"], pa.int8())
        ),
        batch_format="pyarrow",
    )


STORE_TIER = 3


def q_store_tier(sf_dir: str) -> "ray.data.Dataset":
    """Tier-scoped store read — the retention store's core access pattern:
    answer a single-tier question by PUSHING the tier predicate into the
    parquet read (only matching row groups leave storage) and decoding only
    those rows' blobs; everything else is identical to ``store_stats``.
    Oracle = the raw-token aggregate restricted to the same tier."""
    from ..sources.store import read_store

    out = _ensure_store(sf_dir)
    agg = rp.source_tier_aggregate(read_store(out, tiers=[STORE_TIER]))
    return agg.map_batches(
        lambda t: t.set_column(
            t.column_names.index("tier"), "tier", pc.cast(t["tier"], pa.int8())
        ),
        batch_format="pyarrow",
    )


STORE_TIER_SQL = (
    f"SELECT * FROM ({SOURCE_STATS_SQL}) WHERE tier = {STORE_TIER}"
)


# --------------------------------------------------------------------------
# Trailing-window anomaly detection over the event stream
# --------------------------------------------------------------------------

W_ZSCORE = 16  # trailing window: the last min(pos+1, 16) events of the user


def q_events_zscore16(sf_dir: str) -> "ray.data.Dataset":
    """Per-event trailing-window z-score anomaly flag: over each user's last
    ``min(pos+1, 16)`` events (inclusive), flag when |x - mean| > 3*sigma
    (population).  Kept integer-exact by clearing denominators:

        (n*x - S)^2 > 9 * (n*Q - S^2)      with S = window sum, Q = window
                                           sum of squares, n = window count

    so the driver hash compares BIGINTs, never a float sqrt.  Same coarse
    per-user-partition fold as :func:`q_sessionize`; the window sums are two
    cumsum differences against a per-row window-start index — no per-row
    window materialization, no per-user loop."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    )

    def fold(df):
        import pandas as pd

        uid, ts_us, tok, user_start = _user_sorted(df)
        eid = (
            df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")[
                "event_id"
            ].to_numpy().astype(np.int64)
        )
        n = len(uid)
        if n == 0:
            return pd.DataFrame(
                {c: np.array([], dtype=np.int64)
                 for c in ("user_id", "event_id", "win_n", "win_sum",
                           "win_sumsq")}
            ).assign(is_anomaly=np.array([], dtype=np.int32))
        idx = np.arange(n, dtype=np.int64)
        run_start = np.maximum.accumulate(np.where(user_start, idx, 0))
        lo = np.maximum(idx - (W_ZSCORE - 1), run_start)
        cs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(tok, out=cs[1:])
        cq = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(tok * tok, out=cq[1:])
        S = cs[idx + 1] - cs[lo]
        Q = cq[idx + 1] - cq[lo]
        nw = idx + 1 - lo
        dev = nw * tok - S
        flag = dev * dev > 9 * (nw * Q - S * S)
        return pd.DataFrame(
            {"user_id": uid, "event_id": eid, "win_n": nw, "win_sum": S,
             "win_sumsq": Q, "is_anomaly": flag.astype(np.int32)}
        )

    return (
        ds.map_batches(_add_user_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(fold, batch_format="pandas")
    )


EVENTS_ZSCORE_SQL = (
    "WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,"
    " CAST(round(value * 100) AS BIGINT) AS tok FROM events),"
    " w AS (SELECT user_id, event_id, tok,"
    "  CAST(count(*) OVER win AS BIGINT) AS win_n,"
    "  CAST(sum(tok) OVER win AS BIGINT) AS win_sum,"
    "  CAST(sum(tok * tok) OVER win AS BIGINT) AS win_sumsq"
    "  FROM e WINDOW win AS (PARTITION BY user_id ORDER BY ts_us, event_id"
    f"   ROWS BETWEEN {W_ZSCORE - 1} PRECEDING AND CURRENT ROW))"
    " SELECT user_id, event_id, win_n, win_sum, win_sumsq,"
    " CAST((win_n * tok - win_sum) * (win_n * tok - win_sum) >"
    "      9 * (win_n * win_sumsq - win_sum * win_sum) AS INTEGER)"
    "  AS is_anomaly"
    " FROM w"
)


# --------------------------------------------------------------------------
# Seasonal hour-of-day profile (partial+final aggregate)
# --------------------------------------------------------------------------

def q_hourly_profile(sf_dir: str) -> "ray.data.Dataset":
    """Per-(event_type, hour-of-day) event count, token sum and mean — the
    seasonal-profile aggregate (24 x types output).  Pre-aggregated inside
    ``map_batches`` (one row per key per batch) so the global groupby
    shuffles a few hundred partial rows, not the event stream; the mean is
    the identical IEEE double division on both sides."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )

    def partial(df):
        import pandas as pd

        ts_us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        g = pd.DataFrame(
            {
                "event_type": df["event_type"].to_numpy(),
                "hod": (ts_us // HOUR_US) % 24,
                "tok": np.rint(df["value"].to_numpy() * 100).astype(np.int64),
            }
        ).groupby(["event_type", "hod"], as_index=False).agg(
            pn=("tok", "size"), psum=("tok", "sum")
        )
        g["pn"] = g["pn"].astype(np.int64)
        return g

    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["event_type", "hod"])
        .aggregate(
            Sum("pn", alias_name="n_events"), Sum("psum", alias_name="tok_sum")
        )
    )

    def finish(df):
        df["avg_tok"] = df["tok_sum"].to_numpy().astype(np.float64) / df[
            "n_events"
        ].to_numpy()
        return df

    return agg.map_batches(finish, batch_format="pandas")


HOURLY_PROFILE_SQL = (
    "WITH e AS (SELECT event_type,"
    f" (epoch_us(ts) // {HOUR_US}) % 24 AS hod,"
    " CAST(round(value * 100) AS BIGINT) AS tok FROM events)"
    " SELECT event_type, hod, CAST(count(*) AS BIGINT) AS n_events,"
    " CAST(sum(tok) AS BIGINT) AS tok_sum,"
    " CAST(sum(tok) AS DOUBLE) / count(*) AS avg_tok"
    " FROM e GROUP BY event_type, hod"
)


# --------------------------------------------------------------------------
# Daily distinct-user counts (distributed COUNT DISTINCT)
# --------------------------------------------------------------------------

_DAY_US = 86_400_000_000
_DAY_BITS = 20  # day index < 2^20 until year ~4840


def q_distinct_users_daily(sf_dir: str) -> "ray.data.Dataset":
    """Per-day distinct active users — the distributed COUNT DISTINCT
    pattern.  Three-level: (1) per-batch dedup of packed (user, day) keys
    shrinks the exchange to unique pairs, (2) a hash partition on user_id
    makes partition-local dedup globally exact (each user lives in exactly
    one partition), (3) per-day partial counts sum in a tiny final groupby.
    No global distinct shuffle of raw events."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    )

    def pairs(t: pa.Table) -> pa.Table:
        u = t["ts"].to_numpy(zero_copy_only=False)
        ts_us = u.astype("datetime64[us]").astype(np.int64)
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        day = ts_us // _DAY_US
        if len(uid):
            assert uid.min() >= 0 and uid.max() < (1 << (62 - _DAY_BITS)) and (
                day.min() >= 0 and day.max() < (1 << _DAY_BITS)
            ), "distinct_users_daily key packing out of range"
        key = np.unique(uid * (1 << _DAY_BITS) + day)
        return pa.table(
            {
                "key": key,
                "part": ((key >> _DAY_BITS) % N_EVENT_PARTS).astype(np.int32),
            }
        )

    def fold(df):
        import pandas as pd

        key = np.unique(df["key"].to_numpy())
        day, cnt = np.unique(key & ((1 << _DAY_BITS) - 1), return_counts=True)
        return pd.DataFrame({"day": day, "pn": cnt.astype(np.int64)})

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("part")
        .map_groups(fold, batch_format="pandas")
        .groupby("day")
        .aggregate(Sum("pn", alias_name="n_users"))
    )


DISTINCT_USERS_SQL = (
    f"SELECT epoch_us(ts) // {_DAY_US} AS day,"
    " CAST(count(DISTINCT user_id) AS BIGINT) AS n_users"
    " FROM events GROUP BY day"
)


MAD_K = 2  # flag |x - med| > MAD_K * MAD (2 MAD; the synth counts are
# well-behaved — production corpora typically use 3 — and the predicate
# stays integer-exact for any K)


def q_anomaly_mad(sf_dir: str) -> "object":
    """Robust per-type daily anomaly flags: days whose count deviates from
    the type's MEDIAN by more than MAD_K x the MAD (the outlier rule that, unlike
    z-scores, is not poisoned by the outliers themselves). Distributed
    piece: the per-(type, day) count aggregate (per-batch partials + one
    keyed sum); the median/MAD fold runs on the driver over the tiny
    #types x #days table in DOUBLED-integer arithmetic (med2 = v_lo+v_hi;
    mad4 = dev_lo+dev_hi = 4*MAD), so the flag predicate
    2*|2n - med2| > MAD_K*mad4  <=>  |n - med| > MAD_K*MAD
    is integer-exact against the SQL twin's median()/2*median() chain."""
    import pandas as pd

    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    )

    def partial(t: pa.Table) -> pa.Table:
        ts_us = t["ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        day = ts_us // _DAY_US
        df = pd.DataFrame(
            {"event_type": t["event_type"].to_pandas(), "day": day}
        ).groupby(["event_type", "day"], as_index=False).size()
        # explicit schema: an EMPTY batch would otherwise infer a
        # null-typed event_type column that conflicts in the groupby
        return pa.table(
            {
                "event_type": pa.array(df["event_type"], type=pa.string()),
                "day": pa.array(df["day"].to_numpy(), type=pa.int64()),
                "pn": pa.array(df["size"].to_numpy(), type=pa.int64()),
            }
        )

    daily = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .aggregate(Sum("pn", alias_name="n"))
        .to_pandas()  # tiny: #types x #days
    )

    def med2_of(v: np.ndarray) -> int:
        v = np.sort(v)
        n = len(v)
        return int(v[(n - 1) // 2] + v[n // 2])

    rows = []
    for etype, grp in daily.groupby("event_type"):
        n = grp["n"].to_numpy().astype(np.int64)
        med2 = med2_of(n)
        dev = np.abs(2 * n - med2)
        mad4 = med2_of(dev)
        flag = 2 * dev > MAD_K * mad4
        for d, cnt in zip(grp["day"].to_numpy()[flag], n[flag]):
            rows.append((etype, int(d), int(cnt)))
    out = pd.DataFrame(rows, columns=["event_type", "day", "n"])
    # explicit dtypes: an empty frame would otherwise carry object columns
    out["day"] = out["day"].astype(np.int64)
    out["n"] = out["n"].astype(np.int64)
    return out


ANOMALY_MAD_SQL = (
    "WITH d AS (SELECT event_type,"
    f" CAST(epoch_us(ts) // {86_400_000_000} AS BIGINT) AS day,"
    " CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),"
    " med AS (SELECT event_type, CAST(2 * median(n) AS BIGINT) AS med2"
    "   FROM d GROUP BY 1),"
    " dev AS (SELECT d.event_type, d.day, d.n,"
    "   abs(2 * d.n - m.med2) AS dv FROM d JOIN med m USING (event_type)),"
    " mad AS (SELECT event_type, CAST(2 * median(dv) AS BIGINT) AS mad4"
    "   FROM dev GROUP BY 1)"
    " SELECT e.event_type, e.day, e.n FROM dev e JOIN mad USING (event_type)"
    f" WHERE 2 * e.dv > {MAD_K} * mad.mad4"
)


SEASONAL_LAG_DAYS = 7


def q_seasonal_naive_error(sf_dir: str) -> "object":
    """Forecastability audit: the seasonal-naive baseline's total absolute
    error per event type — sum over days of |count(d) - count(d - 7)|
    (every forecasting effort is judged against this baseline first).
    Distributed piece: the per-(type, day) count aggregate; the lag join
    is a driver-side shift over the tiny types x days table. Integer-
    exact: counts are ints, so the error sum is a BIGINT."""
    import pandas as pd

    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    )

    def partial(t: pa.Table) -> pa.Table:
        ts_us = t["ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        day = ts_us // _DAY_US
        df = pd.DataFrame(
            {"event_type": t["event_type"].to_pandas(), "day": day}
        ).groupby(["event_type", "day"], as_index=False).size()
        return pa.table(
            {
                "event_type": pa.array(df["event_type"], type=pa.string()),
                "day": pa.array(df["day"].to_numpy(), type=pa.int64()),
                "pn": pa.array(df["size"].to_numpy(), type=pa.int64()),
            }
        )

    daily = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .aggregate(Sum("pn", alias_name="n"))
        .to_pandas()  # tiny: #types x #days
    )
    rows = []
    for etype, grp in daily.groupby("event_type"):
        g = grp.set_index("day")["n"]
        lagged = g.reindex(g.index - SEASONAL_LAG_DAYS)
        # only days whose lag-7 day has any events contribute (both sides
        # present) — the INNER-join convention the SQL twin states
        mask = lagged.notna().to_numpy()
        err = np.abs(
            g.to_numpy()[mask] - lagged.to_numpy()[mask].astype(np.int64)
        )
        rows.append((etype, int(err.sum()), int(mask.sum())))
    out = pd.DataFrame(rows, columns=["event_type", "abs_err", "n_days"])
    out["abs_err"] = out["abs_err"].astype(np.int64)
    out["n_days"] = out["n_days"].astype(np.int64)
    return out


SEASONAL_NAIVE_SQL = (
    "WITH d AS (SELECT event_type,"
    f" CAST(epoch_us(ts) // {86_400_000_000} AS BIGINT) AS day,"
    " CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2)"
    " SELECT a.event_type, CAST(sum(abs(a.n - b.n)) AS BIGINT) AS abs_err,"
    " CAST(count(*) AS BIGINT) AS n_days"
    " FROM d a JOIN d b ON b.event_type = a.event_type"
    f" AND b.day = a.day - {SEASONAL_LAG_DAYS}"
    " GROUP BY a.event_type"
)


CORR_X, CORR_Y = "view", "purchase"


def q_type_corr(sf_dir: str):
    """Cross-series correlation (do purchases track views?): the exact
    integer Pearson moments between the two types' day-aligned daily
    counts — every day with any event contributes, missing types count 0.
    The distributed work is the daily count aggregate (per-batch partials,
    one day-keyed sum); the moment fold runs on the driver over the
    <= #days rows, and the float r is one division away
    (``pearson_from_moments``) — never part of the compared result."""
    import pandas as pd

    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    )

    def partial(t: pa.Table) -> pa.Table:
        ts_us = (
            t["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        et = t["event_type"].to_numpy(zero_copy_only=False)
        day = ts_us // _DAY_US
        g = pd.DataFrame(
            {"day": day,
             "x": (et == CORR_X).astype(np.int64),
             "y": (et == CORR_Y).astype(np.int64)}
        ).groupby("day", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    daily = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("x", alias_name="x"), Sum("y", alias_name="y"))
        .to_pandas()
    )
    x = daily["x"].to_numpy().astype(object)  # python ints: no overflow
    y = daily["y"].to_numpy().astype(object)
    return pd.DataFrame(
        {
            "n": [np.int64(len(daily))],
            "sx": [np.int64(sum(x))], "sy": [np.int64(sum(y))],
            "sxy": [np.int64(sum(a * b for a, b in zip(x, y)))],
            "sx2": [np.int64(sum(a * a for a in x))],
            "sy2": [np.int64(sum(b * b for b in y))],
        }
    )


def pearson_from_moments(row) -> float:
    """r from the exact integer moments (python-int arithmetic)."""
    import math

    n, sx, sy = int(row["n"]), int(row["sx"]), int(row["sy"])
    sxy, sx2, sy2 = int(row["sxy"]), int(row["sx2"]), int(row["sy2"])
    num = n * sxy - sx * sy
    den2 = (n * sx2 - sx * sx) * (n * sy2 - sy * sy)
    return num / math.sqrt(den2) if den2 > 0 else float("nan")


TYPE_CORR_SQL = (
    f"WITH d AS (SELECT epoch_us(ts) // {_DAY_US} AS day,"
    f" CAST(sum(CASE WHEN event_type = '{CORR_X}' THEN 1 ELSE 0 END)"
    "  AS BIGINT) AS x,"
    f" CAST(sum(CASE WHEN event_type = '{CORR_Y}' THEN 1 ELSE 0 END)"
    "  AS BIGINT) AS y FROM events GROUP BY day)"
    " SELECT CAST(count(*) AS BIGINT) AS n,"
    " CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,"
    " CAST(sum(x * y) AS BIGINT) AS sxy,"
    " CAST(sum(x * x) AS BIGINT) AS sx2,"
    " CAST(sum(y * y) AS BIGINT) AS sy2 FROM d"
)


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_events_pivot(sf_dir: str) -> "ray.data.Dataset":
    """PIVOT/reshape surface: the per-day event-type count matrix (one
    column per type) — long-to-wide with a FIXED, declared column set, the
    only shape that scales (a data-dependent pivot would need a schema
    negotiation pass).  Per batch: one pandas crosstab partial reindexed
    to the declared columns; a day-keyed sum merges partials."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    )

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        ts_us = (
            t["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        ct = pd.crosstab(
            pd.Series(ts_us // _DAY_US, name="day"),
            pd.Series(t["event_type"].to_pandas(), name="et"),
        ).reindex(columns=list(EVENT_TYPES), fill_value=0)
        ct.columns = [f"n_{c}" for c in ct.columns]
        return pa.Table.from_pandas(
            ct.astype(np.int64).reset_index(), preserve_index=False
        )

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(
            *[Sum(f"n_{c}", alias_name=f"n_{c}") for c in EVENT_TYPES]
        )
    )


EVENTS_PIVOT_SQL = (
    f"SELECT epoch_us(ts) // {86_400_000_000} AS day,"
    + ",".join(
        f" CAST(sum(CASE WHEN event_type = '{c}' THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS n_{c}"
        for c in EVENT_TYPES
    )
    + " FROM events GROUP BY day"
)


def q_missing_hours(sf_dir: str) -> "ray.data.Dataset":
    """Data-gap detection: per calendar day, how many of the 24 hours saw
    ZERO events, plus the hour-presence bitmask — the completeness audit a
    time-series ingest runs before trusting a day's rollups.  Per-batch
    distinct packed (day, hour) keys collapse the stream to a <= days x 24
    domain before the only exchange; the bitmask is a sum of distinct
    powers of two (== OR), integer-exact on both sides."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def pairs(t: pa.Table) -> pa.Table:
        ts_us = (
            t["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        day = ts_us // _DAY_US
        hour = (ts_us // 3_600_000_000) % 24
        key = np.unique(day * 32 + hour)
        return pa.table({"key": key, "one": np.ones(len(key), np.int64)})

    from ray.data.aggregate import Max

    distinct = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Max("one", alias_name="one"))
    )

    # the distinct table is <= days x 24 rows — finish on the driver (a
    # per-block finish could split one day's hours across block borders)
    import pandas as pd

    df = distinct.to_pandas()
    day = df["key"].to_numpy() // 32
    hour = df["key"].to_numpy() % 32
    g = pd.DataFrame({"day": day, "bit": np.int64(1) << hour}).groupby(
        "day", as_index=False
    ).agg(n_hours=("bit", "size"), hour_mask=("bit", "sum"))
    g["n_missing"] = (24 - g["n_hours"]).astype(np.int64)
    g["hour_mask"] = g["hour_mask"].astype(np.int64)
    return g[["day", "n_missing", "hour_mask"]]


MISSING_HOURS_SQL = (
    f"WITH h AS (SELECT DISTINCT epoch_us(ts) // {_DAY_US} AS day,"
    " CAST(date_part('hour', ts) AS BIGINT) AS hr FROM events)"
    " SELECT day, CAST(24 - count(*) AS BIGINT) AS n_missing,"
    " CAST(sum(1 << hr) AS BIGINT) AS hour_mask FROM h GROUP BY day"
)


def q_last_event_per_user(sf_dir: str) -> "ray.data.Dataset":
    """Latest-event snapshot per user (the argmax-by-time aggregate Ray
    Data has no primitive for): per user, the value and type of their
    most recent event, tie-broken by event_id.  Per-batch pre-reduction
    keeps one candidate row per (user, batch) — the exchange is
    user-cardinality-sized — and the user-hash partition fold picks the
    global winner exactly because each user lives in one partition."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )

    def local_last(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.to_pandas()
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        return pa.Table.from_pandas(
            df.drop_duplicates("user_id", keep="last"), preserve_index=False
        )

    def fold(df):
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        out = df.drop_duplicates("user_id", keep="last").copy()
        out["last_us"] = (
            out["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        )
        out["last_cents"] = np.rint(
            out["value"].to_numpy() * 100
        ).astype(np.int64)
        return out[["user_id", "event_type", "last_us", "last_cents"]]

    return (
        ds.map_batches(local_last, batch_format="pyarrow")
        .map_batches(_add_user_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(fold, batch_format="pandas")
    )


LAST_EVENT_SQL = (
    "SELECT user_id, event_type, epoch_us(ts) AS last_us,"
    " CAST(round(value * 100) AS BIGINT) AS last_cents"
    " FROM events QUALIFY"
    " row_number() OVER (PARTITION BY user_id ORDER BY ts DESC,"
    "  event_id DESC) = 1"
)


def q_event_transitions(sf_dir: str) -> "ray.data.Dataset":
    """Markov transition counts over per-user event streams: for every
    (previous event_type -> event_type) pair, how many consecutive-event
    transitions occur — the behavioral bigram table funnels and anomaly
    models start from.  Coarse user-hash partitions again: inside each
    partition one (user, ts, event_id) sort, a shifted equality mask for
    user boundaries, and a pandas pair count; only the |types|^2-bounded
    partial counts cross the final exchange."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )

    def fold(df):
        import pandas as pd

        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = df["user_id"].to_numpy().astype(np.int64)
        et = df["event_type"].to_numpy()
        n = len(df)
        if n < 2:
            return pd.DataFrame(
                {"prev_type": pd.Series([], dtype=object),
                 "event_type": pd.Series([], dtype=object),
                 "pn": pd.Series([], dtype=np.int64)}
            )
        same = uid[1:] == uid[:-1]
        g = (
            pd.DataFrame(
                {"prev_type": et[:-1][same], "event_type": et[1:][same]}
            )
            .groupby(["prev_type", "event_type"], as_index=False)
            .size()
            .rename(columns={"size": "pn"})
        )
        g["pn"] = g["pn"].astype(np.int64)
        return g

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(_add_user_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(fold, batch_format="pandas")
        .groupby(["prev_type", "event_type"])
        .aggregate(Sum("pn", alias_name="n"))
    )


EVENT_TRANSITIONS_SQL = (
    "WITH e AS (SELECT user_id, event_type,"
    " lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)"
    "  AS prev_type FROM events)"
    " SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS n"
    " FROM e WHERE prev_type IS NOT NULL GROUP BY prev_type, event_type"
)


WAU_WINDOW = 7


def q_wau7(sf_dir: str) -> "ray.data.Dataset":
    """Trailing 7-day active users (WAU) per window-end day — COUNT
    DISTINCT over a sliding window, which no plain groupby expresses
    because one event makes its user active for SEVEN window-end days.

    Same three-level shape as ``distinct_users_daily``: batch-distinct
    packed (user, day) keys shrink the exchange, a user-hash partition
    makes the fold exact, and inside the partition each key expands to its
    7 covered window days by pure packed-key arithmetic (+0..+6 on the low
    bits) followed by one unique — per-user interval math with no per-user
    loop.  Only per-(window day) partial counts meet the final sum."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    )

    def pairs(t: pa.Table) -> pa.Table:
        u = t["ts"].to_numpy(zero_copy_only=False)
        ts_us = u.astype("datetime64[us]").astype(np.int64)
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        day = ts_us // _DAY_US
        if len(uid):
            assert uid.min() >= 0 and uid.max() < (1 << (62 - _DAY_BITS)) and (
                day.min() >= 0
                and day.max() + WAU_WINDOW < (1 << _DAY_BITS)
            ), "wau_7d key packing out of range"
        key = np.unique(uid * (1 << _DAY_BITS) + day)
        return pa.table(
            {
                "key": key,
                "part": ((key >> _DAY_BITS) % N_EVENT_PARTS).astype(np.int32),
            }
        )

    def fold(df):
        import pandas as pd

        key = np.unique(df["key"].to_numpy())
        # each active (user, day) covers window-end days day..day+6; the
        # day index lives in the low bits, so the expansion is key + i
        covered = np.unique(
            (key[:, None] + np.arange(WAU_WINDOW, dtype=np.int64)).ravel()
        )
        wday, cnt = np.unique(
            covered & ((1 << _DAY_BITS) - 1), return_counts=True
        )
        return pd.DataFrame({"wday": wday, "pn": cnt.astype(np.int64)})

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("part")
        .map_groups(fold, batch_format="pandas")
        .groupby("wday")
        .aggregate(Sum("pn", alias_name="n_users"))
    )


WAU7_SQL = (
    "WITH p AS (SELECT DISTINCT user_id,"
    f" epoch_us(ts) // {_DAY_US} AS day FROM events),"
    " w AS (SELECT DISTINCT user_id, day + i AS wday"
    f"  FROM p, UNNEST(range(0, {WAU_WINDOW})) AS t(i))"
    " SELECT wday, CAST(count(*) AS BIGINT) AS n_users"
    " FROM w GROUP BY wday"
)


def q_retention_cohorts(sf_dir: str) -> "ray.data.Dataset":
    """Cohort retention matrix: each user is cohorted by their FIRST active
    day; for every (cohort_day, day_offset) count the users active that
    many days after joining — the classic product-analytics /
    corpus-freshness retention triangle.

    Shape: per-batch dedup of packed (user, day) int keys shrinks the
    exchange to unique pairs; a hash partition on user_id puts each user's
    whole history in exactly one partition, so ONE numpy fold derives the
    per-user first day (run starts of the sorted packed keys) and emits
    per-(cohort, offset) partial counts; a tiny final groupby sums them.
    No raw-event shuffle, no driver-side user map — user cardinality never
    leaves the workers."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    )

    def pairs(t: pa.Table) -> pa.Table:
        ts_us = t["ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]"
        ).astype(np.int64)
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        day = ts_us // _DAY_US
        if len(uid):
            assert uid.min() >= 0 and uid.max() < (1 << (62 - _DAY_BITS)) and (
                day.min() >= 0 and day.max() < (1 << _DAY_BITS)
            ), "retention_cohorts key packing out of range"
        key = np.unique(uid * (1 << _DAY_BITS) + day)
        return pa.table(
            {
                "key": key,
                "part": ((key >> _DAY_BITS) % N_EVENT_PARTS).astype(np.int32),
            }
        )

    def fold(df):
        import pandas as pd

        key = np.unique(df["key"].to_numpy())  # uid-major, day ascending
        uid = key >> _DAY_BITS
        day = key & ((1 << _DAY_BITS) - 1)
        n = len(key)
        if n == 0:
            return pd.DataFrame(
                {"cohort_day": np.array([], dtype=np.int64),
                 "day_offset": np.array([], dtype=np.int64),
                 "pn": np.array([], dtype=np.int64)}
            )
        start = np.ones(n, dtype=bool)
        start[1:] = uid[1:] != uid[:-1]
        runs = np.diff(np.append(np.nonzero(start)[0], n))
        cohort = np.repeat(day[start], runs)  # each user's first day
        co = np.stack([cohort, day - cohort], axis=1)
        uniq, cnt = np.unique(co, axis=0, return_counts=True)
        return pd.DataFrame(
            {"cohort_day": uniq[:, 0], "day_offset": uniq[:, 1],
             "pn": cnt.astype(np.int64)}
        )

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("part")
        .map_groups(fold, batch_format="pandas")
        .groupby(["cohort_day", "day_offset"])
        .aggregate(Sum("pn", alias_name="n_users"))
    )


RETENTION_SQL = (
    f"WITH a AS (SELECT DISTINCT user_id, epoch_us(ts) // {_DAY_US} AS day"
    " FROM events),"
    " f AS (SELECT user_id, min(day) AS cohort_day FROM a GROUP BY user_id)"
    " SELECT cohort_day, day - cohort_day AS day_offset,"
    " CAST(count(*) AS BIGINT) AS n_users"
    " FROM a JOIN f USING (user_id) GROUP BY cohort_day, day_offset"
)


# --------------------------------------------------------------------------
# Per-sequence lag-1 autocorrelation statistics
# --------------------------------------------------------------------------

def q_autocorr_lag1(sf_dir: str) -> "ray.data.Dataset":
    """Per-doc lag-1 autocorrelation ingredients over the token sequence:
    n, sum, sum of squares and the lag-1 dot product sum(t[i] * t[i+1]) —
    all BIGINT so the oracle is hash-exact (the float r1 is a driver-side
    division away).  One pass over the batch's flat values buffer: the
    shifted product is computed globally, cross-doc boundary terms are
    zeroed, and per-doc sums are ``reduceat`` segments — no per-row loop."""
    ds = _seq_ds(sf_dir)

    def stats(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        n_docs = len(off) - 1
        if n_docs == 0 or len(v) == 0:
            return pa.table(
                {"doc_id": t["doc_id"],
                 "n": pa.array([], type=pa.int64()),
                 "s": pa.array([], type=pa.int64()),
                 "q": pa.array([], type=pa.int64()),
                 "lag1_dot": pa.array([], type=pa.int64())}
            )
        n = np.diff(off)
        s = np.add.reduceat(v, off[:-1])
        q = np.add.reduceat(v * v, off[:-1])
        prod = v[:-1] * v[1:]
        prod[off[1:-1] - 1] = 0  # cross-doc boundary terms
        dot = np.add.reduceat(prod, np.minimum(off[:-1], len(prod) - 1))
        # a doc of length 1 would alias its neighbor's segment; the synth
        # schema guarantees n_tok >= 2, assert rather than silently mis-sum
        assert (n >= 2).all(), "autocorr_lag1 requires n_tok >= 2"
        return pa.table(
            {"doc_id": t["doc_id"], "n": n, "s": s, "q": q, "lag1_dot": dot}
        )

    return ds.map_batches(stats, batch_format="pyarrow", batch_size=256)


LTTB_T = 32  # output points per sequence (2 anchors + 30 middle buckets)


def q_lttb_downsample(sf_dir: str) -> "ray.data.Dataset":
    """LTTB downsampling (Steinarsson's Largest-Triangle-Three-Buckets):
    per sequence keep T=32 points — the endpoints plus, per middle bucket,
    the point forming the largest triangle with the PREVIOUSLY selected
    point and the NEXT bucket's centroid.  Bucketing is the floor map
    bk(p) = (p-1)(T-2)//(n-2); areas are exact integers (the triangle
    area x 2 x next-bucket count clears every division), ties break to the
    smallest position, and sequences with n <= T pass through whole.

    The selection is sequential in the BUCKET dimension only (30 steps);
    each step vectorizes across every document in the batch: ragged
    candidate ranges come from repeat/arange index arithmetic, per-doc
    prefix sums give next-bucket centroids O(1), and the argmax-with-tie
    is a maximum.reduceat + masked minimum.reduceat pair — no per-doc or
    per-point Python.  SQL twin: a recursive CTE whose step picks the
    bucket argmax via a correlated NOT EXISTS (aggregates are illegal in
    recursive terms)."""
    return _seq_ds(sf_dir).map_batches(
        _lttb_batch, batch_format="pyarrow", batch_size=256
    )


def _lttb_batch(t: pa.Table, T: int = LTTB_T) -> pa.Table:
    vals, off = list_to_numpy(t["tokens"])
    v = vals.astype(np.int64)
    ids = np.asarray(t["doc_id"].to_pylist(), dtype=object)
    n_all = np.diff(off)
    out_doc, out_pos, out_tok = [], [], []

    small = n_all <= T
    if small.any():
        sm = np.flatnonzero(small)
        cnt = n_all[sm]
        out_doc.append(np.repeat(ids[sm], cnt))
        rag = np.arange(cnt.sum()) - np.repeat(
            np.cumsum(cnt) - cnt, cnt
        )
        out_pos.append(rag)
        out_tok.append(v[np.repeat(off[:-1][sm], cnt) + rag])

    big = np.flatnonzero(~small)
    if len(big):
        n = n_all[big]
        base = off[:-1][big]
        ps = np.concatenate(([0], np.cumsum(v)))

        def bstart(k):  # first position of middle bucket k (ceil + 1)
            return -((-k * (n - 2)) // (T - 2)) + 1

        a_pos = np.zeros(len(big), dtype=np.int64)
        a_tok = v[base]
        sel_pos = [np.zeros(len(big), dtype=np.int64)]
        for k in range(T - 2):
            s, e = bstart(k), bstart(k + 1)
            if k < T - 3:
                ns, ne = e, bstart(k + 2)
                c = ne - ns
                sx = (ns + ne - 1) * (ne - ns) // 2
                sy = ps[base + ne] - ps[base + ns]
            else:
                c = np.ones(len(big), dtype=np.int64)
                sx = n - 1
                sy = v[base + n - 1]
            lens = e - s
            starts = np.cumsum(lens) - lens
            rag = np.arange(lens.sum()) - np.repeat(starts, lens)
            relpos = np.repeat(s, lens) + rag
            cand = v[np.repeat(base, lens) + relpos]
            a1 = np.repeat(a_pos * c - sx, lens)
            a2 = np.repeat(a_tok * c - sy, lens)
            area2 = np.abs(
                a1 * (cand - np.repeat(a_tok, lens))
                - (np.repeat(a_pos, lens) - relpos) * a2
            )
            mx = np.maximum.reduceat(area2, starts)
            ismax = area2 == np.repeat(mx, lens)
            masked = np.where(ismax, relpos, np.int64(1) << 40)
            a_pos = np.minimum.reduceat(masked, starts)
            a_tok = v[base + a_pos]
            sel_pos.append(a_pos)
        sel_pos.append(n - 1)
        allpos = np.stack(sel_pos, axis=1).ravel()  # doc-major order
        out_doc.append(np.repeat(ids[big], T))
        out_pos.append(allpos)
        out_tok.append(v[np.repeat(base, T) + allpos])

    if not out_doc:
        return pa.table(
            {"doc_id": pa.array([], type=t["doc_id"].type),
             "pos": pa.array([], type=pa.int64()),
             "tok": pa.array([], type=pa.int64())}
        )
    return pa.table(
        {
            "doc_id": pa.array(np.concatenate(out_doc),
                               type=t["doc_id"].type),
            "pos": np.concatenate(out_pos),
            "tok": np.concatenate(out_tok),
        }
    )


def _lttb_area2(cand_pos: str, cand_tok: str) -> str:
    return (
        f"abs((r.sel_pos*x.c - x.sx)*({cand_tok} - r.sel_tok)"
        f" - (r.sel_pos - {cand_pos})*(r.sel_tok*x.c - x.sy))"
    )


LTTB_SQL = (
    "WITH RECURSIVE"
    " f AS (SELECT doc_id, n_tok, unnest(tokens) AS tok,"
    "  generate_subscripts(tokens, 1) - 1 AS pos"
    f"  FROM read_parquet('{SYNTH_GLOB_001}')),"
    f" mid AS (SELECT doc_id, pos, tok,"
    f"  CAST((pos-1)*{LTTB_T - 2} // (n_tok-2) AS BIGINT) AS bk"
    f"  FROM f WHERE pos >= 1 AND pos <= n_tok - 2 AND n_tok > {LTTB_T}),"
    " cent AS (SELECT doc_id, bk, CAST(sum(pos) AS BIGINT) AS sx,"
    "  CAST(sum(tok) AS BIGINT) AS sy, CAST(count(*) AS BIGINT) AS c"
    "  FROM mid GROUP BY doc_id, bk),"
    " lastp AS (SELECT doc_id, n_tok - 1 AS pos,"
    "  max(CASE WHEN pos = n_tok - 1 THEN tok END) AS tok"
    f"  FROM f WHERE n_tok > {LTTB_T} GROUP BY doc_id, n_tok),"
    " nxt AS (SELECT m.doc_id, m.bk, coalesce(c2.sx, l.pos) AS sx,"
    "  coalesce(c2.sy, l.tok) AS sy, coalesce(c2.c, 1) AS c"
    "  FROM (SELECT DISTINCT doc_id, bk FROM mid) m"
    "  LEFT JOIN cent c2 ON c2.doc_id = m.doc_id AND c2.bk = m.bk + 1"
    "  JOIN lastp l ON l.doc_id = m.doc_id),"
    " rec(doc_id, bk, sel_pos, sel_tok) AS ("
    "  SELECT doc_id, CAST(-1 AS BIGINT), CAST(0 AS BIGINT),"
    "   CAST(max(CASE WHEN pos = 0 THEN tok END) AS BIGINT)"
    f"  FROM f WHERE n_tok > {LTTB_T} GROUP BY doc_id"
    "  UNION ALL"
    "  SELECT r.doc_id, r.bk + 1, pick.pos, pick.tok FROM rec r"
    "  JOIN nxt x ON x.doc_id = r.doc_id AND x.bk = r.bk + 1,"
    "  LATERAL (SELECT m2.pos, m2.tok FROM mid m2"
    "   WHERE m2.doc_id = r.doc_id AND m2.bk = r.bk + 1"
    f"   ORDER BY {_lttb_area2('m2.pos', 'm2.tok')} DESC, m2.pos"
    "   LIMIT 1) pick)"
    " SELECT doc_id, sel_pos AS pos, sel_tok AS tok FROM rec"
    " UNION ALL SELECT doc_id, pos, CAST(tok AS BIGINT) FROM lastp"
    " UNION ALL SELECT doc_id, pos, CAST(tok AS BIGINT) FROM f"
    f" WHERE n_tok <= {LTTB_T}"
)


M4_BUCKETS = 64
_M4_POSBITS = 20  # pos < 2^20 (n_tok <= 65536); tok * 2^20 fits int64


def q_m4_downsample(sf_dir: str) -> "ray.data.Dataset":
    """M4 visualization downsampling (Jugel et al., VLDB 2014): per
    sequence and per pixel-column bucket keep the FIRST, LAST, MIN and MAX
    points — the downsampler that renders a line chart pixel-exactly from
    4 x width points instead of the raw series.

    Fully vectorized across the batch: bucket ids are pure arithmetic on
    per-doc positions (pos * B // n), segment boundaries come from the
    (doc, bucket) change mask, and the four extremes per segment are
    ``reduceat``s — argmin/argmax WITH deterministic smallest-pos
    tie-breaks by packing (tok << 20 | pos) for min and
    (tok << 20 | ~pos) for max into one int64 key each.  Emits the
    distinct selected points (doc_id, pos, tok)."""
    ds = _seq_ds(sf_dir)

    def m4(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        n_docs = len(off) - 1
        if n_docs == 0 or len(v) == 0:
            return pa.table(
                {"doc_id": pa.array([], type=t["doc_id"].type),
                 "pos": pa.array([], type=pa.int64()),
                 "tok": pa.array([], type=pa.int64())}
            )
        n = np.diff(off)
        assert n.max() < (1 << _M4_POSBITS) and v.min() >= 0, "M4 packing"
        seg_doc = np.repeat(np.arange(n_docs, dtype=np.int64), n)
        pos = np.arange(len(v), dtype=np.int64) - np.repeat(off[:-1], n)
        bucket = pos * M4_BUCKETS // np.repeat(n, n)
        # contiguous (doc, bucket) segments over the already-ordered stream
        key = seg_doc * (M4_BUCKETS + 1) + bucket
        starts = np.flatnonzero(np.diff(key, prepend=key[0] - 1))
        pmask = (1 << _M4_POSBITS) - 1
        kmin = v * (1 << _M4_POSBITS) + pos
        kmax = v * (1 << _M4_POSBITS) + (pmask - pos)
        sel_first = pos[starts]
        ends = np.concatenate((starts[1:], [len(v)])) - 1
        sel_last = pos[ends]
        sel_min = np.minimum.reduceat(kmin, starts) & pmask
        sel_max = pmask - (np.maximum.reduceat(kmax, starts) & pmask)
        segdoc = seg_doc[starts]
        all_doc = np.concatenate([segdoc] * 4)
        all_pos = np.concatenate([sel_first, sel_last, sel_min, sel_max])
        # distinct (doc, pos)
        u = np.unique(all_doc * (1 << _M4_POSBITS) + all_pos)
        udoc = u >> _M4_POSBITS
        upos = u & pmask
        ids = np.asarray(t["doc_id"].to_pylist(), dtype=object)
        return pa.table(
            {
                "doc_id": pa.array(ids[udoc], type=t["doc_id"].type),
                "pos": upos,
                "tok": v[off[:-1][udoc] + upos],
            }
        )

    return ds.map_batches(m4, batch_format="pyarrow", batch_size=256)


M4_SQL = (
    "WITH flat AS (SELECT doc_id, n_tok, unnest(tokens) AS tok,"
    " generate_subscripts(tokens, 1) - 1 AS pos"
    f" FROM read_parquet('{SYNTH_GLOB_001}')),"
    f" b AS (SELECT doc_id, pos, tok, pos * {M4_BUCKETS} // n_tok AS bk"
    "  FROM flat),"
    " sel AS ("
    "  SELECT doc_id, min(pos) AS pos FROM b GROUP BY doc_id, bk"
    "  UNION SELECT doc_id, max(pos) FROM b GROUP BY doc_id, bk"
    "  UNION SELECT doc_id, pos FROM ("
    "   SELECT doc_id, pos, row_number() OVER (PARTITION BY doc_id, bk"
    "    ORDER BY tok, pos) AS rn FROM b) WHERE rn = 1"
    "  UNION SELECT doc_id, pos FROM ("
    "   SELECT doc_id, pos, row_number() OVER (PARTITION BY doc_id, bk"
    "    ORDER BY tok DESC, pos) AS rn FROM b) WHERE rn = 1)"
    " SELECT b.doc_id, b.pos, CAST(b.tok AS BIGINT) AS tok"
    " FROM b JOIN (SELECT DISTINCT doc_id, pos FROM sel) s"
    "  ON s.doc_id = b.doc_id AND s.pos = b.pos"
)


CUSUM_K = 2800      # drift allowance (slightly above the token mean)
CUSUM_H = 100_000   # decision threshold


def q_cusum_flags(sf_dir: str) -> "ray.data.Dataset":
    """Per-sequence CUSUM change-point detection: the one-sided cusum
    s_k = max(0, s_{k-1} + (x_k - K)) rewritten as prefix-sum minus
    running minimum (s_k = P_k - min(0, min_{j<=k} P_j)) so the whole
    batch vectorizes — INCLUDING the per-doc reset, via the segmented-
    cummin offset trick: subtracting seg_id * 2^40 from each doc's prefix
    sums makes a single global ``np.minimum.accumulate`` equal the
    within-doc running min (earlier docs sit 2^40 higher, so they can
    never win a later doc's minimum).  No per-row loop, exact integers.
    Emits per doc the flag count (positions with s > H) and max s."""
    ds = _seq_ds(sf_dir)
    BIG = np.int64(1) << 40

    def stats(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        lens = np.diff(off)
        if (lens == 0).any():
            # empty docs would wrap base via off[i] - 1 == -1 AND emit a
            # garbage reduceat row their SQL twin omits — drop them (the
            # twin's flat CTE has no rows for an empty doc)
            t = t.filter(pa.array(lens > 0))
            vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        n_docs = len(off) - 1
        if n_docs == 0 or len(v) == 0:
            return pa.table(
                {"doc_id": t["doc_id"],
                 "n_flags": pa.array([], type=pa.int64()),
                 "max_s": pa.array([], type=pa.int64())}
            )
        n = np.diff(off)
        seg = np.repeat(np.arange(n_docs, dtype=np.int64), n)
        d = v - CUSUM_K
        g = np.cumsum(d)
        base = np.concatenate(([0], g[off[1:-1] - 1]))  # prefix before doc
        p = g - base[seg]                                # per-doc prefix sums
        assert np.abs(p).max() < BIG // 2, "cusum prefix overflows the trick"
        q = p - seg * BIG
        # seed each doc's running min with 0 (s_0 = 0): clip the cummin of
        # the offset stream at the doc's own zero level
        run = np.minimum.accumulate(q) + seg * BIG
        run = np.minimum(run, 0)
        s = p - run
        flags = (s > CUSUM_H).astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_flags": np.add.reduceat(flags, off[:-1]),
                "max_s": np.maximum.reduceat(s, off[:-1]),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow", batch_size=256)


CUSUM_SQL = (
    f"{_FLAT_CTE},"
    f" p AS (SELECT doc_id, pos, sum(tok - {CUSUM_K}) OVER"
    "  (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS pk"
    "  FROM flat),"
    " m AS (SELECT doc_id, pk, least(min(pk) OVER"
    "  (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING), 0)"
    "   AS mn FROM p)"
    " SELECT doc_id,"
    f" CAST(sum(CASE WHEN pk - mn > {CUSUM_H} THEN 1 ELSE 0 END) AS BIGINT)"
    "  AS n_flags,"
    " CAST(max(pk - mn) AS BIGINT) AS max_s FROM m GROUP BY doc_id"
)


AUTOCORR_SQL = (
    f"{_FLAT_CTE},"
    " l AS (SELECT doc_id, tok,"
    "  lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt FROM flat)"
    " SELECT doc_id, CAST(count(*) AS BIGINT) AS n,"
    " CAST(sum(tok) AS BIGINT) AS s,"
    " CAST(sum(tok * tok) AS BIGINT) AS q,"
    " CAST(sum(tok * nxt) AS BIGINT) AS lag1_dot"
    " FROM l GROUP BY doc_id"
)


ROLL_MED_W = 17  # odd, so the median is an element of the window (exact int)


def q_rolling_median(sf_dir: str) -> "ray.data.Dataset":
    """Per-sequence sliding-window median (the robust smoother a
    denoising/outlier pass runs before thresholding): window ROLL_MED_W
    tokens, complete windows only, reduced per doc to (n_win, sum_med,
    max_med) so the output stays sequence-sized. Vectorized across the
    whole batch: ONE ``sliding_window_view`` + ``np.partition`` over the
    concatenated token stream scores every window, then windows that
    straddle a doc boundary are discarded by index arithmetic — no per-row
    loop, no per-doc loop. W is odd so each median is an element of its
    window and the DuckDB ``quantile_disc(0.5)`` twin is bit-exact."""
    ds = _seq_ds(sf_dir)
    W = ROLL_MED_W

    def stats(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        n = np.diff(off)
        keep = n >= W  # docs shorter than one window have no output row
        if len(v) < W or not keep.any():
            return pa.table(
                {"doc_id": t["doc_id"].filter(pa.array(np.zeros(len(n), bool))),
                 "n_win": pa.array([], type=pa.int64()),
                 "sum_med": pa.array([], type=pa.int64()),
                 "max_med": pa.array([], type=pa.int64())}
            )
        win = np.lib.stride_tricks.sliding_window_view(v, W)
        med = np.partition(win, W // 2, axis=1)[:, W // 2]
        # window starting at s is doc-internal iff s in [off[d], off[d+1]-W]
        n_win = (n - W + 1).clip(min=0)
        starts = np.repeat(off[:-1][keep], n_win[keep]) + _ranges(n_win[keep])
        doc = np.repeat(np.arange(len(n), dtype=np.int64)[keep], n_win[keep])
        m = med[starts]
        first = np.concatenate(([0], np.cumsum(n_win[keep])[:-1]))
        return pa.table(
            {
                "doc_id": t["doc_id"].filter(pa.array(keep)),
                "n_win": pa.array(n_win[keep]),
                "sum_med": np.add.reduceat(m, first),
                "max_med": np.maximum.reduceat(m, first),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow", batch_size=64)


def _ranges(counts: np.ndarray) -> np.ndarray:
    """[0..c0), [0..c1), ... concatenated (vectorized arange per group)."""
    total = int(counts.sum())
    out = np.arange(total, dtype=np.int64)
    first = np.concatenate(([0], np.cumsum(counts)[:-1]))
    return out - np.repeat(first, counts)


ROLLING_MEDIAN_SQL = (
    f"{_FLAT_CTE},"
    " m AS (SELECT doc_id, pos, CAST(quantile_disc(tok, 0.5) OVER"
    f"  (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN {ROLL_MED_W - 1}"
    "   PRECEDING AND CURRENT ROW) AS BIGINT) AS med"
    "  FROM flat)"
    " SELECT doc_id, CAST(count(*) AS BIGINT) AS n_win,"
    " CAST(sum(med) AS BIGINT) AS sum_med,"
    " CAST(max(med) AS BIGINT) AS max_med"
    f" FROM m WHERE pos >= {ROLL_MED_W - 1} GROUP BY doc_id"
)


AUTOCORR_LAGS = (1, 2, 4, 8)


def q_autocorr_lags(sf_dir: str) -> "ray.data.Dataset":
    """Multi-lag autocorrelation ingredients in LONG form — per (doc, lag)
    the pair count and the integer dot product sum(t[i] * t[i+lag]) for
    lag in AUTOCORR_LAGS (the ACF evidence a seasonality detector reads).
    Per batch and per lag, ONE shifted elementwise product over the
    concatenated stream; pairs that straddle a doc boundary are zeroed by
    a segment-id comparison and each doc's sum falls out of one
    ``np.add.reduceat`` — exact int64, no per-row loop."""
    ds = _seq_ds(sf_dir)

    def stats(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        n = np.diff(off)
        n_docs = len(n)
        seg = np.repeat(np.arange(n_docs, dtype=np.int64), n)
        ids, lags, n_pairs, dots = [], [], [], []
        for lag in AUTOCORR_LAGS:
            if len(v) > lag:
                prod = v[:-lag] * v[lag:]
                prod[seg[:-lag] != seg[lag:]] = 0  # cross-doc pairs
                prod = np.concatenate(
                    (prod, np.zeros(lag, dtype=np.int64))
                )  # pad so reduceat sees every doc's full slice
                # reduceat needs indices < len and returns the NEXT element
                # for zero-length slices — empty/short docs are clipped in
                # bounds here and masked out below by np_ > 0
                dot = np.add.reduceat(
                    prod, np.minimum(off[:-1], len(prod) - 1)
                )
            else:
                dot = np.zeros(n_docs, dtype=np.int64)
            np_ = (n - lag).clip(min=0)
            keep = np_ > 0
            ids.append(np.flatnonzero(keep))
            lags.append(np.full(int(keep.sum()), lag, dtype=np.int64))
            n_pairs.append(np_[keep])
            dots.append(dot[keep])
        take = pa.array(np.concatenate(ids))
        return pa.table(
            {
                "doc_id": t["doc_id"].take(take),
                "lag": pa.array(np.concatenate(lags)),
                "n_pairs": pa.array(np.concatenate(n_pairs)),
                "dot": pa.array(np.concatenate(dots)),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow", batch_size=256)


# one lead() window scan per lag (UNION ALL), NOT a lags-table self-join:
# DuckDB plans the latter as a doc_id-only hash join + filter — billions of
# intermediate pairs at sf0.01 — while each lead() branch is O(n log n)
AUTOCORR_LAGS_SQL = (
    f"{_FLAT_CTE} "
    + " UNION ALL ".join(
        f"SELECT doc_id, CAST({lag} AS BIGINT) AS lag,"
        " CAST(count(nxt) AS BIGINT) AS n_pairs,"
        " CAST(sum(tok * nxt) AS BIGINT) AS dot FROM"
        f" (SELECT doc_id, tok, lead(tok, {lag}) OVER"
        "  (PARTITION BY doc_id ORDER BY pos) AS nxt FROM flat) q"
        " GROUP BY doc_id HAVING count(nxt) > 0"
        for lag in AUTOCORR_LAGS
    )
)


OHLC_W = 64


def q_ohlc_rollup(sf_dir: str) -> "ray.data.Dataset":
    """OHLC bucket downsample — the financial-rollup shape: per (sequence,
    tumbling bucket of OHLC_W positions) the first (open), max (high), min
    (low) and last (close) token plus the bucket count (the final bucket
    may be partial, like a trading day's tail). One ``tumble_starts`` +
    two ``reduceat`` calls + two gathers score every bucket of every doc
    in the batch — segments never cross doc boundaries by construction.
    All integers, so the arg_min/arg_max SQL twin is bit-exact."""
    ds = _seq_ds(sf_dir)

    def stats(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        lens = np.diff(off)
        if (lens == 0).any():  # tumbling rollups skip empty sequences
            t = t.filter(pa.array(lens > 0))
            vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        if len(v) == 0:
            return pa.table(
                {"doc_id": t["doc_id"],
                 "bucket": pa.array([], type=pa.int64()),
                 "open_v": pa.array([], type=pa.int64()),
                 "high_v": pa.array([], type=pa.int64()),
                 "low_v": pa.array([], type=pa.int64()),
                 "close_v": pa.array([], type=pa.int64()),
                 "n": pa.array([], type=pa.int64())}
            )
        starts, new_off, counts = tumble_starts(off, OHLC_W)
        n_win = np.diff(new_off)
        rep = pa.array(np.repeat(np.arange(len(n_win), dtype=np.int64), n_win))
        return pa.table(
            {
                "doc_id": t["doc_id"].take(rep),
                "bucket": pa.array(_ranges(n_win)),
                "open_v": pa.array(v[starts]),
                "high_v": pa.array(np.maximum.reduceat(v, starts)),
                "low_v": pa.array(np.minimum.reduceat(v, starts)),
                "close_v": pa.array(v[starts + counts - 1]),
                "n": pa.array(counts),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow", batch_size=256)


OHLC_SQL = (
    f"{_FLAT_CTE}"
    f" SELECT doc_id, CAST(pos // {OHLC_W} AS BIGINT) AS bucket,"
    " CAST(arg_min(tok, pos) AS BIGINT) AS open_v,"
    " CAST(max(tok) AS BIGINT) AS high_v,"
    " CAST(min(tok) AS BIGINT) AS low_v,"
    " CAST(arg_max(tok, pos) AS BIGINT) AS close_v,"
    " CAST(count(*) AS BIGINT) AS n"
    f" FROM flat GROUP BY doc_id, pos // {OHLC_W}"
)


SEASON_P = 24


def q_seasonal_profile(sf_dir: str) -> "ray.data.Dataset":
    """Seasonal phase profile — the seasonality-decomposition ingredient:
    per (sequence, phase = pos mod SEASON_P) the count and integer token
    sum (driver-side division away from the per-phase seasonal means an
    STL-style decomposition subtracts). Vectorized as one keyed bincount
    over the concatenated stream (key = seg * P + phase); float64
    accumulation is exact here because every partial sum stays far below
    2^53 (guarded per batch)."""
    ds = _seq_ds(sf_dir)
    P = SEASON_P

    def stats(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        n = np.diff(off)
        n_docs = len(n)
        if len(v) == 0 or n_docs == 0:
            return pa.table(
                {"doc_id": t["doc_id"].filter(
                    pa.array(np.zeros(n_docs, bool))),
                 "phase": pa.array([], type=pa.int64()),
                 "n": pa.array([], type=pa.int64()),
                 "s": pa.array([], type=pa.int64())}
            )
        seg = np.repeat(np.arange(n_docs, dtype=np.int64), n)
        pos = np.arange(len(v), dtype=np.int64) - np.repeat(off[:-1], n)
        key = seg * P + pos % P
        cnt = np.bincount(key, minlength=n_docs * P).astype(np.int64)
        # ValueError, not assert: the guard must survive python -O (it is
        # the only thing standing between us and silent float64 rounding)
        if int(cnt.max()) * int(np.abs(v).max(initial=0)) >= (1 << 53):
            raise ValueError(
                "per-phase sum would exceed float64's exact-integer range"
            )
        s = np.bincount(key, weights=v, minlength=n_docs * P).astype(np.int64)
        keep = cnt > 0
        idx = np.arange(n_docs * P, dtype=np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"].take(pa.array((idx // P)[keep])),
                "phase": pa.array((idx % P)[keep]),
                "n": pa.array(cnt[keep]),
                "s": pa.array(s[keep]),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow", batch_size=256)


SEASONAL_PROFILE_SQL = (
    f"{_FLAT_CTE}"
    f" SELECT doc_id, CAST(pos % {SEASON_P} AS BIGINT) AS phase,"
    " CAST(count(*) AS BIGINT) AS n, CAST(sum(tok) AS BIGINT) AS s"
    f" FROM flat GROUP BY doc_id, pos % {SEASON_P}"
)


def q_changepoint_argmax(sf_dir: str) -> "ray.data.Dataset":
    """Single change-point detection (binary-segmentation root step): per
    sequence the split k in [1, n) maximizing the cross-multiplied
    mean-shift statistic ``|n*P_k - k*P_n|`` (== n*k*(n-k) * |mean(left)
    - mean(right)| / ... with the divisions cleared, so it is
    integer-exact; ties pick the smallest k). One cumsum scores every
    candidate split of every doc in the batch; the per-doc argmax is two
    ``reduceat`` passes (max, then first index attaining it). Bounds:
    P_k < 2^36 and n <= 2^16, so n*P_k < 2^52 — no int64 overflow.
    Docs with n < 2 have no valid split and emit no row."""
    ds = _seq_ds(sf_dir)

    def stats(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        lens = np.diff(off)
        if (lens == 0).any():
            # an empty doc at a batch head would make off[i] - 1 == -1
            # wrap base to the grand total (code review, round 5)
            t = t.filter(pa.array(lens > 0))
            vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        n = np.diff(off)
        keep = n >= 2
        if not keep.any():
            return pa.table(
                {"doc_id": t["doc_id"].filter(pa.array(np.zeros(len(n), bool))),
                 "split_k": pa.array([], type=pa.int64()),
                 "score": pa.array([], type=pa.int64())}
            )
        g = np.cumsum(v)
        base = np.concatenate(([0], g[off[1:-1] - 1]))
        # candidate split after local position i (k = i+1), i in [0, n-2]
        n_cand = (n - 1).clip(min=0)
        starts = np.repeat(off[:-1][keep], n_cand[keep]) + _ranges(n_cand[keep])
        doc = np.repeat(np.arange(len(n), dtype=np.int64)[keep], n_cand[keep])
        k = starts - np.repeat(off[:-1][keep], n_cand[keep]) + 1
        p = g[starts] - base[doc]
        tot = g[off[1:] - 1] - base
        score = np.abs(n[doc] * p - k * tot[doc])
        first = np.concatenate(([0], np.cumsum(n_cand[keep])[:-1]))
        mx = np.maximum.reduceat(score, first)
        seg = np.repeat(np.arange(keep.sum(), dtype=np.int64), n_cand[keep])
        hit_k = np.where(score == mx[seg], k, np.int64(1) << 62)
        return pa.table(
            {
                "doc_id": t["doc_id"].filter(pa.array(keep)),
                "split_k": np.minimum.reduceat(hit_k, first),
                "score": mx,
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow", batch_size=256)


CHANGEPOINT_SQL = (
    f"{_FLAT_CTE},"
    " s AS (SELECT doc_id, pos,"
    "  sum(CAST(tok AS BIGINT)) OVER (PARTITION BY doc_id ORDER BY pos"
    "   ROWS UNBOUNDED PRECEDING) AS pk,"
    "  count(*) OVER (PARTITION BY doc_id) AS n,"
    "  sum(CAST(tok AS BIGINT)) OVER (PARTITION BY doc_id) AS tot"
    "  FROM flat),"
    " c AS (SELECT doc_id, pos + 1 AS k,"
    "  abs(n * pk - (pos + 1) * tot) AS sc FROM s WHERE pos < n - 1),"
    " mx AS (SELECT doc_id, max(sc) AS sc FROM c GROUP BY doc_id)"
    " SELECT c.doc_id, CAST(min(c.k) AS BIGINT) AS split_k,"
    " CAST(any_value(mx.sc) AS BIGINT) AS score"
    " FROM c JOIN mx ON c.doc_id = mx.doc_id AND c.sc = mx.sc"
    " GROUP BY c.doc_id"
)


def q_longest_streak(sf_dir: str) -> "ray.data.Dataset":
    """Gaps-and-islands run statistics: per sequence the token length of
    the longest strictly-increasing contiguous run and the longest
    equal-value run (data-quality probes: stuck sensors show long equal
    runs, monotone ramps show long increasing runs). Vectorized without
    any per-doc loop: run starts (doc boundary or broken condition) are
    a boolean array; ``np.maximum.accumulate`` of start-indices gives
    each position's run start, so run length = idx - start + 1; per-doc
    max is one ``reduceat``. Doc boundaries are run starts, so the
    accumulate is segment-aware for free."""
    ds = _seq_ds(sf_dir)

    def stats(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        n = np.diff(off)
        keep = n >= 1
        if not keep.any():
            return pa.table(
                {"doc_id": t["doc_id"].filter(pa.array(np.zeros(len(n), bool))),
                 "longest_inc": pa.array([], type=pa.int64()),
                 "longest_eq": pa.array([], type=pa.int64())}
            )
        idx = np.arange(len(v), dtype=np.int64)
        is_start = np.zeros(len(v), dtype=bool)
        is_start[off[:-1][keep]] = True
        prev_le = np.concatenate(([True], v[1:] <= v[:-1]))
        prev_ne = np.concatenate(([True], v[1:] != v[:-1]))
        run_inc = idx - np.maximum.accumulate(
            np.where(is_start | prev_le, idx, 0)) + 1
        run_eq = idx - np.maximum.accumulate(
            np.where(is_start | prev_ne, idx, 0)) + 1
        first = off[:-1][keep]
        return pa.table(
            {
                "doc_id": t["doc_id"].filter(pa.array(keep)),
                "longest_inc": np.maximum.reduceat(run_inc, first),
                "longest_eq": np.maximum.reduceat(run_eq, first),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow", batch_size=256)


LONGEST_STREAK_SQL = (
    f"{_FLAT_CTE},"
    " r AS (SELECT doc_id, pos, tok,"
    "  lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS prev FROM flat),"
    " b AS (SELECT doc_id, pos,"
    "  CASE WHEN prev IS NULL OR tok <= prev THEN 1 ELSE 0 END AS bi,"
    "  CASE WHEN prev IS NULL OR tok != prev THEN 1 ELSE 0 END AS be"
    "  FROM r),"
    " g AS (SELECT doc_id,"
    "  sum(bi) OVER (PARTITION BY doc_id ORDER BY pos"
    "   ROWS UNBOUNDED PRECEDING) AS gi,"
    "  sum(be) OVER (PARTITION BY doc_id ORDER BY pos"
    "   ROWS UNBOUNDED PRECEDING) AS ge FROM b),"
    " li AS (SELECT doc_id, max(c) AS longest_inc FROM"
    "  (SELECT doc_id, count(*) AS c FROM g GROUP BY doc_id, gi)"
    "  GROUP BY doc_id),"
    " le AS (SELECT doc_id, max(c) AS longest_eq FROM"
    "  (SELECT doc_id, count(*) AS c FROM g GROUP BY doc_id, ge)"
    "  GROUP BY doc_id)"
    " SELECT li.doc_id, CAST(longest_inc AS BIGINT) AS longest_inc,"
    " CAST(longest_eq AS BIGINT) AS longest_eq"
    " FROM li JOIN le ON li.doc_id = le.doc_id"
)


SLOPE_W = 64


def q_window_slope(sf_dir: str) -> "ray.data.Dataset":
    """Tumbling-window OLS trend: per (sequence, bucket of SLOPE_W
    positions) the integer numerator and denominator of the
    least-squares slope over (local position, token) pairs —
    num = c*S(i*y) - S(i)*S(y), den = c*S(i^2) - S(i)^2 with i the
    0-based position inside the bucket and c the bucket count (the tail
    bucket may be partial; a 1-token bucket has den = 0). S(i) and
    S(i^2) are closed forms of c, so the batch kernel needs just two
    ``reduceat`` passes (sum of i*y and sum of y). Bounds: S(i*y) <
    64*63*2^20 < 2^32, times c <= 64 -> < 2^38, exact in int64."""
    ds = _seq_ds(sf_dir)
    W = SLOPE_W

    def stats(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        if len(v) == 0:
            empty = pa.array([], type=pa.int64())
            return pa.table(
                {"doc_id": t["doc_id"].filter(
                    pa.array(np.zeros(len(off) - 1, bool))),
                 "bucket": empty, "num": empty, "den": empty}
            )
        lens = np.diff(off)
        if (lens == 0).any():
            t = t.filter(pa.array(lens > 0))
            vals, off = list_to_numpy(t["tokens"])
            v = vals.astype(np.int64)
        starts, new_off, c = tumble_starts(off, W)
        n_win = np.diff(new_off)
        i_local = np.arange(len(v), dtype=np.int64) - np.repeat(starts, c)
        siy = np.add.reduceat(i_local * v, starts)
        sy = np.add.reduceat(v, starts)
        si = c * (c - 1) // 2
        sii = (c - 1) * c * (2 * c - 1) // 6
        rep = pa.array(np.repeat(np.arange(len(n_win), dtype=np.int64), n_win))
        return pa.table(
            {
                "doc_id": t["doc_id"].take(rep),
                "bucket": pa.array(_ranges(n_win)),
                "num": pa.array(c * siy - si * sy),
                "den": pa.array(c * sii - si * si),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow", batch_size=256)


WINDOW_SLOPE_SQL = (
    f"{_FLAT_CTE},"
    f" w AS (SELECT doc_id, pos // {SLOPE_W} AS bucket,"
    f"  CAST(pos % {SLOPE_W} AS BIGINT) AS i, CAST(tok AS BIGINT) AS y"
    "  FROM flat)"
    " SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,"
    " CAST(count(*) * sum(i * y) - sum(i) * sum(y) AS BIGINT) AS num,"
    " CAST(count(*) * sum(i * i) - sum(i) * sum(i) AS BIGINT) AS den"
    " FROM w GROUP BY doc_id, bucket"
)


# deterministic 8-tap integer matched filter (a Haar-like edge detector
# with unequal taps so ties are rare and argmax positions are sharp)
MATCH_PATTERN = (3, 1, -4, 1, 5, -9, 2, -6)


def q_pattern_match(sf_dir: str) -> "ray.data.Dataset":
    """Matched-filter scan (the exact-integer core of a MASS-style
    similarity search): slide the fixed MATCH_PATTERN over every
    sequence, emit per doc the best start position (argmax of the dot
    product, ties -> smallest pos) and the best score. One
    ``sliding_window_view`` matmul scores every window in the batch;
    cross-doc windows are discarded by index arithmetic and the per-doc
    argmax is the same two-``reduceat`` trick as changepoint_argmax.
    |score| <= 8*9*2^20 < 2^27 — no overflow. Docs shorter than the
    pattern emit no row."""
    ds = _seq_ds(sf_dir)
    m = len(MATCH_PATTERN)
    pat = np.asarray(MATCH_PATTERN, dtype=np.int64)

    def stats(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        n = np.diff(off)
        keep = n >= m
        if len(v) < m or not keep.any():
            return pa.table(
                {"doc_id": t["doc_id"].filter(pa.array(np.zeros(len(n), bool))),
                 "best_pos": pa.array([], type=pa.int64()),
                 "best_score": pa.array([], type=pa.int64())}
            )
        score = np.lib.stride_tricks.sliding_window_view(v, m) @ pat
        n_win = (n - m + 1).clip(min=0)
        starts = np.repeat(off[:-1][keep], n_win[keep]) + _ranges(n_win[keep])
        pos = starts - np.repeat(off[:-1][keep], n_win[keep])
        s = score[starts]
        first = np.concatenate(([0], np.cumsum(n_win[keep])[:-1]))
        mx = np.maximum.reduceat(s, first)
        seg = np.repeat(np.arange(keep.sum(), dtype=np.int64), n_win[keep])
        hit = np.where(s == mx[seg], pos, np.int64(1) << 62)
        return pa.table(
            {
                "doc_id": t["doc_id"].filter(pa.array(keep)),
                "best_pos": np.minimum.reduceat(hit, first),
                "best_score": mx,
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow", batch_size=64)


_PAT_TERMS = " + ".join(
    f"({c}) * lead(tok, {j}) OVER d" if j else f"({c}) * tok"
    for j, c in enumerate(MATCH_PATTERN)
)
PATTERN_MATCH_SQL = (
    f"{_FLAT_CTE},"
    " s AS (SELECT doc_id, pos,"
    f"  {_PAT_TERMS} AS sc,"
    "  count(*) OVER (PARTITION BY doc_id) AS n FROM flat"
    "  WINDOW d AS (PARTITION BY doc_id ORDER BY pos)),"
    f" c AS (SELECT doc_id, pos, sc FROM s WHERE pos + {len(MATCH_PATTERN)}"
    "  <= n),"
    " mx AS (SELECT doc_id, max(sc) AS sc FROM c GROUP BY doc_id)"
    " SELECT c.doc_id, CAST(min(c.pos) AS BIGINT) AS best_pos,"
    " CAST(any_value(mx.sc) AS BIGINT) AS best_score"
    " FROM c JOIN mx ON c.doc_id = mx.doc_id AND c.sc = mx.sc"
    " GROUP BY c.doc_id"
)


BOLL_W = 16
BOLL_K = 2


def q_bollinger_breakouts(sf_dir: str) -> "ray.data.Dataset":
    """Bollinger-band breakout counter: per sequence, over every complete
    trailing window of BOLL_W tokens, count positions where
    |x - mean| > K*std — cross-multiplied to the integer-exact test
    (W*x - S)^2 > K^2 * (W*Q - S^2) with S/Q the window sum and
    sum-of-squares. Window sums come from cumsum differences computed in
    uint64 (the global running cumsum of squares can exceed 2^63 in a
    big batch, but modular differences of any window are exact because
    each true window sum < 2^44). Emits (doc_id, n_win, n_breakout);
    docs shorter than one window report zeros."""
    ds = _seq_ds(sf_dir)
    W, K2 = BOLL_W, BOLL_K * BOLL_K

    def stats(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        n = np.diff(off)
        keep = n >= 1
        if not keep.any():
            return pa.table(
                {"doc_id": t["doc_id"].filter(pa.array(np.zeros(len(n), bool))),
                 "n_win": pa.array([], type=pa.int64()),
                 "n_breakout": pa.array([], type=pa.int64())}
            )
        # the leading zero MUST be uint64: np.concatenate(([0], uint64))
        # silently promotes the whole array to float64, voiding the
        # modular-exactness argument past 2^53 (code review, round 5)
        z = np.zeros(1, dtype=np.uint64)
        cs = np.concatenate((z, np.cumsum(v.astype(np.uint64))))
        cq = np.concatenate((z, np.cumsum((v * v).astype(np.uint64))))
        n_win = (n - W + 1).clip(min=0)
        out_nw = np.zeros(len(n), dtype=np.int64)
        out_nb = np.zeros(len(n), dtype=np.int64)
        out_nw[:] = n_win
        has = n_win > 0
        if has.any():
            # window ends at global index e (inclusive), e local >= W-1
            ends = (np.repeat(off[:-1][has] + W - 1, n_win[has])
                    + _ranges(n_win[has]))
            S = (cs[ends + 1] - cs[ends + 1 - W]).astype(np.int64)
            Q = (cq[ends + 1] - cq[ends + 1 - W]).astype(np.int64)
            x = v[ends]
            d = W * x - S
            brk = (d * d > K2 * (W * Q - S * S)).astype(np.int64)
            first = np.concatenate(([0], np.cumsum(n_win[has])[:-1]))
            out_nb[has] = np.add.reduceat(brk, first)
        return pa.table(
            {
                "doc_id": t["doc_id"].filter(pa.array(keep)),
                "n_win": pa.array(out_nw[keep]),
                "n_breakout": pa.array(out_nb[keep]),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow", batch_size=128)


BOLLINGER_SQL = (
    f"{_FLAT_CTE},"
    " w AS (SELECT doc_id, CAST(tok AS BIGINT) AS x,"
    "  sum(CAST(tok AS BIGINT)) OVER win AS s,"
    "  sum(CAST(tok AS BIGINT) * CAST(tok AS BIGINT)) OVER win AS q,"
    "  count(*) OVER win AS c FROM flat WINDOW win AS"
    "  (PARTITION BY doc_id ORDER BY pos"
    f"   ROWS BETWEEN {BOLL_W - 1} PRECEDING AND CURRENT ROW))"
    " SELECT doc_id,"
    f" CAST(count(*) FILTER (WHERE c = {BOLL_W}) AS BIGINT) AS n_win,"
    f" CAST(count(*) FILTER (WHERE c = {BOLL_W} AND"
    f"  ({BOLL_W} * x - s) * ({BOLL_W} * x - s) >"
    f"  {BOLL_K * BOLL_K} * ({BOLL_W} * q - s * s)) AS BIGINT)"
    "  AS n_breakout"
    " FROM w GROUP BY doc_id"
)


# fixed 8-point integer query shape for the DTW scan (token-range values,
# deterministic module constant — no runtime randomness)
DTW_QUERY = (100, 2000, 50000, 800, 120000, 3000, 60, 9000)


def q_dtw_query(sf_dir: str) -> "ray.data.Dataset":
    """Exact integer DTW distance from every sequence's 8-segment PAA to
    the fixed DTW_QUERY shape (the elastic-similarity search primitive;
    Sakoe & Chiba 1978 DP, |a_i - q_j| cost, full 8x8 grid). The DP is
    vectorized ACROSS docs: 64 numpy ops over (n_docs,) vectors per
    batch, never a per-doc Python loop. PAA floor-means reuse the SAX
    convention (trim tail, n >= 8 on both sides). Path cost <= 15 cells
    * 2^21 < 2^25 — exact in int64. The SQL twin unrolls the same 64 DP
    cells with DuckDB lateral column aliases."""
    ds = _seq_ds(sf_dir)
    q = np.asarray(DTW_QUERY, dtype=np.int64)
    W = len(q)

    def dtw(t: pa.Table) -> pa.Table:
        m = _paa_floor_means_batch(t, W)
        vals, off = list_to_numpy(m["means"])
        n_docs = len(off) - 1
        if n_docs == 0:
            return pa.table(
                {"doc_id": m["doc_id"],
                 "dtw": pa.array([], type=pa.int64())}
            )
        a = vals.astype(np.int64).reshape(n_docs, W)
        cost = np.abs(a[:, :, None] - q[None, None, :])
        D = np.empty((n_docs, W, W), dtype=np.int64)
        D[:, 0, 0] = cost[:, 0, 0]
        for j in range(1, W):
            D[:, 0, j] = D[:, 0, j - 1] + cost[:, 0, j]
        for i in range(1, W):
            D[:, i, 0] = D[:, i - 1, 0] + cost[:, i, 0]
            for j in range(1, W):
                D[:, i, j] = cost[:, i, j] + np.minimum(
                    D[:, i - 1, j],
                    np.minimum(D[:, i - 1, j - 1], D[:, i, j - 1]),
                )
        return pa.table(
            {"doc_id": m["doc_id"], "dtw": pa.array(D[:, W - 1, W - 1])}
        )

    return ds.map_batches(dtw, batch_format="pyarrow", batch_size=256)


def _dtw_sql() -> str:
    """Unrolled 8x8 DTW DP as ONE SELECT with lateral column aliases
    (each cell r{i}_{j} references already-defined aliases)."""
    W = len(DTW_QUERY)
    paa = _paa_sql_ctes(W)
    pivot = ", ".join(
        f"max(CASE WHEN k = {k} THEN m END) AS a{k}" for k in range(W)
    )
    cells = []
    for i in range(W):
        for j in range(W):
            c = f"abs(a{i} - {DTW_QUERY[j]})"
            if i == 0 and j == 0:
                e = c
            elif i == 0:
                e = f"r0_{j - 1} + {c}"
            elif j == 0:
                e = f"r{i - 1}_0 + {c}"
            else:
                e = (f"{c} + least(r{i - 1}_{j}, r{i - 1}_{j - 1},"
                     f" r{i}_{j - 1})")
            cells.append(f"{e} AS r{i}_{j}")
    return (
        f"{paa},"
        f" p AS (SELECT doc_id, {pivot} FROM m GROUP BY doc_id),"
        f" dp AS (SELECT doc_id, {', '.join(cells)} FROM p)"
        f" SELECT doc_id, CAST(r{W - 1}_{W - 1} AS BIGINT) AS dtw FROM dp"
    )


def _paa_sql_ctes(W: int) -> str:
    """The SAX PAA pipeline (trim-tail floor-means, n_tok >= W filter) as
    reusable CTEs ending in m(doc_id, k, m) — the exact twin of
    ``_paa_floor_means_batch(t, W)``."""
    return (
        "WITH seq AS (SELECT doc_id, tokens, n_tok"
        f" FROM read_parquet('{SYNTH_GLOB_001}') WHERE n_tok >= {W}),"
        " seg AS (SELECT doc_id,"
        f"   (generate_subscripts(tokens, 1) - 1) // (n_tok // {W}) AS k,"
        "   unnest(tokens) AS tok, n_tok FROM seq),"
        " ms AS (SELECT doc_id, k, sum(tok) AS s,"
        f"   max(n_tok // {W}) AS d"
        f"   FROM seg WHERE k < {W} GROUP BY doc_id, k),"
        " m AS (SELECT doc_id, k,"
        "   CAST((s - ((s % d) + d) % d) // d AS BIGINT) AS m FROM ms)"
    )


DTW_QUERY_SQL = _dtw_sql()


MOTIF_W = 16   # PAA segments for the motif screen
MOTIF_L = 4    # window length in segments
MOTIF_GAP = 4  # j >= i + MOTIF_GAP excludes overlapping (trivial) matches


def q_motif_pair(sf_dir: str) -> "ray.data.Dataset":
    """Matrix-profile-style motif discovery at PAA resolution: per
    sequence, the closest pair of non-overlapping length-MOTIF_L windows
    over the 16-segment PAA (L1 distance), i.e. the best repeated shape
    inside each series. All 45 candidate pairs are scored at once by one
    advanced-indexing subtraction over the (docs, 13, 4) window tensor;
    ties pick the lexicographically smallest (i, j) via first-argmin.
    Docs shorter than MOTIF_W tokens emit no row."""
    ds = _seq_ds(sf_dir)
    n_win = MOTIF_W - MOTIF_L + 1
    pairs = [(i, j) for i in range(n_win)
             for j in range(i + MOTIF_GAP, n_win)]
    ii = np.array([p[0] for p in pairs])
    jj = np.array([p[1] for p in pairs])

    def motif(t: pa.Table) -> pa.Table:
        m = _paa_floor_means_batch(t, MOTIF_W)
        vals, off = list_to_numpy(m["means"])
        n_docs = len(off) - 1
        if n_docs == 0:
            empty = pa.array([], type=pa.int64())
            return pa.table({"doc_id": m["doc_id"], "i": empty,
                             "j": empty, "dist": empty})
        a = vals.astype(np.int64).reshape(n_docs, MOTIF_W)
        win = np.lib.stride_tricks.sliding_window_view(a, MOTIF_L, axis=1)
        d = np.abs(win[:, ii, :] - win[:, jj, :]).sum(axis=2)
        best = np.argmin(d, axis=1)  # first occurrence = smallest (i, j)
        rows = np.arange(n_docs)
        return pa.table(
            {
                "doc_id": m["doc_id"],
                "i": pa.array(ii[best]),
                "j": pa.array(jj[best]),
                "dist": pa.array(d[rows, best]),
            }
        )

    return ds.map_batches(motif, batch_format="pyarrow", batch_size=256)


MOTIF_PAIR_SQL = (
    f"{_paa_sql_ctes(MOTIF_W)},"
    " w AS (SELECT doc_id, k AS i, m AS m0,"
    "  lead(m, 1) OVER d AS m1, lead(m, 2) OVER d AS m2,"
    "  lead(m, 3) OVER d AS m3 FROM m"
    "  WINDOW d AS (PARTITION BY doc_id ORDER BY k)),"
    f" win AS (SELECT * FROM w WHERE i <= {MOTIF_W - MOTIF_L}),"
    " pr AS (SELECT a.doc_id, a.i, b.i AS j,"
    "  abs(a.m0 - b.m0) + abs(a.m1 - b.m1) + abs(a.m2 - b.m2)"
    "  + abs(a.m3 - b.m3) AS dist"
    "  FROM win a JOIN win b ON a.doc_id = b.doc_id"
    f"  AND b.i >= a.i + {MOTIF_GAP}),"
    " mn AS (SELECT doc_id, min(dist) AS dist FROM pr GROUP BY doc_id),"
    " mi AS (SELECT pr.doc_id, min(pr.i) AS i FROM pr"
    "  JOIN mn ON pr.doc_id = mn.doc_id AND pr.dist = mn.dist"
    "  GROUP BY pr.doc_id)"
    " SELECT pr.doc_id, CAST(mi.i AS BIGINT) AS i,"
    " CAST(min(pr.j) AS BIGINT) AS j,"
    " CAST(any_value(pr.dist) AS BIGINT) AS dist"
    " FROM pr"
    " JOIN mn ON pr.doc_id = mn.doc_id AND pr.dist = mn.dist"
    " JOIN mi ON pr.doc_id = mi.doc_id AND pr.i = mi.i"
    " GROUP BY pr.doc_id, mi.i"
)


CROSS_MOTIF_Q = 4096   # PAA-mean quantization step for shape ids
CROSS_MOTIF_K = 20


def q_cross_motifs(sf_dir: str):
    """Cross-document motif census: which coarse shapes recur across the
    corpus. Each doc's PAA-16 means quantize to bytes (m // 4096 < 256
    for tokens < 2^20), every 4-segment window packs into one int64
    shape id, and the census counts DISTINCT docs per shape (a doc's
    internal repeats count once). The exchange is shape-keyed partial
    counts (per-batch doc-deduped), then local-top-K per block and a
    bounded driver finish — never the corpus, mirroring vocab_top20.
    Ties order by shape id ascending for a deterministic top-20."""
    from ray.data.aggregate import Sum

    L = MOTIF_L
    n_win = MOTIF_W - L + 1

    def partials(t: pa.Table) -> pa.Table:
        m = _paa_floor_means_batch(t, MOTIF_W)
        vals, off = list_to_numpy(m["means"])
        n_docs = len(off) - 1
        if n_docs == 0:
            return pa.table({"shape": pa.array([], type=pa.int64()),
                             "nd": pa.array([], type=pa.int64())})
        q = (vals.astype(np.int64) // CROSS_MOTIF_Q).reshape(n_docs, MOTIF_W)
        win = np.lib.stride_tricks.sliding_window_view(q, L, axis=1)
        shape = (((win[..., 0] << 8 | win[..., 1]) << 8 | win[..., 2])
                 << 8 | win[..., 3])
        # dedupe (doc, shape) before counting: one vote per doc
        docixd = np.repeat(np.arange(n_docs, dtype=np.int64), n_win)
        key = np.unique(docixd * (np.int64(1) << 32) + shape.ravel())
        sh, nd = np.unique(key & ((np.int64(1) << 32) - 1),
                           return_counts=True)
        return pa.table({"shape": pa.array(sh),
                         "nd": pa.array(nd.astype(np.int64))})

    agg = (
        _seq_ds(sf_dir)
        .map_batches(partials, batch_format="pyarrow", batch_size=256)
        .groupby("shape")
        .aggregate(Sum("nd", alias_name="n_docs"))
    )

    def local_top(df):
        return df.sort_values(["n_docs", "shape"],
                              ascending=[False, True]).head(CROSS_MOTIF_K)

    top = agg.map_batches(
        local_top, batch_format="pandas", batch_size=None
    ).to_pandas()
    return (
        top.sort_values(["n_docs", "shape"], ascending=[False, True])
        .head(CROSS_MOTIF_K)
        .reset_index(drop=True)
    )


CROSS_MOTIFS_SQL = (
    f"{_paa_sql_ctes(MOTIF_W)},"
    f" qz AS (SELECT doc_id, k, m // {CROSS_MOTIF_Q} AS q FROM m),"
    " w AS (SELECT doc_id, k AS i, q AS q0,"
    "  lead(q, 1) OVER d AS q1, lead(q, 2) OVER d AS q2,"
    "  lead(q, 3) OVER d AS q3 FROM qz"
    "  WINDOW d AS (PARTITION BY doc_id ORDER BY k)),"
    " sh AS (SELECT DISTINCT doc_id,"
    "  ((q0 * 256 + q1) * 256 + q2) * 256 + q3 AS shape"
    f"  FROM w WHERE i <= {MOTIF_W - MOTIF_L})"
    " SELECT CAST(shape AS BIGINT) AS shape,"
    " CAST(count(*) AS BIGINT) AS n_docs"
    " FROM sh GROUP BY shape"
    f" ORDER BY n_docs DESC, shape ASC LIMIT {CROSS_MOTIF_K}"
)


SEQ_NEARDUP_TH = 200    # max L1 distance between PAA-8 vectors
SEQ_BUCKET_CAP = 512    # buckets past this switch to the sorted-scan path
SEQ_PAIR_BUDGET = 4_000_000  # pruned-pair ceiling before a logged drop
SEQ_NEARDUP_NPARTS = 64


def q_seq_neardup_sax(sf_dir: str) -> "ray.data.Dataset":
    """Sequence near-duplicate detection at scale — the time-series analog
    of MinHash+LSH: bucket by SAX word (a shape fingerprint; identical
    words = same coarse shape), then verify candidates inside each bucket
    with the exact L1 distance between PAA-8 vectors (pairs with dist <=
    SEQ_NEARDUP_TH survive). The corpus token buffers NEVER shuffle: the
    only exchange is the ~40-byte (word, means) row per doc, coarse-
    partitioned by a word hash so one Ray group serves many buckets
    (micro-groups measured ~100x slower in the LSH dedup, dedup.py:406).

    Hot buckets stay EXACT: past SEQ_BUCKET_CAP docs the verify switches
    from the O(k^2) triu to a sorted-neighborhood scan — sort by the
    PAA-sum S and compare only pairs with |S_a - S_b| <= TH, which is
    lossless because L1(a, b) >= |S_a - S_b| (any true near-dup pair
    survives the prune). Only if even the pruned pair count exceeds
    SEQ_PAIR_BUDGET (a bucket of near-identical sums, the adversarial
    worst case) does the bucket drop, with the loud candidate-mass alert
    of ``make_partition_pairs``."""
    return seq_neardup_pairs(_seq_ds(sf_dir))


def seq_neardup_pairs(ds: "ray.data.Dataset"):
    """The SAX-bucketed near-dup over any (doc_id, tokens) Dataset — the
    library entry point q_seq_neardup_sax and the scale stress share."""
    import logging

    log = logging.getLogger("wavelet_decomposition_ray.seq_neardup")
    means_ds = ds.map_batches(
        _paa_floor_means_batch, batch_format="pyarrow", batch_size=256
    ).materialize()  # 8 ints per doc — tiny next to the token buffers
    bps = _sax_breakpoints(means_ds)
    if bps is None:
        return pa.table(
            {"doc_a": pa.array([], type=pa.string()),
             "doc_b": pa.array([], type=pa.string()),
             "dist": pa.array([], type=pa.int64())}
        )
    bp_ref = ray.put(bps)
    letters = np.array(list(SAX_ALPHABET))

    def wordize(t: pa.Table) -> pa.Table:
        from ..functions.listops import list_to_numpy

        b = ray.get(bp_ref)
        flat, off = list_to_numpy(t["means"])
        sym = letters[np.searchsorted(b, flat, side="right")]
        n = len(off) - 1
        words = ["".join(sym[off[i]:off[i + 1]]) for i in range(n)]
        # 8 ASCII letters == one uint64: the deterministic partition key
        wu = np.frombuffer(
            np.array(words, dtype="S8").tobytes(), dtype=np.uint64
        )
        return pa.table(
            {"doc_id": t["doc_id"], "sax": pa.array(words),
             "part": pa.array((wu % SEQ_NEARDUP_NPARTS).astype(np.int64)),
             "means": t["means"]}
        )

    worded = means_ds.map_batches(wordize, batch_format="pyarrow")

    def part_pairs(df):
        import pandas as pd

        outs = []
        kept_mass = dropped_mass = 0
        for word, sub in df.groupby("sax", sort=False):
            mass = len(sub) * (len(sub) - 1) // 2
            if len(sub) < 2:
                kept_mass += mass
                continue
            a = np.stack(sub["means"].to_numpy()).astype(np.int64)
            ids = sub["doc_id"].to_numpy()
            if len(sub) <= SEQ_BUCKET_CAP:
                kept_mass += mass
                i, j = np.triu_indices(len(sub), k=1)
            else:
                # sorted-neighborhood scan: sort by S = sum(means); a
                # true pair has L1 >= |S_i - S_j|, so only the window
                # with S_j <= S_i + TH can contain matches
                s = a.sum(axis=1)
                order = np.argsort(s, kind="stable")
                a, ids, s = a[order], ids[order], s[order]
                ends = np.searchsorted(s, s + SEQ_NEARDUP_TH, side="right")
                cnt = ends - np.arange(len(s)) - 1
                n_pairs = int(cnt.sum())
                if n_pairs > SEQ_PAIR_BUDGET:
                    dropped_mass += mass
                    log.warning(
                        "dropping SAX bucket %r: %d pruned pairs > budget"
                        " %d", word, n_pairs, SEQ_PAIR_BUDGET,
                    )
                    continue
                kept_mass += mass
                if n_pairs == 0:
                    continue
                i = np.repeat(np.arange(len(s), dtype=np.int64), cnt)
                j = i + _ranges(cnt) + 1
            d = np.abs(a[i] - a[j]).sum(axis=1)
            keep = d <= SEQ_NEARDUP_TH
            ia, jb = ids[i[keep]], ids[j[keep]]
            lo = np.minimum(ia, jb)   # canonical doc_a < doc_b ordering
            hi = np.maximum(ia, jb)
            outs.append(pd.DataFrame(
                {"doc_a": lo, "doc_b": hi, "dist": d[keep]}
            ))
        if dropped_mass:
            frac = dropped_mass / max(1, kept_mass + dropped_mass)
            lvl = log.error if frac > 0.10 else log.warning
            lvl("seq_neardup partition dropped %.1f%% of candidate mass",
                100 * frac)
        if not outs:
            return pd.DataFrame(
                {"doc_a": pd.Series([], dtype=object),
                 "doc_b": pd.Series([], dtype=object),
                 "dist": pd.Series([], dtype=np.int64)}
            )
        return pd.concat(outs, ignore_index=True)

    return worded.groupby("part").map_groups(
        part_pairs, batch_format="pandas"
    )


SEQ_NEARDUP_SQL = (
    f"{_paa_sql_ctes(SAX_W)},"
    " r AS (SELECT m, row_number() OVER (ORDER BY m) AS r FROM m),"
    " cnt AS (SELECT count(*) AS n FROM m),"
    " b AS (SELECT"
    "   max(CASE WHEN r.r = ((cnt.n - 1) * 1) // 4 + 1 THEN r.m END) AS b1,"
    "   max(CASE WHEN r.r = ((cnt.n - 1) * 2) // 4 + 1 THEN r.m END) AS b2,"
    "   max(CASE WHEN r.r = ((cnt.n - 1) * 3) // 4 + 1 THEN r.m END) AS b3"
    "   FROM r CROSS JOIN cnt),"
    " w AS (SELECT doc_id, string_agg("
    "   CASE WHEN m < b.b1 THEN 'a' WHEN m < b.b2 THEN 'b'"
    "        WHEN m < b.b3 THEN 'c' ELSE 'd' END, '' ORDER BY k) AS sax"
    "   FROM m CROSS JOIN b GROUP BY doc_id),"
    " pr AS (SELECT wa.doc_id AS doc_a, wb.doc_id AS doc_b,"
    "   sum(abs(ma.m - mb.m)) AS dist"
    "   FROM w wa JOIN w wb ON wa.sax = wb.sax AND wa.doc_id < wb.doc_id"
    "   JOIN m ma ON ma.doc_id = wa.doc_id"
    "   JOIN m mb ON mb.doc_id = wb.doc_id AND mb.k = ma.k"
    "   GROUP BY doc_a, doc_b)"
    " SELECT doc_a, doc_b, CAST(dist AS BIGINT) AS dist FROM pr"
    f" WHERE dist <= {SEQ_NEARDUP_TH}"
)


# --------------------------------------------------------------------------
# Equi-joins: broadcast (map-side) and co-partitioned (shuffle) hash join
# --------------------------------------------------------------------------

def q_revenue_by_nation(sf_dir: str) -> "ray.data.Dataset":
    """Broadcast equi-join: the large orders stream joined to the SMALL
    customer->nation dimension chain entirely map-side — the dimensions are
    collected once, ``ray.put`` once, and probed with sorted-key
    ``searchsorted`` lookups inside every batch (no shuffle of the fact
    table).  Revenue is carried as integer cents so the distributed sum is
    order-independent and hash-exact; the float column is one shared IEEE
    division at the end."""
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).to_pandas()
    nat = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    cust = cust.sort_values("c_custkey")
    nat = nat.sort_values("n_nationkey")
    side = ray.put(
        (
            cust["c_custkey"].to_numpy().astype(np.int64),
            cust["c_nationkey"].to_numpy().astype(np.int64),
            nat["n_nationkey"].to_numpy().astype(np.int64),
            nat["n_name"].to_numpy(),
        )
    )

    def probe(t: pa.Table) -> pa.Table:
        import pandas as pd

        ckeys, cnat, nkeys, nnames = ray.get(side)
        ok = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.rint(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        i = np.searchsorted(ckeys, ok)
        assert (i < len(ckeys)) .all() and (ckeys[i] == ok).all(), (
            "orders.o_custkey violates customer FK"
        )
        j = np.searchsorted(nkeys, cnat[i])
        g = (
            pd.DataFrame({"n_name": nnames[j], "cents": cents})
            .groupby("n_name", as_index=False)
            .agg(pn=("cents", "size"), pcents=("cents", "sum"))
        )
        g["pn"] = g["pn"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    agg = (
        ds.map_batches(probe, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(
            Sum("pn", alias_name="n_orders"),
            Sum("pcents", alias_name="revenue_cents"),
        )
    )

    def finish(df):
        df["revenue"] = (
            df["revenue_cents"].to_numpy().astype(np.float64) / 100.0
        )
        return df

    return agg.map_batches(finish, batch_format="pandas")


REVENUE_BY_NATION_SQL = (
    "WITH o AS (SELECT o_custkey,"
    " CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders)"
    " SELECT n.n_name, CAST(count(*) AS BIGINT) AS n_orders,"
    " CAST(sum(cents) AS BIGINT) AS revenue_cents,"
    " CAST(sum(cents) AS DOUBLE) / 100.0 AS revenue"
    " FROM o JOIN customer c ON o.o_custkey = c.c_custkey"
    " JOIN nation n ON c.c_nationkey = n.n_nationkey"
    " GROUP BY n.n_name"
)


def q_revenue_by_region(sf_dir: str) -> "ray.data.Dataset":
    """``revenue_by_nation`` extended one dimension hop (customer ->
    nation -> REGION): the snowflake-chain broadcast join — all three
    dimension tables are collected once, composed into a single
    custkey -> region lookup on the driver, ``ray.put`` once, and probed
    with one searchsorted inside every orders batch.  Chain composition
    on the driver is the point: N dimension hops still cost the fact
    stream exactly one probe."""
    import pandas as pd

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).to_pandas()
    nat = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
    ).to_pandas()
    reg = ray.data.read_parquet(f"{sf_dir}/region.parquet").to_pandas()
    chain = (
        cust.merge(nat, left_on="c_nationkey", right_on="n_nationkey")
        .merge(reg, left_on="n_regionkey", right_on="r_regionkey")
        .sort_values("c_custkey")
    )
    side = ray.put(
        (chain["c_custkey"].to_numpy().astype(np.int64),
         chain["r_name"].to_numpy())
    )

    def probe(t: pa.Table) -> pa.Table:
        keys, rname = ray.get(side)
        ok = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.rint(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        i = np.searchsorted(keys, ok)
        assert (i < len(keys)).all() and (keys[i] == ok).all(), (
            "orders.o_custkey violates customer FK"
        )
        g = (
            pd.DataFrame({"r_name": rname[i], "cents": cents})
            .groupby("r_name", as_index=False)
            .agg(pn=("cents", "size"), pcents=("cents", "sum"))
        )
        g["pn"] = g["pn"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    return (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
        )
        .map_batches(probe, batch_format="pyarrow")
        .groupby("r_name")
        .aggregate(
            Sum("pn", alias_name="n_orders"),
            Sum("pcents", alias_name="revenue_cents"),
        )
    )


REVENUE_BY_REGION_SQL = (
    "WITH o AS (SELECT o_custkey,"
    " CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders)"
    " SELECT r.r_name, CAST(count(*) AS BIGINT) AS n_orders,"
    " CAST(sum(cents) AS BIGINT) AS revenue_cents"
    " FROM o JOIN customer c ON o.o_custkey = c.c_custkey"
    " JOIN nation n ON c.c_nationkey = n.n_nationkey"
    " JOIN region r ON n.n_regionkey = r.r_regionkey"
    " GROUP BY r.r_name"
)


N_JOIN_PARTS = 32


def q_order_priority_revenue(sf_dir: str) -> "ray.data.Dataset":
    """Large x large shuffle hash join: lineitem joined to orders on
    orderkey with NEITHER side broadcastable.  Both sides hash-partition on
    the join key into the same coarse buckets (one tagged union dataset,
    one exchange); inside each bucket a single vectorized pandas merge +
    partial aggregate runs, and a tiny final groupby sums the partials.
    This is the co-partition fold shape (components.py) rather than
    ``Dataset.join`` — Acero's hash join crashes on empty/skewed key
    partitions in this Ray build.  Revenue is integer 10^-4 dollars:
    cents x (100 - discount%), exact on both sides."""
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )

    def tag_li(t: pa.Table) -> pa.Table:
        okey = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ep = np.rint(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        dpct = np.rint(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table(
            {
                "part": pa.array((okey % N_JOIN_PARTS).astype(np.int32)),
                "side": pa.array(np.zeros(len(okey), dtype=np.int8)),
                "okey": pa.array(okey),
                "rev_u": pa.array(ep * (100 - dpct)),
                "flag": t["l_returnflag"],
                "priority": pa.array([""] * len(okey), type=pa.string()),
            }
        )

    def tag_orders(t: pa.Table) -> pa.Table:
        okey = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "part": pa.array((okey % N_JOIN_PARTS).astype(np.int32)),
                "side": pa.array(np.ones(len(okey), dtype=np.int8)),
                "okey": pa.array(okey),
                "rev_u": pa.array(np.zeros(len(okey), dtype=np.int64)),
                "flag": pa.array([""] * len(okey), type=pa.string()),
                "priority": t["o_orderpriority"],
            }
        )

    both = li.map_batches(tag_li, batch_format="pyarrow").union(
        orders.map_batches(tag_orders, batch_format="pyarrow")
    )

    def fold(df):
        import pandas as pd

        l = df[df["side"] == 0][["okey", "rev_u", "flag"]]
        o = df[df["side"] == 1][["okey", "priority"]]
        if not len(l) or not len(o):
            return pd.DataFrame(
                {"priority": pd.Series([], dtype=object),
                 "flag": pd.Series([], dtype=object),
                 "pn": pd.Series([], dtype=np.int64),
                 "prev": pd.Series([], dtype=np.int64)}
            )
        m = l.merge(o, on="okey", how="inner")
        g = m.groupby(["priority", "flag"], as_index=False).agg(
            pn=("rev_u", "size"), prev=("rev_u", "sum")
        )
        g["pn"] = g["pn"].astype(np.int64)
        return g

    from ray.data.aggregate import Sum

    return (
        both.groupby("part")
        .map_groups(fold, batch_format="pandas")
        .groupby(["priority", "flag"])
        .aggregate(
            Sum("pn", alias_name="n_items"), Sum("prev", alias_name="revenue_u")
        )
    )


Q3_SEGMENT = "BUILDING"
Q3_CUTOFF = "1998-06-01"


def q_top_orders_q3(sf_dir: str):
    """TPC-H Q3 analog — the three-table pipeline (customer |> orders |>
    lineitem) with date-window filters and a top-K by revenue:

    * **prune at the read**: both fact scans push their date predicate and
      column list into ``read_parquet`` (row-group pruning, only 3-4
      columns leave storage);
    * **broadcast the selective dimension**: BUILDING-segment custkeys are
      a small sorted array, ``ray.put`` once, probed by ``searchsorted``
      inside every orders batch — no customer join shuffle;
    * **co-partition the large join**: filtered orders and lineitem meet in
      ONE tagged-union exchange on ``okey % N_JOIN_PARTS`` (the
      ``order_priority_revenue`` shape); each order's group lives wholly in
      one partition, so the per-order revenue aggregate AND a partition-
      local top-10 are exact, and only <= 10 rows per partition reach the
      driver's final top-10.

    Revenue is integer 10^-4 dollars (cents x (100 - discount%)) so the
    sum is order-independent and hash-exact; dates travel as '%Y-%m-%d'
    strings on both engine and oracle sides."""
    import pandas as pd
    import pyarrow.compute as _pc

    cutoff = np.datetime64(Q3_CUTOFF)
    bld = (
        ray.data.read_parquet(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_mktsegment"],
            filter=_pc.field("c_mktsegment") == Q3_SEGMENT,
        )
        .to_pandas()["c_custkey"]
        .to_numpy()
        .astype(np.int64)
    )
    bld.sort()
    bld_ref = ray.put(bld)

    def tag_orders(t: pa.Table) -> pa.Table:
        keys = ray.get(bld_ref)
        ck = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        i = np.searchsorted(keys, ck)
        i[i >= len(keys)] = 0
        sel = keys[i] == ck if len(keys) else np.zeros(len(ck), dtype=bool)
        okey = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )[sel]
        od = (
            t["o_orderdate"]
            .to_numpy(zero_copy_only=False)[sel]
            .astype("datetime64[D]")
            .astype(str)
        )
        return pa.table(
            {
                "part": pa.array((okey % N_JOIN_PARTS).astype(np.int32)),
                "side": pa.array(np.ones(len(okey), dtype=np.int8)),
                "okey": pa.array(okey),
                "rev_u": pa.array(np.zeros(len(okey), dtype=np.int64)),
                "odate": pa.array(od, type=pa.string()),
            }
        )

    def tag_li(t: pa.Table) -> pa.Table:
        okey = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ep = np.rint(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        dpct = np.rint(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table(
            {
                "part": pa.array((okey % N_JOIN_PARTS).astype(np.int32)),
                "side": pa.array(np.zeros(len(okey), dtype=np.int8)),
                "okey": pa.array(okey),
                "rev_u": pa.array(ep * (100 - dpct)),
                "odate": pa.array([""] * len(okey), type=pa.string()),
            }
        )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=_pc.field("o_orderdate") < cutoff.astype("datetime64[us]"),
    ).map_batches(tag_orders, batch_format="pyarrow")
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=_pc.field("l_shipdate") > cutoff.astype("datetime64[us]"),
    ).map_batches(tag_li, batch_format="pyarrow")

    def fold(df):
        l = df[df["side"] == 0][["okey", "rev_u"]]
        o = df[df["side"] == 1][["okey", "odate"]]
        if not len(l) or not len(o):
            return pd.DataFrame(
                {"l_orderkey": pd.Series([], dtype=np.int64),
                 "odate": pd.Series([], dtype=object),
                 "n_items": pd.Series([], dtype=np.int64),
                 "revenue_u": pd.Series([], dtype=np.int64)}
            )
        m = l.merge(o, on="okey", how="inner")
        g = m.groupby(["okey", "odate"], as_index=False).agg(
            n_items=("rev_u", "size"), revenue_u=("rev_u", "sum")
        )
        g["n_items"] = g["n_items"].astype(np.int64)
        g = g.rename(columns={"okey": "l_orderkey"})
        return g.sort_values(
            ["revenue_u", "l_orderkey"], ascending=[False, True]
        ).head(10)

    tops = (
        li.union(orders)
        .groupby("part")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    return (
        tops.sort_values(["revenue_u", "l_orderkey"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )


TOP_ORDERS_Q3_SQL = (
    "WITH l AS (SELECT l_orderkey AS okey,"
    " CAST(round(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_u"
    f" FROM lineitem WHERE l_shipdate > TIMESTAMP '{Q3_CUTOFF}'),"
    " o AS (SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS odate"
    " FROM orders JOIN customer ON c_custkey = o_custkey"
    f" WHERE c_mktsegment = '{Q3_SEGMENT}'"
    f"  AND o_orderdate < TIMESTAMP '{Q3_CUTOFF}')"
    " SELECT okey AS l_orderkey, odate,"
    " CAST(count(*) AS BIGINT) AS n_items,"
    " CAST(sum(rev_u) AS BIGINT) AS revenue_u"
    " FROM l JOIN o ON o.o_orderkey = l.okey"
    " GROUP BY okey, odate"
    " ORDER BY revenue_u DESC, l_orderkey LIMIT 10"
)


Q9_PART_WORD = "red"


def q_profit_by_nation_year(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q9 analog — the four-table pipeline (part |> supplier+nation
    |> lineitem |> orders) with a selective dimension filter and a
    two-key rollup: revenue of '%red%' parts per supplier nation per
    order year.

    Join planning by side size: the filtered part keys (a sorted int
    array) and the supplier->nation map BROADCAST once and are probed
    map-side inside the lineitem scan (two searchsorteds — no dimension
    shuffle); lineitem x orders is the genuine large x large edge and
    takes ONE tagged-union co-partition exchange on okey (the Q3 shape)
    with the nation string riding the fact rows.  Revenue is integer
    1e-4 dollars; years come from the same epoch arithmetic on both
    sides."""
    import pandas as pd

    pdf = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"]
    ).to_pandas()
    red = (
        pdf.loc[pdf["p_name"].str.contains(Q9_PART_WORD), "p_partkey"]
        .to_numpy()
        .astype(np.int64)
    )
    red.sort()
    sup = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).to_pandas().sort_values("s_suppkey")
    nat = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas().sort_values("n_nationkey")
    side = ray.put(
        (red,
         sup["s_suppkey"].to_numpy().astype(np.int64),
         sup["s_nationkey"].to_numpy().astype(np.int64),
         nat["n_nationkey"].to_numpy().astype(np.int64),
         nat["n_name"].to_numpy())
    )

    def tag_li(t: pa.Table) -> pa.Table:
        redk, sk, snat, nk, nname = ray.get(side)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        i = np.minimum(np.searchsorted(redk, pk), max(len(redk) - 1, 0))
        sel = (redk[i] == pk) if len(redk) else np.zeros(len(pk), bool)
        okey = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )[sel]
        suk = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )[sel]
        ep = np.rint(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)[sel] * 100
        ).astype(np.int64)
        dp = np.rint(
            t["l_discount"].to_numpy(zero_copy_only=False)[sel] * 100
        ).astype(np.int64)
        j = np.searchsorted(sk, suk)
        assert len(sk) and (sk[np.minimum(j, len(sk) - 1)] == suk).all(), (
            "lineitem.l_suppkey violates supplier FK"
        )
        nidx = np.searchsorted(nk, snat[j])
        return pa.table(
            {
                "part": pa.array((okey % N_JOIN_PARTS).astype(np.int32)),
                "side": pa.array(np.zeros(len(okey), np.int8)),
                "okey": pa.array(okey),
                "rev_u": pa.array(ep * (100 - dp)),
                "nation": pa.array(nname[nidx], type=pa.string()),
                "o_year": pa.array(np.zeros(len(okey), np.int64)),
            }
        )

    def tag_orders(t: pa.Table) -> pa.Table:
        okey = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        yr = (
            t["o_orderdate"].to_numpy(zero_copy_only=False)
            .astype("datetime64[Y]").astype(np.int64) + 1970
        )
        return pa.table(
            {
                "part": pa.array((okey % N_JOIN_PARTS).astype(np.int32)),
                "side": pa.array(np.ones(len(okey), np.int8)),
                "okey": pa.array(okey),
                "rev_u": pa.array(np.zeros(len(okey), np.int64)),
                "nation": pa.array([""] * len(okey), type=pa.string()),
                "o_year": pa.array(yr),
            }
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount"],
    ).map_batches(tag_li, batch_format="pyarrow")
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    ).map_batches(tag_orders, batch_format="pyarrow")

    def fold(df):
        l = df[df["side"] == 0][["okey", "rev_u", "nation"]]
        o = df[df["side"] == 1][["okey", "o_year"]]
        if not len(l) or not len(o):
            return pd.DataFrame(
                {"nation": pd.Series([], dtype=object),
                 "o_year": pd.Series([], dtype=np.int64),
                 "pn": pd.Series([], dtype=np.int64),
                 "prev": pd.Series([], dtype=np.int64)}
            )
        m = l.merge(o, on="okey", how="inner")
        g = m.groupby(["nation", "o_year"], as_index=False).agg(
            pn=("rev_u", "size"), prev=("rev_u", "sum")
        )
        g["pn"] = g["pn"].astype(np.int64)
        return g

    from ray.data.aggregate import Sum

    return (
        li.union(orders)
        .groupby("part")
        .map_groups(fold, batch_format="pandas")
        .groupby(["nation", "o_year"])
        .aggregate(
            Sum("pn", alias_name="n_items"),
            Sum("prev", alias_name="revenue_u"),
        )
    )


PROFIT_Q9_SQL = (
    "SELECT n.n_name AS nation,"
    " CAST(date_part('year', o.o_orderdate) AS BIGINT) AS o_year,"
    " CAST(count(*) AS BIGINT) AS n_items,"
    " CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)"
    "  * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT)"
    "  AS revenue_u"
    " FROM lineitem l"
    " JOIN part p ON p.p_partkey = l.l_partkey"
    " JOIN supplier s ON s.s_suppkey = l.l_suppkey"
    " JOIN nation n ON n.n_nationkey = s.s_nationkey"
    " JOIN orders o ON o.o_orderkey = l.l_orderkey"
    f" WHERE p.p_name LIKE '%{Q9_PART_WORD}%'"
    " GROUP BY nation, o_year"
)


def q_orders_no_lineitem(sf_dir: str) -> "ray.data.Dataset":
    """ANTI-join: orders with no lineitem rows (the referential-integrity
    audit).  The fact side collapses to its DISTINCT join keys first —
    per-batch unique then one key-only groupby, fixed-width rows — and the
    distinct-key set broadcasts once; the orders stream filters NOT-member
    with a searchsorted per batch.  At 10^12 facts the broadcast becomes a
    Bloom filter (``bloom_prescreen``'s structure) plus an exact recheck
    of the survivors — same shape, probabilistic first pass."""
    from ray.data.aggregate import Max

    keys = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"]
        )
        .map_batches(
            lambda t: pa.table(
                {"k": np.unique(
                    t["l_orderkey"].to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                ),
                 "one": np.ones(
                     len(np.unique(t["l_orderkey"])), dtype=np.int8
                 )}
            ),
            batch_format="pyarrow",
        )
        .groupby("k")
        .aggregate(Max("one", alias_name="one"))
        .to_pandas()["k"]
        .to_numpy()
    )
    keys.sort()
    keys_ref = ray.put(keys)

    def anti(t: pa.Table) -> pa.Table:
        k = ray.get(keys_ref)
        ok = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(k):
            i = np.minimum(np.searchsorted(k, ok), len(k) - 1)
            member = k[i] == ok
        else:
            member = np.zeros(len(ok), dtype=bool)
        return pa.table(
            {"o_orderkey": pa.array(ok[~member]),
             "o_orderpriority": t["o_orderpriority"].filter(
                 pa.array(~member))}
        )

    return ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    ).map_batches(anti, batch_format="pyarrow")


ORDERS_NO_LINEITEM_SQL = (
    "SELECT o_orderkey, o_orderpriority FROM orders o"
    " WHERE NOT EXISTS (SELECT 1 FROM lineitem l"
    "  WHERE l.l_orderkey = o.o_orderkey)"
)


SKEW_SAMPLE_EVERY = 64     # sample 1/64 of fact rows for hot-key detection
SKEW_HOT_SAMPLED = 200     # sampled-count threshold -> treat key as hot


def q_order_priority_skewjoin(sf_dir: str) -> "ray.data.Dataset":
    """The skew-aware variant of ``order_priority_revenue`` — same join,
    same answer, different routing: a cheap sampled pre-pass finds HOT
    join keys (a viral order at 100 TB would melt its co-partition), the
    small side's hot rows are fetched with a pushed-down filter and
    broadcast, and the fact stream splits per batch — hot rows join
    map-side against the broadcast dict (no shuffle), cold rows take the
    tagged-union co-partition path.  Hot-key detection only affects
    ROUTING, never the answer, so sampling nondeterminism is harmless and
    the oracle is the plain join's SQL.  With no real skew the hot set is
    empty and this degrades to the plain co-partition join."""
    import pandas as pd

    li_path = f"{sf_dir}/lineitem.parquet"

    # --- sampled hot-key detection (1/SAMPLE_EVERY of rows, local counts
    # summed on the driver over a key-sized frame) ---
    def sample_counts(t: pa.Table) -> pa.Table:
        okey = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )[::SKEW_SAMPLE_EVERY]
        u, c = np.unique(okey, return_counts=True)
        return pa.table({"okey": u, "c": c.astype(np.int64)})

    from ray.data.aggregate import Sum

    sampled = (
        ray.data.read_parquet(li_path, columns=["l_orderkey"])
        .map_batches(sample_counts, batch_format="pyarrow")
        .groupby("okey")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    hot = np.sort(
        sampled.loc[sampled["c"] >= SKEW_HOT_SAMPLED, "okey"]
        .to_numpy().astype(np.int64)
    )

    # --- broadcast the small side's hot rows (pushed-down filter) ---
    if len(hot):
        hot_orders = (
            ray.data.read_parquet(
                f"{sf_dir}/orders.parquet",
                columns=["o_orderkey", "o_orderpriority"],
                filter=pc.field("o_orderkey").isin([int(k) for k in hot]),
            )
            .to_pandas()
            .sort_values("o_orderkey")
        )
        hot_keys = hot_orders["o_orderkey"].to_numpy().astype(np.int64)
        hot_prio = hot_orders["o_orderpriority"].to_numpy()
    else:
        hot_keys = np.array([], dtype=np.int64)
        hot_prio = np.array([], dtype=object)
    hot_ref = ray.put((hot_keys, hot_prio))

    def li_split(t: pa.Table) -> pa.Table:
        """Hot rows -> map-side partial aggregates (side=2, pre-joined);
        cold rows -> tagged union (side=0) for the co-partition fold."""
        keys, prio = ray.get(hot_ref)
        okey = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        ep = np.rint(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        dpct = np.rint(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        rev = ep * (100 - dpct)
        flag = t["l_returnflag"].to_numpy(zero_copy_only=False)
        if len(keys):
            i = np.minimum(np.searchsorted(keys, okey), len(keys) - 1)
            is_hot = keys[i] == okey
        else:
            is_hot = np.zeros(len(okey), dtype=bool)
        parts = []
        if is_hot.any():
            g = (
                pd.DataFrame(
                    {"priority": prio[i[is_hot]], "flag": flag[is_hot],
                     "rev_u": rev[is_hot]}
                )
                .groupby(["priority", "flag"], as_index=False)
                .agg(pn=("rev_u", "size"), prev=("rev_u", "sum"))
            )
            parts.append(pa.table(
                {"part": pa.array(np.full(len(g), -1, np.int32)),
                 "side": pa.array(np.full(len(g), 2, np.int8)),
                 "okey": pa.array(np.zeros(len(g), np.int64)),
                 "rev_u": pa.array(g["prev"].to_numpy().astype(np.int64)),
                 "pn": pa.array(g["pn"].to_numpy().astype(np.int64)),
                 "flag": pa.array(g["flag"].to_numpy(), type=pa.string()),
                 "priority": pa.array(g["priority"].to_numpy(),
                                      type=pa.string())}
            ))
        cold = ~is_hot
        parts.append(pa.table(
            {"part": pa.array((okey[cold] % N_JOIN_PARTS).astype(np.int32)),
             "side": pa.array(np.zeros(int(cold.sum()), np.int8)),
             "okey": pa.array(okey[cold]),
             "rev_u": pa.array(rev[cold]),
             "pn": pa.array(np.ones(int(cold.sum()), np.int64)),
             "flag": pa.array(flag[cold], type=pa.string()),
             "priority": pa.array([""] * int(cold.sum()), type=pa.string())}
        ))
        return pa.concat_tables(parts)

    def tag_orders(t: pa.Table) -> pa.Table:
        okey = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"part": pa.array((okey % N_JOIN_PARTS).astype(np.int32)),
             "side": pa.array(np.ones(len(okey), np.int8)),
             "okey": pa.array(okey),
             "rev_u": pa.array(np.zeros(len(okey), np.int64)),
             "pn": pa.array(np.zeros(len(okey), np.int64)),
             "flag": pa.array([""] * len(okey), type=pa.string()),
             "priority": t["o_orderpriority"]}
        )

    li = ray.data.read_parquet(
        li_path,
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_returnflag"],
    ).map_batches(li_split, batch_format="pyarrow")
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    ).map_batches(tag_orders, batch_format="pyarrow")

    def fold(df):
        pre = df[df["side"] == 2][["priority", "flag", "pn", "rev_u"]]
        pre = pre.rename(columns={"rev_u": "prev"})
        l = df[df["side"] == 0][["okey", "rev_u", "flag"]]
        o = df[df["side"] == 1][["okey", "priority"]]
        outs = [pre]
        if len(l) and len(o):
            m = l.merge(o, on="okey", how="inner")
            g = m.groupby(["priority", "flag"], as_index=False).agg(
                pn=("rev_u", "size"), prev=("rev_u", "sum")
            )
            g["pn"] = g["pn"].astype(np.int64)
            outs.append(g)
        out = pd.concat(outs, ignore_index=True)
        if not len(out):
            return pd.DataFrame(
                {"priority": pd.Series([], dtype=object),
                 "flag": pd.Series([], dtype=object),
                 "pn": pd.Series([], dtype=np.int64),
                 "prev": pd.Series([], dtype=np.int64)}
            )
        return out[["priority", "flag", "pn", "prev"]]

    from ray.data.aggregate import Sum as _Sum

    return (
        li.union(orders)
        .groupby("part")
        .map_groups(fold, batch_format="pandas")
        .groupby(["priority", "flag"])
        .aggregate(
            _Sum("pn", alias_name="n_items"),
            _Sum("prev", alias_name="revenue_u"),
        )
    )


ORDER_PRIORITY_REVENUE_SQL = (
    "WITH l AS (SELECT l_orderkey AS okey, l_returnflag AS flag,"
    " CAST(round(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_u"
    " FROM lineitem)"
    " SELECT o.o_orderpriority AS priority, l.flag,"
    " CAST(count(*) AS BIGINT) AS n_items,"
    " CAST(sum(l.rev_u) AS BIGINT) AS revenue_u"
    " FROM l JOIN orders o ON l.okey = o.o_orderkey"
    " GROUP BY priority, flag"
)


# --------------------------------------------------------------------------
# Continuous-aggregate refresh lifecycle
# --------------------------------------------------------------------------

def q_store_refresh(sf_dir: str) -> "ray.data.Dataset":
    """Incremental-ingest lifecycle of the retention store: build the store
    from a deterministic ~60% subset of the corpus, then present the FULL
    corpus and ``refresh=True`` — the doc_id-fingerprint pre-pass detects
    which buckets gained docs, only those re-run, and the refreshed store
    must answer per-(source, tier) stats identical to a from-scratch build
    (same oracle as ``source_stats``).  This is the continuous-aggregate
    contract: appends converge the store without a full rebuild."""
    import os
    import shutil

    from ..functions.dedup import _stable_u64
    from ..stages.encode import decode_blocks_batch

    seq = synth.ensure_sequences(sf_dir)
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    base = f"/tmp/graft_refresh/{sf_name}"
    subset_dir = os.path.join(base, "subset")
    store = os.path.join(base, "store")
    # rebuild from clean state each call: the whole lifecycle IS the query
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(subset_dir, exist_ok=True)

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    tbl = pads.dataset(seq).to_table()
    ids = tbl["doc_id"].to_pylist()
    keep = pa.array(
        [_stable_u64(f"refresh:{i}") % 10 < 6 for i in ids], type=pa.bool_()
    )
    pq.write_table(tbl.filter(keep), os.path.join(subset_dir, "part-0.parquet"))

    rp.run_rollup_job(subset_dir, store, bank="haar", n_tiers=10,
                      resume=True, verify=False, batch_size=256,
                      encoder_concurrency=(1, 4))
    summary = rp.run_rollup_job(seq, store, bank="haar", n_tiers=10,
                                resume=True, refresh=True, verify=False,
                                batch_size=256, encoder_concurrency=(1, 4))
    assert summary["buckets_refreshed"] > 0, (
        "refresh detected no changed buckets after an append"
    )

    decoded = ray.data.read_parquet(os.path.join(store, "data")).map_batches(
        decode_blocks_batch, batch_format="pyarrow", batch_size=2048
    )
    agg = rp.source_tier_aggregate(decoded)
    return agg.map_batches(
        lambda t: t.set_column(
            t.column_names.index("tier"), "tier", pc.cast(t["tier"], pa.int8())
        ),
        batch_format="pyarrow",
    )


# --------------------------------------------------------------------------
# Sequence packing: shard-local concat + fixed-length chunking
# --------------------------------------------------------------------------

PACK_CHUNK = 512
PACK_PARTS = 16  # shards; sized to the cluster like N_EVENT_PARTS


def q_corpus_pack512(sf_dir: str) -> "ray.data.Dataset":
    """Pretraining-style sequence packing: docs are sharded by a stable
    hash of doc_id, each shard's docs are concatenated in doc_id order into
    one token stream, and the stream is cut into fixed 512-token chunks
    (the pack-then-chunk layout most LLM pretraining loaders use).  Emits
    per-(shard, chunk) token count and sum — BIGINT-exact for the oracle.

    Packing is deliberately SHARD-LOCAL: each shard's stream is independent,
    so no global prefix scan or cross-partition carry exists, and shards
    scale with the cluster.  Inside a shard the chunk boundaries are one
    cumsum + ``reduceat`` over the concatenated values buffer."""
    from ..functions.dedup import _stable_u64

    ds = _seq_ds(sf_dir)

    def addpart(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        part = np.array(
            [_stable_u64(f"pack:{i}") % PACK_PARTS for i in ids],
            dtype=np.int64,
        )
        return pa.table(
            {"doc_id": t["doc_id"], "tokens": t["tokens"],
             "part": pa.array(part, type=pa.int64())}
        )

    def fold(df):
        import pandas as pd

        df = df.sort_values("doc_id", kind="mergesort")
        arrs = list(df["tokens"].to_numpy())
        if not arrs:
            return pd.DataFrame(
                {c: np.array([], dtype=np.int64)
                 for c in ("part", "chunk_idx", "n", "s")}
            )
        flat = np.concatenate(arrs).astype(np.int64)
        total = len(flat)
        cuts = np.arange(0, total, PACK_CHUNK)
        return pd.DataFrame(
            {
                "part": np.full(len(cuts), df["part"].iloc[0], dtype=np.int64),
                "chunk_idx": cuts // PACK_CHUNK,
                "n": np.minimum(PACK_CHUNK, total - cuts),
                "s": np.add.reduceat(flat, cuts),
            }
        )

    return (
        ds.map_batches(addpart, batch_format="pyarrow", batch_size=256)
        .groupby("part")
        .map_groups(fold, batch_format="pandas")
    )


def _pack_sql() -> str:
    from .data_queries import _md5_u64_sql

    return (
        f"WITH d AS (SELECT doc_id, tokens FROM read_parquet('{SYNTH_GLOB_001}')),"
        " h AS (SELECT doc_id, tokens,"
        "  md5('pack:' || doc_id) AS h FROM d),"
        f" p AS (SELECT doc_id, tokens, CAST({_md5_u64_sql('h')} %"
        f" {PACK_PARTS} AS BIGINT) AS part FROM h),"
        " o AS (SELECT part, doc_id, tokens,"
        "  COALESCE(sum(len(tokens)) OVER (PARTITION BY part ORDER BY doc_id"
        "   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS base"
        "  FROM p),"
        " f AS (SELECT part,"
        # base is a HUGEINT window sum: cast the chunk id back to BIGINT
        f"  CAST((base + generate_subscripts(tokens, 1) - 1) // {PACK_CHUNK}"
        "   AS BIGINT) AS chunk_idx, unnest(tokens) AS tok FROM o)"
        " SELECT part, chunk_idx, CAST(count(*) AS BIGINT) AS n,"
        " CAST(sum(tok) AS BIGINT) AS s FROM f GROUP BY part, chunk_idx"
    )


PACK_SQL = _pack_sql()


# --------------------------------------------------------------------------
# Token-distribution statistics and codec-sizing audits
# --------------------------------------------------------------------------

TOKEN_BITS = 20  # synth quantizes tokens to < 2^20 (synth.MAX_TOKEN)


def q_token_mode(sf_dir: str) -> "ray.data.Dataset":
    """Per-doc token-distribution summary: distinct-value count plus the
    modal token (most frequent value; ties -> smallest token) and its
    count — the repetitiveness signal a quality filter reads before
    dropping degenerate sequences (the sequence analog of documents'
    ``repetition_2gram``). One pass per batch: (seg << 20 | tok) packs
    doc index and token into one int64 key, ``np.unique`` gives sorted
    per-(doc, token) counts, and three reduceat passes extract distinct
    counts, the max count, and the tie-broken argmax — no per-doc loop,
    no shuffle (row = sequence)."""
    ds = _seq_ds(sf_dir)

    def stats(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        n_docs = len(off) - 1
        if n_docs == 0 or len(v) == 0:
            return pa.table(
                {"doc_id": pa.array([], type=pa.string()),
                 "n_distinct": pa.array([], type=pa.int64()),
                 "mode_tok": pa.array([], type=pa.int64()),
                 "mode_count": pa.array([], type=pa.int64())}
            )
        if int(v.max()) >= (1 << TOKEN_BITS) or int(v.min()) < 0:
            raise ValueError(
                "token_mode packs (doc, token) into one int64 key; tokens "
                f"must be in [0, 2^{TOKEN_BITS})"
            )
        n = np.diff(off)
        assert (n > 0).all(), "token_mode requires non-empty docs"
        seg = np.repeat(np.arange(n_docs, dtype=np.int64), n)
        key = (seg << TOKEN_BITS) | v
        uk, cnt = np.unique(key, return_counts=True)
        useg = uk >> TOKEN_BITS
        utok = uk & ((1 << TOKEN_BITS) - 1)
        starts = np.flatnonzero(np.r_[True, np.diff(useg) != 0])
        n_distinct = np.diff(np.r_[starts, len(uk)])
        mc = np.maximum.reduceat(cnt, starts)
        # tie -> smallest token: uk is sorted (doc, tok), so the FIRST
        # index in each doc group hitting the max count wins
        is_max = cnt == np.repeat(mc, n_distinct)
        idx = np.where(is_max, np.arange(len(uk)), len(uk))
        first = np.minimum.reduceat(idx, starts)
        return pa.table(
            {"doc_id": t["doc_id"],
             "n_distinct": pa.array(n_distinct.astype(np.int64)),
             "mode_tok": pa.array(utok[first]),
             "mode_count": pa.array(mc.astype(np.int64))}
        )

    return ds.map_batches(stats, batch_format="pyarrow", batch_size=256)


TOKEN_MODE_SQL = (
    f"{_FLAT_CTE},"
    " g AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c"
    "  FROM flat GROUP BY doc_id, tok),"
    " m AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_distinct,"
    "  max(c) AS mc FROM g GROUP BY doc_id)"
    " SELECT m.doc_id, m.n_distinct,"
    " CAST(min(g.tok) AS BIGINT) AS mode_tok, m.mc AS mode_count"
    " FROM m JOIN g ON g.doc_id = m.doc_id AND g.c = m.mc"
    " GROUP BY m.doc_id, m.n_distinct, m.mc"
)


def q_token_familiarity(sf_dir: str) -> "ray.data.Dataset":
    """Unigram-LM corpus scoring (the integer-exact core of perplexity
    filtering): pass 1 builds the GLOBAL token histogram — per-batch
    bincount partials, one distinct-value-sized groupby (vocab <= 2^20
    rows, never the corpus) — which lands on the driver as one 8 MiB
    int64 array and is broadcast once via ``ray.put``; pass 2 streams the
    corpus again and emits, per doc, n and the sum of each occurrence's
    global frequency (``s_freq``). High mean frequency = boilerplate-like
    token stream, low = rare/novel — the familiarity axis an LLM data
    pipeline scores before mixing. All integer: s_freq <= n_tok * total
    tokens, guarded against int64 wrap before scoring."""
    ds = _seq_ds(sf_dir)
    vocab = 1 << TOKEN_BITS

    def hist_partial(t: pa.Table) -> pa.Table:
        vals, _ = list_to_numpy(t["tokens"])
        if len(vals) == 0:
            return pa.table({"tok": pa.array([], type=pa.int64()),
                             "c": pa.array([], type=pa.int64())})
        c = np.bincount(vals, minlength=vocab)
        nz = np.flatnonzero(c)
        return pa.table({"tok": pa.array(nz.astype(np.int64)),
                         "c": pa.array(c[nz].astype(np.int64))})

    hist = (
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("tok").sum("c").to_pandas()  # vocab-sized, bounded 2^20
    )
    freq = np.zeros(vocab, dtype=np.int64)
    freq[hist["tok"].to_numpy()] = hist["sum(c)"].to_numpy()
    max_len = 1 << 16  # synth's longest sequence (65536 tokens)
    if int(freq.max(initial=0)) > (2**63 - 1) // max_len:
        raise ValueError(
            "token_familiarity: global token frequency too large — a "
            "per-doc s_freq sum could wrap int64; shard the histogram"
        )
    ref = ray.put(freq)

    def score(t: pa.Table) -> pa.Table:
        f = ray.get(ref)  # zero-copy view from the object store
        vals, off = list_to_numpy(t["tokens"])
        if len(off) <= 1 or len(vals) == 0:
            return pa.table(
                {"doc_id": pa.array([], type=pa.string()),
                 "n": pa.array([], type=pa.int64()),
                 "s_freq": pa.array([], type=pa.int64())}
            )
        n = np.diff(off)
        s = np.add.reduceat(f[vals], off[:-1])
        return pa.table(
            {"doc_id": t["doc_id"], "n": pa.array(n.astype(np.int64)),
             "s_freq": pa.array(s)}
        )

    return ds.map_batches(score, batch_format="pyarrow", batch_size=256)


TOKEN_FAMILIARITY_SQL = (
    f"{_FLAT_CTE},"
    " g AS (SELECT tok, CAST(count(*) AS BIGINT) AS c"
    "  FROM flat GROUP BY tok)"
    " SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n,"
    " CAST(sum(g.c) AS BIGINT) AS s_freq"
    " FROM flat f JOIN g USING (tok) GROUP BY f.doc_id"
)


def q_rle_runs(sf_dir: str) -> "ray.data.Dataset":
    """Run-length-encoding audit: per doc, the count of equal-value runs
    (n / n_runs = the compression ratio an RLE retention codec would
    achieve — the sizing signal read before choosing RLE vs Gorilla for a
    tier, Gorilla paper §4.1's 'many series are constant' case). One
    global diff over the batch's flat buffer; cross-doc boundary
    positions are forced to count as run starts, so n_runs is one
    reduceat away — no per-doc loop, no shuffle."""
    ds = _seq_ds(sf_dir)

    def stats(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        n_docs = len(off) - 1
        if n_docs == 0 or len(v) == 0:
            return pa.table(
                {"doc_id": pa.array([], type=pa.string()),
                 "n": pa.array([], type=pa.int64()),
                 "n_runs": pa.array([], type=pa.int64())}
            )
        n = np.diff(off)
        assert (n > 0).all(), "rle_runs requires non-empty docs"
        start = np.ones(len(v), dtype=np.int64)
        start[1:] = (v[1:] != v[:-1]).astype(np.int64)
        start[off[:-1]] = 1  # every doc's first token starts a run
        n_runs = np.add.reduceat(start, off[:-1])
        return pa.table(
            {"doc_id": t["doc_id"], "n": pa.array(n.astype(np.int64)),
             "n_runs": pa.array(n_runs)}
        )

    return ds.map_batches(stats, batch_format="pyarrow", batch_size=256)


RLE_RUNS_SQL = (
    f"{_FLAT_CTE},"
    " l AS (SELECT doc_id, tok,"
    "  lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS prev FROM flat)"
    " SELECT doc_id, CAST(count(*) AS BIGINT) AS n,"
    " CAST(sum(CASE WHEN prev IS NULL OR tok != prev THEN 1 ELSE 0 END)"
    "  AS BIGINT) AS n_runs"
    " FROM l GROUP BY doc_id"
)


# Gorilla-style delta-of-delta bit-width classes (Pelkonen 2015 §4.1.1's
# timestamp buckets, applied to token values): 0 bits for dod == 0, then
# [-63, 64] / [-255, 256] / [-2047, 2048] / everything else.
DOD_BOUNDS = ((-63, 64), (-255, 256), (-2047, 2048))


def q_dod_width_hist(sf_dir: str) -> "ray.data.Dataset":
    """Codec-sizing audit: the corpus-wide histogram of delta-of-delta
    bit-width classes per source — what fraction of a source's points
    would encode in 0 / 7 / 9 / 12 / 32+ bits under the Gorilla DoD
    scheme the tier encoder uses (stages/encode.py). Per batch: one
    second-difference over the flat buffer, doc-boundary positions
    masked, one keyed bincount over (source, class); the only exchange
    is the <= sources x 5-row partial groupby."""
    ds = _seq_ds(sf_dir)
    n_cls = len(DOD_BOUNDS) + 2

    def partial(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        n_docs = len(off) - 1
        src = t["source"].to_pylist()
        if n_docs == 0 or len(v) < 3:
            return pa.table(
                {"source": pa.array([], type=pa.string()),
                 "width_class": pa.array([], type=pa.int64()),
                 "c": pa.array([], type=pa.int64())}
            )
        n = np.diff(off)
        seg = np.repeat(np.arange(n_docs, dtype=np.int64), n)
        dd = np.diff(v, n=2)
        valid = seg[: len(dd)] == seg[2:]  # v[i] and v[i+2] in one doc
        cls = np.full(len(dd), n_cls - 1, dtype=np.int64)
        for k, (lo, hi) in enumerate(reversed(DOD_BOUNDS)):
            cls[(dd >= lo) & (dd <= hi)] = len(DOD_BOUNDS) - k
        cls[dd == 0] = 0
        # per-source class counts: unique sources per batch are <= 9
        usrc, sidx = np.unique(np.asarray(src, dtype=object),
                               return_inverse=True)
        key = sidx.astype(np.int64)[seg[: len(dd)]] * n_cls + cls
        cnt = np.bincount(key[valid], minlength=len(usrc) * n_cls)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {"source": pa.array(usrc[nz // n_cls].astype(object),
                                type=pa.string()),
             "width_class": pa.array((nz % n_cls).astype(np.int64)),
             "c": pa.array(cnt[nz].astype(np.int64))}
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "width_class"]).sum("c")
    )
    return agg.map_batches(
        lambda t: t.rename_columns(["source", "width_class", "c"]),
        batch_format="pyarrow",
    )


def _dod_sql() -> str:
    cases = " ".join(
        f"WHEN dod >= {lo} AND dod <= {hi} THEN {i + 1}"
        for i, (lo, hi) in enumerate(DOD_BOUNDS)
    )
    return (
        f"{_FLAT_CTE},"
        " l AS (SELECT source, doc_id, tok,"
        "  lag(tok) OVER w AS p1, lag(tok, 2) OVER w AS p2 FROM flat"
        "  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),"
        " d AS (SELECT source, tok - 2 * p1 + p2 AS dod FROM l"
        "  WHERE p2 IS NOT NULL)"
        " SELECT source,"
        f" CAST(CASE WHEN dod = 0 THEN 0 {cases}"
        f"  ELSE {len(DOD_BOUNDS) + 1} END AS BIGINT) AS width_class,"
        " CAST(count(*) AS BIGINT) AS c"
        " FROM d GROUP BY source, width_class"
    )


DOD_WIDTH_SQL = _dod_sql()


SPARSITY_TAU = 16  # signal-domain flatness tolerance (token units)


def q_haar_sparsity(sf_dir: str) -> "ray.data.Dataset":
    """Wavelet-codec sizing audit (the Haar-domain complement of
    ``dod_width_hist``): per (doc, level), how many unnormalized detail
    coefficients are 'flat' — |d| <= TAU * 2^level, i.e. the two child
    block SUMS differ by at most TAU per sample — and so would quantize
    to zero under a signal tolerance of TAU token units. The zero
    fraction per level IS the compression curve a thresholding wavelet
    codec achieves. Same zero-padded cascade as ``dwt_haar`` (grouped by
    padded length, vectorized across the batch), but aggregated in-batch
    to one row per (doc, level) — details never leave the task, no
    shuffle."""
    from ..functions.listops import next_pow2_arr

    def sparsity(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        lens = np.diff(off)
        padded = next_pow2_arr(lens)
        docs, levels, ncs, nzs = [], [], [], []
        for p in np.unique(padded):
            rows = np.nonzero(padded == p)[0]
            x = np.zeros((len(rows), int(p)), dtype=np.int64)
            for j, r in enumerate(rows):
                n = lens[r]
                x[j, :n] = v[off[r] : off[r] + n]
            s = x
            n_level = int(p).bit_length() - 1
            for l in range(1, n_level + 1):
                d = s[:, 0::2] - s[:, 1::2]
                s = s[:, 0::2] + s[:, 1::2]
                n_real = -(-lens[rows] // (1 << l))
                kg = np.arange(d.shape[1], dtype=np.int64)
                mask = kg[None, :] < n_real[:, None]
                flat = (np.abs(d) <= (SPARSITY_TAU << (l - 1))) & mask
                docs.append(rows)
                levels.append(np.full(len(rows), l - 1, dtype=np.int64))
                ncs.append(n_real.astype(np.int64))
                nzs.append(flat.sum(axis=1).astype(np.int64))
        if not docs:
            return pa.table(
                {"doc_id": pa.array([], type=pa.string()),
                 "level": pa.array([], type=pa.int64()),
                 "n_coeffs": pa.array([], type=pa.int64()),
                 "n_zero": pa.array([], type=pa.int64())}
            )
        idx = np.concatenate(docs)
        return pa.table(
            {"doc_id": t["doc_id"].take(pa.array(idx)),
             "level": pa.array(np.concatenate(levels)),
             "n_coeffs": pa.array(np.concatenate(ncs)),
             "n_zero": pa.array(np.concatenate(nzs))}
        )

    return _seq_ds(sf_dir).map_batches(
        sparsity, batch_format="pyarrow", batch_size=256
    )


HAAR_SPARSITY_SQL = (
    f"{_FLAT_CTE},"
    " n AS (SELECT doc_id, count(*) AS L FROM flat GROUP BY doc_id),"
    " jj AS (SELECT doc_id, CASE WHEN L = 1 THEN 0"
    "   ELSE CAST(ceil(log2(CAST(L AS DOUBLE))) AS INTEGER) END AS J FROM n),"
    " lv AS (SELECT doc_id,"
    "   CAST(unnest(range(1, J + 1)) AS INTEGER) AS l FROM jj),"
    " d AS (SELECT f.doc_id, lv.l, f.pos // (1 << lv.l) AS k,"
    "  CAST(sum(CASE WHEN (f.pos // (1 << (lv.l - 1))) % 2 = 0"
    "    THEN f.tok ELSE -f.tok END) AS BIGINT) AS d"
    "  FROM flat f JOIN lv ON lv.doc_id = f.doc_id"
    "  GROUP BY f.doc_id, lv.l, k)"
    " SELECT doc_id, CAST(l - 1 AS BIGINT) AS level,"
    " CAST(count(*) AS BIGINT) AS n_coeffs,"
    f" CAST(sum(CASE WHEN abs(d) <= {SPARSITY_TAU} * (1 << (l - 1))"
    "   THEN 1 ELSE 0 END) AS BIGINT) AS n_zero"
    " FROM d GROUP BY doc_id, l"
)


PROFILE_P = 64  # synth daily period (synth.DAY)


def q_source_profile_corr(sf_dir: str) -> "pa.Table":
    """Cross-source load-profile similarity (the reference compares
    production vs consumption curves; the analog here correlates every
    source pair's daily profile): per source, the 64-phase floor-mean
    profile — built from one keyed bincount per batch and a <= sources x
    64-row groupby, the corpus never shuffles — then, per source pair,
    the integer correlation ingredients (p, sab, sa, sb, qa, qb) over
    the phases BOTH sources cover; Pearson r is one driver-side division
    away. Floor means keep everything integer-exact (tokens are
    non-negative, so numpy // == DuckDB //); profile values < 2^20 bound
    every pair sum far below int64."""
    ds = _seq_ds(sf_dir)
    P = PROFILE_P

    def partial(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        n_docs = len(off) - 1
        if n_docs == 0 or len(v) == 0:
            return pa.table(
                {"source": pa.array([], type=pa.string()),
                 "ph": pa.array([], type=pa.int64()),
                 "c": pa.array([], type=pa.int64()),
                 "s": pa.array([], type=pa.int64())}
            )
        if int(v.min()) < 0:
            raise ValueError(
                "source_profile_corr needs non-negative tokens (floor "
                "division parity with the SQL twin)"
            )
        n = np.diff(off)
        pos = np.arange(len(v), dtype=np.int64) - np.repeat(off[:-1], n)
        usrc, sidx = np.unique(
            np.asarray(t["source"].to_pylist(), dtype=object),
            return_inverse=True,
        )
        key = sidx.astype(np.int64)[np.repeat(np.arange(n_docs), n)] * P \
            + pos % P
        cnt = np.bincount(key, minlength=len(usrc) * P).astype(np.int64)
        if int(cnt.max()) * int(v.max(initial=0)) >= (1 << 53):
            raise ValueError(
                "per-phase sum would exceed float64's exact-integer range"
            )
        s = np.bincount(key, weights=v, minlength=len(usrc) * P)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {"source": pa.array(usrc[nz // P].astype(object),
                                type=pa.string()),
             "ph": pa.array((nz % P).astype(np.int64)),
             "c": pa.array(cnt[nz]),
             "s": pa.array(s[nz].astype(np.int64))}
        )

    prof = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "ph"]).sum(["c", "s"])
        .to_pandas()  # <= sources x 64 rows — bounded, never the corpus
    )
    means: dict[str, np.ndarray] = {}
    have: dict[str, np.ndarray] = {}
    for src, grp in prof.groupby("source"):
        m = np.full(P, -1, dtype=np.int64)
        m[grp["ph"].to_numpy()] = (
            grp["sum(s)"].to_numpy() // grp["sum(c)"].to_numpy()
        )
        means[src] = m
        have[src] = m >= 0
    srcs = sorted(means)
    rows = {k: [] for k in
            ("src_a", "src_b", "p", "sab", "sa", "sb", "qa", "qb")}
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            both = have[a] & have[b]
            ma, mb = means[a][both], means[b][both]
            rows["src_a"].append(a)
            rows["src_b"].append(b)
            rows["p"].append(int(both.sum()))
            rows["sab"].append(int((ma * mb).sum()))
            rows["sa"].append(int(ma.sum()))
            rows["sb"].append(int(mb.sum()))
            rows["qa"].append(int((ma * ma).sum()))
            rows["qb"].append(int((mb * mb).sum()))
    return pa.table(
        {"src_a": pa.array(rows["src_a"], type=pa.string()),
         "src_b": pa.array(rows["src_b"], type=pa.string()),
         **{k: pa.array(rows[k], type=pa.int64())
            for k in ("p", "sab", "sa", "sb", "qa", "qb")}}
    )


SOURCE_PROFILE_CORR_SQL = (
    f"{_FLAT_CTE},"
    f" pr AS (SELECT source, pos % {PROFILE_P} AS ph,"
    "  CAST(count(*) AS BIGINT) AS c, CAST(sum(tok) AS BIGINT) AS s"
    "  FROM flat GROUP BY source, ph),"
    " m AS (SELECT source, ph, s // c AS mv FROM pr)"
    " SELECT a.source AS src_a, b.source AS src_b,"
    " CAST(count(*) AS BIGINT) AS p,"
    " CAST(sum(a.mv * b.mv) AS BIGINT) AS sab,"
    " CAST(sum(a.mv) AS BIGINT) AS sa, CAST(sum(b.mv) AS BIGINT) AS sb,"
    " CAST(sum(a.mv * a.mv) AS BIGINT) AS qa,"
    " CAST(sum(b.mv * b.mv) AS BIGINT) AS qb"
    " FROM m a JOIN m b ON a.ph = b.ph AND a.source < b.source"
    " GROUP BY a.source, b.source"
)


DRIFT_TOPK = 20
DRIFT_GROUP_A = "src-0"  # the largest synth source (p = 0.40)


def q_source_drift(sf_dir: str) -> "pa.Table":
    """Distribution-drift monitor (what a training-data pipeline watches
    between corpus snapshots or source groups): the top-K tokens whose
    relative frequency differs most between source ``src-0`` and the
    rest, scored by the integer cross-multiplied difference
    |c_a * N_b - c_b * N_a| (== N_a*N_b*|p_a - p_b|, no division). Per
    batch: two bincounts; one vocab-bounded (<= 2^20 rows, never the
    corpus) groupby; the driver sees only the summed histogram and
    returns K rows. Ties -> smallest token."""
    ds = _seq_ds(sf_dir)
    vocab = 1 << TOKEN_BITS

    def partial(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        if len(vals) == 0:
            return pa.table(
                {"tok": pa.array([], type=pa.int64()),
                 "c_a": pa.array([], type=pa.int64()),
                 "c_b": pa.array([], type=pa.int64())}
            )
        n = np.diff(off)
        is_a = np.asarray(
            [s == DRIFT_GROUP_A for s in t["source"].to_pylist()]
        )
        mask = np.repeat(is_a, n)
        ca = np.bincount(vals[mask], minlength=vocab)
        cb = np.bincount(vals[~mask], minlength=vocab)
        nz = np.flatnonzero(ca | cb)
        return pa.table(
            {"tok": pa.array(nz.astype(np.int64)),
             "c_a": pa.array(ca[nz].astype(np.int64)),
             "c_b": pa.array(cb[nz].astype(np.int64))}
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("tok").sum(["c_a", "c_b"])
        .to_pandas()  # vocab-bounded
    )
    ca = hist["sum(c_a)"].to_numpy()
    cb = hist["sum(c_b)"].to_numpy()
    na, nb = int(ca.sum()), int(cb.sum())
    if na * nb and int(max(ca.max(), cb.max())) > (2**63 - 1) // max(na, nb):
        raise ValueError(
            "source_drift: cross-multiplied drift score would wrap int64 "
            "at this corpus size; shard the histogram or rescale"
        )
    score = np.abs(ca * nb - cb * na)
    tok = hist["tok"].to_numpy()
    order = np.lexsort((tok, -score))[:DRIFT_TOPK]
    return pa.table(
        {"tok": pa.array(tok[order].astype(np.int64)),
         "c_a": pa.array(ca[order].astype(np.int64)),
         "c_b": pa.array(cb[order].astype(np.int64)),
         "score": pa.array(score[order].astype(np.int64))}
    )


SOURCE_DRIFT_SQL = (
    f"{_FLAT_CTE},"
    " h AS (SELECT tok,"
    f"  CAST(sum(CASE WHEN source = '{DRIFT_GROUP_A}' THEN 1 ELSE 0 END)"
    "   AS BIGINT) AS c_a,"
    f"  CAST(sum(CASE WHEN source <> '{DRIFT_GROUP_A}' THEN 1 ELSE 0 END)"
    "   AS BIGINT) AS c_b"
    "  FROM flat GROUP BY tok),"
    " t AS (SELECT CAST(sum(c_a) AS BIGINT) AS na,"
    "  CAST(sum(c_b) AS BIGINT) AS nb FROM h)"
    " SELECT h.tok, h.c_a, h.c_b,"
    " CAST(abs(h.c_a * t.nb - h.c_b * t.na) AS BIGINT) AS score"
    f" FROM h, t ORDER BY score DESC, tok LIMIT {DRIFT_TOPK}"
)


MED_W = 64       # tumbling window (one synth "day")
MED_W_BITS = 11  # windows per doc < 2^11 (max len 65536 / 64 = 1024)


def q_window_median(sf_dir: str) -> "ray.data.Dataset":
    """Median retention tier: per (doc, tumbling 64-token window) the
    EXACT window median (lower-middle for even counts — the element
    DuckDB's quantile_disc(0.5) picks) plus the window count. A
    median-downsampled tier resists the outliers that pull min/max/mean
    rollups (the robust complement of ``ohlc_rollup``). One lexsort per
    batch over (doc << 11 | window, value) packed keys; per-window
    medians are then a single gather at start + (count-1)//2 — ragged
    tail windows fall out of the same index arithmetic, no per-window
    loop, no shuffle."""
    ds = _seq_ds(sf_dir)

    def med(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        n_docs = len(off) - 1
        if n_docs == 0 or len(v) == 0:
            return pa.table(
                {"doc_id": pa.array([], type=pa.string()),
                 "w": pa.array([], type=pa.int64()),
                 "med": pa.array([], type=pa.int64()),
                 "c": pa.array([], type=pa.int64())}
            )
        n = np.diff(off)
        if int(n.max()) > (MED_W << MED_W_BITS):
            raise ValueError(
                "window_median: doc longer than the packed-key window "
                f"budget ({MED_W << MED_W_BITS} tokens); widen MED_W_BITS"
            )
        pos = np.arange(len(v), dtype=np.int64) - np.repeat(off[:-1], n)
        seg = np.repeat(np.arange(n_docs, dtype=np.int64), n)
        key = (seg << MED_W_BITS) | (pos // MED_W)
        order = np.lexsort((v, key))
        sk, sv = key[order], v[order]
        starts = np.flatnonzero(np.r_[True, np.diff(sk) != 0])
        cnt = np.diff(np.r_[starts, len(sk)])
        return pa.table(
            {"doc_id": t["doc_id"].take(
                pa.array(sk[starts] >> MED_W_BITS)),
             "w": pa.array(sk[starts] & ((1 << MED_W_BITS) - 1)),
             "med": pa.array(sv[starts + (cnt - 1) // 2]),
             "c": pa.array(cnt.astype(np.int64))}
        )

    return ds.map_batches(med, batch_format="pyarrow", batch_size=256)


WINDOW_MEDIAN_SQL = (
    f"{_FLAT_CTE}"
    f" SELECT doc_id, pos // {MED_W} AS w,"
    " CAST(quantile_disc(tok, 0.5) AS BIGINT) AS med,"
    " CAST(count(*) AS BIGINT) AS c"
    " FROM flat GROUP BY doc_id, w"
)


def q_zero_crossings(sf_dir: str) -> "ray.data.Dataset":
    """Per-doc mean-crossing count — the cheapest oscillation-rate
    signal (a load curve crossing its own mean ~2x per day has a clean
    daily period; a trending one barely crosses). Cross-multiplied to
    stay integer: d_i = n * x_i - S flips sign exactly where x crosses
    the doc mean; a crossing is sign(d_i) * sign(d_{i+1}) == -1 (exact
    zeros break the run, matching the SQL twin). Signs first, THEN the
    product — d_i * d_{i+1} itself could reach 2^72. One global diff
    per batch, doc-boundary pairs masked; row = sequence, no shuffle."""

    def stats(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        n_docs = len(off) - 1
        if n_docs == 0 or len(v) == 0:
            return pa.table(
                {"doc_id": pa.array([], type=pa.string()),
                 "n": pa.array([], type=pa.int64()),
                 "n_cross": pa.array([], type=pa.int64())}
            )
        n = np.diff(off)
        assert (n > 0).all(), "zero_crossings requires non-empty docs"
        s = np.add.reduceat(v, off[:-1])
        d = np.repeat(n, n) * v - np.repeat(s, n)  # |d| <= 2^36
        sg = np.sign(d)
        cross = (sg[:-1] * sg[1:] == -1).astype(np.int64)
        if len(cross):
            cross[off[1:-1] - 1] = 0  # pairs never span docs
        n_cross = (
            np.add.reduceat(cross, np.minimum(off[:-1], len(cross) - 1))
            if len(cross) else np.zeros(n_docs, dtype=np.int64)
        )
        n_cross[n == 1] = 0  # a 1-token doc aliases its neighbor's segment
        return pa.table(
            {"doc_id": t["doc_id"], "n": pa.array(n.astype(np.int64)),
             "n_cross": pa.array(n_cross)}
        )

    return _seq_ds(sf_dir).map_batches(
        stats, batch_format="pyarrow", batch_size=256
    )


ZERO_CROSS_SQL = (
    f"{_FLAT_CTE},"
    " agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n,"
    "  CAST(sum(tok) AS BIGINT) AS s FROM flat GROUP BY doc_id),"
    " d AS (SELECT f.doc_id, a.n,"
    "  sign(a.n * f.tok - a.s) AS sg,"
    "  lead(sign(a.n * f.tok - a.s)) OVER"
    "   (PARTITION BY f.doc_id ORDER BY f.pos) AS sg2"
    "  FROM flat f JOIN agg a USING (doc_id))"
    " SELECT doc_id, max(n) AS n,"
    " CAST(sum(CASE WHEN sg * sg2 = -1 THEN 1 ELSE 0 END) AS BIGINT)"
    "  AS n_cross"
    " FROM d GROUP BY doc_id"
)


def q_peak_pos(sf_dir: str) -> "ray.data.Dataset":
    """Per-doc extremum locator: the FIRST position of the max and of the
    min token (the peak/trough a load-profile report pins), plus the
    values. One maximum/minimum.reduceat pair and two first-index
    reduceats per batch (the argmax-with-tie trick shared with
    token_mode); row = sequence, no shuffle."""

    def stats(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        n_docs = len(off) - 1
        if n_docs == 0 or len(v) == 0:
            return pa.table(
                {"doc_id": pa.array([], type=pa.string()),
                 "max_tok": pa.array([], type=pa.int64()),
                 "max_pos": pa.array([], type=pa.int64()),
                 "min_tok": pa.array([], type=pa.int64()),
                 "min_pos": pa.array([], type=pa.int64())}
            )
        n = np.diff(off)
        assert (n > 0).all(), "peak_pos requires non-empty docs"
        mx = np.maximum.reduceat(v, off[:-1])
        mn = np.minimum.reduceat(v, off[:-1])
        idx = np.arange(len(v), dtype=np.int64)
        pos = idx - np.repeat(off[:-1], n)
        big = np.int64(len(v))
        is_mx = v == np.repeat(mx, n)
        is_mn = v == np.repeat(mn, n)
        first_mx = np.minimum.reduceat(np.where(is_mx, pos, big), off[:-1])
        first_mn = np.minimum.reduceat(np.where(is_mn, pos, big), off[:-1])
        return pa.table(
            {"doc_id": t["doc_id"], "max_tok": pa.array(mx),
             "max_pos": pa.array(first_mx), "min_tok": pa.array(mn),
             "min_pos": pa.array(first_mn)}
        )

    return _seq_ds(sf_dir).map_batches(
        stats, batch_format="pyarrow", batch_size=256
    )


PEAK_POS_SQL = (
    f"{_FLAT_CTE},"
    " agg AS (SELECT doc_id, CAST(max(tok) AS BIGINT) AS max_tok,"
    "  CAST(min(tok) AS BIGINT) AS min_tok FROM flat GROUP BY doc_id)"
    " SELECT f.doc_id, a.max_tok,"
    " CAST(min(f.pos) FILTER (WHERE f.tok = a.max_tok) AS BIGINT)"
    "  AS max_pos,"
    " a.min_tok,"
    " CAST(min(f.pos) FILTER (WHERE f.tok = a.min_tok) AS BIGINT)"
    "  AS min_pos"
    " FROM flat f JOIN agg a USING (doc_id)"
    " GROUP BY f.doc_id, a.max_tok, a.min_tok"
)


# candidate periods: half-day, day (the synth's planted 64), two days, week
PERIOD_LAGS = (32, 64, 128, 448)


def q_period_detect(sf_dir: str) -> "ray.data.Dataset":
    """Dominant-period detector: per doc, the candidate lag with the
    highest mean lagged product floor(sum(x_i * x_{i+lag}) / (n - lag))
    — the raw-autocorrelation period pick (the floor-mean normalizes
    away the shrinking overlap so long lags compete fairly; floor
    division matches DuckDB ``//`` on the non-negative domain). On the
    synth corpus lag 448 = 7 x 64 wins on most long docs — it aligns
    BOTH planted cycles (daily sine and weekly square wave) at once,
    which is exactly the harmonic-capture behaviour raw autocorrelation
    should show. One
    shifted elementwise product per candidate lag per batch with
    cross-doc pairs zeroed by segment compare (the ``autocorr_lags``
    kernel), then an integer argmax; ties -> smallest lag. Docs shorter
    than max(lag)+1 drop (no overlap at every candidate)."""
    lags = PERIOD_LAGS

    def stats(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        keep = np.diff(off) > max(lags)
        if not keep.all():
            t = t.filter(pa.array(keep))
            vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        n_docs = len(off) - 1
        if n_docs == 0 or len(v) == 0:
            return pa.table(
                {"doc_id": pa.array([], type=pa.string()),
                 "best_lag": pa.array([], type=pa.int64()),
                 "mean_prod": pa.array([], type=pa.int64())}
            )
        n = np.diff(off)
        seg = np.repeat(np.arange(n_docs, dtype=np.int64), n)
        scores = np.empty((len(lags), n_docs), dtype=np.int64)
        for li, lag in enumerate(lags):
            prod = v[:-lag] * v[lag:]
            prod[seg[:-lag] != seg[lag:]] = 0  # pairs never span docs
            # reduceat segment starts clipped like autocorr (every doc
            # has n > max(lags) >= lag, so no doc aliases another)
            dot = np.add.reduceat(prod, np.minimum(off[:-1],
                                                   len(prod) - 1))
            scores[li] = dot // (n - lag)
        best = np.argmax(scores, axis=0)  # first max -> smallest lag
        return pa.table(
            {"doc_id": t["doc_id"],
             "best_lag": pa.array(np.asarray(lags, dtype=np.int64)[best]),
             "mean_prod": pa.array(scores[best, np.arange(n_docs)])}
        )

    return _seq_ds(sf_dir).map_batches(
        stats, batch_format="pyarrow", batch_size=128
    )


def _period_sql() -> str:
    legs = " UNION ALL ".join(
        f"SELECT doc_id, CAST({lag} AS BIGINT) AS lag,"
        " CAST(sum(tok * nxt) // (max(n) - "
        f"{lag}) AS BIGINT) AS mp"
        " FROM (SELECT doc_id, n, tok,"
        f"  lead(tok, {lag}) OVER (PARTITION BY doc_id ORDER BY pos)"
        "   AS nxt FROM fl)"
        " WHERE nxt IS NOT NULL GROUP BY doc_id"
        for lag in PERIOD_LAGS
    )
    return (
        f"{_FLAT_CTE},"
        " ag AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM flat"
        f"  GROUP BY doc_id HAVING count(*) > {max(PERIOD_LAGS)}),"
        " fl AS (SELECT f.doc_id, a.n, f.tok, f.pos"
        "  FROM flat f JOIN ag a USING (doc_id)),"
        f" sc AS ({legs})"
        " SELECT doc_id, CAST(lag AS BIGINT) AS best_lag,"
        " CAST(mp AS BIGINT) AS mean_prod FROM"
        " (SELECT doc_id, lag, mp,"
        "  row_number() OVER (PARTITION BY doc_id ORDER BY mp DESC, lag)"
        "   AS rn FROM sc) WHERE rn = 1"
    )


PERIOD_DETECT_SQL = _period_sql()


PEAK_TOPK = 5   # windows reported per source
PEAK_W = 64     # one synth day


def q_peak_windows(sf_dir: str) -> "pa.Table":
    """Peak-demand report: the PEAK_TOPK highest-sum complete 64-token
    windows per source (where and how high the per-day peaks are — the
    capacity-planning readout of a load store). Per batch: one tumble
    reduceat for window sums, a LOCAL top-K per source present in the
    batch (<= sources x K rows leave each task); the driver folds the
    bounded partials to the global top-K. Ties -> smallest (doc_id, w).
    Partial tail windows are excluded so every sum spans exactly
    PEAK_W tokens."""
    ds = _seq_ds(sf_dir)
    K, W = PEAK_TOPK, PEAK_W

    def partial(t: pa.Table) -> "object":
        import pandas as pd

        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        n_docs = len(off) - 1
        cols = ("source", "doc_id", "w", "wsum")
        if n_docs == 0 or len(v) == 0:
            return pd.DataFrame({c: [] for c in cols})
        starts, _, counts = tumble_starts(off, W)
        s = np.add.reduceat(v, starts)
        full = counts == W
        n_win = -(-np.diff(off) // W)
        doc_of = np.repeat(np.arange(n_docs), n_win)
        w_idx = (starts - off[:-1][doc_of]) // W
        src = np.asarray(t["source"].to_pylist(), dtype=object)[doc_of]
        ids = np.asarray(t["doc_id"].to_pylist(), dtype=object)[doc_of]
        df = pd.DataFrame(
            {"source": src[full], "doc_id": ids[full],
             "w": w_idx[full].astype(np.int64), "wsum": s[full]}
        )
        return (
            df.sort_values(["source", "wsum", "doc_id", "w"],
                           ascending=[True, False, True, True],
                           kind="mergesort")
            .groupby("source", sort=False).head(K)
        )

    parts = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=256
    ).to_pandas()  # bounded: sources x K rows per task
    top = (
        parts.sort_values(["source", "wsum", "doc_id", "w"],
                          ascending=[True, False, True, True],
                          kind="mergesort")
        .groupby("source", sort=False).head(K)
        .reset_index(drop=True)
    )
    return pa.table(
        {"source": pa.array(top["source"].tolist(), type=pa.string()),
         "doc_id": pa.array(top["doc_id"].tolist(), type=pa.string()),
         "w": pa.array(top["w"].to_numpy()),
         "wsum": pa.array(top["wsum"].to_numpy())}
    )


PEAK_WINDOWS_SQL = (
    f"{_FLAT_CTE},"
    f" ws AS (SELECT doc_id, source, pos // {PEAK_W} AS w,"
    "  CAST(sum(tok) AS BIGINT) AS wsum, count(*) AS c"
    f"  FROM flat GROUP BY doc_id, source, w HAVING count(*) = {PEAK_W})"
    " SELECT source, doc_id, CAST(w AS BIGINT) AS w, wsum FROM"
    " (SELECT source, doc_id, w, wsum,"
    "  row_number() OVER (PARTITION BY source"
    "   ORDER BY wsum DESC, doc_id, w) AS rn FROM ws)"
    f" WHERE rn <= {PEAK_TOPK}"
)


TIER_ERR_TIERS = (1, 3, 6)  # the gate's rollup ladder sample


def q_tier_error(sf_dir: str) -> "ray.data.Dataset":
    """Retention-tier information-loss audit: per (doc, tier), the
    integer L1 reconstruction error of the tier's mean-downsample —
    err = sum_i |c_w(i) * x_i - s_w(i)| (c_w x the absolute deviation
    from the window mean, cross-multiplied so ragged tail windows need
    no division). The per-tier error curve is what a retention policy
    reads to decide how far each source can be downsampled before the
    loss budget is hit. One reduceat per tier per batch (windows via
    ``tumble_starts``), everything int64 (|c*x| <= 64 * 2^20); row =
    sequence, no shuffle."""

    def stats(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        n_docs = len(off) - 1
        if n_docs == 0 or len(v) == 0:
            return pa.table(
                {"doc_id": pa.array([], type=pa.string()),
                 "tier": pa.array([], type=pa.int64()),
                 "abs_err": pa.array([], type=pa.int64())}
            )
        cols_doc, cols_tier, cols_err = [], [], []
        for tier in TIER_ERR_TIERS:
            w = 1 << tier
            starts, _, counts = tumble_starts(off, w)
            s = np.add.reduceat(v, starts)
            dev = np.abs(np.repeat(counts, counts) * v
                         - np.repeat(s, counts))
            err = np.add.reduceat(dev, off[:-1])
            # reduceat quirk: a start index equal to len(dev) is illegal;
            # off[:-1] < len(v) == len(dev) always (docs are non-empty)
            cols_doc.append(np.arange(n_docs, dtype=np.int64))
            cols_tier.append(np.full(n_docs, tier, dtype=np.int64))
            cols_err.append(err.astype(np.int64))
        idx = np.concatenate(cols_doc)
        return pa.table(
            {"doc_id": t["doc_id"].take(pa.array(idx)),
             "tier": pa.array(np.concatenate(cols_tier)),
             "abs_err": pa.array(np.concatenate(cols_err))}
        )

    return _seq_ds(sf_dir).map_batches(
        stats, batch_format="pyarrow", batch_size=256
    )


def _tier_error_sql() -> str:
    legs = []
    for tier in TIER_ERR_TIERS:
        w = 1 << tier
        legs.append(
            f"SELECT f.doc_id, CAST({tier} AS BIGINT) AS tier,"
            " CAST(sum(abs(g.c * f.tok - g.s)) AS BIGINT) AS abs_err"
            " FROM flat f JOIN ("
            f"  SELECT doc_id, pos // {w} AS wi,"
            "   CAST(count(*) AS BIGINT) AS c, CAST(sum(tok) AS BIGINT) AS s"
            f"  FROM flat GROUP BY doc_id, wi) g"
            f" ON g.doc_id = f.doc_id AND g.wi = f.pos // {w}"
            " GROUP BY f.doc_id"
        )
    return f"{_FLAT_CTE} " + " UNION ALL ".join(legs)


TIER_ERROR_SQL = _tier_error_sql()


def q_drawdown(sf_dir: str) -> "ray.data.Dataset":
    """Per-doc maximum drawdown — the classic peak-to-trough loss over a
    token stream (how far the series fell below its running maximum),
    plus the FIRST position realizing it. A per-segment running max is
    one global ``np.maximum.accumulate`` via the lift trick: adding
    ``seg << TOKEN_BITS`` makes every token of doc i strictly dominate
    every token of doc i-1, so the accumulate resets itself at each doc
    boundary — no per-doc loop, no shuffle (row = sequence). All int64
    (dd < 2^20), bit-exact vs the running-max window SQL twin."""
    ds = _seq_ds(sf_dir)

    def stats(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        n_docs = len(off) - 1
        if n_docs == 0 or len(v) == 0:
            e = pa.array([], type=pa.int64())
            return pa.table(
                {"doc_id": pa.array([], type=pa.string()),
                 "n": e, "max_dd": e, "dd_pos": e}
            )
        if int(v.max()) >= (1 << TOKEN_BITS) or int(v.min()) < 0:
            raise ValueError(
                "drawdown's lift trick needs tokens in "
                f"[0, 2^{TOKEN_BITS})"
            )
        n = np.diff(off)
        assert (n > 0).all(), "drawdown requires non-empty docs"
        seg = np.repeat(np.arange(n_docs, dtype=np.int64), n)
        lift = seg << TOKEN_BITS
        runmax = np.maximum.accumulate(v + lift) - lift
        dd = runmax - v
        max_dd = np.maximum.reduceat(dd, off[:-1])
        pos_local = np.arange(len(v), dtype=np.int64) - np.repeat(off[:-1], n)
        cand = np.where(dd == np.repeat(max_dd, n), pos_local,
                        np.iinfo(np.int64).max)
        dd_pos = np.minimum.reduceat(cand, off[:-1])
        return pa.table(
            {"doc_id": t["doc_id"], "n": pa.array(n.astype(np.int64)),
             "max_dd": pa.array(max_dd), "dd_pos": pa.array(dd_pos)}
        )

    return ds.map_batches(stats, batch_format="pyarrow", batch_size=256)


DRAWDOWN_SQL = (
    f"{_FLAT_CTE},"
    " r AS (SELECT doc_id, pos,"
    "  max(tok) OVER (PARTITION BY doc_id ORDER BY pos"
    "   ROWS UNBOUNDED PRECEDING) - tok AS dd FROM flat),"
    " m AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n,"
    "  CAST(max(dd) AS BIGINT) AS max_dd FROM r GROUP BY doc_id)"
    " SELECT m.doc_id, m.n, m.max_dd,"
    " CAST(min(r.pos) AS BIGINT) AS dd_pos"
    " FROM r JOIN m ON r.doc_id = m.doc_id AND r.dd = m.max_dd"
    " GROUP BY m.doc_id, m.n, m.max_dd"
)


SMA_FAST = 8    # fast moving-average window
SMA_SLOW = 32   # slow moving-average window (must be a multiple of FAST)


def q_sma_cross(sf_dir: str) -> "ray.data.Dataset":
    """Fast/slow moving-average crossover census — per doc (with at
    least SMA_SLOW tokens) the number of valid positions, how many sit
    above the slow average, and how many fast/slow crossovers occur.
    Cross-multiplied to stay integer: with SLOW = 4*FAST, fast > slow
    iff 4*sum8 > sum32, so d = 4*sum8 - sum32 (|d| < 2^26) flips sign
    exactly at a crossover; exact zeros break the run (same convention
    as zero_crossings). Both trailing sums come from ONE global prefix
    sum — valid positions (local pos >= SLOW-1) never reach across a
    doc boundary, so no reset logic is needed. No per-doc loop, no
    shuffle (row = sequence)."""
    ds = _seq_ds(sf_dir)
    ratio = SMA_SLOW // SMA_FAST

    def stats(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        n_docs = len(off) - 1
        e = pa.array([], type=pa.int64())
        empty = pa.table(
            {"doc_id": pa.array([], type=pa.string()),
             "n_valid": e, "n_above": e, "n_cross": e}
        )
        if n_docs == 0 or len(v) == 0:
            return empty
        n = np.diff(off)
        assert (n > 0).all(), "sma_cross requires non-empty docs"
        n_valid = np.maximum(n - (SMA_SLOW - 1), 0)
        kept = n_valid > 0
        if not kept.any():
            return empty
        pos_local = np.arange(len(v), dtype=np.int64) - np.repeat(off[:-1], n)
        g = np.flatnonzero(pos_local >= SMA_SLOW - 1)
        pref = np.concatenate(([0], np.cumsum(v)))
        s_fast = pref[g + 1] - pref[g + 1 - SMA_FAST]
        s_slow = pref[g + 1] - pref[g + 1 - SMA_SLOW]
        sg = np.sign(ratio * s_fast - s_slow)
        nv = n_valid[kept]
        voff = np.concatenate(([0], np.cumsum(nv)))
        n_above = np.add.reduceat((sg > 0).astype(np.int64), voff[:-1])
        doc_of = np.repeat(np.arange(len(nv)), nv)
        cross = ((sg[:-1] * sg[1:] == -1)
                 & (doc_of[:-1] == doc_of[1:])).astype(np.int64)
        cross = np.concatenate((cross, [0]))  # pad to len(g) for reduceat
        n_cross = np.add.reduceat(cross, voff[:-1])
        return pa.table(
            {"doc_id": t["doc_id"].filter(pa.array(kept)),
             "n_valid": pa.array(nv.astype(np.int64)),
             "n_above": pa.array(n_above),
             "n_cross": pa.array(n_cross)}
        )

    return ds.map_batches(stats, batch_format="pyarrow", batch_size=256)


SMA_CROSS_SQL = (
    f"{_FLAT_CTE},"
    " w AS (SELECT doc_id, pos,"
    "  sum(tok) OVER (PARTITION BY doc_id ORDER BY pos"
    f"   ROWS BETWEEN {SMA_FAST - 1} PRECEDING AND CURRENT ROW) AS sf,"
    "  sum(tok) OVER (PARTITION BY doc_id ORDER BY pos"
    f"   ROWS BETWEEN {SMA_SLOW - 1} PRECEDING AND CURRENT ROW) AS ss"
    "  FROM flat),"
    " d AS (SELECT doc_id, pos,"
    f"  sign({SMA_SLOW // SMA_FAST} * sf - ss) AS sg,"
    f"  lead(sign({SMA_SLOW // SMA_FAST} * sf - ss)) OVER"
    "   (PARTITION BY doc_id ORDER BY pos) AS sg2"
    f"  FROM w WHERE pos >= {SMA_SLOW - 1})"
    " SELECT doc_id, CAST(count(*) AS BIGINT) AS n_valid,"
    " CAST(coalesce(sum(CASE WHEN sg > 0 THEN 1 END), 0) AS BIGINT)"
    "  AS n_above,"
    " CAST(coalesce(sum(CASE WHEN sg * sg2 = -1 THEN 1 END), 0) AS BIGINT)"
    "  AS n_cross"
    " FROM d GROUP BY doc_id"
)


LAGF_STRIDE = 509  # prime stride so sampled positions don't alias buckets


def q_lag_features(sf_dir: str) -> "ray.data.Dataset":
    """Supervised-learning feature extraction — per doc, every
    LAGF_STRIDE-th position (with full context: local pos >= 8 and a
    successor in-doc) emits the training row (tok, lag1, lag8, lead1)
    a next-token / forecasting model consumes. Pure index gathers on
    the flat token array (g-1, g-8, g+1 never cross a doc boundary by
    the mask's construction) — no per-row loop, no shuffle, and the
    output is a ~1/509 sample of the corpus so the sink stays small.
    All int64, bit-exact vs the LAG/LEAD window SQL twin."""
    ds = _seq_ds(sf_dir)

    def feats(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        n_docs = len(off) - 1
        e = pa.array([], type=pa.int64())
        empty = pa.table(
            {"doc_id": pa.array([], type=pa.string()), "pos": e,
             "tok": e, "lag1": e, "lag8": e, "lead1": e}
        )
        if n_docs == 0 or len(v) == 0:
            return empty
        n = np.diff(off)
        assert (n > 0).all(), "lag_features requires non-empty docs"
        pos_local = np.arange(len(v), dtype=np.int64) - np.repeat(off[:-1], n)
        mask = ((pos_local % LAGF_STRIDE == 0) & (pos_local >= 8)
                & (pos_local < np.repeat(n, n) - 1))
        g = np.flatnonzero(mask)
        if len(g) == 0:
            return empty
        row_of = np.repeat(np.arange(n_docs, dtype=np.int64), n)[g]
        return pa.table(
            {"doc_id": t["doc_id"].take(pa.array(row_of)),
             "pos": pa.array(pos_local[g]), "tok": pa.array(v[g]),
             "lag1": pa.array(v[g - 1]), "lag8": pa.array(v[g - 8]),
             "lead1": pa.array(v[g + 1])}
        )

    return ds.map_batches(feats, batch_format="pyarrow", batch_size=256)


LAG_FEATURES_SQL = (
    f"{_FLAT_CTE},"
    " l AS (SELECT doc_id, pos, tok,"
    "  lag(tok, 1) OVER w AS lag1, lag(tok, 8) OVER w AS lag8,"
    "  lead(tok, 1) OVER w AS lead1 FROM flat"
    "  WINDOW w AS (PARTITION BY doc_id ORDER BY pos))"
    " SELECT doc_id, CAST(pos AS BIGINT) AS pos,"
    " CAST(tok AS BIGINT) AS tok, CAST(lag1 AS BIGINT) AS lag1,"
    " CAST(lag8 AS BIGINT) AS lag8, CAST(lead1 AS BIGINT) AS lead1"
    f" FROM l WHERE pos % {LAGF_STRIDE} = 0 AND pos >= 8"
    " AND lead1 IS NOT NULL"
)


XCORR_W = 64       # bucket width (one synth day)
XCORR_SPAN = 4096  # profile the first 64 buckets of every doc
XCORR_MAX_LAG = 4  # bucket lags scored (0..4)


def q_xcorr_sources(sf_dir: str) -> "pa.Table":
    """Cross-source lead/lag correlation — does source A's load shape
    anticipate source B's? Per source, an integer 64-bucket profile
    (floor-mean token per XCORR_W-position bucket over the first
    XCORR_SPAN positions of every doc), then for every ordered source
    pair and bucket lag 0..XCORR_MAX_LAG the dot product of the
    aligned profiles plus the overlap count. The corpus-sized work is
    ONE partial groupby (distinct (source, bucket) pairs, <= 8*64 rows
    out); the pair x lag finish runs on that tiny table. Floor-means
    keep every value < 2^20, so the dot (< 64 * 2^40) is exact int64
    at ANY corpus size — bucket SUMS would overflow at 10^12 docs.
    Tokens are non-negative, so numpy floor division == DuckDB's
    truncating // (the sax ADVICE pitfall doesn't apply)."""
    import pandas as pd

    ds = _seq_ds(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        n_docs = len(off) - 1
        e = pa.array([], type=pa.int64())
        if n_docs == 0 or len(v) == 0:
            return pa.table(
                {"source": pa.array([], type=pa.string()),
                 "b": e, "s": e, "c": e}
            )
        n = np.diff(off)
        pos_local = np.arange(len(v), dtype=np.int64) - np.repeat(off[:-1], n)
        keep = pos_local < XCORR_SPAN
        srcs = sorted(set(t["source"].to_pylist()))
        src_idx = pc.index_in(
            t["source"], value_set=pa.array(srcs)
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        key = (np.repeat(src_idx, n)[keep] << 8) | (pos_local[keep] // XCORR_W)
        uk, inv = np.unique(key, return_inverse=True)
        # bincount sums in float64: per-batch bucket sums stay < 2^34
        # (256 docs x 64 positions x 2^20), far inside float64's 2^53
        # exact-integer range, so the int64 cast is lossless
        s = np.bincount(inv, weights=v[keep]).astype(np.int64)
        c = np.bincount(inv).astype(np.int64)
        return pa.table(
            {"source": pa.array([srcs[int(k >> 8)] for k in uk]),
             "b": pa.array((uk & 255).astype(np.int64)),
             "s": pa.array(s), "c": pa.array(c)}
        )

    from ray.data.aggregate import Sum

    hist = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=256)
        .groupby(["source", "b"])
        .aggregate(Sum("s", alias_name="s"), Sum("c", alias_name="c"))
        .to_pandas()  # tiny: sources x 64 buckets
    )
    hist["avg"] = hist["s"].to_numpy() // hist["c"].to_numpy()
    prof = {
        src: dict(zip(h["b"].to_numpy(), h["avg"].to_numpy()))
        for src, h in hist.groupby("source")
    }
    out = []
    for src_a in sorted(prof):
        for src_b in sorted(prof):
            if src_b <= src_a:
                continue
            pa_, pb_ = prof[src_a], prof[src_b]
            for lag in range(XCORR_MAX_LAG + 1):
                common = [b for b in pa_ if b + lag in pb_]
                if not common:
                    continue
                dot = int(sum(pa_[b] * pb_[b + lag] for b in common))
                out.append((src_a, src_b, lag, len(common), dot))
    return pa.table(
        {"src_a": pa.array([r[0] for r in out], type=pa.string()),
         "src_b": pa.array([r[1] for r in out], type=pa.string()),
         "lag": pa.array([r[2] for r in out], type=pa.int64()),
         "n_overlap": pa.array([r[3] for r in out], type=pa.int64()),
         "dot": pa.array([r[4] for r in out], type=pa.int64())}
    )


XCORR_SOURCES_SQL = (
    f"{_FLAT_CTE},"
    " prof AS (SELECT source, pos // " + str(XCORR_W) + " AS b,"
    "  CAST(sum(tok) // count(*) AS BIGINT) AS avg FROM flat"
    f"  WHERE pos < {XCORR_SPAN} GROUP BY source, b)"
    " SELECT a.source AS src_a, c.source AS src_b, l.lag,"
    " CAST(count(*) AS BIGINT) AS n_overlap,"
    " CAST(sum(a.avg * c.avg) AS BIGINT) AS dot"
    " FROM prof a CROSS JOIN"
    f" (SELECT unnest(range(0, {XCORR_MAX_LAG + 1})) AS lag) l"
    " JOIN prof c ON c.source > a.source AND c.b = a.b + l.lag"
    " GROUP BY src_a, src_b, l.lag"
)


def _source_token_hist(sf_dir: str):
    """Global (source, token-value) count histogram as a small pandas
    frame — ONE corpus pass of per-batch ``np.unique`` partials packed
    into a single int64 key, then ONE distinct-value-sized groupby
    exchange (<= sources x 2^TOKEN_BITS rows, never corpus-sized).
    Shared by gini_tokens and winsorize_stats, both of which finish on
    this tiny table."""

    def partial(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        n_docs = len(off) - 1
        if n_docs == 0 or len(v) == 0:
            return pa.table(
                {"source": pa.array([], type=pa.string()),
                 "tok": pa.array([], type=pa.int64()),
                 "cnt": pa.array([], type=pa.int64())}
            )
        if int(v.max()) >= (1 << TOKEN_BITS) or int(v.min()) < 0:
            raise ValueError(
                "token histogram packs (source, token) into one int64 "
                f"key; tokens must be in [0, 2^{TOKEN_BITS})"
            )
        n = np.diff(off)
        srcs = sorted(set(t["source"].to_pylist()))
        src_idx = pc.index_in(
            t["source"], value_set=pa.array(srcs)
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        key = (np.repeat(src_idx, n) << TOKEN_BITS) | v
        uk, cnt = np.unique(key, return_counts=True)
        src_names = np.array(srcs, dtype=object)[uk >> TOKEN_BITS]
        return pa.table(
            {"source": pa.array(src_names, type=pa.string()),
             "tok": pa.array(uk & ((1 << TOKEN_BITS) - 1)),
             "cnt": pa.array(cnt.astype(np.int64))}
        )

    from ray.data.aggregate import Sum

    return (
        _seq_ds(sf_dir)
        .map_batches(partial, batch_format="pyarrow", batch_size=256)
        .groupby(["source", "tok"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()  # distinct (source, value) pairs only
    )


def q_gini_tokens(sf_dir: str) -> "pa.Table":
    """Per-source token-concentration audit — total count n, Simpson
    collision numerator sum(cnt^2) and distinct-value count, the exact
    ingredients of Gini impurity 1 - sum((cnt/n)^2) and collision
    probability (how skewed is each source's vocabulary; a near-
    degenerate source is a dedup/quality red flag). Runs entirely on
    the shared distinct-value histogram. Exact int64 while every
    per-(source, value) count stays < 3.0e9 (cnt^2 < 2^63 / 2^20
    distinct values) — at larger scale promote the finish to object
    ints; the histogram pass itself is scale-safe."""
    import pandas as pd

    hist = _source_token_hist(sf_dir)
    out = []
    for src, h in hist.groupby("source"):
        c = h["cnt"].to_numpy().astype(np.int64)
        out.append((src, int(c.sum()), int((c * c).sum()), len(c)))
    res = pd.DataFrame(out, columns=["source", "n", "sum_sq", "n_distinct"])
    return pa.Table.from_pandas(
        res.astype({"n": np.int64, "sum_sq": np.int64,
                    "n_distinct": np.int64}),
        preserve_index=False,
    )


GINI_TOKENS_SQL = (
    f"{_FLAT_CTE},"
    " c AS (SELECT source, tok, count(*) AS cnt FROM flat"
    "  GROUP BY source, tok)"
    " SELECT source, CAST(sum(cnt) AS BIGINT) AS n,"
    " CAST(sum(cnt * cnt) AS BIGINT) AS sum_sq,"
    " CAST(count(*) AS BIGINT) AS n_distinct"
    " FROM c GROUP BY source"
)


WINSOR_LO = 5    # lower winsorization percentile
WINSOR_HI = 95   # upper winsorization percentile


def q_winsorize_stats(sf_dir: str) -> "pa.Table":
    """Per-source winsorized statistics — exact p05/p95 token values
    (rank = ceil(q*n/100), the quality_deciles convention) from the
    shared value histogram, then the clipped sum and the clipped-tail
    counts WITHOUT a second corpus pass: sum(cnt * clip(tok)) over the
    histogram equals the row-level clipped sum. The robust-moments
    pass an outlier-resistant monitor wants before alerting on a
    source's level shift. All integers; wsum stays exact int64 while a
    source's token count is < 2^43 (n * 2^20 < 2^63)."""
    import pandas as pd

    hist = _source_token_hist(sf_dir)
    out = []
    for src, h in hist.groupby("source"):
        h = h.sort_values("tok")
        vals = h["tok"].to_numpy().astype(np.int64)
        c = h["cnt"].to_numpy().astype(np.int64)
        cum = np.cumsum(c)
        n = int(cum[-1])
        p05 = int(vals[np.searchsorted(
            cum, int(np.ceil(WINSOR_LO * n / 100.0)))])
        p95 = int(vals[np.searchsorted(
            cum, int(np.ceil(WINSOR_HI * n / 100.0)))])
        clipped = np.clip(vals, p05, p95)
        wsum = int((c * clipped).sum())
        n_low = int(c[vals < p05].sum())
        n_high = int(c[vals > p95].sum())
        out.append((src, p05, p95, n, wsum, n_low, n_high))
    res = pd.DataFrame(
        out, columns=["source", "p05", "p95", "n", "wsum",
                      "n_low", "n_high"]
    )
    return pa.Table.from_pandas(
        res.astype({k: np.int64 for k in res.columns if k != "source"}),
        preserve_index=False,
    )


WINSORIZE_SQL = (
    f"{_FLAT_CTE},"
    " c AS (SELECT source, tok, count(*) AS cnt FROM flat"
    "  GROUP BY source, tok),"
    " r AS (SELECT source, tok, cnt,"
    "  sum(cnt) OVER (PARTITION BY source ORDER BY tok) AS cum,"
    "  sum(cnt) OVER (PARTITION BY source) AS n FROM c),"
    " q AS (SELECT source,"
    "  min(CASE WHEN cum >="
    f"   CAST(ceil({WINSOR_LO} * n / 100.0) AS BIGINT)"
    "   THEN tok END) AS p05,"
    "  min(CASE WHEN cum >="
    f"   CAST(ceil({WINSOR_HI} * n / 100.0) AS BIGINT)"
    "   THEN tok END) AS p95"
    "  FROM r GROUP BY source)"
    " SELECT c.source, CAST(max(q.p05) AS BIGINT) AS p05,"
    " CAST(max(q.p95) AS BIGINT) AS p95,"
    " CAST(sum(c.cnt) AS BIGINT) AS n,"
    " CAST(sum(c.cnt * CASE WHEN c.tok < q.p05 THEN q.p05"
    "  WHEN c.tok > q.p95 THEN q.p95 ELSE c.tok END) AS BIGINT) AS wsum,"
    " CAST(coalesce(sum(CASE WHEN c.tok < q.p05 THEN c.cnt END), 0)"
    "  AS BIGINT) AS n_low,"
    " CAST(coalesce(sum(CASE WHEN c.tok > q.p95 THEN c.cnt END), 0)"
    "  AS BIGINT) AS n_high"
    " FROM c JOIN q ON c.source = q.source GROUP BY c.source"
)


MK_W = 64        # PAA bucket width for the trend test
MK_SPAN = 1024   # buckets come from the first MK_SPAN positions (<= 16)


def q_mann_kendall(sf_dir: str) -> "ray.data.Dataset":
    """Mann-Kendall trend statistic — the standard non-parametric
    monotone-trend test, per doc over <= 16 PAA floor-mean buckets of
    the first MK_SPAN positions: S = sum over bucket pairs i < j of
    sign(m_j - m_i); |S| near the pair count = strong trend. Buckets
    cut per-batch with ``tumble_starts`` on the per-doc clipped
    prefix; the pair sum is <= 15 vectorized shifted-sign passes over
    the concatenated bucket means (never a per-doc loop). Floor-means
    of non-negative tokens make numpy // == DuckDB //, so the
    self-join SQL twin is bit-exact. Docs with a single bucket emit
    nothing (no pairs), matching the SQL's inner join."""
    ds = _seq_ds(sf_dir)

    def stats(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        n_docs = len(off) - 1
        e = pa.array([], type=pa.int64())
        empty = pa.table(
            {"doc_id": pa.array([], type=pa.string()),
             "n_buckets": e, "s": e}
        )
        if n_docs == 0 or len(v) == 0:
            return empty
        n = np.diff(off)
        assert (n > 0).all(), "mann_kendall requires non-empty docs"
        pos_local = np.arange(len(v), dtype=np.int64) - np.repeat(off[:-1], n)
        kept = pos_local < MK_SPAN
        kv = v[kept]
        kn = np.minimum(n, MK_SPAN)
        koff = np.concatenate(([0], np.cumsum(kn)))
        starts, boff, cnt = tumble_starts(koff, MK_W)
        m = np.add.reduceat(kv, starts) // cnt
        nb = np.diff(boff)
        keep_doc = nb >= 2
        if not keep_doc.any():
            return empty
        doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), nb)
        s = np.zeros(n_docs, dtype=np.int64)
        max_nb = int(nb.max())
        for lag in range(1, max_nb):
            sg = np.sign(m[lag:] - m[:-lag])
            same = doc_of[lag:] == doc_of[:-lag]
            np.add.at(s, doc_of[:-lag][same], sg[same])
        return pa.table(
            {"doc_id": t["doc_id"].filter(pa.array(keep_doc)),
             "n_buckets": pa.array(nb[keep_doc].astype(np.int64)),
             "s": pa.array(s[keep_doc])}
        )

    return ds.map_batches(stats, batch_format="pyarrow", batch_size=256)


MANN_KENDALL_SQL = (
    f"{_FLAT_CTE},"
    f" p AS (SELECT doc_id, pos // {MK_W} AS b,"
    "  CAST(sum(tok) // count(*) AS BIGINT) AS m FROM flat"
    f"  WHERE pos < {MK_SPAN} GROUP BY doc_id, b),"
    " nb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_buckets"
    "  FROM p GROUP BY doc_id)"
    " SELECT a.doc_id, CAST(max(nb.n_buckets) AS BIGINT) AS n_buckets,"
    " CAST(sum(sign(c.m - a.m)) AS BIGINT) AS s"
    " FROM p a JOIN p c ON c.doc_id = a.doc_id AND c.b > a.b"
    " JOIN nb ON nb.doc_id = a.doc_id"
    " GROUP BY a.doc_id"
)


def q_interarrival_stats(sf_dir: str) -> "ray.data.Dataset":
    """Spike inter-arrival statistics — per doc, positions where the
    token exceeds TWICE the doc mean (cross-multiplied integer test
    n*tok > 2*S) are 'spikes'; report how many, where the first and
    last sit, and the longest quiet gap between consecutive spikes
    (the burstiness profile an alerting pipeline reads). One global
    exceedance mask per batch, then count/min/max/gap all fall out of
    reduceat over the spike subsequence; cross-doc gaps are zeroed by
    a segment-id comparison. Docs with no spikes emit nothing
    (matching the SQL's join); a single-spike doc reports max_gap 0
    (the SQL's coalesce)."""
    ds = _seq_ds(sf_dir)

    def stats(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        n_docs = len(off) - 1
        e = pa.array([], type=pa.int64())
        empty = pa.table(
            {"doc_id": pa.array([], type=pa.string()), "n_spikes": e,
             "first_pos": e, "last_pos": e, "max_gap": e}
        )
        if n_docs == 0 or len(v) == 0:
            return empty
        n = np.diff(off)
        assert (n > 0).all(), "interarrival_stats requires non-empty docs"
        s = np.add.reduceat(v, off[:-1])
        seg = np.repeat(np.arange(n_docs, dtype=np.int64), n)
        pos_local = np.arange(len(v), dtype=np.int64) - np.repeat(off[:-1], n)
        spike = np.repeat(n, n) * v > 2 * np.repeat(s, n)  # |n*tok| < 2^37
        g = np.flatnonzero(spike)
        if len(g) == 0:
            return empty
        seg_sp, pos_sp = seg[g], pos_local[g]
        counts = np.bincount(seg_sp, minlength=n_docs)
        kept = counts > 0
        soff = np.concatenate(([0], np.cumsum(counts[kept])))
        first = np.minimum.reduceat(pos_sp, soff[:-1])
        last = np.maximum.reduceat(pos_sp, soff[:-1])
        gaps = np.where(seg_sp[1:] == seg_sp[:-1],
                        pos_sp[1:] - pos_sp[:-1], 0)
        max_gap = np.maximum.reduceat(np.concatenate((gaps, [0])),
                                      soff[:-1])
        return pa.table(
            {"doc_id": t["doc_id"].filter(pa.array(kept)),
             "n_spikes": pa.array(counts[kept].astype(np.int64)),
             "first_pos": pa.array(first), "last_pos": pa.array(last),
             "max_gap": pa.array(max_gap)}
        )

    return ds.map_batches(stats, batch_format="pyarrow", batch_size=256)


INTERARRIVAL_SQL = (
    f"{_FLAT_CTE},"
    " agg AS (SELECT doc_id, count(*) AS n, sum(tok) AS s FROM flat"
    "  GROUP BY doc_id),"
    " sp AS (SELECT f.doc_id, f.pos,"
    "  lead(f.pos) OVER (PARTITION BY f.doc_id ORDER BY f.pos) AS nxt"
    "  FROM flat f JOIN agg a ON f.doc_id = a.doc_id"
    "  WHERE a.n * f.tok > 2 * a.s)"
    " SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spikes,"
    " CAST(min(pos) AS BIGINT) AS first_pos,"
    " CAST(max(pos) AS BIGINT) AS last_pos,"
    " CAST(coalesce(max(nxt - pos), 0) AS BIGINT) AS max_gap"
    " FROM sp GROUP BY doc_id"
)


RARE_MAX_COUNT = 2   # a token value is 'rare' if its GLOBAL count <= this


def q_rare_token_docs(sf_dir: str) -> "ray.data.Dataset":
    """Rare-token audit — which docs carry token values whose GLOBAL
    corpus count is <= RARE_MAX_COUNT (OOV-ish outliers: encoding
    glitches, PII-like uniques, or genuinely novel content worth
    up- or down-sampling)? Two passes: (1) a distinct-value-sized
    global histogram (per-batch np.unique partials + one groupby),
    filtered to the rare set — bounded by the 2^TOKEN_BITS vocab, so
    it broadcasts at ANY corpus size even though it must not be
    computed driver-side from raw rows; (2) one streaming scan
    counting rare positions and distinct rare values per doc via
    searchsorted against the broadcast sorted array. Docs without
    rare tokens emit nothing (matching the SQL join)."""
    from ray.data.aggregate import Sum

    def hist_partial(t: pa.Table) -> pa.Table:
        vals, _ = list_to_numpy(t["tokens"])
        uk, cnt = np.unique(vals.astype(np.int64), return_counts=True)
        return pa.table(
            {"tok": pa.array(uk), "cnt": pa.array(cnt.astype(np.int64))}
        )

    hist = (
        _seq_ds(sf_dir)
        .map_batches(hist_partial, batch_format="pyarrow", batch_size=256)
        .groupby("tok")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()  # vocab-bounded: <= 2^TOKEN_BITS rows
    )
    rare = np.sort(
        hist.loc[hist["cnt"].to_numpy() <= RARE_MAX_COUNT, "tok"]
        .to_numpy().astype(np.int64)
    )
    rare_ref = ray.put(rare)

    def scan(t: pa.Table) -> pa.Table:
        r = ray.get(rare_ref)
        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        n_docs = len(off) - 1
        e = pa.array([], type=pa.int64())
        empty = pa.table(
            {"doc_id": pa.array([], type=pa.string()),
             "n_rare": e, "n_distinct_rare": e}
        )
        if n_docs == 0 or len(v) == 0 or len(r) == 0:
            return empty
        n = np.diff(off)
        i = np.minimum(np.searchsorted(r, v), len(r) - 1)
        is_rare = r[i] == v
        seg = np.repeat(np.arange(n_docs, dtype=np.int64), n)
        counts = np.bincount(seg[is_rare], minlength=n_docs)
        kept = counts > 0
        if not kept.any():
            return empty
        key = (seg[is_rare] << TOKEN_BITS) | v[is_rare]
        useg = np.unique(key) >> TOKEN_BITS
        nd = np.bincount(useg, minlength=n_docs)
        return pa.table(
            {"doc_id": t["doc_id"].filter(pa.array(kept)),
             "n_rare": pa.array(counts[kept].astype(np.int64)),
             "n_distinct_rare": pa.array(nd[kept].astype(np.int64))}
        )

    return _seq_ds(sf_dir).map_batches(scan, batch_format="pyarrow",
                                       batch_size=256)


RARE_TOKEN_SQL = (
    f"{_FLAT_CTE},"
    " g AS (SELECT tok, count(*) AS c FROM flat GROUP BY tok),"
    f" r AS (SELECT tok FROM g WHERE c <= {RARE_MAX_COUNT})"
    " SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n_rare,"
    " CAST(count(DISTINCT f.tok) AS BIGINT) AS n_distinct_rare"
    " FROM flat f JOIN r ON f.tok = r.tok GROUP BY f.doc_id"
)


def q_zipf_hist(sf_dir: str) -> "pa.Table":
    """Count-of-counts (Zipf tail) audit — per source, bucket the
    distinct token values by the BIT LENGTH of their global-in-source
    count and report how many values and how many token occurrences
    each doubling bucket holds. The log-log shape this table draws is
    the standard check that a corpus' vocabulary follows the expected
    power law (a missing tail = over-aggressive filtering; a fat head
    = degenerate repetition). Runs on the shared distinct-value
    histogram; bit_length is exact integer math on both sides (the
    SQL twin uses length(bin(cnt)) — no float log2 anywhere)."""
    import pandas as pd

    hist = _source_token_hist(sf_dir)
    c = hist["cnt"].to_numpy().astype(np.int64)
    bl = np.array([int(x).bit_length() for x in c], dtype=np.int64)
    df = pd.DataFrame({"source": hist["source"], "bl": bl, "cnt": c})
    out = (
        df.groupby(["source", "bl"], as_index=False)
        .agg(n_values=("cnt", "size"), n_tokens=("cnt", "sum"))
    )
    return pa.Table.from_pandas(
        out.astype({"bl": np.int64, "n_values": np.int64,
                    "n_tokens": np.int64}),
        preserve_index=False,
    )


ZIPF_HIST_SQL = (
    f"{_FLAT_CTE},"
    " c AS (SELECT source, tok, count(*) AS cnt FROM flat"
    "  GROUP BY source, tok)"
    " SELECT source, CAST(length(bin(cnt)) AS BIGINT) AS bl,"
    " CAST(count(*) AS BIGINT) AS n_values,"
    " CAST(sum(cnt) AS BIGINT) AS n_tokens"
    " FROM c GROUP BY source, bl"
)


def q_vocab_overlap(sf_dir: str) -> "pa.Table":
    """Cross-source vocabulary overlap — for every ordered source pair
    the intersection size of their DISTINCT token-value sets plus both
    set sizes (the exact Jaccard ingredients). The domain-similarity
    audit that decides whether two sources can share a tokenizer /
    mixture bucket. Finishes on the shared vocab-bounded histogram:
    per source a sorted distinct-value array, pairwise intersection
    via np.intersect1d — never a corpus-sized join (the SQL twin's
    self-join is the semantics, not the plan)."""
    import pandas as pd

    hist = _source_token_hist(sf_dir)
    vocab = {
        src: np.sort(h["tok"].to_numpy().astype(np.int64))
        for src, h in hist.groupby("source")
    }
    out = []
    for a in sorted(vocab):
        for b in sorted(vocab):
            if b <= a:
                continue
            inter = len(np.intersect1d(vocab[a], vocab[b],
                                       assume_unique=True))
            if inter == 0:
                continue  # the SQL's inner join emits no zero-overlap row
            out.append((a, b, inter, len(vocab[a]), len(vocab[b])))
    res = pd.DataFrame(
        out, columns=["src_a", "src_b", "n_common", "n_a", "n_b"]
    )
    return pa.Table.from_pandas(
        res.astype({"n_common": np.int64, "n_a": np.int64,
                    "n_b": np.int64}),
        preserve_index=False,
    )


VOCAB_OVERLAP_SQL = (
    f"{_FLAT_CTE},"
    " v AS (SELECT DISTINCT source, tok FROM flat),"
    " n AS (SELECT source, CAST(count(*) AS BIGINT) AS nv FROM v"
    "  GROUP BY source)"
    " SELECT a.source AS src_a, b.source AS src_b,"
    " CAST(count(*) AS BIGINT) AS n_common,"
    " CAST(max(na.nv) AS BIGINT) AS n_a, CAST(max(nb.nv) AS BIGINT) AS n_b"
    " FROM v a JOIN v b ON b.source > a.source AND b.tok = a.tok"
    " JOIN n na ON na.source = a.source JOIN n nb ON nb.source = b.source"
    " GROUP BY src_a, src_b"
)


def q_total_variation(sf_dir: str) -> "ray.data.Dataset":
    """Per-doc total variation — sum and max of |first difference|, the
    signal-roughness pair (a flat retention tier compresses a low-TV
    doc to nothing; a high max_step flags discontinuities the gap-fill
    stage should not interpolate across). One global diff per batch,
    doc-boundary pairs masked, two reduceat passes. TV < n * 2^20 so
    int64 is exact for any doc length < 2^43. Docs with one token emit
    nothing (no pairs, matching the SQL's non-null lag filter)."""
    ds = _seq_ds(sf_dir)

    def stats(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        n_docs = len(off) - 1
        e = pa.array([], type=pa.int64())
        empty = pa.table(
            {"doc_id": pa.array([], type=pa.string()), "n": e,
             "tv": e, "max_step": e}
        )
        if n_docs == 0 or len(v) == 0:
            return empty
        n = np.diff(off)
        assert (n > 0).all(), "total_variation requires non-empty docs"
        kept = n >= 2
        if not kept.any():
            return empty
        seg = np.repeat(np.arange(n_docs, dtype=np.int64), n)
        d = np.abs(v[1:] - v[:-1])
        d = np.where(seg[1:] == seg[:-1], d, 0)
        d = np.concatenate((d, [0]))  # pad to len(v) for reduceat
        tv = np.add.reduceat(d, off[:-1])
        ms = np.maximum.reduceat(d, off[:-1])
        return pa.table(
            {"doc_id": t["doc_id"].filter(pa.array(kept)),
             "n": pa.array(n[kept].astype(np.int64)),
             "tv": pa.array(tv[kept]), "max_step": pa.array(ms[kept])}
        )

    return ds.map_batches(stats, batch_format="pyarrow", batch_size=256)


TOTAL_VARIATION_SQL = (
    f"{_FLAT_CTE},"
    " l AS (SELECT doc_id, abs(tok - lag(tok) OVER"
    "  (PARTITION BY doc_id ORDER BY pos)) AS d FROM flat)"
    " SELECT doc_id, CAST(count(*) + 1 AS BIGINT) AS n,"
    " CAST(sum(d) AS BIGINT) AS tv, CAST(max(d) AS BIGINT) AS max_step"
    " FROM l WHERE d IS NOT NULL GROUP BY doc_id"
)


# Gorilla §4.1.1 total cost per timestamp: 1 control bit for dod == 0,
# else control prefix + value bits per DOD_BOUNDS class, else 4 + 32
DOD_CLASS_BITS = (1, 9, 12, 16, 36)


def q_doc_compress_bits(sf_dir: str) -> "ray.data.Dataset":
    """Per-doc compressibility forecast — the exact delta-of-delta
    payload size (in bits) each sequence would occupy under the
    Gorilla budget the tier encoder uses, BEFORE encoding anything:
    classify every second difference into its DOD_BOUNDS width class
    and sum DOD_CLASS_BITS per doc. The sizing signal a placement
    planner reads to pack cold tiers. Same one-pass masked
    second-difference as dod_width_hist, finished per doc (reduceat)
    instead of per source. Docs with fewer than 3 tokens emit nothing
    (no second difference exists, matching the SQL's lag filter)."""
    ds = _seq_ds(sf_dir)

    def stats(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        n_docs = len(off) - 1
        e = pa.array([], type=pa.int64())
        empty = pa.table(
            {"doc_id": pa.array([], type=pa.string()), "n_dod": e,
             "dod_bits": e}
        )
        if n_docs == 0 or len(v) < 3:
            return empty
        n = np.diff(off)
        kept = n >= 3
        if not kept.any():
            return empty
        seg = np.repeat(np.arange(n_docs, dtype=np.int64), n)
        dd = np.diff(v, n=2)
        valid = seg[: len(dd)] == seg[2:]
        bits = np.full(len(dd), DOD_CLASS_BITS[-1], dtype=np.int64)
        for k, (lo, hi) in enumerate(reversed(DOD_BOUNDS)):
            idx = len(DOD_BOUNDS) - k
            bits[(dd >= lo) & (dd <= hi)] = DOD_CLASS_BITS[idx]
        bits[dd == 0] = DOD_CLASS_BITS[0]
        bits = np.where(valid, bits, 0)
        bits = np.concatenate((bits, [0, 0]))  # pad to len(v)
        total = np.add.reduceat(bits, off[:-1])
        return pa.table(
            {"doc_id": t["doc_id"].filter(pa.array(kept)),
             "n_dod": pa.array((n[kept] - 2).astype(np.int64)),
             "dod_bits": pa.array(total[kept])}
        )

    return ds.map_batches(stats, batch_format="pyarrow", batch_size=256)


def _doc_compress_sql() -> str:
    cases = " ".join(
        f"WHEN dod >= {lo} AND dod <= {hi} THEN {DOD_CLASS_BITS[i + 1]}"
        for i, (lo, hi) in enumerate(DOD_BOUNDS)
    )
    return (
        f"{_FLAT_CTE},"
        " l AS (SELECT doc_id, tok,"
        "  lag(tok) OVER w AS p1, lag(tok, 2) OVER w AS p2 FROM flat"
        "  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),"
        " d AS (SELECT doc_id, tok - 2 * p1 + p2 AS dod FROM l"
        "  WHERE p2 IS NOT NULL)"
        " SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dod,"
        f" CAST(sum(CASE WHEN dod = 0 THEN {DOD_CLASS_BITS[0]} {cases}"
        f"  ELSE {DOD_CLASS_BITS[-1]} END) AS BIGINT) AS dod_bits"
        " FROM d GROUP BY doc_id"
    )


DOC_COMPRESS_SQL = _doc_compress_sql()


def q_benford_digits(sf_dir: str) -> "pa.Table":
    """Benford first-digit audit — per source, the leading-digit
    histogram of the token values, both over distinct values
    (n_values) and occurrence-weighted (n_tokens). A synthetic or
    duplicated corpus whose digit distribution collapses to a few
    spikes fails the naturalness check real measurement data passes.
    Finishes on the shared vocab-bounded (source, tok, cnt) histogram
    — no extra corpus pass; the leading digit is exact integer math
    (repeated //10, at most 7 steps for tok < 2^20) on the engine
    side and substr on the SQL side. Zero tokens carry no leading
    digit and are excluded on both sides."""
    import pandas as pd

    hist = _source_token_hist(sf_dir)
    hist = hist[hist["tok"] >= 1]
    d = hist["tok"].to_numpy().astype(np.int64).copy()
    while (d >= 10).any():
        big = d >= 10
        d[big] //= 10
    df = pd.DataFrame(
        {"source": hist["source"], "digit": d,
         "cnt": hist["cnt"].to_numpy().astype(np.int64)}
    )
    out = (
        df.groupby(["source", "digit"], as_index=False)
        .agg(n_values=("cnt", "size"), n_tokens=("cnt", "sum"))
    )
    return pa.Table.from_pandas(
        out.astype({"digit": np.int64, "n_values": np.int64,
                    "n_tokens": np.int64}),
        preserve_index=False,
    )


BENFORD_SQL = (
    f"{_FLAT_CTE},"
    " c AS (SELECT source, tok, count(*) AS cnt FROM flat"
    "  WHERE tok >= 1 GROUP BY source, tok)"
    " SELECT source,"
    " CAST(substr(CAST(tok AS VARCHAR), 1, 1) AS BIGINT) AS digit,"
    " CAST(count(*) AS BIGINT) AS n_values,"
    " CAST(sum(cnt) AS BIGINT) AS n_tokens"
    " FROM c GROUP BY source, digit"
)


def q_hurst_rs(sf_dir: str) -> "ray.data.Dataset":
    """Per-doc rescaled-range (Hurst) ingredients — the R/S statistic's
    exact integer numerator and the variance ingredients, so the
    consumer computes H = log(R/S)/log(n) with one division away from
    BIGINT-exact inputs. R is the range of cumulative deviations from
    the doc mean; scaling by n keeps it integral:
    n * prefix_k - (k+1) * sum == n * (prefix_k - (k+1) * mean).
    Magnitudes: n < 2^16, prefix < 2^36, so both products < 2^52 —
    int64-safe. One pass per batch: a global cumsum with per-doc bases
    subtracted (no per-doc loop), max/min via reduceat. Long-memory
    (trending) token streams score H near 1, i.i.d. streams near 0.5
    — the persistence audit a retention planner reads to pick tier
    depth per source."""
    ds = _seq_ds(sf_dir)

    def stats(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        n_docs = len(off) - 1
        e = pa.array([], type=pa.int64())
        if n_docs == 0 or len(v) == 0:
            return pa.table(
                {"doc_id": pa.array([], type=pa.string()),
                 "n": e, "s": e, "q": e, "r_scaled": e}
            )
        n = np.diff(off)
        assert (n > 0).all(), "hurst_rs requires non-empty docs"
        c = np.cumsum(v)
        base = c[off[:-1]] - v[off[:-1]]  # cumsum before each doc start
        prefix = c - np.repeat(base, n)
        s = np.add.reduceat(v, off[:-1])
        q = np.add.reduceat(v * v, off[:-1])
        k1 = np.arange(len(v), dtype=np.int64) - np.repeat(off[:-1], n) + 1
        term = np.repeat(n.astype(np.int64), n) * prefix \
            - k1 * np.repeat(s, n)
        r = np.maximum.reduceat(term, off[:-1]) \
            - np.minimum.reduceat(term, off[:-1])
        return pa.table(
            {"doc_id": t["doc_id"], "n": pa.array(n.astype(np.int64)),
             "s": pa.array(s), "q": pa.array(q), "r_scaled": pa.array(r)}
        )

    return ds.map_batches(stats, batch_format="pyarrow", batch_size=256)


HURST_RS_SQL = (
    f"{_FLAT_CTE},"
    " w AS (SELECT doc_id, pos,"
    "  sum(tok) OVER (PARTITION BY doc_id ORDER BY pos"
    "   ROWS UNBOUNDED PRECEDING) AS prefix,"
    "  count(*) OVER (PARTITION BY doc_id) AS n,"
    "  sum(tok) OVER (PARTITION BY doc_id) AS s,"
    "  sum(tok * tok) OVER (PARTITION BY doc_id) AS q FROM flat)"
    " SELECT doc_id, CAST(max(n) AS BIGINT) AS n,"
    " CAST(max(s) AS BIGINT) AS s, CAST(max(q) AS BIGINT) AS q,"
    " CAST(max(n * prefix - (pos + 1) * s)"
    "  - min(n * prefix - (pos + 1) * s) AS BIGINT) AS r_scaled"
    " FROM w GROUP BY doc_id"
)


VR_K = 8  # variance-ratio aggregation factor (tokens per bucket)


def q_variance_ratio(sf_dir: str) -> "ray.data.Dataset":
    """Per-doc variance-ratio (Lo–MacKinlay) ingredients — the
    stationarity test that compares the variance of VR_K-aggregated
    bucket sums against VR_K times the token variance, over the same
    truncated range (complete buckets only). BIGINT-exact outputs: m
    (bucket count), sb (= token sum over the first m*VR_K tokens),
    qb (sum of squared bucket sums) and qx (sum of squared tokens);
    the consumer computes VR = (m*qb - sb^2) / (VR_K * (n'*qx - sb^2))
    one division away. A random-walk stream scores VR near 1,
    mean-reverting below, trending above — the classic check before
    trusting a tier's downsample to preserve variance. Magnitudes:
    bucket sum < 2^23, qb < 2^13 * 2^46 = 2^59 — int64-safe. Bucket
    sums via one reduceat over vectorized per-doc stride-8 offsets
    (no per-doc loop). Docs shorter than VR_K emit nothing."""
    ds = _seq_ds(sf_dir)

    def stats(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        n_docs = len(off) - 1
        e = pa.array([], type=pa.int64())
        empty = pa.table(
            {"doc_id": pa.array([], type=pa.string()), "m": e,
             "sb": e, "qb": e, "qx": e}
        )
        if n_docs == 0 or len(v) == 0:
            return empty
        n = np.diff(off)
        m = n // VR_K
        kept = m >= 1
        if not kept.any():
            return empty
        # stride-VR_K bucket start offsets, all docs at once
        mk = m[kept]
        startk = off[:-1][kept]
        bucket_doc_start = np.repeat(
            np.concatenate(([0], np.cumsum(mk)))[:-1], mk
        )
        starts = np.repeat(startk, mk) \
            + VR_K * (np.arange(mk.sum(), dtype=np.int64)
                      - bucket_doc_start)
        # reduceat over [start, start+VR_K) needs interleaved bounds;
        # sum each bucket via cumsum differences instead (exact int64)
        c = np.concatenate(([0], np.cumsum(v)))
        b = c[starts + VR_K] - c[starts]
        bdoc_off = np.concatenate(([0], np.cumsum(mk)))[:-1]
        sb = np.add.reduceat(b, bdoc_off)
        qb = np.add.reduceat(b * b, bdoc_off)
        # token sum of squares over the truncated range only
        q_all = np.concatenate(([0], np.cumsum(v * v)))
        qx = q_all[startk + mk * VR_K] - q_all[startk]
        return pa.table(
            {"doc_id": t["doc_id"].filter(pa.array(kept)),
             "m": pa.array(mk.astype(np.int64)), "sb": pa.array(sb),
             "qb": pa.array(qb), "qx": pa.array(qx)}
        )

    return ds.map_batches(stats, batch_format="pyarrow", batch_size=256)


VARIANCE_RATIO_SQL = (
    f"{_FLAT_CTE},"
    " w AS (SELECT doc_id, pos, tok,"
    "  count(*) OVER (PARTITION BY doc_id) AS n FROM flat),"
    f" t AS (SELECT doc_id, pos, tok, pos // {VR_K} AS b FROM w"
    f"  WHERE pos < {VR_K} * (n // {VR_K})),"
    " bk AS (SELECT doc_id, b, sum(tok) AS bs, sum(tok * tok) AS bq"
    "  FROM t GROUP BY doc_id, b)"
    " SELECT doc_id, CAST(count(*) AS BIGINT) AS m,"
    " CAST(sum(bs) AS BIGINT) AS sb,"
    " CAST(sum(bs * bs) AS BIGINT) AS qb,"
    " CAST(sum(bq) AS BIGINT) AS qx"
    " FROM bk GROUP BY doc_id"
)


def q_runs_test(sf_dir: str) -> "ray.data.Dataset":
    """Per-doc Wald–Wolfowitz runs test ingredients — the lower median
    (the element at sorted index (n-1)//2, == DuckDB quantile_disc 0.5),
    the counts above/below it, and the number of RUNS in the
    above/below sign sequence with ties-to-median excluded. The
    z-statistic is one formula away from these BIGINT-exact counts; a
    token stream with too few runs is trending/segmented, too many is
    oscillating — the randomness audit for synthetic-data QA. The
    per-doc median costs ONE global np.sort per batch via the lift
    trick (seg << TOKEN_BITS | token sorts each doc's values
    contiguously in place); runs are counted over consecutive kept
    (non-tie) positions whose sign flips, vectorized across docs."""
    ds = _seq_ds(sf_dir)

    def stats(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        n_docs = len(off) - 1
        e = pa.array([], type=pa.int64())
        if n_docs == 0 or len(v) == 0:
            return pa.table(
                {"doc_id": pa.array([], type=pa.string()), "n": e,
                 "med": e, "n_above": e, "n_below": e, "n_runs": e}
            )
        if int(v.max()) >= (1 << TOKEN_BITS) or int(v.min()) < 0:
            raise ValueError(
                "runs_test's lift-sort needs tokens in "
                f"[0, 2^{TOKEN_BITS})"
            )
        n = np.diff(off)
        assert (n > 0).all(), "runs_test requires non-empty docs"
        seg = np.repeat(np.arange(n_docs, dtype=np.int64), n)
        lifted = np.sort((seg << TOKEN_BITS) | v)
        med = (lifted[off[:-1] + (n - 1) // 2]
               & ((1 << TOKEN_BITS) - 1))
        med_rep = np.repeat(med, n)
        above = v > med_rep
        keep = v != med_rep
        n_above = np.add.reduceat(
            above.astype(np.int64), off[:-1]
        )
        n_kept = np.add.reduceat(keep.astype(np.int64), off[:-1])
        n_below = n_kept - n_above
        # runs over kept positions: consecutive kept pair in the SAME
        # doc with a sign flip starts a new run
        ki = np.flatnonzero(keep)
        if len(ki) == 0:
            n_runs = np.zeros(n_docs, dtype=np.int64)
        else:
            same_doc = seg[ki[1:]] == seg[ki[:-1]]
            flip = above[ki[1:]] != above[ki[:-1]]
            trans = np.zeros(len(v), dtype=np.int64)
            trans[ki[1:]] = (same_doc & flip).astype(np.int64)
            pad = np.concatenate((trans, [0]))
            n_trans = np.add.reduceat(pad, off[:-1])[:n_docs]
            n_runs = np.where(n_kept > 0, n_trans + 1, 0)
        return pa.table(
            {"doc_id": t["doc_id"], "n": pa.array(n.astype(np.int64)),
             "med": pa.array(med), "n_above": pa.array(n_above),
             "n_below": pa.array(n_below), "n_runs": pa.array(n_runs)}
        )

    return ds.map_batches(stats, batch_format="pyarrow", batch_size=256)


RUNS_TEST_SQL = (
    f"{_FLAT_CTE},"
    " md AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n,"
    "  CAST(quantile_disc(tok, 0.5) AS BIGINT) AS med FROM flat"
    "  GROUP BY doc_id),"
    " k AS (SELECT f.doc_id, f.pos, f.tok > md.med AS above"
    "  FROM flat f JOIN md ON md.doc_id = f.doc_id"
    "  WHERE f.tok <> md.med),"
    " r AS (SELECT doc_id,"
    "  CAST(sum(CASE WHEN above THEN 1 ELSE 0 END) AS BIGINT)"
    "   AS n_above,"
    "  CAST(sum(CASE WHEN above THEN 0 ELSE 1 END) AS BIGINT)"
    "   AS n_below,"
    "  CAST(1 + sum(CASE WHEN flip THEN 1 ELSE 0 END) AS BIGINT)"
    "   AS n_runs"
    "  FROM (SELECT doc_id, above, above <>"
    "   lag(above) OVER (PARTITION BY doc_id ORDER BY pos) AS flip"
    "   FROM k) GROUP BY doc_id)"
    " SELECT md.doc_id, md.n, md.med,"
    " COALESCE(r.n_above, 0) AS n_above,"
    " COALESCE(r.n_below, 0) AS n_below,"
    " COALESCE(r.n_runs, 0) AS n_runs"
    " FROM md LEFT JOIN r ON r.doc_id = md.doc_id"
)


def q_ks_sources(sf_dir: str) -> "pa.Table":
    """Two-sample Kolmogorov–Smirnov drift statistic for every source
    pair — the max absolute ECDF gap over token values, kept exact by
    cross-multiplying counts instead of dividing:
    d_num = max_v |cum_a(v) * n_b - cum_b(v) * n_a| == n_a*n_b*D.
    The distribution-shift gate a mixture planner runs before pooling
    two sources into one training bucket (KS is sensitive where
    source_drift's top-K token deltas are not: shape, not heads).
    Finishes on the shared vocab-bounded histogram: per source a
    cumulative count over the UNION value grid (ECDF gaps are attained
    at observed values), pairwise max — sources x vocab rows, never
    the corpus. Exact while cum * n < 2^63 (n per source < 3e9 at
    vocab 2^20 — far past any per-shard batch)."""
    import pandas as pd

    hist = _source_token_hist(sf_dir)
    toks = np.sort(hist["tok"].unique().astype(np.int64))
    srcs = sorted(hist["source"].unique())
    cums, ns = {}, {}
    for src, h in hist.groupby("source"):
        counts = np.zeros(len(toks), dtype=np.int64)
        idx = np.searchsorted(toks, h["tok"].to_numpy().astype(np.int64))
        counts[idx] = h["cnt"].to_numpy().astype(np.int64)
        cums[src] = np.cumsum(counts)
        ns[src] = int(counts.sum())
    out = []
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            d = np.abs(cums[a] * ns[b] - cums[b] * ns[a]).max()
            out.append((a, b, ns[a], ns[b], int(d)))
    return pa.table(
        {"src_a": pa.array([r[0] for r in out], type=pa.string()),
         "src_b": pa.array([r[1] for r in out], type=pa.string()),
         "n_a": pa.array([r[2] for r in out], type=pa.int64()),
         "n_b": pa.array([r[3] for r in out], type=pa.int64()),
         "d_num": pa.array([r[4] for r in out], type=pa.int64())}
    )


KS_SOURCES_SQL = (
    f"{_FLAT_CTE},"
    " c AS (SELECT source, tok, count(*) AS cnt FROM flat"
    "  GROUP BY source, tok),"
    " n AS (SELECT source, sum(cnt) AS n FROM c GROUP BY source),"
    " grid AS (SELECT s.source, t.tok"
    "  FROM (SELECT DISTINCT source FROM c) s"
    "  CROSS JOIN (SELECT DISTINCT tok FROM c) t),"
    " cum AS (SELECT g.source, g.tok,"
    "  sum(COALESCE(c.cnt, 0)) OVER (PARTITION BY g.source"
    "   ORDER BY g.tok) AS cum"
    "  FROM grid g LEFT JOIN c ON c.source = g.source"
    "   AND c.tok = g.tok)"
    " SELECT a.source AS src_a, b.source AS src_b,"
    " CAST(max(na.n) AS BIGINT) AS n_a,"
    " CAST(max(nb.n) AS BIGINT) AS n_b,"
    " CAST(max(abs(a.cum * nb.n - b.cum * na.n)) AS BIGINT) AS d_num"
    " FROM cum a JOIN cum b ON b.source > a.source AND b.tok = a.tok"
    " JOIN n na ON na.source = a.source"
    " JOIN n nb ON nb.source = b.source"
    " GROUP BY src_a, src_b"
)


def q_bigram_diversity(sf_dir: str) -> "pa.Table":
    """Per-source token-BIGRAM diversity — total bigram occurrences,
    distinct bigrams, and the Simpson collision numerator
    sum(cnt * (cnt - 1)): the sequential-repetition complement to
    gini_tokens' marginal concentration (a looping generator shows up
    here long before its unigram histogram degrades). One corpus pass
    of per-batch packed-key partials ((b1 << 20) | b2 — exact for
    tokens < 2^20), then ONE distinct-bigram-sized groupby exchange
    (data-bounded: at most one distinct bigram per occurrence, in
    practice Zipf-collapsed far below it) and a per-source finish on
    the histogram — the corpus itself is never shuffled."""
    import pandas as pd

    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        n_docs = len(off) - 1
        if n_docs == 0 or len(v) < 2:
            return pa.table(
                {"source": pa.array([], type=pa.string()),
                 "key": pa.array([], type=pa.int64()),
                 "cnt": pa.array([], type=pa.int64())}
            )
        if int(v.max()) >= (1 << TOKEN_BITS) or int(v.min()) < 0:
            raise ValueError(
                "bigram_diversity packs (b1, b2) into one int64 key; "
                f"tokens must be in [0, 2^{TOKEN_BITS})"
            )
        n = np.diff(off)
        seg = np.repeat(np.arange(n_docs, dtype=np.int64), n)
        srcs = sorted(set(t["source"].to_pylist()))
        src_idx = pc.index_in(
            t["source"], value_set=pa.array(srcs)
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        within = seg[1:] == seg[:-1]
        key = (v[:-1] << TOKEN_BITS) | v[1:]
        skey = (np.repeat(src_idx, n)[:-1] << (2 * TOKEN_BITS)) | key
        skey = skey[within]
        uk, cnt = np.unique(skey, return_counts=True)
        src_names = np.array(srcs, dtype=object)[uk >> (2 * TOKEN_BITS)]
        return pa.table(
            {"source": pa.array(src_names, type=pa.string()),
             "key": pa.array(uk & ((1 << (2 * TOKEN_BITS)) - 1)),
             "cnt": pa.array(cnt.astype(np.int64))}
        )

    # A Ray .aggregate() here would walk millions of near-distinct
    # (source, bigram) groups in Python (~100 s at sf0.01); instead fold
    # inside COARSE hash partitions (the _value_counts_by_source trick):
    # every distinct (source, bigram) lands in exactly one part, so the
    # within-part pandas groupby yields GLOBAL bigram counts and the
    # per-source (total, unique, simpson) partials it emits are exact —
    # the only Ray exchange is a 64-group sort, and the final groupby
    # merges parts x sources rows.
    n_parts = 64

    def add_part(t: pa.Table) -> pa.Table:
        key = t["key"].to_numpy(zero_copy_only=False)
        mixed = (key >> TOKEN_BITS) ^ key  # spread Zipf-hot b1 prefixes
        return t.append_column(
            "part", pa.array((mixed % n_parts).astype(np.int32))
        )

    def fold(df: "pd.DataFrame") -> "pd.DataFrame":
        g = df.groupby(["source", "key"], as_index=False)["cnt"].sum()
        g["coll"] = g["cnt"] * (g["cnt"] - 1)
        out = g.groupby("source", as_index=False).agg(
            t_bigrams=("cnt", "sum"), u_bigrams=("cnt", "size"),
            simpson_num=("coll", "sum"))
        return out.astype({"t_bigrams": np.int64, "u_bigrams": np.int64,
                           "simpson_num": np.int64})

    out = (
        _seq_ds(sf_dir)
        .map_batches(partial, batch_format="pyarrow", batch_size=256)
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(fold, batch_format="pandas")
        .groupby("source")
        .aggregate(Sum("t_bigrams", alias_name="t_bigrams"),
                   Sum("u_bigrams", alias_name="u_bigrams"),
                   Sum("simpson_num", alias_name="simpson_num"))
        .to_pandas()  # sources-sized
    )
    return pa.Table.from_pandas(out, preserve_index=False)


BIGRAM_DIVERSITY_SQL = (
    f"{_FLAT_CTE},"
    " b AS (SELECT f.source, f.tok AS b1, g.tok AS b2"
    "  FROM flat f JOIN flat g ON g.doc_id = f.doc_id"
    "   AND g.pos = f.pos + 1),"
    " c AS (SELECT source, b1, b2, count(*) AS cnt FROM b"
    "  GROUP BY source, b1, b2)"
    " SELECT source, CAST(sum(cnt) AS BIGINT) AS t_bigrams,"
    " CAST(count(*) AS BIGINT) AS u_bigrams,"
    " CAST(sum(cnt * (cnt - 1)) AS BIGINT) AS simpson_num"
    " FROM c GROUP BY source"
)


TS_GRID = 64  # Theil-Sen bucket grid (pairs per doc = C(64,2) = 2016)


def q_theil_sen(sf_dir: str) -> "ray.data.Dataset":
    """Per-doc Theil–Sen robust trend — the median of all pairwise
    slopes between the TS_GRID bucket-sum points (j, b_j), immune to
    the outlier spikes that wreck a least-squares slope (the trend
    estimate a retention planner trusts on dirty telemetry). Exact and
    hash-stable: the slope is returned as the BIGINT fraction
    (slope_num, slope_den) of the LOWER-median pair under the total
    order (value, num, den) — value ordering by float64 is exact here
    because distinct fractions with |num| < 2^31 and den < 64 differ
    by >= 1/4096, far above ulp. Buckets are w = n // 64 tokens wide
    (complete buckets only; docs shorter than 64 emit nothing), bucket
    sums come from one global cumsum gather, and ALL docs' 2016 pairs
    rank in ONE np.lexsort — no per-doc loop anywhere."""
    ds = _seq_ds(sf_dir)
    ji, ki = np.triu_indices(TS_GRID, k=1)
    den0 = (ki - ji).astype(np.int64)
    n_pairs = len(den0)  # 2016
    med_rank = (n_pairs - 1) // 2

    def stats(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        n_docs = len(off) - 1
        e = pa.array([], type=pa.int64())
        empty = pa.table(
            {"doc_id": pa.array([], type=pa.string()), "w": e,
             "slope_num": e, "slope_den": e}
        )
        if n_docs == 0 or len(v) == 0:
            return empty
        n = np.diff(off)
        w = n // TS_GRID
        kept = w >= 1
        if not kept.any():
            return empty
        wk = w[kept]
        startk = off[:-1][kept]
        c = np.concatenate(([0], np.cumsum(v)))
        edges = startk[:, None] + wk[:, None] * np.arange(TS_GRID + 1)
        b = np.diff(c[edges], axis=1)  # (D, TS_GRID) bucket sums
        num = b[:, ki] - b[:, ji]      # (D, n_pairs)
        d = int(kept.sum())
        den = np.broadcast_to(den0, (d, n_pairs))
        val = num / den
        row = np.repeat(np.arange(d, dtype=np.int64), n_pairs)
        order = np.lexsort(
            (den.ravel(), num.ravel(), val.ravel(), row)
        )
        med = order[np.arange(d) * n_pairs + med_rank]
        return pa.table(
            {"doc_id": t["doc_id"].filter(pa.array(kept)),
             "w": pa.array(wk.astype(np.int64)),
             "slope_num": pa.array(num.ravel()[med]),
             "slope_den": pa.array(den.ravel()[med])}
        )

    return ds.map_batches(stats, batch_format="pyarrow", batch_size=256)


THEIL_SEN_SQL = (
    f"{_FLAT_CTE},"
    " wd AS (SELECT doc_id, pos, tok,"
    f"  (count(*) OVER (PARTITION BY doc_id)) // {TS_GRID} AS w"
    "  FROM flat),"
    f" t AS (SELECT doc_id, w, pos // w AS j, tok FROM wd"
    f"  WHERE w >= 1 AND pos < {TS_GRID} * w),"
    " bk AS (SELECT doc_id, max(w) AS w, j, sum(tok) AS b FROM t"
    "  GROUP BY doc_id, j),"
    " p AS (SELECT x.doc_id, x.w, y.b - x.b AS num,"
    "  y.j - x.j AS den FROM bk x JOIN bk y"
    "  ON y.doc_id = x.doc_id AND y.j > x.j),"
    " r AS (SELECT doc_id, w, num, den, row_number() OVER"
    "  (PARTITION BY doc_id"
    "   ORDER BY CAST(num AS DOUBLE) / den, num, den) AS rk FROM p)"
    " SELECT doc_id, CAST(w AS BIGINT) AS w,"
    " CAST(num AS BIGINT) AS slope_num,"
    " CAST(den AS BIGINT) AS slope_den"
    f" FROM r WHERE rk = {(64 * 63 // 2 - 1) // 2 + 1}"
)


def q_ordinal_patterns(sf_dir: str) -> "ray.data.Dataset":
    """Ordinal (permutation-entropy) pattern census per source — every
    consecutive token triple classified by its two step signs
    (sign(x2-x1), sign(x3-x2)), nine patterns total with ties kept as
    their own class. The motif mix is a shape fingerprint: white noise
    spreads evenly over the non-tie patterns, a sawtooth lives in two,
    heavy quantization shows up as tie mass — the cheap structure
    audit before paying for a full DWT. One sign-diff pass per batch,
    doc-boundary triples masked, one bincount per batch on the packed
    (source, pattern) key, then a 9-rows-per-source groupby — the
    exchange is sources x 9, never the corpus."""
    from ray.data.aggregate import Sum

    ds = _seq_ds(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        n_docs = len(off) - 1
        empty = pa.table(
            {"source": pa.array([], type=pa.string()),
             "s1": pa.array([], type=pa.int64()),
             "s2": pa.array([], type=pa.int64()),
             "cnt": pa.array([], type=pa.int64())}
        )
        if n_docs == 0 or len(v) < 3:
            return empty
        n = np.diff(off)
        seg = np.repeat(np.arange(n_docs, dtype=np.int64), n)
        d = np.sign(v[1:] - v[:-1])
        within = seg[1:] == seg[:-1]
        # triple at i valid when steps i and i+1 are both intra-doc
        ok = within[:-1] & within[1:]
        if not ok.any():
            return empty
        pid = (d[:-1][ok] + 1) * 3 + (d[1:][ok] + 1)
        srcs = sorted(set(t["source"].to_pylist()))
        src_idx = pc.index_in(
            t["source"], value_set=pa.array(srcs)
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        sp = np.repeat(src_idx, n)[:-2][ok] * 9 + pid
        cnt = np.bincount(sp, minlength=9 * len(srcs))
        nz = np.flatnonzero(cnt)
        src_names = np.array(srcs, dtype=object)[nz // 9]
        return pa.table(
            {"source": pa.array(src_names, type=pa.string()),
             "s1": pa.array(nz % 9 // 3 - 1),
             "s2": pa.array(nz % 3 - 1),
             "cnt": pa.array(cnt[nz].astype(np.int64))}
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=256)
        .groupby(["source", "s1", "s2"])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )


ORDINAL_PATTERNS_SQL = (
    f"{_FLAT_CTE},"
    " l AS (SELECT source, doc_id, tok,"
    "  lead(tok) OVER w AS t2, lead(tok, 2) OVER w AS t3 FROM flat"
    "  WINDOW w AS (PARTITION BY doc_id ORDER BY pos))"
    " SELECT source, CAST(sign(t2 - tok) AS BIGINT) AS s1,"
    " CAST(sign(t3 - t2) AS BIGINT) AS s2,"
    " CAST(count(*) AS BIGINT) AS cnt"
    " FROM l WHERE t3 IS NOT NULL GROUP BY source, s1, s2"
)


def q_l1_distance_sources(sf_dir: str) -> "pa.Table":
    """Exact total-variation (L1) distance between every source pair's
    token distributions, cross-multiplied to stay integral:
    l1_num = sum_v |c_a(v) * n_b - c_b(v) * n_a| == n_a*n_b * 2*TV.
    Where ks_sources bounds the worst single quantile, L1 integrates
    drift over the whole vocabulary — the pair of them brackets how
    safely two sources can share a mixture bucket. Same shared
    vocab-bounded histogram finish as ks_sources: dense per-source
    count vectors over the union grid, one vectorized abs-diff per
    pair — never a corpus pass beyond the shared one."""
    import pandas as pd

    hist = _source_token_hist(sf_dir)
    toks = np.sort(hist["tok"].unique().astype(np.int64))
    srcs = sorted(hist["source"].unique())
    vecs, ns = {}, {}
    for src, h in hist.groupby("source"):
        counts = np.zeros(len(toks), dtype=np.int64)
        idx = np.searchsorted(toks, h["tok"].to_numpy().astype(np.int64))
        counts[idx] = h["cnt"].to_numpy().astype(np.int64)
        vecs[src] = counts
        ns[src] = int(counts.sum())
    out = []
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            l1 = int(np.abs(vecs[a] * ns[b] - vecs[b] * ns[a]).sum())
            out.append((a, b, ns[a], ns[b], l1))
    return pa.table(
        {"src_a": pa.array([r[0] for r in out], type=pa.string()),
         "src_b": pa.array([r[1] for r in out], type=pa.string()),
         "n_a": pa.array([r[2] for r in out], type=pa.int64()),
         "n_b": pa.array([r[3] for r in out], type=pa.int64()),
         "l1_num": pa.array([r[4] for r in out], type=pa.int64())}
    )


L1_DISTANCE_SQL = (
    f"{_FLAT_CTE},"
    " c AS (SELECT source, tok, count(*) AS cnt FROM flat"
    "  GROUP BY source, tok),"
    " n AS (SELECT source, sum(cnt) AS n FROM c GROUP BY source),"
    " grid AS (SELECT s.source, t.tok"
    "  FROM (SELECT DISTINCT source FROM c) s"
    "  CROSS JOIN (SELECT DISTINCT tok FROM c) t),"
    " d AS (SELECT g.source, g.tok, COALESCE(c.cnt, 0) AS cnt"
    "  FROM grid g LEFT JOIN c ON c.source = g.source"
    "   AND c.tok = g.tok)"
    " SELECT a.source AS src_a, b.source AS src_b,"
    " CAST(max(na.n) AS BIGINT) AS n_a,"
    " CAST(max(nb.n) AS BIGINT) AS n_b,"
    " CAST(sum(abs(a.cnt * nb.n - b.cnt * na.n)) AS BIGINT) AS l1_num"
    " FROM d a JOIN d b ON b.source > a.source AND b.tok = a.tok"
    " JOIN n na ON na.source = a.source"
    " JOIN n nb ON nb.source = b.source"
    " GROUP BY src_a, src_b"
)


def q_splithalf_corr(sf_dir: str) -> "ray.data.Dataset":
    """Per-doc split-half reliability ingredients — pair each even
    position with the following odd position and return the BIGINT
    moments (m pairs, sums, sums of squares, dot product); the
    even/odd Pearson r (and the Spearman–Brown-corrected reliability)
    is one formula away. A sequence whose halves do not correlate has
    no stable signal for a rollup tier to preserve — the
    worth-compressing-at-all gate. One masked multiply + reduceat
    pass; the trailing unpaired token of odd-length docs is dropped
    on both sides; all sums < 2^56 (int64-safe)."""
    ds = _seq_ds(sf_dir)

    def stats(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        n_docs = len(off) - 1
        e = pa.array([], type=pa.int64())
        empty = pa.table(
            {"doc_id": pa.array([], type=pa.string()), "m": e,
             "sx": e, "sy": e, "qx": e, "qy": e, "dot": e}
        )
        if n_docs == 0 or len(v) == 0:
            return empty
        n = np.diff(off)
        m = n // 2
        kept = m >= 1
        if not kept.any():
            return empty
        pos = np.arange(len(v), dtype=np.int64) - np.repeat(off[:-1], n)
        in_pair = pos < 2 * np.repeat(m, n)
        even = in_pair & (pos % 2 == 0)
        odd = in_pair & (pos % 2 == 1)
        sx = np.add.reduceat(np.where(even, v, 0), off[:-1])
        sy = np.add.reduceat(np.where(odd, v, 0), off[:-1])
        qx = np.add.reduceat(np.where(even, v * v, 0), off[:-1])
        qy = np.add.reduceat(np.where(odd, v * v, 0), off[:-1])
        p = v[:-1] * v[1:]
        dmask = even[:-1] & odd[1:]
        dpad = np.concatenate((np.where(dmask, p, 0), [0]))
        dot = np.add.reduceat(dpad, off[:-1])[:n_docs]
        return pa.table(
            {"doc_id": t["doc_id"].filter(pa.array(kept)),
             "m": pa.array(m[kept].astype(np.int64)),
             "sx": pa.array(sx[kept]), "sy": pa.array(sy[kept]),
             "qx": pa.array(qx[kept]), "qy": pa.array(qy[kept]),
             "dot": pa.array(dot[kept])}
        )

    return ds.map_batches(stats, batch_format="pyarrow", batch_size=256)


SPLITHALF_SQL = (
    f"{_FLAT_CTE},"
    " p AS (SELECT x.doc_id, x.tok AS xv, y.tok AS yv"
    "  FROM flat x JOIN flat y ON y.doc_id = x.doc_id"
    "   AND y.pos = x.pos + 1 WHERE x.pos % 2 = 0)"
    " SELECT doc_id, CAST(count(*) AS BIGINT) AS m,"
    " CAST(sum(xv) AS BIGINT) AS sx, CAST(sum(yv) AS BIGINT) AS sy,"
    " CAST(sum(xv * xv) AS BIGINT) AS qx,"
    " CAST(sum(yv * yv) AS BIGINT) AS qy,"
    " CAST(sum(xv * yv) AS BIGINT) AS dot"
    " FROM p GROUP BY doc_id"
)


def q_vocab_growth(sf_dir: str) -> "pa.Table":
    """Heaps-law vocabulary-growth audit — per source, how many NEW
    distinct token values each doc-id decile introduces (the first-
    occurrence doc of every (source, token) pair, bucketed). A healthy
    crawl keeps discovering vocabulary; a curve that flatlines early
    means the tail deciles are rehashes — the freshness check run
    before paying to train on them. Two exchanges, both vocab-bounded:
    per-batch (source, tok) -> min numeric doc id partials (sorted
    once, first-per-key via np.unique), a Min groupby, then a
    9 x 10-row finish; the decile uses the corpus doc count from ONE
    doc_id-column-only read (synth doc ids are dense 'doc-NNNNNNNN',
    so id-value deciles == rank deciles). The five non-numeric
    calibration probes ('probe-*') are excluded on both sides — they
    are fixtures, not corpus."""
    import pandas as pd

    from ray.data.aggregate import Max, Min

    ds = _seq_ds(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        n_docs = len(off) - 1
        if n_docs == 0 or len(v) == 0:
            return pa.table(
                {"source": pa.array([], type=pa.string()),
                 "tok": pa.array([], type=pa.int64()),
                 "did": pa.array([], type=pa.int64())}
            )
        if int(v.max()) >= (1 << TOKEN_BITS) or int(v.min()) < 0:
            raise ValueError(
                "vocab_growth packs (source, token) into one int64 "
                f"key; tokens must be in [0, 2^{TOKEN_BITS})"
            )
        n = np.diff(off)
        ids = t["doc_id"].to_pylist()
        did = np.array(
            [int(s[4:]) if s.startswith("doc-") else -1 for s in ids],
            dtype=np.int64,
        )
        srcs = sorted(set(t["source"].to_pylist()))
        src_idx = pc.index_in(
            t["source"], value_set=pa.array(srcs)
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        key = (np.repeat(src_idx, n) << TOKEN_BITS) | v
        did_rep = np.repeat(did, n)
        corpus = did_rep >= 0
        key, did_rep = key[corpus], did_rep[corpus]
        order = np.lexsort((did_rep, key))
        ks, kd = key[order], did_rep[order]
        first = np.concatenate(([True], ks[1:] != ks[:-1]))
        uk, ud = ks[first], kd[first]  # min did per key (lexsort order)
        src_names = np.array(srcs, dtype=object)[uk >> TOKEN_BITS]
        return pa.table(
            {"source": pa.array(src_names, type=pa.string()),
             "tok": pa.array(uk & ((1 << TOKEN_BITS) - 1)),
             "did": pa.array(ud)}
        )

    first_seen = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=256)
        .groupby(["source", "tok"])
        .aggregate(Min("did", alias_name="did"))
        .to_pandas()  # distinct (source, value) pairs only
    )
    from wavelet_decomposition_ray import synth
    from wavelet_decomposition_ray.pipelines import rollup_pipeline as rp

    def batch_max(t: pa.Table) -> pa.Table:
        dids = [int(s[4:]) for s in t["doc_id"].to_pylist()
                if s.startswith("doc-")]
        return pa.table(
            {"did": pa.array([max(dids)] if dids else [], type=pa.int64())}
        )

    ids = rp.sequences_dataset(
        synth.ensure_sequences(sf_dir), columns=["doc_id"]
    ).map_batches(batch_max, batch_format="pyarrow").aggregate(Max("did"))
    nd = int(ids["max(did)"]) + 1
    first_seen["decile"] = first_seen["did"] * 10 // nd
    out = (
        first_seen.groupby(["source", "decile"], as_index=False)
        .agg(n_new=("did", "size"))
    )
    return pa.Table.from_pandas(
        out.astype({"decile": np.int64, "n_new": np.int64}),
        preserve_index=False,
    )


VOCAB_GROWTH_SQL = (
    f"{_FLAT_CTE},"
    " c AS (SELECT source, tok,"
    "  min(CAST(substr(doc_id, 5) AS BIGINT)) AS did FROM flat"
    "  WHERE doc_id LIKE 'doc-%' GROUP BY source, tok),"
    " m AS (SELECT max(CAST(substr(doc_id, 5) AS BIGINT)) + 1 AS nd"
    "  FROM flat WHERE doc_id LIKE 'doc-%')"
    " SELECT source, CAST(did * 10 // nd AS BIGINT) AS decile,"
    " CAST(count(*) AS BIGINT) AS n_new"
    " FROM c, m GROUP BY source, decile"
)


def q_user_burstiness(sf_dir: str) -> "ray.data.Dataset":
    """Per-user burstiness (Fano-factor) ingredients over hourly event
    buckets — active-hour count, observed span, and the sum and
    sum-of-squares of per-hour counts, all BIGINT (the variance/mean
    dispersion index is one formula away; zero hours inside the span
    enter through span, not rows). Separates steady heartbeat users
    from bursty batch emitters — the skew signal a sessionizing or
    rate-limiting stage partitions by. Two distributed stages: a
    per-batch (user, hour) pre-aggregate feeding ONE user-hour-sized
    groupby, then a user-sized Min/Max/Sum groupby — the raw event
    stream is never shuffled."""
    from ray.data.aggregate import Count, Max, Min, Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    )

    def partial(df):
        import pandas as pd

        ts_us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        g = pd.DataFrame(
            {"user_id": df["user_id"].to_numpy(),
             "hr": ts_us // HOUR_US}
        ).groupby(["user_id", "hr"], as_index=False).agg(c=("hr", "size"))
        g["c"] = g["c"].astype(np.int64)
        return g

    hourly = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["user_id", "hr"])
        .aggregate(Sum("c", alias_name="c"))
        .map_batches(
            lambda df: df.assign(c2=df["c"] * df["c"]),
            batch_format="pandas",
        )
    )
    agg = hourly.groupby("user_id").aggregate(
        Count(alias_name="h_nz"),
        Min("hr", alias_name="hr_min"),
        Max("hr", alias_name="hr_max"),
        Sum("c", alias_name="s"),
        Sum("c2", alias_name="q"),
    )
    return agg.map_batches(
        lambda df: df.assign(
            span=df["hr_max"] - df["hr_min"] + 1
        )[["user_id", "h_nz", "span", "s", "q"]],
        batch_format="pandas",
    )


USER_BURSTINESS_SQL = (
    "WITH h AS (SELECT user_id,"
    f" epoch_us(ts) // {HOUR_US} AS hr,"
    " count(*) AS c FROM events GROUP BY user_id, hr)"
    " SELECT user_id, CAST(count(*) AS BIGINT) AS h_nz,"
    " CAST(max(hr) - min(hr) + 1 AS BIGINT) AS span,"
    " CAST(sum(c) AS BIGINT) AS s,"
    " CAST(sum(c * c) AS BIGINT) AS q"
    " FROM h GROUP BY user_id"
)


def q_half_drift(sf_dir: str) -> "ray.data.Dataset":
    """Within-doc concept drift — the two-sample KS statistic between
    each sequence's first and second half, cross-multiplied exact:
    d_num = max_v |cum_1(v) * n_2 - cum_2(v) * n_1| == n_1*n_2*D.
    A stream whose halves disagree is non-stationary — its rollup
    tiers must keep finer resolution than a stationary stream's (the
    per-sequence complement to ks_sources' corpus-level drift). ONE
    lifted np.sort per batch ((seg*2 + half) << TOKEN_BITS | token
    makes each doc-half a contiguous sorted block); the per-doc finish
    is a union-grid searchsorted over those blocks (vectorized per
    doc, <= batch_size iterations of numpy work — never per token).
    Docs with fewer than 2 tokens emit nothing (an empty half has no
    ECDF)."""
    ds = _seq_ds(sf_dir)

    def stats(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        n_docs = len(off) - 1
        e = pa.array([], type=pa.int64())
        empty = pa.table(
            {"doc_id": pa.array([], type=pa.string()), "n1": e,
             "n2": e, "d_num": e}
        )
        if n_docs == 0 or len(v) == 0:
            return empty
        if int(v.max()) >= (1 << TOKEN_BITS) or int(v.min()) < 0:
            raise ValueError(
                "half_drift's lift-sort needs tokens in "
                f"[0, 2^{TOKEN_BITS})"
            )
        n = np.diff(off)
        kept = n >= 2
        if not kept.any():
            return empty
        n1 = n // 2
        seg = np.repeat(np.arange(n_docs, dtype=np.int64), n)
        pos = np.arange(len(v), dtype=np.int64) - np.repeat(off[:-1], n)
        half = (pos >= np.repeat(n1, n)).astype(np.int64)
        sv = np.sort(((seg * 2 + half) << TOKEN_BITS) | v)
        mask = (1 << TOKEN_BITS) - 1
        out_d = np.empty(int(kept.sum()), dtype=np.int64)
        ki = 0
        for d in np.flatnonzero(kept):
            o, o2 = off[d], off[d + 1]
            a = sv[o:o + n1[d]] & mask
            b = sv[o + n1[d]:o2] & mask
            grid = np.union1d(a, b)
            ca = np.searchsorted(a, grid, side="right")
            cb = np.searchsorted(b, grid, side="right")
            out_d[ki] = np.abs(
                ca * (n[d] - n1[d]) - cb * n1[d]
            ).max()
            ki += 1
        return pa.table(
            {"doc_id": t["doc_id"].filter(pa.array(kept)),
             "n1": pa.array(n1[kept].astype(np.int64)),
             "n2": pa.array((n - n1)[kept].astype(np.int64)),
             "d_num": pa.array(out_d)}
        )

    return ds.map_batches(stats, batch_format="pyarrow", batch_size=256)


HALF_DRIFT_SQL = (
    f"{_FLAT_CTE},"
    " md AS (SELECT doc_id, count(*) // 2 AS n1,"
    "  count(*) - count(*) // 2 AS n2 FROM flat GROUP BY doc_id),"
    " h AS (SELECT f.doc_id,"
    "  CASE WHEN f.pos < md.n1 THEN 1 ELSE 2 END AS half, f.tok"
    "  FROM flat f JOIN md ON md.doc_id = f.doc_id WHERE md.n1 >= 1),"
    " c AS (SELECT doc_id, half, tok, count(*) AS cnt FROM h"
    "  GROUP BY doc_id, half, tok),"
    " grid AS (SELECT DISTINCT doc_id, tok FROM h),"
    " cum AS (SELECT g.doc_id, g.tok,"
    "  sum(COALESCE(c1.cnt, 0)) OVER (PARTITION BY g.doc_id"
    "   ORDER BY g.tok) AS cum1,"
    "  sum(COALESCE(c2.cnt, 0)) OVER (PARTITION BY g.doc_id"
    "   ORDER BY g.tok) AS cum2"
    "  FROM grid g"
    "  LEFT JOIN c c1 ON c1.doc_id = g.doc_id AND c1.tok = g.tok"
    "   AND c1.half = 1"
    "  LEFT JOIN c c2 ON c2.doc_id = g.doc_id AND c2.tok = g.tok"
    "   AND c2.half = 2)"
    " SELECT cum.doc_id, CAST(max(md.n1) AS BIGINT) AS n1,"
    " CAST(max(md.n2) AS BIGINT) AS n2,"
    " CAST(max(abs(cum1 * md.n2 - cum2 * md.n1)) AS BIGINT) AS d_num"
    " FROM cum JOIN md ON md.doc_id = cum.doc_id"
    " GROUP BY cum.doc_id"
)


POS_BUCKETS = 64  # normalized-position profile resolution


def q_position_profile(sf_dir: str) -> "ray.data.Dataset":
    """Positional-bias profile per source — token count and integer sum
    in each of POS_BUCKETS normalized-position buckets
    (bucket = pos * 64 // n, so every doc contributes its full length
    scaled to the same [0, 64) axis). The curve exposes structural
    bias the per-value histograms cannot: headers/boilerplate loading
    the first buckets, truncation artifacts in the last — the check
    run before packing sequences into fixed training windows. One
    keyed bincount per batch (key = src * 64 + bucket), then a
    sources x 64-row groupby — the exchange is profile-sized, never
    the corpus."""
    from ray.data.aggregate import Sum

    ds = _seq_ds(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        n_docs = len(off) - 1
        if n_docs == 0 or len(v) == 0:
            return pa.table(
                {"source": pa.array([], type=pa.string()),
                 "bucket": pa.array([], type=pa.int64()),
                 "n_toks": pa.array([], type=pa.int64()),
                 "tok_sum": pa.array([], type=pa.int64())}
            )
        n = np.diff(off)
        pos = np.arange(len(v), dtype=np.int64) - np.repeat(off[:-1], n)
        bucket = pos * POS_BUCKETS // np.repeat(n, n)
        srcs = sorted(set(t["source"].to_pylist()))
        src_idx = pc.index_in(
            t["source"], value_set=pa.array(srcs)
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        key = np.repeat(src_idx, n) * POS_BUCKETS + bucket
        size = POS_BUCKETS * len(srcs)
        cnt = np.bincount(key, minlength=size)
        # token sums stay far below 2^53 per batch, so float64 bincount
        # weights are exact; cast back after the guard
        if int(v.max()) * len(v) >= (1 << 52):
            raise ValueError("position_profile bincount weight overflow")
        ts = np.bincount(key, weights=v.astype(np.float64),
                         minlength=size).astype(np.int64)
        nz = np.flatnonzero(cnt)
        src_names = np.array(srcs, dtype=object)[nz // POS_BUCKETS]
        return pa.table(
            {"source": pa.array(src_names, type=pa.string()),
             "bucket": pa.array(nz % POS_BUCKETS),
             "n_toks": pa.array(cnt[nz].astype(np.int64)),
             "tok_sum": pa.array(ts[nz])}
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=256)
        .groupby(["source", "bucket"])
        .aggregate(Sum("n_toks", alias_name="n_toks"),
                   Sum("tok_sum", alias_name="tok_sum"))
    )


POSITION_PROFILE_SQL = (
    f"{_FLAT_CTE},"
    " w AS (SELECT source, tok,"
    f"  pos * {POS_BUCKETS} //"
    "  (count(*) OVER (PARTITION BY doc_id)) AS bucket FROM flat)"
    " SELECT source, CAST(bucket AS BIGINT) AS bucket,"
    " CAST(count(*) AS BIGINT) AS n_toks,"
    " CAST(sum(tok) AS BIGINT) AS tok_sum"
    " FROM w GROUP BY source, bucket"
)


RSI_W = 16  # diff positions per tumbling RSI window


def q_rsi_window(sf_dir: str) -> "ray.data.Dataset":
    """Cutler-RSI decomposition per tumbling window — for each sequence,
    first differences d_p = tok_p - tok_{p-1} (p >= 1) are folded into
    tumbling windows of RSI_W diff positions (widx = p // RSI_W; window 0
    holds RSI_W - 1 diffs because p = 0 has no predecessor), and each
    window reports its integer gain mass (sum of positive diffs), loss
    mass (sum of negated negative diffs) and diff count. RSI itself is
    the rational 100 * gain / (gain + loss) of the two integers — kept
    as exact BIGINTs so the oracle hash cannot float-drift. The
    gain/loss split is the momentum complement to ``bollinger_breakouts``
    / ``sma_cross``: a window with high gain AND high loss is churn, not
    trend. One vectorized pass per batch (masked diff + two keyed
    bincounts); each doc's tokens live in one list cell, so windows never
    straddle batches."""
    ds = _seq_ds(sf_dir)

    def stats(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        n_docs = len(off) - 1
        e = pa.array([], type=pa.int64())
        empty = pa.table(
            {"doc_id": pa.array([], type=pa.string()), "widx": e,
             "gain": e, "loss": e, "n_diffs": e}
        )
        if n_docs == 0 or len(v) == 0:
            return empty
        if int(v.max()) >= (1 << TOKEN_BITS) or int(v.min()) < 0:
            # |d| < 2^TOKEN_BITS keeps a <=RSI_W-diff window sum exact
            # in the float64 bincount weights (< 2^(TOKEN_BITS+4))
            raise ValueError(
                f"rsi_window needs tokens in [0, 2^{TOKEN_BITS})"
            )
        n = np.diff(off)
        pos = np.arange(len(v), dtype=np.int64) - np.repeat(off[:-1], n)
        keep = pos >= 1  # diffs are within-doc only
        if not keep.any():
            return empty
        d = np.empty(len(v), dtype=np.int64)
        d[0] = 0
        d[1:] = v[1:] - v[:-1]
        doc = np.repeat(np.arange(n_docs, dtype=np.int64), n)
        widx = pos // RSI_W
        max_w = int(widx[keep].max()) + 1
        key = (doc * max_w + widx)[keep]
        dk = d[keep]
        size = n_docs * max_w
        cnt = np.bincount(key, minlength=size)
        gain = np.bincount(key, weights=np.maximum(dk, 0).astype(np.float64),
                           minlength=size).astype(np.int64)
        loss = np.bincount(key, weights=np.maximum(-dk, 0).astype(np.float64),
                           minlength=size).astype(np.int64)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {"doc_id": t["doc_id"].take(pa.array(nz // max_w)),
             "widx": pa.array(nz % max_w),
             "gain": pa.array(gain[nz]),
             "loss": pa.array(loss[nz]),
             "n_diffs": pa.array(cnt[nz].astype(np.int64))}
        )

    return ds.map_batches(stats, batch_format="pyarrow", batch_size=256)


RSI_WINDOW_SQL = (
    f"{_FLAT_CTE},"
    " d AS (SELECT doc_id,"
    f"  pos // {RSI_W} AS widx,"
    "  tok - lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS d"
    "  FROM flat)"
    " SELECT doc_id, CAST(widx AS BIGINT) AS widx,"
    " CAST(sum(CASE WHEN d > 0 THEN d ELSE 0 END) AS BIGINT) AS gain,"
    " CAST(sum(CASE WHEN d < 0 THEN -d ELSE 0 END) AS BIGINT) AS loss,"
    " CAST(count(d) AS BIGINT) AS n_diffs"
    " FROM d WHERE d IS NOT NULL GROUP BY doc_id, widx"
)


LATE_BUCKET_BITS = 10   # arrival-order bucket = event_id >> 10
LATE_PART_SHIFT = 5     # Ray group = 32 buckets (micro-group guard)

_ARRIVAL_NEG = -(2 ** 62)


def _eid_ts_arrays(t: pa.Table):
    """(event_id int64, event-time µs int64) views of an events batch."""
    eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    ts = t["ts"].to_numpy(zero_copy_only=False).astype(
        "datetime64[us]").astype(np.int64)
    return eid, ts


def _arrival_prefix_ref(ds: "ray.data.Dataset"):
    """Distributed prefix-max scaffolding shared by late_events and
    watermark_pick: fold a max event-time per arrival bucket
    (event_id >> LATE_BUCKET_BITS), compute each bucket's EXCLUSIVE
    prefix max on the (bucket-count-sized) driver table, ray.put the
    seed dict.  Per-bucket folds then seed their local running max with
    it, making the sequential watermark scan embarrassingly parallel."""
    from ray.data.aggregate import Max

    def bucket_partial(t: pa.Table) -> pa.Table:
        eid, ts = _eid_ts_arrays(t)
        ub, inv = np.unique(eid >> LATE_BUCKET_BITS, return_inverse=True)
        m = np.full(len(ub), _ARRIVAL_NEG, dtype=np.int64)
        np.maximum.at(m, inv, ts)
        return pa.table({"bucket": pa.array(ub), "mts": pa.array(m)})

    maxima = (
        ds.map_batches(bucket_partial, batch_format="pyarrow")
        .groupby("bucket").aggregate(Max("mts", alias_name="mts"))
        .take_all()  # bucket-count-sized, never the event stream
    )
    maxima.sort(key=lambda r: r["bucket"])
    pref: dict[int, int] = {}
    run = _ARRIVAL_NEG
    for r in maxima:
        pref[int(r["bucket"])] = run
        run = max(run, int(r["mts"]))
    return ray.put(pref)


def _add_arrival_part(t: pa.Table) -> pa.Table:
    """Coarse arrival-partition column: 2^LATE_PART_SHIFT buckets per
    Ray group, so seeds stay bucket-grained while the shuffle moves far
    fewer groups (the sessionize micro-group lesson)."""
    eid, _ = _eid_ts_arrays(t)
    return t.append_column(
        "part", pa.array(eid >> (LATE_BUCKET_BITS + LATE_PART_SHIFT),
                         type=pa.int64()))


def _seeded_lateness(df, pref: dict) -> np.ndarray:
    """Per-row lateness (running-max event-time − own event-time) inside
    one arrival partition, each bucket's scan seeded with its exclusive
    prefix.  Expects the partition frame SORTED by event_id."""
    eid = df["event_id"].to_numpy().astype(np.int64)
    ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    bkt = eid >> LATE_BUCKET_BITS
    late = np.empty(len(ts), dtype=np.int64)
    for b in np.unique(bkt):  # <= 2^LATE_PART_SHIFT slices
        m = bkt == b
        seed = pref.get(int(b), _ARRIVAL_NEG)
        late[m] = np.maximum(np.maximum.accumulate(ts[m]), seed) - ts[m]
    return late


def _hist_rank_pick(values: np.ndarray, counts: np.ndarray):
    """Exact-quantile picker over a SORTED value histogram: returns
    (total, pick) where pick(num, den) is the value at 1-based rank
    ceil(num/den · n) — quantile_disc's convention, in pure integer
    arithmetic (shared by every percentile-envelope query)."""
    cum = np.cumsum(counts)
    total = int(cum[-1]) if len(cum) else 0

    def pick(num: int, den: int) -> int:
        rank = (num * total + den - 1) // den
        return int(values[int(np.searchsorted(cum, rank))])

    return total, pick


def _user_day_part(t: pa.Table) -> pa.Table:
    """Batch-local distinct (user_id, day) pairs — packs
    (user << 20 | day) (epoch day < 2^20 until year ~4840, asserted)
    and uniquifies within the batch.  Globally-distinct consumers add
    the groupby (``_user_day_pairs``); min/max consumers (churn,
    lifespan) fold these partials directly."""
    ts_us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
    u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    day = ts_us // _DAY_US
    assert len(day) == 0 or (0 <= day.min() and day.max() < (1 << 20)), \
        "_user_day_part day packing out of range"
    key = np.unique(u * (1 << 20) + day)
    return pa.table({"user_id": pa.array(key >> 20),
                     "day": pa.array(key & ((1 << 20) - 1))})


def _user_day_pairs(sf_dir: str) -> "ray.data.Dataset":
    """Globally-distinct (user_id, day) activity pairs — the dau base
    table every engagement query starts from."""
    return (
        ray.data.read_parquet(f"{sf_dir}/events.parquet",
                              columns=["ts", "user_id"])
        .map_batches(_user_day_part, batch_format="pyarrow")
        .groupby(["user_id", "day"]).count()
        .select_columns(["user_id", "day"])
    )
LATE_THRESH_US = HOUR_US


def q_late_events(sf_dir: str) -> "ray.data.Dataset":
    """Watermark lateness accounting — the out-of-order audit every
    event-time streaming job needs before picking a watermark delay.
    Arrival order is ``event_id`` (the ingestion sequence); the watermark
    after each arrival is the running max event-time over everything
    arrived so far; an event's lateness is watermark - its own event-time
    (>= 0), and it is "late" past LATE_THRESH_US. Per event_type:
    n_events, n_late, max/sum lateness — all integer-exact BIGINTs.

    The running max is a sequential scan, so it distributes as a classic
    prefix computation: (1) one streaming pass folds a max event-time per
    arrival bucket (event_id >> LATE_BUCKET_BITS); (2) the driver takes
    the bucket-count-sized table and computes each bucket's EXCLUSIVE
    prefix max (broadcast via ray.put — at deployment scale widen the
    bucket so this stays ~10^6 entries at 10^12 events); (3) each bucket
    folds independently, seeding its local running max with the prefix.
    The only exchanges are bucket-count- and type-count-sized."""
    from ray.data.aggregate import Max, Sum

    import pandas as pd

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "event_type"],
    )
    pref_ref = _arrival_prefix_ref(ds)

    def fold(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values("event_id", kind="mergesort")
        late = _seeded_lateness(df, ray.get(pref_ref))
        g = pd.DataFrame({"event_type": df["event_type"].to_numpy(),
                          "late": late})
        g["is_late"] = (g["late"] > LATE_THRESH_US).astype(np.int64)
        out = g.groupby("event_type", sort=False).agg(
            n_events=("late", "size"), n_late=("is_late", "sum"),
            max_late_us=("late", "max"), sum_late_us=("late", "sum"),
        ).reset_index()
        return out.astype({c: np.int64 for c in out.columns
                           if c != "event_type"})

    return (
        ds.map_batches(_add_arrival_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(fold, batch_format="pandas")
        .groupby("event_type")
        .aggregate(Sum("n_events", alias_name="n_events"),
                   Sum("n_late", alias_name="n_late"),
                   Max("max_late_us", alias_name="max_late_us"),
                   Sum("sum_late_us", alias_name="sum_late_us"))
    )


LATE_EVENTS_SQL = (
    "WITH w AS (SELECT event_type,"
    " max(epoch_us(ts)) OVER (ORDER BY event_id"
    "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    " - epoch_us(ts) AS late_us FROM events)"
    " SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,"
    f" CAST(sum(CASE WHEN late_us > {LATE_THRESH_US} THEN 1 ELSE 0 END)"
    "  AS BIGINT) AS n_late,"
    " CAST(max(late_us) AS BIGINT) AS max_late_us,"
    " CAST(sum(late_us) AS BIGINT) AS sum_late_us"
    " FROM w GROUP BY event_type"
)


TOP_TYPES_K = 3
_TT_DAY_US = 86_400_000_000


def q_daily_top_types(sf_dir: str) -> "ray.data.Dataset":
    """Windowed heavy hitters — the top-TOP_TYPES_K event types per UTC
    day by count, ties broken by event_type ascending so the ranking is
    deterministic (the property a streaming top-k must pin before its
    output is cacheable). Classic two-level plan: per-batch (day, type)
    bincount partials, one (days x types)-sized groupby sum, then a
    per-day map_groups that sorts its handful of type rows — the
    exchange is distinct-pair-sized, never the event stream."""
    from ray.data.aggregate import Sum

    import pandas as pd

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        day = ts // _TT_DAY_US
        df = pd.DataFrame({"day": day,
                           "event_type": t["event_type"].to_pylist()})
        out = df.groupby(["day", "event_type"], sort=False).size()
        out = out.rename("cnt").reset_index()
        out["cnt"] = out["cnt"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    def topk(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(["cnt", "event_type"],
                            ascending=[False, True],
                            kind="mergesort").head(TOP_TYPES_K)
        df = df.reset_index(drop=True)
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["day", "event_type"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .groupby("day")
        .map_groups(topk, batch_format="pandas")
    )


DAILY_TOP_TYPES_SQL = (
    "WITH c AS (SELECT"
    f" epoch_us(ts) // {_TT_DAY_US} AS day,"
    " event_type, count(*) AS cnt FROM events GROUP BY day, event_type),"
    " r AS (SELECT day, event_type, cnt, row_number() OVER ("
    "  PARTITION BY day ORDER BY cnt DESC, event_type) AS rank FROM c)"
    " SELECT CAST(day AS BIGINT) AS day, event_type,"
    " CAST(cnt AS BIGINT) AS cnt, CAST(rank AS BIGINT) AS rank"
    f" FROM r WHERE rank <= {TOP_TYPES_K}"
)


RARETOK_K = 4  # signature = the K globally-rarest distinct tokens


def q_neardup_raretok(sf_dir: str) -> "ray.data.Dataset":
    """Rare-token-signature near-dup blocking (the record-linkage
    complement to minhash: block on each doc's RARETOK_K globally
    rarest distinct tokens, since rare values are the most
    discriminative — two docs sharing all K are near-dup candidates).
    Pass 1 builds the vocab-bounded global (tok, count) histogram and
    broadcasts a dense rank array ordered by (count asc, tok asc);
    pass 2 emits one (signature, doc_id) row per doc with >= RARETOK_K
    distinct tokens; a per-signature fold reports candidate buckets
    with >= 2 docs. Exchanges are vocab- and docs-row-sized — never
    token streams."""
    from ray.data.aggregate import Sum

    import pandas as pd

    def hist_partial(t: pa.Table) -> pa.Table:
        vals, _ = list_to_numpy(t["tokens"])
        uk, cnt = np.unique(vals.astype(np.int64), return_counts=True)
        return pa.table(
            {"tok": pa.array(uk), "cnt": pa.array(cnt.astype(np.int64))}
        )

    hist = (
        _seq_ds(sf_dir)
        .map_batches(hist_partial, batch_format="pyarrow", batch_size=256)
        .groupby("tok")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()  # vocab-bounded: <= 2^TOKEN_BITS rows
    )
    toks = hist["tok"].to_numpy().astype(np.int64)
    cnts = hist["cnt"].to_numpy().astype(np.int64)
    order = np.lexsort((toks, cnts))  # (count asc, tok asc) total order
    rank = np.full(1 << TOKEN_BITS, np.iinfo(np.int64).max, dtype=np.int64)
    rank[toks[order]] = np.arange(len(order), dtype=np.int64)
    # invert: signature stores tokens, rank only orders them
    rank_to_tok = np.full(len(order), -1, dtype=np.int64)
    rank_to_tok[:] = toks[order]
    rank_ref = ray.put(rank)
    r2t_ref = ray.put(rank_to_tok)

    def sig_scan(t: pa.Table) -> pa.Table:
        rk = ray.get(rank_ref)
        r2t = ray.get(r2t_ref)
        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        n_docs = len(off) - 1
        empty = pa.table({"sig": pa.array([], type=pa.string()),
                          "doc_id": pa.array([], type=pa.string())})
        if n_docs == 0 or len(v) == 0:
            return empty
        if int(v.max()) >= (1 << TOKEN_BITS) or int(v.min()) < 0:
            raise ValueError(
                f"neardup_raretok needs tokens in [0, 2^{TOKEN_BITS})")
        n = np.diff(off)
        seg = np.repeat(np.arange(n_docs, dtype=np.int64), n)
        # distinct (doc, tok) then per-doc rank order in one lexsort
        dk = np.unique((seg << TOKEN_BITS) | v)
        dseg, dtok = dk >> TOKEN_BITS, dk & ((1 << TOKEN_BITS) - 1)
        drank = rk[dtok]
        o = np.lexsort((drank, dseg))
        dseg, drank = dseg[o], drank[o]
        starts = np.searchsorted(dseg, np.arange(n_docs))
        sizes = np.diff(np.append(starts, len(dseg)))
        kept = np.flatnonzero(sizes >= RARETOK_K)
        if len(kept) == 0:
            return empty
        take = (starts[kept][:, None]
                + np.arange(RARETOK_K, dtype=np.int64)[None, :])
        sig_toks = r2t[drank[take]]  # (n_kept, K) in rank order
        sigs = [",".join(map(str, row)) for row in sig_toks]
        return pa.table(
            {"sig": pa.array(sigs, type=pa.string()),
             "doc_id": t["doc_id"].take(pa.array(kept))}
        )

    def bucket(df: "pd.DataFrame") -> "pd.DataFrame":
        ids = df["doc_id"].to_numpy()
        return pd.DataFrame({"sig": [df["sig"].iloc[0]],
                             "n_docs": np.array([len(ids)], dtype=np.int64),
                             "min_doc": [ids.min()],
                             "max_doc": [ids.max()]})

    rows = (
        _seq_ds(sf_dir)
        .map_batches(sig_scan, batch_format="pyarrow", batch_size=256)
        .groupby("sig")
        .map_groups(bucket, batch_format="pandas")
        .map_batches(lambda t: t.filter(pc.greater_equal(t["n_docs"], 2)),
                     batch_format="pyarrow")
        .take_all()  # shared-signature buckets only: duplicates-sized,
        #              never the corpus (and a typed table survives the
        #              legitimately-empty small-sf case, where Ray's
        #              to_pandas() on an empty Dataset drops the schema)
    )
    return pa.table(
        {"sig": pa.array([r["sig"] for r in rows], type=pa.string()),
         "n_docs": pa.array([int(r["n_docs"]) for r in rows],
                            type=pa.int64()),
         "min_doc": pa.array([r["min_doc"] for r in rows],
                             type=pa.string()),
         "max_doc": pa.array([r["max_doc"] for r in rows],
                             type=pa.string())}
    )


NEARDUP_RARETOK_SQL = (
    f"{_FLAT_CTE},"
    " g AS (SELECT tok, count(*) AS c FROM flat GROUP BY tok),"
    " dt AS (SELECT DISTINCT doc_id, tok FROM flat),"
    " rk AS (SELECT dt.doc_id, dt.tok, row_number() OVER ("
    "  PARTITION BY dt.doc_id ORDER BY g.c, dt.tok) AS rn"
    "  FROM dt JOIN g USING (tok)),"
    " s AS (SELECT doc_id,"
    "  string_agg(CAST(tok AS VARCHAR), ',' ORDER BY rn) AS sig"
    f"  FROM rk WHERE rn <= {RARETOK_K} GROUP BY doc_id"
    f"  HAVING count(*) = {RARETOK_K})"
    " SELECT sig, CAST(count(*) AS BIGINT) AS n_docs,"
    " min(doc_id) AS min_doc, max(doc_id) AS max_doc"
    " FROM s GROUP BY sig HAVING count(*) >= 2"
)


WDIST_W = 16  # tokens per distinct-count tumbling window


def q_window_distinct(sf_dir: str) -> "ray.data.Dataset":
    """Local-repetitiveness histogram — per source, how many tumbling
    WDIST_W-token windows have exactly k distinct values (k = 1..WDIST_W;
    the ragged tail window of each doc counts its own, smaller, distinct
    count). A corpus whose windows cluster at k=1..2 is template spam even
    when its GLOBAL vocab looks healthy — the window-local complement to
    ``zipf_hist`` / ``repetition_2gram``. One lifted sort per batch
    ((doc * max_w + widx) << TOKEN_BITS | tok makes every window a
    contiguous sorted block), distinct counts from adjacent-difference
    bincounts, then a (sources x WDIST_W)-sized groupby."""
    from ray.data.aggregate import Sum

    ds = _seq_ds(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        n_docs = len(off) - 1
        empty = pa.table(
            {"source": pa.array([], type=pa.string()),
             "n_distinct": pa.array([], type=pa.int64()),
             "n_windows": pa.array([], type=pa.int64())}
        )
        if n_docs == 0 or len(v) == 0:
            return empty
        if int(v.max()) >= (1 << TOKEN_BITS) or int(v.min()) < 0:
            raise ValueError(
                f"window_distinct's lift-sort needs tokens in "
                f"[0, 2^{TOKEN_BITS})")
        n = np.diff(off)
        pos = np.arange(len(v), dtype=np.int64) - np.repeat(off[:-1], n)
        widx = pos // WDIST_W
        max_w = int(widx.max()) + 1
        doc = np.repeat(np.arange(n_docs, dtype=np.int64), n)
        wkey = doc * max_w + widx
        sv = np.sort((wkey << TOKEN_BITS) | v)
        # distinct within a window = number of positions where the lifted
        # value changes (window blocks are contiguous after the sort)
        new = np.empty(len(sv), dtype=bool)
        new[0] = True
        new[1:] = sv[1:] != sv[:-1]
        wk = sv >> TOKEN_BITS
        n_win = int(wk.max()) + 1
        dis = np.bincount(wk[new], minlength=n_win)
        occ = np.bincount(wk, minlength=n_win)
        live = np.flatnonzero(occ)
        srcs = sorted(set(t["source"].to_pylist()))
        src_idx = pc.index_in(
            t["source"], value_set=pa.array(srcs)
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        skey = src_idx[live // max_w] * (WDIST_W + 1) + dis[live]
        hist = np.bincount(skey, minlength=len(srcs) * (WDIST_W + 1))
        nz = np.flatnonzero(hist)
        src_names = np.array(srcs, dtype=object)[nz // (WDIST_W + 1)]
        return pa.table(
            {"source": pa.array(src_names, type=pa.string()),
             "n_distinct": pa.array((nz % (WDIST_W + 1)).astype(np.int64)),
             "n_windows": pa.array(hist[nz].astype(np.int64))}
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=256)
        .groupby(["source", "n_distinct"])
        .aggregate(Sum("n_windows", alias_name="n_windows"))
    )


WINDOW_DISTINCT_SQL = (
    f"{_FLAT_CTE},"
    " w AS (SELECT source, doc_id,"
    f"  pos // {WDIST_W} AS widx,"
    "  count(DISTINCT tok) AS dis FROM flat"
    "  GROUP BY source, doc_id, widx)"
    " SELECT source, CAST(dis AS BIGINT) AS n_distinct,"
    " CAST(count(*) AS BIGINT) AS n_windows"
    " FROM w GROUP BY source, dis"
)


PATH_TOPK = 20


def q_path_trigrams(sf_dir: str) -> pa.Table:
    """Clickstream path mining — the PATH_TOPK most common consecutive
    event-type TRIGRAMS across all users (per-user arrival order =
    (ts, event_id)), ranked by count desc with path-string ascending as
    the deterministic tie-break. Trigrams never cross users, so the fold
    is partition-local on the same user-hash partitions every other
    per-user event query rides (one co-partitioned exchange); partials
    are (path, cnt) rows, the global finish is a distinct-path-sized
    groupby + sort/limit — the driver sees PATH_TOPK rows."""
    from ray.data.aggregate import Sum

    import pandas as pd

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"])

    def fold(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = df["user_id"].to_numpy().astype(np.int64)
        et = df["event_type"].to_numpy().astype(object)
        n = len(uid)
        if n < 3:
            return pd.DataFrame({"path": pd.Series([], dtype=object),
                                 "cnt": pd.Series([], dtype=np.int64)})
        same = uid[:-1] == uid[1:]
        valid = same[:-1] & same[1:]
        paths = (et[:-2] + ">" + et[1:-1] + ">" + et[2:])[valid]
        out = pd.Series(paths).value_counts().rename_axis("path")
        out = out.rename("cnt").reset_index()
        out["cnt"] = out["cnt"].astype(np.int64)
        return out

    counts = (
        ds.map_batches(_add_user_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(fold, batch_format="pandas")
        .groupby("path")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .sort(["cnt", "path"], descending=[True, False])
        .limit(PATH_TOPK)
        .take_all()  # PATH_TOPK rows
    )
    return pa.table(
        {"path": pa.array([r["path"] for r in counts], type=pa.string()),
         "cnt": pa.array([int(r["cnt"]) for r in counts], type=pa.int64()),
         "rank": pa.array(np.arange(1, len(counts) + 1, dtype=np.int64))}
    )


PATH_TRIGRAMS_SQL = (
    "WITH o AS (SELECT event_type,"
    " lead(event_type, 1) OVER w AS t2, lead(event_type, 2) OVER w AS t3"
    " FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),"
    " g AS (SELECT event_type || '>' || t2 || '>' || t3 AS path,"
    "  count(*) AS cnt FROM o WHERE t3 IS NOT NULL GROUP BY path),"
    " r AS (SELECT path, cnt, row_number() OVER ("
    "  ORDER BY cnt DESC, path) AS rank FROM g)"
    " SELECT path, CAST(cnt AS BIGINT) AS cnt, CAST(rank AS BIGINT) AS rank"
    f" FROM r WHERE rank <= {PATH_TOPK}"
)


COPAIR_W = 16   # co-occurrence window width
COPAIR_TOPK = 20


def q_window_copairs(sf_dir: str) -> pa.Table:
    """Windowed co-occurrence mining — the COPAIR_TOPK unordered pairs of
    DISTINCT token values that co-occur in the most tumbling COPAIR_W
    windows (each window counts a pair once; ties rank by (tok_a, tok_b)
    asc). The market-basket shape over token streams: a pair that keeps
    co-occurring inside one window is a collocation the per-value
    histograms can't see. Per batch, windows become rows of a padded
    (n_win, COPAIR_W) distinct-value matrix so ALL C(W,2) index combos
    vectorize at once (no per-window Python); partials pre-aggregate
    pair keys by bincount-style np.unique before the groupby, so the
    exchange is distinct-pair-sized (sparse, Zipf-concentrated — NOT the
    token stream; worst case vocab², reached only by adversarial uniform
    corpora)."""
    ds = _seq_ds(sf_dir)
    SENT = (1 << TOKEN_BITS)  # padding sentinel > any token
    iu, ju = np.triu_indices(COPAIR_W, k=1)

    def partial(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        n_docs = len(off) - 1
        e = pa.array([], type=pa.int64())
        empty = pa.table({"tok_a": e, "tok_b": e, "cnt": e})
        if n_docs == 0 or len(v) == 0:
            return empty
        if int(v.max()) >= SENT or int(v.min()) < 0:
            raise ValueError(
                f"window_copairs needs tokens in [0, 2^{TOKEN_BITS})")
        n = np.diff(off)
        pos = np.arange(len(v), dtype=np.int64) - np.repeat(off[:-1], n)
        widx = pos // COPAIR_W
        max_w = int(widx.max()) + 1
        doc = np.repeat(np.arange(n_docs, dtype=np.int64), n)
        wkey = doc * max_w + widx
        sv = np.sort((wkey << TOKEN_BITS) | v)
        new = np.empty(len(sv), dtype=bool)
        new[0] = True
        new[1:] = sv[1:] != sv[:-1]
        dv = sv[new] & (SENT - 1)          # distinct values, window-sorted
        dw = sv[new] >> TOKEN_BITS          # their window ids (contiguous)
        uw, inv = np.unique(dw, return_inverse=True)
        starts = np.searchsorted(dw, uw)
        rankin = np.arange(len(dv)) - starts[inv]
        M = np.full((len(uw), COPAIR_W), SENT, dtype=np.int64)
        M[inv, rankin] = dv
        a, b = M[:, iu].ravel(), M[:, ju].ravel()
        ok = b < SENT  # a <= b always (rows ascending); b==SENT is padding
        key = a[ok] * SENT + b[ok]
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {"key": pa.array(uk), "cnt": pa.array(cnt.astype(np.int64))}
        )

    # A Ray .aggregate() over millions of near-distinct pair keys walks
    # them in Python (~260 s at sf0.01); fold inside COARSE hash
    # partitions instead (the bigram_diversity trick): a pair key lands
    # in exactly ONE part, so within-part sums are global counts and the
    # per-part local top-COPAIR_TOPK provably contains every global
    # top-COPAIR_TOPK pair. Driver sees n_parts x COPAIR_TOPK rows.
    n_parts = 64

    def add_part(t: pa.Table) -> pa.Table:
        key = t["key"].to_numpy(zero_copy_only=False)
        mixed = (key >> TOKEN_BITS) ^ key  # spread Zipf-hot prefixes
        return t.append_column(
            "part", pa.array((mixed % n_parts).astype(np.int32)))

    def fold(df):
        import pandas as pd

        g = df.groupby("key", as_index=False)["cnt"].sum()
        # key packing is order-preserving, so (cnt desc, key asc) is
        # exactly (cnt desc, tok_a, tok_b)
        g = g.sort_values(["cnt", "key"], ascending=[False, True],
                          kind="mergesort").head(COPAIR_TOPK)
        return pd.DataFrame({"key": g["key"].to_numpy(),
                             "cnt": g["cnt"].to_numpy().astype(np.int64)})

    top = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=256)
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(fold, batch_format="pandas")
        .take_all()  # n_parts x COPAIR_TOPK rows
    )
    top.sort(key=lambda r: (-int(r["cnt"]), int(r["key"])))
    top = top[:COPAIR_TOPK]
    keys = np.array([int(r["key"]) for r in top], dtype=np.int64)
    cnts = np.array([int(r["cnt"]) for r in top], dtype=np.int64)
    return pa.table(
        {"tok_a": pa.array(keys // SENT),
         "tok_b": pa.array(keys % SENT),
         "cnt": pa.array(cnts),
         "rank": pa.array(np.arange(1, len(top) + 1, dtype=np.int64))}
    )


WINDOW_COPAIRS_SQL = (
    f"{_FLAT_CTE},"
    f" d AS (SELECT DISTINCT doc_id, pos // {COPAIR_W} AS widx, tok"
    "  FROM flat),"
    " p AS (SELECT a.tok AS tok_a, b.tok AS tok_b FROM d a JOIN d b"
    "  ON a.doc_id = b.doc_id AND a.widx = b.widx AND a.tok < b.tok),"
    " g AS (SELECT tok_a, tok_b, count(*) AS cnt FROM p"
    "  GROUP BY tok_a, tok_b),"
    " r AS (SELECT tok_a, tok_b, cnt, row_number() OVER ("
    "  ORDER BY cnt DESC, tok_a, tok_b) AS rank FROM g)"
    " SELECT CAST(tok_a AS BIGINT) AS tok_a, CAST(tok_b AS BIGINT) AS tok_b,"
    " CAST(cnt AS BIGINT) AS cnt, CAST(rank AS BIGINT) AS rank"
    f" FROM r WHERE rank <= {COPAIR_TOPK}"
)


def q_hod_median(sf_dir: str) -> "ray.data.Dataset":
    """EXACT hour-of-day median of event values (lower-middle for even
    counts, matching DuckDB quantile_disc) — the robust diurnal profile:
    ``hourly_profile``'s mean is pulled by heavy-tail hours, the median
    is not, and the gap between the two per hour is itself the
    skew signal. Medians don't merge, so the distributed shape is the
    value-histogram one: per-batch (hod, value, cnt) partials, ONE
    distinct-(hod, value)-sized groupby, then a 24-group fold that walks
    each hour's histogram cumsum to the middle element — the event
    stream itself is never shuffled."""
    from ray.data.aggregate import Sum

    import pandas as pd

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        hod = (ts // HOUR_US) % 24
        tok = np.rint(t["value"].to_numpy(zero_copy_only=False)
                      * 100).astype(np.int64)
        if len(tok) and int(np.abs(tok).max()) >= (1 << 39):
            raise ValueError("hod_median packed key needs |tok| < 2^39")
        key = hod * (1 << 40) + (tok + (1 << 39))  # shift keeps key >= 0
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {"hod": pa.array(uk >> 40),
             "tok": pa.array((uk & ((1 << 40) - 1)) - (1 << 39)),
             "cnt": pa.array(cnt.astype(np.int64))}
        )

    def finish(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values("tok", kind="mergesort")
        total, pick = _hist_rank_pick(
            df["tok"].to_numpy().astype(np.int64),
            df["cnt"].to_numpy().astype(np.int64))
        return pd.DataFrame({"hod": df["hod"].iloc[:1].to_numpy(),
                             "n": np.array([total], dtype=np.int64),
                             "med": np.array([pick(1, 2)],
                                             dtype=np.int64)})

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["hod", "tok"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .groupby("hod")
        .map_groups(finish, batch_format="pandas")
    )


HOD_MEDIAN_SQL = (
    "WITH e AS (SELECT"
    f" (epoch_us(ts) // {HOUR_US}) % 24 AS hod,"
    " CAST(round(value * 100) AS BIGINT) AS tok FROM events)"
    " SELECT CAST(hod AS BIGINT) AS hod, CAST(count(*) AS BIGINT) AS n,"
    " CAST(quantile_disc(tok, 0.5) AS BIGINT) AS med"
    " FROM e GROUP BY hod"
)


def q_watermark_pick(sf_dir: str) -> "pa.Table":
    """Watermark-delay decision — the exact p50/p99/p99.9/max of event
    LATENESS (running-max event-time at arrival minus own event-time,
    ``late_events``'s statistic) in whole milliseconds, with integer
    ranks ceil(q·n) computed explicitly on both sides (no float 0.999·n
    anywhere): pick the p99.9 and you know precisely which fraction of
    events a streaming window with that allowed-lateness would drop.
    Same two-phase distributed prefix as late_events (bucketed arrival
    maxima -> driver exclusive prefix -> seeded per-bucket folds), but
    folding a distinct-ms lateness HISTOGRAM instead of per-type sums —
    the only exchanges are bucket- and distinct-ms-sized."""
    import pandas as pd

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts"]
    )
    pref_ref = _arrival_prefix_ref(ds)

    def fold(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values("event_id", kind="mergesort")
        late = _seeded_lateness(df, ray.get(pref_ref))
        uk, cnt = np.unique(late // 1000, return_counts=True)
        return pd.DataFrame({"lat_ms": uk, "cnt": cnt.astype(np.int64)})

    # coalesce the per-part histograms BEFORE merging: a hash groupby
    # over hundreds of tiny partial blocks explodes into block x
    # partition micro-objects (measured 282 s vs 4.7 s at 20M events);
    # repartition to a handful of blocks, merge locally, finish on the
    # driver (32 x distinct-ms rows)
    hist = (
        ds.map_batches(_add_arrival_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(fold, batch_format="pandas")
        .repartition(32)
        .map_batches(
            lambda df: df.groupby("lat_ms", as_index=False)["cnt"].sum(),
            batch_format="pandas")
        .to_pandas()  # <= 32 x distinct-ms rows
    )
    hist = hist.groupby("lat_ms", as_index=False)["cnt"].sum()
    hist = hist.sort_values("lat_ms", kind="mergesort")
    ms = hist["lat_ms"].to_numpy().astype(np.int64)
    total, pick = _hist_rank_pick(
        ms, hist["cnt"].to_numpy().astype(np.int64))

    out = pd.DataFrame(
        {"n_events": np.array([total], dtype=np.int64),
         "p50_ms": np.array([pick(1, 2)], dtype=np.int64),
         "p99_ms": np.array([pick(99, 100)], dtype=np.int64),
         "p999_ms": np.array([pick(999, 1000)], dtype=np.int64),
         "max_ms": np.array([int(ms[-1])], dtype=np.int64)})
    return pa.Table.from_pandas(out, preserve_index=False)


WATERMARK_PICK_SQL = (
    "WITH w AS (SELECT (max(epoch_us(ts)) OVER (ORDER BY event_id"
    "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    "  - epoch_us(ts)) // 1000 AS lat_ms FROM events),"
    " n AS (SELECT count(*) AS c FROM w),"
    " r AS (SELECT lat_ms, row_number() OVER (ORDER BY lat_ms) AS rn"
    "  FROM w)"
    " SELECT CAST(n.c AS BIGINT) AS n_events,"
    " CAST((SELECT lat_ms FROM r WHERE rn = (n.c + 1) // 2)"
    "  AS BIGINT) AS p50_ms,"
    " CAST((SELECT lat_ms FROM r WHERE rn = (99 * n.c + 99) // 100)"
    "  AS BIGINT) AS p99_ms,"
    " CAST((SELECT lat_ms FROM r WHERE rn = (999 * n.c + 999) // 1000)"
    "  AS BIGINT) AS p999_ms,"
    " CAST((SELECT max(lat_ms) FROM w) AS BIGINT) AS max_ms"
    " FROM n"
)


def q_overnight_sessions(sf_dir: str) -> "pa.Table":
    """Midnight-crossing sessions — how many gap-windows start and end
    on different UTC days, over the total: the calendar-bucketing
    hazard rate (every daily rollup silently splits these sessions;
    if the share is material, daily engagement counts need session
    attribution rules, not just event counts).  One scan over the
    sessionizer's output."""
    import pandas as pd

    sess = q_sessionize(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        a = t["first_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["last_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        over = ((a // _DAY_US) != (b // _DAY_US)).astype(np.int64)
        return pa.table(
            {"n_sessions": pa.array([len(a)]),
             "n_overnight": pa.array([int(over.sum())])}
        )

    tot = sess.map_batches(partial, batch_format="pyarrow").sum(
        ["n_sessions", "n_overnight"])
    out = pd.DataFrame(
        {"n_sessions": np.array([int(tot["sum(n_sessions)"])],
                                dtype=np.int64),
         "n_overnight": np.array([int(tot["sum(n_overnight)"])],
                                 dtype=np.int64)})
    return pa.Table.from_pandas(out, preserve_index=False)


OVERNIGHT_SESSIONS_SQL = (
    "WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,"
    " CASE WHEN lag(epoch_us(ts)) OVER w IS NULL"
    f"  OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US}"
    "  THEN 1 ELSE 0 END AS brk"
    " FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),"
    " s AS (SELECT user_id, ts_us, sum(brk) OVER (PARTITION BY user_id"
    "   ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM e),"
    " iv AS (SELECT min(ts_us) AS a, max(ts_us) AS b"
    "  FROM s GROUP BY user_id, sid)"
    " SELECT CAST(count(*) AS BIGINT) AS n_sessions,"
    f" CAST(sum(CASE WHEN a // {_DAY_US} <> b // {_DAY_US}"
    "  THEN 1 ELSE 0 END) AS BIGINT) AS n_overnight"
    " FROM iv"
)


def q_dup_events(sf_dir: str) -> "pa.Table":
    """Exact duplicate-event audit — rows identical on (user, ts, type,
    cent value) regardless of event_id: dup_groups (distinct payloads
    occurring 2+ times) and extra_rows (the surplus copies an
    idempotent ingest would drop).  The at-any-distance complement to
    ``debounce_events``' consecutive-within-5s screen — replayed
    batches land here even when hours apart.  One distinct-payload-
    sized groupby (the events analog of dedup_exact)."""
    import pandas as pd

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "user_id", "event_type", "value"],
    )

    def partial(df: "pd.DataFrame") -> "pd.DataFrame":
        g = pd.DataFrame(
            {"u": df["user_id"].to_numpy().astype(np.int64),
             "t": df["ts"].to_numpy().astype("datetime64[us]")
             .astype(np.int64),
             "e": df["event_type"].to_numpy(),
             "v": np.rint(df["value"].to_numpy() * 100).astype(np.int64)}
        ).groupby(["u", "t", "e", "v"], as_index=False).size()
        g.rename(columns={"size": "c"}, inplace=True)
        g["c"] = g["c"].astype(np.int64)
        return g

    from ray.data.aggregate import Sum

    groups = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["u", "t", "e", "v"])
        .aggregate(Sum("c", alias_name="c"))
    )

    def fold(t: pa.Table) -> pa.Table:
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        dup = c > 1
        return pa.table(
            {"dup_groups": pa.array([int(dup.sum())]),
             "extra_rows": pa.array([int((c[dup] - 1).sum())])}
        )

    tot = groups.map_batches(fold, batch_format="pyarrow").sum(
        ["dup_groups", "extra_rows"])
    out = pd.DataFrame(
        {"dup_groups": np.array([int(tot["sum(dup_groups)"])],
                                dtype=np.int64),
         "extra_rows": np.array([int(tot["sum(extra_rows)"])],
                                dtype=np.int64)})
    return pa.Table.from_pandas(out, preserve_index=False)


DUP_EVENTS_SQL = (
    "WITH g AS (SELECT user_id, ts, event_type,"
    " CAST(round(value * 100) AS BIGINT) AS tok, count(*) AS c"
    " FROM events GROUP BY user_id, ts, event_type, tok)"
    " SELECT CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)"
    "  AS dup_groups,"
    " CAST(sum(CASE WHEN c > 1 THEN c - 1 ELSE 0 END) AS BIGINT)"
    "  AS extra_rows"
    " FROM g"
)


def q_part_size_vs_qty(sf_dir: str) -> "pa.Table":
    """Part-size vs shipped-quantity correlation components — the exact
    integer Pearson ingredients (n, Σx, Σy, Σxy, Σx², Σy²) for x =
    p_size (broadcast from the part dimension) and y = l_quantity per
    lineitem: do bigger parts ship in smaller lots?  The cross-table
    sufficient-statistics pattern (one broadcast probe, one streaming
    pass, a six-integer exchange) that any dimension-vs-fact
    correlation reuses."""
    import pandas as pd

    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_size"]
    ).to_pandas().sort_values("p_partkey")
    pk_ref = ray.put(part["p_partkey"].to_numpy().astype(np.int64))
    sz_ref = ray.put(part["p_size"].to_numpy().astype(np.int64))

    def partial(df: "pd.DataFrame") -> "pd.DataFrame":
        keys, sizes = ray.get(pk_ref), ray.get(sz_ref)
        lpk = df["l_partkey"].to_numpy().astype(np.int64)
        pos = np.searchsorted(keys, lpk)
        assert (pos < len(keys)).all() and (keys[pos] == lpk).all(), \
            "dangling l_partkey"
        x = sizes[pos]
        y = df["l_quantity"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {"n": np.array([len(x)], dtype=np.int64),
             "sx": np.array([int(x.sum())], dtype=np.int64),
             "sy": np.array([int(y.sum())], dtype=np.int64),
             "sxy": np.array([int((x * y).sum())], dtype=np.int64),
             "sxx": np.array([int((x * x).sum())], dtype=np.int64),
             "syy": np.array([int((y * y).sum())], dtype=np.int64)})

    parts = (
        ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                              columns=["l_partkey", "l_quantity"])
        .map_batches(partial, batch_format="pandas")
        .to_pandas()
    )
    cols = ("n", "sx", "sy", "sxy", "sxx", "syy")
    totals = {k: sum(int(v) for v in parts[k]) for k in cols}
    assert all(v < (1 << 63) for v in totals.values()), \
        "part_size_vs_qty int64 guard"
    out = pd.DataFrame({k: np.array([totals[k]], dtype=np.int64)
                        for k in cols})
    return pa.Table.from_pandas(out, preserve_index=False)


PART_SIZE_VS_QTY_SQL = (
    "WITH j AS (SELECT CAST(p.p_size AS BIGINT) AS x,"
    " CAST(l_quantity AS BIGINT) AS y"
    " FROM lineitem JOIN part p ON p.p_partkey = l_partkey)"
    " SELECT CAST(count(*) AS BIGINT) AS n,"
    " CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,"
    " CAST(sum(x * y) AS BIGINT) AS sxy,"
    " CAST(sum(x * x) AS BIGINT) AS sxx,"
    " CAST(sum(y * y) AS BIGINT) AS syy"
    " FROM j"
)


ONBOARD_BUCKETS = (1, 4)  # first-session depth: 1, 2-4, 5+


def q_onboarding_effect(sf_dir: str) -> "pa.Table":
    """Onboarding-depth vs retention — bucket every user by the event
    count of their FIRST session (1, 2-4, 5+) and report how many in
    each bucket ever came back (had a second session): the
    activation-curve table growth teams A/B against ("users who do 5+
    things in visit one retain 3x").  Sessions fold per user-hash
    partition; the per-user reduction (first session by (first_us,
    session_idx), plus a did-they-return flag) is one vectorized pass;
    the exchange is three rows."""
    import pandas as pd

    sess = q_sessionize(sf_dir)

    def add_part(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "part", pa.array(((u % N_EVENT_PARTS) + N_EVENT_PARTS)
                             % N_EVENT_PARTS, type=pa.int32()))

    def fold(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(["user_id", "first_us", "session_idx"],
                            kind="mergesort")
        u = df["user_id"].to_numpy().astype(np.int64)
        ne = df["n_events"].to_numpy().astype(np.int64)
        start = np.ones(len(u), dtype=bool)
        start[1:] = u[1:] != u[:-1]
        si = np.flatnonzero(start)
        counts = np.diff(np.append(si, len(u)))
        first_ne = ne[si]
        returned = (counts >= 2).astype(np.int64)
        lo, hi = ONBOARD_BUCKETS
        b = np.where(first_ne <= lo, 0, np.where(first_ne <= hi, 1, 2))
        out = []
        for bk in (0, 1, 2):
            m = b == bk
            out.append((bk, int(m.sum()), int(returned[m].sum())))
        return pd.DataFrame(out, columns=["bucket", "n_users",
                                          "n_returned"])

    from ray.data.aggregate import Sum

    agg = (
        sess.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(fold, batch_format="pandas")
        .groupby("bucket")
        .aggregate(Sum("n_users", alias_name="n_users"),
                   Sum("n_returned", alias_name="n_returned"))
        .to_pandas()
    )
    agg = agg.sort_values("bucket")
    agg = agg[agg["n_users"] > 0]  # SQL emits only observed buckets
    return pa.Table.from_pandas(
        agg.astype({"bucket": np.int64, "n_users": np.int64,
                    "n_returned": np.int64}).reset_index(drop=True),
        preserve_index=False,
    )


ONBOARDING_EFFECT_SQL = (
    "WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,"
    " CASE WHEN lag(epoch_us(ts)) OVER w IS NULL"
    f"  OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US}"
    "  THEN 1 ELSE 0 END AS brk"
    " FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),"
    " s AS (SELECT user_id, sum(brk) OVER (PARTITION BY user_id"
    "   ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM e),"
    " c AS (SELECT user_id, sid, CAST(count(*) AS BIGINT) AS ne"
    "  FROM s GROUP BY user_id, sid),"
    " u AS (SELECT user_id,"
    "  max(CASE WHEN sid = 1 THEN ne END) AS first_ne,"
    "  CASE WHEN count(*) >= 2 THEN 1 ELSE 0 END AS returned"
    "  FROM c GROUP BY user_id),"
    " b AS (SELECT CASE WHEN first_ne <= "
    f"{ONBOARD_BUCKETS[0]} THEN 0 WHEN first_ne <= {ONBOARD_BUCKETS[1]}"
    "  THEN 1 ELSE 2 END AS bucket, returned FROM u)"
    " SELECT CAST(bucket AS BIGINT) AS bucket,"
    " CAST(count(*) AS BIGINT) AS n_users,"
    " CAST(sum(returned) AS BIGINT) AS n_returned"
    " FROM b GROUP BY bucket"
)


def q_intersession_bands(sf_dir: str) -> "pa.Table":
    """Time-between-visits envelope — exact p50/p90/max (whole hours) of
    the gaps between a user's consecutive SESSIONS (next session's
    first event minus the previous session's last): the return-cadence
    metric re-engagement timing is tuned against — ``interarrival``
    measures events, ``session_duration_bands`` measures within-visit;
    this is the between-visit rhythm.  Sessions fold per user-hash
    partition (all of a user's sessions co-locate), gaps histogram at
    hour granularity, ranks = ceil(q·n) via `_hist_rank_pick`."""
    import pandas as pd

    sess = q_sessionize(sf_dir)

    def gaps(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(["user_id", "first_us"], kind="mergesort")
        u = df["user_id"].to_numpy().astype(np.int64)
        first = df["first_us"].to_numpy().astype(np.int64)
        last = df["last_us"].to_numpy().astype(np.int64)
        if len(u) < 2:
            return pd.DataFrame({"gap_h": np.empty(0, dtype=np.int64),
                                 "cnt": np.empty(0, dtype=np.int64)})
        same = u[1:] == u[:-1]
        g = (first[1:] - last[:-1])[same] // HOUR_US
        uk, cnt = np.unique(g, return_counts=True)
        return pd.DataFrame({"gap_h": uk, "cnt": cnt.astype(np.int64)})

    def add_part(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "part", pa.array(((u % N_EVENT_PARTS) + N_EVENT_PARTS)
                             % N_EVENT_PARTS, type=pa.int32()))

    from ray.data.aggregate import Sum

    hist = (
        sess.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(gaps, batch_format="pandas")
        .groupby("gap_h").aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()  # distinct-hour-gaps-sized
    )
    hist = hist.sort_values("gap_h", kind="mergesort")
    gh = hist["gap_h"].to_numpy().astype(np.int64)
    total, pick = _hist_rank_pick(
        gh, hist["cnt"].to_numpy().astype(np.int64))
    out = pd.DataFrame(
        {"n_gaps": np.array([total], dtype=np.int64),
         "p50_h": np.array([pick(1, 2)], dtype=np.int64),
         "p90_h": np.array([pick(9, 10)], dtype=np.int64),
         "max_h": np.array([int(gh[-1])], dtype=np.int64)})
    return pa.Table.from_pandas(out, preserve_index=False)


INTERSESSION_BANDS_SQL = (
    "WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,"
    " CASE WHEN lag(epoch_us(ts)) OVER w IS NULL"
    f"  OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US}"
    "  THEN 1 ELSE 0 END AS brk"
    " FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),"
    " s AS (SELECT user_id, ts_us, sum(brk) OVER (PARTITION BY user_id"
    "   ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM e),"
    " iv AS (SELECT user_id, sid, min(ts_us) AS a, max(ts_us) AS b"
    "  FROM s GROUP BY user_id, sid),"
    " g AS (SELECT (a - lag(b) OVER (PARTITION BY user_id ORDER BY a))"
    f"  // {HOUR_US} AS gap_h FROM iv)"
    " SELECT CAST(count(*) AS BIGINT) AS n_gaps,"
    " CAST(quantile_disc(gap_h, 0.5) AS BIGINT) AS p50_h,"
    " CAST(quantile_disc(gap_h, 0.9) AS BIGINT) AS p90_h,"
    " CAST(max(gap_h) AS BIGINT) AS max_h"
    " FROM g WHERE gap_h IS NOT NULL"
)


def q_repeat_revenue_share(sf_dir: str) -> "pa.Table":
    """Repeat-customer revenue share per year — cents booked by orders
    that are NOT the customer's first-ever order (first = smallest
    (order date, order key)), over the year's total: the
    new-vs-returning revenue split (``new_vs_returning`` counts users;
    this weights them by money).  Per-customer first-order identity
    comes from one customers-sized min-groupby broadcast as sorted
    arrays; the orders stream is then scanned once with a searchsorted
    probe — no self-join."""
    import pandas as pd

    from ray.data.aggregate import Min

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_orderkey",
                 "o_totalprice"],
    )

    def first_part(df: "pd.DataFrame") -> "pd.DataFrame":
        day = (df["o_orderdate"].to_numpy().astype("datetime64[us]")
               .astype(np.int64) // _DAY_US)
        ok = df["o_orderkey"].to_numpy().astype(np.int64)
        assert ok.max(initial=0) < (1 << 40), "orderkey packing"
        key = day * (1 << 40) + ok  # (date, orderkey) lexicographic
        g = pd.DataFrame({"ck": df["o_custkey"].to_numpy(), "k": key}) \
            .groupby("ck", as_index=False)["k"].min()
        return g

    firsts = (
        ds.map_batches(first_part, batch_format="pandas")
        .groupby("ck").aggregate(Min("k", alias_name="k"))
        .to_pandas()  # customers-sized
    ).sort_values("ck")
    ck_ref = ray.put(firsts["ck"].to_numpy().astype(np.int64))
    fk_ref = ray.put(firsts["k"].to_numpy().astype(np.int64))

    def split(df: "pd.DataFrame") -> "pd.DataFrame":
        cks = ray.get(ck_ref)
        fks = ray.get(fk_ref)
        day = (df["o_orderdate"].to_numpy().astype("datetime64[us]")
               .astype(np.int64) // _DAY_US)
        ok = df["o_orderkey"].to_numpy().astype(np.int64)
        key = day * (1 << 40) + ok
        oc = df["o_custkey"].to_numpy().astype(np.int64)
        pos = np.searchsorted(cks, oc)
        assert (pos < len(cks)).all() and (cks[pos] == oc).all(), \
            "dangling o_custkey"
        repeat = (key != fks[pos]).astype(np.int64)
        cents = np.rint(df["o_totalprice"].to_numpy() * 100) \
            .astype(np.int64)
        g = pd.DataFrame(
            {"year": df["o_orderdate"].dt.year.to_numpy()
             .astype(np.int64),
             "repeat_cents": cents * repeat, "cents": cents}
        ).groupby("year", as_index=False).sum()
        return g

    from ray.data.aggregate import Sum

    cells = (
        ds.map_batches(split, batch_format="pandas")
        .groupby("year")
        .aggregate(Sum("repeat_cents", alias_name="repeat_cents"),
                   Sum("cents", alias_name="cents"))
        .to_pandas()
    )
    cells["share_ppm"] = [
        int(r["repeat_cents"]) * 1_000_000 // int(r["cents"])
        for _, r in cells.iterrows()]
    return pa.Table.from_pandas(
        cells.astype({"year": np.int64, "repeat_cents": np.int64,
                      "cents": np.int64, "share_ppm": np.int64}),
        preserve_index=False,
    )


REPEAT_REVENUE_SHARE_SQL = (
    "WITH o AS (SELECT o_custkey,"
    f" epoch_us(o_orderdate) // {86_400_000_000} AS day,"
    " o_orderkey, CAST(year(o_orderdate) AS BIGINT) AS year,"
    " CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),"
    " k AS (SELECT *, day * 1099511627776 + o_orderkey AS kk FROM o),"
    " f AS (SELECT o_custkey, min(kk) AS fk FROM k GROUP BY o_custkey),"
    " s AS (SELECT k.year,"
    "  sum(CASE WHEN k.kk <> f.fk THEN k.cents ELSE 0 END)"
    "   AS repeat_cents,"
    "  sum(k.cents) AS cents"
    "  FROM k JOIN f USING (o_custkey) GROUP BY k.year)"
    " SELECT year, CAST(repeat_cents AS BIGINT) AS repeat_cents,"
    " CAST(cents AS BIGINT) AS cents,"
    " CAST(CAST(repeat_cents AS HUGEINT) * 1000000 // cents AS BIGINT)"
    "  AS share_ppm"
    " FROM s"
)


def q_type_mix_drift(sf_dir: str) -> "pa.Table":
    """Event-type mix drift across the midpoint split — the exact
    cross-normalized L1 between the two halves' TYPE histograms
    (Σ_t |c1(t)·n2 − c2(t)·n1|, ``value_drift_halves``' statistic
    pointed at the categorical mix): a product-behavior change (feature
    launch, bot wave) moves the type mix long before the value
    distribution shifts.  One (day × type)-sized exchange, driver
    split."""
    import pandas as pd

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    )

    def partial(df: "pd.DataFrame") -> "pd.DataFrame":
        ts_us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        g = pd.DataFrame(
            {"day": ts_us // _DAY_US,
             "event_type": df["event_type"].to_numpy()}
        ).groupby(["day", "event_type"], as_index=False).size()
        g.rename(columns={"size": "cnt"}, inplace=True)
        g["cnt"] = g["cnt"].astype(np.int64)
        return g

    from ray.data.aggregate import Sum

    hist = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["day", "event_type"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    days = hist["day"].to_numpy().astype(np.int64)
    mid = (int(days.min()) + int(days.max()) + 1) // 2
    first = days < mid
    c = hist["cnt"].to_numpy().astype(np.int64)
    n1, n2 = int(c[first].sum()), int(c[~first].sum())
    h1 = hist[first].groupby("event_type")["cnt"].sum()
    h2 = hist[~first].groupby("event_type")["cnt"].sum()
    allt = sorted(set(h1.index) | set(h2.index))
    # arbitrary-precision Python ints: c*n products exceed int64 past
    # ~6e9 events, and the SQL twin already sums in HUGEINT
    drift = sum(abs(int(h1.get(t, 0)) * n2 - int(h2.get(t, 0)) * n1)
                for t in allt)
    assert drift < (1 << 63), "type_mix_drift int64 output guard"
    out = pd.DataFrame(
        {"mid_day": np.array([mid], dtype=np.int64),
         "n1": np.array([n1], dtype=np.int64),
         "n2": np.array([n2], dtype=np.int64),
         "drift": np.array([drift], dtype=np.int64)})
    return pa.Table.from_pandas(out, preserve_index=False)


TYPE_MIX_DRIFT_SQL = (
    "WITH e AS (SELECT"
    f" epoch_us(ts) // {_DAY_US} AS day, event_type FROM events),"
    " mm AS (SELECT (min(day) + max(day) + 1) // 2 AS mid FROM e),"
    " h AS (SELECT event_type,"
    "  sum(CASE WHEN day < mid THEN 1 ELSE 0 END) AS c1,"
    "  sum(CASE WHEN day >= mid THEN 1 ELSE 0 END) AS c2"
    "  FROM e, mm GROUP BY event_type),"
    " n AS (SELECT sum(c1) AS n1, sum(c2) AS n2 FROM h)"
    " SELECT CAST(mid AS BIGINT) AS mid_day, CAST(n1 AS BIGINT) AS n1,"
    " CAST(n2 AS BIGINT) AS n2,"
    " CAST((SELECT sum(abs(CAST(c1 AS HUGEINT) * n.n2"
    "   - CAST(c2 AS HUGEINT) * n.n1)) FROM h) AS BIGINT) AS drift"
    " FROM mm, n"
)


def q_session_length_hist(sf_dir: str) -> "ray.data.Dataset":
    """Events-per-session histogram — how many sessions contain exactly
    k events: the bounce-rate distribution (k=1 mass) and the
    interaction-depth tail in one table, the event-count companion to
    ``session_duration_bands``' wall-clock view.  Composes the
    sessionizer with one histogram rollup."""
    sess = q_sessionize(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        ne = t["n_events"].to_numpy(zero_copy_only=False).astype(np.int64)
        uk, cnt = np.unique(ne, return_counts=True)
        return pa.table({"n_events": pa.array(uk),
                         "n_sessions": pa.array(cnt.astype(np.int64))})

    from ray.data.aggregate import Sum

    agg = (
        sess.map_batches(partial, batch_format="pyarrow")
        .groupby("n_events")
        .aggregate(Sum("n_sessions", alias_name="n_sessions"))
    )
    return agg.map_batches(
        lambda t: t.rename_columns(["n_events", "n_sessions"]),
        batch_format="pyarrow",
    )


SESSION_LENGTH_HIST_SQL = (
    "WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,"
    " CASE WHEN lag(epoch_us(ts)) OVER w IS NULL"
    f"  OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US}"
    "  THEN 1 ELSE 0 END AS brk"
    " FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),"
    " s AS (SELECT user_id, sum(brk) OVER (PARTITION BY user_id"
    "   ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM e),"
    " c AS (SELECT CAST(count(*) AS BIGINT) AS n_events FROM s"
    "  GROUP BY user_id, sid)"
    " SELECT n_events, CAST(count(*) AS BIGINT) AS n_sessions"
    " FROM c GROUP BY n_events"
)


def q_max_quiet(sf_dir: str) -> "pa.Table":
    """Longest silence per event type — the maximum inter-arrival gap
    (whole seconds) in each type's stream and the microsecond it began
    (ties -> earliest): the did-the-feed-die forensic every freshness
    SLO needs — ``interarrival_stats``' histogram can't say WHEN the
    worst gap happened.  Distributes without sorting a type's whole
    stream in one place: (type, day) partition folds emit each day's
    within-day max gap plus first/last event times, and the driver
    stitches cross-day boundary gaps over the (types × days)-sized
    summary table."""
    import pandas as pd

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "event_type"],
    )

    def add_key(t: pa.Table) -> pa.Table:
        ts_us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return t.append_column(
            "day", pa.array(ts_us // _DAY_US, type=pa.int64()))

    def fold(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(["ts", "event_id"], kind="mergesort")
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        if len(ts) >= 2:
            gaps = np.diff(ts)
            gi = int(np.argmax(gaps))
            mg, mg_at = int(gaps[gi]), int(ts[gi])
        else:
            mg, mg_at = 0, int(ts[0])
        return pd.DataFrame(
            {"event_type": df["event_type"].iloc[:1].to_numpy(),
             "day": df["day"].iloc[:1].to_numpy().astype(np.int64),
             "n": np.array([len(ts)], dtype=np.int64),
             "first_us": np.array([int(ts[0])], dtype=np.int64),
             "last_us": np.array([int(ts[-1])], dtype=np.int64),
             "max_gap": np.array([mg], dtype=np.int64),
             "gap_at": np.array([mg_at], dtype=np.int64)})

    days = (
        ds.map_batches(add_key, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .map_groups(fold, batch_format="pandas")
        .to_pandas()  # types x active-days
    )
    rows = []
    for ty, grp in days.groupby("event_type"):
        grp = grp.sort_values("day")
        if int(grp["n"].sum()) < 2:
            continue  # no gap exists: the SQL's non-null filter drops it
        best_gap, best_at = -1, 0
        prev_last = None
        for _, r in grp.iterrows():
            if prev_last is not None:
                cross = int(r["first_us"]) - prev_last
                if cross > best_gap or (cross == best_gap
                                        and prev_last < best_at):
                    best_gap, best_at = cross, prev_last
            if (int(r["max_gap"]) > best_gap
                    or (int(r["max_gap"]) == best_gap
                        and int(r["gap_at"]) < best_at)):
                best_gap, best_at = int(r["max_gap"]), int(r["gap_at"])
            prev_last = int(r["last_us"])
        rows.append((ty, best_gap // 1_000_000, best_at))
    out = pd.DataFrame(rows, columns=["event_type", "max_gap_s",
                                      "gap_start_us"])
    return pa.Table.from_pandas(
        out.astype({"max_gap_s": np.int64, "gap_start_us": np.int64}),
        preserve_index=False,
    )


MAX_QUIET_SQL = (
    "WITH g AS (SELECT event_type, epoch_us(ts) AS tu,"
    " lead(epoch_us(ts)) OVER (PARTITION BY event_type"
    "  ORDER BY ts, event_id) - epoch_us(ts) AS gap FROM events)"
    " SELECT event_type, CAST(gap // 1000000 AS BIGINT) AS max_gap_s,"
    " CAST(tu AS BIGINT) AS gap_start_us FROM g WHERE gap IS NOT NULL"
    " QUALIFY row_number() OVER (PARTITION BY event_type"
    "  ORDER BY gap DESC, tu) = 1"
)


def q_fulfillment_bands(sf_dir: str) -> "pa.Table":
    """Order-fulfillment latency envelope — exact p50/p90/max of
    (last lineitem ship day − order day) over fully-joined orders: the
    delivery-SLO table (the per-order intervals ``backlog_peak`` sweeps
    are here reduced to their duration distribution; rank = ceil(q·n),
    `_hist_rank_pick`).  Per-order ship-completion from a partial-max
    groupby, the order-date join via a second orders-sized pass, the
    envelope from a distinct-days histogram."""
    import pandas as pd

    from ray.data.aggregate import Max

    ships = (
        ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                              columns=["l_orderkey", "l_shipdate"])
        .map_batches(
            lambda df: df.assign(
                sd=df["l_shipdate"].to_numpy()
                .astype("datetime64[us]").astype(np.int64) // _DAY_US)
            .groupby("l_orderkey", as_index=False)["sd"].max(),
            batch_format="pandas")
        .groupby("l_orderkey").aggregate(Max("sd", alias_name="sd"))
        .to_pandas()  # orders-sized
    )
    odays = (
        ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_orderkey", "o_orderdate"])
        .map_batches(
            lambda df: pd.DataFrame(
                {"o_orderkey": df["o_orderkey"].to_numpy(),
                 "od": df["o_orderdate"].to_numpy()
                 .astype("datetime64[us]").astype(np.int64) // _DAY_US}),
            batch_format="pandas")
        .to_pandas()
    )
    m = odays.merge(ships, left_on="o_orderkey", right_on="l_orderkey")
    gap = (m["sd"].to_numpy().astype(np.int64)
           - m["od"].to_numpy().astype(np.int64))
    uk, cnt = np.unique(gap, return_counts=True)
    total, pick = _hist_rank_pick(uk, cnt.astype(np.int64))
    out = pd.DataFrame(
        {"n_orders": np.array([total], dtype=np.int64),
         "p50_days": np.array([pick(1, 2)], dtype=np.int64),
         "p90_days": np.array([pick(9, 10)], dtype=np.int64),
         "max_days": np.array([int(uk[-1])], dtype=np.int64)})
    return pa.Table.from_pandas(out, preserve_index=False)


FULFILLMENT_BANDS_SQL = (
    "WITH s AS (SELECT l_orderkey,"
    f" max(epoch_us(l_shipdate) // {86_400_000_000}) AS sd"
    " FROM lineitem GROUP BY l_orderkey),"
    " g AS (SELECT sd - epoch_us(o_orderdate)"
    f" // {86_400_000_000} AS gap FROM orders"
    "  JOIN s ON s.l_orderkey = o_orderkey)"
    " SELECT CAST(count(*) AS BIGINT) AS n_orders,"
    " CAST(quantile_disc(gap, 0.5) AS BIGINT) AS p50_days,"
    " CAST(quantile_disc(gap, 0.9) AS BIGINT) AS p90_days,"
    " CAST(max(gap) AS BIGINT) AS max_days FROM g"
)


def q_delta_code_bits(sf_dir: str) -> "pa.Table":
    """Delta-coding budget — the Elias-gamma rank-coding bits of the
    within-doc FIRST-DIFFERENCE distribution (rank over signed delta
    values, ties -> smaller delta): with ``rank_code_bits`` (raw) and
    ``bigram_code_bits`` (context) this completes the codec triangle —
    raw vs delta vs contextual — so the storage planner can read which
    transform pays BEFORE implementing it (the measured rationale
    behind the DOD encoder's design).  One distinct-delta histogram
    exchange."""
    import pandas as pd

    ds = _seq_ds(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        e = pa.array([], type=pa.int64())
        if len(v) < 2:
            return pa.table({"d": e, "cnt": e})
        n = np.diff(off)
        same = np.ones(len(v) - 1, dtype=bool)
        same[np.cumsum(n)[:-1] - 1] = False
        uk, cnt = np.unique((v[1:] - v[:-1])[same], return_counts=True)
        return pa.table({"d": pa.array(uk),
                         "cnt": pa.array(cnt.astype(np.int64))})

    from ray.data.aggregate import Sum

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("d").aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    hist = hist.sort_values(["cnt", "d"], ascending=[False, True],
                            kind="mergesort")
    c = hist["cnt"].to_numpy().astype(np.int64)
    rank = np.arange(1, len(c) + 1, dtype=np.int64)
    lg = np.frompyfunc(lambda r: int(r).bit_length() - 1, 1, 1)(rank) \
        .astype(np.int64)
    out = pd.DataFrame(
        {"n_deltas": np.array([int(c.sum())], dtype=np.int64),
         "n_distinct": np.array([len(c)], dtype=np.int64),
         "total_bits": np.array([int((c * (2 * lg + 1)).sum())],
                                dtype=np.int64)})
    return pa.Table.from_pandas(out, preserve_index=False)


def _delta_code_sql() -> str:
    pows = ", ".join(f"({k}, {1 << k})" for k in range(1, 43))
    return (
        f"{_FLAT_CTE},"
        " dl AS (SELECT tok - lag(tok) OVER"
        "  (PARTITION BY doc_id ORDER BY pos) AS d FROM flat),"
        " h AS (SELECT d, count(*) AS cnt FROM dl"
        "  WHERE d IS NOT NULL GROUP BY d),"
        " r AS (SELECT cnt, row_number() OVER"
        "  (ORDER BY cnt DESC, d) AS rnk FROM h),"
        f" p(k, v) AS (VALUES {pows}),"
        " b AS (SELECT cnt, (SELECT min(k) FROM p WHERE rnk < v) - 1"
        "  AS lg FROM r)"
        " SELECT CAST(sum(cnt) AS BIGINT) AS n_deltas,"
        " CAST(count(*) AS BIGINT) AS n_distinct,"
        " CAST(sum(cnt * (2 * lg + 1)) AS BIGINT) AS total_bits"
        " FROM b"
    )


DELTA_CODE_BITS_SQL = _delta_code_sql()


def q_revenue_concentration(sf_dir: str) -> "pa.Table":
    """Revenue concentration per year — customers with orders, total
    cents and the Herfindahl numerator Σ(per-customer cents)² for each
    order year: whale-dependence over time (a rising sum_sq/cents²
    means fewer customers carry the book — pricing and churn risk in
    one integer table; ``supplier_hhi``'s lens pointed at the demand
    side).  One (customer × year)-sized partial groupby, then a
    years-sized fold."""
    import pandas as pd

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )

    def partial(df: "pd.DataFrame") -> "pd.DataFrame":
        g = pd.DataFrame(
            {"ck": df["o_custkey"].to_numpy(),
             "year": df["o_orderdate"].dt.year.to_numpy().astype(np.int64),
             "cents": np.rint(df["o_totalprice"].to_numpy() * 100)
             .astype(np.int64)}
        ).groupby(["ck", "year"], as_index=False)["cents"].sum()
        return g

    from ray.data.aggregate import Sum

    cells = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["ck", "year"]).aggregate(Sum("cents", alias_name="cents"))
        .to_pandas()  # customers x years
    )
    rows = []
    for yr, grp in cells.groupby("year"):
        c = grp["cents"].to_numpy().astype(np.int64)
        ssq = sum(int(v) * int(v) for v in c)  # exact object ints
        assert ssq < (1 << 63), "revenue_concentration int64 guard"
        rows.append((int(yr), len(c), int(c.sum()), ssq))
    out = pd.DataFrame(rows, columns=["year", "n_cust", "cents",
                                      "sum_sq"])
    return pa.Table.from_pandas(
        out.astype({c: np.int64 for c in out.columns}),
        preserve_index=False,
    )


REVENUE_CONCENTRATION_SQL = (
    "WITH c AS (SELECT o_custkey,"
    " CAST(year(o_orderdate) AS BIGINT) AS year,"
    " CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)"
    "  AS cents"
    " FROM orders GROUP BY o_custkey, year)"
    " SELECT year, CAST(count(*) AS BIGINT) AS n_cust,"
    " CAST(sum(cents) AS BIGINT) AS cents,"
    " CAST(sum(CAST(cents AS HUGEINT) * cents) AS BIGINT) AS sum_sq"
    " FROM c GROUP BY year"
)


def q_round_bias(sf_dir: str) -> "ray.data.Dataset":
    """Round-number bias per event type — of each type's cent values,
    how many are exact multiples of 100 (whole currency units) and of
    1000: the data-entry / synthetic-data artifact detector (human-
    typed and templated numbers cluster on round values; organic
    measurements don't) — the trailing-digit complement to
    ``benford_digits``' leading-digit audit.  One pre-aggregated pass,
    a types-sized exchange."""
    import pandas as pd

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def partial(df: "pd.DataFrame") -> "pd.DataFrame":
        tok = np.rint(df["value"].to_numpy() * 100).astype(np.int64)
        g = pd.DataFrame(
            {"event_type": df["event_type"].to_numpy(),
             "r100": (tok % 100 == 0).astype(np.int64),
             "r1000": (tok % 1000 == 0).astype(np.int64)}
        ).groupby("event_type", as_index=False).agg(
            pn=("r100", "size"), p100=("r100", "sum"),
            p1000=("r1000", "sum"))
        g["pn"] = g["pn"].astype(np.int64)
        return g

    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("event_type")
        .aggregate(Sum("pn", alias_name="n"),
                   Sum("p100", alias_name="n_round100"),
                   Sum("p1000", alias_name="n_round1000"))
    )
    return agg.map_batches(
        lambda t: t.rename_columns(
            ["event_type", "n", "n_round100", "n_round1000"]),
        batch_format="pyarrow",
    )


ROUND_BIAS_SQL = (
    "WITH e AS (SELECT event_type,"
    " CAST(round(value * 100) AS BIGINT) AS tok FROM events)"
    " SELECT event_type, CAST(count(*) AS BIGINT) AS n,"
    " CAST(sum(CASE WHEN tok % 100 = 0 THEN 1 ELSE 0 END) AS BIGINT)"
    "  AS n_round100,"
    " CAST(sum(CASE WHEN tok % 1000 = 0 THEN 1 ELSE 0 END) AS BIGINT)"
    "  AS n_round1000"
    " FROM e GROUP BY event_type"
)


def q_arrival_dispersion(sf_dir: str) -> "pa.Table":
    """Arrival-process dispersion per week-hour — for every (day-of-
    week, hour-of-day) cell, the number of observed calendar days k and
    the exact Σc / Σc² of that cell's per-day event counts: the Fano
    ingredients (variance/mean > 1 ⟺ k·Σc² > Σc² + Σc·Σc... computed
    by the consumer from these integers) that tell a capacity model
    whether arrivals are Poisson-ish or bursty AT THE SAME clock hour
    across weeks — ``punchcard`` sums the cell, this measures its
    week-to-week stability.  One (day × 24)-sized exchange, a 168-row
    driver fold."""
    import pandas as pd

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        ts_us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = ts_us // _DAY_US
        hod = (ts_us // HOUR_US) % 24
        key = day * 24 + hod
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({"dh": pa.array(uk),
                         "c": pa.array(cnt.astype(np.int64))})

    from ray.data.aggregate import Sum

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("dh").aggregate(Sum("c", alias_name="c"))
        .to_pandas()  # (active day x hour)-sized
    )
    dh = cells["dh"].to_numpy().astype(np.int64)
    c = cells["c"].to_numpy().astype(np.int64)
    day = dh // 24
    dow = (day + 3) % 7
    hod = dh % 24
    g = pd.DataFrame({"dow": dow, "hod": hod, "c": c}).groupby(
        ["dow", "hod"], as_index=False).agg(
        k=("c", "size"), sum_c=("c", "sum"),
        sum_c2=("c", lambda v: int((v.to_numpy() ** 2).sum())))
    g["k"] = g["k"].astype(np.int64)
    return pa.Table.from_pandas(
        g.astype({"dow": np.int64, "hod": np.int64, "k": np.int64,
                  "sum_c": np.int64, "sum_c2": np.int64}),
        preserve_index=False,
    )


ARRIVAL_DISPERSION_SQL = (
    "WITH d AS (SELECT"
    f" epoch_us(ts) // {_DAY_US} AS day,"
    f" (epoch_us(ts) // {HOUR_US}) % 24 AS hod, count(*) AS c"
    " FROM events GROUP BY day, hod)"
    " SELECT CAST((day + 3) % 7 AS BIGINT) AS dow,"
    " CAST(hod AS BIGINT) AS hod, CAST(count(*) AS BIGINT) AS k,"
    " CAST(sum(c) AS BIGINT) AS sum_c,"
    " CAST(sum(c * c) AS BIGINT) AS sum_c2"
    " FROM d GROUP BY dow, hod"
)


VOLUME_RHYTHM_LAGS = (1, 7)


def q_volume_rhythm(sf_dir: str) -> "pa.Table":
    """Volume-rhythm autocorrelation — for lag 1 and lag 7 (weekly),
    the exact Pearson component sums over the consecutive-CALENDAR-day
    total-count series (missing days count 0, so the lag alignment is
    true calendar arithmetic): n, Σx, Σy, Σxy, Σx², Σy².  A strong
    lag-7 numerator n·Σxy − Σx·Σy is the is-there-a-weekly-cycle test
    on load itself — ``autocorr_lags`` does this per sequence, this
    does it for the event stream's own arrival volume.  One active-
    days-sized exchange; the dense calendar series and both lag folds
    are a driver array op."""
    import pandas as pd

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        ts_us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        uk, cnt = np.unique(ts_us // _DAY_US, return_counts=True)
        return pa.table({"day": pa.array(uk),
                         "c": pa.array(cnt.astype(np.int64))})

    from ray.data.aggregate import Sum

    days = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("day").aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    d = days["day"].to_numpy().astype(np.int64)
    c = days["c"].to_numpy().astype(np.int64)
    lo, hi = int(d.min()), int(d.max())
    dense = np.zeros(hi - lo + 1, dtype=np.int64)
    dense[d - lo] = c
    rows = []
    for lag in VOLUME_RHYTHM_LAGS:
        if len(dense) <= lag:
            rows.append((lag, 0, 0, 0, 0, 0, 0))
            continue
        x, y = dense[:-lag], dense[lag:]
        rows.append((lag, len(x), int(x.sum()), int(y.sum()),
                     int((x * y).sum()), int((x * x).sum()),
                     int((y * y).sum())))
    out = pd.DataFrame(rows, columns=["lag", "n", "sx", "sy", "sxy",
                                      "sxx", "syy"])
    return pa.Table.from_pandas(
        out.astype({col: np.int64 for col in out.columns}),
        preserve_index=False,
    )


def _volume_rhythm_sql() -> str:
    legs = []
    for lag in VOLUME_RHYTHM_LAGS:
        legs.append(
            f"SELECT CAST({lag} AS BIGINT) AS lag,"
            " CAST(count(*) AS BIGINT) AS n,"
            " CAST(COALESCE(sum(x), 0) AS BIGINT) AS sx,"
            " CAST(COALESCE(sum(y), 0) AS BIGINT) AS sy,"
            " CAST(COALESCE(sum(x * y), 0) AS BIGINT) AS sxy,"
            " CAST(COALESCE(sum(x * x), 0) AS BIGINT) AS sxx,"
            " CAST(COALESCE(sum(y * y), 0) AS BIGINT) AS syy"
            " FROM (SELECT COALESCE(a.c, 0) AS x, COALESCE(b.c, 0) AS y"
            "  FROM g CROSS JOIN cal"
            "  LEFT JOIN h a ON a.day = cal.day"
            f"  LEFT JOIN h b ON b.day = cal.day + {lag}"
            f"  WHERE cal.day + {lag} <= g.hi)"
        )
    u = " UNION ALL ".join(legs)
    return (
        "WITH h AS (SELECT"
        f" epoch_us(ts) // {_DAY_US} AS day, count(*) AS c FROM events"
        "  GROUP BY day),"
        " g AS (SELECT min(day) AS lo, max(day) AS hi FROM h),"
        " cal AS (SELECT g.lo + CAST(t.i AS BIGINT) AS day FROM g,"
        "  UNNEST(range(0, CAST(g.hi - g.lo + 1 AS INTEGER))) AS t(i))"
        f" {u}"
    )


VOLUME_RHYTHM_SQL = _volume_rhythm_sql()


def q_parts_per_supplier_hist(sf_dir: str) -> "ray.data.Dataset":
    """Supplier catalog-breadth histogram — how many suppliers ship
    exactly k distinct parts: the assortment fan-out that bounds the
    worst-case width of any supplier-side co-partition, dual to
    ``lines_per_order_hist``'s order fan-out and ``supplier_hhi``'s
    per-brand concentration.  Distinct (supp, part) pairs -> per-supp
    distinct counts -> a histogram; every exchange pair- or
    histogram-sized."""
    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_suppkey", "l_partkey"])

    def pairs(t: pa.Table) -> pa.Table:
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        assert pk.max(initial=0) < (1 << 31), "parts key packing"
        key = np.unique(sk * (1 << 31) + pk)
        return pa.table({"s": pa.array(key >> 31),
                         "p": pa.array(key & ((1 << 31) - 1))})

    from ray.data.aggregate import Sum

    hist = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby(["s", "p"]).count()
        .select_columns(["s"])
        .groupby("s").count()
        .map_batches(
            lambda t: pa.table(
                {"n_parts": pc.cast(t["count()"], pa.int64()),
                 "one": pa.array(np.ones(len(t), dtype=np.int64))}),
            batch_format="pyarrow")
        .groupby("n_parts").aggregate(Sum("one", alias_name="n_suppliers"))
    )
    return hist.map_batches(
        lambda t: t.rename_columns(["n_parts", "n_suppliers"]),
        batch_format="pyarrow",
    )


PARTS_PER_SUPPLIER_HIST_SQL = (
    "WITH u AS (SELECT l_suppkey,"
    " CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts"
    " FROM lineitem GROUP BY l_suppkey)"
    " SELECT n_parts, CAST(count(*) AS BIGINT) AS n_suppliers"
    " FROM u GROUP BY n_parts"
)


def q_gap_cluster(sf_dir: str) -> "pa.Table":
    """Inter-arrival clustering — the exact integer moments of
    consecutive per-user gap pairs (g_t, g_{t+1}) in whole seconds,
    corpus-wide: n_pairs, Σx, Σy, Σxy, Σx², Σy².  The lag-1 Pearson
    numerator n·Σxy − Σx·Σy > 0 means short gaps follow short gaps —
    BURSTS have structure beyond what ``interarrival_stats``'s marginal
    histogram or ``user_burstiness``'s per-user dispersion can see
    (``vol_cluster``'s ARCH test, applied to the arrival process).
    Same coarse user-hash partition fold as sessionize; the exchange is
    six integers.  SECOND granularity keeps Σx² exact in int64 (a
    month-long gap squares to ~7e12; ms granularity measured an actual
    int64 overflow on this fixture)."""
    import pandas as pd

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )

    def fold(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        uid = df["user_id"].to_numpy().astype(np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        n = len(df)
        cols = ("n_pairs", "sx", "sy", "sxy", "sxx", "syy")
        if n < 3:
            return pd.DataFrame({c: np.zeros(1, dtype=np.int64)
                                 for c in cols})
        g = (ts[1:] - ts[:-1]) // 1_000_000
        vg = uid[1:] == uid[:-1]
        ok = vg[:-1] & vg[1:]
        if ok.any():
            mg, npairs = int(g[:-1][ok].max()), int(ok.sum())
            assert mg * mg * max(npairs, 1) < (1 << 63), \
                "gap_cluster int64 guard: coarsen gap granularity"
        x = np.where(ok, g[:-1], 0)
        y = np.where(ok, g[1:], 0)
        return pd.DataFrame(
            {"n_pairs": np.array([int(ok.sum())], dtype=np.int64),
             "sx": np.array([int(x.sum())], dtype=np.int64),
             "sy": np.array([int(y.sum())], dtype=np.int64),
             "sxy": np.array([int((x * y).sum())], dtype=np.int64),
             "sxx": np.array([int((x * x).sum())], dtype=np.int64),
             "syy": np.array([int((y * y).sum())], dtype=np.int64)})

    parts = (
        ds.map_batches(_add_user_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()  # N_EVENT_PARTS rows
    )
    # final fold in arbitrary-precision Python ints: each partition's
    # partial is int64-guarded, but the cross-partition TOTAL could
    # still wrap a numpy sum (third-review finding) — so don't use one
    cols = ("n_pairs", "sx", "sy", "sxy", "sxx", "syy")
    totals = {k: sum(int(v) for v in parts[k]) for k in cols}
    assert all(v < (1 << 63) for v in totals.values()), \
        "gap_cluster int64 guard: coarsen gap granularity"
    out = pd.DataFrame({k: np.array([totals[k]], dtype=np.int64)
                        for k in cols})
    return pa.Table.from_pandas(out, preserve_index=False)


GAP_CLUSTER_SQL = (
    "WITH g AS (SELECT user_id, epoch_us(ts) AS tu, event_id,"
    " (epoch_us(ts) - lag(epoch_us(ts)) OVER w) // 1000000 AS gp"
    " FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),"
    " p AS (SELECT gp AS x, lead(gp) OVER"
    "  (PARTITION BY user_id ORDER BY tu, event_id) AS y FROM g"
    "  WHERE gp IS NOT NULL)"
    " SELECT CAST(count(*) AS BIGINT) AS n_pairs,"
    " CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,"
    " CAST(sum(x * y) AS BIGINT) AS sxy,"
    " CAST(sum(x * x) AS BIGINT) AS sxx,"
    " CAST(sum(y * y) AS BIGINT) AS syy"
    " FROM p WHERE y IS NOT NULL"
)


def q_bigram_code_bits(sf_dir: str) -> "pa.Table":
    """Contextual coding budget — Elias-gamma bits to code every
    within-doc adjacent token PAIR by its global pair-frequency rank
    (same convention as ``rank_code_bits``): the drop from
    2·rank_code_bits to this number is exactly how much one token of
    context compresses the stream — the division-free, log-free stand-in
    for conditional entropy that a tokenizer/codec decision can act on.
    One distinct-pair histogram exchange (cooc-table class), the gamma
    fold on the driver."""
    import pandas as pd

    ds = _seq_ds(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        e = pa.array([], type=pa.int64())
        if len(v) < 2:
            return pa.table({"x": e, "y": e, "cnt": e})
        n = np.diff(off)
        assert (n > 0).all(), "bigram_code_bits requires non-empty docs"
        same = np.ones(len(v) - 1, dtype=bool)
        ends = np.cumsum(n)[:-1] - 1
        same[ends] = False
        key = (v[:-1] << 21) | v[1:]   # tok < 2^20 -> collision-free
        uk, cnt = np.unique(key[same], return_counts=True)
        return pa.table(
            {"x": pa.array(uk >> 21), "y": pa.array(uk & ((1 << 21) - 1)),
             "cnt": pa.array(cnt.astype(np.int64))}
        )

    from ray.data.aggregate import Sum

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["x", "y"]).aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()  # distinct-pair-sized
    )
    hist = hist.sort_values(["cnt", "x", "y"],
                            ascending=[False, True, True],
                            kind="mergesort")
    c = hist["cnt"].to_numpy().astype(np.int64)
    rank = np.arange(1, len(c) + 1, dtype=np.int64)
    lg = np.frompyfunc(lambda r: int(r).bit_length() - 1, 1, 1)(rank) \
        .astype(np.int64)
    out = pd.DataFrame(
        {"n_pairs": np.array([int(c.sum())], dtype=np.int64),
         "n_distinct": np.array([len(c)], dtype=np.int64),
         "total_bits": np.array([int((c * (2 * lg + 1)).sum())],
                                dtype=np.int64)})
    return pa.Table.from_pandas(out, preserve_index=False)


def _bigram_code_sql() -> str:
    pows = ", ".join(f"({k}, {1 << k})" for k in range(1, 43))
    return (
        f"{_FLAT_CTE},"
        " bg AS (SELECT tok AS x, lead(tok) OVER"
        "  (PARTITION BY doc_id ORDER BY pos) AS y FROM flat),"
        " h AS (SELECT x, y, count(*) AS cnt FROM bg"
        "  WHERE y IS NOT NULL GROUP BY x, y),"
        " r AS (SELECT cnt, row_number() OVER"
        "  (ORDER BY cnt DESC, x, y) AS rnk FROM h),"
        f" p(k, v) AS (VALUES {pows}),"
        " b AS (SELECT cnt, (SELECT min(k) FROM p WHERE rnk < v) - 1"
        "  AS lg FROM r)"
        " SELECT CAST(sum(cnt) AS BIGINT) AS n_pairs,"
        " CAST(count(*) AS BIGINT) AS n_distinct,"
        " CAST(sum(cnt * (2 * lg + 1)) AS BIGINT) AS total_bits"
        " FROM b"
    )


BIGRAM_CODE_BITS_SQL = _bigram_code_sql()


def q_lang_source_mix(sf_dir: str):
    """Language × source mix — document counts per (source, lang) plus
    each language's share_ppm within its source: the mixture table a
    per-language sampling-weight pass reads (and the context for
    ``langid_confusion``'s mismatches — a source that is 2% German
    explains a 2% 'de' confusion row).  One (sources × langs)-sized
    exchange, shares a driver fold."""
    import pandas as pd

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["source", "lang"])

    def partial(df: "pd.DataFrame") -> "pd.DataFrame":
        g = df.groupby(["source", "lang"], as_index=False).size()
        g.rename(columns={"size": "n"}, inplace=True)
        g["n"] = g["n"].astype(np.int64)
        return g

    from ray.data.aggregate import Sum

    cells = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["source", "lang"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    tot = cells.groupby("source")["n"].sum()
    cells["share_ppm"] = [
        int(r["n"]) * 1_000_000 // int(tot[r["source"]])
        for _, r in cells.iterrows()]
    return pa.Table.from_pandas(
        cells.astype({"n": np.int64, "share_ppm": np.int64}),
        preserve_index=False,
    )


LANG_SOURCE_MIX_SQL = (
    "WITH c AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS n"
    " FROM documents GROUP BY source, lang),"
    " t AS (SELECT source, sum(n) AS tot FROM c GROUP BY source)"
    " SELECT c.source, c.lang, c.n,"
    " CAST(c.n * 1000000 // t.tot AS BIGINT) AS share_ppm"
    " FROM c JOIN t USING (source)"
)


def q_seasonal_amplitude(sf_dir: str) -> "pa.Table":
    """Seasonal swing per event type — the hour-of-day whose MEAN value
    is highest (peak_hod) and lowest (trough_hod), compared as exact
    rationals (s1·n2 vs s2·n1 — no float means; ties -> smaller hod)
    over the (type × 24) profile, plus both cells' integer (n, s):
    how much a day's rhythm actually swings, the number behind
    ``hourly_profile``'s full table.  One tiny-profile exchange, a
    Python-int driver argmax (24 cells/type)."""
    import pandas as pd

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )

    def partial(df: "pd.DataFrame") -> "pd.DataFrame":
        ts_us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        g = pd.DataFrame(
            {"event_type": df["event_type"].to_numpy(),
             "hod": (ts_us // HOUR_US) % 24,
             "tok": np.rint(df["value"].to_numpy() * 100).astype(np.int64)}
        ).groupby(["event_type", "hod"], as_index=False).agg(
            pn=("tok", "size"), ps=("tok", "sum"))
        g["pn"] = g["pn"].astype(np.int64)
        return g

    from ray.data.aggregate import Sum

    prof = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["event_type", "hod"])
        .aggregate(Sum("pn", alias_name="n"), Sum("ps", alias_name="s"))
        .to_pandas()
    )
    rows = []
    for ty, grp in prof.groupby("event_type"):
        cells = sorted((int(r["hod"]), int(r["n"]), int(r["s"]))
                       for _, r in grp.iterrows())

        def better(a, b, hi: bool) -> bool:
            # mean(a) vs mean(b) by cross-multiplication, tie -> smaller hod
            lhs, rhs = a[2] * b[1], b[2] * a[1]
            if lhs != rhs:
                return lhs > rhs if hi else lhs < rhs
            return False  # equal means: keep the earlier (smaller hod)

        pk = tr = cells[0]
        for c in cells[1:]:
            if better(c, pk, True):
                pk = c
            if better(c, tr, False):
                tr = c
        rows.append((ty, pk[0], pk[1], pk[2], tr[0], tr[1], tr[2]))
    out = pd.DataFrame(rows, columns=["event_type", "peak_hod", "peak_n",
                                      "peak_s", "trough_hod", "trough_n",
                                      "trough_s"])
    return pa.Table.from_pandas(
        out.astype({c: np.int64 for c in out.columns
                    if c != "event_type"}),
        preserve_index=False,
    )


SEASONAL_AMPLITUDE_SQL = (
    "WITH e AS (SELECT event_type,"
    f" (epoch_us(ts) // {HOUR_US}) % 24 AS hod,"
    " CAST(round(value * 100) AS BIGINT) AS tok FROM events),"
    " p AS (SELECT event_type, hod, CAST(count(*) AS BIGINT) AS n,"
    "  CAST(sum(tok) AS BIGINT) AS s FROM e GROUP BY event_type, hod),"
    # exact rational ranking WITHOUT division: floor(s * 2^62 / n) is a
    # total order consistent with s/n because distinct means differ by
    # >= 1/(n1*n2) > 2^-62 for n < 2^31 — HUGEINT keeps s * 2^62 exact
    " pk AS (SELECT event_type, hod, n, s FROM p a"
    "  QUALIFY row_number() OVER (PARTITION BY event_type"
    "   ORDER BY CAST(s AS HUGEINT) * 4611686018427387904 // n DESC,"
    "    hod) = 1),"
    " tr AS (SELECT event_type, hod, n, s FROM p a"
    "  QUALIFY row_number() OVER (PARTITION BY event_type"
    "   ORDER BY CAST(s AS HUGEINT) * 4611686018427387904 // n ASC,"
    "    hod) = 1)"
    " SELECT pk.event_type, CAST(pk.hod AS BIGINT) AS peak_hod,"
    " pk.n AS peak_n, pk.s AS peak_s,"
    " CAST(tr.hod AS BIGINT) AS trough_hod, tr.n AS trough_n,"
    " tr.s AS trough_s"
    " FROM pk JOIN tr USING (event_type)"
)


def q_region_share_by_year(sf_dir: str) -> "pa.Table":
    """Regional revenue mix over time — order cents per (region, order
    year) and each region's share_ppm within its year: the market-mix
    drift table (a region losing share year over year is a leading
    demand signal).  The customer->nation->region dimension chain
    broadcasts once (sorted searchsorted probes, the revenue_by_nation
    pattern); the orders stream is read once, the exchange is
    (regions × years)-sized."""
    import pandas as pd

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).to_pandas().sort_values("c_custkey")
    nat = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
    ).to_pandas().sort_values("n_nationkey")
    reg = ray.data.read_parquet(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    ).to_pandas().sort_values("r_regionkey")
    side = ray.put((
        cust["c_custkey"].to_numpy().astype(np.int64),
        cust["c_nationkey"].to_numpy().astype(np.int64),
        nat["n_nationkey"].to_numpy().astype(np.int64),
        nat["n_regionkey"].to_numpy().astype(np.int64),
        reg["r_regionkey"].to_numpy().astype(np.int64),
        reg["r_name"].to_numpy(),
    ))

    def partial(df: "pd.DataFrame") -> "pd.DataFrame":
        ck, cn, nk, nr, rk, rn = ray.get(side)
        oc = df["o_custkey"].to_numpy().astype(np.int64)
        p1 = np.searchsorted(ck, oc)
        assert (p1 < len(ck)).all() and (ck[p1] == oc).all(), \
            "dangling o_custkey"
        natk = cn[p1]
        p2 = np.searchsorted(nk, natk)
        assert (p2 < len(nk)).all() and (nk[p2] == natk).all(), \
            "dangling c_nationkey"
        regk = nr[p2]
        p3 = np.searchsorted(rk, regk)
        assert (p3 < len(rk)).all() and (rk[p3] == regk).all(), \
            "dangling n_regionkey"
        year = df["o_orderdate"].dt.year.to_numpy().astype(np.int64)
        cents = np.rint(df["o_totalprice"].to_numpy() * 100) \
            .astype(np.int64)
        g = pd.DataFrame({"region": rn[p3], "year": year,
                          "cents": cents}) \
            .groupby(["region", "year"], as_index=False)["cents"].sum()
        return g

    from ray.data.aggregate import Sum

    cells = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_custkey", "o_orderdate", "o_totalprice"])
        .map_batches(partial, batch_format="pandas")
        .groupby(["region", "year"])
        .aggregate(Sum("cents", alias_name="cents"))
        .to_pandas()  # regions x years
    )
    tot = cells.groupby("year")["cents"].sum()
    cells["share_ppm"] = [
        int(r["cents"]) * 1_000_000 // int(tot[r["year"]])
        for _, r in cells.iterrows()]
    return pa.Table.from_pandas(
        cells.astype({"year": np.int64, "cents": np.int64,
                      "share_ppm": np.int64}),
        preserve_index=False,
    )


REGION_SHARE_BY_YEAR_SQL = (
    "WITH o AS (SELECT r.r_name AS region,"
    " CAST(year(o_orderdate) AS BIGINT) AS year,"
    " CAST(round(o_totalprice * 100) AS BIGINT) AS cents"
    " FROM orders"
    " JOIN customer c ON c.c_custkey = o_custkey"
    " JOIN nation n ON n.n_nationkey = c.c_nationkey"
    " JOIN region r ON r.r_regionkey = n.n_regionkey),"
    " s AS (SELECT region, year, CAST(sum(cents) AS BIGINT) AS cents"
    "  FROM o GROUP BY region, year),"
    " t AS (SELECT year, sum(cents) AS tot FROM s GROUP BY year)"
    " SELECT s.region, s.year, s.cents,"
    " CAST(CAST(s.cents AS HUGEINT) * 1000000 // t.tot AS BIGINT)"
    "  AS share_ppm"
    " FROM s JOIN t USING (year)"
)


def q_local_maxima(sf_dir: str) -> "ray.data.Dataset":
    """Per-doc peak census — count of STRICT local maxima (tok >
    both neighbors; endpoints never qualify) and the mean peak spacing
    numerator (n_tok, so consumers get spacing = n/(peaks+1) exactly):
    the peakiness audit separating oscillatory sequences from trends
    before a motif or period pass is even worth scheduling.  One
    vectorized neighbor compare, boundary triples masked, one
    reduceat."""
    ds = _seq_ds(sf_dir)

    def peaks(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        D = len(off) - 1
        e = pa.array([], type=pa.int64())
        if D == 0 or len(v) == 0:
            return pa.table(
                {"doc_id": pa.array([], type=pa.string()), "n": e,
                 "n_peaks": e}
            )
        n = np.diff(off)
        assert (n > 0).all(), "local_maxima requires non-empty docs"
        N = len(v)
        seg = np.repeat(np.arange(D, dtype=np.int64), n)
        ok = np.zeros(N, dtype=np.int64)
        if N >= 3:
            mid = ((v[1:-1] > v[:-2]) & (v[1:-1] > v[2:])
                   & (seg[1:-1] == seg[:-2]) & (seg[1:-1] == seg[2:]))
            ok[1:-1] = mid.astype(np.int64)
        cnt = np.add.reduceat(ok, off[:-1])
        return pa.table(
            {"doc_id": t["doc_id"], "n": pa.array(n.astype(np.int64)),
             "n_peaks": pa.array(cnt)}
        )

    return ds.map_batches(peaks, batch_format="pyarrow", batch_size=512)


LOCAL_MAXIMA_SQL = (
    f"{_FLAT_CTE},"
    " l AS (SELECT doc_id, tok,"
    "  lag(tok) OVER w AS p, lead(tok) OVER w AS nx FROM flat"
    "  WINDOW w AS (PARTITION BY doc_id ORDER BY pos))"
    " SELECT doc_id, CAST(count(*) AS BIGINT) AS n,"
    " CAST(sum(CASE WHEN p IS NOT NULL AND nx IS NOT NULL"
    "  AND tok > p AND tok > nx THEN 1 ELSE 0 END) AS BIGINT) AS n_peaks"
    " FROM l GROUP BY doc_id"
)


def q_order_value_delta(sf_dir: str) -> "pa.Table":
    """Customer spend-trajectory split — of the customers with 2+
    orders, how many spent MORE on their last order than their first
    (up), less (down), or the same (flat), plus the exact cent sums of
    firsts and lasts: the expansion-vs-contraction headline a revenue
    review opens with.  First/last by (order date, order key) — fully
    deterministic; per-customer extraction folds inside coarse
    customer-hash partitions (one sort per partition), the finish is a
    single-row sum."""
    import pandas as pd

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_orderkey",
                 "o_totalprice"],
    )

    def add_part(t: pa.Table) -> pa.Table:
        u = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "part", pa.array(u % N_EVENT_PARTS, type=pa.int32()))

    def fold(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"],
                            kind="mergesort")
        ck = df["o_custkey"].to_numpy().astype(np.int64)
        cents = np.rint(df["o_totalprice"].to_numpy() * 100) \
            .astype(np.int64)
        n = len(ck)
        start = np.ones(n, dtype=bool)
        start[1:] = ck[1:] != ck[:-1]
        si = np.flatnonzero(start)
        ei = np.append(si[1:], n) - 1
        multi = ei > si  # customers with 2+ orders
        first, last = cents[si[multi]], cents[ei[multi]]
        return pd.DataFrame(
            {"n_cust": np.array([int(multi.sum())], dtype=np.int64),
             "n_up": np.array([int((last > first).sum())],
                              dtype=np.int64),
             "n_down": np.array([int((last < first).sum())],
                                dtype=np.int64),
             "n_flat": np.array([int((last == first).sum())],
                                dtype=np.int64),
             "first_cents": np.array([int(first.sum())], dtype=np.int64),
             "last_cents": np.array([int(last.sum())], dtype=np.int64)})

    tot = (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(fold, batch_format="pandas")
        .sum(["n_cust", "n_up", "n_down", "n_flat", "first_cents",
              "last_cents"])
    )
    out = pd.DataFrame(
        {k: np.array([int(tot[f"sum({k})"])], dtype=np.int64)
         for k in ("n_cust", "n_up", "n_down", "n_flat", "first_cents",
                   "last_cents")})
    return pa.Table.from_pandas(out, preserve_index=False)


ORDER_VALUE_DELTA_SQL = (
    "WITH o AS (SELECT o_custkey,"
    " CAST(round(o_totalprice * 100) AS BIGINT) AS cents,"
    " row_number() OVER (PARTITION BY o_custkey"
    "  ORDER BY o_orderdate, o_orderkey) AS rf,"
    " row_number() OVER (PARTITION BY o_custkey"
    "  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rl,"
    " count(*) OVER (PARTITION BY o_custkey) AS nc FROM orders),"
    " fl AS (SELECT o_custkey,"
    "  max(CASE WHEN rf = 1 THEN cents END) AS first_c,"
    "  max(CASE WHEN rl = 1 THEN cents END) AS last_c"
    "  FROM o WHERE nc >= 2 GROUP BY o_custkey)"
    " SELECT CAST(count(*) AS BIGINT) AS n_cust,"
    " CAST(sum(CASE WHEN last_c > first_c THEN 1 ELSE 0 END) AS BIGINT)"
    "  AS n_up,"
    " CAST(sum(CASE WHEN last_c < first_c THEN 1 ELSE 0 END) AS BIGINT)"
    "  AS n_down,"
    " CAST(sum(CASE WHEN last_c = first_c THEN 1 ELSE 0 END) AS BIGINT)"
    "  AS n_flat,"
    " CAST(sum(first_c) AS BIGINT) AS first_cents,"
    " CAST(sum(last_c) AS BIGINT) AS last_cents"
    " FROM fl"
)


def q_lines_per_order_hist(sf_dir: str) -> "ray.data.Dataset":
    """Order-complexity histogram — how many orders have exactly k
    lineitems: the fan-out distribution that sizes the order->lineitem
    join's skew budget (a fat tail here is tomorrow's straggling
    co-partition task).  Per-batch partial counts, an orders-sized
    count groupby, a histogram-sized second rollup."""
    import pandas as pd

    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey"])

    def partial(t: pa.Table) -> pa.Table:
        k = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        uk, cnt = np.unique(k, return_counts=True)
        return pa.table({"o": pa.array(uk),
                         "c": pa.array(cnt.astype(np.int64))})

    from ray.data.aggregate import Sum

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("o").aggregate(Sum("c", alias_name="c"))
        .map_batches(
            lambda t: pa.table(
                {"n_lines": t["c"],
                 "one": pa.array(np.ones(len(t), dtype=np.int64))}),
            batch_format="pyarrow")
        .groupby("n_lines").aggregate(Sum("one", alias_name="n_orders"))
    )
    return hist.map_batches(
        lambda t: t.rename_columns(["n_lines", "n_orders"]),
        batch_format="pyarrow",
    )


LINES_PER_ORDER_HIST_SQL = (
    "WITH c AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lines"
    " FROM lineitem GROUP BY l_orderkey)"
    " SELECT n_lines, CAST(count(*) AS BIGINT) AS n_orders"
    " FROM c GROUP BY n_lines"
)


def q_types_per_user_hist(sf_dir: str) -> "ray.data.Dataset":
    """Behavioral-breadth histogram — how many users touch exactly k
    distinct event types: the engagement-diversity distribution
    (single-type users are bots or single-feature visitors; full-
    spectrum users are the retention core ``fav_type_dist`` labels by
    their dominant type).  Distinct (user, type) pairs -> per-user
    distinct counts -> a <=|types|-bin histogram; every exchange is
    pair- or histogram-sized."""
    import pandas as pd

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )

    def pairs(df: "pd.DataFrame") -> "pd.DataFrame":
        g = df.drop_duplicates(["user_id", "event_type"])
        return g[["user_id", "event_type"]]

    from ray.data.aggregate import Count, Sum

    hist = (
        ds.map_batches(pairs, batch_format="pandas")
        .groupby(["user_id", "event_type"]).count()
        .select_columns(["user_id"])
        .groupby("user_id").count()
        .map_batches(
            lambda t: pa.table(
                {"n_types": pc.cast(t["count()"], pa.int64()),
                 "one": pa.array(np.ones(len(t), dtype=np.int64))}),
            batch_format="pyarrow")
        .groupby("n_types").aggregate(Sum("one", alias_name="n_users"))
    )
    return hist.map_batches(
        lambda t: t.rename_columns(["n_types", "n_users"]),
        batch_format="pyarrow",
    )


TYPES_PER_USER_HIST_SQL = (
    "WITH u AS (SELECT user_id,"
    " CAST(count(DISTINCT event_type) AS BIGINT) AS n_types"
    " FROM events GROUP BY user_id)"
    " SELECT n_types, CAST(count(*) AS BIGINT) AS n_users"
    " FROM u GROUP BY n_types"
)


ALIGN_LAGS = 64  # circular lags scanned (the calibration grid width)


def q_probe_align(sf_dir: str) -> "pa.Table":
    """Pairwise probe alignment — for every equal-length pair of the
    fixture's closed-form probe sequences, the circular lag in
    [0, ALIGN_LAGS) maximizing the circular cross-correlation (exact
    int64 dot products, ties -> smallest lag): the pairwise analog of
    ``best_shift``'s self-calibration, i.e. the reference's
    translation-alignment step applied BETWEEN signals
    (calc_translations.py's intent across series).  The probe family is
    O(1) rows by construction, so the scan is a driver-side numpy fold
    over a filtered read; the SQL twin does the same 64-lag scan with a
    modular join."""
    import pandas as pd

    ds = _seq_ds(sf_dir).filter(lambda r: r["source"] == "probe")
    probes = ds.to_pandas()  # O(1) fixture rows
    probes = probes.sort_values("doc_id")
    rows = []
    recs = [(r["doc_id"], np.asarray(r["tokens"], dtype=np.int64))
            for _, r in probes.iterrows()]
    for i in range(len(recs)):
        for j in range(i + 1, len(recs)):
            da, va = recs[i]
            db, vb = recs[j]
            if len(va) != len(vb):
                continue
            n = len(va)
            best_lag, best_dot = 0, None
            for lag in range(min(ALIGN_LAGS, n)):
                dot = int(va @ np.roll(vb, -lag))
                if best_dot is None or dot > best_dot:
                    best_lag, best_dot = lag, dot
            rows.append((da, db, n, best_lag, best_dot))
    out = pd.DataFrame(rows, columns=["doc_a", "doc_b", "n",
                                      "best_lag", "best_dot"])
    return pa.Table.from_pandas(
        out.astype({"n": np.int64, "best_lag": np.int64,
                    "best_dot": np.int64}),
        preserve_index=False,
    )


PROBE_ALIGN_SQL = (
    f"{_FLAT_CTE},"
    " f AS (SELECT doc_id, tok, pos FROM flat WHERE source = 'probe'),"
    " n AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS L FROM f"
    "  GROUP BY doc_id),"
    " pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.L"
    "  FROM n a JOIN n b ON a.L = b.L AND a.doc_id < b.doc_id),"
    f" ls AS (SELECT CAST(i AS BIGINT) AS lag FROM range(0, {ALIGN_LAGS})"
    "  t(i)),"
    " d AS (SELECT pr.doc_a, pr.doc_b, pr.L, ls.lag,"
    "  CAST(sum(fa.tok * fb.tok) AS BIGINT) AS dot"
    "  FROM pr JOIN ls ON ls.lag < pr.L"
    "  JOIN f fa ON fa.doc_id = pr.doc_a"
    "  JOIN f fb ON fb.doc_id = pr.doc_b"
    "   AND fb.pos = (fa.pos + ls.lag) % pr.L"
    "  GROUP BY pr.doc_a, pr.doc_b, pr.L, ls.lag)"
    " SELECT doc_a, doc_b, L AS n, CAST(lag AS BIGINT) AS best_lag,"
    " dot AS best_dot FROM d"
    " QUALIFY row_number() OVER (PARTITION BY doc_a, doc_b"
    "  ORDER BY dot DESC, lag) = 1"
)


def q_rank_code_bits(sf_dir: str) -> "pa.Table":
    """Universal-code budget — the exact total bits to Elias-gamma code
    every token by its global frequency RANK (1-based, ties -> smaller
    token first; gamma(r) costs 2·floor(log2 r) + 1 bits): the
    entropy-style compressibility estimate that needs NO logarithms of
    probabilities — rank-coding a Zipfian stream is within a constant
    of its entropy, so this single number tracks corpus compressibility
    across rounds exactly.  One distinct-value histogram exchange;
    floor(log2) is pure integer bit-length on the engine side and a
    powers-of-two table join in SQL (the ``bits_plan`` trick)."""
    import pandas as pd

    ds = _seq_ds(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        vals, _ = list_to_numpy(t["tokens"])
        uk, cnt = np.unique(vals.astype(np.int64), return_counts=True)
        return pa.table({"tok": pa.array(uk),
                         "cnt": pa.array(cnt.astype(np.int64))})

    from ray.data.aggregate import Sum

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("tok").aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    hist = hist.sort_values(["cnt", "tok"], ascending=[False, True],
                            kind="mergesort")
    c = hist["cnt"].to_numpy().astype(np.int64)
    rank = np.arange(1, len(c) + 1, dtype=np.int64)
    # floor(log2(rank)): int64 bit_length - 1, vectorized
    lg = np.frompyfunc(lambda r: int(r).bit_length() - 1, 1, 1)(rank) \
        .astype(np.int64)
    total_bits = int((c * (2 * lg + 1)).sum())
    out = pd.DataFrame(
        {"n_tokens": np.array([int(c.sum())], dtype=np.int64),
         "n_values": np.array([len(c)], dtype=np.int64),
         "total_bits": np.array([total_bits], dtype=np.int64)})
    return pa.Table.from_pandas(out, preserve_index=False)


def _rank_code_sql() -> str:
    # floor(log2(r)) = k - 1 for the smallest k with r < 2^k (r <= 2^21)
    pows = ", ".join(f"({k}, {1 << k})" for k in range(1, 22))
    return (
        f"{_FLAT_CTE},"
        " h AS (SELECT tok, count(*) AS cnt FROM flat GROUP BY tok),"
        " r AS (SELECT cnt, row_number() OVER"
        "  (ORDER BY cnt DESC, tok) AS rnk FROM h),"
        f" p(k, v) AS (VALUES {pows}),"
        " b AS (SELECT cnt, (SELECT min(k) FROM p WHERE rnk < v) - 1"
        "  AS lg FROM r)"
        " SELECT CAST(sum(cnt) AS BIGINT) AS n_tokens,"
        " CAST(count(*) AS BIGINT) AS n_values,"
        " CAST(sum(cnt * (2 * lg + 1)) AS BIGINT) AS total_bits"
        " FROM b"
    )


RANK_CODE_BITS_SQL = _rank_code_sql()


def q_repurchase_interval(sf_dir: str) -> "pa.Table":
    """Median reorder interval per market segment — for every customer
    with 2+ orders, the gaps (days) between consecutive orders,
    histogrammed per segment and reduced to n_gaps + the exact lower-
    median gap: the replenishment-cycle metric behind inventory and
    re-engagement timing.  The customer->segment dimension broadcasts
    as sorted arrays; gaps fold inside coarse customer-hash partitions
    (one sort + diff per partition — no per-customer micro-groups);
    the only global exchange is the (segment x distinct-gap)
    histogram."""
    import pandas as pd

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"],
    ).to_pandas().sort_values("c_custkey")
    ckeys = cust["c_custkey"].to_numpy().astype(np.int64)
    useg, seg_inv = np.unique(cust["c_mktsegment"].to_numpy(),
                              return_inverse=True)
    side = ray.put((ckeys, seg_inv.astype(np.int64), useg))

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    )

    def add_part(t: pa.Table) -> pa.Table:
        u = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "part", pa.array(u % N_EVENT_PARTS, type=pa.int32()))

    def fold(df: "pd.DataFrame") -> "pd.DataFrame":
        keys, sinv, segs = ray.get(side)
        df = df.sort_values(["o_custkey", "o_orderdate"],
                            kind="mergesort")
        ck = df["o_custkey"].to_numpy().astype(np.int64)
        day = (df["o_orderdate"].to_numpy().astype("datetime64[us]")
               .astype(np.int64) // _DAY_US)
        if len(ck) < 2:
            return pd.DataFrame({"segment": np.empty(0, dtype=object),
                                 "gap": np.empty(0, dtype=np.int64),
                                 "cnt": np.empty(0, dtype=np.int64)})
        gap = np.diff(day)
        same = ck[1:] == ck[:-1]
        gap, gck = gap[same], ck[1:][same]
        pos = np.searchsorted(keys, gck)
        assert (pos < len(keys)).all() and (keys[pos] == gck).all(), \
            "dangling o_custkey"
        g = pd.DataFrame({"segment": segs[sinv[pos]], "gap": gap}) \
            .groupby(["segment", "gap"], as_index=False).size()
        g.rename(columns={"size": "cnt"}, inplace=True)
        g["cnt"] = g["cnt"].astype(np.int64)
        return g

    from ray.data.aggregate import Sum

    hist = (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(fold, batch_format="pandas")
        .groupby(["segment", "gap"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()  # segments x distinct gaps
    )
    rows = []
    for seg, grp in hist.groupby("segment"):
        grp = grp.sort_values("gap")
        total, pick = _hist_rank_pick(
            grp["gap"].to_numpy().astype(np.int64),
            grp["cnt"].to_numpy().astype(np.int64))
        rows.append((seg, total, pick(1, 2)))
    out = pd.DataFrame(rows, columns=["segment", "n_gaps", "p50_gap_days"])
    return pa.Table.from_pandas(
        out.astype({"n_gaps": np.int64, "p50_gap_days": np.int64}),
        preserve_index=False,
    )


REPURCHASE_INTERVAL_SQL = (
    "WITH o AS (SELECT o_custkey,"
    f" epoch_us(o_orderdate) // {86_400_000_000} AS day FROM orders),"
    " g AS (SELECT o_custkey, day - lag(day) OVER"
    "  (PARTITION BY o_custkey ORDER BY day) AS gap FROM o),"
    " j AS (SELECT c.c_mktsegment AS segment, g.gap FROM g"
    "  JOIN customer c ON c.c_custkey = g.o_custkey"
    "  WHERE g.gap IS NOT NULL)"
    " SELECT segment, CAST(count(*) AS BIGINT) AS n_gaps,"
    " CAST(quantile_disc(gap, 0.5) AS BIGINT) AS p50_gap_days"
    " FROM j GROUP BY segment"
)


def q_discount_uplift(sf_dir: str) -> "ray.data.Dataset":
    """Discount uplift per brand — do discounted lineitems move MORE
    units?  Per p_brand: discounted/undiscounted line counts and
    quantity sums plus the exact cross-statistic uplift =
    q_disc·n_free − q_free·n_disc (positive iff the discounted mean
    quantity exceeds the undiscounted one, no division): the promo-
    effectiveness read-out, with the part->brand dimension broadcast
    exactly as in ``supplier_hhi``.  One streaming pass, a brands-sized
    exchange."""
    import pandas as pd

    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    ).to_pandas().sort_values("p_partkey")
    pk = part["p_partkey"].to_numpy().astype(np.int64)
    ub, binv = np.unique(part["p_brand"].to_numpy(), return_inverse=True)
    side = ray.put((pk, binv.astype(np.int64), ub))

    def partial(df: "pd.DataFrame") -> "pd.DataFrame":
        keys, bidx, brands = ray.get(side)
        lpk = df["l_partkey"].to_numpy().astype(np.int64)
        pos = np.searchsorted(keys, lpk)
        assert (pos < len(keys)).all() and (keys[pos] == lpk).all(), \
            "dangling l_partkey"
        disc = np.rint(df["l_discount"].to_numpy() * 100).astype(np.int64)
        qty = df["l_quantity"].to_numpy().astype(np.int64)
        isd = (disc > 0).astype(np.int64)
        g = pd.DataFrame(
            {"brand": brands[bidx[pos]], "n_disc": isd,
             "q_disc": qty * isd, "n_free": 1 - isd,
             "q_free": qty * (1 - isd)}
        ).groupby("brand", as_index=False).sum()
        return g

    from ray.data.aggregate import Sum

    agg = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_discount", "l_quantity"])
        .map_batches(partial, batch_format="pandas")
        .groupby("brand")
        .aggregate(Sum("n_disc", alias_name="n_disc"),
                   Sum("q_disc", alias_name="q_disc"),
                   Sum("n_free", alias_name="n_free"),
                   Sum("q_free", alias_name="q_free"))
    )

    def finish(t: pa.Table) -> pa.Table:
        t = t.rename_columns(["brand", "n_disc", "q_disc", "n_free",
                              "q_free"])
        qd = t["q_disc"].to_numpy(zero_copy_only=False).astype(np.int64)
        qf = t["q_free"].to_numpy(zero_copy_only=False).astype(np.int64)
        nd = t["n_disc"].to_numpy(zero_copy_only=False).astype(np.int64)
        nf = t["n_free"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("uplift", pa.array(qd * nf - qf * nd))

    return agg.map_batches(finish, batch_format="pyarrow")


DISCOUNT_UPLIFT_SQL = (
    "WITH l AS (SELECT p.p_brand AS brand,"
    " CASE WHEN CAST(round(l_discount * 100) AS BIGINT) > 0"
    "  THEN 1 ELSE 0 END AS isd,"
    " CAST(l_quantity AS BIGINT) AS qty"
    " FROM lineitem JOIN part p ON p.p_partkey = l_partkey),"
    " c AS (SELECT brand, CAST(sum(isd) AS BIGINT) AS n_disc,"
    "  CAST(sum(qty * isd) AS BIGINT) AS q_disc,"
    "  CAST(sum(1 - isd) AS BIGINT) AS n_free,"
    "  CAST(sum(qty * (1 - isd)) AS BIGINT) AS q_free"
    "  FROM l GROUP BY brand)"
    " SELECT brand, n_disc, q_disc, n_free, q_free,"
    " CAST(q_disc * n_free - q_free * n_disc AS BIGINT) AS uplift"
    " FROM c"
)


PROFILE_OUTLIER_K = 20


def q_profile_outliers(sf_dir: str) -> "pa.Table":
    """Seasonal-profile residual outliers — the PROFILE_OUTLIER_K events
    deviating most from their (event_type, hour-of-day) cell mean,
    scored integer-exactly as |tok·n_cell − sum_cell| · 10^6 // n_cell
    (the |residual| in micro-cents, cross-multiplied so no float mean
    exists on either side; ties -> event_id).  The profile-RELATIVE
    anomaly list — ``events_zscore16`` flags deviation from a trailing
    window, this flags deviation from the seasonal norm, catching
    'normal for 3am, absurd for 9am' cases.  The tiny (type × 24)
    profile broadcasts once; one scoring scan emits per-batch top-k."""
    import pandas as pd

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "event_type", "value"],
    )

    def prof_part(df: "pd.DataFrame") -> "pd.DataFrame":
        ts_us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        g = pd.DataFrame(
            {"event_type": df["event_type"].to_numpy(),
             "hod": (ts_us // HOUR_US) % 24,
             "tok": np.rint(df["value"].to_numpy() * 100).astype(np.int64)}
        ).groupby(["event_type", "hod"], as_index=False).agg(
            pn=("tok", "size"), ps=("tok", "sum"))
        g["pn"] = g["pn"].astype(np.int64)
        return g

    from ray.data.aggregate import Sum

    prof = (
        ds.map_batches(prof_part, batch_format="pandas")
        .groupby(["event_type", "hod"])
        .aggregate(Sum("pn", alias_name="n"), Sum("ps", alias_name="s"))
        .to_pandas()  # type-alphabet x 24
    )
    utypes = np.sort(prof["event_type"].unique())
    tn = np.zeros((len(utypes), 24), dtype=np.int64)
    tsum = np.zeros((len(utypes), 24), dtype=np.int64)
    ti = np.searchsorted(utypes, prof["event_type"].to_numpy())
    tn[ti, prof["hod"].to_numpy().astype(np.int64)] = \
        prof["n"].to_numpy().astype(np.int64)
    tsum[ti, prof["hod"].to_numpy().astype(np.int64)] = \
        prof["s"].to_numpy().astype(np.int64)
    p_ref = ray.put((utypes, tn, tsum))

    def score(df: "pd.DataFrame") -> "pd.DataFrame":
        uty, pn, ps = ray.get(p_ref)
        ts_us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        hod = (ts_us // HOUR_US) % 24
        tok = np.rint(df["value"].to_numpy() * 100).astype(np.int64)
        ety = df["event_type"].to_numpy()
        tpos = np.searchsorted(uty, ety)  # dense vectorized gather
        n = pn[tpos, hod]
        sm = ps[tpos, hod]
        resid = np.abs(tok * n - sm)
        assert len(resid) == 0 or \
            int(resid.max()) < (1 << 63) // 1_000_000, \
            "profile_outliers int64 guard: residual x 1e6 would wrap"
        sc = resid * 1_000_000 // n
        out = pd.DataFrame(
            {"event_id": df["event_id"].to_numpy().astype(np.int64),
             "event_type": ety, "hod": hod, "tok": tok, "score": sc})
        out = out.sort_values(["score", "event_id"],
                              ascending=[False, True],
                              kind="mergesort").head(PROFILE_OUTLIER_K)
        return out

    cand = (
        ds.map_batches(score, batch_format="pandas")
        .to_pandas()  # <= K per batch
    )
    cand = cand.sort_values(["score", "event_id"],
                            ascending=[False, True],
                            kind="mergesort").head(PROFILE_OUTLIER_K)
    return pa.Table.from_pandas(
        cand.astype({"event_id": np.int64, "hod": np.int64,
                     "tok": np.int64, "score": np.int64})
        .reset_index(drop=True),
        preserve_index=False,
    )


PROFILE_OUTLIERS_SQL = (
    "WITH e AS (SELECT event_id, event_type,"
    f" (epoch_us(ts) // {HOUR_US}) % 24 AS hod,"
    " CAST(round(value * 100) AS BIGINT) AS tok FROM events),"
    " p AS (SELECT event_type, hod, CAST(count(*) AS BIGINT) AS n,"
    "  CAST(sum(tok) AS BIGINT) AS s FROM e GROUP BY event_type, hod)"
    " SELECT e.event_id, e.event_type, CAST(e.hod AS BIGINT) AS hod,"
    " e.tok,"
    " CAST(abs(e.tok * p.n - p.s) * 1000000 // p.n AS BIGINT) AS score"
    " FROM e JOIN p USING (event_type, hod)"
    " ORDER BY score DESC, e.event_id"
    f" LIMIT {PROFILE_OUTLIER_K}"
)


def q_anomaly_days(sf_dir: str) -> "pa.Table":
    """Daily-volume anomaly flags — each active day's event count
    against the robust fence |n − median| > 3·MAD (both exact from the
    tiny day-count table; MAD from the deviations' own lower median):
    the day-level incident detector a pipeline health page leads with,
    composing ``daily_rollup``'s counting with ``type_mad``'s robust
    dispersion.  One (active-days)-sized exchange, the fences a driver
    fold."""
    import pandas as pd

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        ts_us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        uk, cnt = np.unique(ts_us // _DAY_US, return_counts=True)
        return pa.table({"day": pa.array(uk),
                         "n": pa.array(cnt.astype(np.int64))})

    from ray.data.aggregate import Sum

    days = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("day").aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    days = days.sort_values("day", kind="mergesort")
    n = days["n"].to_numpy().astype(np.int64)

    def lower_median(v: np.ndarray) -> int:
        sv = np.sort(v)
        return int(sv[(len(sv) + 1) // 2 - 1])

    med = lower_median(n)
    mad = lower_median(np.abs(n - med))
    out = pd.DataFrame(
        {"day": days["day"].to_numpy().astype(np.int64), "n": n,
         "med": np.full(len(n), med, dtype=np.int64),
         "mad": np.full(len(n), mad, dtype=np.int64),
         "is_anom": (np.abs(n - med) > 3 * mad).astype(np.int64)})
    return pa.Table.from_pandas(out, preserve_index=False)


ANOMALY_DAYS_SQL = (
    "WITH d AS (SELECT"
    f" epoch_us(ts) // {_DAY_US} AS day, count(*) AS n FROM events"
    "  GROUP BY day),"
    " m AS (SELECT CAST(quantile_disc(n, 0.5) AS BIGINT) AS med FROM d),"
    " md AS (SELECT CAST(quantile_disc(abs(n - med), 0.5) AS BIGINT)"
    "  AS mad FROM d, m)"
    " SELECT CAST(day AS BIGINT) AS day, CAST(n AS BIGINT) AS n,"
    " med, mad,"
    " CAST(CASE WHEN abs(n - med) > 3 * mad THEN 1 ELSE 0 END AS BIGINT)"
    "  AS is_anom"
    " FROM d, m, md"
)


def q_fav_type_dist(sf_dir: str) -> "pa.Table":
    """Favorite-event-type distribution — per user the most frequent
    type (ties -> alphabetical), then how many users favor each type:
    the one-number behavioral segmentation (a population whose favorite
    flips from 'view' to 'error' is an incident, not a trend).  Per-
    (user, type) counts fold inside the same coarse user-hash
    partitions as ``sessionize`` (no per-user micro-groups); the final
    exchange is types-sized."""
    import pandas as pd

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )

    def fold(df: "pd.DataFrame") -> "pd.DataFrame":
        g = df.groupby(["user_id", "event_type"], as_index=False).size()
        g = g.sort_values(["user_id", "size", "event_type"],
                          ascending=[True, False, True],
                          kind="mergesort")
        fav = g.drop_duplicates("user_id", keep="first")
        out = fav.groupby("event_type", as_index=False).size()
        out.rename(columns={"size": "n_users"}, inplace=True)
        out["n_users"] = out["n_users"].astype(np.int64)
        return out

    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(_add_user_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(fold, batch_format="pandas")
        .groupby("event_type")
        .aggregate(Sum("n_users", alias_name="n_users"))
    )
    return agg.map_batches(
        lambda t: t.rename_columns(["event_type", "n_users"]),
        batch_format="pyarrow",
    )


FAV_TYPE_DIST_SQL = (
    "WITH c AS (SELECT user_id, event_type, count(*) AS n FROM events"
    "  GROUP BY user_id, event_type),"
    " f AS (SELECT user_id, event_type FROM c"
    "  QUALIFY row_number() OVER (PARTITION BY user_id"
    "   ORDER BY n DESC, event_type) = 1)"
    " SELECT event_type, CAST(count(*) AS BIGINT) AS n_users"
    " FROM f GROUP BY event_type"
)


def q_compress_bits_by_source(sf_dir: str) -> "ray.data.Dataset":
    """Per-source Gorilla sizing table — docs, delta-of-delta count and
    the exact total payload bits under the tier encoder's DOD budget:
    the capacity-planning rollup of ``doc_compress_bits`` (which source
    pays for the storage, and which compresses so well its tier can
    deepen — feeds ``tier_pick``'s loss side with the size side).
    Same one-pass masked second-difference kernel, folded per source
    inside the batch; the only exchange is sources-sized."""
    ds = _seq_ds(sf_dir)

    def stats(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        n_docs = len(off) - 1
        e = pa.array([], type=pa.int64())
        empty = pa.table(
            {"source": pa.array([], type=pa.string()), "n_docs": e,
             "n_dod": e, "dod_bits": e}
        )
        if n_docs == 0 or len(v) < 3:
            return empty
        n = np.diff(off)
        kept = n >= 3
        if not kept.any():
            return empty
        src = np.asarray(t["source"].to_pylist())
        usrc, sinv = np.unique(src[kept], return_inverse=True)
        seg = np.repeat(np.arange(n_docs, dtype=np.int64), n)
        dd = np.diff(v, n=2)
        valid = seg[: len(dd)] == seg[2:]
        bits = np.full(len(dd), DOD_CLASS_BITS[-1], dtype=np.int64)
        for k, (lo, hi) in enumerate(reversed(DOD_BOUNDS)):
            idx = len(DOD_BOUNDS) - k
            bits[(dd >= lo) & (dd <= hi)] = DOD_CLASS_BITS[idx]
        bits[dd == 0] = DOD_CLASS_BITS[0]
        bits = np.where(valid, bits, 0)
        bits = np.concatenate((bits, [0, 0]))
        per_doc = np.add.reduceat(bits, off[:-1])[kept]
        nb = np.zeros(len(usrc), dtype=np.int64)
        nd = np.zeros(len(usrc), dtype=np.int64)
        cnt = np.bincount(sinv, minlength=len(usrc)).astype(np.int64)
        np.add.at(nb, sinv, per_doc)
        np.add.at(nd, sinv, n[kept] - 2)
        return pa.table(
            {"source": pa.array(usrc), "n_docs": pa.array(cnt),
             "n_dod": pa.array(nd), "dod_bits": pa.array(nb)}
        )

    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(stats, batch_format="pyarrow", batch_size=256)
        .groupby("source")
        .aggregate(Sum("n_docs", alias_name="n_docs"),
                   Sum("n_dod", alias_name="n_dod"),
                   Sum("dod_bits", alias_name="dod_bits"))
    )
    return agg.map_batches(
        lambda t: t.rename_columns(["source", "n_docs", "n_dod",
                                    "dod_bits"]),
        batch_format="pyarrow",
    )


def _compress_by_source_sql() -> str:
    cases = " ".join(
        f"WHEN dod >= {lo} AND dod <= {hi} THEN {DOD_CLASS_BITS[i + 1]}"
        for i, (lo, hi) in enumerate(DOD_BOUNDS)
    )
    return (
        f"{_FLAT_CTE},"
        " l AS (SELECT doc_id, source, tok,"
        "  lag(tok) OVER w AS p1, lag(tok, 2) OVER w AS p2 FROM flat"
        "  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),"
        " d AS (SELECT doc_id, source, tok - 2 * p1 + p2 AS dod FROM l"
        "  WHERE p2 IS NOT NULL)"
        " SELECT source,"
        " CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,"
        " CAST(count(*) AS BIGINT) AS n_dod,"
        f" CAST(sum(CASE WHEN dod = 0 THEN {DOD_CLASS_BITS[0]} {cases}"
        f"  ELSE {DOD_CLASS_BITS[-1]} END) AS BIGINT) AS dod_bits"
        " FROM d GROUP BY source"
    )


COMPRESS_BITS_BY_SOURCE_SQL = _compress_by_source_sql()


COVERAGE_KS = (10, 100, 1000, 10000)


def q_coverage_curve(sf_dir: str) -> "pa.Table":
    """Vocabulary coverage curve — for k in COVERAGE_KS, the corpus
    mass (ppm) carried by the k most frequent token values (ties ->
    smaller token first, so the ranking is deterministic): the Zipf
    coverage table that decides vocab truncation / hot-value caching
    ("the top 1000 values cover 87% of the stream").  One
    distinct-value histogram exchange, a sorted driver fold."""
    import pandas as pd

    ds = _seq_ds(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        vals, _ = list_to_numpy(t["tokens"])
        uk, cnt = np.unique(vals.astype(np.int64), return_counts=True)
        return pa.table({"tok": pa.array(uk),
                         "cnt": pa.array(cnt.astype(np.int64))})

    from ray.data.aggregate import Sum

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("tok").aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    hist = hist.sort_values(["cnt", "tok"], ascending=[False, True],
                            kind="mergesort")
    c = hist["cnt"].to_numpy().astype(np.int64)
    total = int(c.sum())
    cum = np.cumsum(c)
    rows = []
    for k in COVERAGE_KS:
        # empty corpus: zero values covered, zero mass (no division)
        if total == 0:
            rows.append((k, 0, 0))
            continue
        mass = int(cum[min(k, len(c)) - 1])
        rows.append((k, min(k, len(c)), mass * 1_000_000 // total))
    out = pd.DataFrame(rows, columns=["k", "n_values", "mass_ppm"])
    return pa.Table.from_pandas(
        out.astype({"k": np.int64, "n_values": np.int64,
                    "mass_ppm": np.int64}),
        preserve_index=False,
    )


def _coverage_sql() -> str:
    ks = ", ".join(str(k) for k in COVERAGE_KS)
    return (
        f"{_FLAT_CTE},"
        " h AS (SELECT tok, count(*) AS cnt FROM flat GROUP BY tok),"
        " r AS (SELECT cnt, row_number() OVER"
        "  (ORDER BY cnt DESC, tok) AS rn FROM h),"
        " tot AS (SELECT sum(cnt) AS n, count(*) AS nv FROM h),"
        f" ks AS (SELECT CAST(unnest([{ks}]) AS BIGINT) AS k)"
        " SELECT ks.k,"
        " CAST(LEAST(ks.k, tot.nv) AS BIGINT) AS n_values,"
        " CAST((SELECT sum(cnt) FROM r WHERE rn <= ks.k)"
        "  * 1000000 // tot.n AS BIGINT) AS mass_ppm"
        " FROM ks CROSS JOIN tot"
    )


COVERAGE_CURVE_SQL = _coverage_sql()


def q_type_mad(sf_dir: str) -> "pa.Table":
    """Per-type median absolute deviation — the robust dispersion pair
    (median, MAD) of each event type's cent values, both EXACT via two
    value-histogram passes (rank = ceil(n/2), quantile_disc's lower-
    median convention): pass 1 folds the (type, value) histogram and
    takes each type's median on the driver; pass 2 histograms
    |value − median| against the broadcast medians.  The outlier
    threshold ``anomaly_mad`` applies per sequence, here per event
    type — and the canonical example of a statistic that CANNOT be
    one-pass streamed yet needs only two distinct-value-sized
    exchanges, never the event stream."""
    import pandas as pd

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def hist1(t: pa.Table) -> pa.Table:
        tok = np.rint(
            t["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        g = pd.DataFrame(
            {"event_type": t["event_type"].to_numpy(zero_copy_only=False),
             "tok": tok}
        ).groupby(["event_type", "tok"], as_index=False).size()
        g.rename(columns={"size": "cnt"}, inplace=True)
        g["cnt"] = g["cnt"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    def med_from(hist: "pd.DataFrame", vcol: str) -> dict:
        out = {}
        for ty, grp in hist.groupby("event_type"):
            grp = grp.sort_values(vcol)
            c = grp["cnt"].to_numpy().astype(np.int64)
            cum = np.cumsum(c)
            rank = (int(cum[-1]) + 1) // 2
            out[ty] = int(grp[vcol].to_numpy()[
                int(np.searchsorted(cum, rank))])
        return out

    h1 = (
        ds.map_batches(hist1, batch_format="pyarrow")
        .groupby(["event_type", "tok"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    med = med_from(h1, "tok")
    med_ref = ray.put(med)

    def hist2(t: pa.Table) -> pa.Table:
        m = ray.get(med_ref)
        ety = t["event_type"].to_numpy(zero_copy_only=False)
        tok = np.rint(
            t["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        meds = np.fromiter((m[x] for x in ety), dtype=np.int64,
                           count=len(ety))
        g = pd.DataFrame(
            {"event_type": ety, "dev": np.abs(tok - meds)}
        ).groupby(["event_type", "dev"], as_index=False).size()
        g.rename(columns={"size": "cnt"}, inplace=True)
        g["cnt"] = g["cnt"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    h2 = (
        ds.map_batches(hist2, batch_format="pyarrow")
        .groupby(["event_type", "dev"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    mad = med_from(h2, "dev")
    n_by = h1.groupby("event_type")["cnt"].sum()
    out = pd.DataFrame(
        {"event_type": sorted(med),
         "n": [int(n_by[t]) for t in sorted(med)],
         "med": [med[t] for t in sorted(med)],
         "mad": [mad[t] for t in sorted(med)]})
    return pa.Table.from_pandas(
        out.astype({"n": np.int64, "med": np.int64, "mad": np.int64}),
        preserve_index=False,
    )


TYPE_MAD_SQL = (
    "WITH e AS (SELECT event_type,"
    " CAST(round(value * 100) AS BIGINT) AS tok FROM events),"
    " m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,"
    "  CAST(quantile_disc(tok, 0.5) AS BIGINT) AS med FROM e"
    "  GROUP BY event_type)"
    " SELECT e.event_type, m.n, m.med,"
    " CAST(quantile_disc(abs(e.tok - m.med), 0.5) AS BIGINT) AS mad"
    " FROM e JOIN m USING (event_type) GROUP BY e.event_type, m.n, m.med"
)


def q_backlog_peak(sf_dir: str) -> "pa.Table":
    """Peak order backlog — each order is OPEN from its order date to
    its last lineitem ship date; report the maximum number of
    simultaneously open orders and the earliest day it occurs: the
    working-capital / fulfillment-capacity headline, and
    ``peak_concurrency``'s sweep line composed with a fact-fact JOIN
    (per-order ship-completion from a partial-max groupby; orders
    without lineitems never open).  Deltas at day granularity; the
    day-bucketed running sum finishes on the driver over the
    distinct-day table."""
    import pandas as pd

    from ray.data.aggregate import Max

    ships = (
        ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                              columns=["l_orderkey", "l_shipdate"])
        .map_batches(
            lambda df: df.assign(
                sd=df["l_shipdate"].to_numpy()
                .astype("datetime64[us]").astype(np.int64) // _DAY_US)
            .groupby("l_orderkey", as_index=False)["sd"].max(),
            batch_format="pandas")
        .groupby("l_orderkey").aggregate(Max("sd", alias_name="sd"))
        .materialize()  # orders-sized
    )
    odays = (
        ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_orderkey", "o_orderdate"])
        .map_batches(
            lambda df: pd.DataFrame(
                {"o_orderkey": df["o_orderkey"].to_numpy(),
                 "od": df["o_orderdate"].to_numpy()
                 .astype("datetime64[us]").astype(np.int64) // _DAY_US}),
            batch_format="pandas")
        .to_pandas()  # orders-sized (driver finish; the join keys and
        # deltas are order-count bounded, << lineitem)
    )
    st = ships.to_pandas()
    m = odays.merge(st, left_on="o_orderkey", right_on="l_orderkey")
    a = m["od"].to_numpy().astype(np.int64)
    b = m["sd"].to_numpy().astype(np.int64) + 1
    days = np.concatenate([a, b])
    deltas = np.concatenate([np.ones(len(a), dtype=np.int64),
                             -np.ones(len(b), dtype=np.int64)])
    g = pd.DataFrame({"day": days, "d": deltas}).groupby(
        "day", as_index=False)["d"].sum().sort_values("day")
    conc = np.cumsum(g["d"].to_numpy().astype(np.int64))
    i = int(np.argmax(conc))
    out = pd.DataFrame(
        {"peak_open": np.array([int(conc[i])], dtype=np.int64),
         "day": np.array([int(g["day"].iloc[i])], dtype=np.int64)})
    return pa.Table.from_pandas(out, preserve_index=False)


BACKLOG_PEAK_SQL = (
    "WITH s AS (SELECT l_orderkey,"
    f" max(epoch_us(l_shipdate) // {86_400_000_000}) AS sd"
    " FROM lineitem GROUP BY l_orderkey),"
    " iv AS (SELECT epoch_us(o_orderdate)"
    f" // {86_400_000_000} AS od, sd FROM orders"
    "  JOIN s ON s.l_orderkey = o_orderkey),"
    " d AS (SELECT od AS day, 1 AS dd FROM iv"
    "  UNION ALL SELECT sd + 1, -1 FROM iv),"
    " g AS (SELECT day, sum(dd) AS dd FROM d GROUP BY day),"
    " r AS (SELECT day, sum(dd) OVER (ORDER BY day"
    "   ROWS UNBOUNDED PRECEDING) AS conc FROM g)"
    " SELECT CAST(conc AS BIGINT) AS peak_open,"
    " CAST(min(day) AS BIGINT) AS day"
    " FROM r WHERE conc = (SELECT max(conc) FROM r) GROUP BY conc"
)


def q_best_atom(sf_dir: str) -> "ray.data.Dataset":
    """Per-(doc, level) best Haar atom — the position k and signed value
    d of the LARGEST-|d| unnormalized detail coefficient at every scale
    (ties -> smallest k): the per-scale peak localizer, i.e. one
    matching-pursuit selection step per level of the dictionary the
    reference builds (wavelet_decomposition.py's atom ranking), kept
    integer-exact.  The argmax runs as a PACKED-int64 Max aggregate —
    (|d| << 21) | (inverted k << 1) | sign — so there are no per-(doc,
    level) micro-groups, just one (docs x levels)-keyed Max; |d| <
    2^36 and k < 2^20 keep the packing collision-free (asserted)."""
    details = q_haar_details(sf_dir)

    def pack(t: pa.Table) -> pa.Table:
        d = t["d"].to_numpy(zero_copy_only=False).astype(np.int64)
        k = t["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        absd = np.abs(d)
        assert absd.max(initial=0) < (1 << 36) and k.max(initial=0) < (1 << 20), \
            "best_atom packing out of range"
        sign = (d < 0).astype(np.int64)
        packed = (absd << 21) | (((1 << 20) - 1 - k) << 1) | sign
        return pa.table(
            {"doc_id": t["doc_id"],
             "level": t["level"].cast(pa.int64()),
             "packed": pa.array(packed)}
        )

    from ray.data.aggregate import Max

    agg = (
        details.map_batches(pack, batch_format="pyarrow")
        .groupby(["doc_id", "level"])
        .aggregate(Max("packed", alias_name="packed"))
    )

    def unpack(t: pa.Table) -> pa.Table:
        p = t["packed"].to_numpy(zero_copy_only=False).astype(np.int64)
        absd = p >> 21
        k = (1 << 20) - 1 - ((p >> 1) & ((1 << 20) - 1))
        d = np.where(p & 1, -absd, absd)
        return pa.table(
            {"doc_id": t["doc_id"], "level": t["level"],
             "k": pa.array(k), "d": pa.array(d)}
        )

    return agg.map_batches(unpack, batch_format="pyarrow")


BEST_ATOM_SQL = (
    HAAR_DETAILS_SQL.replace("SELECT f.doc_id,", "SELECT * FROM (SELECT f.doc_id,", 1)
    + ") QUALIFY row_number() OVER (PARTITION BY doc_id, level"
    "  ORDER BY abs(d) DESC, k) = 1"
)


def q_supplier_hhi(sf_dir: str) -> "ray.data.Dataset":
    """Supplier-concentration audit per part brand — the Herfindahl
    ingredients over shipped quantities: n_suppliers, total quantity Q
    and Σq_s² (HHI = Σq_s²/Q², left as exact integers; a brand whose
    mass sits on one supplier is a single-point-of-failure in the
    supply chain — or, in the data-pipeline reading, a 'brand' of
    content dominated by one feed).  The part->brand dimension
    broadcasts once (sorted-key searchsorted probe, revenue_by_nation's
    pattern); quantities pre-aggregate per (brand, supplier) inside
    each batch, so the only exchange is brands x suppliers."""
    import pandas as pd

    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    ).to_pandas().sort_values("p_partkey")
    pk = part["p_partkey"].to_numpy().astype(np.int64)
    # brand dictionary-encoded so the broadcast is two numpy arrays
    ub, binv = np.unique(part["p_brand"].to_numpy(), return_inverse=True)
    side_ref = ray.put((pk, binv.astype(np.int64), ub))

    def partial(df: "pd.DataFrame") -> "pd.DataFrame":
        keys, bidx, brands = ray.get(side_ref)
        lpk = df["l_partkey"].to_numpy().astype(np.int64)
        pos = np.searchsorted(keys, lpk)
        assert (pos < len(keys)).all() and (keys[pos] == lpk).all(), \
            "dangling l_partkey"
        g = pd.DataFrame(
            {"brand": brands[bidx[pos]],
             "supp": df["l_suppkey"].to_numpy().astype(np.int64),
             "q": df["l_quantity"].to_numpy().astype(np.int64)}
        ).groupby(["brand", "supp"], as_index=False)["q"].sum()
        return g

    from ray.data.aggregate import Sum

    cells = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_suppkey", "l_quantity"])
        .map_batches(partial, batch_format="pandas")
        .groupby(["brand", "supp"]).aggregate(Sum("q", alias_name="q"))
    )

    def fold(df: "pd.DataFrame") -> "pd.DataFrame":
        q = df["q"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {"brand": df["brand"].iloc[:1].to_numpy(),
             "n_suppliers": np.array([len(q)], dtype=np.int64),
             "total_qty": np.array([int(q.sum())], dtype=np.int64),
             "sum_q_sq": np.array([int((q * q).sum())], dtype=np.int64)})

    return cells.groupby("brand").map_groups(fold, batch_format="pandas")


SUPPLIER_HHI_SQL = (
    "WITH c AS (SELECT p.p_brand AS brand, l.l_suppkey AS supp,"
    " CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q"
    " FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey"
    " GROUP BY brand, supp)"
    " SELECT brand, CAST(count(*) AS BIGINT) AS n_suppliers,"
    " CAST(sum(q) AS BIGINT) AS total_qty,"
    " CAST(sum(q * q) AS BIGINT) AS sum_q_sq"
    " FROM c GROUP BY brand"
)


def q_user_lifespan_hist(sf_dir: str) -> "ray.data.Dataset":
    """User-lifespan histogram — how many users have an active span of
    exactly k days (last active day − first active day): the
    time-to-churn distribution behind ``churn_split``'s one-row
    verdict (a mass at span 0 is drive-by traffic; the tail is the
    durable cohort).  Distinct-(user, day) pass -> users-sized min/max
    groupby -> span histogram; all counts exact."""
    import pandas as pd

    from ray.data.aggregate import Max, Min, Sum

    spans = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet",
                              columns=["ts", "user_id"])
        .map_batches(_user_day_part, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Min("day", alias_name="mnd"),
                   Max("day", alias_name="mxd"))
    )

    def hist_part(t: pa.Table) -> pa.Table:
        span = (t["mxd"].to_numpy(zero_copy_only=False).astype(np.int64)
                - t["mnd"].to_numpy(zero_copy_only=False).astype(np.int64))
        uk, cnt = np.unique(span, return_counts=True)
        return pa.table({"span_days": pa.array(uk),
                         "n_users": pa.array(cnt.astype(np.int64))})

    agg = (
        spans.map_batches(hist_part, batch_format="pyarrow")
        .groupby("span_days").aggregate(Sum("n_users", alias_name="n_users"))
    )
    return agg.map_batches(
        lambda t: t.rename_columns(["span_days", "n_users"]),
        batch_format="pyarrow",
    )


USER_LIFESPAN_HIST_SQL = (
    "WITH p AS (SELECT DISTINCT"
    f" epoch_us(ts) // {_DAY_US} AS day, user_id FROM events),"
    " u AS (SELECT user_id, max(day) - min(day) AS span FROM p"
    "  GROUP BY user_id)"
    " SELECT CAST(span AS BIGINT) AS span_days,"
    " CAST(count(*) AS BIGINT) AS n_users FROM u GROUP BY span"
)


Q6_YEAR = 1996
Q6_DISC_LO, Q6_DISC_HI = 5, 7   # discount band, integer percent
Q6_QTY_LT = 24


def q_q6_revenue(sf_dir: str) -> "pa.Table":
    """TPC-H Q6 analog — forecast-revenue-change: Σ price·discount over
    lineitems shipped in Q6_YEAR with discount in [5%, 7%] and quantity
    < 24.  The minimal showcase of PRUNE-AT-THE-READ: only four columns
    leave storage and the ship-year predicate is pushed into the parquet
    scan (row-group pruning), so the streaming side sees a fraction of
    the fact table and the whole query is one filter-aggregate with NO
    shuffle at all.  Revenue carried as cents x integer-percent so the
    distributed sum is order-independent and hash-exact."""
    import pandas as pd
    import pyarrow.compute as _pc

    lo = np.datetime64(f"{Q6_YEAR}-01-01", "us")
    hi = np.datetime64(f"{Q6_YEAR + 1}-01-01", "us")
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_discount", "l_quantity",
                 "l_extendedprice"],
        filter=((_pc.field("l_shipdate") >= lo)
                & (_pc.field("l_shipdate") < hi)),
    )

    def partial(t: pa.Table) -> pa.Table:
        disc = np.rint(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        cents = np.rint(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        keep = ((disc >= Q6_DISC_LO) & (disc <= Q6_DISC_HI)
                & (qty < Q6_QTY_LT))
        return pa.table(
            {"n": pa.array([int(keep.sum())]),
             "rev": pa.array([int((cents[keep] * disc[keep]).sum())])}
        )

    tot = ds.map_batches(partial, batch_format="pyarrow").sum(["n", "rev"])
    out = pd.DataFrame(
        {"n_items": np.array([int(tot["sum(n)"])], dtype=np.int64),
         "revenue_cent_pct": np.array([int(tot["sum(rev)"])],
                                      dtype=np.int64)})
    return pa.Table.from_pandas(out, preserve_index=False)


Q6_REVENUE_SQL = (
    "SELECT CAST(count(*) AS BIGINT) AS n_items,"
    " CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)"
    "  * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)"
    "  AS revenue_cent_pct"
    " FROM lineitem"
    f" WHERE l_shipdate >= '{Q6_YEAR}-01-01'"
    f"  AND l_shipdate < '{Q6_YEAR + 1}-01-01'"
    f"  AND CAST(round(l_discount * 100) AS BIGINT)"
    f"   BETWEEN {Q6_DISC_LO} AND {Q6_DISC_HI}"
    f"  AND l_quantity < {Q6_QTY_LT}"
)


def q_balance_vs_volume(sf_dir: str) -> "pa.Table":
    """Wealth-vs-activity association — customers bucketed by account-
    balance quintile (cents) x order-count quintile, 25-cell matrix:
    does the high-balance segment actually order more?  Same explicit
    integer quintile ranks as ``rfm_segments`` (ceil(k·n/5) over the
    sorted stat, bucket = 1 + #breakpoints strictly below — no float
    quantiles), but across TWO tables: per-customer order counts from a
    customers-sized groupby, balances broadcast from the dimension
    table; customers with zero orders count with volume 0."""
    import pandas as pd

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"]
    ).to_pandas()  # dimension-sized
    cust["bal"] = np.rint(
        cust["c_acctbal"].to_numpy() * 100).astype(np.int64)

    def partial(df: "pd.DataFrame") -> "pd.DataFrame":
        g = df.groupby("o_custkey", as_index=False).size()
        g.rename(columns={"size": "f"}, inplace=True)
        g["f"] = g["f"].astype(np.int64)
        return g

    from ray.data.aggregate import Sum

    counts = (
        ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_custkey"])
        .map_batches(partial, batch_format="pandas")
        .groupby("o_custkey").aggregate(Sum("f", alias_name="f"))
        .to_pandas()  # customers-with-orders-sized
    )
    m = cust.merge(counts, left_on="c_custkey", right_on="o_custkey",
                   how="left")
    f = m["f"].fillna(0).to_numpy().astype(np.int64)
    bal = m["bal"].to_numpy().astype(np.int64)

    def quint(v: np.ndarray) -> np.ndarray:
        sv = np.sort(v)
        n = len(sv)
        ranks = (np.arange(1, 5, dtype=np.int64) * n + 4) // 5
        brk = sv[ranks - 1]
        return 1 + np.searchsorted(brk, v, side="left").astype(np.int64)

    bb, fb = quint(bal), quint(f)
    g = pd.DataFrame({"bal_b": bb, "vol_b": fb}).groupby(
        ["bal_b", "vol_b"], as_index=False).size()
    g.rename(columns={"size": "n"}, inplace=True)
    return pa.Table.from_pandas(
        g.astype({"bal_b": np.int64, "vol_b": np.int64, "n": np.int64}),
        preserve_index=False,
    )


BALANCE_VS_VOLUME_SQL = (
    "WITH a AS (SELECT c_custkey,"
    " CAST(round(c_acctbal * 100) AS BIGINT) AS bal,"
    " (SELECT CAST(count(*) AS BIGINT) FROM orders o"
    "   WHERE o.o_custkey = c.c_custkey) AS f"
    " FROM customer c),"
    " cnt AS (SELECT count(*) AS n FROM a),"
    " ks AS (SELECT CAST(i AS BIGINT) AS k FROM range(1, 5) t(i)),"
    " bv AS (SELECT bal AS v, row_number() OVER (ORDER BY bal) AS rn"
    "  FROM a),"
    " fv AS (SELECT f AS v, row_number() OVER (ORDER BY f) AS rn FROM a),"
    " bb AS (SELECT v FROM ks CROSS JOIN cnt"
    "   JOIN bv ON bv.rn = (ks.k * cnt.n + 4) // 5),"
    " fb AS (SELECT v FROM ks CROSS JOIN cnt"
    "   JOIN fv ON fv.rn = (ks.k * cnt.n + 4) // 5)"
    " SELECT CAST(1 + (SELECT count(*) FROM bb WHERE bb.v < a.bal)"
    "  AS BIGINT) AS bal_b,"
    " CAST(1 + (SELECT count(*) FROM fb WHERE fb.v < a.f)"
    "  AS BIGINT) AS vol_b,"
    " CAST(count(*) AS BIGINT) AS n"
    " FROM a GROUP BY bal_b, vol_b"
)


def q_bits_plan(sf_dir: str) -> "pa.Table":
    """Bit-width planner per source — max token, max |first difference|,
    the bits needed to store raw values vs deltas (bits(x) = smallest k
    with x < 2^k, computed by integer comparison on BOTH sides — no
    float log2 anywhere) and the resulting saving_ppm: the one-pass
    sizing estimate that decides whether delta-encoding is worth a
    source's re-encode before the full Gorilla pass commits.  One
    streaming max-fold (per-batch partials, sources-sized exchange)."""
    import pandas as pd

    ds = _seq_ds(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        e = pa.array([], type=pa.int64())
        if len(v) == 0:
            return pa.table({"source": pa.array([], type=pa.string()),
                             "mx": e, "mxd": e})
        n = np.diff(off)
        src = np.asarray(t["source"].to_pylist())
        usrc, sinv = np.unique(src, return_inverse=True)
        tok_src = np.repeat(sinv, n)
        mx = np.zeros(len(usrc), dtype=np.int64)
        np.maximum.at(mx, tok_src, v)
        d = np.abs(v[1:] - v[:-1])
        seg = np.repeat(np.arange(len(n), dtype=np.int64), n)
        dmask = seg[1:] == seg[:-1]
        mxd = np.zeros(len(usrc), dtype=np.int64)
        if dmask.any():
            np.maximum.at(mxd, tok_src[1:][dmask], d[dmask])
        return pa.table({"source": pa.array(usrc), "mx": pa.array(mx),
                         "mxd": pa.array(mxd)})

    from ray.data.aggregate import Max

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=256)
        .groupby("source")
        .aggregate(Max("mx", alias_name="mx"), Max("mxd", alias_name="mxd"))
        .to_pandas()  # sources-sized
    )

    def bits(x: int) -> int:
        k = 0
        while x >= (1 << k):
            k += 1
        return max(k, 1)  # storing value 0 still costs one bit

    agg["raw_bits"] = [bits(int(x)) for x in agg["mx"]]
    agg["delta_bits"] = [bits(int(x)) + 1 for x in agg["mxd"]]  # sign bit
    rb = agg["raw_bits"].to_numpy().astype(np.int64)
    db = agg["delta_bits"].to_numpy().astype(np.int64)
    agg["saving_ppm"] = np.maximum(rb - db, 0) * 1_000_000 // rb
    out = agg.rename(columns={"mx": "max_tok", "mxd": "max_absdelta"})
    return pa.Table.from_pandas(
        out.astype({c: np.int64 for c in out.columns if c != "source"}),
        preserve_index=False,
    )


def _bits_plan_sql() -> str:
    # bits(x) = min k in 1..21 with x < 2^k — pure integer comparisons
    pows = ", ".join(f"({k}, {1 << k})" for k in range(1, 22))
    return (
        f"{_FLAT_CTE},"
        " l AS (SELECT doc_id, source, tok, abs(tok - lag(tok) OVER"
        "  (PARTITION BY doc_id ORDER BY pos)) AS d FROM flat),"
        " m AS (SELECT source, max(tok) AS max_tok,"
        "  max(COALESCE(d, 0)) AS max_absdelta FROM l GROUP BY source),"
        f" p(k, v) AS (VALUES {pows}),"
        " b AS (SELECT source, max_tok, max_absdelta,"
        "  (SELECT min(k) FROM p WHERE max_tok < v) AS raw_bits,"
        "  (SELECT min(k) FROM p WHERE max_absdelta < v) + 1 AS delta_bits"
        "  FROM m)"
        " SELECT source, CAST(max_tok AS BIGINT) AS max_tok,"
        " CAST(max_absdelta AS BIGINT) AS max_absdelta,"
        " CAST(raw_bits AS BIGINT) AS raw_bits,"
        " CAST(delta_bits AS BIGINT) AS delta_bits,"
        " CAST(GREATEST(raw_bits - delta_bits, 0) * 1000000 // raw_bits"
        "  AS BIGINT) AS saving_ppm FROM b"
    )


BITS_PLAN_SQL = _bits_plan_sql()


def q_session_count_hist(sf_dir: str) -> "ray.data.Dataset":
    """Sessions-per-user histogram — how many users had exactly k
    sessions: the engagement-depth distribution (a spike at k=1 is a
    bounce problem; a long tail is the power-user cohort
    ``user_burstiness`` ranks individually).  Composes the sessionizer
    with two count-rollups; every exchange is user- then
    histogram-sized."""
    import pandas as pd

    sess = q_sessionize(sf_dir)

    def per_user(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        uk, cnt = np.unique(u, return_counts=True)
        return pa.table({"user_id": pa.array(uk),
                         "ns": pa.array(cnt.astype(np.int64))})

    from ray.data.aggregate import Sum

    hist = (
        sess.map_batches(per_user, batch_format="pyarrow")
        .groupby("user_id").aggregate(Sum("ns", alias_name="ns"))
        .map_batches(
            lambda t: pa.table(
                {"n_sessions": t["ns"],
                 "one": pa.array(np.ones(len(t), dtype=np.int64))}),
            batch_format="pyarrow")
        .groupby("n_sessions").aggregate(Sum("one", alias_name="n_users"))
    )
    return hist.map_batches(
        lambda t: t.rename_columns(["n_sessions", "n_users"]),
        batch_format="pyarrow",
    )


SESSION_COUNT_HIST_SQL = (
    "WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,"
    " CASE WHEN lag(epoch_us(ts)) OVER w IS NULL"
    f"  OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US}"
    "  THEN 1 ELSE 0 END AS brk"
    " FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),"
    " u AS (SELECT user_id, CAST(sum(brk) AS BIGINT) AS ns FROM e"
    "  GROUP BY user_id)"
    " SELECT ns AS n_sessions, CAST(count(*) AS BIGINT) AS n_users"
    " FROM u GROUP BY ns"
)


QUANT_LEVELS = 16  # 4-bit codec comparison


def q_quantize_compare(sf_dir: str) -> "pa.Table":
    """4-bit codec bake-off — total L1 reconstruction error of a UNIFORM
    16-level quantizer (recon = bin floor, width max_tok//16 + 1)
    versus an EQUALIZED one whose bin edges sit at the exact 1/16
    quantile ranks (ceil(k·n/16), floor representative = largest edge
    <= x): the measured answer to "is a trained codebook worth it for
    this corpus" — on skewed data the equalized bins concentrate where
    the mass is and should win.  Everything derives from the global
    distinct-token histogram (one groupby), so the comparison costs one
    driver fold; both reconstructions are floor-representatives, so
    err = Σ cnt·(tok − recon) with no abs needed."""
    import pandas as pd

    ds = _seq_ds(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        vals, _ = list_to_numpy(t["tokens"])
        uk, cnt = np.unique(vals.astype(np.int64), return_counts=True)
        return pa.table({"tok": pa.array(uk),
                         "cnt": pa.array(cnt.astype(np.int64))})

    from ray.data.aggregate import Sum

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("tok").aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    hist = hist.sort_values("tok", kind="mergesort")
    toks = hist["tok"].to_numpy().astype(np.int64)
    c = hist["cnt"].to_numpy().astype(np.int64)
    total = int(c.sum())
    # uniform: recon = floor(tok / w) * w
    w = int(toks.max()) // QUANT_LEVELS + 1
    err_u = int((c * (toks % w)).sum())
    # equalized: edges = min + the 15 exact 1/16-quantile values
    cum = np.cumsum(c)
    ranks = (np.arange(1, QUANT_LEVELS, dtype=np.int64) * total
             + QUANT_LEVELS - 1) // QUANT_LEVELS
    edges = np.concatenate(
        ([toks[0]], toks[np.searchsorted(cum, ranks)]))
    edges = np.sort(edges)
    lev = np.searchsorted(edges, toks, side="right") - 1
    recon = edges[lev]
    err_e = int((c * (toks - recon)).sum())
    out = pd.DataFrame(
        {"n_tokens": np.array([total], dtype=np.int64),
         "levels": np.array([QUANT_LEVELS], dtype=np.int64),
         "err_uniform": np.array([err_u], dtype=np.int64),
         "err_equalized": np.array([err_e], dtype=np.int64)})
    return pa.Table.from_pandas(out, preserve_index=False)


QUANTIZE_COMPARE_SQL = (
    f"{_FLAT_CTE},"
    " h AS (SELECT tok, count(*) AS cnt FROM flat GROUP BY tok),"
    " tot AS (SELECT sum(cnt) AS n, max(tok) AS mx FROM h),"
    " cu AS (SELECT tok, cnt, sum(cnt) OVER (ORDER BY tok) AS cum FROM h),"
    f" ks AS (SELECT CAST(i AS BIGINT) AS k FROM range(1, {QUANT_LEVELS})"
    "  t(i)),"
    " ed AS (SELECT min(tok) AS e FROM h"
    "  UNION ALL"
    "  SELECT (SELECT min(tok) FROM cu"
    f"   WHERE cum >= (ks.k * tot.n + {QUANT_LEVELS - 1}) // {QUANT_LEVELS})"
    "   FROM ks, tot)"
    " SELECT CAST(tot.n AS BIGINT) AS n_tokens,"
    f" CAST({QUANT_LEVELS} AS BIGINT) AS levels,"
    " CAST((SELECT sum(cnt * (tok % (tot.mx // "
    f"{QUANT_LEVELS} + 1))) FROM h) AS BIGINT) AS err_uniform,"
    " CAST((SELECT sum(cnt * (tok - (SELECT max(e) FROM ed"
    "   WHERE e <= h.tok))) FROM h) AS BIGINT) AS err_equalized"
    " FROM tot"
)


def q_vol_cluster(sf_dir: str) -> "ray.data.Dataset":
    """Volatility-clustering sufficient statistics — per doc, the exact
    integer moments of consecutive ABSOLUTE first-difference pairs
    (d_t, d_{t+1}): n_pairs, Σx, Σy, Σxy, Σx², Σy².  The lag-1 Pearson
    numerator n·Σxy − Σx·Σy > 0 is the ARCH-effect tripwire (big moves
    follow big moves), computed by the consumer from these components so
    both engines stay division-free and bit-exact.  |d| < 2^20 keeps
    every sum inside int64 for n < 2^23.  Fully vectorized: one global
    diff, boundary pairs masked, zero-padded reduceats — docs with
    fewer than 3 tokens emit nothing (no d-pair exists)."""
    ds = _seq_ds(sf_dir)

    def stats(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        D = len(off) - 1
        e = pa.array([], type=pa.int64())
        empty = pa.table(
            {"doc_id": pa.array([], type=pa.string()), "n_pairs": e,
             "sx": e, "sy": e, "sxy": e, "sxx": e, "syy": e}
        )
        if D == 0 or len(v) < 3:
            return empty
        n = np.diff(off)
        seg = np.repeat(np.arange(D, dtype=np.int64), n)
        N = len(v)
        dall = np.abs(v[1:] - v[:-1])
        vd = seg[1:] == seg[:-1]
        # pair-of-pairs j: needs d_j and d_{j+1} valid (=> same doc)
        ok = vd[:-1] & vd[1:]
        x = np.where(ok, dall[:-1], 0)
        y = np.where(ok, dall[1:], 0)

        def red(a: np.ndarray) -> np.ndarray:
            return np.add.reduceat(
                np.concatenate((a, np.zeros(N - len(a), dtype=np.int64))),
                off[:-1])

        cnt = red(ok.astype(np.int64))
        kept = cnt > 0
        if not kept.any():
            return empty
        ka = pa.array(kept)
        return pa.table(
            {"doc_id": t["doc_id"].filter(ka),
             "n_pairs": pa.array(cnt[kept]),
             "sx": pa.array(red(x)[kept]), "sy": pa.array(red(y)[kept]),
             "sxy": pa.array(red(x * y)[kept]),
             "sxx": pa.array(red(x * x)[kept]),
             "syy": pa.array(red(y * y)[kept])}
        )

    return ds.map_batches(stats, batch_format="pyarrow", batch_size=256)


VOL_CLUSTER_SQL = (
    f"{_FLAT_CTE},"
    " l AS (SELECT doc_id, pos, abs(tok - lag(tok) OVER"
    "  (PARTITION BY doc_id ORDER BY pos)) AS d FROM flat),"
    " p AS (SELECT doc_id, d AS x, lead(d) OVER"
    "  (PARTITION BY doc_id ORDER BY pos) AS y FROM l"
    "  WHERE d IS NOT NULL)"
    " SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pairs,"
    " CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,"
    " CAST(sum(x * y) AS BIGINT) AS sxy,"
    " CAST(sum(x * x) AS BIGINT) AS sxx,"
    " CAST(sum(y * y) AS BIGINT) AS syy"
    " FROM p WHERE y IS NOT NULL GROUP BY doc_id"
)


KANON_K = 5          # small-group threshold
KANON_CHARS_BUCKET = 100


def q_kanon_audit(sf_dir: str) -> "pa.Table":
    """k-anonymity audit over the quasi-identifier (lang, source,
    n_chars bucket) — group count, singleton count, groups under
    KANON_K and the documents trapped in them: the re-identification
    exposure screen a release/sharing pass runs before publishing a
    corpus slice (a doc alone in its quasi-identifier cell is
    linkable even with text removed).  One partial count per batch, a
    quasi-identifier-alphabet-sized groupby, a one-row driver fold."""
    import pandas as pd

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["lang", "source", "n_chars"],
    )

    def partial(df: "pd.DataFrame") -> "pd.DataFrame":
        g = pd.DataFrame(
            {"lang": df["lang"].to_numpy(),
             "source": df["source"].to_numpy(),
             "cb": (df["n_chars"].to_numpy().astype(np.int64)
                    // KANON_CHARS_BUCKET)}
        ).groupby(["lang", "source", "cb"], as_index=False).size()
        g.rename(columns={"size": "cnt"}, inplace=True)
        g["cnt"] = g["cnt"].astype(np.int64)
        return g

    from ray.data.aggregate import Sum

    groups = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["lang", "source", "cb"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()  # quasi-identifier-alphabet-sized
    )
    c = groups["cnt"].to_numpy().astype(np.int64)
    out = pd.DataFrame(
        {"n_groups": np.array([len(c)], dtype=np.int64),
         "n_singletons": np.array([int((c == 1).sum())], dtype=np.int64),
         "n_small_groups": np.array([int((c < KANON_K).sum())],
                                    dtype=np.int64),
         "n_docs_small": np.array([int(c[c < KANON_K].sum())],
                                  dtype=np.int64)})
    return pa.Table.from_pandas(out, preserve_index=False)


KANON_AUDIT_SQL = (
    "WITH g AS (SELECT lang, source,"
    f" n_chars // {KANON_CHARS_BUCKET} AS cb, count(*) AS cnt"
    " FROM documents GROUP BY lang, source, cb)"
    " SELECT CAST(count(*) AS BIGINT) AS n_groups,"
    " CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)"
    "  AS n_singletons,"
    f" CAST(sum(CASE WHEN cnt < {KANON_K} THEN 1 ELSE 0 END) AS BIGINT)"
    "  AS n_small_groups,"
    f" CAST(sum(CASE WHEN cnt < {KANON_K} THEN cnt ELSE 0 END) AS BIGINT)"
    "  AS n_docs_small"
    " FROM g"
)


TIER_PICK_BUDGET_PPM = 800_000_000  # loss budget: err/point <= 800 (x1e-6)


def q_tier_pick(sf_dir: str) -> "pa.Table":
    """Retention-policy decision — per source, the COARSEST tier of the
    TIER_ERR_TIERS ladder whose mean per-point L1 reconstruction error
    stays inside the loss budget (err * 10^6 <= BUDGET_PPM * n_points,
    compared in arbitrary-precision ints; 0 = keep raw), plus that
    tier's error: the operator that turns ``tier_error``'s per-doc audit
    curve into the actual keep-this-resolution verdict a storage-tiering
    job executes.  One streaming pass folds (source, tier) error
    partials inside each batch (same windowed-deviation kernel as
    tier_error), the only exchange is sources x tiers, and the pick is
    a driver-side fold over that tiny table."""
    import pandas as pd

    ds = _seq_ds(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        n_docs = len(off) - 1
        e = pa.array([], type=pa.int64())
        if n_docs == 0 or len(v) == 0:
            return pa.table(
                {"source": pa.array([], type=pa.string()),
                 "tier": e, "err": e, "npts": e}
            )
        src = np.asarray(t["source"].to_pylist())
        usrc, sinv = np.unique(src, return_inverse=True)
        n = np.diff(off)
        tok_src = np.repeat(sinv, n)
        npts = np.zeros(len(usrc), dtype=np.int64)
        np.add.at(npts, sinv, n)
        rows_s, rows_t, rows_e, rows_n = [], [], [], []
        for tier in TIER_ERR_TIERS:
            w = 1 << tier
            starts, _, counts = tumble_starts(off, w)
            s = np.add.reduceat(v, starts)
            dev = np.abs(np.repeat(counts, counts) * v
                         - np.repeat(s, counts))
            err = np.zeros(len(usrc), dtype=np.int64)
            np.add.at(err, tok_src, dev)
            rows_s.append(usrc)
            rows_t.append(np.full(len(usrc), tier, dtype=np.int64))
            rows_e.append(err)
            rows_n.append(npts)
        return pa.table(
            {"source": pa.array(np.concatenate(rows_s)),
             "tier": pa.array(np.concatenate(rows_t)),
             "err": pa.array(np.concatenate(rows_e)),
             "npts": pa.array(np.concatenate(rows_n))}
        )

    from ray.data.aggregate import Sum

    cells = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=256)
        .groupby(["source", "tier"])
        .aggregate(Sum("err", alias_name="err"),
                   Sum("npts", alias_name="npts"))
        .to_pandas()  # sources x tiers
    )
    out_rows = []
    for src, grp in cells.groupby("source"):
        npts = int(grp["npts"].iloc[0])
        picked, picked_err = 0, 0
        for _, r in grp.sort_values("tier").iterrows():
            if int(r["err"]) * 1_000_000 <= TIER_PICK_BUDGET_PPM * npts:
                picked, picked_err = int(r["tier"]), int(r["err"])
        out_rows.append((src, npts, picked, picked_err))
    out = pd.DataFrame(out_rows, columns=["source", "n_points",
                                          "picked_tier", "picked_err"])
    return pa.Table.from_pandas(
        out.astype({"n_points": np.int64, "picked_tier": np.int64,
                    "picked_err": np.int64}),
        preserve_index=False,
    )


def _tier_pick_sql() -> str:
    legs = []
    for tier in TIER_ERR_TIERS:
        w = 1 << tier
        legs.append(
            f"SELECT f.source, CAST({tier} AS BIGINT) AS tier,"
            " CAST(sum(abs(g.c * f.tok - g.s)) AS BIGINT) AS err,"
            " CAST(count(*) AS BIGINT) AS npts"
            " FROM flat f JOIN ("
            f"  SELECT doc_id, pos // {w} AS wi,"
            "   CAST(count(*) AS BIGINT) AS c, CAST(sum(tok) AS BIGINT) AS s"
            f"  FROM flat GROUP BY doc_id, wi) g"
            f" ON g.doc_id = f.doc_id AND g.wi = f.pos // {w}"
            " GROUP BY f.source"
        )
    t = " UNION ALL ".join(legs)
    return (
        f"{_FLAT_CTE}, t AS ({t}),"
        " q AS (SELECT source, max(npts) AS n_points,"
        "  COALESCE(max(CASE WHEN CAST(err AS HUGEINT) * 1000000"
        f"   <= CAST({TIER_PICK_BUDGET_PPM} AS HUGEINT) * npts"
        "   THEN tier END), 0) AS picked_tier"
        "  FROM t GROUP BY source)"
        " SELECT q.source, q.n_points, q.picked_tier,"
        " CAST(COALESCE(t.err, 0) AS BIGINT) AS picked_err"
        " FROM q LEFT JOIN t ON t.source = q.source"
        "  AND t.tier = q.picked_tier"
    )


TIER_PICK_SQL = _tier_pick_sql()


TRANS_WINDOW_US = 3_600_000_000  # view -> click attribution window (1 h)


def q_transition_latency(sf_dir: str) -> "pa.Table":
    """View->click latency envelope — for every 'view', the time to that
    user's FIRST 'click' strictly after it (within a 1 h attribution
    window), reported as n_pairs and the exact p50/p90/max in whole
    milliseconds (rank = ceil(q*n)): the responsiveness metric behind
    funnel-step SLOs, and the step-level complement to
    ``funnel_conversion``'s reached-or-not counts.  Per-user matching is
    ONE vectorized searchsorted inside each coarse hash partition (the
    composite (user << 43 | ts-offset) key keeps both streams jointly
    sorted — asserted in range); the latency histogram (distinct-ms-
    sized) is the only global exchange."""
    import pandas as pd

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )

    def fold(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df[df["event_type"].isin(["view", "click"])]
        if len(df) == 0:
            return pd.DataFrame({"lat_ms": np.empty(0, dtype=np.int64),
                                 "cnt": np.empty(0, dtype=np.int64)})
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        u = df["user_id"].to_numpy().astype(np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        tmin = int(ts.min())
        rel = ts - tmin
        assert u.max() < (1 << 20) and rel.max() < (1 << 43), \
            "transition_latency composite key out of range"
        key = (u << 43) | rel
        isv = (df["event_type"] == "view").to_numpy()
        isc = (df["event_type"] == "click").to_numpy()
        ck, cu, cts = key[isc], u[isc], ts[isc]
        if len(ck) == 0 or not isv.any():
            return pd.DataFrame({"lat_ms": np.empty(0, dtype=np.int64),
                                 "cnt": np.empty(0, dtype=np.int64)})
        pos = np.searchsorted(ck, key[isv], side="right")
        ok = pos < len(ck)
        pos = np.minimum(pos, max(len(ck) - 1, 0))
        lat = cts[pos] - ts[isv]
        ok &= (cu[pos] == u[isv]) & (lat > 0) & (lat <= TRANS_WINDOW_US)
        lat_ms = lat[ok] // 1000
        uk, cnt = np.unique(lat_ms, return_counts=True)
        return pd.DataFrame({"lat_ms": uk,
                             "cnt": cnt.astype(np.int64)})

    from ray.data.aggregate import Sum

    hist = (
        ds.map_batches(_add_user_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(fold, batch_format="pandas")
        .groupby("lat_ms").aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()  # distinct-ms-sized
    )
    hist = hist.sort_values("lat_ms", kind="mergesort")
    ms = hist["lat_ms"].to_numpy().astype(np.int64)
    total, pick = _hist_rank_pick(
        ms, hist["cnt"].to_numpy().astype(np.int64))

    out = pd.DataFrame(
        {"n_pairs": np.array([total], dtype=np.int64),
         "p50_ms": np.array([pick(1, 2)], dtype=np.int64),
         "p90_ms": np.array([pick(9, 10)], dtype=np.int64),
         "max_ms": np.array([int(ms[-1])], dtype=np.int64)})
    return pa.Table.from_pandas(out, preserve_index=False)


TRANSITION_LATENCY_SQL = (
    "WITH a AS (SELECT user_id, event_id, epoch_us(ts) AS ts FROM events"
    "  WHERE event_type = 'view'),"
    " b AS (SELECT user_id, epoch_us(ts) AS ts FROM events"
    "  WHERE event_type = 'click'),"
    " j AS (SELECT a.user_id, a.event_id, min(b.ts) - a.ts AS lat"
    "  FROM a JOIN b ON b.user_id = a.user_id AND b.ts > a.ts"
    f"   AND b.ts - a.ts <= {TRANS_WINDOW_US}"
    "  GROUP BY a.user_id, a.event_id, a.ts),"
    " l AS (SELECT lat // 1000 AS lat_ms FROM j)"
    " SELECT CAST(count(*) AS BIGINT) AS n_pairs,"
    " CAST(quantile_disc(lat_ms, 0.5) AS BIGINT) AS p50_ms,"
    " CAST(quantile_disc(lat_ms, 0.9) AS BIGINT) AS p90_ms,"
    " CAST(max(lat_ms) AS BIGINT) AS max_ms FROM l"
)


def q_peak_concurrency(sf_dir: str) -> "pa.Table":
    """Peak concurrent sessions — the sweep-line maximum of
    simultaneously-open gap-windows (+1 at each session's first event,
    -1 just after its last), with the EARLIEST microsecond achieving the
    peak: the capacity number a connection-pool / rate-limit budget is
    sized against.  The running sum is sequential, so it distributes
    exactly like ``late_events``'s watermark: (1) hour-bucketed delta
    sums -> (2) a bucket-count-sized driver table gives each bucket its
    exclusive prefix (the concurrency entering that hour) -> (3) every
    bucket folds independently (group deltas by identical ts BEFORE the
    cumsum, so +1/-1 at the same instant never order-skews the max).
    Exchanges: session deltas groupby-bucket, then a buckets-sized
    finish."""
    import pandas as pd

    sess = q_sessionize(sf_dir)

    def deltas(t: pa.Table) -> pa.Table:
        a = t["first_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["last_us"].to_numpy(zero_copy_only=False).astype(np.int64) + 1
        return pa.table(
            {"ts": pa.array(np.concatenate([a, b])),
             "d": pa.array(np.concatenate(
                 [np.ones(len(a), dtype=np.int64),
                  -np.ones(len(b), dtype=np.int64)]))}
        )

    dds = sess.map_batches(deltas, batch_format="pyarrow").materialize()

    def bucket_partial(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False)
        d = t["d"].to_numpy(zero_copy_only=False)
        ub, inv = np.unique(ts // HOUR_US, return_inverse=True)
        s = np.zeros(len(ub), dtype=np.int64)
        np.add.at(s, inv, d)
        return pa.table({"bucket": pa.array(ub), "ds": pa.array(s)})

    from ray.data.aggregate import Sum

    sums = (
        dds.map_batches(bucket_partial, batch_format="pyarrow")
        .groupby("bucket").aggregate(Sum("ds", alias_name="ds"))
        .take_all()  # bucket-count-sized
    )
    sums.sort(key=lambda r: r["bucket"])
    pref: dict[int, int] = {}
    run = 0
    for r in sums:
        pref[int(r["bucket"])] = run
        run += int(r["ds"])
    pref_ref = ray.put(pref)

    def add_bucket(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array(ts // HOUR_US, type=pa.int64()))

    def fold(df: "pd.DataFrame") -> "pd.DataFrame":
        p = ray.get(pref_ref)
        seed = p.get(int(df["bucket"].iloc[0]), 0)
        g = df.groupby("ts", as_index=False)["d"].sum() \
              .sort_values("ts", kind="mergesort")
        conc = seed + np.cumsum(g["d"].to_numpy().astype(np.int64))
        i = int(np.argmax(conc))  # first occurrence of the bucket max
        return pd.DataFrame(
            {"peak": np.array([int(conc[i])], dtype=np.int64),
             "ts_us": np.array([int(g["ts"].iloc[i])], dtype=np.int64)})

    per_bucket = (
        dds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()  # buckets-sized
    )
    best = per_bucket.sort_values(["peak", "ts_us"],
                                  ascending=[False, True],
                                  kind="mergesort").iloc[0]
    return pa.Table.from_pandas(
        pd.DataFrame({"peak": np.array([int(best["peak"])], dtype=np.int64),
                      "ts_us": np.array([int(best["ts_us"])],
                                        dtype=np.int64)}),
        preserve_index=False,
    )


PEAK_CONCURRENCY_SQL = (
    "WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,"
    " CASE WHEN lag(epoch_us(ts)) OVER w IS NULL"
    f"  OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US}"
    "  THEN 1 ELSE 0 END AS brk"
    " FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),"
    " s AS (SELECT user_id, ts_us, sum(brk) OVER (PARTITION BY user_id"
    "   ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM e),"
    " iv AS (SELECT min(ts_us) AS a, max(ts_us) + 1 AS b"
    "  FROM s GROUP BY user_id, sid),"
    " d AS (SELECT a AS ts, 1 AS dd FROM iv"
    "  UNION ALL SELECT b, -1 FROM iv),"
    " g AS (SELECT ts, sum(dd) AS dd FROM d GROUP BY ts),"
    " r AS (SELECT ts, sum(dd) OVER (ORDER BY ts"
    "   ROWS UNBOUNDED PRECEDING) AS conc FROM g)"
    " SELECT CAST(conc AS BIGINT) AS peak, CAST(min(ts) AS BIGINT) AS ts_us"
    " FROM r WHERE conc = (SELECT max(conc) FROM r) GROUP BY conc"
)


DEBOUNCE_US = 5_000_000  # repeat-suppression window (5 s)


def q_debounce_events(sf_dir: str) -> "ray.data.Dataset":
    """Debounce audit — per event type, how many events are BOUNCES:
    byte-identical repeats (same user, same type, same cent value) of
    the immediately previous event within DEBOUNCE_US.  The double-
    fire / retry-storm health check run before any per-event billing or
    training-label extraction; the kept/dropped split is exactly what a
    collapsing ingest filter would do.  Same coarse user-hash partition
    fold as ``sessionize`` (vectorized shift-compare inside each of the
    N_EVENT_PARTS groups — no per-user micro-groups), then a types-sized
    count groupby."""
    import pandas as pd

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )

    def fold(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        uid = df["user_id"].to_numpy().astype(np.int64)
        ts_us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        tok = np.rint(df["value"].to_numpy() * 100).astype(np.int64)
        ety = df["event_type"].to_numpy()
        n = len(df)
        bounce = np.zeros(n, dtype=bool)
        if n > 1:
            bounce[1:] = ((uid[1:] == uid[:-1])
                          & (ety[1:] == ety[:-1])
                          & (tok[1:] == tok[:-1])
                          & (ts_us[1:] - ts_us[:-1] <= DEBOUNCE_US))
        g = pd.DataFrame(
            {"event_type": ety, "b": bounce.astype(np.int64)}
        ).groupby("event_type", as_index=False).agg(
            pn=("b", "size"), pb=("b", "sum"))
        g["pn"] = g["pn"].astype(np.int64)
        return g

    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(_add_user_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(fold, batch_format="pandas")
        .groupby("event_type")
        .aggregate(Sum("pn", alias_name="n_events"),
                   Sum("pb", alias_name="n_bounce"))
    )
    return agg.map_batches(
        lambda t: t.rename_columns(["event_type", "n_events", "n_bounce"]),
        batch_format="pyarrow",
    )


DEBOUNCE_EVENTS_SQL = (
    "WITH e AS (SELECT event_type,"
    " CASE WHEN event_type = lag(event_type) OVER w"
    "  AND CAST(round(value * 100) AS BIGINT)"
    "   = lag(CAST(round(value * 100) AS BIGINT)) OVER w"
    f"  AND epoch_us(ts) - lag(epoch_us(ts)) OVER w <= {DEBOUNCE_US}"
    "  THEN 1 ELSE 0 END AS b"
    " FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))"
    " SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,"
    " CAST(sum(b) AS BIGINT) AS n_bounce FROM e GROUP BY event_type"
)


def q_punchcard(sf_dir: str) -> "ray.data.Dataset":
    """(day-of-week, hour-of-day) activity punchcard — event count and
    cent-value sum per cell of the 7x24 grid: the load-shape heatmap
    capacity planning and anomaly baselining start from.  Same pure
    epoch arithmetic as ``weekday_contrast`` ((epoch_day + 3) % 7,
    Monday = 0) so no date-function convention can drift.  Partials
    collapse each batch to <= 168 rows before the one tiny groupby."""
    import pandas as pd

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "value"]
    )

    def partial(df: "pd.DataFrame") -> "pd.DataFrame":
        ts_us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        g = pd.DataFrame(
            {"dow": ((ts_us // _DAY_US) + 3) % 7,
             "hod": (ts_us // HOUR_US) % 24,
             "tok": np.rint(df["value"].to_numpy() * 100).astype(np.int64)}
        ).groupby(["dow", "hod"], as_index=False).agg(
            pn=("tok", "size"), ps=("tok", "sum"))
        g["pn"] = g["pn"].astype(np.int64)
        return g

    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["dow", "hod"])
        .aggregate(Sum("pn", alias_name="n"),
                   Sum("ps", alias_name="tok_sum"))
    )
    return agg.map_batches(
        lambda t: t.rename_columns(["dow", "hod", "n", "tok_sum"]),
        batch_format="pyarrow",
    )


PUNCHCARD_SQL = (
    "WITH e AS (SELECT"
    f" ((epoch_us(ts) // {_DAY_US}) + 3) % 7 AS dow,"
    f" (epoch_us(ts) // {HOUR_US}) % 24 AS hod,"
    " CAST(round(value * 100) AS BIGINT) AS tok FROM events)"
    " SELECT CAST(dow AS BIGINT) AS dow, CAST(hod AS BIGINT) AS hod,"
    " CAST(count(*) AS BIGINT) AS n, CAST(sum(tok) AS BIGINT) AS tok_sum"
    " FROM e GROUP BY dow, hod"
)


MOVERS_TOPK = 20


def q_daily_movers(sf_dir: str) -> "pa.Table":
    """Day-over-day volume movers — for every (event_type, active day),
    delta = today's count minus yesterday's (0 if the type was silent
    yesterday); report the MOVERS_TOPK biggest absolute swings (ties ->
    |delta| desc, type, day).  The what-changed-overnight triage list an
    on-call dashboard leads with — ``trend_by_type`` fits a global
    slope, this pinpoints the individual jumps.  One (type x day)-sized
    partial groupby; the lag alignment runs on that small table on the
    driver."""
    import pandas as pd

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    )

    def partial(df: "pd.DataFrame") -> "pd.DataFrame":
        ts_us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        g = pd.DataFrame(
            {"event_type": df["event_type"].to_numpy(),
             "day": ts_us // _DAY_US}
        ).groupby(["event_type", "day"], as_index=False).size()
        g.rename(columns={"size": "n"}, inplace=True)
        g["n"] = g["n"].astype(np.int64)
        return g

    from ray.data.aggregate import Sum

    counts = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["event_type", "day"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # types x active-days, << events
    )
    prev = counts.rename(columns={"day": "pd_", "n": "prev_n"})
    prev["day"] = prev["pd_"] + 1
    m = counts.merge(prev[["event_type", "day", "prev_n"]],
                     on=["event_type", "day"], how="left")
    m["prev_n"] = m["prev_n"].fillna(0).astype(np.int64)
    m["delta"] = m["n"] - m["prev_n"]
    m["absd"] = m["delta"].abs()
    m = m.sort_values(["absd", "event_type", "day"],
                      ascending=[False, True, True],
                      kind="mergesort").head(MOVERS_TOPK)
    out = m[["event_type", "day", "n", "prev_n", "delta"]].reset_index(
        drop=True)
    return pa.Table.from_pandas(
        out.astype({"day": np.int64, "n": np.int64, "prev_n": np.int64,
                    "delta": np.int64}),
        preserve_index=False,
    )


DAILY_MOVERS_SQL = (
    "WITH c AS (SELECT event_type,"
    f" epoch_us(ts) // {_DAY_US} AS day, count(*) AS n FROM events"
    "  GROUP BY event_type, day)"
    " SELECT c.event_type, CAST(c.day AS BIGINT) AS day,"
    " CAST(c.n AS BIGINT) AS n,"
    " CAST(COALESCE(p.n, 0) AS BIGINT) AS prev_n,"
    " CAST(c.n - COALESCE(p.n, 0) AS BIGINT) AS delta"
    " FROM c LEFT JOIN c p ON p.event_type = c.event_type"
    "  AND p.day = c.day - 1"
    " ORDER BY abs(c.n - COALESCE(p.n, 0)) DESC, c.event_type, c.day"
    f" LIMIT {MOVERS_TOPK}"
)


DRIFT_SHIFT = 6  # value-drift bucket = cent-token >> 6 (width 64 cents)


def q_value_drift_halves(sf_dir: str) -> "pa.Table":
    """Temporal distribution drift — split the event stream at the
    midpoint day and compare the two halves' value-bucket histograms
    with the exact cross-normalized L1 statistic drift = Σ_b
    |c1(b)·n2 − c2(b)·n1| (the integer form of Σ|p1−p2| scaled by
    n1·n2; 0 = identical shape, 2·n1·n2 = disjoint support): the
    did-the-data-change tripwire run before retraining on a refreshed
    corpus, with no PSI logs or float division anywhere.  ONE streaming
    pass builds the (day, bucket) histogram — (day-range × buckets)-
    sized, not event-sized — and the split point falls out of the same
    table on the driver."""
    import pandas as pd

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "value"]
    )

    def partial(t: pa.Table) -> pa.Table:
        ts_us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        tok = np.rint(
            t["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        day = ts_us // _DAY_US
        bk = (tok + (1 << 39)) >> DRIFT_SHIFT  # shift keeps buckets >= 0
        key = day * (1 << 40) + bk
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {"day": pa.array(uk // (1 << 40)),
             "bk": pa.array(uk % (1 << 40)),
             "cnt": pa.array(cnt.astype(np.int64))}
        )

    from ray.data.aggregate import Sum

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["day", "bk"]).aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()  # day-range x buckets, << events
    )
    days = hist["day"].to_numpy().astype(np.int64)
    mid = (int(days.min()) + int(days.max()) + 1) // 2
    first = days < mid
    c = hist["cnt"].to_numpy().astype(np.int64)
    n1, n2 = int(c[first].sum()), int(c[~first].sum())
    h1 = hist[first].groupby("bk")["cnt"].sum()
    h2 = hist[~first].groupby("bk")["cnt"].sum()
    allb = sorted(set(h1.index) | set(h2.index))
    # Python ints for the cross products (see type_mix_drift): exact
    # past the int64 range the SQL twin's HUGEINT already handles
    drift = sum(abs(int(h1.get(b, 0)) * n2 - int(h2.get(b, 0)) * n1)
                for b in allb)
    assert drift < (1 << 63), "value_drift_halves int64 output guard"
    out = pd.DataFrame(
        {"mid_day": np.array([mid], dtype=np.int64),
         "n1": np.array([n1], dtype=np.int64),
         "n2": np.array([n2], dtype=np.int64),
         "drift": np.array([drift], dtype=np.int64)})
    return pa.Table.from_pandas(out, preserve_index=False)


VALUE_DRIFT_HALVES_SQL = (
    "WITH e AS (SELECT"
    f" epoch_us(ts) // {_DAY_US} AS day,"
    " (CAST(round(value * 100) AS BIGINT) + (1::BIGINT << 39))"
    f" // {1 << DRIFT_SHIFT} AS bk FROM events),"
    " mm AS (SELECT (min(day) + max(day) + 1) // 2 AS mid FROM e),"
    " h AS (SELECT bk,"
    "  sum(CASE WHEN day < mid THEN 1 ELSE 0 END) AS c1,"
    "  sum(CASE WHEN day >= mid THEN 1 ELSE 0 END) AS c2"
    "  FROM e, mm GROUP BY bk),"
    " n AS (SELECT sum(c1) AS n1, sum(c2) AS n2 FROM h)"
    " SELECT CAST(mid AS BIGINT) AS mid_day, CAST(n1 AS BIGINT) AS n1,"
    " CAST(n2 AS BIGINT) AS n2,"
    " CAST((SELECT sum(abs(CAST(c1 AS HUGEINT) * n.n2"
    "   - CAST(c2 AS HUGEINT) * n.n1)) FROM h) AS BIGINT) AS drift"
    " FROM mm, n"
)


def q_churn_split(sf_dir: str) -> "pa.Table":
    """User churn across the midpoint split — of the users active in the
    first half, who came back?  Reports n_first / n_second actives,
    retained (both halves), churned (first only) and new_users (second
    only): the cohort-free churn headline (``retention_cohorts`` gives
    the per-week curve; this is the one-row answer).  Presence per half
    needs only each user's min and max active day (any day >= mid iff
    max >= mid), so the whole query is one distinct-(user, day) pass, a
    users-sized min/max groupby and a counting fold — no per-half
    distinct re-count."""
    import pandas as pd

    from ray.data.aggregate import Max, Min

    spans = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet",
                              columns=["ts", "user_id"])
        .map_batches(_user_day_part, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Min("day", alias_name="mnd"),
                   Max("day", alias_name="mxd"))
        .materialize()  # users-sized
    )
    mm = spans.aggregate(Min("mnd"), Max("mxd"))
    mid = (int(mm["min(mnd)"]) + int(mm["max(mxd)"]) + 1) // 2

    def counts(t: pa.Table) -> pa.Table:
        mn = t["mnd"].to_numpy(zero_copy_only=False).astype(np.int64)
        mx = t["mxd"].to_numpy(zero_copy_only=False).astype(np.int64)
        f, s = mn < mid, mx >= mid
        return pa.table(
            {"n_first": pa.array([int(f.sum())]),
             "n_second": pa.array([int(s.sum())]),
             "retained": pa.array([int((f & s).sum())]),
             "churned": pa.array([int((f & ~s).sum())]),
             "new_users": pa.array([int((~f).sum())])}
        )

    tot = (
        spans.map_batches(counts, batch_format="pyarrow")
        .sum(["n_first", "n_second", "retained", "churned", "new_users"])
    )
    out = pd.DataFrame(
        {"mid_day": np.array([mid], dtype=np.int64),
         **{k: np.array([int(tot[f"sum({k})"])], dtype=np.int64)
            for k in ("n_first", "n_second", "retained", "churned",
                      "new_users")}})
    return pa.Table.from_pandas(out, preserve_index=False)


CHURN_SPLIT_SQL = (
    "WITH p AS (SELECT DISTINCT"
    f" epoch_us(ts) // {_DAY_US} AS day, user_id FROM events),"
    " mm AS (SELECT (min(day) + max(day) + 1) // 2 AS mid FROM p),"
    " u AS (SELECT user_id, min(day) AS mnd, max(day) AS mxd FROM p"
    "  GROUP BY user_id)"
    " SELECT CAST(mid AS BIGINT) AS mid_day,"
    " CAST(sum(CASE WHEN mnd < mid THEN 1 ELSE 0 END) AS BIGINT)"
    "  AS n_first,"
    " CAST(sum(CASE WHEN mxd >= mid THEN 1 ELSE 0 END) AS BIGINT)"
    "  AS n_second,"
    " CAST(sum(CASE WHEN mnd < mid AND mxd >= mid THEN 1 ELSE 0 END)"
    "  AS BIGINT) AS retained,"
    " CAST(sum(CASE WHEN mnd < mid AND mxd < mid THEN 1 ELSE 0 END)"
    "  AS BIGINT) AS churned,"
    " CAST(sum(CASE WHEN mnd >= mid THEN 1 ELSE 0 END) AS BIGINT)"
    "  AS new_users"
    " FROM u, mm GROUP BY mid"
)


MAU_WINDOW = 30  # trailing window (days) for the active-user denominator


def q_dau_mau(sf_dir: str) -> "pa.Table":
    """DAU/MAU stickiness per active day — daily actives, trailing-30-day
    actives, and stickiness_ppm = dau * 10^6 // mau: the canonical
    engagement ratio, and the hard part — a WINDOWED DISTINCT — done
    without re-counting each user 30x: per user, the days they're
    "MAU-active" form a union of [day, day+29] intervals, so one
    partition-local interval-merge emits +1/-1 boundary deltas and a
    tiny prefix sum over distinct delta-days yields every day's exact
    MAU.  Exchanges: one distinct-(day,user) groupby (the dau table
    every analytics store keeps anyway), one coarse hash-partition fold
    (N_EVENT_PARTS groups, vectorized inside — no per-user
    micro-groups), one delta-days-sized groupby.  The 30x-fanout join
    the SQL twin runs never happens here."""
    import pandas as pd

    pairs = (
        _user_day_pairs(sf_dir)
        .materialize()  # the distinct dau table, reused by both sides
    )

    dau = (
        pairs.groupby("day").count().to_pandas()  # active-days-sized
    )
    dau.columns = ["day", "dau"]

    def interval_deltas(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(["user_id", "day"], kind="mergesort")
        u = df["user_id"].to_numpy().astype(np.int64)
        d = df["day"].to_numpy().astype(np.int64)
        n = len(d)
        start = np.ones(n, dtype=bool)
        if n > 1:
            # a new merged interval starts on a user change or a gap the
            # trailing window cannot bridge
            start[1:] = (u[1:] != u[:-1]) | (d[1:] - d[:-1] >= MAU_WINDOW)
        si = np.flatnonzero(start)
        ends = np.append(si[1:], n) - 1
        a = d[si]                      # interval start day
        b = d[ends] + MAU_WINDOW       # one past the last covered day
        out = pd.DataFrame(
            {"day": np.concatenate([a, b]),
             "delta": np.concatenate([np.ones(len(a), dtype=np.int64),
                                      -np.ones(len(b), dtype=np.int64)])}
        )
        return out.groupby("day", as_index=False)["delta"].sum()

    deltas = (
        pairs.map_batches(_add_user_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(interval_deltas, batch_format="pandas")
        .to_pandas()  # distinct boundary-days-sized
    )
    deltas = deltas.groupby("day", as_index=False)["delta"].sum() \
                   .sort_values("day", kind="mergesort")
    bdays = deltas["day"].to_numpy().astype(np.int64)
    cum = np.cumsum(deltas["delta"].to_numpy().astype(np.int64))
    days = dau["day"].to_numpy().astype(np.int64)
    mau = cum[np.searchsorted(bdays, days, side="right") - 1]
    out = pd.DataFrame(
        {"day": days, "dau": dau["dau"].to_numpy().astype(np.int64),
         "mau": mau.astype(np.int64)})
    out["stickiness_ppm"] = (out["dau"].to_numpy() * 1_000_000
                             // out["mau"].to_numpy())
    return pa.Table.from_pandas(out, preserve_index=False)


DAU_MAU_SQL = (
    "WITH p AS (SELECT DISTINCT"
    f" epoch_us(ts) // {_DAY_US} AS day, user_id FROM events),"
    " d AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM p"
    "  GROUP BY day),"
    " m AS (SELECT d.day, CAST(count(DISTINCT p.user_id) AS BIGINT) AS mau"
    "  FROM d JOIN p ON p.day BETWEEN d.day - "
    f"{MAU_WINDOW - 1} AND d.day GROUP BY d.day)"
    " SELECT CAST(d.day AS BIGINT) AS day, dau, mau,"
    " CAST(dau * 1000000 // mau AS BIGINT) AS stickiness_ppm"
    " FROM d JOIN m USING (day)"
)


def q_new_vs_returning(sf_dir: str) -> "pa.Table":
    """New vs returning actives per day — split each day's distinct
    users by whether it is their FIRST active day: the growth-vs-
    retention decomposition every engagement dashboard pairs with
    ``dau_mau`` (same distinct-(day,user) base table).  One users-sized
    min-day groupby broadcast back over the pairs via a second
    distinct-pairs scan; all counts exact."""
    import pandas as pd

    from ray.data.aggregate import Min, Sum

    pairs = _user_day_pairs(sf_dir).materialize()
    first = (
        pairs.groupby("user_id")
        .aggregate(Min("day", alias_name="first_day"))
    )
    fd = first.to_pandas()  # users-sized (dimension-scale)
    fd = fd.sort_values("user_id", kind="mergesort")
    users_ref = ray.put(fd["user_id"].to_numpy().astype(np.int64))
    fdays_ref = ray.put(fd["first_day"].to_numpy().astype(np.int64))

    def split(t: pa.Table) -> pa.Table:
        users = ray.get(users_ref)
        fdays_all = ray.get(fdays_ref)
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["day"].to_numpy(zero_copy_only=False).astype(np.int64)
        fdays = fdays_all[np.searchsorted(users, u)]
        new = (d == fdays).astype(np.int64)
        g = pd.DataFrame({"day": d, "new_users": new,
                          "returning_users": 1 - new}) \
            .groupby("day", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        pairs.map_batches(split, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("new_users", alias_name="new_users"),
                   Sum("returning_users", alias_name="returning_users"))
    )
    return agg.map_batches(
        lambda t: t.rename_columns(["day", "new_users",
                                    "returning_users"]),
        batch_format="pyarrow",
    )


NEW_VS_RETURNING_SQL = (
    "WITH p AS (SELECT DISTINCT"
    f" epoch_us(ts) // {_DAY_US} AS day, user_id FROM events),"
    " f AS (SELECT user_id, min(day) AS first_day FROM p"
    "  GROUP BY user_id)"
    " SELECT CAST(day AS BIGINT) AS day,"
    " CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT)"
    "  AS new_users,"
    " CAST(sum(CASE WHEN day = first_day THEN 0 ELSE 1 END) AS BIGINT)"
    "  AS returning_users"
    " FROM p JOIN f USING (user_id) GROUP BY day"
)


TYP_SHIFT = 9       # typicality bucket = tok >> 9 (width 512)
TYP_SCALE = 1_000_000
TYP_BOTTOMK = 20


def q_doc_typicality(sf_dir: str) -> "pa.Table":
    """Least-typical documents — the TYP_BOTTOMK docs whose value-bucket
    histogram least resembles the corpus: score = floor(TYP_SCALE *
    sum_b c_doc(b) * g(b) / n_tok), the per-token inner product of the
    doc's bucket counts with the GLOBAL bucket histogram g (a doc living
    in rare value ranges scores low).  The distribution-outlier sweep a
    curation pass reviews first — complementary to near-dup (which finds
    docs too alike) and quality_filter (which scores text shape, not
    value placement).  Two streaming passes: a buckets-sized global
    histogram (broadcast), then one scoring scan emitting per-batch
    bottom-k candidates; ties -> doc_id ascending.  HUGEINT-exact twin;
    int64-exact here while n_tok * corpus_tokens * TYP_SCALE < 2^63
    (asserted per batch)."""
    import pandas as pd

    ds = _seq_ds(sf_dir)

    def hist_part(t: pa.Table) -> pa.Table:
        vals, _ = list_to_numpy(t["tokens"])
        uk, cnt = np.unique(vals.astype(np.int64) >> TYP_SHIFT,
                            return_counts=True)
        return pa.table({"bk": pa.array(uk),
                         "cnt": pa.array(cnt.astype(np.int64))})

    from ray.data.aggregate import Sum

    g = (
        ds.map_batches(hist_part, batch_format="pyarrow")
        .groupby("bk").aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()  # bucket-alphabet-sized
    )
    gb = np.zeros(int(g["bk"].max()) + 1, dtype=np.int64)
    gb[g["bk"].to_numpy().astype(np.int64)] = \
        g["cnt"].to_numpy().astype(np.int64)
    g_ref = ray.put(gb)

    def score_part(t: pa.Table) -> pa.Table:
        w = ray.get(g_ref)
        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64) >> TYP_SHIFT
        D = len(off) - 1
        e = pa.array([], type=pa.int64())
        if D == 0 or len(v) == 0:
            return pa.table(
                {"doc_id": pa.array([], type=pa.string()), "n_tok": e,
                 "typ": e, "score": e}
            )
        n = np.diff(off)
        typ = np.add.reduceat(w[v], off[:-1])
        assert int(typ.max()) < (1 << 63) // TYP_SCALE, \
            "doc_typicality int64 guard: promote score to object ints"
        score = (typ * TYP_SCALE) // n
        k = min(TYP_BOTTOMK, D)
        ids = np.asarray(t["doc_id"].to_pylist())
        order = np.lexsort((ids, score))[:k]  # ties -> doc_id ascending
        return pa.table(
            {"doc_id": t["doc_id"].take(pa.array(order)),
             "n_tok": pa.array(n[order].astype(np.int64)),
             "typ": pa.array(typ[order]), "score": pa.array(score[order])}
        )

    cand = ds.map_batches(
        score_part, batch_format="pyarrow", batch_size=256
    ).to_pandas()  # <= TYP_BOTTOMK per batch
    cand = cand.sort_values(["score", "doc_id"],
                            kind="mergesort").head(TYP_BOTTOMK)
    return pa.Table.from_pandas(
        cand.astype({"n_tok": np.int64, "typ": np.int64,
                     "score": np.int64}),
        preserve_index=False,
    )


DOC_TYPICALITY_SQL = (
    f"{_FLAT_CTE},"
    f" b AS (SELECT doc_id, tok // {1 << TYP_SHIFT} AS bk FROM flat),"
    " g AS (SELECT bk, count(*) AS gc FROM b GROUP BY bk),"
    " dc AS (SELECT doc_id, bk, count(*) AS c FROM b GROUP BY doc_id, bk),"
    " s AS (SELECT doc_id, CAST(sum(CAST(c AS HUGEINT) * gc) AS HUGEINT)"
    "   AS typ, sum(c) AS n FROM dc JOIN g USING (bk) GROUP BY doc_id)"
    " SELECT doc_id, CAST(n AS BIGINT) AS n_tok, CAST(typ AS BIGINT)"
    f" AS typ, CAST(typ * {TYP_SCALE} // n AS BIGINT) AS score"
    f" FROM s ORDER BY score, doc_id LIMIT {TYP_BOTTOMK}"
)


RFM_DAY_US = 86_400_000_000


def q_rfm_segments(sf_dir: str) -> "ray.data.Dataset":
    """Customer RFM segmentation — per customer the recency (last order
    epoch-day), frequency (order count) and monetary (cent sum) stats,
    each bucketed into exact quintiles: bucket = 1 + #breakpoints
    strictly below the value, breakpoints at ranks ceil(k*n/5) of the
    sorted stat (k = 1..4, integer rank arithmetic on BOTH sides — no
    float 0.2*n anywhere, so no quantile_disc rounding hazard).  The
    classic marketing / lifecycle segmentation, here as the pattern for
    deriving per-entity behavioral buckets at scale: one partial
    pre-aggregate inside map_batches, ONE customers-sized groupby, three
    distinct-value-sized histogram folds for the breakpoints, then a
    broadcast-breakpoint bucket-assignment scan — the order stream
    itself is read once and never re-shuffled."""
    import pandas as pd

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )

    def partial(df: "pd.DataFrame") -> "pd.DataFrame":
        day = (df["o_orderdate"].to_numpy().astype("datetime64[us]")
               .astype(np.int64) // RFM_DAY_US)
        cents = np.rint(df["o_totalprice"].to_numpy() * 100).astype(np.int64)
        g = pd.DataFrame(
            {"ck": df["o_custkey"].to_numpy(), "day": day, "cents": cents}
        ).groupby("ck", as_index=False).agg(
            r_day=("day", "max"), f=("day", "size"), m=("cents", "sum"))
        g["f"] = g["f"].astype(np.int64)
        return g

    from ray.data.aggregate import Max, Sum

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("ck")
        .aggregate(Max("r_day", alias_name="r_day"),
                   Sum("f", alias_name="f"), Sum("m", alias_name="m"))
        .materialize()  # customers-sized (dimension-scale, not fact-scale)
    )

    def breakpoints(col: str) -> np.ndarray:
        def h(t: pa.Table) -> pa.Table:
            uk, cnt = np.unique(
                t[col].to_numpy(zero_copy_only=False).astype(np.int64),
                return_counts=True)
            return pa.table({"v": pa.array(uk),
                             "cnt": pa.array(cnt.astype(np.int64))})

        hist = (
            agg.map_batches(h, batch_format="pyarrow")
            .groupby("v").aggregate(Sum("cnt", alias_name="cnt"))
            .to_pandas()
        )
        hist = hist.sort_values("v", kind="mergesort")
        c = hist["cnt"].to_numpy().astype(np.int64)
        n = int(c.sum())
        cum = np.cumsum(c)
        vs = hist["v"].to_numpy().astype(np.int64)
        ranks = (np.arange(1, 5, dtype=np.int64) * n + 4) // 5
        return vs[np.searchsorted(cum, ranks)]

    brk = {c: breakpoints(c) for c in ("r_day", "f", "m")}
    brk_ref = ray.put(brk)

    def assign(t: pa.Table) -> pa.Table:
        b = ray.get(brk_ref)
        cols = {"ck": t["ck"]}
        for c in ("r_day", "f", "m"):
            v = t[c].to_numpy(zero_copy_only=False).astype(np.int64)
            cols[c] = pa.array(v)
            cols[c + "_b"] = pa.array(
                1 + np.searchsorted(b[c], v, side="left").astype(np.int64))
        return pa.table(cols)

    return agg.map_batches(assign, batch_format="pyarrow")


RFM_SEGMENTS_SQL = (
    "WITH a AS (SELECT o_custkey AS ck,"
    f" max(epoch_us(o_orderdate) // {RFM_DAY_US}) AS r_day,"
    " CAST(count(*) AS BIGINT) AS f,"
    " CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS m"
    " FROM orders GROUP BY o_custkey),"
    " cnt AS (SELECT count(*) AS c FROM a),"
    " ks AS (SELECT CAST(i AS BIGINT) AS k FROM range(1, 5) t(i)),"
    " rv AS (SELECT r_day AS v, row_number() OVER (ORDER BY r_day) AS rn"
    "  FROM a),"
    " fv AS (SELECT f AS v, row_number() OVER (ORDER BY f) AS rn FROM a),"
    " mv AS (SELECT m AS v, row_number() OVER (ORDER BY m) AS rn FROM a),"
    " rb AS (SELECT v FROM ks CROSS JOIN cnt"
    "   JOIN rv ON rv.rn = (ks.k * cnt.c + 4) // 5),"
    " fb AS (SELECT v FROM ks CROSS JOIN cnt"
    "   JOIN fv ON fv.rn = (ks.k * cnt.c + 4) // 5),"
    " mb AS (SELECT v FROM ks CROSS JOIN cnt"
    "   JOIN mv ON mv.rn = (ks.k * cnt.c + 4) // 5)"
    " SELECT ck, CAST(r_day AS BIGINT) AS r_day,"
    " 1 + (SELECT count(*) FROM rb WHERE rb.v < a.r_day) AS r_day_b,"
    " f, 1 + (SELECT count(*) FROM fb WHERE fb.v < a.f) AS f_b,"
    " m, 1 + (SELECT count(*) FROM mb WHERE mb.v < a.m) AS m_b"
    " FROM a"
)


EQUALIZE_LEVELS = 64  # power of two so every q = k/L is an exact double


def q_equalize_map(sf_dir: str) -> "pa.Table":
    """Histogram-equalization codebook — the EQUALIZE_LEVELS-level
    quantile-transform table (level k -> token at rank ceil(k*n/L)):
    the exact value->uniform mapping a rank normalizer or an equi-depth
    binning stage applies before quantization, learned in ONE pass.
    L is a power of two so every probe k/L is an exact IEEE double and
    the rank convention (ceil(q*n), quantile_disc) cannot drift between
    engines.  Distinct-token-sized groupby, driver finish over the
    (<= 2^20-row) global histogram."""
    import pandas as pd

    ds = _seq_ds(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        vals, _ = list_to_numpy(t["tokens"])
        uk, cnt = np.unique(vals.astype(np.int64), return_counts=True)
        return pa.table({"tok": pa.array(uk),
                         "cnt": pa.array(cnt.astype(np.int64))})

    from ray.data.aggregate import Sum

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("tok").aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    hist = hist.sort_values("tok", kind="mergesort")
    c = hist["cnt"].to_numpy().astype(np.int64)
    total = int(c.sum())
    cum = np.cumsum(c)
    toks = hist["tok"].to_numpy().astype(np.int64)
    levels = np.arange(1, EQUALIZE_LEVELS + 1, dtype=np.int64)
    ranks = (levels * total + EQUALIZE_LEVELS - 1) // EQUALIZE_LEVELS
    brk = toks[np.searchsorted(cum, ranks)]
    return pa.Table.from_pandas(
        pd.DataFrame({"level": levels, "tok": brk}),
        preserve_index=False,
    )


_EQ_PROBES = ", ".join(
    repr(k / EQUALIZE_LEVELS) for k in range(1, EQUALIZE_LEVELS + 1)
)
EQUALIZE_MAP_SQL = (
    f"{_FLAT_CTE},"
    f" q AS (SELECT quantile_disc(tok, [{_EQ_PROBES}]) AS arr FROM flat)"
    " SELECT CAST(i AS BIGINT) AS level,"
    " CAST(arr[CAST(i AS INTEGER)] AS BIGINT) AS tok"
    f" FROM q, UNNEST(range(1, {EQUALIZE_LEVELS + 1})) AS t(i)"
)


def q_weekday_contrast(sf_dir: str) -> "pa.Table":
    """Weekday/weekend contrast per event type — counts and cent-value
    sums split by calendar half, plus the exact cross-statistic
    contrast = sum_wd*n_we - sum_we*n_wd (positive iff the weekday MEAN
    exceeds the weekend mean — the sign test a seasonality-aware
    sampler checks before mixing corpora, with no float division).
    Day-of-week from pure epoch arithmetic ((epoch_day + 3) % 7,
    Monday = 0 — identical integer expression on both sides, so no SQL
    date-function convention can drift).  One partial map_batches, a
    types-sized groupby, a tiny driver finish."""
    import pandas as pd

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )

    def partial(df: "pd.DataFrame") -> "pd.DataFrame":
        ts_us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        dow = ((ts_us // _DAY_US) + 3) % 7
        we = (dow >= 5).astype(np.int64)
        tok = np.rint(df["value"].to_numpy() * 100).astype(np.int64)
        g = pd.DataFrame(
            {"event_type": df["event_type"].to_numpy(), "we": we,
             "tok": tok}
        ).groupby(["event_type", "we"], as_index=False).agg(
            pn=("tok", "size"), ps=("tok", "sum"))
        g["pn"] = g["pn"].astype(np.int64)
        return g

    from ray.data.aggregate import Sum

    cells = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["event_type", "we"])
        .aggregate(Sum("pn", alias_name="n"), Sum("ps", alias_name="s"))
        .to_pandas()  # bounded: type alphabet x 2
    )
    piv = cells.pivot_table(index="event_type", columns="we",
                            values=["n", "s"], fill_value=0,
                            aggfunc="sum")
    out = pd.DataFrame({"event_type": piv.index})
    for col, src in (("n_wd", ("n", 0)), ("n_we", ("n", 1)),
                     ("sum_wd", ("s", 0)), ("sum_we", ("s", 1))):
        out[col] = (piv[src].to_numpy().astype(np.int64)
                    if src in piv.columns
                    else np.zeros(len(piv), dtype=np.int64))
    out["contrast"] = (out["sum_wd"].to_numpy() * out["n_we"].to_numpy()
                       - out["sum_we"].to_numpy() * out["n_wd"].to_numpy())
    return pa.Table.from_pandas(out.reset_index(drop=True),
                                preserve_index=False)


WEEKDAY_CONTRAST_SQL = (
    "WITH e AS (SELECT event_type,"
    f" CASE WHEN ((epoch_us(ts) // {_DAY_US}) + 3) % 7 >= 5"
    "  THEN 1 ELSE 0 END AS we,"
    " CAST(round(value * 100) AS BIGINT) AS tok FROM events),"
    " c AS (SELECT event_type,"
    "  sum(CASE WHEN we = 0 THEN 1 ELSE 0 END) AS n_wd,"
    "  sum(CASE WHEN we = 1 THEN 1 ELSE 0 END) AS n_we,"
    "  sum(CASE WHEN we = 0 THEN tok ELSE 0 END) AS sum_wd,"
    "  sum(CASE WHEN we = 1 THEN tok ELSE 0 END) AS sum_we"
    "  FROM e GROUP BY event_type)"
    " SELECT event_type, CAST(n_wd AS BIGINT) AS n_wd,"
    " CAST(n_we AS BIGINT) AS n_we, CAST(sum_wd AS BIGINT) AS sum_wd,"
    " CAST(sum_we AS BIGINT) AS sum_we,"
    " CAST(sum_wd * n_we - sum_we * n_wd AS BIGINT) AS contrast"
    " FROM c"
)


def q_session_duration_bands(sf_dir: str) -> "pa.Table":
    """Session-duration envelope — n_sessions and the exact p50/p90/p99
    of session length in whole seconds (rank = ceil(q*n)), plus the max:
    the engagement-distribution summary a product dashboard tracks and
    the SLO-style tail view ``sessionize`` alone doesn't give.  Composes
    the gap-window sessionizer with the value-histogram exact-quantile
    fold: per-batch histogram of floor((last-first)/1s), a distinct-
    duration-sized groupby, a one-row driver finish — sessions stream,
    nothing user-level materializes."""
    import pandas as pd

    sess = q_sessionize(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        first = t["first_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        last = t["last_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        dur = (last - first) // 1_000_000
        uk, cnt = np.unique(dur, return_counts=True)
        return pa.table({"dur_s": pa.array(uk),
                         "cnt": pa.array(cnt.astype(np.int64))})

    from ray.data.aggregate import Sum

    hist = (
        sess.map_batches(partial, batch_format="pyarrow")
        .groupby("dur_s").aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()  # bounded by distinct whole-second durations
    )
    hist = hist.sort_values("dur_s", kind="mergesort")
    durs = hist["dur_s"].to_numpy().astype(np.int64)
    total, pick = _hist_rank_pick(
        durs, hist["cnt"].to_numpy().astype(np.int64))

    out = pd.DataFrame(
        {"n_sessions": np.array([total], dtype=np.int64),
         "p50_s": np.array([pick(1, 2)], dtype=np.int64),
         "p90_s": np.array([pick(9, 10)], dtype=np.int64),
         "p99_s": np.array([pick(99, 100)], dtype=np.int64),
         "max_s": np.array([int(durs[-1])], dtype=np.int64)}
    )
    return pa.Table.from_pandas(out, preserve_index=False)


SESSION_DURATION_BANDS_SQL = (
    "WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,"
    " CASE WHEN lag(epoch_us(ts)) OVER w IS NULL"
    f"  OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US}"
    "  THEN 1 ELSE 0 END AS brk"
    " FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),"
    " s AS (SELECT user_id, ts_us, sum(brk) OVER (PARTITION BY user_id"
    "   ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM e),"
    " d AS (SELECT (max(ts_us) - min(ts_us)) // 1000000 AS dur_s"
    "  FROM s GROUP BY user_id, sid)"
    " SELECT CAST(count(*) AS BIGINT) AS n_sessions,"
    " CAST(quantile_disc(dur_s, 0.5) AS BIGINT) AS p50_s,"
    " CAST(quantile_disc(dur_s, 0.9) AS BIGINT) AS p90_s,"
    " CAST(quantile_disc(dur_s, 0.99) AS BIGINT) AS p99_s,"
    " CAST(max(dur_s) AS BIGINT) AS max_s FROM d"
)


def q_iqr_outliers(sf_dir: str) -> "ray.data.Dataset":
    """Per-doc Tukey-fence outlier audit — exact lower/upper quartiles
    (1-based rank ceil(q*n), DuckDB's quantile_disc convention) and the
    count of tokens outside [q1 - 1.5*IQR, q3 + 1.5*IQR], kept integer
    by scaling the fence comparison by 2 (2*tok vs 2*q1 - 3*IQR).  The
    robust per-sequence outlier density a cleaning pass thresholds on —
    unlike ``anomaly_mad`` this reports quartiles too, so the consumer
    can distinguish fat tails from a shifted box.  Fully vectorized: one
    composite-key sort per batch (seg-major so values sort within docs),
    two gathers for the quartile ranks, one reduceat for the fence
    count.  Requires 0 <= tok < 2^20 (asserted) for the packed key."""
    ds = _seq_ds(sf_dir)

    def fences(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        D = len(off) - 1
        e = pa.array([], type=pa.int64())
        if D == 0 or len(v) == 0:
            return pa.table(
                {"doc_id": pa.array([], type=pa.string()), "n": e,
                 "q1": e, "q3": e, "n_out": e}
            )
        assert v.min() >= 0 and v.max() < (1 << 20), \
            "iqr_outliers packed sort needs 0 <= tok < 2^20"
        n = np.diff(off)
        assert (n > 0).all(), "iqr_outliers requires non-empty docs"
        seg = np.repeat(np.arange(D, dtype=np.int64), n)
        sv = np.sort((seg << 21) | v) & ((1 << 21) - 1)
        r1 = off[:-1] + (n + 3) // 4 - 1          # ceil(n/4), 0-based
        r3 = off[:-1] + (3 * n + 3) // 4 - 1      # ceil(3n/4)
        q1, q3 = sv[r1], sv[r3]
        iqr = q3 - q1
        lo, hi = 2 * q1 - 3 * iqr, 2 * q3 + 3 * iqr
        out = (2 * v < lo[seg]) | (2 * v > hi[seg])
        n_out = np.add.reduceat(out.astype(np.int64), off[:-1])
        # reduceat on a doc whose slice is all-False still yields 0 ✓
        return pa.table(
            {"doc_id": t["doc_id"], "n": pa.array(n.astype(np.int64)),
             "q1": pa.array(q1), "q3": pa.array(q3),
             "n_out": pa.array(n_out)}
        )

    return ds.map_batches(fences, batch_format="pyarrow", batch_size=256)


IQR_OUTLIERS_SQL = (
    f"{_FLAT_CTE},"
    " q AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n,"
    "  CAST(quantile_disc(tok, 0.25) AS BIGINT) AS q1,"
    "  CAST(quantile_disc(tok, 0.75) AS BIGINT) AS q3"
    "  FROM flat GROUP BY doc_id)"
    " SELECT f.doc_id, n, q1, q3,"
    " CAST(sum(CASE WHEN 2*tok < 2*q1 - 3*(q3-q1)"
    "   OR 2*tok > 2*q3 + 3*(q3-q1) THEN 1 ELSE 0 END) AS BIGINT) AS n_out"
    " FROM flat f JOIN q USING (doc_id) GROUP BY f.doc_id, n, q1, q3"
)


def q_daily_value_bands(sf_dir: str) -> "ray.data.Dataset":
    """Per-day exact value bands — n and the p10/p50/p90 of the day's
    event values on the cent grid (rank = ceil(q*n), quantile_disc's
    convention): the control-chart envelope a drift monitor draws, and
    the day-granularity complement to ``hod_median``'s hour-of-day view.
    Histogram-exact at any scale: one (day, value)-partial map_batches,
    a distinct-(day, value)-sized groupby, then a per-day fold over its
    own value histogram — the event stream itself never shuffles."""
    import pandas as pd

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "value"]
    )

    def partial(t: pa.Table) -> pa.Table:
        ts_us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        tok = np.rint(
            t["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        day = ts_us // _DAY_US
        key = day * (1 << 40) + (tok + (1 << 39))
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {"day": pa.array(uk >> 40),
             "tok": pa.array((uk & ((1 << 40) - 1)) - (1 << 39)),
             "cnt": pa.array(cnt.astype(np.int64))}
        )

    def finish(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values("tok", kind="mergesort")
        toks = df["tok"].to_numpy().astype(np.int64)
        total, pick = _hist_rank_pick(
            toks, df["cnt"].to_numpy().astype(np.int64))
        return pd.DataFrame(
            {"day": df["day"].iloc[:1].to_numpy(),
             "n": np.array([total], dtype=np.int64),
             "p10": np.array([pick(1, 10)], dtype=np.int64),
             "p50": np.array([pick(1, 2)], dtype=np.int64),
             "p90": np.array([pick(9, 10)], dtype=np.int64)}
        )

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["day", "tok"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .groupby("day")
        .map_groups(finish, batch_format="pandas")
    )


DAILY_VALUE_BANDS_SQL = (
    "WITH e AS (SELECT"
    f" epoch_us(ts) // {86_400_000_000} AS day,"
    " CAST(round(value * 100) AS BIGINT) AS tok FROM events)"
    " SELECT CAST(day AS BIGINT) AS day, CAST(count(*) AS BIGINT) AS n,"
    " CAST(quantile_disc(tok, 0.1) AS BIGINT) AS p10,"
    " CAST(quantile_disc(tok, 0.5) AS BIGINT) AS p50,"
    " CAST(quantile_disc(tok, 0.9) AS BIGINT) AS p90"
    " FROM e GROUP BY day"
)


PMI_SHIFT = 9       # value bucket = tok >> 9 (width 512)
PMI_MINC = 100      # bigram support floor before PMI ranking
PMI_SCALE = 1_000_000
PMI_TOPK = 20


def q_pmi_buckets(sf_dir: str) -> "pa.Table":
    """Top-k bucket-transition PMI — which value-range transitions are
    over-represented vs independence (the association-strength view of
    ``event_transitions``-style counting: a raw count is dominated by the
    marginals; PMI = p(x,y)/(p(x)p(y)) surfaces the structurally coupled
    ranges a regime-detection or quantization pass should model jointly).
    Adjacent within-doc token pairs bucketed at width 2^PMI_SHIFT; score
    = floor(PMI_SCALE * c_xy * N / (c_x. * c_.y)) over the bigram-table
    marginals, computed in arbitrary-precision Python ints on the
    (bucket-alphabet^2)-bounded driver table (HUGEINT on the SQL side),
    support floor PMI_MINC, ties -> (x, y) ascending.  One partial-count
    map_batches + one distinct-pair-sized groupby; the token stream is
    never shuffled."""
    import pandas as pd

    ds = _seq_ds(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64) >> PMI_SHIFT
        e = pa.array([], type=pa.int64())
        if len(v) < 2:
            return pa.table({"x": e, "y": e, "cnt": e})
        same = np.ones(len(v) - 1, dtype=bool)
        assert (np.diff(off) > 0).all(), "pmi_buckets requires non-empty docs"
        ends = np.cumsum(np.diff(off))[:-1] - 1  # last token index per doc
        same[ends] = False
        key = (v[:-1] << 21) | v[1:]
        key = key[same]
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {"x": pa.array(uk >> 21), "y": pa.array(uk & ((1 << 21) - 1)),
             "cnt": pa.array(cnt.astype(np.int64))}
        )

    from ray.data.aggregate import Sum

    pairs = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["x", "y"]).aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()  # bounded by bucket-alphabet^2, not corpus size
    )
    if len(pairs) == 0:
        return pa.table({"x": pa.array([], type=pa.int64()),
                         "y": pa.array([], type=pa.int64()),
                         "cnt": pa.array([], type=pa.int64()),
                         "score": pa.array([], type=pa.int64())})
    n_bi = int(pairs["cnt"].sum())
    cx = pairs.groupby("x")["cnt"].sum().to_dict()
    cy = pairs.groupby("y")["cnt"].sum().to_dict()
    rows = []
    for x, y, c in pairs[["x", "y", "cnt"]].itertuples(index=False):
        if c < PMI_MINC:
            continue
        score = (PMI_SCALE * int(c) * n_bi) // (int(cx[x]) * int(cy[y]))
        rows.append((int(x), int(y), int(c), score))
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    rows = rows[:PMI_TOPK]
    df = pd.DataFrame(rows, columns=["x", "y", "cnt", "score"])
    return pa.Table.from_pandas(
        df.astype({"x": np.int64, "y": np.int64, "cnt": np.int64,
                   "score": np.int64}),
        preserve_index=False,
    )


PMI_BUCKETS_SQL = (
    f"{_FLAT_CTE},"
    f" b AS (SELECT doc_id, pos, tok // {1 << PMI_SHIFT} AS bk FROM flat),"
    " bg AS (SELECT bk AS x, lead(bk) OVER"
    "  (PARTITION BY doc_id ORDER BY pos) AS y FROM b),"
    " c AS (SELECT x, y, count(*) AS cnt FROM bg"
    "  WHERE y IS NOT NULL GROUP BY x, y),"
    " mx AS (SELECT x, sum(cnt) AS cx FROM c GROUP BY x),"
    " my AS (SELECT y, sum(cnt) AS cy FROM c GROUP BY y),"
    " t AS (SELECT sum(cnt) AS nbi FROM c)"
    " SELECT CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y,"
    " CAST(cnt AS BIGINT) AS cnt,"
    f" CAST(CAST({PMI_SCALE} AS HUGEINT) * cnt * nbi // (cx * cy)"
    "  AS BIGINT) AS score"
    " FROM c JOIN mx USING (x) JOIN my USING (y), t"
    f" WHERE cnt >= {PMI_MINC}"
    f" ORDER BY score DESC, x, y LIMIT {PMI_TOPK}"
)


def q_type_hour_assoc(sf_dir: str) -> "pa.Table":
    """Event-type x hour-of-day independence residuals — the chi-square
    contingency audit in exact integer form: for every observed cell,
    the count o, its margins (row_tot, col_tot, n_tot) and resid =
    o*N - row_tot*col_tot, i.e. N^2 * (p_obs - p_independent).  A
    positive resid marks a (type, hour) hot spot the seasonal profile
    treats as noise; chi2 itself is sum(resid^2 / (N*r*c)) — left as
    rationals so both engines stay bit-exact (no float division).  One
    partial-count map_batches, a (types x 24)-bounded groupby, a tiny
    driver finish.  int64-exact while total events < 2^31 (o*N < 2^62);
    past that promote the finish to Python object ints — the counting
    passes are scale-safe."""
    import pandas as pd

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    )

    def partial(df: "pd.DataFrame") -> "pd.DataFrame":
        ts_us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        g = pd.DataFrame(
            {"event_type": df["event_type"].to_numpy(),
             "hod": (ts_us // HOUR_US) % 24}
        ).groupby(["event_type", "hod"], as_index=False).size()
        g.rename(columns={"size": "n"}, inplace=True)
        g["n"] = g["n"].astype(np.int64)
        return g

    from ray.data.aggregate import Sum

    cells = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["event_type", "hod"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # bounded: event-type alphabet x 24
    )
    n = cells["n"].to_numpy().astype(np.int64)
    n_tot = int(n.sum())
    assert n_tot < (1 << 31), "type_hour_assoc int64 finish guard"
    rt = cells.groupby("event_type")["n"].sum()
    ct = cells.groupby("hod")["n"].sum()
    row_tot = rt.loc[cells["event_type"]].to_numpy().astype(np.int64)
    col_tot = ct.loc[cells["hod"]].to_numpy().astype(np.int64)
    out = pd.DataFrame(
        {"event_type": cells["event_type"],
         "hod": cells["hod"].astype(np.int64), "n": n,
         "row_tot": row_tot, "col_tot": col_tot,
         "n_tot": np.full(len(cells), n_tot, dtype=np.int64),
         "resid": n * n_tot - row_tot * col_tot}
    )
    return pa.Table.from_pandas(out, preserve_index=False)


TYPE_HOUR_ASSOC_SQL = (
    "WITH e AS (SELECT event_type,"
    f" (epoch_us(ts) // {HOUR_US}) % 24 AS hod FROM events),"
    " o AS (SELECT event_type, hod, count(*) AS n FROM e"
    "  GROUP BY event_type, hod),"
    " r AS (SELECT event_type, sum(n) AS rt FROM o GROUP BY event_type),"
    " c AS (SELECT hod, sum(n) AS ct FROM o GROUP BY hod),"
    " t AS (SELECT sum(n) AS nt FROM o)"
    " SELECT o.event_type, CAST(o.hod AS BIGINT) AS hod,"
    " CAST(o.n AS BIGINT) AS n, CAST(rt AS BIGINT) AS row_tot,"
    " CAST(ct AS BIGINT) AS col_tot, CAST(nt AS BIGINT) AS n_tot,"
    " CAST(o.n * nt - rt * ct AS BIGINT) AS resid"
    " FROM o JOIN r USING (event_type) JOIN c USING (hod), t"
)


def q_max_subarray(sf_dir: str) -> "ray.data.Dataset":
    """Per-doc maximum above-mean window (Kadane / maximum-subarray on the
    mean-centered signal, kept integer-exact by scaling by n): with
    w_i = n*x_i - sum(x), ``best`` = max over non-empty windows of
    sum(w_i) = n * (window_sum - window_len * mean) — the single most
    anomalous sustained excursion in the sequence, the burst a
    retention-tier or alerting pass should preserve.  Always >= 0 (the
    full-doc window sums to exactly 0).  Fully vectorized across the
    batch: one global cumsum, then a SEGMENTED running-min via the
    disjoint-offset trick (each doc's rebased prefixes are shifted into
    their own non-overlapping value range, descending so minima never
    leak across docs), so no per-row Python.  Exactness: |prefix| <=
    n^2 * max_tok <= 2^52 for n <= 2^16, tok < 2^20; the offset guard
    asserts (D+1)*K < 2^62 before trusting int64."""
    ds = _seq_ds(sf_dir)

    def best(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        D = len(off) - 1
        e = pa.array([], type=pa.int64())
        if D == 0 or len(v) == 0:
            return pa.table(
                {"doc_id": pa.array([], type=pa.string()), "n": e, "best": e}
            )
        n = np.diff(off)
        assert (n > 0).all(), "max_subarray requires non-empty docs"
        tot = np.add.reduceat(v, off[:-1])
        w = np.repeat(n, n) * v - np.repeat(tot, n)
        G0 = np.concatenate(([0], np.cumsum(w)))
        # extended layout: [boundary-0, prefix_1..prefix_n] per doc
        ext_n = n + 1
        ext_off = np.concatenate(([0], np.cumsum(ext_n)))
        ne = int(ext_off[-1])
        bpos = ext_off[:-1]
        tmask = np.ones(ne, dtype=bool)
        tmask[bpos] = False
        E = np.empty(ne, dtype=np.int64)
        E[bpos] = G0[off[:-1]]
        E[tmask] = G0[1:]
        P = E - np.repeat(G0[off[:-1]], ext_n)  # per-doc prefixes, P[start]=0
        mx = int(np.abs(P).max())
        K = 2 * mx + 1
        assert (D + 1) * K < (1 << 62), "max_subarray offset overflow guard"
        sege = np.repeat(np.arange(D, dtype=np.int64), ext_n)
        adj = P + (D - sege) * K  # earlier docs strictly above later ones
        cm = np.minimum.accumulate(adj)
        ti = np.flatnonzero(tmask)
        cand = P[ti] - (cm[ti - 1] - (D - sege[ti]) * K)
        out = np.maximum.reduceat(cand, off[:-1])
        return pa.table(
            {"doc_id": t["doc_id"], "n": pa.array(n.astype(np.int64)),
             "best": pa.array(out)}
        )

    return ds.map_batches(best, batch_format="pyarrow", batch_size=256)


MAX_SUBARRAY_SQL = (
    f"{_FLAT_CTE},"
    " s AS (SELECT doc_id, pos, tok,"
    "  count(*) OVER (PARTITION BY doc_id) AS n,"
    "  sum(tok) OVER (PARTITION BY doc_id) AS tot FROM flat),"
    " p AS (SELECT doc_id, pos, n,"
    "  sum(n * tok - tot) OVER (PARTITION BY doc_id ORDER BY pos) AS pre"
    "  FROM s),"
    " m AS (SELECT doc_id, n, pre,"
    "  min(pre) OVER (PARTITION BY doc_id ORDER BY pos"
    "   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mn FROM p)"
    " SELECT doc_id, CAST(max(n) AS BIGINT) AS n,"
    " CAST(max(pre - LEAST(0, COALESCE(mn, 0))) AS BIGINT) AS best"
    " FROM m GROUP BY doc_id"
)


def q_longest_runup(sf_dir: str) -> "ray.data.Dataset":
    """Per-doc longest strictly-increasing token run (in tokens) — the
    monotone-trend streak detector (a long run-up in a supposedly
    stationary signal flags drift or a counter leaking into a gauge; the
    sequence analog of ``longest_streak``'s daily version).  Vectorized
    gaps-and-islands: a run RESTART is any position whose token fails
    v[i] > v[i-1] or that starts a doc; ``last restart at-or-before``
    comes from one running max over position indices (doc starts are
    always restarts, so the running max never crosses docs), run length
    = i - last_restart + 1, per-doc max via one reduceat."""
    ds = _seq_ds(sf_dir)

    def runs(t: pa.Table) -> pa.Table:
        vals, off = list_to_numpy(t["tokens"])
        v = vals.astype(np.int64)
        D = len(off) - 1
        e = pa.array([], type=pa.int64())
        if D == 0 or len(v) == 0:
            return pa.table(
                {"doc_id": pa.array([], type=pa.string()),
                 "n": e, "longest_up": e}
            )
        n = np.diff(off)
        assert (n > 0).all(), "longest_runup requires non-empty docs"
        N = len(v)
        restart = np.ones(N, dtype=bool)
        restart[1:] = ~(v[1:] > v[:-1])
        restart[off[:-1]] = True  # doc boundaries always restart
        idx = np.arange(N, dtype=np.int64)
        last = np.maximum.accumulate(np.where(restart, idx, -1))
        runlen = idx - last + 1
        out = np.maximum.reduceat(runlen, off[:-1])
        return pa.table(
            {"doc_id": t["doc_id"], "n": pa.array(n.astype(np.int64)),
             "longest_up": pa.array(out)}
        )

    return ds.map_batches(runs, batch_format="pyarrow", batch_size=512)


LONGEST_RUNUP_SQL = (
    f"{_FLAT_CTE},"
    " l AS (SELECT doc_id, pos, CASE WHEN tok >"
    "  lag(tok) OVER (PARTITION BY doc_id ORDER BY pos)"
    "  THEN 0 ELSE 1 END AS brk FROM flat),"
    " g AS (SELECT doc_id, pos,"
    "  sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM l),"
    " r AS (SELECT doc_id, grp, count(*) AS rl FROM g GROUP BY doc_id, grp)"
    " SELECT doc_id, CAST(sum(rl) AS BIGINT) AS n,"
    " CAST(max(rl) AS BIGINT) AS longest_up FROM r GROUP BY doc_id"
)


CORE_QUERIES = {
    "rollup_t1": (lambda sf: _rollup_long(sf, 1), _rollup_sql(1)),
    "rollup_t3": (lambda sf: _rollup_long(sf, 3), _rollup_sql(3)),
    "rollup_t6": (lambda sf: _rollup_long(sf, 6), _rollup_sql(6)),
    "source_stats": (q_source_stats, SOURCE_STATS_SQL),
    "store_stats": (q_store_stats, SOURCE_STATS_SQL),
    "store_tier3": (q_store_tier, STORE_TIER_SQL),
    "haar_l1": (q_haar_l1, HAAR_L1_SQL),
    "roundtrip_haar": (lambda sf: _roundtrip(sf, "haar"), ROUNDTRIP_SQL),
    "roundtrip_db4": (lambda sf: _roundtrip(sf, "db4"), ROUNDTRIP_SQL),
    "aggtree_ok": (q_aggtree_ok, AGGTREE_SQL),
    "codec_ok": (q_codec_ok, CODEC_SQL),
    "epn_quantiles": (q_epn_quantiles, EPN_SQL),
    "events_rollup_w4": (q_events_rollup, EVENTS_ROLLUP_SQL),
    "sessionize": (q_sessionize, SESSIONIZE_SQL),
    "funnel_conversion": (q_funnel, FUNNEL_SQL),
    "gapfill_hourly": (q_gapfill_hourly, GAPFILL_SQL),
    "events_rate": (q_events_rate, EVENTS_RATE_SQL),
    "events_ewma8": (q_events_ewma8, EWMA8_SQL),
    "range_join": (q_range_join, RANGE_JOIN_SQL),
    "daily_rollup": (q_daily_rollup, DAILY_ROLLUP_SQL),
    "sliding_w8": (q_sliding_w8, SLIDING_SQL),
    "events_asof": (q_events_asof, EVENTS_ASOF_SQL),
    "source_stats_salted": (q_source_stats_salted, SOURCE_STATS_SQL),
    "normalize": (q_normalize, NORMALIZE_SQL),
    "cross_source_diff": (q_cross_source_diff, CROSS_SOURCE_SQL),
    "topk_tokens": (q_topk_tokens, TOPK_TOKENS_SQL),
    "epn_full": (q_epn_full, EPN_FULL_SQL),
    "epn_full_sine": (q_epn_full_sine, EPN_SINE_SQL),
    "source_stats_subset": (q_source_stats_subset, SOURCE_STATS_SUBSET_SQL),
    "source_stats_t15": (q_source_stats_t15, SOURCE_STATS_T15_SQL),
    "parseval_ok": (q_parseval_ok, PARSEVAL_SQL),
    "resample64": (q_resample64, RESAMPLE64_SQL),
    "bandpass_coarse": (q_bandpass, BANDPASS_SQL),
    "scale_energy": (q_scale_energy, SCALE_ENERGY_SQL),
    "fft_magnitude": (q_fft_magnitude, FFT64_SQL),
    "dwt_haar": (q_haar_details, HAAR_DETAILS_SQL),
    "dwt_db4": (lambda sf: _dwt_coeffs(sf, "db4"), DWT_COEFFS_SQL),
    "gorilla_blocks": (q_gorilla_blocks, GORILLA_BLOCKS_SQL),
    "events_zscore16": (q_events_zscore16, EVENTS_ZSCORE_SQL),
    "hourly_profile": (q_hourly_profile, HOURLY_PROFILE_SQL),
    "distinct_users_daily": (q_distinct_users_daily, DISTINCT_USERS_SQL),
    "wau_7d": (q_wau7, WAU7_SQL),
    "event_transitions": (q_event_transitions, EVENT_TRANSITIONS_SQL),
    "last_event_per_user": (q_last_event_per_user, LAST_EVENT_SQL),
    "missing_hours": (q_missing_hours, MISSING_HOURS_SQL),
    "events_pivot": (q_events_pivot, EVENTS_PIVOT_SQL),
    "type_corr": (q_type_corr, TYPE_CORR_SQL),
    "retention_cohorts": (q_retention_cohorts, RETENTION_SQL),
    "autocorr_lag1": (q_autocorr_lag1, AUTOCORR_SQL),
    "autocorr_lags": (q_autocorr_lags, AUTOCORR_LAGS_SQL),
    "cusum_flags": (q_cusum_flags, CUSUM_SQL),
    "rolling_median": (q_rolling_median, ROLLING_MEDIAN_SQL),
    "ohlc_rollup": (q_ohlc_rollup, OHLC_SQL),
    "seasonal_profile": (q_seasonal_profile, SEASONAL_PROFILE_SQL),
    "changepoint_argmax": (q_changepoint_argmax, CHANGEPOINT_SQL),
    "longest_streak": (q_longest_streak, LONGEST_STREAK_SQL),
    "window_slope": (q_window_slope, WINDOW_SLOPE_SQL),
    "pattern_match": (q_pattern_match, PATTERN_MATCH_SQL),
    "bollinger_breakouts": (q_bollinger_breakouts, BOLLINGER_SQL),
    "dtw_query": (q_dtw_query, DTW_QUERY_SQL),
    "motif_pair": (q_motif_pair, MOTIF_PAIR_SQL),
    "seq_neardup_sax": (q_seq_neardup_sax, SEQ_NEARDUP_SQL),
    "cross_motifs": (q_cross_motifs, CROSS_MOTIFS_SQL),
    "token_mode": (q_token_mode, TOKEN_MODE_SQL),
    "token_familiarity": (q_token_familiarity, TOKEN_FAMILIARITY_SQL),
    "rle_runs": (q_rle_runs, RLE_RUNS_SQL),
    "dod_width_hist": (q_dod_width_hist, DOD_WIDTH_SQL),
    "haar_sparsity": (q_haar_sparsity, HAAR_SPARSITY_SQL),
    "source_profile_corr": (q_source_profile_corr, SOURCE_PROFILE_CORR_SQL),
    "source_drift": (q_source_drift, SOURCE_DRIFT_SQL),
    "window_median": (q_window_median, WINDOW_MEDIAN_SQL),
    "tier_error": (q_tier_error, TIER_ERROR_SQL),
    "zero_crossings": (q_zero_crossings, ZERO_CROSS_SQL),
    "drawdown": (q_drawdown, DRAWDOWN_SQL),
    "sma_cross": (q_sma_cross, SMA_CROSS_SQL),
    "lag_features": (q_lag_features, LAG_FEATURES_SQL),
    "xcorr_sources": (q_xcorr_sources, XCORR_SOURCES_SQL),
    "gini_tokens": (q_gini_tokens, GINI_TOKENS_SQL),
    "winsorize_stats": (q_winsorize_stats, WINSORIZE_SQL),
    "mann_kendall": (q_mann_kendall, MANN_KENDALL_SQL),
    "interarrival_stats": (q_interarrival_stats, INTERARRIVAL_SQL),
    "rare_token_docs": (q_rare_token_docs, RARE_TOKEN_SQL),
    "zipf_hist": (q_zipf_hist, ZIPF_HIST_SQL),
    "vocab_overlap": (q_vocab_overlap, VOCAB_OVERLAP_SQL),
    "total_variation": (q_total_variation, TOTAL_VARIATION_SQL),
    "doc_compress_bits": (q_doc_compress_bits, DOC_COMPRESS_SQL),
    "benford_digits": (q_benford_digits, BENFORD_SQL),
    "hurst_rs": (q_hurst_rs, HURST_RS_SQL),
    "variance_ratio": (q_variance_ratio, VARIANCE_RATIO_SQL),
    "runs_test": (q_runs_test, RUNS_TEST_SQL),
    "ks_sources": (q_ks_sources, KS_SOURCES_SQL),
    "bigram_diversity": (q_bigram_diversity, BIGRAM_DIVERSITY_SQL),
    "theil_sen": (q_theil_sen, THEIL_SEN_SQL),
    "ordinal_patterns": (q_ordinal_patterns, ORDINAL_PATTERNS_SQL),
    "l1_distance_sources": (q_l1_distance_sources, L1_DISTANCE_SQL),
    "splithalf_corr": (q_splithalf_corr, SPLITHALF_SQL),
    "vocab_growth": (q_vocab_growth, VOCAB_GROWTH_SQL),
    "user_burstiness": (q_user_burstiness, USER_BURSTINESS_SQL),
    "half_drift": (q_half_drift, HALF_DRIFT_SQL),
    "position_profile": (q_position_profile, POSITION_PROFILE_SQL),
    "rsi_window": (q_rsi_window, RSI_WINDOW_SQL),
    "late_events": (q_late_events, LATE_EVENTS_SQL),
    "daily_top_types": (q_daily_top_types, DAILY_TOP_TYPES_SQL),
    "neardup_raretok": (q_neardup_raretok, NEARDUP_RARETOK_SQL),
    "window_distinct": (q_window_distinct, WINDOW_DISTINCT_SQL),
    "path_trigrams": (q_path_trigrams, PATH_TRIGRAMS_SQL),
    "window_copairs": (q_window_copairs, WINDOW_COPAIRS_SQL),
    "hod_median": (q_hod_median, HOD_MEDIAN_SQL),
    "peak_pos": (q_peak_pos, PEAK_POS_SQL),
    "period_detect": (q_period_detect, PERIOD_DETECT_SQL),
    "peak_windows": (q_peak_windows, PEAK_WINDOWS_SQL),
    "m4_downsample": (q_m4_downsample, M4_SQL),
    "lttb_downsample": (q_lttb_downsample, LTTB_SQL),
    "corpus_pack512": (q_corpus_pack512, PACK_SQL),
    "sax_symbols": (q_sax_symbols, SAX_SQL),
    "sax_motifs": (q_sax_motifs, SAX_MOTIFS_SQL),
    "best_shift": (q_best_shift, BEST_SHIFT_SQL),
    "best_shift_full": (q_best_shift_full, BEST_SHIFT_FULL_SQL),
    "best_shift_family": (q_best_shift_family, BEST_SHIFT_FAMILY_SQL),
    "scale_decomposition": (q_scale_decomposition, SCALE_DECOMP_SQL),
    "haar_denoise_l1": (q_haar_denoise_l1, HAAR_DENOISE_SQL),
    "anomaly_mad": (q_anomaly_mad, ANOMALY_MAD_SQL),
    "seasonal_naive_error": (q_seasonal_naive_error, SEASONAL_NAIVE_SQL),
    "store_refresh": (q_store_refresh, SOURCE_STATS_SQL),
    "revenue_by_nation": (q_revenue_by_nation, REVENUE_BY_NATION_SQL),
    "order_priority_revenue": (
        q_order_priority_revenue, ORDER_PRIORITY_REVENUE_SQL
    ),
    "top_orders_q3": (q_top_orders_q3, TOP_ORDERS_Q3_SQL),
    "order_priority_skewjoin": (
        q_order_priority_skewjoin, ORDER_PRIORITY_REVENUE_SQL
    ),
    "orders_no_lineitem": (q_orders_no_lineitem, ORDERS_NO_LINEITEM_SQL),
    "profit_by_nation_year": (q_profit_by_nation_year, PROFIT_Q9_SQL),
    "revenue_by_region": (q_revenue_by_region, REVENUE_BY_REGION_SQL),
    "max_subarray": (q_max_subarray, MAX_SUBARRAY_SQL),
    "longest_runup": (q_longest_runup, LONGEST_RUNUP_SQL),
    "pmi_buckets": (q_pmi_buckets, PMI_BUCKETS_SQL),
    "type_hour_assoc": (q_type_hour_assoc, TYPE_HOUR_ASSOC_SQL),
    "iqr_outliers": (q_iqr_outliers, IQR_OUTLIERS_SQL),
    "daily_value_bands": (q_daily_value_bands, DAILY_VALUE_BANDS_SQL),
    "session_duration_bands": (
        q_session_duration_bands, SESSION_DURATION_BANDS_SQL
    ),
    "equalize_map": (q_equalize_map, EQUALIZE_MAP_SQL),
    "weekday_contrast": (q_weekday_contrast, WEEKDAY_CONTRAST_SQL),
    "doc_typicality": (q_doc_typicality, DOC_TYPICALITY_SQL),
    "rfm_segments": (q_rfm_segments, RFM_SEGMENTS_SQL),
    "dau_mau": (q_dau_mau, DAU_MAU_SQL),
    "new_vs_returning": (q_new_vs_returning, NEW_VS_RETURNING_SQL),
    "value_drift_halves": (q_value_drift_halves, VALUE_DRIFT_HALVES_SQL),
    "churn_split": (q_churn_split, CHURN_SPLIT_SQL),
    "punchcard": (q_punchcard, PUNCHCARD_SQL),
    "daily_movers": (q_daily_movers, DAILY_MOVERS_SQL),
    "debounce_events": (q_debounce_events, DEBOUNCE_EVENTS_SQL),
    "peak_concurrency": (q_peak_concurrency, PEAK_CONCURRENCY_SQL),
    "transition_latency": (q_transition_latency, TRANSITION_LATENCY_SQL),
    "tier_pick": (q_tier_pick, TIER_PICK_SQL),
    "vol_cluster": (q_vol_cluster, VOL_CLUSTER_SQL),
    "kanon_audit": (q_kanon_audit, KANON_AUDIT_SQL),
    "watermark_pick": (q_watermark_pick, WATERMARK_PICK_SQL),
    "quantize_compare": (q_quantize_compare, QUANTIZE_COMPARE_SQL),
    "bits_plan": (q_bits_plan, BITS_PLAN_SQL),
    "session_count_hist": (q_session_count_hist, SESSION_COUNT_HIST_SQL),
    "q6_revenue": (q_q6_revenue, Q6_REVENUE_SQL),
    "balance_vs_volume": (q_balance_vs_volume, BALANCE_VS_VOLUME_SQL),
    "supplier_hhi": (q_supplier_hhi, SUPPLIER_HHI_SQL),
    "user_lifespan_hist": (q_user_lifespan_hist, USER_LIFESPAN_HIST_SQL),
    "best_atom": (q_best_atom, BEST_ATOM_SQL),
    "type_mad": (q_type_mad, TYPE_MAD_SQL),
    "compress_bits_by_source": (
        q_compress_bits_by_source, COMPRESS_BITS_BY_SOURCE_SQL
    ),
    "coverage_curve": (q_coverage_curve, COVERAGE_CURVE_SQL),
    "anomaly_days": (q_anomaly_days, ANOMALY_DAYS_SQL),
    "profile_outliers": (q_profile_outliers, PROFILE_OUTLIERS_SQL),
    "repurchase_interval": (
        q_repurchase_interval, REPURCHASE_INTERVAL_SQL
    ),
    "discount_uplift": (q_discount_uplift, DISCOUNT_UPLIFT_SQL),
    "rank_code_bits": (q_rank_code_bits, RANK_CODE_BITS_SQL),
    "probe_align": (q_probe_align, PROBE_ALIGN_SQL),
    "lines_per_order_hist": (
        q_lines_per_order_hist, LINES_PER_ORDER_HIST_SQL
    ),
    "types_per_user_hist": (
        q_types_per_user_hist, TYPES_PER_USER_HIST_SQL
    ),
    "local_maxima": (q_local_maxima, LOCAL_MAXIMA_SQL),
    "seasonal_amplitude": (
        q_seasonal_amplitude, SEASONAL_AMPLITUDE_SQL
    ),
    "region_share_by_year": (
        q_region_share_by_year, REGION_SHARE_BY_YEAR_SQL
    ),
    "bigram_code_bits": (q_bigram_code_bits, BIGRAM_CODE_BITS_SQL),
    "gap_cluster": (q_gap_cluster, GAP_CLUSTER_SQL),
    "parts_per_supplier_hist": (
        q_parts_per_supplier_hist, PARTS_PER_SUPPLIER_HIST_SQL
    ),
    "arrival_dispersion": (
        q_arrival_dispersion, ARRIVAL_DISPERSION_SQL
    ),
    "revenue_concentration": (
        q_revenue_concentration, REVENUE_CONCENTRATION_SQL
    ),
    "round_bias": (q_round_bias, ROUND_BIAS_SQL),
    "fulfillment_bands": (q_fulfillment_bands, FULFILLMENT_BANDS_SQL),
    "max_quiet": (q_max_quiet, MAX_QUIET_SQL),
    "session_length_hist": (
        q_session_length_hist, SESSION_LENGTH_HIST_SQL
    ),
    "repeat_revenue_share": (
        q_repeat_revenue_share, REPEAT_REVENUE_SHARE_SQL
    ),
    "intersession_bands": (
        q_intersession_bands, INTERSESSION_BANDS_SQL
    ),
    "onboarding_effect": (q_onboarding_effect, ONBOARDING_EFFECT_SQL),
    "part_size_vs_qty": (q_part_size_vs_qty, PART_SIZE_VS_QTY_SQL),
    "overnight_sessions": (
        q_overnight_sessions, OVERNIGHT_SESSIONS_SQL
    ),
    "dup_events": (q_dup_events, DUP_EVENTS_SQL),
    "type_mix_drift": (q_type_mix_drift, TYPE_MIX_DRIFT_SQL),
    "delta_code_bits": (q_delta_code_bits, DELTA_CODE_BITS_SQL),
    "volume_rhythm": (q_volume_rhythm, VOLUME_RHYTHM_SQL),
    "lang_source_mix": (q_lang_source_mix, LANG_SOURCE_MIX_SQL),
    "order_value_delta": (q_order_value_delta, ORDER_VALUE_DELTA_SQL),
    "fav_type_dist": (q_fav_type_dist, FAV_TYPE_DIST_SQL),
    "backlog_peak": (q_backlog_peak, BACKLOG_PEAK_SQL),
}
