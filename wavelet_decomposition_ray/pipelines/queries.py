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

def q_haar_l1(sf_dir: str) -> "ray.data.Dataset":
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


def q_epn_quantiles(sf_dir: str) -> "ray.data.Dataset":
    def per_source(group: pa.Table) -> pa.Table:
        vals, _ = list_to_numpy(group["tokens"])
        v = np.sort(vals.astype(np.int64))
        n = len(v)
        sats, qs = [], []
        for s in SATISFACTIONS:
            k = int(np.ceil(s * n / 100.0)) - 1
            sats.append(s)
            qs.append(int(v[max(k, 0)]))
        return pa.table(
            {
                "source": pa.array([group["source"][0].as_py()] * len(sats)),
                "satisfaction": pa.array(sats, type=pa.int64()),
                "q": pa.array(qs, type=pa.int64()),
            }
        )

    return _seq_ds(sf_dir).groupby("source").map_groups(
        per_source, batch_format="pyarrow"
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

def q_events_rollup(sf_dir: str) -> "ray.data.Dataset":
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    )

    def per_user(g):
        g = g.sort_values(["ts", "event_id"])
        tok = np.rint(g["value"].to_numpy() * 100).astype(np.int64)
        r = oc.rollup_tier(tok, 4)
        import pandas as pd

        return pd.DataFrame(
            {
                "user_id": np.full(len(r["wmin"]), int(g["user_id"].iloc[0]),
                                   dtype=np.int64),
                "window_idx": np.arange(len(r["wmin"]), dtype=np.int64),
                "wmin": r["wmin"],
                "wmax": r["wmax"],
                "wsum": r["wsum"],
                "wcount": r["wcount"].astype(np.int32),
            }
        )

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")


EVENTS_ROLLUP_SQL = (
    "WITH seq AS (SELECT user_id,"
    " CAST(round(value * 100) AS BIGINT) AS tok,"
    " row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS pos"
    " FROM events)"
    " SELECT user_id, pos // 4 AS window_idx,"
    " min(tok) AS wmin, max(tok) AS wmax, sum(tok) AS wsum,"
    " CAST(count(*) AS INTEGER) AS wcount"
    " FROM seq GROUP BY user_id, window_idx"
)


# --------------------------------------------------------------------------
# Calendar-day rollup over lineitem (partial+final aggregate showcase)
# --------------------------------------------------------------------------

def q_daily_rollup(sf_dir: str) -> "ray.data.Dataset":
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

def _dwt_coeffs(sf_dir: str, bank: str) -> "ray.data.Dataset":
    ds = _seq_ds(sf_dir).map_batches(DwtTransform(bank, verify=False),
                                     batch_format="pyarrow", batch_size=256)
    return ds.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["doc_id"],
                "n_coeffs": pc.list_value_length(t["coeffs"]),
            }
        ),
        batch_format="pyarrow",
    )


def q_resample64(sf_dir: str) -> "ray.data.Dataset":
    return _seq_ds(sf_dir).map_batches(
        make_resample_batch(64), batch_format="pyarrow", batch_size=256
    )


def q_bandpass(sf_dir: str) -> "ray.data.Dataset":
    """Band-pass query path: reconstruct keeping only coarse scales
    (reference reconstruct() with a scale subset, tutorial cells 27/34)."""
    ds = _seq_ds(sf_dir).map_batches(
        DwtTransform("haar", verify=False), batch_format="pyarrow", batch_size=256
    )
    return ds.map_batches(
        InverseDwt("haar", keep_levels=[5, 6, 7], keep_offset=True),
        batch_format="pyarrow",
        batch_size=256,
    )


def q_gorilla_blocks(sf_dir: str) -> "ray.data.Dataset":
    """Encoded retention-store rows with achieved bits/point."""
    ds = _seq_ds(sf_dir).map_batches(TierRollup(10), batch_format="pyarrow",
                                     batch_size=256)
    return ds.map_batches(GorillaEncoder, batch_format="pyarrow",
                          batch_size=256, concurrency=2)


CORE_QUERIES = {
    "rollup_t1": (lambda sf: _rollup_long(sf, 1), _rollup_sql(1)),
    "rollup_t3": (lambda sf: _rollup_long(sf, 3), _rollup_sql(3)),
    "rollup_t6": (lambda sf: _rollup_long(sf, 6), _rollup_sql(6)),
    "source_stats": (q_source_stats, SOURCE_STATS_SQL),
    "haar_l1": (q_haar_l1, HAAR_L1_SQL),
    "roundtrip_haar": (lambda sf: _roundtrip(sf, "haar"), ROUNDTRIP_SQL),
    "roundtrip_db4": (lambda sf: _roundtrip(sf, "db4"), ROUNDTRIP_SQL),
    "aggtree_ok": (q_aggtree_ok, AGGTREE_SQL),
    "codec_ok": (q_codec_ok, CODEC_SQL),
    "epn_quantiles": (q_epn_quantiles, EPN_SQL),
    "events_rollup_w4": (q_events_rollup, EVENTS_ROLLUP_SQL),
    "daily_rollup": (q_daily_rollup, DAILY_ROLLUP_SQL),
    # rows-only (non-SQL-expressible; pytest-checked against the oracle)
    "dwt_haar": (lambda sf: _dwt_coeffs(sf, "haar"), None),
    "dwt_db4": (lambda sf: _dwt_coeffs(sf, "db4"), None),
    "resample64": (q_resample64, None),
    "bandpass_coarse": (q_bandpass, None),
    "gorilla_blocks": (q_gorilla_blocks, None),
}
