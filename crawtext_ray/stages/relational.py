"""Relational / dataflow operators over the driver's testdata tables
(SURVEY.md §2.8–§2.9). Each function here backs a ``__ray_entry__``
queries() entry with a matching DuckDB oracle; outputs avoid raw floats
so value-hash comparisons are bit-stable across engines.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from .dedup import first_by


def _docs(sf_dir: str, columns=None):
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _events(sf_dir: str, columns=None):
    return rd.read_parquet(f"{sf_dir}/events.parquet", columns=columns)


# --- A1/A2 grouped counts -------------------------------------------------


def report_lang_docs(sf_dir: str):
    """A1: per-language doc counts (crawtext report analog)."""
    return _docs(sf_dir, ["lang"]).groupby("lang").aggregate(Count(alias_name="n_docs"))


def report_source_docs(sf_dir: str):
    """A2/A3: grouped counts on the source column."""
    return _docs(sf_dir, ["source"]).groupby("source").aggregate(
        Count(alias_name="n_docs")
    )


def top_sources(sf_dir: str, k: int = 5):
    """T1: top-k sources by count; deterministic tie-break on source."""
    agg = report_source_docs(sf_dir)
    return agg.sort(["n_docs", "source"], descending=[True, False]).limit(k)


def distinct_langs(sf_dir: str):
    """U2-adjacent: distinct values of one column."""
    vals = sorted(v for v in _docs(sf_dir, ["lang"]).unique("lang"))
    return pa.table({"lang": pa.array(vals, pa.string())})


# --- J2 dedup / filters ---------------------------------------------------


def dedup_events_first(sf_dir: str):
    """J2: first event per user (min ts, tie min event_id)."""
    ds = _events(sf_dir, ["user_id", "event_id", "ts", "event_type"])
    out = first_by(ds, "user_id", "ts", "event_id")
    return out.select_columns(["user_id", "event_id", "event_type"])


def filter_events(sf_dir: str, event_type: str = "click", min_value: float = 50.0):
    """M2-analog vectorized filter (arrow compute predicate)."""
    import pyarrow.compute as pc

    ds = _events(sf_dir, ["event_id", "event_type", "value"])
    return ds.map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.equal(t["event_type"], pa.scalar(event_type)),
                pc.greater_equal(t["value"], pa.scalar(min_value)),
            )
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).select_columns(["event_id"])


# --- scalar fns: counts, json, dates -------------------------------------


def word_counts_docs(sf_dir: str):
    """M9: whitespace word count + BPE-ish token count per doc. Arrow
    RE2 kernels end-to-end (differentially verified against Python re on
    the fixture corpus — counts identical)."""
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        col = batch["text"]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_words": pc.cast(
                    pc.count_substring_regex(col, pattern=r"\S+"), pa.int64()
                ),
                "n_tokens": pc.cast(
                    pc.count_substring_regex(
                        col, pattern=r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"
                    ),
                    pa.int64(),
                ),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def quality_ints_docs(sf_dir: str):
    """Quality-feature integers (ASCII contracts; see oracle): chars,
    words, punctuation marks, English-stopword hits. All Arrow kernels;
    the stopword count is split_pattern_regex → is_in → bincount (RE2
    has no lookarounds, so a boundary regex can't express it) —
    differentially verified against the Python-re path."""
    import pyarrow.compute as pc

    from ..extract.stopwords import stopword_set

    sw_arr = pa.array(sorted(stopword_set("en")))

    def fn(batch: pa.Table) -> pa.Table:
        col = batch["text"]
        low = pc.utf8_lower(col)
        toks = pc.split_pattern_regex(low, pattern="[^a-z0-9]+")
        arr = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        # null-slot-safe flatten/parent-index pairing (ADVICE r2: an
        # offsets diff counts a null slot's range while flatten skips it)
        hits = pc.is_in(pc.list_flatten(arr), value_set=sw_arr).to_numpy(
            zero_copy_only=False
        )
        row_idx = pc.list_parent_indices(arr).to_numpy(zero_copy_only=False)
        n_stop = np.bincount(
            row_idx, weights=hits, minlength=len(arr)
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_chars_calc": pc.cast(pc.utf8_length(col), pa.int64()),
                "n_words": pc.cast(
                    pc.count_substring_regex(col, pattern=r"\S+"), pa.int64()
                ),
                "n_punct": pc.cast(
                    pc.count_substring_regex(col, pattern=r"[^A-Za-z0-9_\s]"),
                    pa.int64(),
                ),
                "n_stop": pa.array(n_stop, pa.int64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def doc_stats_docs(sf_dir: str):
    """Per-doc scalar-function stats in ONE pass: the merged form of
    word_counts_docs + quality_ints_docs (same Arrow kernels, one scan
    instead of two — and one driver-gate query slot instead of two).
    Output (doc_id, n_chars_calc, n_words, n_tokens, n_punct, n_stop)."""
    import pyarrow.compute as pc

    from ..extract.stopwords import stopword_set

    sw_arr = pa.array(sorted(stopword_set("en")))

    def fn(batch: pa.Table) -> pa.Table:
        col = batch["text"]
        low = pc.utf8_lower(col)
        toks = pc.split_pattern_regex(low, pattern="[^a-z0-9]+")
        arr = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        hits = pc.is_in(pc.list_flatten(arr), value_set=sw_arr).to_numpy(
            zero_copy_only=False
        )
        row_idx = pc.list_parent_indices(arr).to_numpy(zero_copy_only=False)
        n_stop = np.bincount(
            row_idx, weights=hits, minlength=len(arr)
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_chars_calc": pc.cast(pc.utf8_length(col), pa.int64()),
                "n_words": pc.cast(
                    pc.count_substring_regex(col, pattern=r"\S+"), pa.int64()
                ),
                "n_tokens": pc.cast(
                    pc.count_substring_regex(
                        col, pattern=r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"
                    ),
                    pa.int64(),
                ),
                "n_punct": pc.cast(
                    pc.count_substring_regex(col, pattern=r"[^A-Za-z0-9_\s]"),
                    pa.int64(),
                ),
                "n_stop": pa.array(n_stop, pa.int64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def json_extract_events(sf_dir: str):
    """§2.9 json_extract over events.props."""

    def fn(batch: pa.Table) -> pa.Table:
        vals = []
        for p in batch["props"].to_pylist():
            try:
                v = json.loads(p).get("k")
                vals.append(int(v) if v is not None else None)
            except (ValueError, TypeError):
                vals.append(None)
        return pa.table({"event_id": batch["event_id"], "k_val": pa.array(vals, pa.int64())})

    return _events(sf_dir, ["event_id", "props"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def _bounded_partial_merge(ds, partial_fn, key_cols: list[str]):
    """Grouped counts for BOUNDED key domains: map-side partials (one row
    per key per block), merged on the driver — no all-to-all (the
    sort-shuffle Aggregate carries a fixed multi-second tail even for
    tiny key sets; see BASELINE.md note 5)."""
    import collections

    partials = ds.map_batches(partial_fn, batch_format="pandas").take_all()
    cnt: collections.Counter = collections.Counter()
    for r in partials:
        cnt[tuple(r[k] for k in key_cols)] += r["partial_n"]
    keys = sorted(cnt)
    cols = {k: [t[i] for t in keys] for i, k in enumerate(key_cols)}
    cols["n_events"] = [int(cnt[t]) for t in keys]
    return rd.from_arrow(pa.table(cols))


def date_buckets_events(sf_dir: str):
    """§2.9 date bucketing: events per day (~30 keys → partial counts per
    batch, driver merge)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        day = df["ts"].dt.strftime("%Y-%m-%d")
        return day.value_counts().rename_axis("day").reset_index(name="partial_n")

    return _bounded_partial_merge(_events(sf_dir, ["ts"]), partial, ["day"])


def window_hourly_events(sf_dir: str):
    """Streaming-shaped tumbling window: per (user, hour) event counts.
    Shape: ONE int-keyed groupby(user) + per-group pandas windowing —
    measured 5x faster than a two-key (user, hour-string) sort-shuffle
    aggregate (3.0s vs 16.5s on 100k events at 32 cpus), because the
    exchange keys are small ints and the window bucketing stays
    vectorized inside the group."""

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({
                "user_id": pd.Series([], dtype="int64"),
                "window_start": pd.Series([], dtype="object"),
                "n_events": pd.Series([], dtype="int64"),
            })
        ws = g["ts"].dt.floor("h").dt.strftime("%Y-%m-%d %H:00")
        out = (
            g.assign(window_start=ws)
            .groupby(["user_id", "window_start"], as_index=False)
            .size()
            .rename(columns={"size": "n_events"})
        )
        return out[["user_id", "window_start", "n_events"]]

    # coarse user shards (Python calls = shards, not user cardinality);
    # the per-shard bucket-count is one vectorized pandas groupby
    ds = _add_user_shard(_events(sf_dir, ["user_id", "ts"]))
    return ds.groupby("_shard").map_groups(per_shard, batch_format="pandas")


def user_event_stats(sf_dir: str):
    """A4-analog multi-aggregate per user (all integer outputs)."""
    return (
        _events(sf_dir, ["user_id", "event_id"])
        .groupby("user_id")
        .aggregate(
            Count(alias_name="n_events"),
            Min("event_id", alias_name="min_event_id"),
            Max("event_id", alias_name="max_event_id"),
        )
    )


# --- joins ----------------------------------------------------------------


def orders_by_segment_broadcast(sf_dir: str):
    """J3: broadcast small-side join (customer dim shipped once via
    ray.put, dict lookup per batch — no shuffle), then grouped count."""
    cust = (
        rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
        .to_pandas()
    )
    lookup_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_mktsegment"])))

    class Attach:
        def __init__(self):
            self.lookup = ray.get(lookup_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            segs = [self.lookup.get(k) for k in batch["o_custkey"].to_pylist()]
            t = pa.table({"c_mktsegment": pa.array(segs, pa.string())})
            # inner-join semantics: drop orders with no matching customer
            return t.filter(pa.compute.is_valid(t["c_mktsegment"]))

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
    from .fusion import map_stage

    ds = map_stage(ds, Attach)
    return ds.groupby("c_mktsegment").aggregate(Count(alias_name="n_orders"))


def orders_join_native(sf_dir: str, num_partitions: int = 8):
    """Large-side hash join via Dataset.join (Ray 2.49 native), grouped by
    (priority, segment). The broadcast variant above is the scale path for
    small dims; this exercises the shuffling join."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    )
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    joined = orders.join(
        cust,
        join_type="inner",
        num_partitions=num_partitions,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )
    return joined.groupby(["o_orderpriority", "c_mktsegment"]).aggregate(
        Count(alias_name="n")
    )


# --- lineitem (wide-table scan + pruned read) -----------------------------


def q1_counts_lineitem(sf_dir: str):
    """TPC-H Q1-shaped grouped aggregate with integer-stable outputs:
    grouped row counts + exact quantity sums (l_quantity is
    integer-valued in TPC-H)."""
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = (
            df.groupby(["l_returnflag", "l_linestatus"], as_index=False)
            .agg(sum_qty=("l_quantity", "sum"), count_order=("l_quantity", "size"))
        )
        g["sum_qty"] = g["sum_qty"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    # partial aggregate inside map_batches, then a tiny final groupby —
    # the pre-aggregation pattern that keeps the shuffle at O(keys)
    partials = ds.map_batches(partial, batch_format="pyarrow")
    from ray.data.aggregate import Sum

    return partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("count_order", alias_name="count_order"),
    )


def shipped_before(sf_dir: str, cutoff: str = "1996-01-01"):
    """Pruned + predicate-pushdown read: row-group filter at the scan."""
    import pyarrow.compute as pc

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_shipdate"],
        filter=(pc.field("l_shipdate") < pa.scalar(pd.Timestamp(cutoff))),
    )
    return ds.select_columns(["l_orderkey", "l_linenumber"])


# --- embeddings -----------------------------------------------------------


def parts_by_brand_nation(sf_dir: str):
    """TPC-H Q2-shape multi-join over the fact table: lineitem ⋈ part ⋈
    supplier ⋈ nation → (p_brand, n_name) counts + quantity sums. The
    three dimension tables are broadcast once (ray.put) and attached
    map-side while lineitem streams — the star-join pattern; the only
    exchange is the final bounded-key groupby."""
    import pyarrow.parquet as pq

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand"])
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    brand_of = dict(zip(part["p_partkey"].to_pylist(),
                        part["p_brand"].to_pylist()))
    nkey_of = dict(zip(supp["s_suppkey"].to_pylist(),
                       supp["s_nationkey"].to_pylist()))
    name_of = dict(zip(nation["n_nationkey"].to_pylist(),
                       nation["n_name"].to_pylist()))
    nation_of = {sk: name_of.get(nk) for sk, nk in nkey_of.items()}
    ref = ray.put((brand_of, nation_of))

    class Attach:
        def __init__(self):
            self.brand_of, self.nation_of = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            brands = [self.brand_of.get(k) for k in batch["l_partkey"].to_pylist()]
            nations = [self.nation_of.get(k) for k in batch["l_suppkey"].to_pylist()]
            t = pa.table({
                "p_brand": pa.array(brands, pa.string()),
                "n_name": pa.array(nations, pa.string()),
                "l_quantity": batch["l_quantity"],
            })
            # inner-join semantics: drop facts with no matching dim row
            import pyarrow.compute as pc

            return t.filter(pc.and_(pc.is_valid(t["p_brand"]),
                                    pc.is_valid(t["n_name"])))

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey", "l_quantity"])
    from .fusion import map_stage

    out = map_stage(ds, Attach).groupby(["p_brand", "n_name"]).aggregate(
        Count(alias_name="n_items"), Sum("l_quantity", alias_name="sum_qty")
    )
    return out.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("sum_qty"),
            "sum_qty",
            pa.compute.cast(t["sum_qty"], pa.int64()),
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )


# --- the user-keyed window family ------------------------------------------
#
# SCALE SHAPE (VERDICT r03 wrong #3): a groupby(user_id).map_groups pays
# one Python/pandas call per GROUP, and group count scales with user
# cardinality (measured ~10 s per 150k groups on this host). These ops
# instead group by a COARSE shard (user_id % num_shards — the same
# two-modes-by-threshold house pattern as the LSH bucket ops), sort each
# shard once by (user_id, ...) and compute every per-user window with
# SEGMENT-VECTORIZED numpy (boundary masks + cumsum bases + composite-key
# searchsorted): Python calls = num_shards, never user cardinality. The
# partitioning assumption is unchanged — all rows of one user co-locate
# (one shard instead of one group).

_WINDOW_SHARDS = 256


def _add_user_shard(ds, num_shards: int = _WINDOW_SHARDS,
                    key: str = "user_id"):
    def add(batch: pa.Table) -> pa.Table:
        u = batch[key].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "_shard", pa.array((u % num_shards).astype(np.int64), pa.int64())
        )

    return ds.map_batches(add, batch_format="pyarrow", zero_copy_batch=True)


def _segments(u: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """For a SORTED key column: (new-segment bool mask, per-row index of
    its segment's first row) — the primitives every segment-vectorized
    window op builds on."""
    n = len(u)
    new = np.empty(n, dtype=bool)
    new[0] = True
    np.not_equal(u[1:], u[:-1], out=new[1:])
    starts = np.flatnonzero(new)
    start_of_row = np.repeat(starts, np.diff(np.append(starts, n)))
    return new, start_of_row


def _composite_key(uidx: np.ndarray, off: np.ndarray) -> np.ndarray | None:
    """Monotonic int64 composite of (segment index, in-segment offset),
    making ONE searchsorted serve every segment at once. None when the
    product would overflow int64 (callers fall back to a per-segment
    loop — only reachable when users/shard x time-span exceeds ~2^62 µs,
    i.e. raise num_shards)."""
    span = int(off.max()) + 2 if len(off) else 2
    n_seg = int(uidx.max()) + 1 if len(uidx) else 1
    if n_seg * span >= (1 << 62):
        return None
    return uidx * np.int64(span) + off


def _ts_us(g: pd.DataFrame, col: str = "ts") -> np.ndarray:
    return g[col].to_numpy("datetime64[us]").astype(np.int64)


_ASOF_EMPTY = {
    "event_id": "int64",
    "click_event_id": "int64",
}


def _asof_merge_frame(g: pd.DataFrame,
                      use_composite: bool = True) -> pd.DataFrame:
    """One shard's as-of merge (module-level so both the composite-key
    path and the per-segment fallback are directly unit-testable;
    ``use_composite=False`` forces the fallback)."""
    empty = pd.DataFrame({c: pd.Series([], dtype=t)
                          for c, t in _ASOF_EMPTY.items()})
    if not len(g):
        return empty
    g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
    u = g["user_id"].to_numpy()
    ts = _ts_us(g)
    eid = g["event_id"].to_numpy()
    typ = g["event_type"].to_numpy()
    new_user = _segments(u)[0]
    uidx = np.cumsum(new_user) - 1
    off = ts - ts.min()
    C = _composite_key(uidx, off) if use_composite else None
    is_c = typ == "click"
    is_p = typ == "purchase"
    if not is_c.any() or not is_p.any():
        return empty
    if C is None:  # overflow fallback: per-user loop
        out_e, out_c = [], []
        for s in np.flatnonzero(new_user):
            e = s + np.searchsorted(u[s:], u[s], side="right")
            cts, cid = ts[s:e][is_c[s:e]], eid[s:e][is_c[s:e]]
            pts, pid = ts[s:e][is_p[s:e]], eid[s:e][is_p[s:e]]
            if not len(cts) or not len(pts):
                continue
            pos = np.searchsorted(cts, pts, side="right") - 1
            ok = pos >= 0
            out_e.extend(pid[ok])
            out_c.extend(cid[pos[ok]])
        return pd.DataFrame({
            "event_id": pd.Series(out_e, dtype="int64"),
            "click_event_id": pd.Series(out_c, dtype="int64"),
        })
    Cc, cu, cid = C[is_c], uidx[is_c], eid[is_c]
    pos = np.searchsorted(Cc, C[is_p], side="right") - 1
    ok = pos >= 0
    ok[ok] &= cu[pos[ok]] == uidx[is_p][ok]  # same-user guard
    if not ok.any():
        return empty
    return pd.DataFrame({
        "event_id": eid[is_p][ok],
        "click_event_id": cid[pos[ok]],
    })


def _window_funcs_frame(g: pd.DataFrame,
                        use_composite: bool = True) -> pd.DataFrame:
    """One shard's ROW_NUMBER + LAG + RANGE-count pass (module-level for
    direct unit tests of both the composite path and the fallback)."""
    hour_us = 3_600_000_000
    if not len(g):
        return pd.DataFrame({
            c: pd.Series([], dtype="int64")
            for c in ("event_id", "event_seq", "prev_event_id",
                      "n_last_hour")
        })
    g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
    u = g["user_id"].to_numpy()
    ts = _ts_us(g)
    eid = g["event_id"].to_numpy()
    n = len(u)
    new_user, start_of_row = _segments(u)
    event_seq = np.arange(n) - start_of_row + 1
    prev = np.empty(n, dtype=np.int64)
    prev[0] = -1
    prev[1:] = eid[:-1]
    prev[new_user] = -1
    uidx = np.cumsum(new_user) - 1
    off = ts - ts.min()
    C = _composite_key(uidx, off) if use_composite else None
    if C is None:  # overflow fallback: per-segment searchsorted
        n_last = np.empty(n, dtype=np.int64)
        starts = np.flatnonzero(new_user)
        for s, e in zip(starts, np.append(starts[1:], n)):
            seg = ts[s:e]
            lo = np.searchsorted(seg, seg - hour_us, side="left")
            hi = np.searchsorted(seg, seg, side="right")
            n_last[s:e] = hi - lo
    else:
        # (C - off) is the segment floor in composite space; clipping
        # the window start at it keeps the probe inside the segment
        qlo = (C - off) + np.maximum(off - hour_us, 0)
        lo = np.searchsorted(C, qlo, side="left")
        hi = np.searchsorted(C, C, side="right")
        n_last = (hi - lo).astype(np.int64)
    return pd.DataFrame({
        "event_id": eid,
        "event_seq": event_seq.astype("int64"),
        "prev_event_id": prev,
        "n_last_hour": n_last,
    })


def sessionize_events(sf_dir: str, gap_minutes: int = 30):
    """Gap-based sessionization (streaming-shaped windowed operator): per
    user, order events by (ts, event_id); a gap strictly greater than
    ``gap_minutes`` starts a new session. Output (event_id, session_seq)
    with session_seq 1-based per user. One keyed exchange on the user
    shard — the same partitioning key as every other per-user window op."""
    gap_us = gap_minutes * 60_000_000

    def sess(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({
                "event_id": pd.Series([], dtype="int64"),
                "session_seq": pd.Series([], dtype="int64"),
            })
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        u = g["user_id"].to_numpy()
        ts = _ts_us(g)
        new_user, start_of_row = _segments(u)
        new_sess = np.empty(len(u), dtype=bool)
        new_sess[0] = True
        np.greater(ts[1:] - ts[:-1], gap_us, out=new_sess[1:])
        new_sess |= new_user
        s = np.cumsum(new_sess)
        session_seq = s - s[start_of_row] + 1
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(),
            "session_seq": session_seq.astype("int64"),
        })

    ds = _add_user_shard(_events(sf_dir, ["event_id", "user_id", "ts"]))
    return ds.groupby("_shard").map_groups(sess, batch_format="pandas")


def top_events_per_user(sf_dir: str, k: int = 3):
    """Grouped top-k: each user's k highest-value events (ties broken by
    event_id asc), ranked 1..k — rank = row index minus segment start."""

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({
                "user_id": pd.Series([], dtype="int64"),
                "event_id": pd.Series([], dtype="int64"),
                "rank": pd.Series([], dtype="int64"),
            })
        g = g.sort_values(["user_id", "value", "event_id"],
                          ascending=[True, False, True], kind="stable")
        u = g["user_id"].to_numpy()
        _, start_of_row = _segments(u)
        rank = np.arange(len(u)) - start_of_row + 1
        keep = rank <= k
        return pd.DataFrame({
            "user_id": u[keep],
            "event_id": g["event_id"].to_numpy()[keep],
            "rank": rank[keep].astype("int64"),
        })

    ds = _add_user_shard(_events(sf_dir, ["user_id", "event_id", "value"]))
    return ds.groupby("_shard").map_groups(topk, batch_format="pandas")


def asof_click_before_purchase(sf_dir: str):
    """AS-OF JOIN (attribution shape): for every purchase event, the most
    recent click by the same user with click.ts <= purchase.ts (ties on
    ts broken by max event_id). Inner semantics: purchases with no prior
    click are dropped.

    Ray Data lacks a native as-of join; this is the canonical
    composition — co-partition both streams on the join key (one coarse
    groupby) and merge with ONE composite-key searchsorted across all
    users in the shard, relying ONLY on key co-location (the
    partitioning assumption: all rows of one user fit one shard — the
    standard event-log contract)."""

    ds = _events(sf_dir, ["event_id", "user_id", "ts", "event_type"])
    keep = ds.map_batches(
        lambda t: t.filter(
            pa.compute.is_in(t["event_type"],
                             value_set=pa.array(["click", "purchase"]))
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return _add_user_shard(keep).groupby("_shard").map_groups(
        _asof_merge_frame, batch_format="pandas"
    )


def sample_docs_deterministic(sf_dir: str, pct: int = 10,
                              method: str = "md5"):
    """T3 sampling, the reproducible form: keep a doc iff its id hash
    falls in the lowest ``pct``% of the range — a deterministic hash
    sample that every rerun selects identically. Use Ray-native
    ``ds.random_sample`` when statistical (non-reproducible) sampling is
    wanted.

    ``method="md5"`` (default): first byte of md5(str(doc_id)) — the
    ORACLE-EXACT mode (DuckDB reproduces it bit-for-bit), one md5 call
    per row. ``method="splitmix64"``: top 8 bits of the vectorized
    splitmix64 finalizer — the PRODUCTION mode for 10^12-row corpora
    (~70x faster, zero Python per row); integer ids only."""
    import numpy as np

    from .partitioning import md5_prefix_array, require_integer_ids, splitmix64

    cut = 256 * pct // 100

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        if method == "splitmix64":
            ids = require_integer_ids(
                batch["doc_id"].to_numpy(zero_copy_only=False), "sampling"
            )
            keep = (splitmix64(ids) >> np.uint64(56)).astype(np.int64) < cut
            return batch.filter(pa.array(keep))
        keep = md5_prefix_array(batch["doc_id"].to_pylist(), 1) < cut
        return batch.filter(pa.array(keep))

    return _docs(sf_dir, ["doc_id", "lang"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def read_query_vectors(path: str, n_queries: int, dtype=np.float64) -> dict:
    """Driver-side query-vector pick with ROW-GROUP PUSHDOWN: only row
    groups whose vec_id stats overlap [0, n_queries) are read — never the
    whole table."""
    import pyarrow.parquet as pq

    qt = pq.read_table(
        path,
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", n_queries)],
    )
    qdf = qt.to_pandas().sort_values("vec_id")
    return {
        "query_id": qdf["vec_id"].tolist(),
        "matrix": np.asarray(list(qdf["embedding"]), dtype=dtype),
    }


def embedding_topk_exact(sf_dir: str, k: int = 10, n_queries: int = 3):
    """Brute-force cosine top-k (float64 to match the DuckDB oracle);
    output (query_id, vec_id, rank) — ints only, ties broken by vec_id."""
    from .similarity import brute_force_topk

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    queries = read_query_vectors(f"{sf_dir}/embeddings.parquet", n_queries)
    out = brute_force_topk(emb, queries, k=k)
    return out.select_columns(["query_id", "vec_id", "rank"])


# --- window functions (running / sliding / lag) ---------------------------


def window_running_events(sf_dir: str):
    """Running window: per-user event sequence number ordered by
    (ts, event_id) — groupby(key).map_groups over the sorted group, the
    Ray Data form of ROW_NUMBER() OVER (PARTITION BY ... ORDER BY ...)."""

    def seq(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="stable").reset_index(drop=True)
        g["event_seq"] = g.index.to_numpy() + 1
        return g[["event_id", "event_seq"]]

    ds = _events(sf_dir, ["user_id", "event_id", "ts"])
    return ds.groupby("user_id").map_groups(seq, batch_format="pandas")


def window_lag_events(sf_dir: str):
    """LAG(): previous event id per user (ordered by ts, event_id);
    first event per user gets null."""

    def lag(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="stable")
        g["prev_event_id"] = g["event_id"].shift(1)
        out = g[["event_id", "prev_event_id"]].copy()
        # -1 sentinel instead of NULL: keeps the column pure int64 on both
        # engines (nullable ints come back as float64 from some drivers)
        out["prev_event_id"] = out["prev_event_id"].fillna(-1).astype("int64")
        return out

    ds = _events(sf_dir, ["user_id", "event_id", "ts"])
    return ds.groupby("user_id").map_groups(lag, batch_format="pandas")


def window_sliding_events(sf_dir: str):
    """Sliding event-time window: per event, how many events of the same
    user fell in (ts - 1 hour, ts] — RANGE INTERVAL window as per-group
    sorted two-pointer (vectorized searchsorted)."""

    def last_hour(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="stable").reset_index(drop=True)
        ts = g["ts"].to_numpy()
        # inclusive lower bound to match SQL RANGE ... 1 HOUR PRECEDING
        lo = np.searchsorted(ts, ts - np.timedelta64(3600, "s"), side="left")
        hi = np.searchsorted(ts, ts, side="right")
        g["n_last_hour"] = (hi - lo).astype("int64")
        return g[["event_id", "n_last_hour"]]

    ds = _events(sf_dir, ["user_id", "event_id", "ts"])
    return ds.groupby("user_id").map_groups(last_hour, batch_format="pandas")


def window_funcs_events(sf_dir: str):
    """ROW_NUMBER + LAG + RANGE-sliding-count in ONE grouped pass — the
    merged form of window_running/window_lag/window_sliding (they share
    the partition key and sort order, so three shuffles collapse into
    one; also one driver-gate query slot instead of three). Output
    (event_id, event_seq, prev_event_id, n_last_hour).

    Segment-vectorized over coarse user shards: row numbers from segment
    starts, lag from a shifted array with segment-start resets, and the
    RANGE window from ONE composite-key searchsorted covering every user
    in the shard (kernel: _window_funcs_frame) — no per-user Python."""
    ds = _add_user_shard(_events(sf_dir, ["user_id", "event_id", "ts"]))
    return ds.groupby("_shard").map_groups(
        _window_funcs_frame, batch_format="pandas"
    )


# --- sort / top-k over a fact table ---------------------------------------


def top_events_by_value(sf_dir: str, k: int = 100):
    """Global ORDER BY ... LIMIT k (distributed sort + tiny take):
    deterministic tie-break on event_id."""
    ds = _events(sf_dir, ["event_id", "value"])
    out = ds.sort(["value", "event_id"], descending=[True, False]).limit(k)
    return out.select_columns(["event_id"])


# --- multi-way broadcast star join ----------------------------------------


def customers_per_region(sf_dir: str):
    """Star-schema rollup: customer ⋈ nation ⋈ region with BOTH dims
    broadcast (they are tiny); the fact table streams. Output
    (r_name, n_name, n_customers)."""
    import pyarrow.parquet as pq

    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    region = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    n2r = dict(zip(nation["n_nationkey"], nation["n_regionkey"]))
    n2name = dict(zip(nation["n_nationkey"], nation["n_name"]))
    r2name = dict(zip(region["r_regionkey"], region["r_name"]))
    lookup_ref = ray.put((n2r, n2name, r2name))

    class Attach:
        def __init__(self):
            self.n2r, self.n2name, self.r2name = ray.get(lookup_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            nk = batch["c_nationkey"].to_pylist()
            rn = [self.r2name.get(self.n2r.get(k)) for k in nk]
            nn = [self.n2name.get(k) for k in nk]
            t = pa.table(
                {
                    "r_name": pa.array(rn, pa.string()),
                    "n_name": pa.array(nn, pa.string()),
                }
            )
            return t.filter(pa.compute.is_valid(t["r_name"]))

    ds = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_nationkey"])
    from .fusion import map_stage

    ds = map_stage(ds, Attach)
    return ds.groupby(["r_name", "n_name"]).aggregate(Count(alias_name="n_customers"))


def events_by_type_day(sf_dir: str):
    """Two-key grouped counts; (type, day) is bounded (~150 keys) →
    map-side partials, driver merge."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(day=df["ts"].dt.strftime("%Y-%m-%d"))
        return (
            df.groupby(["event_type", "day"], as_index=False)
            .size()
            .rename(columns={"size": "partial_n"})
        )

    return _bounded_partial_merge(
        _events(sf_dir, ["event_type", "ts"]), partial, ["event_type", "day"]
    )


def median_chars_by_lang(sf_dir: str):
    """Discrete median (quantile_disc 0.5) of n_chars per lang: per-group
    sorted pick matching DuckDB's lower-discrete definition."""
    import math

    def med(g: pd.DataFrame) -> pd.DataFrame:
        vals = sorted(g["n_chars"])
        idx = max(0, math.ceil(0.5 * len(vals)) - 1)
        return pd.DataFrame(
            {"lang": [g["lang"].iloc[0]], "median_chars": [int(vals[idx])]}
        )

    ds = _docs(sf_dir, ["lang", "n_chars"])
    return ds.groupby("lang").map_groups(med, batch_format="pandas")


# --- global aggregate / set operations ------------------------------------


def global_event_stats(sf_dir: str):
    """A4: whole-table aggregate without a groupby (single-row result),
    plus the exact COUNT(DISTINCT user_id) companion (keyed groupby →
    count of groups; absorbed here from its own query slot). Two pruned
    scans — the count/min/max pass needs no shuffle, the distinct pass
    shuffles (user_id) keys only."""
    from ray.data.aggregate import Count, Max, Min

    ds = _events(sf_dir, ["event_id"])
    row = ds.aggregate(
        Count(alias_name="n_events"),
        Min("event_id", alias_name="min_event_id"),
        Max("event_id", alias_name="max_event_id"),
    )
    users = _events(sf_dir, ["user_id"])
    row["n_distinct_users"] = (
        users.groupby("user_id").aggregate(Count(alias_name="n")).count()
    )
    return pa.table({k: [v] for k, v in row.items()})


def union_clicks_views(sf_dir: str):
    """U1: union of two filtered streams (disjoint predicates →
    UNION ALL semantics)."""
    import pyarrow.compute as pc

    def keep(event_type):
        def fn(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["event_type"], pa.scalar(event_type)))

        return fn

    ds = _events(sf_dir, ["event_id", "event_type"])
    clicks = ds.map_batches(keep("click"), batch_format="pyarrow", zero_copy_batch=True)
    views = ds.map_batches(keep("view"), batch_format="pyarrow", zero_copy_batch=True)
    return clicks.union(views).select_columns(["event_id"])


def users_click_and_purchase(sf_dir: str):
    """U2 INTERSECT: users appearing in BOTH event streams — union the
    flagged key sets, one keyed groupby keeps keys seen with both flags
    (the hash-partition intersect idiom; Ray has no native INTERSECT)."""
    import pyarrow.compute as pc

    ds = _events(sf_dir, ["user_id", "event_type"])

    def flag(event_type, val):
        def fn(t: pa.Table) -> pa.Table:
            f = t.filter(pc.equal(t["event_type"], pa.scalar(event_type)))
            return pa.table(
                {
                    "user_id": f["user_id"],
                    "flag": pa.array([val] * f.num_rows, pa.int64()),
                }
            )

        return fn

    a = ds.map_batches(flag("click", 1), batch_format="pyarrow", zero_copy_batch=True)
    b = ds.map_batches(flag("purchase", 2), batch_format="pyarrow", zero_copy_batch=True)

    # a key has both flags iff min == 1 and max == 2 — a hash AGGREGATE
    # instead of per-group Python (key cardinality = user cardinality;
    # the aggregate is ~fixed-cost while map_groups pays ~10s per 150k
    # groups on this host)
    from ray.data.aggregate import Max, Min

    agg = a.union(b).groupby("user_id").aggregate(
        Min("flag", alias_name="f_min"), Max("flag", alias_name="f_max")
    )

    def pick(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(t["f_min"], pa.scalar(1)),
                    pc.equal(t["f_max"], pa.scalar(2)))
        return pa.table({"user_id": t.filter(m)["user_id"]})

    return agg.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)
