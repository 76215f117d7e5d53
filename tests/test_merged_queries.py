"""The consolidated driver queries must equal the composition of the
operators they merged — merging slots must never change semantics."""

SF = "/root/testdata/sf0.001"


def test_window_funcs_equals_three_window_ops(ray_session):
    from crawtext_ray.stages import relational as R

    merged = R.window_funcs_events(SF).to_pandas().sort_values(
        "event_id").reset_index(drop=True)
    run = R.window_running_events(SF).to_pandas()
    lag = R.window_lag_events(SF).to_pandas()
    sli = R.window_sliding_events(SF).to_pandas()
    joined = (
        run.merge(lag, on="event_id").merge(sli, on="event_id")
        .sort_values("event_id").reset_index(drop=True)
    )
    assert list(merged.columns) == [
        "event_id", "event_seq", "prev_event_id", "n_last_hour"
    ]
    assert merged.equals(joined[merged.columns])


def test_doc_stats_equals_word_counts_plus_quality_ints(ray_session):
    from crawtext_ray.stages import relational as R

    merged = R.doc_stats_docs(SF).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    wc = R.word_counts_docs(SF).to_pandas()
    qi = R.quality_ints_docs(SF).to_pandas()
    joined = (
        qi.merge(wc[["doc_id", "n_tokens"]], on="doc_id")
        .sort_values("doc_id").reset_index(drop=True)
    )
    assert merged.equals(joined[merged.columns])


def test_global_event_stats_has_exact_distinct_users(ray_session):
    import pyarrow.parquet as pq

    from crawtext_ray.stages import relational as R

    row = R.global_event_stats(SF).to_pandas().iloc[0]
    users = pq.read_table(f"{SF}/events.parquet", columns=["user_id"])
    assert row["n_distinct_users"] == users["user_id"].to_pandas().nunique()
    assert row["n_events"] == users.num_rows


def test_extract_reports_matches_individual_reports(ray_session):
    import __ray_entry__ as m

    df = m.queries()["extract_reports"](SF).to_pandas()
    assert set(df["kind"]) == {"lang", "status", "domain"}
    langs = df[df["kind"] == "lang"].set_index("key")["n_docs"].to_dict()
    # generator truth for pages_small (fixtures/gen_pages.py)
    assert langs == {"en": 536, "fr": 213, "de": 138, "es": 113}
    assert (df[df["kind"] == "domain"]["n_docs"] > 0).all()
    assert len(df[df["kind"] == "domain"]) == 10


def test_set_ops_equals_pair(ray_session):
    import __ray_entry__ as m
    from crawtext_ray.stages import relational as R

    df = m.queries()["set_ops_events"](SF).to_pandas()
    u = R.union_clicks_views(SF).to_pandas()["event_id"]
    i = R.users_click_and_purchase(SF).to_pandas()["user_id"]
    got_u = sorted(df[df["kind"] == "click_or_view_event"]["id"])
    got_i = sorted(df[df["kind"] == "click_and_purchase_user"]["id"])
    assert got_u == sorted(u)
    assert got_i == sorted(i)


def test_media_features_carries_frame_and_audio_digests(ray_session):
    """The merged multimodal row must pin the full frame/audio outputs:
    per-media counts match the standalone operators and the digests are
    sha256 over their ordered rows."""
    import hashlib

    import __ray_entry__ as m
    from crawtext_ray.stages.multimodal import audio_segments, sample_frames
    import pyarrow as pa
    import ray.data as rd

    df = m.queries()["media_features"](SF)
    assert {"n_frames", "frames_digest", "n_segments",
            "segments_digest"} <= set(df.columns)
    assert (df["n_frames"] >= 1).all() and (df["n_segments"] >= 1).all()
    assert df["frames_digest"].str.fullmatch("[0-9a-f]{64}").all()

    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"]).limit(5)

    def to_media(batch: pa.Table) -> pa.Table:
        return pa.table({
            "media_id": batch["doc_id"],
            "payload": pa.array(
                [(t or "").encode("ascii", "ignore")
                 for t in batch["text"].to_pylist()], pa.binary()),
        })

    media = docs.map_batches(to_media, batch_format="pyarrow")
    fr = sample_frames(media, every_n=10).to_pandas().sort_values(
        ["media_id", "frame_index"])
    for mid, grp in fr.groupby("media_id"):
        want = hashlib.sha256("".join(grp["frame_sha"]).encode()).hexdigest()
        row = df[df["media_id"] == mid].iloc[0]
        assert row["frames_digest"] == want
        assert row["n_frames"] == len(grp)


def test_bfs_crawl_query_matches_planted_truth(ray_session):
    """The full BFS chain reproduces the generator's graph-BFS truth
    (independent of the extraction pipeline)."""
    import pyarrow.parquet as pq

    import __ray_entry__ as m
    from fixtures.gen_linked import bfs_truth, node_url

    got = m.queries()["bfs_crawl_pages"](SF)
    got_set = {(r["url"], r["depth"]) for _, r in got.iterrows()}
    depth = bfs_truth([0], 2)
    want = {(node_url(i), d) for i, d in depth.items()}
    assert got_set == want
    truth_path = "/tmp/crawtext_ray_fixtures/truth_linked"
    tru = pq.read_table(truth_path).to_pylist()
    assert {(r["url"], r["depth"]) for r in tru} == want


def test_queries_contract_shape(ray_session):
    """Driver cap: exactly 50 entries, oracles are a subset, 47 oracled."""
    import __ray_entry__ as m

    q, o = m.queries(), m.oracle_sql()
    assert len(q) == 50
    assert set(o) <= set(q)
    assert len(o) == 47


def test_window_composite_overflow_fallback():
    """The composite-key searchsorted and the per-segment fallback must
    produce identical frames (the fallback fires when users x time-span
    would overflow int64). Kernel-level test: both paths run in-process
    on the same shard frame, no Ray."""
    import numpy as np
    import pandas as pd

    from crawtext_ray.stages.relational import (
        _asof_merge_frame,
        _window_funcs_frame,
    )

    rng = np.random.default_rng(5)
    n = 4000
    g = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 300, n),
        "ts": pd.to_datetime(
            1_700_000_000_000_000 + rng.integers(0, 10_000_000_000, n),
            unit="us"),
        "event_type": rng.choice(["click", "purchase", "view"], n),
    })
    for fn in (_asof_merge_frame, _window_funcs_frame):
        a = fn(g, use_composite=True).sort_values("event_id").reset_index(
            drop=True)
        b = fn(g, use_composite=False).sort_values("event_id").reset_index(
            drop=True)
        assert len(a) and a.equals(b), fn.__name__
    # degenerate shards hold too
    empty = g.iloc[:0]
    assert _asof_merge_frame(empty, use_composite=False).empty
    assert _window_funcs_frame(empty, use_composite=False).empty


def test_doc_reports_equals_quartet(ray_session):
    import __ray_entry__ as m
    from crawtext_ray.stages import relational as R

    df = m.queries()["doc_reports"](SF)
    lang = df[df["kind"] == "lang"].set_index("key")["n_docs"].to_dict()
    assert lang == R.report_lang_docs(SF).to_pandas().set_index(
        "lang")["n_docs"].to_dict()
    src = df[df["kind"] == "source"].set_index("key")["n_docs"].to_dict()
    assert src == R.report_source_docs(SF).to_pandas().set_index(
        "source")["n_docs"].to_dict()
    top = df[df["kind"] == "top_source"]
    want_top = R.top_sources(SF).to_pandas()
    assert list(top["key"]) == list(want_top["source"])
    assert list(top["n_docs"]) == list(want_top["n_docs"])
    dl = sorted(df[df["kind"] == "distinct_lang"]["key"])
    assert dl == sorted(R.distinct_langs(SF).to_pandas()["lang"])


def test_event_time_rollups_equals_pair(ray_session):
    import __ray_entry__ as m
    from crawtext_ray.stages import relational as R

    df = m.queries()["event_time_rollups"](SF)
    day = df[df["kind"] == "day"].set_index("day")["n_events"].to_dict()
    assert day == R.date_buckets_events(SF).to_pandas().set_index(
        "day")["n_events"].to_dict()
    td = df[df["kind"] == "type_day"]
    want = R.events_by_type_day(SF).to_pandas()
    a = td[["key", "day", "n_events"]].sort_values(
        ["key", "day"]).reset_index(drop=True)
    b = want.rename(columns={"event_type": "key"})[
        ["key", "day", "n_events"]].sort_values(
        ["key", "day"]).reset_index(drop=True)
    assert a.equals(b)
