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
