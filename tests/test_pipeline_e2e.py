"""End-to-end flagship pipeline vs generator ground truth (SURVEY.md §5.2
layer 3): status/lang counts, dedup, lineage resume, idempotence."""

import collections
import shutil

import pytest


@pytest.fixture(scope="module")
def articles_df(ray_session, pages_small):
    from crawtext_ray.pipelines.flagship import build_articles

    arts = build_articles(pages_small, num_partitions=4, concurrency=2)
    return arts.to_pandas()


def test_row_counts_match_input(articles_df, truth_small):
    assert len(articles_df) == len(truth_small)


def test_status_vs_truth(articles_df, truth_small):
    merged = articles_df.merge(
        truth_small.drop_duplicates("url"), on="url", how="left"
    )
    checkable = merged[merged["expected_status"] != "any"]
    # duplicates share a url with their original; statuses still comparable
    mismatch = checkable[checkable["status"] != checkable["expected_status"]]
    assert len(mismatch) == 0, mismatch[["url", "status", "expected_status"]].head()


def test_lang_report_vs_truth(ray_session, pages_small, truth_small):
    from crawtext_ray.pipelines.flagship import build_articles
    from crawtext_ray.stages.report import report_lang

    arts = build_articles(pages_small, num_partitions=4, concurrency=2)
    got = {
        r["lang"]: r["n_docs"] for r in report_lang(arts).take_all()
    }
    exp = collections.Counter(truth_small["expected_lang"])
    # articles keep the input lang column (M8 honors it)
    assert got == dict(exp)


def test_extracted_text_nonempty_for_ok(articles_df):
    ok = articles_df[articles_df["status"] == "ok"]
    assert (ok["n_words"] > 0).all()
    assert (ok["extracted_text"].str.len() > 0).all()
    # X10 contract: no leading/trailing whitespace, LF-only paragraph joins
    assert not ok["extracted_text"].str.contains("\r").any()
    assert (ok["extracted_text"] == ok["extracted_text"].str.strip()).all()


def test_blocked_pages_blocked(articles_df, truth_small):
    blocked_urls = set(truth_small[truth_small["is_blocked"]]["url"])
    got = articles_df[articles_df["url"].isin(blocked_urls)]
    assert (got["status"] == "blocked").all()
    assert len(got) == len(blocked_urls.intersection(set(articles_df["url"])))


def test_dedup_first_by_ts(ray_session, pages_small, truth_small):
    import ray.data as rd

    from crawtext_ray.stages.dedup import first_by

    pages = rd.read_parquet(pages_small, columns=["url", "warc_ts"])
    deduped = first_by(pages, "url", "warc_ts").to_pandas()
    n_dups = int(truth_small["is_duplicate"].sum())
    assert len(deduped) == len(truth_small) - n_dups
    assert deduped["url"].is_unique


def test_idempotence_identical_bytes(ray_session, pages_small):
    """Permutation/idempotence property: two runs produce identical
    per-url extracted bytes."""
    from crawtext_ray.pipelines.flagship import build_articles

    a = (
        build_articles(pages_small, num_partitions=4, concurrency=2)
        .to_pandas()[["url", "content_sha256"]]
        .sort_values("url")
        .reset_index(drop=True)
    )
    b = (
        build_articles(pages_small, num_partitions=2, concurrency=2)
        .to_pandas()[["url", "content_sha256"]]
        .sort_values("url")
        .reset_index(drop=True)
    )
    # different partitioning, same bytes
    assert a.equals(b)
    # task-fused mode produces the same bytes as the actor-pool mode
    c = (
        build_articles(pages_small, num_partitions=2, concurrency="tasks")
        .to_pandas()[["url", "content_sha256"]]
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert a.equals(c)


def test_lineage_resume(ray_session, pages_small, tmp_path):
    from crawtext_ray.pipelines.flagship import run_extract_job
    from crawtext_ray.state.lineage import completed_partitions, read_lineage

    out = str(tmp_path / "out")
    s1 = run_extract_job(pages_small, out, num_partitions=4, concurrency=2)
    assert s1["partitions_written"] == 4
    assert s1["rows"] == 1000
    recs = read_lineage(out)
    assert all(r["checksum"] for r in recs)
    assert sum(r["row_count"] for r in recs) == 1000

    # simulate a failed partition: delete one data file + its sidecar
    import os

    os.remove(f"{out}/part-00002.parquet")
    os.remove(f"{out}/lineage-00002.json")
    assert completed_partitions(out) == {0, 1, 3}

    s2 = run_extract_job(pages_small, out, num_partitions=4, concurrency=2)
    assert s2["partitions_skipped"] == 3
    assert s2["partitions_written"] == 1
    # full output restored, checksum of the re-done partition unchanged
    recs2 = read_lineage(out)
    assert sum(r["row_count"] for r in recs2) == 1000
    assert recs2 == sorted(recs2, key=lambda r: r["partition_id"])
    c1 = {r["partition_id"]: r["checksum"] for r in recs}
    c2 = {r["partition_id"]: r["checksum"] for r in recs2}
    assert c1 == c2


def test_audit_flags_corrupt_and_missing_partitions(ray_session, pages_small, tmp_path):
    from crawtext_ray.audit import audit
    from crawtext_ray.pipelines.flagship import run_extract_job

    out = str(tmp_path / "out")
    run_extract_job(pages_small, out, num_partitions=4, concurrency=2)
    assert all(r["status"] == "ok" for r in audit(out))

    # truncate one data file mid-footer (unreadable), delete another
    import os

    with open(f"{out}/part-00001.parquet", "r+b") as f:
        f.truncate(17)
    os.remove(f"{out}/part-00003.parquet")
    res = {r["partition_id"]: r["status"] for r in audit(out)}
    assert res[1] == "unreadable_data_file"
    assert res[3] == "missing_data_file"
    assert res[0] == "ok" and res[2] == "ok"  # auditor kept going


def test_relevance_query_filters(ray_session, pages_small):
    from crawtext_ray.pipelines.flagship import build_articles

    arts = build_articles(
        pages_small,
        query_expression="market OR marché OR markt OR mercado",
        num_partitions=4,
        concurrency=2,
    ).to_pandas()
    ok = arts[arts["status"] == "ok"]
    rel = ok[ok["relevant"]]
    assert 0 < len(rel) < len(ok)
    # every relevant page indeed contains one of the terms as a token
    sample = rel.head(20)
    for _, row in sample.iterrows():
        text = (row["title"] + "\n" + row["extracted_text"]).lower()
        assert any(w in text for w in ("market", "marché", "markt", "mercado"))


def test_incremental_from_previous_output(ray_session, pages_small, tmp_path):
    """The cron-re-run model: a second run over the SAME dump pointed at
    the first run's output extracts (almost) nothing; pointing at an
    empty previous output extracts everything."""
    from crawtext_ray.pipelines.flagship import run_extract_job

    first = str(tmp_path / "first")
    s1 = run_extract_job(pages_small, first, num_partitions=4, concurrency=2)
    assert s1["rows"] == 1000

    second = str(tmp_path / "second")
    s2 = run_extract_job(pages_small, second, num_partitions=4,
                         concurrency=2, incremental_from=first)
    assert s2["rows"] == 0  # every url already extracted

    third = str(tmp_path / "third")
    empty_prev = str(tmp_path / "empty")
    import os

    os.makedirs(empty_prev)
    s3 = run_extract_job(pages_small, third, num_partitions=4,
                         concurrency=2, incremental_from=empty_prev)
    assert s3["rows"] == 1000


def test_extract_survives_null_rows(ray_session, tmp_path):
    """Real dumps carry nulls: html NULL, lang NULL, empty html — the
    stage must emit a row per input with a sane status, never crash."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from crawtext_ray.stages.extract_stage import extract_articles

    ts = datetime.datetime(2024, 1, 1)
    t = pa.table({
        "url": pa.array(["http://a.example/1", "http://a.example/2",
                         "http://a.example/3", None], pa.string()),
        "warc_ts": pa.array([ts] * 4, pa.timestamp("us")),
        "html": pa.array(
            [("<html><body><p>" +
              "This is a real paragraph with the usual function words "
              "that the content scorer wants to see in an article. " * 3 +
              "</p></body></html>").encode(),
             None, b"", b"<p>x</p>"], pa.binary()),
        "text": pa.array(["", "", "", ""], pa.string()),
        "lang": pa.array(["en", None, "en", "en"], pa.string()),
    })
    path = str(tmp_path / "pages")
    import os

    os.makedirs(path)
    pq.write_table(t, f"{path}/part-0.parquet")
    out = extract_articles(rd.read_parquet(path)).to_pandas()
    assert len(out) == 4
    assert set(out["status"]) <= {"ok", "empty", "parse_error", "blocked"}
    ok = out[out["url"] == "http://a.example/1"]
    assert ok["status"].iloc[0] == "ok"
    assert "real paragraph with the usual" in ok["extracted_text"].iloc[0]


def test_hash_shuffle_keyed_repartition_true_colocation(ray_session, pages_small):
    """Under HASH_SHUFFLE (the --hash-shuffle CLI path), keyed
    repartition truly co-locates keys AND the extraction output is
    unchanged; the DataContext is restored afterwards."""
    from ray.data.context import DataContext, ShuffleStrategy

    from crawtext_ray.pipelines.flagship import build_articles
    from crawtext_ray.stages.partitioning import use_hash_shuffle

    ctx = DataContext.get_current()
    prev = ctx.shuffle_strategy
    try:
        use_hash_shuffle()
        assert ctx.shuffle_strategy == ShuffleStrategy.HASH_SHUFFLE
        a = (
            build_articles(pages_small, num_partitions=4,
                           skew_break="repartition", concurrency="tasks")
            .to_pandas()[["url", "content_sha256"]]
            .sort_values("url").reset_index(drop=True)
        )
    finally:
        ctx.shuffle_strategy = prev
    b = (
        build_articles(pages_small, num_partitions=4, concurrency="tasks")
        .to_pandas()[["url", "content_sha256"]]
        .sort_values("url").reset_index(drop=True)
    )
    assert a.equals(b)


def test_keyed_repartition_mode_preserves_rows(ray_session, pages_small):
    """skew_break='repartition' (url-hash keyed pre-extract exchange)
    yields the same row set and bytes as the streaming default."""
    from crawtext_ray.pipelines.flagship import build_articles

    a = (
        build_articles(pages_small, num_partitions=4, skew_break="repartition",
                       concurrency="tasks")
        .to_pandas()[["url", "content_sha256"]]
        .sort_values("url").reset_index(drop=True)
    )
    b = (
        build_articles(pages_small, num_partitions=4, concurrency="tasks")
        .to_pandas()[["url", "content_sha256"]]
        .sort_values("url").reset_index(drop=True)
    )
    assert a.equals(b)


def test_hash_shuffle_sized_to_session(ray_session):
    """use_hash_shuffle must size the aggregator pool to the session's
    CPUs: with Ray's defaults (parallelism 200 → 64 aggregator actors)
    any groupby whose partition count is not pinned deadlocks on a
    small-CPU session inside the 300 s aggregator wait (regression:
    the --hash-shuffle extract job hung at 8 cpus)."""
    import pyarrow as pa
    import ray
    import ray.data as rd
    from ray.data.context import DataContext, ShuffleStrategy

    from crawtext_ray.stages.partitioning import use_hash_shuffle

    ctx = DataContext.get_current()
    prev = (ctx.shuffle_strategy, ctx.max_hash_shuffle_aggregators,
            ctx.default_hash_shuffle_parallelism)
    try:
        use_hash_shuffle()
        cpus = int(ray.cluster_resources()["CPU"])
        assert ctx.max_hash_shuffle_aggregators <= max(1, cpus // 2)
        ds = rd.range(2000).map_batches(
            lambda t: t.append_column(
                "k", pa.array([i % 5 for i in range(t.num_rows)])
            ),
            batch_format="pyarrow",
        )
        # un-pinned partition count: would use the 200-parallelism
        # default and hang without the sizing
        n = ds.groupby("k").map_groups(
            lambda g: g, batch_format="pyarrow"
        ).count()
        assert n == 2000
    finally:
        (ctx.shuffle_strategy, ctx.max_hash_shuffle_aggregators,
         ctx.default_hash_shuffle_parallelism) = prev


def test_first_by_sharded_equals_pandas_reference(ray_session):
    """The coarse-shard vectorized first_by (one arrow sort per shard)
    returns exactly the per-group pandas reference's rows, for integer
    AND string keys, with a unique tiebreak pinning the pick."""
    import numpy as np
    import ray.data as rd

    from crawtext_ray.stages.dedup import first_by, first_by_pandas

    rng = np.random.default_rng(7)
    n = 5000
    rows = {
        "user_id": rng.integers(0, 900, n),
        "ts": rng.integers(0, 50, n),          # many (key, ts) ties
        "event_id": rng.permutation(n),        # unique tiebreak
        "payload": rng.integers(0, 1000, n),
    }
    import pandas as pd

    df = pd.DataFrame(rows)
    df["skey"] = "u" + df["user_id"].astype(str)

    for key in ["user_id", "skey"]:
        ds = rd.from_pandas(df)
        got = (first_by(ds, key, "ts", "event_id", num_shards=16)
               .to_pandas().sort_values(key).reset_index(drop=True))
        exp = (first_by_pandas(rd.from_pandas(df), key, "ts", "event_id")
               .to_pandas().sort_values(key).reset_index(drop=True))
        assert got[["user_id", "ts", "event_id", "payload"]].equals(
            exp[["user_id", "ts", "event_id", "payload"]]), key
