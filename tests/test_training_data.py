"""Training-data curation pipeline (quality gate + dedup chain)."""


def test_curate_chain(ray_session, pages_small, tmp_path):
    from crawtext_ray.pipelines.training_data import curate

    out = str(tmp_path / "curated")
    curated = curate(pages_small, out_dir=out, num_partitions=4,
                     concurrency=2, min_words=10)
    df = curated.to_pandas()
    assert 0 < len(df) <= 1000
    assert (df["status"] == "ok").all()
    assert (df["n_words"] >= 10).all()
    # exact dups removed: content hashes unique
    assert df["content_sha256"].map(bytes).is_unique
    import os

    assert any(f.endswith(".parquet") for f in os.listdir(out))


def test_drop_exact_dups_fallback_matches_broadcast(ray_session, pages_small):
    """loser_broadcast_cap=0 forces the distributed full-row groupby;
    surviving urls must equal the broadcast loser-set path."""
    from crawtext_ray.pipelines.flagship import build_articles
    from crawtext_ray.pipelines.training_data import drop_exact_dups

    arts = build_articles(pages_small, num_partitions=4,
                          concurrency=2).materialize()
    a = set(drop_exact_dups(arts).to_pandas()["url"])
    b = set(drop_exact_dups(arts, loser_broadcast_cap=0).to_pandas()["url"])
    assert a == b and len(a) > 0


def test_seed_file_reader(ray_session, tmp_path):
    from crawtext_ray.sources import read_seed_file

    p = tmp_path / "seeds.txt"
    p.write_text("http://a.example/x\nhttp://b.example/y\n")
    ds = read_seed_file(str(p))
    rows = sorted(r["url"] for r in ds.take_all())
    assert rows == ["http://a.example/x", "http://b.example/y"]
    assert all(r["depth"] == 0 for r in ds.take_all())
