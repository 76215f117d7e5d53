"""Dedup / similarity / multimodal / frontier operators on small planted
datasets (the training-data operator set)."""

import numpy as np
import pytest


@pytest.fixture()
def docs_with_dups(ray_session):
    import ray.data as rd

    base = (
        "the quick brown fox jumps over the lazy dog while the rain in "
        "spain stays mainly in the plain and the cat sat on the mat "
    ) * 3
    vocab = [f"w{j}" for j in range(400)]
    rng = np.random.default_rng(9)
    rows = []
    for i in range(20):
        words = rng.choice(vocab, size=60, replace=True)
        rows.append({"doc_id": i, "text": " ".join(words)})
    # planted near-dups: 100/101 near-identical, 102 exact copy of 100
    rows.append({"doc_id": 100, "text": base})
    rows.append({"doc_id": 101, "text": base.replace("lazy", "sleepy", 1)})
    rows.append({"doc_id": 102, "text": base})
    return rd.from_items(rows)


def test_exact_dedup(docs_with_dups):
    from crawtext_ray.stages.dedup import exact_dedup

    kept = exact_dedup(docs_with_dups).to_pandas()
    ids = set(kept["doc_id"])
    assert 100 in ids and 102 not in ids
    assert len(kept) == 22  # 23 rows - 1 exact dup


def test_minhash_lsh_finds_planted_pair(docs_with_dups):
    from crawtext_ray.stages.dedup import minhash_lsh_duplicates

    pairs = minhash_lsh_duplicates(docs_with_dups, shingle_k=3).to_pandas()
    linked = {(int(r["doc_id"]), int(r["rep_id"])) for _, r in pairs.iterrows()}
    assert (102, 100) in linked
    assert (101, 100) in linked


def test_jaccard_verify(ray_session, docs_with_dups):
    from crawtext_ray.stages.dedup import (
        minhash_lsh_duplicates,
        ngram_jaccard,
        verify_pairs_jaccard,
    )

    assert ngram_jaccard("a b c d e f", "a b c d e f", 3) == 1.0
    docs = {r["doc_id"]: r["text"] for r in docs_with_dups.take_all()}
    pairs = minhash_lsh_duplicates(docs_with_dups, shingle_k=3)
    verified = verify_pairs_jaccard(pairs, docs, k=3, threshold=0.8).to_pandas()
    vids = set(verified["doc_id"])
    assert 102 in vids and 101 in vids


def test_jaccard_verify_distributed_matches_broadcast(ray_session, docs_with_dups):
    """The broadcast-free routed verifier must agree with the broadcast
    dict verifier on pairs, reps, and jaccard values."""
    from crawtext_ray.stages.dedup import (
        minhash_lsh_duplicates,
        verify_pairs_jaccard,
        verify_pairs_jaccard_distributed,
    )

    docs = {r["doc_id"]: r["text"] for r in docs_with_dups.take_all()}
    pairs = minhash_lsh_duplicates(docs_with_dups, shingle_k=3).materialize()
    a = verify_pairs_jaccard(pairs, docs, k=3, threshold=0.8).to_pandas()
    b = verify_pairs_jaccard_distributed(
        pairs, docs_with_dups, k=3, threshold=0.8
    ).to_pandas()
    fa = {(int(r["doc_id"]), int(r["rep_id"]), round(r["jaccard"], 12))
          for _, r in a.iterrows()}
    fb = {(int(r["doc_id"]), int(r["rep_id"]), round(r["jaccard"], 12))
          for _, r in b.iterrows()}
    assert fa == fb and len(fa) >= 2
    # ... and under a forced Bloom participant filter (cap=0)
    c = verify_pairs_jaccard_distributed(
        pairs, docs_with_dups, k=3, threshold=0.8,
        participant_broadcast_cap=0,
    ).to_pandas()
    fc = {(int(r["doc_id"]), int(r["rep_id"]), round(r["jaccard"], 12))
          for _, r in c.iterrows()}
    assert fa == fc


def test_verifier_is_candidate_bounded(ray_session, docs_with_dups):
    """r2 verdict #3: the routed verifier must shingle only pair
    PARTICIPANTS — doc rows entering the exchanges ≈ |participants|,
    not |corpus| — in both semi-join modes (broadcast and Bloom)."""
    import ray.data as rd

    from crawtext_ray.stages.dedup import (
        minhash_lsh_duplicates,
        semi_join_on_ids,
    )

    pairs = minhash_lsh_duplicates(docs_with_dups, shingle_k=3).materialize()
    participants_left = {r["doc_id"] for r in pairs.take_all()}
    participants_right = {r["rep_id"] for r in pairs.take_all()}
    corpus_n = docs_with_dups.count()

    for cap in (2_000_000, 0):  # broadcast mode, then forced Bloom mode
        left = semi_join_on_ids(docs_with_dups, pairs, "doc_id", "doc_id",
                                broadcast_cap=cap)
        right = semi_join_on_ids(docs_with_dups, pairs, "doc_id", "rep_id",
                                 broadcast_cap=cap)
        left_ids = {r["doc_id"] for r in left.take_all()}
        right_ids = {r["doc_id"] for r in right.take_all()}
        # exact in broadcast mode; Bloom may keep a few extra (superset)
        assert participants_left <= left_ids
        assert participants_right <= right_ids
        assert len(left_ids) <= max(2 * len(participants_left), 8)
        assert len(right_ids) <= max(2 * len(participants_right), 8)
        assert len(left_ids) < corpus_n

    # empty candidate set → empty corpus subset, not a crash
    import pyarrow as pa

    empty_pairs = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "rep_id": pa.array([], pa.int64()),
    }))
    none = semi_join_on_ids(docs_with_dups, empty_pairs, "doc_id", "doc_id")
    assert none.count() == 0


def test_simhash_duplicates(docs_with_dups):
    from crawtext_ray.stages.dedup import simhash_duplicates

    pairs = simhash_duplicates(docs_with_dups).to_pandas()
    linked = {(int(r["doc_id"]), int(r["rep_id"])) for _, r in pairs.iterrows()}
    assert (102, 100) in linked  # identical text -> identical simhash


def test_batch_simhash_matches_scalar():
    from crawtext_ray.stages.dedup import _SimHash

    sh = _SimHash("text", "doc_id")
    texts = ["the quick brown fox", "", "a b c d e f g" * 50,
             "einzigartige wörter überall", "x"]
    batch = sh._batch_simhash(texts)
    for t, got in zip(texts, batch):
        assert int(got) == sh.simhash64(t)


def test_brute_force_topk_matches_numpy(ray_session):
    import ray.data as rd

    from crawtext_ray.stages.similarity import brute_force_topk

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((200, 16)).astype(np.float32)
    ds = rd.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(200)]
    )
    queries = {"query_id": [0, 1], "matrix": vecs[:2].astype(np.float64)}
    got = brute_force_topk(ds, queries, k=5).to_pandas()

    # numpy reference
    m = vecs.astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    for qid in (0, 1):
        sims = m @ m[qid]
        exp = np.argsort(-sims, kind="stable")[:5]
        sub = got[got["query_id"] == qid].sort_values("rank")
        assert list(sub["vec_id"]) == list(exp)
        assert list(sub["rank"]) == [1, 2, 3, 4, 5]
        assert sub.iloc[0]["vec_id"] == qid  # self is nearest


def test_lsh_topk_self_found(ray_session):
    import ray.data as rd

    from crawtext_ray.stages.similarity import lsh_bucket_topk

    rng = np.random.default_rng(4)
    vecs = rng.standard_normal((300, 16)).astype(np.float32)
    ds = rd.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(300)]
    )
    queries = {"query_id": [5], "matrix": vecs[5:6]}
    got = lsh_bucket_topk(ds, queries, dim=16, k=3).to_pandas()
    assert int(got.sort_values("rank").iloc[0]["vec_id"]) == 5


def test_to_matrix_sliced_arrays():
    """flatten() on a sliced list array returns the slice's values only —
    _to_matrix must not re-apply offsets (regression)."""
    import pyarrow as pa

    from crawtext_ray.stages.similarity import _to_matrix

    arr = pa.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0], [7.0, 8.0]],
                   pa.list_(pa.float32()))
    assert np.array_equal(
        _to_matrix(arr.slice(1, 2)),
        np.array([[3, 4], [5, 6]], dtype=np.float32),
    )
    assert np.array_equal(
        _to_matrix(arr), np.asarray(arr.to_pylist(), dtype=np.float32)
    )
    f = pa.FixedSizeListArray.from_arrays(
        pa.array([1.0, 2, 3, 4, 5, 6], pa.float32()), 2
    )
    assert np.array_equal(
        _to_matrix(f.slice(2, 1)), np.array([[5, 6]], dtype=np.float32)
    )


def test_topk_survives_empty_blocks(ray_session):
    # the lsh/ivf bucket filters can emit zero-row blocks; the scoring
    # stages must early-return instead of feeding a 1-D empty array to
    # the matmul (np.AxisError)
    import pyarrow as pa
    import ray.data as rd

    from crawtext_ray.stages.similarity import brute_force_topk, lsh_bucket_topk

    rng = np.random.default_rng(6)
    vecs = rng.standard_normal((40, 8)).astype(np.float32)
    items = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(40)]
    queries = {"query_id": [0], "matrix": vecs[:1].astype(np.float64)}

    # empty dataset with the right schema → every batch is zero rows
    empty = rd.from_arrow(
        pa.table({"vec_id": pa.array([], pa.int64()),
                  "embedding": pa.array([], pa.list_(pa.float32()))})
    )
    assert brute_force_topk(empty, queries, k=3).count() == 0

    # tiny blocks so the bucket filter leaves some blocks empty
    ds = rd.from_items(items, override_num_blocks=20)
    got = lsh_bucket_topk(ds, queries, dim=8, k=3).to_pandas()
    assert int(got.sort_values("rank").iloc[0]["vec_id"]) == 0


def test_embedding_dedup_finds_copies(ray_session):
    import ray.data as rd

    from crawtext_ray.stages.similarity import embedding_dedup

    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((50, 8)).astype(np.float32)
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(50)]
    rows.append({"vec_id": 200, "embedding": vecs[7].tolist()})  # exact copy
    got = embedding_dedup(rd.from_items(rows), dim=8, threshold=0.99).to_pandas()
    linked = {(int(r["vec_id"]), int(r["rep_id"])) for _, r in got.iterrows()}
    assert (200, 7) in linked


def test_embedding_dedup_canonical_chain(ray_session):
    """r2 verdict #7: a planted a≈b, b≈c, a̸≈c chain. The per-pair
    output links c to b; ``canonical=True`` pipes the pairs through
    connected_components, so BOTH b and c map to a (the cluster min)."""
    import ray.data as rd

    from crawtext_ray.stages.similarity import embedding_dedup

    dim = 8
    rng = np.random.default_rng(0)
    u = rng.standard_normal(dim)
    u /= np.linalg.norm(u)
    v = rng.standard_normal(dim)
    v -= (v @ u) * u
    v /= np.linalg.norm(v)

    def rot(deg):
        t = np.deg2rad(deg)
        return (np.cos(t) * u + np.sin(t) * v).astype(np.float32)

    # 1.5° apart pairwise: cos(a,b)=cos(b,c)≈0.99966 ≥ 0.999,
    # cos(a,c)≈0.99863 < 0.999 — a genuine transitive chain. All three
    # share one LSH bucket under the fixed seed (asserted via raw pairs).
    rows = [{"vec_id": 0, "embedding": rot(0).tolist()},
            {"vec_id": 1, "embedding": rot(1.5).tolist()},
            {"vec_id": 2, "embedding": rot(3.0).tolist()}]
    for i in range(3, 20):
        w = rng.standard_normal(dim)
        w /= np.linalg.norm(w)
        rows.append({"vec_id": i, "embedding": w.astype(np.float32).tolist()})
    ds = rd.from_items(rows)

    raw = embedding_dedup(ds, dim=dim, threshold=0.999).to_pandas()
    raw_links = {(int(r["vec_id"]), int(r["rep_id"])) for _, r in raw.iterrows()}
    assert raw_links == {(1, 0), (2, 1)}  # per-pair: c links to b, not a

    can = embedding_dedup(ds, dim=dim, threshold=0.999,
                          canonical=True).to_pandas()
    can_links = {(int(r["vec_id"]), int(r["rep_id"])) for _, r in can.iterrows()}
    assert can_links == {(1, 0), (2, 0)}  # transitive: both collapse to a


def test_embedding_dedup_skewed_bucket(ray_session):
    """A clone-heavy corpus puts every vector in ONE bucket — the chunked
    within-bucket matmul must bound memory and still link every clone to
    the min id."""
    import ray.data as rd

    from crawtext_ray.stages.similarity import embedding_dedup

    rng = np.random.default_rng(8)
    base = rng.standard_normal(8).astype(np.float32)
    rows = [{"vec_id": i, "embedding": (base + rng.standard_normal(8) * 1e-4)
             .tolist()} for i in range(60)]
    got = embedding_dedup(rd.from_items(rows), dim=8, threshold=0.99,
                          chunk_rows=7).to_pandas()
    assert len(got) == 59  # everyone but vec 0 links
    assert (got["rep_id"] == 0).all()
    assert sorted(got["vec_id"]) == list(range(1, 60))


def test_multimodal_fake_decode_and_stub(ray_session):
    import ray.data as rd

    from crawtext_ray.stages.multimodal import (
        DecodeImageFeatures,
        decode_image_features,
        sample_frames,
    )

    media = rd.from_items(
        [
            {"media_id": i, "payload": bytes([i]) * (1024 * (i + 1)), "mime": "image/fake"}
            for i in range(5)
        ]
    )
    feats = decode_image_features(media).to_pandas()
    assert len(feats) == 5
    assert (feats["n_bytes"] > 0).all()
    assert feats["sha256"].is_unique
    assert ((feats["width"] >= 64) & (feats["width"] < 256)).all()

    frames = sample_frames(media, every_n=2).to_pandas()
    assert (frames.groupby("media_id").size() > 0).all()

    with pytest.raises(NotImplementedError):
        DecodeImageFeatures(decode="real")(
            __import__("pyarrow").table({"media_id": [1], "payload": [b"x"]})
        )


def test_multimodal_resize_and_audio_stages(ray_session):
    import pytest
    import ray.data as rd

    from crawtext_ray.stages.multimodal import (
        AudioSegments,
        ResizeImages,
        audio_segments,
        resize_images,
    )

    media = rd.from_items(
        [{"media_id": i, "payload": bytes([i]) * (40_000 * (i + 1))}
         for i in range(4)]
    )
    rs = resize_images(media, max_side=128).to_pandas()
    assert len(rs) == 4
    assert (rs["out_width"] <= 128).all() and (rs["out_height"] <= 128).all()
    assert rs["resized_sha"].is_unique

    seg = audio_segments(media, window_ms=1000).to_pandas()
    # fake model: 1 ms per 16 bytes → media 0 = 2500 ms → 3 windows
    m0 = seg[seg["media_id"] == 0].sort_values("seg_index")
    assert list(m0["t_start_ms"]) == [0, 1000, 2000]
    assert list(m0["t_end_ms"]) == [1000, 2000, 2500]
    # real-decode stubs raise with the dependency note
    import pyarrow as pa

    b = pa.table({"media_id": pa.array([1], pa.int64()),
                  "payload": pa.array([b"x"], pa.binary())})
    with pytest.raises(NotImplementedError):
        ResizeImages(decode="real")(b)
    with pytest.raises(NotImplementedError):
        AudioSegments(decode="real")(b)


def test_bfs_crawl_rounds(ray_session, pages_small):
    import ray.data as rd

    from crawtext_ray.stages.frontier import bfs_crawl

    pages = rd.read_parquet(pages_small)
    seeds = [r["url"] for r in pages.take(3)]
    rounds, seen = bfs_crawl(pages, seeds, max_depth=1)
    assert 1 <= len(rounds) <= 2
    assert rounds[0].count() >= 1
    assert set(seeds).issubset(seen)


def test_bfs_crawl_distributed_matches_broadcast(ray_session, pages_small):
    """broadcast_cap=0 forces the Dataset-frontier mode (hash semi-join
    subset + keyed anti-join); per-depth article urls must match the
    driver-frontier mode."""
    import ray.data as rd

    from crawtext_ray.stages.frontier import bfs_crawl

    pages = rd.read_parquet(pages_small)
    seeds = [r["url"] for r in pages.take(3)]
    r_small, seen_small = bfs_crawl(pages, seeds, max_depth=1)
    r_big, seen_big = bfs_crawl(pages, seeds, max_depth=1, broadcast_cap=0)
    assert len(r_small) == len(r_big)
    for a, b in zip(r_small, r_big):
        assert sorted(x["url"] for x in a.select_columns(["url"]).take_all()) == \
               sorted(x["url"] for x in b.select_columns(["url"]).take_all())
    seen_big_set = {r["url"] for r in seen_big.iter_rows()}
    assert seen_big_set == set(seen_small)


def test_anti_join_broadcast(ray_session):
    import ray.data as rd

    from crawtext_ray.stages.frontier import anti_join_broadcast

    ds = rd.from_items([{"url": f"u{i}", "x": i} for i in range(10)])
    out = anti_join_broadcast(ds, {f"u{i}" for i in range(0, 10, 2)})
    rows = sorted(r["url"] for r in out.take_all())
    assert rows == [f"u{i}" for i in range(1, 10, 2)]
    # empty seen set = passthrough
    assert anti_join_broadcast(ds, set()).count() == 10


def test_anti_join_grouped(ray_session):
    import ray.data as rd

    from crawtext_ray.stages.frontier import anti_join_grouped

    new = rd.from_items([{"url": f"u{i}"} for i in range(10)])
    seen = rd.from_items([{"url": f"u{i}"} for i in range(0, 10, 2)])
    out = anti_join_grouped(new, seen)
    assert sorted(r["url"] for r in out.take_all()) == [f"u{i}" for i in range(1, 10, 2)]


def test_connected_components_transitive(ray_session):
    import ray.data as rd

    from crawtext_ray.stages.dedup import connected_components

    # chain: 5~3, 3~1 ; separate pair: 10~9
    pairs = rd.from_items(
        [
            {"doc_id": 5, "rep_id": 3},
            {"doc_id": 3, "rep_id": 1},
            {"doc_id": 10, "rep_id": 9},
        ]
    )
    out = {r["doc_id"]: r["cluster_id"] for r in connected_components(pairs).take_all()}
    assert out[5] == 1 and out[3] == 1 and out[1] == 1
    assert out[10] == 9 and out[9] == 9


def test_connected_components_distributed_matches_driver(ray_session):
    """driver_cap=0 forces the keyed label-propagation path; labels must
    equal the driver pointer-jumping path on a chain + a separate pair
    + a star."""
    import ray.data as rd

    from crawtext_ray.stages.dedup import connected_components

    edges = [
        {"doc_id": 5, "rep_id": 3},
        {"doc_id": 3, "rep_id": 1},
        {"doc_id": 10, "rep_id": 9},
        {"doc_id": 21, "rep_id": 20},
        {"doc_id": 22, "rep_id": 20},
        {"doc_id": 23, "rep_id": 22},
    ]
    pairs = rd.from_items(edges)
    drv = {r["doc_id"]: r["cluster_id"]
           for r in connected_components(pairs).take_all()}
    dist = {r["doc_id"]: r["cluster_id"]
            for r in connected_components(
                rd.from_items(edges), driver_cap=0).take_all()}
    assert drv == dist
    assert dist[5] == dist[3] == dist[1] == 1
    assert dist[23] == dist[22] == dist[21] == dist[20] == 20


def test_minhash_many_dups_no_driver_merge(ray_session):
    """A corpus where the candidate-pair set is a large fraction of rows
    (every doc in a clone family) completes and links every clone to the
    family min — the pair merge is a keyed groupby, not a driver list."""
    import ray.data as rd

    from crawtext_ray.stages.dedup import minhash_lsh_duplicates

    fams = 10
    rows = []
    for f in range(fams):
        base = " ".join(f"tok{f}x{j} common words here" for j in range(40))
        for c in range(12):  # 12 clones per family
            rows.append({"doc_id": f * 100 + c, "text": base})
    pairs = minhash_lsh_duplicates(
        rd.from_items(rows), shingle_k=3).to_pandas()
    # every non-min clone links to its family min, exactly once
    assert len(pairs) == fams * 11
    for _, r in pairs.iterrows():
        assert int(r["rep_id"]) == (int(r["doc_id"]) // 100) * 100


def test_minhash_fallback_matches_broadcast(ray_session, docs_with_dups):
    """dup_bucket_broadcast_cap=0 forces the keyed coarse-partition path;
    pairs must equal the broadcast path."""
    from crawtext_ray.stages.dedup import minhash_lsh_duplicates

    a = minhash_lsh_duplicates(docs_with_dups, shingle_k=3).to_pandas()
    b = minhash_lsh_duplicates(
        docs_with_dups, shingle_k=3, dup_bucket_broadcast_cap=0
    ).to_pandas()
    pa_ = {(int(r["doc_id"]), int(r["rep_id"])) for _, r in a.iterrows()}
    pb_ = {(int(r["doc_id"]), int(r["rep_id"])) for _, r in b.iterrows()}
    assert pa_ == pb_ and len(a) == len(b)
    assert (102, 100) in pa_


def test_sampling_native_and_deterministic(ray_session):
    """T3: Ray-native random_sample bounds + the reproducible hash-sample
    operator (same rows on every run)."""
    import ray.data as rd

    from crawtext_ray.stages.relational import sample_docs_deterministic

    ds = rd.range(10_000)
    n = ds.random_sample(0.1, seed=7).count()
    assert 700 <= n <= 1300  # ~10% with slack

    a = sample_docs_deterministic("/root/testdata/sf0.001").to_pandas()
    b = sample_docs_deterministic("/root/testdata/sf0.001").to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])
    assert 0 < len(a) < 500


def test_minhash_string_ids_both_modes(ray_session):
    """url-keyed minhash (the curation shape) must find planted dups in
    both the broadcast and the keyed fallback mode."""
    import ray.data as rd

    from crawtext_ray.stages.dedup import minhash_lsh_duplicates

    base = "the quick brown fox jumps over the lazy dog near the mat " * 4
    rows = [{"url": f"http://x/{i}",
             "text": f"doc {i} " + " ".join(f"t{i}x{j}" for j in range(50))}
            for i in range(30)]
    rows += [{"url": "http://x/dupA", "text": base},
             {"url": "http://x/dupB", "text": base}]
    a = minhash_lsh_duplicates(rd.from_items(rows), text_col="text",
                               id_col="url", shingle_k=3).to_pandas()
    b = minhash_lsh_duplicates(rd.from_items(rows), text_col="text",
                               id_col="url", shingle_k=3,
                               dup_bucket_broadcast_cap=0).to_pandas()
    pa_ = sorted(map(tuple, a[["url", "rep_id"]].values.tolist()))
    pb_ = sorted(map(tuple, b[["url", "rep_id"]].values.tolist()))
    assert pa_ == pb_ == [("http://x/dupB", "http://x/dupA")]


def test_build_bloom_distributed(ray_session):
    import ray.data as rd

    from crawtext_ray.state.bloom import build_bloom

    keys = [f"http://ex.com/{i}" for i in range(2000)]
    ds = rd.from_items([{"url": k} for k in keys], override_num_blocks=8)
    bf = build_bloom(ds, "url", capacity=2000, fp_rate=1e-4)
    assert all(k in bf for k in keys)  # no false negatives, across blocks
    misses = sum(f"http://other.com/{i}" in bf for i in range(2000))
    assert misses <= 5


def test_hll_distributed_build_matches_serial(ray_session):
    """The per-block max-merged HLL must equal a serial build over the
    same keys (register-exact), and estimate within ~3% of truth."""
    import ray.data as rd

    from crawtext_ray.state.hll import HyperLogLog, build_hll

    keys = [f"user-{i % 700}" for i in range(5000)]  # dups collapse
    ds = rd.from_items([{"user_id": k} for k in keys],
                       override_num_blocks=8)
    dist = build_hll(ds, "user_id", p=12)
    ser = HyperLogLog(12)
    ser.update(keys)
    assert np.array_equal(dist.registers, ser.registers)
    assert abs(dist.estimate() - 700) / 700 < 0.03


def test_bloom_incremental_recrawl(ray_session, pages_small):
    """Batch-incremental re-crawl (SURVEY.md §2.10): second run skips
    already-extracted urls via a Bloom anti-join."""
    import ray.data as rd

    from crawtext_ray.state.bloom import BloomFilter, bloom_anti_join

    pages = rd.read_parquet(pages_small, columns=["url", "warc_ts"])
    first_half = {r["url"] for r in pages.take(500)}
    bf = BloomFilter(capacity=len(first_half))
    bf.update(first_half)
    remaining = bloom_anti_join(pages, bf).to_pandas()
    assert len(remaining) <= 1000 - len(first_half) + 500 * 0.01
    assert not (set(remaining["url"]) & first_half)


def test_ivf_topk_self_found_and_recall(ray_session):
    import ray.data as rd

    from crawtext_ray.stages.similarity import (
        brute_force_topk,
        ivf_topk,
        train_ivf_centroids,
    )

    rng = np.random.default_rng(6)
    vecs = rng.standard_normal((400, 16)).astype(np.float32)
    ds = rd.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(400)]
    )
    cents = train_ivf_centroids(vecs[:200], n_clusters=8)
    queries = {"query_id": [3, 7], "matrix": vecs[[3, 7]]}
    approx = ivf_topk(ds, queries, cents, k=5, nprobe=3).to_pandas()
    exact = brute_force_topk(ds, queries, k=5).to_pandas()
    for qid in (3, 7):
        a = set(approx[approx["query_id"] == qid]["vec_id"])
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        assert qid in a  # self always retrieved (its own cluster is probed)
        assert len(a & e) >= 2  # reasonable recall at nprobe=3/8


def test_minhash_verified_equals_brute_truth(ray_session, docs_with_dups):
    """minhash_verified_duplicates = LSH candidates ∩ exact Jaccard ≥ t.
    On a corpus where every true pair is far above the threshold (the
    planted regime), LSH recall is total and the verified output must
    EQUAL the brute-force O(n²) truth — pairs and jaccard values both.
    This exactness is what licenses the brute SQL as its driver oracle."""
    from crawtext_ray.stages.dedup import (
        jaccard_dups_brute,
        minhash_verified_duplicates,
    )

    truth = jaccard_dups_brute(docs_with_dups, k=3, threshold=0.5).to_pandas()
    got = minhash_verified_duplicates(
        docs_with_dups, shingle_k=3, threshold=0.5
    ).to_pandas()
    ft = {(int(r["doc_id_a"]), int(r["doc_id_b"]), r["jaccard"])
          for _, r in truth.iterrows()}
    fg = {(int(r["doc_id_a"]), int(r["doc_id_b"]), r["jaccard"])
          for _, r in got.iterrows()}
    assert ft == fg
    assert (100, 102, 1.0) in fg  # exact copy pair
    assert any(a == 100 and b == 101 and 0.8 < j < 1.0 for a, b, j in fg)


def test_simhash_verified_finds_planted_pairs(ray_session, docs_with_dups):
    """simhash_verified = simhash band candidates ∩ exact Jaccard ≥ t;
    output is a subset of the brute truth and contains the planted
    exact-copy pair (identical simhash ⇒ candidate in every band)."""
    from crawtext_ray.stages.dedup import (
        jaccard_dups_brute,
        simhash_verified_duplicates,
    )

    truth = jaccard_dups_brute(docs_with_dups, k=3, threshold=0.8).to_pandas()
    got = simhash_verified_duplicates(
        docs_with_dups, shingle_k=3, threshold=0.8
    ).to_pandas()
    ft = {(int(r["doc_id_a"]), int(r["doc_id_b"]), r["jaccard"])
          for _, r in truth.iterrows()}
    fg = {(int(r["doc_id_a"]), int(r["doc_id_b"]), r["jaccard"])
          for _, r in got.iterrows()}
    assert fg <= ft
    assert (100, 102, 1.0) in fg


def test_candidate_pairs_no_dups_and_empty_ok(ray_session):
    """banded_lsh_candidate_pairs emits each colliding pair once even
    when it collides in several bands; disjoint corpora emit nothing and
    the verified op returns an empty, correctly-typed frame."""
    import ray.data as rd

    from crawtext_ray.stages.dedup import minhash_verified_duplicates

    distinct = rd.from_items(
        [{"doc_id": i, "text": " ".join(f"u{i}x{j}" for j in range(40))}
         for i in range(8)]
    )
    out = minhash_verified_duplicates(distinct, shingle_k=3)
    # Ray's to_pandas() drops columns on ANY empty dataset; the Dataset
    # schema is the stable contract (query wrappers pandas-fix it up)
    assert out.schema().names == ["doc_id_a", "doc_id_b", "jaccard"]
    assert out.count() == 0


def test_minhash_verified_string_ids(ray_session):
    """The verifier chain is id-type-generic: string doc ids survive end
    to end (the empty schema and the norm casts used to hardcode int64,
    crashing on string corpora)."""
    import ray.data as rd

    from crawtext_ray.stages.dedup import minhash_verified_duplicates

    base = (
        "the quick brown fox jumps over the lazy dog while the rain in "
        "spain stays mainly in the plain and the cat sat on the mat "
    ) * 3
    rows = [
        {"doc_id": f"doc-{i:03d}",
         "text": " ".join(f"u{i}x{j}" for j in range(60))}
        for i in range(8)
    ]
    rows.append({"doc_id": "dup-a", "text": base})
    rows.append({"doc_id": "dup-b", "text": base})
    ds = rd.from_items(rows)
    out = minhash_verified_duplicates(ds, shingle_k=3, threshold=0.5)
    assert out.schema().names == ["doc_id_a", "doc_id_b", "jaccard"]
    df = out.to_pandas()
    pairs = {(r["doc_id_a"], r["doc_id_b"], r["jaccard"])
             for _, r in df.iterrows()}
    assert ("dup-a", "dup-b", 1.0) in pairs
    # and the all-distinct prefix contributes nothing
    assert len(pairs) == 1


def test_dedup_paragraphs_planted(ray_session):
    """Paragraph dedup keeps exactly the first occurrence corpus-wide
    (and within a doc), leaves unique + short paragraphs alone."""
    import ray.data as rd

    from crawtext_ray.stages.dedup import dedup_paragraphs

    footer = "copyright example site all rights reserved"
    docs = rd.from_items([
        {"doc_id": 1, "text": f"alpha body one\n\n{footer}"},
        {"doc_id": 2, "text": f"{footer}\n\nbeta body two"},
        {"doc_id": 3, "text": f"gamma\n\ngamma\n\nx"},   # in-doc repeat
        {"doc_id": 4, "text": f"{footer}"},              # only the dup
        {"doc_id": 5, "text": ""},
    ])
    out = {r["doc_id"]: r["clean_text"]
           for r in dedup_paragraphs(docs, min_chars=2).take_all()}
    assert out[1] == f"alpha body one\n\n{footer}"  # first occurrence kept
    assert out[2] == "beta body two"
    assert out[3] == "gamma\n\nx"
    assert out[4] == ""
    assert out[5] == ""
    # min_chars: short paragraphs ("x") are never dedup-eligible
    docs2 = rd.from_items([
        {"doc_id": 1, "text": "x\n\nx"},
    ])
    out2 = dedup_paragraphs(docs2, min_chars=2).take_all()[0]["clean_text"]
    assert out2 == "x\n\nx"


def test_dedup_paragraphs_vs_duckdb(ray_session):
    """Hash-free text-keyed SQL oracle over the documents corpus with
    PLANTED shared paragraphs (a global footer on every 3rd doc, five
    promo variants by doc_id%5): winner = min (doc_id, idx) per
    paragraph text — also witnesses md5-collision-freeness here."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from crawtext_ray.stages.dedup import dedup_paragraphs

    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])

    def plant(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        out = []
        for d, x in zip(ids, texts):
            paras = [x or ""]
            if d % 3 == 0:
                paras.append("global footer boilerplate")
            paras.append(f"promo block variant {d % 5}")
            out.append("\n\n".join(paras))
        return pa.table({"doc_id": t["doc_id"],
                         "text": pa.array(out, pa.string())})

    lined = docs.map_batches(plant, batch_format="pyarrow",
                             zero_copy_batch=True)
    got = {r["doc_id"]: r["clean_text"]
           for r in dedup_paragraphs(lined, min_chars=1).take_all()}
    sql = """
    WITH base AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0
                  THEN text || chr(10) || chr(10)
                       || 'global footer boilerplate'
                  ELSE text END
             || chr(10) || chr(10)
             || 'promo block variant ' || CAST(doc_id % 5 AS VARCHAR)
             AS text
      FROM read_parquet('/root/testdata/sf0.001/documents.parquet')),
    t AS (SELECT doc_id, string_split(text, chr(10) || chr(10)) AS paras
          FROM base),
    p AS (
      SELECT doc_id, i AS idx, paras[i] AS para
      FROM t, UNNEST(generate_series(1, len(paras))) AS u(i)),
    win AS (
      SELECT para, min(doc_id * 1048576 + idx) AS w
      FROM p WHERE length(para) >= 1 GROUP BY para HAVING count(*) >= 2),
    kept AS (
      SELECT p.doc_id, p.idx, p.para FROM p LEFT JOIN win
        ON win.para = p.para AND length(p.para) >= 1
      WHERE win.para IS NULL OR p.doc_id * 1048576 + p.idx = win.w)
    SELECT t.doc_id,
           COALESCE((SELECT string_agg(k.para, chr(10) || chr(10)
                                       ORDER BY k.idx)
                     FROM kept k WHERE k.doc_id = t.doc_id), '') AS clean_text
    FROM t
    """
    exp = {r[0]: r[1] for r in duckdb.connect().execute(sql).fetchall()}
    assert set(got) == set(exp)
    diffs = [d for d in got if got[d] != exp[d]]
    assert not diffs, diffs[:3]
    # the planted boilerplate was actually deduplicated: exactly one doc
    # keeps the footer and exactly five keep a promo block
    n_footer = sum("global footer boilerplate" in v for v in got.values())
    n_promo = sum("promo block variant" in v for v in got.values())
    assert n_footer == 1 and n_promo == 5


def test_dedup_paragraphs_bloom_mode_equals_broadcast(ray_session):
    """Forcing broadcast_cap=0 switches to the two-Bloom above-cap mode;
    with adequately sized filters the output equals the exact broadcast
    mode on a corpus with heavy planted duplication."""
    import ray.data as rd

    from crawtext_ray.stages.dedup import dedup_paragraphs

    footer = "shared footer paragraph with several words"
    rows = []
    for i in range(60):
        paras = [f"unique body paragraph number {i}"]
        if i % 2 == 0:
            paras.append(footer)
        paras.append(f"promo variant {i % 7}")
        rows.append({"doc_id": i, "text": "\n\n".join(paras)})
    ds = rd.from_items(rows)
    exact = {r["doc_id"]: r["clean_text"]
             for r in dedup_paragraphs(ds, min_chars=2).take_all()}
    bloom = {r["doc_id"]: r["clean_text"]
             for r in dedup_paragraphs(ds, min_chars=2, broadcast_cap=0,
                                       fp_rate=1e-9).take_all()}
    assert bloom == exact
    assert sum(footer in v for v in exact.values()) == 1


def test_lsh_multiprobe_improves_recall(ray_session):
    """Multi-probe LSH (Hamming-radius bucket expansion): radius 2
    strictly expands the probed candidate set over the classic single
    probe, so its results contain the single-probe results and recall
    vs exact brute top-k is monotonically non-decreasing — and on a
    clustered corpus the neighbors a sign flip hid are recovered."""
    import ray.data as rd

    from crawtext_ray.stages.similarity import (
        _probe_buckets,
        brute_force_topk,
        lsh_bucket_topk,
    )

    # probe-set algebra: radius 0 ⊂ radius 1 ⊂ radius 2; sizes 1/9/37
    assert _probe_buckets(5, 8, 0) == [5]
    p1, p2 = _probe_buckets(5, 8, 1), _probe_buckets(5, 8, 2)
    assert set(p1) < set(p2) and len(p1) == 9 and len(set(p2)) == 37
    assert all(bin(5 ^ b).count("1") <= 2 for b in p2)

    rng = np.random.default_rng(3)
    # clustered corpus: 40 centers × 10 jittered members — near
    # neighbors genuinely exist (unlike isotropic noise)
    centers = rng.standard_normal((40, 16)).astype(np.float32)
    vecs = np.repeat(centers, 10, axis=0) + 0.15 * rng.standard_normal(
        (400, 16)).astype(np.float32)
    ds = rd.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(400)]
    )
    queries = {"query_id": [0, 105, 333], "matrix": vecs[[0, 105, 333]]}
    exact = brute_force_topk(ds, queries, k=10).to_pandas()

    recalls = {}
    results = {}
    for mp in (0, 2):
        df = lsh_bucket_topk(ds, queries, dim=16, k=10,
                             multiprobe=mp).to_pandas()
        results[mp] = df
        total = 0.0
        for qid in queries["query_id"]:
            e = set(exact[exact["query_id"] == qid]["vec_id"])
            a = set(df[df["query_id"] == qid]["vec_id"])
            assert qid in a  # self-retrieval holds at any radius
            total += len(a & e) / len(e)
        recalls[mp] = total / 3
    assert recalls[2] >= recalls[0]
    assert recalls[2] >= 0.5  # clustered neighbors are actually found
    # the expanded probe set can only ADD candidates: every single-probe
    # hit survives (ties in the final top-k keep the same deterministic
    # (cosine desc, vec_id asc) order)
    for qid in queries["query_id"]:
        strong = results[2][results[2]["query_id"] == qid]
        assert set(strong["vec_id"]) >= set(
            results[0][(results[0]["query_id"] == qid)
                       & (results[0]["cosine"] >=
                          strong["cosine"].min())]["vec_id"])
