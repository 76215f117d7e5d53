"""Deduplication operators.

Crawl-side (SURVEY.md §2.8):
- J2 exact page dedup by key: keep the first row per key (min order
  column, deterministic tie-break) — crawtext: database.py unique-url
  results index analog.
- J1 frontier anti-join: drop urls already seen — crawtext: worker.py
  queue de-dup analog.

Training-data-side (scale ops beyond the reference):
- exact content dedup (hash-partition + per-group first)
- MinHash + LSH near-dup (shingle → minhash → band → bucket groupby)
- SimHash near-dup (64-bit, hamming-banded)
- n-gram Jaccard verification of candidate pairs

All shuffles are keyed groupbys; per-batch sketching is vectorized and
the groupby only ever sees (key, id) rows — never full text — so the
exchange volume is O(rows), not O(bytes).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

# ---------------------------------------------------------------- J2 ----


def first_by(ds, key: str, order_col: str, tiebreak: str | None = None,
             num_shards: int = 256):
    """J2: keep exactly one row per ``key`` — the minimal ``order_col``,
    ties broken by ``tiebreak`` (pass a unique tiebreak for a fully
    deterministic pick; keys must be non-null).

    Scale shape: ``groupby(key).map_groups`` pays one Python call per
    GROUP — at key cardinality that is the corpus size (~10 s per 150k
    groups measured). Instead group by a COARSE shard of the key
    (Python calls = ``num_shards``) and take each key-run's first row
    after ONE vectorized arrow sort inside the shard — the same
    segment pattern as the window family (relational.py). Skewed keys
    cost nothing extra: a hot KEY is still one run inside one shard's
    single sort. ``first_by_pandas`` below is the per-group reference
    kept as the equivalence baseline (tests force both paths)."""
    import pyarrow.compute as pc

    from .partitioning import md5_prefix_array

    sort_keys = [(key, "ascending"), (order_col, "ascending")] + (
        [(tiebreak, "ascending")] if tiebreak else []
    )

    def add_shard(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("_fb_shard", pa.array([], pa.int64()))
        col = batch[key]
        if pa.types.is_integer(col.type):
            shard = (col.to_numpy(zero_copy_only=False).astype(np.int64)
                     % num_shards)
        else:  # strings / binary: batched md5 prefix (driver-independent)
            shard = (md5_prefix_array(col.to_pylist(), 8)
                     % np.uint64(num_shards)).astype(np.int64)
        return batch.append_column("_fb_shard", pa.array(shard, pa.int64()))

    def pick_firsts(g: pa.Table) -> pa.Table:
        g = g.sort_by(sort_keys)
        if g.num_rows <= 1:
            return g.drop_columns(["_fb_shard"])
        k = g[key].combine_chunks()
        first = np.ones(g.num_rows, dtype=bool)
        first[1:] = pc.not_equal(
            k.slice(1), k.slice(0, g.num_rows - 1)
        ).to_numpy(zero_copy_only=False)
        return g.filter(pa.array(first)).drop_columns(["_fb_shard"])

    hashed = ds.map_batches(add_shard, batch_format="pyarrow",
                            zero_copy_batch=True)
    return hashed.groupby("_fb_shard").map_groups(
        pick_firsts, batch_format="pyarrow"
    )


def first_by_pandas(ds, key: str, order_col: str,
                    tiebreak: str | None = None):
    """Per-group reference form of :func:`first_by` (one pandas call per
    key) — equivalence baseline only, never on a driver path."""
    sort_cols = [order_col] + ([tiebreak] if tiebreak else [])

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(sort_cols, kind="stable").head(1)

    return ds.groupby(key).map_groups(pick, batch_format="pandas")


def drop_seen(ds, seen_keys, key: str = "url"):
    """J1 anti-join: ``seen_keys`` is a broadcast small side (python set /
    ray.ObjectRef of one). At cluster scale pass an ObjectRef so the set
    ships once per worker, not per batch. The filter itself is a
    vectorized ``pc.is_in`` against a value-set array built once per
    worker."""
    import ray

    ref = seen_keys if isinstance(seen_keys, ray.ObjectRef) else ray.put(set(seen_keys))

    class AntiJoin:
        def __init__(self):
            import pyarrow.compute as pc

            self.pc = pc
            self.value_set = pa.array(sorted(ray.get(ref)))

        def __call__(self, batch: pa.Table) -> pa.Table:
            if len(self.value_set) == 0:
                return batch
            return batch.filter(
                self.pc.invert(
                    self.pc.is_in(batch[key], value_set=self.value_set)
                )
            )

    from .fusion import map_stage

    return map_stage(ds, AntiJoin)


# ------------------------------------------------- exact content dedup ----


def _sha_column(batch: pa.Table, text_col: str) -> pa.Table:
    hs = [
        hashlib.sha256((t or "").encode("utf-8")).hexdigest()
        for t in batch[text_col].to_pylist()
    ]
    return batch.append_column("content_hash", pa.array(hs, pa.string()))


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Exact content dedup: content-hash per batch (vectorized pass), then
    hash-partition groupby keeping the smallest id per hash. Only
    (hash, id) crosses the shuffle."""
    hashed = ds.map_batches(
        _sha_column, batch_format="pyarrow", zero_copy_batch=True,
        fn_kwargs={"text_col": text_col},
    ).select_columns(["content_hash", id_col])

    # keep-the-smallest-id is a Min AGGREGATE, not a per-group Python
    # pass: groupby().map_groups pays a Python call per GROUP (~10 s per
    # 150k groups measured) and with mostly-unique content the group
    # count ≈ the corpus size; the hash aggregate is a fixed ~2.5 s at
    # the same scale. Output identical: min(id) == stable-sort head(1).
    from ray.data.aggregate import Min

    agg = hashed.groupby("content_hash").aggregate(Min(id_col))
    return agg.map_batches(
        lambda t: t.select([f"min({id_col})"]).rename_columns([id_col]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# ----------------------------------------------------- minhash + LSH ----

_TOKEN_RE = re.compile(r"[a-z0-9]+")

# token -> stable 64-bit hash, cached per process (vocab is tiny relative
# to corpus; turns per-shingle md5 into one md5 per unique token)
_TOKEN_HASH_CACHE: dict[str, int] = {}
_SHINGLE_BASE = np.uint64(1_000_003)


_TOKEN_HASH_CACHE_CAP = 4_000_000  # ~0.5 GB worst case per worker


def _token_hash(tok: str) -> int:
    h = _TOKEN_HASH_CACHE.get(tok)
    if h is None:
        # bound the per-worker cache: corpus vocabulary grows with corpus
        # size, and an uncapped dict would bloat long-lived workers at
        # 10^12-doc scale; the hash is pure, so a reset only costs
        # recomputation (zipfian vocab keeps the hit rate high anyway)
        if len(_TOKEN_HASH_CACHE) >= _TOKEN_HASH_CACHE_CAP:
            _TOKEN_HASH_CACHE.clear()
        h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
        _TOKEN_HASH_CACHE[tok] = h
    return h


def _shingle_array(text: str, k: int) -> np.ndarray:
    """Deterministic uint64 k-gram shingle hashes, vectorized: cached
    per-token hashes combined with a polynomial rolling scheme (uint64
    wraparound). Replaces per-shingle md5 (measured ~10x faster)."""
    toks = _TOKEN_RE.findall(text.lower())
    if not toks:
        return np.empty(0, dtype=np.uint64)
    th = np.fromiter((_token_hash(t) for t in toks), dtype=np.uint64, count=len(toks))
    if len(toks) < k:
        acc = np.uint64(0)
        with np.errstate(over="ignore"):
            for v in th:
                acc = acc * _SHINGLE_BASE + v
        return np.array([acc], dtype=np.uint64)
    n = len(toks) - k + 1
    acc = np.zeros(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):
            acc = acc * _SHINGLE_BASE + th[j : j + n]
    return np.unique(acc)


def _shingles(text: str, k: int) -> set[int]:
    return set(int(x) for x in _shingle_array(text, k))


class MinHasher:
    """Stateful per-actor minhash signatures: the permutation parameters
    are drawn once per actor from a fixed seed (deterministic across the
    fleet)."""

    MERSENNE = (1 << 61) - 1

    def __init__(self, num_perm: int = 128, shingle_k: int = 5, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, self.MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, self.MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        vals = _shingle_array(text, self.k)
        if vals.size == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        # (a*x + b) with uint64 wraparound — a universal-enough permutation
        # family, fully vectorized (shingles × permutations)
        with np.errstate(over="ignore"):
            prod = vals[None, :] * self.a[:, None] + self.b[:, None]
        return prod.min(axis=1)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer: avalanches a uint64 array in place of a
    cryptographic digest (the band key only needs collision resistance
    at ~2^-64, not preimage resistance)."""
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


class _MinHashBands:
    """Batch-vectorized minhash banding: one (permutations × shingles)
    product per shingle-chunk with per-doc mins via minimum.reduceat,
    then integer band keys via a polynomial fold + splitmix64 — no
    per-doc permutation matmul, no per-band md5 (measured ~10x on the
    sf0.1 documents table vs the per-doc loop)."""

    # cap the transient (num_perm × shingles) product at ~64 MB for 128
    # permutations; docs beyond the cap are processed alone
    CHUNK_SHINGLES = 1 << 16

    def __init__(self, num_perm: int, bands: int, shingle_k: int,
                 text_col: str, id_col: str):
        assert num_perm % bands == 0
        self.mh = MinHasher(num_perm, shingle_k)
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.text_col = text_col
        self.id_col = id_col

    def _signatures(self, texts: list) -> np.ndarray:
        n = len(texts)
        sigs = np.full((n, self.mh.num_perm), np.iinfo(np.uint64).max,
                       dtype=np.uint64)
        arrs = [_shingle_array(t or "", self.mh.k) for t in texts]
        i = 0
        while i < n:
            j, tot = i, 0
            while j < n and (j == i or tot + arrs[j].size <= self.CHUNK_SHINGLES):
                tot += arrs[j].size
                j += 1
            chunk = [a for a in arrs[i:j] if a.size]
            if chunk:
                idx = [p for p in range(i, j) if arrs[p].size]
                vals = np.concatenate(chunk)
                counts = np.array([a.size for a in chunk], dtype=np.int64)
                offs = np.concatenate(([0], np.cumsum(counts)[:-1]))
                # composed in a preallocated buffer: the broadcast
                # expression form allocates two (num_perm, chunk) uint64
                # temporaries (~34 MB each at the chunk cap) per chunk —
                # measured 5x slower and pure memory-bandwidth waste,
                # which is the binding resource at full-node concurrency
                prod = np.empty((self.mh.num_perm, vals.size), np.uint64)
                with np.errstate(over="ignore"):
                    np.multiply(vals[None, :], self.mh.a[:, None], out=prod)
                    np.add(prod, self.mh.b[:, None], out=prod)
                sigs[idx] = np.minimum.reduceat(prod, offs, axis=1).T
            i = j
        return sigs

    def band_keys(self, texts: list) -> np.ndarray:
        """(n_docs, bands) int64 band keys; the band index is folded into
        the key so buckets never merge across bands."""
        n = len(texts)
        sigs = self._signatures(texts)
        seg = sigs.reshape(n, self.bands, self.rows_per_band)
        with np.errstate(over="ignore"):
            key = np.arange(self.bands, dtype=np.uint64) * np.uint64(
                0x9E3779B97F4A7C15
            )
            key = np.broadcast_to(key, (n, self.bands)).copy()
            for r in range(self.rows_per_band):
                key = key * np.uint64(0x100000001B3) + seg[:, :, r]
        return _mix64(key).view(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        """One row per DOC: (id, band_keys fixed_size_list<int64, bands>).
        The list layout keeps each doc's buckets in one row, so the
        pair-emission pass is exact without any per-id re-aggregation."""
        n = batch.num_rows
        id_arr = batch[self.id_col].combine_chunks()
        if n == 0:
            return pa.table({
                self.id_col: id_arr,
                "band_keys": pa.array(
                    [], pa.list_(pa.int64(), self.bands)
                ),
            })
        key = self.band_keys(batch[self.text_col].to_pylist())
        return pa.table(
            {
                self.id_col: id_arr,
                "band_keys": pa.FixedSizeListArray.from_arrays(
                    pa.array(key.reshape(-1), pa.int64()), self.bands
                ),
            }
        )


def minhash_lsh_duplicates(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 5,
    concurrency=(1, 8),
    dup_bucket_broadcast_cap: int = 5_000_000,
):
    """MinHash+LSH near-dup. Returns one (id, rep_id) row per candidate
    near-duplicate, rep_id = the min id sharing any LSH band bucket.

    Shape: one vectorized signature pass emits (id, band_keys
    list<int64>) — one row per DOC — which is materialized and consumed
    twice: (a) a lazy explode feeds ONE hash aggregate (Min(id), Count)
    per bucket to find duplicate buckets (the only keyed exchange, and
    it carries two int64 columns); (b) a per-doc pair-emission map looks
    its buckets up in the dup-bucket map and takes the min rep across
    bands IN-ROW — exact with no per-id re-aggregation, because the list
    layout keeps all of a doc's buckets in one row.

    The dup-bucket map (only buckets with ≥2 members — the same
    cardinality class as the pair output itself) is broadcast when it
    fits ``dup_bucket_broadcast_cap``; above the cap the stage falls
    back to a fully keyed coarse-partition groupby (no broadcast, no
    driver state) — the 10^12-doc path."""
    from .fusion import map_stage

    banded = map_stage(
        ds,
        lambda: _MinHashBands(num_perm=num_perm, bands=bands,
                              shingle_k=shingle_k, text_col=text_col,
                              id_col=id_col),
        concurrency=concurrency if isinstance(concurrency, int) else "tasks",
    ).materialize()  # (id, band_keys): both passes below consume it
    return banded_lsh_pairs(banded, bands, id_col, dup_bucket_broadcast_cap)


def banded_lsh_pairs(banded, bands: int, id_col: str,
                     dup_bucket_broadcast_cap: int = 5_000_000):
    """Shared LSH pair machinery over a materialized (id, band_keys
    fixed_size_list<int64, bands>) dataset — used by both the minhash and
    simhash paths. One hash aggregate finds duplicate buckets; pair
    emission is an in-row broadcast lookup under the cap, a keyed
    coarse-partition groupby above it (see minhash_lsh_duplicates)."""
    import ray
    from ray.data.aggregate import Count, Min

    from .fusion import map_stage

    def explode(t: pa.Table) -> pa.Table:
        n = t.num_rows
        flat = t["band_keys"].combine_chunks().flatten()
        ids = t[id_col].combine_chunks().take(
            pa.array(np.repeat(np.arange(n, dtype=np.int64), bands))
        )
        return pa.table({id_col: ids, "bk": flat})

    exploded = banded.map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    )
    agg = exploded.groupby("bk").aggregate(
        Min(id_col, alias_name="rep_id"), Count(alias_name="n")
    )
    dup_buckets = agg.map_batches(
        lambda t: t.filter(
            pa.compute.greater_equal(t["n"], pa.scalar(2))
        ).select(["bk", "rep_id"]),
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()

    if dup_buckets.count() <= dup_bucket_broadcast_cap:
        # sorted-key arrays for vectorized searchsorted lookups; collect
        # per BATCH (a per-row iter_rows loop at the 5M cap measured as
        # the driver hot spot)
        bk_chunks, rep_chunks = [], []
        for b in dup_buckets.iter_batches(batch_format="pyarrow"):
            if b.num_rows:
                bk_chunks.append(
                    b["bk"].to_numpy(zero_copy_only=False).astype(np.int64)
                )
                rep_col = b["rep_id"]
                rep_chunks.append(
                    rep_col.to_numpy(zero_copy_only=False)
                    if pa.types.is_integer(rep_col.type)
                    else np.asarray(rep_col.to_pylist(), dtype=object)
                )
        bks = (
            np.concatenate(bk_chunks) if bk_chunks else np.empty(0, np.int64)
        )
        reps = (
            np.concatenate(rep_chunks)
            if rep_chunks
            else np.empty(0, dtype=object)
        )
        order = np.argsort(bks, kind="stable")
        ref = ray.put((bks[order], reps[order]))

        class EmitPairs:
            def __init__(self):
                self.bks, self.reps = ray.get(ref)
                self.int_ids = all(
                    isinstance(r, (int, np.integer)) for r in self.reps[:64]
                )

            def __call__(self, t: pa.Table) -> pa.Table:
                id_type = t.schema.field(id_col).type
                empty = pa.table({
                    id_col: pa.array([], id_type),
                    "rep_id": pa.array([], id_type),
                })
                n = t.num_rows
                if n == 0 or self.bks.size == 0:
                    return empty
                keys = np.asarray(
                    t["band_keys"].combine_chunks().flatten(), dtype=np.int64
                ).reshape(n, bands)
                pos = np.searchsorted(self.bks, keys)
                pos[pos >= self.bks.size] = 0
                hit = self.bks[pos] == keys
                ids = t[id_col].to_pylist()
                if self.int_ids:
                    big = np.iinfo(np.int64).max
                    rep_mat = np.where(
                        hit, self.reps[pos].astype(np.int64), big
                    )
                    rep = rep_mat.min(axis=1)  # min rep across bands, in-row
                    idv = np.asarray(ids, dtype=np.int64)
                    mask = rep < idv  # rep == id means "I am the bucket min"
                    if not mask.any():
                        return empty
                    return pa.table({
                        id_col: pa.array(idv[mask], id_type),
                        "rep_id": pa.array(rep[mask], id_type),
                    })
                # string ids (e.g. urls): only rows with a hit do any work
                out_id, out_rep = [], []
                for i in np.nonzero(hit.any(axis=1))[0]:
                    rep = min(self.reps[pos[i][hit[i]]])
                    if rep < ids[i]:
                        out_id.append(ids[i])
                        out_rep.append(rep)
                if not out_id:
                    return empty
                return pa.table({
                    id_col: pa.array(out_id, id_type),
                    "rep_id": pa.array(out_rep, id_type),
                })

        return map_stage(banded, EmitPairs)

    # 10^12-doc fallback: coarse-partition keyed groupby (complete buckets
    # co-locate under bk, only ~4×cores groups pay the per-group Python
    # call), then a keyed min-rep aggregate — zero broadcast/driver state.
    n_parts = 512

    def add_part(t: pa.Table) -> pa.Table:
        part = np.asarray(t["bk"].to_pylist(), dtype=np.int64).view(np.uint64)
        return t.append_column(
            "part", pa.array((part % np.uint64(n_parts)).astype(np.int64))
        )

    def part_pairs(g: pd.DataFrame) -> pd.DataFrame:
        rep = g.groupby("bk")[id_col].transform("min")
        cand = g[g[id_col] != rep]
        return pd.DataFrame(
            {id_col: cand[id_col].values, "rep_id": rep[cand.index].values}
        )

    pairs = (
        exploded.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(part_pairs, batch_format="pandas")
    )
    return pairs.groupby(id_col).aggregate(Min("rep_id", alias_name="rep_id"))


def banded_lsh_candidate_pairs(banded, bands: int, id_col: str,
                               dup_bucket_broadcast_cap: int = 5_000_000):
    """ALL distinct candidate pairs (a < b) sharing at least one LSH band
    bucket, as (``{id}_a``, ``{id}_b``) rows. Complements
    ``banded_lsh_pairs`` (the min-rep LINKING form used by dedup drops):
    pair enumeration is what exact verification consumes, where every
    candidate pair must be scored individually. O(bucket²) per duplicate
    bucket — post-LSH dup buckets are the same cardinality class as the
    output itself. Membership rows are candidate-bounded to duplicate
    buckets first (broadcast is_in under the cap, Bloom above)."""
    from ray.data.aggregate import Count

    a_col, b_col = f"{id_col}_a", f"{id_col}_b"

    def explode(t: pa.Table) -> pa.Table:
        n = t.num_rows
        flat = t["band_keys"].combine_chunks().flatten()
        ids = t[id_col].combine_chunks().take(
            pa.array(np.repeat(np.arange(n, dtype=np.int64), bands))
        )
        return pa.table({id_col: ids, "bk": flat})

    exploded = banded.map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    )
    agg = exploded.groupby("bk").aggregate(Count(alias_name="n"))
    dup_bks = agg.map_batches(
        lambda t: t.filter(
            pa.compute.greater_equal(t["n"], pa.scalar(2))
        ).select(["bk"]),
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()
    members = semi_join_on_ids(exploded, dup_bks, "bk", "bk",
                               dup_bucket_broadcast_cap)

    def pairs_of(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g[id_col].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({a_col: ids[:0], b_col: ids[:0]})
        ia, ib = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({a_col: ids[ia], b_col: ids[ib]})

    pairs = members.groupby("bk").map_groups(pairs_of, batch_format="pandas")
    # a pair can collide in several bands/buckets — keyed distinct
    return pairs.groupby([a_col, b_col]).aggregate(
        Count(alias_name="_n")
    ).map_batches(
        lambda t: t.select([a_col, b_col]),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def minhash_verified_duplicates(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 3,
    threshold: float = 0.5,
):
    """MinHash-LSH candidate pairs verified by EXACT n-gram Jaccard —
    deterministic output (doc_id_a < doc_id_b, jaccard ≥ threshold),
    SQL-oracle-checkable against the brute cross join whenever LSH
    recall is total (pairs far above the threshold, the planted-dup
    regime; band count picks the recall). The scale shape: vectorized
    signatures → one hash aggregate → candidate-bounded pair
    enumeration → routed exact verification (no broadcast of texts)."""
    from .fusion import map_stage

    banded = map_stage(
        ds,
        lambda: _MinHashBands(num_perm=num_perm, bands=bands,
                              shingle_k=shingle_k, text_col=text_col,
                              id_col=id_col),
    ).materialize()
    cands = banded_lsh_candidate_pairs(banded, bands, id_col)
    return _verify_candidates(cands, ds, text_col, id_col, shingle_k,
                              threshold)


def _verify_candidates(cands, ds_docs, text_col: str, id_col: str,
                       k: int, threshold: float):
    """(a, b) candidate pairs → exact-Jaccard-verified
    (``{id}_a``, ``{id}_b``, jaccard) rows via the routed verifier."""
    a_col, b_col = f"{id_col}_a", f"{id_col}_b"

    import ray.data as rd

    # id-type-generic: string doc ids must survive like the rest of the
    # dedup family (exact_dedup, banded_lsh_pairs) — derive from the corpus
    try:
        id_type = ds_docs.schema().base_schema.field(id_col).type
    except Exception:
        id_type = pa.int64()
    empty = pa.table({
        a_col: pa.array([], id_type),
        b_col: pa.array([], id_type),
        "jaccard": pa.array([], pa.float64()),
    })
    oriented = cands.map_batches(
        lambda t: pa.table({id_col: t[b_col], "rep_id": t[a_col]}),
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()
    if oriented.count() == 0:
        return rd.from_arrow(empty)
    verified = verify_pairs_jaccard_distributed(
        oriented, ds_docs, text_col=text_col, id_col=id_col, k=k,
        threshold=threshold,
    )
    # normalize every block to the fixed output schema: upstream grouped
    # stages emit empty column-less pandas blocks, which would upcast the
    # id columns to float64 when to_pandas() concatenates mixed blocks
    def norm(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return empty
        return pa.table({
            a_col: t["rep_id"].cast(id_type),
            b_col: t[id_col].cast(id_type),
            "jaccard": t["jaccard"].cast(pa.float64()),
        })

    # output is O(verified pairs) — materializing it is cheap and lets the
    # all-filtered-out case keep a typed schema (a schemaless empty
    # Dataset would to_pandas() into a column-less frame downstream)
    out = verified.map_batches(
        norm, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    return rd.from_arrow(empty) if out.count() == 0 else out


# ------------------------------------------------------------ simhash ----


class _SimHash:
    def __init__(self, text_col: str, id_col: str):
        self.text_col = text_col
        self.id_col = id_col

    @staticmethod
    def simhash64(text: str) -> int:
        toks = _TOKEN_RE.findall(text.lower())
        if not toks:
            return 0
        th = np.fromiter((_token_hash(t) for t in toks), dtype=np.uint64,
                         count=len(toks))
        # (n_tokens, 64) bit matrix via vectorized shifts; classic Charikar
        # majority vote per bit position
        shifts = np.arange(64, dtype=np.uint64)
        bits = ((th[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
        v = (2 * bits - 1).sum(axis=0)
        out = np.uint64(0)
        out |= np.bitwise_or.reduce(
            (v > 0).astype(np.uint64) << shifts
        )
        return int(out)

    # cap the transient (tokens × 64) bit matrix at ~32 MB
    CHUNK_TOKENS = 1 << 17

    def _batch_simhash(self, texts: list) -> np.ndarray:
        """Vectorized Charikar simhash for a whole batch: one
        concatenated (tokens × 64) bit matrix per chunk, per-doc bit
        sums via add.reduceat — bit-identical to simhash64 per doc."""
        n = len(texts)
        out = np.zeros(n, dtype=np.uint64)
        shifts = np.arange(64, dtype=np.uint64)
        tok_arrays = []
        for t in texts:
            toks = _TOKEN_RE.findall((t or "").lower())
            tok_arrays.append(
                np.fromiter((_token_hash(x) for x in toks), dtype=np.uint64,
                            count=len(toks))
            )
        i = 0
        while i < n:
            j, tot = i, 0
            while j < n and (j == i or tot + tok_arrays[j].size <= self.CHUNK_TOKENS):
                tot += tok_arrays[j].size
                j += 1
            chunk = [a for a in tok_arrays[i:j] if a.size]
            if chunk:
                idx = [p for p in range(i, j) if tok_arrays[p].size]
                th = np.concatenate(chunk)
                counts = np.array([a.size for a in chunk], dtype=np.int64)
                offs = np.concatenate(([0], np.cumsum(counts)[:-1]))
                # composed in one preallocated (tokens, 64) buffer — the
                # expression form allocated three ~67 MB temporaries per
                # chunk; the int64 cast moves to the small (docs, 64)
                # post-reduceat array (0/1 sums fit uint64 exactly)
                bits = np.empty((th.size, 64), np.uint64)
                np.right_shift(th[:, None], shifts[None, :], out=bits)
                np.bitwise_and(bits, np.uint64(1), out=bits)
                cnt = np.add.reduceat(bits, offs, axis=0).astype(np.int64)
                v = 2 * cnt - counts[:, None]  # sum of (2b-1) per bit
                packed = np.bitwise_or.reduce(
                    (v > 0).astype(np.uint64) << shifts[None, :], axis=1
                )
                out[idx] = packed
            i = j
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        hs = self._batch_simhash(batch[self.text_col].to_pylist())
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "simhash": pa.array(hs, pa.uint64()),
            }
        )


def simhash_signatures(ds, text_col: str = "text", id_col: str = "doc_id"):
    """SimHash fingerprints (near-dup by small hamming distance). Banded
    grouping on 16-bit quarters finds candidates whose distance is
    concentrated in the other bands."""
    from .fusion import map_stage

    return map_stage(ds, lambda: _SimHash(text_col, id_col))


def _simhash_banded(ds, text_col: str, id_col: str):
    """(id, band_keys fixed_size_list<int64, 4>) from 16-bit simhash
    quarters (classic Charikar banding); the band index is folded into
    the bucket key as the top bits, so buckets never merge across
    bands. Shared by the linking and the pair-enumeration forms."""
    sigs = simhash_signatures(ds, text_col, id_col)

    def to_band_keys(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        h = np.asarray(batch["simhash"].to_pylist(), dtype=np.uint64)
        keys = np.empty((n, 4), dtype=np.int64) if n else np.empty(
            (0, 4), dtype=np.int64
        )
        for b in range(4):
            quarter = (h >> np.uint64(16 * b)) & np.uint64(0xFFFF)
            keys[:, b] = (quarter | np.uint64(b) << np.uint64(16)).view(
                np.int64
            )
        return pa.table({
            id_col: batch[id_col],
            "band_keys": pa.FixedSizeListArray.from_arrays(
                pa.array(keys.reshape(-1), pa.int64()), 4
            ),
        })

    return sigs.map_batches(
        to_band_keys, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()


def simhash_duplicates(ds, text_col: str = "text", id_col: str = "doc_id",
                       dup_bucket_broadcast_cap: int = 5_000_000):
    """Near-dup candidates: docs sharing any of the four 16-bit simhash
    bands → (id, rep_id) pairs, via the shared banded-LSH machinery."""
    banded = _simhash_banded(ds, text_col, id_col)
    return banded_lsh_pairs(banded, 4, id_col, dup_bucket_broadcast_cap)


def simhash_verified_duplicates(ds, text_col: str = "text",
                                id_col: str = "doc_id", shingle_k: int = 3,
                                threshold: float = 0.8):
    """SimHash band candidates verified by EXACT n-gram Jaccard — the
    simhash counterpart of ``minhash_verified_duplicates`` (same
    deterministic, oracle-checkable output contract)."""
    banded = _simhash_banded(ds, text_col, id_col)
    cands = banded_lsh_candidate_pairs(banded, 4, id_col)
    return _verify_candidates(cands, ds, text_col, id_col, shingle_k,
                              threshold)


# -------------------------------------------- n-gram jaccard verify ----


def ngram_jaccard(a: str, b: str, k: int = 5) -> float:
    sa, sb = _shingles(a, k), _shingles(b, k)
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def jaccard_dups_brute(ds, text_col: str = "text", id_col: str = "doc_id",
                       k: int = 3, threshold: float = 0.5):
    """Exact O(n²) n-gram-Jaccard pair finder — the BRUTE-FORCE VERIFIER
    for the LSH paths (and the SQL-oracle-checkable near-dup query: a
    DuckDB cross join over string shingles computes the identical
    jaccard, since both sides divide the same set-size integers).

    Emits (id_a, id_b, jaccard) for id_a < id_b with jaccard ≥ threshold.
    The shingle-set table is collected once on the driver and broadcast
    (O(corpus shingles) driver memory) while the n² pair loop runs
    distributed over id partitions — deliberately a small-corpus
    diagnostic; at scale you run the LSH paths and verify candidates with
    ``verify_pairs_jaccard``. Measured boundary: sub-second at 500 docs,
    >15 min at 5,000 (both the Ray loop and the SQL cross join are
    O(n²·|shingles|)) — keep it at oracle scale (sf0.01)."""
    import ray
    import ray.data as rd

    shingled = ds.map_batches(
        lambda t: pa.table({
            id_col: t[id_col],
            "sh": pa.array(
                [_shingle_array(x or "", k) for x in t[text_col].to_pylist()]
            ),
        }),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    ids, sets = [], []
    for b in shingled.iter_batches(batch_format="pyarrow"):
        ids.extend(b[id_col].to_pylist())
        col = b["sh"].combine_chunks()
        # .values (not flatten): offsets index the raw child array, and
        # these lists are never null so the pairing is exact
        vals = col.values.to_numpy(zero_copy_only=False)
        offs = col.offsets.to_numpy(zero_copy_only=False)
        sets.extend(
            frozenset(vals[offs[i]:offs[i + 1]].tolist())
            for i in range(len(col))
        )
    order = np.argsort(np.asarray(ids))
    ids = [ids[i] for i in order]
    sets = [sets[i] for i in order]
    ref = ray.put((ids, sets))

    class PairRows:
        def __init__(self):
            self.ids, self.sets = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            out_a, out_b, out_j = [], [], []
            for a_pos in t["pos"].to_pylist():
                sa = self.sets[a_pos]
                for b_pos in range(a_pos + 1, len(self.ids)):
                    sb = self.sets[b_pos]
                    if not sa and not sb:
                        j = 1.0
                    elif not sa or not sb:
                        j = 0.0
                    else:
                        j = len(sa & sb) / len(sa | sb)
                    if j >= threshold:
                        out_a.append(self.ids[a_pos])
                        out_b.append(self.ids[b_pos])
                        out_j.append(j)
            return pa.table({
                "doc_id_a": pa.array(out_a, pa.int64()),
                "doc_id_b": pa.array(out_b, pa.int64()),
                "jaccard": pa.array(out_j, pa.float64()),
            })

    positions = rd.range(len(ids)).map_batches(
        lambda t: pa.table({"pos": t["id"]}),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    from .fusion import map_stage

    return map_stage(positions, PairRows)


def verify_pairs_jaccard(ds_pairs, docs_lookup, text_col: str = "text",
                         id_col: str = "doc_id", k: int = 5,
                         threshold: float = 0.8):
    """Verify candidate (id, rep_id) pairs with exact n-gram Jaccard.
    ``docs_lookup`` is a broadcast {id: text} dict (ray.put once) — the
    small-side join pattern; at 100 TB you'd pass a sharded KV actor set
    instead, but candidate sets after LSH are tiny relative to the corpus."""
    import ray

    ref = (
        docs_lookup
        if isinstance(docs_lookup, ray.ObjectRef)
        else ray.put(docs_lookup)
    )

    class Verify:
        def __init__(self):
            self.docs = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_pylist()
            reps = batch["rep_id"].to_pylist()
            sims = [
                ngram_jaccard(self.docs.get(i, ""), self.docs.get(r, ""), k)
                for i, r in zip(ids, reps)
            ]
            out = batch.append_column("jaccard", pa.array(sims, pa.float64()))
            return out.filter(
                pa.compute.greater_equal(out["jaccard"], pa.scalar(threshold))
            )

    from .fusion import map_stage

    return map_stage(ds_pairs, Verify)


def semi_join_on_ids(ds, ids_ds, ds_col: str, ids_col: str,
                     broadcast_cap: int = 2_000_000):
    """Keep rows of ``ds`` whose ``ds_col`` value appears in
    ``ids_ds[ids_col]`` — the candidate-bounding semi-join. Two modes by
    |ids|: a broadcast value-set + ``pc.is_in`` under ``broadcast_cap``
    (exact), a distributed-built Bloom above it (no false negatives, so
    every needed row survives; a false positive keeps an extra row —
    a SUPERSET semi-join, which is the safe direction for bounding a
    verification corpus)."""
    import pyarrow.compute as pc

    from .fusion import map_stage

    n_ids = ids_ds.count()
    if n_ids == 0:
        return ds.map_batches(lambda t: t.slice(0, 0),
                              batch_format="pyarrow", zero_copy_batch=True)
    if n_ids <= broadcast_cap:
        import ray

        chunks = []
        for b in ids_ds.iter_batches(batch_format="pyarrow"):
            if b.num_rows:
                chunks.append(b[ids_col].combine_chunks())
        value_set = pc.unique(pa.concat_arrays(chunks))
        ref = ray.put(value_set)

        class Keep:
            def __init__(self):
                self.value_set = ray.get(ref)

            def __call__(self, t: pa.Table) -> pa.Table:
                return t.filter(
                    pc.is_in(t[ds_col], value_set=self.value_set)
                )

        return map_stage(ds, Keep)

    # 10^12-row path: Bloom over stringified ids, built distributed
    import ray

    from ..state.bloom import build_bloom

    strs = ids_ds.map_batches(
        lambda t: pa.table({"k": pc.cast(t[ids_col], pa.string())}),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    bloom = build_bloom(strs, "k", capacity=n_ids, fp_rate=1e-4)
    ref = ray.put(bloom)

    class KeepBloom:
        def __init__(self):
            self.bloom = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            keys = pc.cast(t[ds_col], pa.string()).to_pylist()
            return t.filter(
                pa.array(self.bloom.contains_batch(keys), pa.bool_())
            )

    return map_stage(ds, KeepBloom)


def verify_pairs_jaccard_distributed(ds_pairs, ds_docs, text_col: str = "text",
                                     id_col: str = "doc_id", k: int = 5,
                                     threshold: float = 0.8,
                                     participant_broadcast_cap: int = 2_000_000):
    """Broadcast-free candidate verification — the 100 TB form of
    ``verify_pairs_jaccard``: texts are ROUTED to their pairs through two
    keyed exchanges instead of shipping an {id: text} dict to every
    worker.

    The corpus is candidate-bounded FIRST: only pair participants are
    ever scored, so ``ds_docs`` is semi-joined down to the left-id set
    (exchange 1) and the rep-id set (exchange 2) before any shingling —
    both exchanges carry O(candidate shingles), not O(corpus shingles)
    (post-LSH candidates are a small constant fraction of the corpus).

    Exchange 1 groups pair rows with doc rows on the pair's left id and
    attaches the left shingle set (as a uint64 array column — text never
    leaves its first groupby); exchange 2 does the same on rep_id and
    computes the exact n-gram Jaccard in-group. Hash-partitioned, nothing
    driver- or worker-resident beyond the participant value-set/Bloom."""
    docs_left = semi_join_on_ids(ds_docs, ds_pairs, id_col, id_col,
                                 participant_broadcast_cap)
    docs_right = semi_join_on_ids(ds_docs, ds_pairs, id_col, "rep_id",
                                  participant_broadcast_cap)

    def doc_rows(t: pa.Table) -> pa.Table:
        sh = [_shingle_array(x or "", k) for x in t[text_col].to_pylist()]
        return pa.table({
            "key": t[id_col],
            "rep_id": pa.nulls(t.num_rows, t.schema.field(id_col).type),
            "sh": pa.array(sh, pa.list_(pa.uint64())),
            "sh_left": pa.nulls(t.num_rows, pa.list_(pa.uint64())),
        })

    def pair_rows(t: pa.Table) -> pa.Table:
        return pa.table({
            "key": t[id_col],
            "rep_id": t["rep_id"],
            "sh": pa.nulls(t.num_rows, pa.list_(pa.uint64())),
            "sh_left": pa.nulls(t.num_rows, pa.list_(pa.uint64())),
        })

    docs1 = docs_left.map_batches(doc_rows, batch_format="pyarrow",
                                  zero_copy_batch=True)
    pairs1 = ds_pairs.map_batches(pair_rows, batch_format="pyarrow",
                                  zero_copy_batch=True)

    def attach_left(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        doc = g.filter(pc.is_valid(g["sh"]))
        prs = g.filter(pc.invert(pc.is_valid(g["sh"])))
        id_type = g.schema.field("key").type
        if prs.num_rows == 0:
            return pa.table({
                "key": pa.array([], id_type),
                "left_id": pa.array([], id_type),
                "sh": pa.array([], pa.list_(pa.uint64())),
                "sh_left": pa.array([], pa.list_(pa.uint64())),
            })
        sh_py = doc["sh"][0].as_py() if doc.num_rows else []
        return pa.table({
            # re-key on rep_id for exchange 2
            "key": prs["rep_id"],
            "left_id": prs["key"],
            "sh": pa.nulls(prs.num_rows, pa.list_(pa.uint64())),
            "sh_left": pa.array([sh_py] * prs.num_rows, pa.list_(pa.uint64())),
        })

    routed = docs1.union(pairs1).groupby("key").map_groups(
        attach_left, batch_format="pyarrow"
    )

    def docs_for_right(t: pa.Table) -> pa.Table:
        sh = [_shingle_array(x or "", k) for x in t[text_col].to_pylist()]
        return pa.table({
            "key": t[id_col],
            "left_id": pa.nulls(t.num_rows, t.schema.field(id_col).type),
            "sh": pa.array(sh, pa.list_(pa.uint64())),
            "sh_left": pa.nulls(t.num_rows, pa.list_(pa.uint64())),
        })

    docs2 = docs_right.map_batches(docs_for_right, batch_format="pyarrow",
                                   zero_copy_batch=True)

    def score(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        doc = g.filter(pc.is_valid(g["sh"]))
        prs = g.filter(pc.is_valid(g["sh_left"]))
        id_type = g.schema.field("key").type
        empty = pa.table({
            id_col: pa.array([], id_type),
            "rep_id": pa.array([], id_type),
            "jaccard": pa.array([], pa.float64()),
        })
        if prs.num_rows == 0:
            return empty
        sb = set(doc["sh"][0].as_py()) if doc.num_rows else set()
        out_i, out_r, out_j = [], [], []
        for left, sha in zip(prs["left_id"].to_pylist(),
                             prs["sh_left"].to_pylist()):
            sa = set(sha)
            if not sa and not sb:
                j = 1.0
            elif not sa or not sb:
                j = 0.0
            else:
                j = len(sa & sb) / len(sa | sb)
            if j >= threshold:
                out_i.append(left)
                out_r.append(g["key"][0].as_py())
                out_j.append(j)
        return pa.table({
            id_col: pa.array(out_i, id_type),
            "rep_id": pa.array(out_r, id_type),
            "jaccard": pa.array(out_j, pa.float64()),
        })

    return docs2.union(routed).groupby("key").map_groups(
        score, batch_format="pyarrow"
    )


# ------------------------------------------- connected components ----


def connected_components(pairs, id_col: str = "doc_id",
                         rep_col: str = "rep_id", max_iters: int = 10,
                         driver_cap: int = 2_000_000):
    """Transitive dup clusters from candidate (id, rep) edges — the
    distributed union-find substitute the LSH bucket-rep output needs
    when chains occur (a~b, b~c ⇒ {a,b,c}).

    Two paths, picked by edge count:
    - |edges| ≤ ``driver_cap``: one distributed min-label groupby, then
      pointer-jumping on the driver (O(E) memory, O(E α) time) — fastest
      when the dup graph fits a driver heap.
    - |edges| > ``driver_cap``: fully distributed min-label propagation —
      per round, each node's label flows to its neighbors via a keyed
      hash join and a min-groupby; convergence is detected by the global
      label sum going flat (labels are monotonically non-increasing).
      O(diameter) rounds; each round's exchange carries two int64
      columns, nothing driver-sized.

    Returns (id_col, cluster_id) with cluster_id = min id of the
    component (ids absent from every pair are absent — singletons need
    no relabeling)."""

    def explode(batch: pa.Table) -> pa.Table:
        a = batch[id_col].combine_chunks().cast(pa.int64())
        b = batch[rep_col].combine_chunks().cast(pa.int64())
        return pa.table(
            {
                "node": pa.concat_arrays([a, b]),
                "nbr": pa.concat_arrays([b, a]),
            }
        )

    edges = pairs.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
    edges = edges.materialize()

    def min_label(g: pd.DataFrame) -> pd.DataFrame:
        node = int(g["node"].iloc[0])
        lab = int(min(g["nbr"].min(), node))
        return pd.DataFrame({"node": [node], "label": [lab]})

    labels = edges.groupby("node").map_groups(min_label, batch_format="pandas")

    if edges.count() <= driver_cap:
        labels = _cc_driver_rounds(labels, max_iters)
    else:
        labels = _cc_distributed_rounds(edges, labels, max_iters)

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {id_col: batch["node"], "cluster_id": batch["label"]}
        )

    return labels.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)


def _cc_driver_rounds(labels, max_iters: int):
    """Pointer-jumping on the driver (small dup graphs)."""
    for _ in range(max_iters):
        lab_map = {int(r["node"]): int(r["label"]) for r in labels.take_all()}
        new_map = dict(lab_map)
        changed = False
        for n in list(new_map):
            l = new_map[n]
            while l in new_map and new_map[l] < l:
                l = new_map[l]
            if l != new_map[n]:
                new_map[n] = l
                changed = True
        if not changed:
            break
        import ray.data as rd

        labels = rd.from_items(
            [{"node": n, "label": l} for n, l in sorted(new_map.items())]
        )
    return labels


def _cc_distributed_rounds(edges, labels, max_iters: int):
    """Distributed min-label propagation, Pregel-on-groupby: the state is
    one keyed stream of (node, kind, value) rows — kind 0 = the node's
    current label, kind 1 = an outgoing edge (value = neighbor), kind 2
    = an incoming label message. Each round is ONE hash groupby(node):
    the group computes its new min label from kinds {0,2}, re-emits its
    label row and edge rows, and sends the new label to every neighbor
    as a kind-2 message. No joins (Ray 2.49's hash join misplans when
    its right side's lineage contains a hash aggregate), nothing
    driver-sized; convergence = the global label sum going flat (labels
    only ever decrease)."""

    def edge_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "node": t["node"],
            "kind": pa.array(np.ones(n, dtype=np.int64), pa.int64()),
            "value": t["nbr"],
        })

    def label_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "node": pa.array(t["node"].to_pylist(), pa.int64()),
            "kind": pa.array(np.zeros(n, dtype=np.int64), pa.int64()),
            "value": pa.array(t["label"].to_pylist(), pa.int64()),
        })

    state = (
        edges.map_batches(edge_rows, batch_format="pyarrow", zero_copy_batch=True)
        .union(
            labels.map_batches(
                label_rows, batch_format="pyarrow", zero_copy_batch=True
            )
        )
        .materialize()
    )

    def label_sum(s) -> int:
        only = s.map_batches(
            lambda t: t.filter(pa.compute.equal(t["kind"], pa.scalar(0))),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        return int(only.sum("value"))

    def step(g: pd.DataFrame) -> pd.DataFrame:
        node = int(g["node"].iloc[0])
        labs = g.loc[g["kind"] != 1, "value"]
        lab = int(labs.min()) if len(labs) else node
        nbrs = [int(v) for v in g.loc[g["kind"] == 1, "value"]]
        out_node = [node] + [node] * len(nbrs) + nbrs
        out_kind = [0] + [1] * len(nbrs) + [2] * len(nbrs)
        out_val = [lab] + nbrs + [lab] * len(nbrs)
        return pd.DataFrame(
            {"node": out_node, "kind": out_kind, "value": out_val}
        ).astype("int64")

    # stop after TWO consecutive flat rounds: round k's labels react to
    # messages sent in round k-1, so one flat round can just mean the
    # first message wave is still in flight; labels are monotone
    # non-increasing, so two flat rounds imply a fixpoint.
    prev_sum = label_sum(state)
    flat = 0
    for _ in range(max_iters):
        state = state.groupby("node").map_groups(
            step, batch_format="pandas"
        ).materialize()
        cur_sum = label_sum(state)
        flat = flat + 1 if cur_sum == prev_sum else 0
        if flat >= 2:
            break
        prev_sum = cur_sum

    return state.map_batches(
        lambda t: pa.table(
            {
                "node": (f := t.filter(pa.compute.equal(t["kind"], pa.scalar(0))))["node"],
                "label": f["value"],
            }
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )


# ----------------------------------------------- paragraph-level dedup ----


def _para_hashes(text: str, min_chars: int) -> tuple[list[str], np.ndarray]:
    """(paragraphs, int64 hash per paragraph with 0 for ineligible).
    Paragraphs = text.split("\\n\\n") verbatim (no stripping — the
    reassembled text must be a pure subsequence join); a paragraph is
    dedup-eligible iff len >= min_chars. Hashes are the md5-top-8-bytes
    reinterpreted as SIGNED int64 (values above 2^63 would make Ray's
    aggregate output fall back to pickled-object columns)."""
    paras = (text or "").split("\n\n")
    h = np.zeros(len(paras), dtype=np.int64)
    for i, p in enumerate(paras):
        if len(p) >= min_chars:
            h[i] = np.frombuffer(
                hashlib.md5(p.encode()).digest()[:8], dtype=">u8"
            ).view(">i8")[0]
    return paras, h


def _pair_mix(ph: np.ndarray, packed: np.ndarray) -> np.ndarray:
    """One well-mixed uint64 key per (paragraph-hash, packed-position)
    pair — the SAME combiner on the winner-filter build and probe sides,
    so Bloom membership of the pair is exact up to the filter's fp rate.
    int64 inputs are viewed as uint64 (two's complement) before mixing."""
    from .partitioning import splitmix64

    a = np.ascontiguousarray(ph, dtype=np.int64).view(np.uint64)
    b = np.ascontiguousarray(packed, dtype=np.int64).view(np.uint64)
    with np.errstate(over="ignore"):
        return splitmix64(splitmix64(a) + b)


def _packing_ids(ids) -> "np.ndarray":
    """int64 packing ids for the paragraph-dedup winner order: integer
    ids pass through (range-checked); string ids (e.g. article urls)
    take the top 43 bits of md5 — a collision merges two docs' winner
    namespaces (worst case: one duplicated paragraph survives twice, or
    a global-first occurrence loses to a hash-earlier doc), at ~n²/2^43
    probability; the dedup stays deterministic either way."""
    arr = np.asarray(ids)
    if np.issubdtype(arr.dtype, np.integer):
        if arr.size and (arr.min() < 0 or arr.max() >= (1 << 43)):
            raise ValueError("integer ids out of packing range [0, 2^43)")
        return arr.astype(np.int64)
    from .partitioning import md5_prefix_array

    return (md5_prefix_array([str(i) for i in ids], 8)
            >> np.uint64(21)).astype(np.int64)


def dedup_paragraphs(ds, text_col: str = "text", id_col: str = "doc_id",
                     min_chars: int = 1, broadcast_cap: int = 20_000_000,
                     fp_rate: float = 1e-6, output: str = "ids"):
    """Corpus-wide PARAGRAPH-level exact dedup (the C4/Dolma-style line
    dedup generalized to paragraphs): every paragraph keeps exactly its
    FIRST occurrence — ordered by (doc id, paragraph index) — and every
    later copy anywhere in the corpus is removed from its document.
    Kills cross-page boilerplate (nav/footer/legal text) that survives
    per-document gates. Output: one row per input doc,
    (id, clean_text) with surviving paragraphs re-joined by "\\n\\n"
    (docs may come back empty — dropping them is the length gate's job).

    Scale shape (the exact-dedup house pattern): texts never shuffle —
    map pass A emits only (hash, packed) pairs, ONE hash aggregate
    prefilters to duplicated hashes (Count >= 2) and picks each winner
    (Min of packed = lexicographic-first occurrence), and map pass B
    rebuilds documents streaming. Two modes by threshold (the house
    pattern): at or under ``broadcast_cap`` duplicated paragraphs the
    exact winner map broadcasts via ray.put; ABOVE it, two distributed
    Bloom filters replace the map (the Dolma-style tradeoff) — one over
    duplicated hashes, one over (hash, winner) pairs — so driver/worker
    memory stays O(filter bits) at any corpus size. Bloom mode keeps
    every true winner (winner-filter false positives keep a loser; dup-
    filter false positives can drop a UNIQUE paragraph at ~``fp_rate``
    — pick it per corpus; exactness below the cap is unchanged). An
    equivalence test forces the cap to 0 and checks bloom == broadcast.

    Packing: winner order = packing_id * 2^20 + idx — integer ids must
    be < 2^43, string ids are hashed (see ``_packing_ids``), and docs
    must have < 2^20 paragraphs (asserted).

    ``output="ids"``: (id, clean_text) rows. ``output="replace"``: the
    INPUT rows with ``text_col`` replaced in place (all other columns
    preserved) — the curation-chain form."""
    import ray
    from ray.data.aggregate import Count, Min

    from ..state.bloom import build_bloom

    def emit_pairs(batch: pa.Table) -> pa.Table:
        dids = _packing_ids(batch[id_col].to_pylist())
        out_h, out_p = [], []
        for did, t in zip(dids.tolist(), batch[text_col].to_pylist()):
            _, h = _para_hashes(t, min_chars)
            if len(h) >= (1 << 20):
                raise ValueError(f"{id_col}={did}: too many paragraphs")
            elig = np.flatnonzero(h)
            out_h.extend(h[elig].tolist())
            out_p.extend(((did << 20) + elig).tolist())
        return pa.table({
            "ph": pa.array(out_h, pa.int64()),
            "packed": pa.array(out_p, pa.int64()),
        })

    pairs = ds.select_columns([id_col, text_col]).map_batches(
        emit_pairs, batch_format="pyarrow", zero_copy_batch=True
    )
    # materialize BEFORE counting: the dataset is lazy, and count() +
    # iter_batches would otherwise run the corpus-wide md5 pass and the
    # hash aggregate twice; the materialized set is O(duplicated
    # paragraphs), already post-filter
    dup_winners = pairs.groupby("ph").aggregate(
        Count(alias_name="n"), Min("packed", alias_name="w")
    ).map_batches(
        lambda t: t.filter(pa.compute.greater(t["n"], pa.scalar(1))),
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()
    n_dup = dup_winners.count()
    if n_dup > broadcast_cap:
        # Bloom mode: two distributed filters instead of the exact map,
        # keyed on the RAW int64s (splitmix64 pair hashing) — the filter
        # build is O(duplicated paragraphs), exactly the regime the cap
        # targets, so no per-row stringification anywhere: the dup
        # filter ingests the ph column as-is and the winner filter a
        # vectorized (ph, winner) pair mix.
        win_keys = dup_winners.map_batches(
            lambda t: pa.table({"k": pa.array(_pair_mix(
                t["ph"].to_numpy(zero_copy_only=False),
                t["w"].to_numpy(zero_copy_only=False),
            ).view(np.int64))}),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        dup_ref = ray.put(build_bloom(dup_winners.select_columns(["ph"]),
                                      "ph", capacity=n_dup,
                                      fp_rate=fp_rate, int_keys=True))
        win_ref = ray.put(build_bloom(win_keys, "k", capacity=n_dup,
                                      fp_rate=fp_rate, int_keys=True))
        win_map_ref = None
    else:
        winners: dict[int, int] = {}
        for b in dup_winners.iter_batches(batch_format="pyarrow"):
            winners.update(zip(b["ph"].to_pylist(), b["w"].to_pylist()))
        win_map_ref = ray.put(winners)
        dup_ref = win_ref = None

    from .fusion import map_stage

    def factory():
        win = ray.get(win_map_ref) if win_map_ref is not None else None
        dup_bloom = ray.get(dup_ref) if dup_ref is not None else None
        win_bloom = ray.get(win_ref) if win_ref is not None else None

        def keep_mask(did: int, h: np.ndarray) -> list[bool]:
            if win is not None:
                return [
                    hh == 0
                    or win.get(int(hh), (did << 20) + i) == (did << 20) + i
                    for i, hh in enumerate(h)
                ]
            # bloom mode: eligible paras probe the dup filter; hits keep
            # only if (hash, own-position) is (probably) the winner pair
            # — all probes over raw int64s, no stringification
            elig = np.flatnonzero(h)
            mask = np.ones(len(h), dtype=bool)
            if not len(elig):
                return mask
            in_dup = dup_bloom.contains_batch_ints(h[elig])
            hits = elig[in_dup]
            if len(hits):
                own = (np.int64(did) << np.int64(20)) + hits.astype(np.int64)
                mask[hits] = win_bloom.contains_batch_ints(
                    _pair_mix(h[hits], own)
                )
            return mask

        def rebuild(batch: pa.Table) -> pa.Table:
            dids = _packing_ids(batch[id_col].to_pylist())
            texts = []
            for did, t in zip(dids.tolist(), batch[text_col].to_pylist()):
                paras, h = _para_hashes(t, min_chars)
                mask = keep_mask(did, h)
                texts.append(
                    "\n\n".join(p for p, k in zip(paras, mask) if k)
                )
            if output == "replace":
                arr = pa.array(
                    texts,
                    batch.schema.field(text_col).type,
                )
                return batch.set_column(
                    batch.schema.get_field_index(text_col), text_col, arr
                )
            return pa.table({
                id_col: batch[id_col],
                "clean_text": pa.array(texts, pa.string()),
            })

        return rebuild

    src = ds if output == "replace" else ds.select_columns([id_col, text_col])
    return map_stage(src, factory)
