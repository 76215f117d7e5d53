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


def first_by(ds, key: str, order_col: str, tiebreak: str | None = None):
    """J2: keep exactly one row per ``key`` — the minimal ``order_col``,
    ties broken by ``tiebreak`` (then stable input order). Implemented as
    a hash groupby + per-group head, the idiomatic Ray Data exact-dedup."""
    sort_cols = [order_col] + ([tiebreak] if tiebreak else [])

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(sort_cols, kind="stable").head(1)

    return ds.groupby(key).map_groups(pick, batch_format="pandas")


def drop_seen(ds, seen_keys, key: str = "url"):
    """J1 anti-join: ``seen_keys`` is a broadcast small side (python set /
    ray.ObjectRef of one). At cluster scale pass an ObjectRef so the set
    ships once per worker, not per batch."""
    import ray

    ref = seen_keys if isinstance(seen_keys, ray.ObjectRef) else ray.put(set(seen_keys))

    class AntiJoin:
        def __init__(self):
            self.seen = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            mask = [k not in self.seen for k in batch[key].to_pylist()]
            return batch.filter(pa.array(mask, pa.bool_()))

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

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col, kind="stable").head(1)[[id_col]]

    return hashed.groupby("content_hash").map_groups(pick, batch_format="pandas")


# ----------------------------------------------------- minhash + LSH ----

_TOKEN_RE = re.compile(r"[a-z0-9]+")

# token -> stable 64-bit hash, cached per process (vocab is tiny relative
# to corpus; turns per-shingle md5 into one md5 per unique token)
_TOKEN_HASH_CACHE: dict[str, int] = {}
_SHINGLE_BASE = np.uint64(1_000_003)


def _token_hash(tok: str) -> int:
    h = _TOKEN_HASH_CACHE.get(tok)
    if h is None:
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


class _MinHashBands:
    def __init__(self, num_perm: int, bands: int, shingle_k: int,
                 text_col: str, id_col: str):
        assert num_perm % bands == 0
        self.mh = MinHasher(num_perm, shingle_k)
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        out_id, out_band, out_key = [], [], []
        for i, t in zip(ids, texts):
            sig = self.mh.signature(t or "")
            for b in range(self.bands):
                seg = sig[b * self.rows_per_band : (b + 1) * self.rows_per_band]
                key = hashlib.md5(seg.tobytes()).hexdigest()
                out_id.append(i)
                out_band.append(b)
                out_key.append(key)
        return pa.table(
            {self.id_col: out_id, "band": out_band, "band_key": out_key}
        )


def minhash_lsh_duplicates(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 5,
    concurrency=(1, 8),
):
    """MinHash+LSH near-dup: per-batch signatures (actor pool) → explode
    to (band, band_key, id) rows → groupby band buckets → candidate
    groups keep min id as the cluster representative. Returns one row per
    (id, rep_id) where rep_id != id marks a near-duplicate candidate.

    Scale notes: the exchange carries bands×rows tiny rows; signatures
    are never re-shipped; the per-bucket work is O(bucket²)-free (we only
    emit min-id representatives, full verification is a separate op)."""
    from .fusion import map_stage

    banded = map_stage(
        ds,
        lambda: _MinHashBands(num_perm=num_perm, bands=bands,
                              shingle_k=shingle_k, text_col=text_col,
                              id_col=id_col),
        concurrency=concurrency if isinstance(concurrency, int) else "tasks",
    )

    def bucket_rep(g: pd.DataFrame) -> pd.DataFrame:
        rep = g[id_col].min()
        cand = g[g[id_col] != rep]
        if cand.empty:
            return pd.DataFrame({id_col: [], "rep_id": []}).astype("int64")
        return pd.DataFrame({id_col: cand[id_col].values, "rep_id": rep})

    pairs = banded.groupby(["band", "band_key"]).map_groups(
        bucket_rep, batch_format="pandas"
    )
    # same (id, rep) may surface from several bands: the candidate pair
    # list is tiny relative to the corpus, so the min-rep dedup happens on
    # the driver (a second keyed groupby would pay the fixed sort-shuffle
    # tail again for a handful of rows). If a corpus ever yields a pair
    # set too big for the driver, swap this for groupby(id).map_groups.
    import ray.data as rd

    best: dict = {}
    for r in pairs.take_all():
        i, rep = r[id_col], r["rep_id"]
        if i not in best or rep < best[i]:
            best[i] = rep
    return rd.from_items(
        [{id_col: i, "rep_id": best[i]} for i in sorted(best)]
    )


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

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        hs = [self.simhash64(t or "") for t in batch[self.text_col].to_pylist()]
        return pa.table(
            {
                self.id_col: ids,
                "simhash": pa.array(hs, pa.uint64()),
            }
        )


def simhash_signatures(ds, text_col: str = "text", id_col: str = "doc_id"):
    """SimHash fingerprints (near-dup by small hamming distance). Banded
    grouping on 16-bit quarters finds candidates whose distance is
    concentrated in the other bands."""
    from .fusion import map_stage

    return map_stage(ds, lambda: _SimHash(text_col, id_col))


def simhash_duplicates(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Near-dup candidates: docs sharing any of the four 16-bit simhash
    bands (classic Charikar banding) → (id, rep_id) pairs."""
    sigs = simhash_signatures(ds, text_col, id_col)

    def explode(batch: pa.Table) -> pa.Table:
        ids, bands, keys = [], [], []
        for i, h in zip(batch[id_col].to_pylist(), batch["simhash"].to_pylist()):
            for b in range(4):
                ids.append(i)
                bands.append(b)
                keys.append((int(h) >> (16 * b)) & 0xFFFF)
        return pa.table({id_col: ids, "band": bands, "band_key": keys})

    banded = sigs.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_rep(g: pd.DataFrame) -> pd.DataFrame:
        rep = g[id_col].min()
        cand = g[g[id_col] != rep]
        if cand.empty:
            return pd.DataFrame({id_col: [], "rep_id": []}).astype("int64")
        return pd.DataFrame({id_col: cand[id_col].values, "rep_id": rep})

    pairs = banded.groupby(["band", "band_key"]).map_groups(
        bucket_rep, batch_format="pandas"
    )

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values("rep_id", kind="stable").head(1)

    return pairs.groupby(id_col).map_groups(pick, batch_format="pandas")


# -------------------------------------------- n-gram jaccard verify ----


def ngram_jaccard(a: str, b: str, k: int = 5) -> float:
    sa, sb = _shingles(a, k), _shingles(b, k)
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


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


# ------------------------------------------- connected components ----


def connected_components(pairs, id_col: str = "doc_id",
                         rep_col: str = "rep_id", max_iters: int = 10):
    """Transitive dup clusters from candidate (id, rep) edges: iterative
    min-label propagation, each round one keyed groupby over (node,
    current_label) edge rows — the distributed union-find substitute the
    LSH bucket-rep output needs when chains occur (a~b, b~c ⇒ {a,b,c}).

    Converges in O(diameter) rounds; each round's exchange carries two
    small int columns. Returns (id_col, cluster_id) with cluster_id =
    min id of the component (ids not present in any pair are absent —
    singletons need no relabeling)."""

    def explode(batch: pa.Table) -> pa.Table:
        a = batch[id_col].to_pylist()
        b = batch[rep_col].to_pylist()
        return pa.table(
            {
                "node": pa.array(a + b, pa.int64()),
                "nbr": pa.array(b + a, pa.int64()),
            }
        )

    edges = pairs.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
    edges = edges.materialize()

    def min_label(g: pd.DataFrame) -> pd.DataFrame:
        node = int(g["node"].iloc[0])
        lab = int(min(g["nbr"].min(), node))
        return pd.DataFrame({"node": [node], "label": [lab]})

    labels = edges.groupby("node").map_groups(min_label, batch_format="pandas")

    for _ in range(max_iters):
        lab_map = {int(r["node"]): int(r["label"]) for r in labels.take_all()}
        new_map = dict(lab_map)
        changed = False
        # pointer-jumping on the driver over the (small) dup-graph labels;
        # the heavy edge discovery stayed distributed above
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

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {id_col: batch["node"], "cluster_id": batch["label"]}
        )

    return labels.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)
