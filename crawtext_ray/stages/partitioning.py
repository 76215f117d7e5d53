"""URL-hash partitioning to break host-level skew (SURVEY.md §4.3;
BASELINE.json:6 "repartitioning by url-hash to break host-level skew").

Common-Crawl-style dumps cluster rows by host; a hot host's heavy pages
would otherwise land in consecutive blocks and serialize on one worker.
``add_url_hash`` computes a stable 64-bit hash bucket per url in a
vectorized pass; ``repartition_by_url_hash`` hash-repartitions on it
(Ray 2.49 native ``Dataset.repartition(keys=...)``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def _hash_urls(batch: pa.Table, num_buckets: int) -> pa.Table:
    """Bucket = first 8 big-endian sha1 bytes mod num_buckets. The sha1
    per url is the irreducible Python; digests land in ONE buffer decoded
    by a single frombuffer and the mod runs vectorized (bit-identical to
    the per-url int.from_bytes form — resume partition ids are stable)."""
    urls = batch["url"].to_pylist()
    if not urls:
        return batch.append_column("url_hash", pa.array([], pa.int64()))
    buf = b"".join(
        hashlib.sha1((u or "").encode("utf-8")).digest()[:8] for u in urls
    )
    vals = np.frombuffer(buf, dtype=">u8").astype(np.uint64)
    buckets = (vals % np.uint64(num_buckets)).astype(np.int64)
    return batch.append_column("url_hash", pa.array(buckets, pa.int64()))


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constant set from
    the SplitMix64 PRNG): uint64 in → well-mixed uint64 out, pure numpy.
    The PRODUCTION hash for sampling ops at corpus scale — ~70x faster
    than per-row md5 — while md5 stays the oracle-exact mode (DuckDB can
    reproduce md5 bit-for-bit; a SQL splitmix64 would need HUGEINT
    gymnastics for the 64-bit wraparound)."""
    x = np.ascontiguousarray(x).astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x += np.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return x


def md5_prefix_array(ids, nbytes: int, seed: int | None = None) -> np.ndarray:
    """First ``nbytes`` (1, 2, 4 or 8) of md5 over each id's text form —
    the shared kernel of every oracle-parity hash op (sampling,
    stratified quotas, shuffle-sharding): one digest per id is the
    irreducible Python, everything else is batched (digests land in ONE
    buffer decoded by a single frombuffer). ``seed`` prefixes the hashed
    text as ``"{seed}:{id}"`` (ops without a seed hash ``str(id)``
    verbatim — DuckDB reproduces both forms bit-for-bit)."""
    dtype = {1: np.uint8, 2: ">u2", 4: ">u4", 8: ">u8"}[nbytes]
    if seed is None:
        buf = b"".join(
            hashlib.md5(str(i).encode()).digest()[:nbytes] for i in ids
        )
    else:
        pre = f"{seed}:"
        buf = b"".join(
            hashlib.md5((pre + str(i)).encode()).digest()[:nbytes]
            for i in ids
        )
    return np.frombuffer(buf, dtype=dtype)


def require_integer_ids(arr: np.ndarray, what: str) -> np.ndarray:
    """Guard for the splitmix64 fast paths: raise the documented
    TypeError on non-integer id columns instead of a numpy cast error
    (or, worse, silently numeric-parsing string ids)."""
    if not np.issubdtype(np.asarray(arr).dtype, np.integer):
        raise TypeError(
            f"splitmix64 {what} needs integer ids; use method='md5' "
            "for string ids"
        )
    return arr


def add_url_hash(ds, num_buckets: int = 1024):
    """Append a deterministic ``url_hash`` bucket column."""
    return ds.map_batches(
        _hash_urls,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs={"num_buckets": num_buckets},
    )


def keyed_repartition(ds, num_partitions: int, keys: list[str]):
    """Hash-repartition by key. Ray 2.49's keyed ``repartition`` requires
    the HASH_SHUFFLE strategy; when the session runs the (default) sort
    shuffle we fall back to ``shuffle=True`` — rows still spread evenly
    across partitions (the skew-breaking goal), just without key
    co-location, and the keyed sinks (groupby) hash-partition on their
    own."""
    from ray.data.context import DataContext, ShuffleStrategy

    if DataContext.get_current().shuffle_strategy == ShuffleStrategy.HASH_SHUFFLE:
        return ds.repartition(num_partitions, keys=keys)
    return ds.repartition(num_partitions, shuffle=True)


def repartition_by_url_hash(ds, num_partitions: int, num_buckets: int = 1024):
    """Hash-repartition by url so one host's pages spread across
    partitions."""
    ds = add_url_hash(ds, num_buckets)
    return keyed_repartition(ds, num_partitions, ["url_hash"])


def streaming_skew_break(ds):
    """Zero-cost skew break: randomize block order so a hot host's
    consecutive blocks don't land on one worker back-to-back. Combined
    with (a) ``read_parquet(shuffle="files")`` at the scan and (b) the
    extract stage being a dynamic actor POOL (any free actor takes the
    next batch), this absorbs host-level cost variance without an
    all-to-all. Measured on 100k synthetic pages at 32 CPUs: a full
    url-hash ``repartition`` before extract costs 90–128s vs 26s total
    without it — the exchange of raw html is 3.5–5x the entire pipeline —
    while the keyed exchange that semantics actually need (url-hash
    partitioned OUTPUT for dedup/resume) happens on extracted articles
    (~5x smaller) in the sink groupby. Use ``repartition_by_url_hash``
    only when downstream stages need key co-location BEFORE extraction."""
    return ds.randomize_block_order()


def use_hash_shuffle() -> None:
    """Opt the session into HASH_SHUFFLE, which enables keyed
    ``repartition(keys=...)`` (true key co-location). OPT-IN, not the
    default: session owners reach it via ``python -m crawtext_ray.run
    --hash-shuffle`` (or call this before building a pipeline). The
    default sort-shuffle measured faster for this workload's bounded-key
    groupbys on the 32-cpu host (hash shuffle spawns per-partition
    aggregator actors with a fixed ramp cost), so only enable it when a
    pipeline needs key co-location across stages.

    The aggregator pool is sized to the session: Ray's defaults
    (parallelism 200 → up to 64 aggregator ACTORS) can never be placed
    on a small-CPU session, and every shuffle then deadlocks inside the
    300 s aggregator wait (observed: any groupby at 8 cpus hung).
    Roughly half the CPUs go to aggregators, leaving the rest for the
    upstream read/map tasks feeding them."""
    import ray
    from ray.data.context import DataContext, ShuffleStrategy

    ctx = DataContext.get_current()
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    if ray.is_initialized():
        cpus = int(ray.cluster_resources().get("CPU", 0)) or None
        if cpus:
            ctx.max_hash_shuffle_aggregators = max(1, cpus // 2)
            ctx.default_hash_shuffle_parallelism = min(
                200, max(8, cpus * 2)
            )
