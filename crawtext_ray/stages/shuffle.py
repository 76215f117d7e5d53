"""Deterministic global shuffle + sharding for training-data export.

The last step of an LLM data pipeline: the curated corpus must reach the
data loaders globally shuffled (no host/time locality) and sharded (one
file group per loader rank). Ray's ``random_shuffle`` is a full
all-to-all with a non-reproducible row order per run; this operator gets
the same statistical effect deterministically and resumably:

- every row's 64-bit hash ``h = mix(key, seed)`` decides BOTH its shard
  (``h % n_shards``) and its position within the shard (order by
  ``(h, key)``) — rerunning the job, or re-running only one failed
  shard, reproduces identical bytes;
- the only exchange is ONE keyed groupby on ``shard`` (the hash is
  computed map-side), not a row-level all-to-all;
- shard files are written independently (``part-<shard>.parquet``), so a
  failed export resumes per shard.

Hash modes mirror the sampling ops: ``splitmix64`` (vectorized, integer
keys, the production mode) and ``md5`` (any key type, bit-reproducible
in SQL — the oracle/differential mode).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def _row_hashes(ids, method: str, seed: int) -> np.ndarray:
    if method == "splitmix64":
        from .partitioning import splitmix64

        arr = np.asarray(ids)
        if not np.issubdtype(arr.dtype, np.integer):
            raise TypeError(
                "splitmix64 shuffling needs integer keys; use "
                "method='md5' for string keys"
            )
        with np.errstate(over="ignore"):
            mixed = arr.astype(np.uint64) + splitmix64(
                np.full(1, seed, dtype=np.uint64)
            )
        return splitmix64(mixed)
    if method == "md5":
        # one digest per key is the irreducible Python (SQL parity pins
        # md5); digests land in one buffer (partitioning._hash_urls
        # pattern). Seed is mixed into the hashed text.
        buf = b"".join(
            hashlib.md5(f"{seed}:{i}".encode()).digest()[:8] for i in ids
        )
        return np.frombuffer(buf, dtype=">u8").astype(np.uint64)
    raise ValueError(f"unknown hash method {method!r}")


def shuffle_shards(ds, n_shards: int = 64, key: str = "doc_id",
                   seed: int = 0, method: str = "splitmix64"):
    """Assign every row a ``shard`` and its deterministic ``pos`` within
    that shard; rows come back grouped by shard and ordered by position.
    Columns are preserved; ``shard``/``pos`` are appended (int64)."""

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(
                "shard", pa.array([], pa.int64())
            ).append_column("_h", pa.array([], pa.uint64()))
        h = _row_hashes(batch[key].to_pylist()
                        if method == "md5"
                        else batch[key].to_numpy(zero_copy_only=False),
                        method, seed)
        t = batch.append_column(
            "shard", pa.array((h % np.uint64(n_shards)).astype(np.int64))
        )
        return t.append_column("_h", pa.array(h, pa.uint64()))

    hashed = ds.map_batches(assign, batch_format="pyarrow",
                            zero_copy_batch=True)

    def order(g: pa.Table) -> pa.Table:
        # one Arrow call per SHARD (n_shards groups, never row/key
        # cardinality); the within-shard order is the shuffle order.
        # pyarrow groups (not pandas): rows may carry list/struct
        # columns (articles do), which pandas map_groups cannot emit
        g = g.sort_by([("_h", "ascending"), (key, "ascending")])
        g = g.append_column(
            "pos", pa.array(np.arange(g.num_rows, dtype=np.int64))
        )
        return g.drop_columns(["_h"])

    return hashed.groupby("shard").map_groups(order, batch_format="pyarrow")


def write_training_shards(ds, out_dir: str, n_shards: int = 64,
                          key: str = "doc_id", seed: int = 0,
                          method: str = "splitmix64") -> list[dict]:
    """Shuffle-shard ``ds`` and write one parquet file per shard
    (``part-<shard>.parquet``, rows in shuffle order) plus a driver-side
    manifest [{shard, rows, path}]. Atomic per shard (tmp+rename): a
    crashed export resumes by re-running — finished shards rewrite
    identical bytes, so the operation is idempotent."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    shuffled = shuffle_shards(ds, n_shards=n_shards, key=key, seed=seed,
                              method=method)
    manifest: list[dict] = []

    def write_shard(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"shard": pa.array([], pa.int64()),
                             "rows": pa.array([], pa.int64())})
        shard = int(g["shard"][0].as_py())
        g = g.sort_by([("pos", "ascending")])
        path = os.path.join(out_dir, f"part-{shard:05d}.parquet")
        pq.write_table(g, path + ".tmp")
        os.replace(path + ".tmp", path)
        return pa.table({"shard": pa.array([shard], pa.int64()),
                         "rows": pa.array([g.num_rows], pa.int64())})

    recs = shuffled.groupby("shard").map_groups(
        write_shard, batch_format="pyarrow"
    ).take_all()
    for r in sorted(recs, key=lambda r: r["shard"]):
        manifest.append({
            "shard": int(r["shard"]), "rows": int(r["rows"]),
            "path": os.path.join(out_dir, f"part-{int(r['shard']):05d}.parquet"),
        })
    return manifest


def pack_sequences(ds, seq_len: int, key: str = "doc_id",
                   n_tokens_col: str = "n_tokens", n_shards: int = 64,
                   seed: int = 0, method: str = "splitmix64"):
    """GPT-style sequence packing assignment: documents are laid out in
    the deterministic shuffle order (``shuffle_shards``) and the token
    stream is cut into fixed ``seq_len`` windows; every document gets
    the pack it STARTS in and its offset inside that pack —
    ``pack_id = floor(prev_cumsum / seq_len)``,
    ``pack_offset = prev_cumsum % seq_len`` — the
    concatenate-and-chunk layout a pretraining loader consumes
    (documents may straddle pack boundaries, as in GPT-style training).

    Scale shape: shard assignment is map-side; the per-shard exclusive
    cumsum is one vectorized pass per SHARD group (pyarrow groups —
    works with nested article columns). Deterministic end to end, so
    loaders on different hosts agree on the layout without coordination.
    Output: input columns + (shard, pos, pack_id, pack_offset); pack_id
    is unique WITHIN a shard — loaders consume one shard each, which is
    the point."""
    shuffled = shuffle_shards(ds, n_shards=n_shards, key=key, seed=seed,
                              method=method)

    def pack(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return g.append_column(
                "pack_id", pa.array([], pa.int64())
            ).append_column("pack_offset", pa.array([], pa.int64()))
        g = g.sort_by([("pos", "ascending")])
        toks = g[n_tokens_col].to_numpy(zero_copy_only=False).astype(np.int64)
        prev = np.concatenate(([0], np.cumsum(toks)[:-1]))
        return g.append_column(
            "pack_id", pa.array(prev // seq_len, pa.int64())
        ).append_column(
            "pack_offset", pa.array(prev % seq_len, pa.int64())
        )

    return shuffled.groupby("shard").map_groups(pack, batch_format="pyarrow")
