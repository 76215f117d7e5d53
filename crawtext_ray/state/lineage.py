"""Per-partition lineage records + checkpoint/resume (SURVEY.md §4.3;
BASELINE.json:6 "per-partition lineage records (partition id, input row
range, checksum, rows/sec) ... any failed partition can resume from
checkpoint without reprocessing").

Layout under ``out_dir``:
    part-{pid:05d}.parquet      the partition's article rows
    lineage-{pid:05d}.json      sidecar written AFTER the data file is
                                fsynced and atomically renamed

A partition is "completed" iff its lineage sidecar exists — the sidecar
is the commit record. Both files are written tmp+rename so a killed run
never leaves a half-visible partition.

Partition identity = input file index (deterministic from the sorted
input listing), so a rerun lists lineage files, skips completed input
files, and only reprocesses the rest — resume cost is the failed
partitions only.

Storage requirement (BASELINE.md "At 100 TB"): the grouped writers run
INSIDE Ray workers while the driver lists/reads the same paths, and the
commit protocol is fsync + atomic rename — on a multi-node cluster
``out_dir`` must therefore live on a shared POSIX filesystem (NFS /
fuse-mounted object storage). Single node (this sandbox): any local
dir. The training-shard sink (stages/shuffle.py) is the URI-capable
form for direct object-store output.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _partition_checksum(df: pd.DataFrame) -> str:
    """sha256 over sorted url||content_sha256 (SURVEY.md §1.2 lineage)."""
    h = hashlib.sha256()
    if "content_sha256" in df.columns:
        keys = sorted(
            f"{u}||{c.hex() if isinstance(c, (bytes, bytearray)) else c}"
            for u, c in zip(df["url"], df["content_sha256"])
        )
    else:
        keys = sorted(str(u) for u in df["url"])
    for k in keys:
        h.update(k.encode("utf-8"))
    return h.hexdigest()


def _atomic_write_bytes(path: str, data: bytes) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def write_partition(df: pd.DataFrame, out_dir: str, pid: int,
                    row_start: int, row_end: int, wall_s: float,
                    schema: pa.Schema | None = None) -> dict:
    """Write one partition's data + lineage sidecar atomically."""
    os.makedirs(out_dir, exist_ok=True)
    data_path = os.path.join(out_dir, f"part-{pid:05d}.parquet")
    tmp_path = data_path + ".tmp"
    table = pa.Table.from_pandas(df, schema=schema, preserve_index=False)
    # low-cardinality columns dictionary-encode at rest (SURVEY.md §1.2)
    dict_cols = [c for c in ("lang", "status") if c in table.column_names]
    pq.write_table(table, tmp_path, use_dictionary=dict_cols or False)
    os.replace(tmp_path, data_path)

    record = {
        "partition_id": pid,
        "input_row_start": row_start,
        "input_row_end": row_end,
        "row_count": int(len(df)),
        "checksum": _partition_checksum(df),
        "wall_s": round(wall_s, 4),
        "rows_per_sec": round(len(df) / wall_s, 2) if wall_s > 0 else 0.0,
        "status": "ok",
    }
    _atomic_write_bytes(
        os.path.join(out_dir, f"lineage-{pid:05d}.json"),
        json.dumps(record, sort_keys=True).encode(),
    )
    return record


def completed_partitions(out_dir: str) -> set[int]:
    if not os.path.isdir(out_dir):
        return set()
    out = set()
    for name in os.listdir(out_dir):
        if name.startswith("lineage-") and name.endswith(".json"):
            out.add(int(name[len("lineage-"):-len(".json")]))
    return out


def read_lineage(out_dir: str) -> list[dict]:
    recs = []
    for pid in sorted(completed_partitions(out_dir)):
        with open(os.path.join(out_dir, f"lineage-{pid:05d}.json")) as f:
            recs.append(json.load(f))
    return recs


def write_partitioned(articles, out_dir: str, schema: pa.Schema | None = None):
    """Sink: group article rows by their ``partition_id`` column and write
    each partition + lineage atomically inside the grouped task (one
    shuffle keyed on partition_id — rows are already laid out by input
    file, so the exchange is mostly local).

    Returns the small lineage summary as a Dataset (one row/partition)."""

    def write_group(g: pd.DataFrame) -> pd.DataFrame:
        t0 = time.time()
        pid = int(g["partition_id"].iloc[0])
        rs = int(g["row_start"].min()) if "row_start" in g.columns else 0
        re_ = int(g["row_end"].max()) if "row_end" in g.columns else len(g)
        body = g.drop(columns=[c for c in ("partition_id", "row_start", "row_end")
                               if c in g.columns])
        rec = write_partition(body, out_dir, pid, rs, re_, time.time() - t0,
                              schema=schema)
        return pd.DataFrame([rec])

    return articles.groupby("partition_id").map_groups(
        write_group, batch_format="pandas"
    )
