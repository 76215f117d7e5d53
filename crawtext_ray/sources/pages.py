"""Input sources (SURVEY.md §2.1 S1/S2).

S1: the reference's HTTP fetcher (crawtext: page.py, goose:
goose/network.py) is replaced by a Parquet scan of pre-crawled
Common-Crawl-style pages (BASELINE.json:15). Column pruning is applied at
the read so stages that don't parse never ship ``html`` bytes.
"""

from __future__ import annotations

import ray.data

PAGES_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def read_pages(
    path: str | list[str],
    columns: list[str] | None = None,
    include_paths: bool = False,
    override_num_blocks: int | None = None,
    shuffle=None,
) -> "ray.data.Dataset":
    """Scan the pages table. ``columns`` prunes at the parquet reader
    (row-group level) — e.g. reports read only ["url", "lang"].
    ``shuffle="files"`` randomizes file order (cheap host-skew break for
    host-clustered crawl dumps)."""
    return ray.data.read_parquet(
        path,
        columns=columns,
        include_paths=include_paths,
        override_num_blocks=override_num_blocks,
        shuffle=shuffle,
    )


def read_seed_file(path: str) -> "ray.data.Dataset":
    """S2: seed URL list, one per line -> frontier Dataset at depth 0
    (crawtext: crawtext.py --file option analog)."""
    ds = ray.data.read_text(path)
    return ds.map_batches(
        lambda b: {"url": b["text"], "depth": [0] * len(b["text"])},
        batch_format="numpy",
    )
