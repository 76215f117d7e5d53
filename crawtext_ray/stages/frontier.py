"""Frontier expansion + BFS driver loop (SURVEY.md §2.8 J1/U1/T2;
reference crawtext: worker.py BFS over the Mongo ``queue`` collection).

The reference crawls live HTTP; here the "fetch" is a lookup into the
pre-crawled pages corpus (SURVEY.md §0), so BFS = iterative subsetting of
the pages Dataset by the current frontier's url set, one Dataset round per
depth (no global sort — depth ordering is the driver loop).

J1 (seen-url anti-join) has two forms:
- ``anti_join_broadcast``: broadcast the seen set (ray.put once) and mask
  inside map_batches — right when |seen| fits a worker heap.
- ``anti_join_grouped``: union + groupby("url") keeping groups with no
  seen flag — the shuffle form for when neither side is small
  (Ray 2.49 has no native anti-join; hash-partition groupby is the
  idiomatic equivalent).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray


def anti_join_broadcast(ds, seen_keys, key: str = "url"):
    ref = seen_keys if isinstance(seen_keys, ray.ObjectRef) else ray.put(frozenset(seen_keys))

    class Mask:
        def __init__(self):
            self.seen = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            mask = [k not in self.seen for k in batch[key].to_pylist()]
            return batch.filter(pa.array(mask, pa.bool_()))

    from .fusion import map_stage

    return map_stage(ds, Mask)


def anti_join_grouped(new_ds, seen_ds, key: str = "url"):
    """Keys of ``new_ds`` not present in ``seen_ds``; both sides large.
    union with a side flag -> groupby(key) -> keep flagless groups."""
    flag_new = new_ds.map_batches(
        lambda t: t.append_column("__seen", pa.array([False] * t.num_rows)),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    flag_seen = seen_ds.map_batches(
        lambda t: t.append_column("__seen", pa.array([True] * t.num_rows)),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def keep_unseen(g: pd.DataFrame) -> pd.DataFrame:
        if g["__seen"].any():
            return g.iloc[0:0].drop(columns="__seen")
        return g.drop(columns="__seen").head(1)

    return flag_new.select_columns([key, "__seen"]).union(
        flag_seen.select_columns([key, "__seen"])
    ).groupby(key).map_groups(keep_unseen, batch_format="pandas")


def outlinks_frontier(articles, depth: int):
    """M6 -> frontier rows: flat_map outlinks with page-level dedup
    already applied by the extractor; returns (url, depth, parent_url)."""

    def explode(batch: pa.Table) -> pa.Table:
        urls, parents = [], []
        for page_url, links in zip(
            batch["url"].to_pylist(), batch["outlinks"].to_pylist()
        ):
            for l in links or []:
                urls.append(l)
                parents.append(page_url)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "depth": pa.array([depth] * len(urls), pa.int32()),
                "parent_url": pa.array(parents, pa.string()),
            }
        )

    return articles.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)


def bfs_crawl(pages_ds, seed_urls: list[str], max_depth: int = 2,
              extract_fn=None):
    """T2: strict depth-by-depth BFS inside a pre-crawled corpus.

    ``extract_fn(pages_subset) -> articles`` defaults to the flagship
    extraction stage. Returns (articles_per_depth: list[Dataset],
    seen_urls: set). The seen set lives on the driver — adequate for the
    corpus-subset crawl sizes this models; the at-scale variant swaps
    ``anti_join_broadcast`` for ``anti_join_grouped`` against the
    accumulated frontier Dataset."""
    from .extract_stage import extract_articles

    extract_fn = extract_fn or (lambda ds: extract_articles(ds))
    seen: set[str] = set()
    frontier = [u for u in dict.fromkeys(seed_urls)]
    rounds = []
    for depth in range(max_depth + 1):
        frontier = [u for u in frontier if u not in seen]
        if not frontier:
            break
        seen.update(frontier)
        fset = ray.put(frozenset(frontier))

        class InFrontier:
            def __init__(self):
                self.f = ray.get(fset)

            def __call__(self, batch: pa.Table) -> pa.Table:
                mask = [u in self.f for u in batch["url"].to_pylist()]
                return batch.filter(pa.array(mask, pa.bool_()))

        from .fusion import map_stage

        subset = map_stage(pages_ds, InFrontier)
        articles = extract_fn(subset).materialize()
        rounds.append(articles)
        if depth == max_depth:
            break
        links = outlinks_frontier(articles, depth + 1)
        frontier = [r["url"] for r in links.select_columns(["url"]).take_all()]
    return rounds, seen
