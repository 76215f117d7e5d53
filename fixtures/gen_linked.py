"""Deterministic linked-pages fixture: a planted link graph with an
independently computed BFS ground truth.

Purpose (VERDICT r03 #3): give the ``bfs_crawl_pages`` driver query a
real oracle. The generator plants the adjacency (each page's ``<a
href>`` targets) and computes the reachable set per depth by plain
graph BFS over that adjacency — NEVER by running the extraction
pipeline — so the truth is independent of the code under test. The
query then runs the full chain (HTML render → outlink extraction → url
canonicalization → frontier anti-join → depth rounds) and must
reproduce exactly the planted (url, depth) set.

Graph shape (N nodes, ids 0..N-1):
- tree edges: i → 3i+1, 3i+2, 3i+3 (when < N)
- cross edges: every 4th node also links to (7i + 11) % N — creates
  joins where a node is reachable at several depths (BFS must assign
  the smallest) and back edges the seen-set must suppress
- every page links to one DANGLING url (not in the corpus): it enters
  the frontier but extracts nothing and must not appear in any round
- every page repeats its first link (within-page dedup, M6)

HTML bodies are article-like (stopword-rich paragraphs via
fixtures.gen_pages) with the links woven into the paragraphs, so the
pages extract with status ok and the links sit in content the cleaner
keeps (outlinks are collected pre-clean either way).
"""

from __future__ import annotations

import os
from collections import deque
from datetime import datetime, timedelta

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .gen_pages import PAGES_SCHEMA, _paragraph

N_NODES = 60
SEED = 777
BASE_TS = datetime(2024, 6, 1)
HOST = "graph.example"


def node_url(i: int) -> str:
    return f"http://{HOST}/node/{i}"


def adjacency(n: int = N_NODES) -> dict[int, list[int]]:
    adj: dict[int, list[int]] = {}
    for i in range(n):
        kids = [c for c in (3 * i + 1, 3 * i + 2, 3 * i + 3) if c < n]
        if i % 4 == 0:
            kids.append((7 * i + 11) % n)
        adj[i] = kids
    return adj


def bfs_truth(seeds: list[int], max_depth: int,
              n: int = N_NODES) -> dict[int, int]:
    """node -> depth for every node reachable within max_depth; the
    ground-truth computation (graph-only, no extraction)."""
    adj = adjacency(n)
    depth = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        u = q.popleft()
        if depth[u] >= max_depth:
            continue
        for v in adj[u]:
            if v not in depth:
                depth[v] = depth[u] + 1
                q.append(v)
    return depth


def build_linked_page(i: int, n: int = N_NODES) -> dict:
    rng = np.random.default_rng(SEED + i)
    links = [node_url(c) for c in adjacency(n)[i]]
    links.append(f"http://offsite.example/away/{i}")  # dangling
    if links:
        links.append(links[0])  # within-page duplicate (M6 dedup)
    paras = []
    for j, href in enumerate(links):
        paras.append(
            f"<p>{_paragraph(rng, 'en')} "
            f'<a href="{href}">reference {j}</a> '
            f"{_paragraph(rng, 'en')}</p>"
        )
    paras.append(f"<p>{_paragraph(rng, 'en')}</p>")
    doc = (
        f'<!DOCTYPE html><html lang="en"><head><meta charset="utf-8">'
        f"<title>Node {i} | {HOST}</title></head>"
        f'<body><div id="content">{"".join(paras)}</div></body></html>'
    )
    return {
        "url": node_url(i),
        "warc_ts": BASE_TS + timedelta(seconds=i),
        "html": doc.encode("utf-8"),
        "text": "",
        "lang": "en",
    }


def generate_linked(out_dir: str, max_depth: int = 2) -> str:
    """pages_linked/ + truth_linked/ under out_dir (idempotent); returns
    the pages directory. Truth rows: (url, depth) for seeds=[node 0]."""
    pages_dir = os.path.join(out_dir, "pages_linked")
    truth_dir = os.path.join(out_dir, "truth_linked")
    pages_path = os.path.join(pages_dir, "part-00000.parquet")
    truth_path = os.path.join(truth_dir, "part-00000.parquet")
    if os.path.exists(pages_path) and os.path.exists(truth_path):
        return pages_dir
    os.makedirs(pages_dir, exist_ok=True)
    os.makedirs(truth_dir, exist_ok=True)
    rows = [build_linked_page(i) for i in range(N_NODES)]
    t = pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)
    pq.write_table(t, pages_path + ".tmp")
    os.replace(pages_path + ".tmp", pages_path)
    depth = bfs_truth([0], max_depth)
    truth = pa.table({
        "url": pa.array([node_url(i) for i in sorted(depth)], pa.string()),
        "depth": pa.array([depth[i] for i in sorted(depth)], pa.int64()),
    })
    pq.write_table(truth, truth_path + ".tmp")
    os.replace(truth_path + ".tmp", truth_path)
    return pages_dir
