"""Training-data curation pipeline: the composition a 100 TB pretraining
corpus build runs on top of the extraction engine.

    pages ─ extract (flagship stages) ─ keep ok/relevant
          ─ quality filter (length / stopword-ratio / mean-word-len gates)
          ─ exact dedup (content hash, first-by-warc_ts)
          ─ minhash-LSH near-dup drop
          ─ articles parquet (+ per-language report)

Each stage is a streaming map or a keyed groupby; nothing materializes
the corpus. The near-dup stage exchanges only (band_key, url) rows.
"""

from __future__ import annotations

import pyarrow as pa

from ..stages.dedup import minhash_lsh_duplicates
from .flagship import build_articles


def quality_gate(
    articles,
    min_words: int = 20,
    min_stop_ratio: float = 0.1,
    max_mean_word_len: float = 14.0,
):
    """Vectorized quality filter over extracted articles (the classic
    pretraining-corpus gates: too-short, too-little-function-words,
    gibberish-long-tokens)."""
    from ..extract.stopwords import stopword_set

    sw_by_lang = {l: stopword_set(l) for l in ("en", "fr", "de", "es")}

    def gate(batch: pa.Table) -> pa.Table:
        keep = []
        for text, lang, n_words in zip(
            batch["extracted_text"].to_pylist(),
            batch["lang"].to_pylist(),
            batch["n_words"].to_pylist(),
        ):
            if n_words < min_words:
                keep.append(False)
                continue
            toks = text.lower().split()
            mean_len = sum(len(t) for t in toks) / len(toks)
            sw = sw_by_lang.get(lang, sw_by_lang["en"])
            stop_ratio = sum(1 for t in toks if t.strip(".,;:!?") in sw) / len(toks)
            keep.append(stop_ratio >= min_stop_ratio and mean_len <= max_mean_word_len)
        return batch.filter(pa.array(keep, pa.bool_()))

    return articles.map_batches(gate, batch_format="pyarrow", zero_copy_batch=True)


def drop_exact_dups(articles):
    """Exact content dedup keyed on content_sha256: keep the earliest
    warc_ts (tie: lexicographic url). Arrow all the way — the articles
    schema carries list/struct columns that do not survive a pandas
    round-trip."""
    import pyarrow.compute as pc

    def pick(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[("warc_ts", "ascending"), ("url", "ascending")]
        )
        return g.take(idx[:1])

    return articles.groupby("content_sha256").map_groups(pick, batch_format="pyarrow")


def drop_near_dups(articles, num_perm: int = 64, bands: int = 16,
                   shingle_k: int = 5):
    """MinHash-LSH near-dup removal over extracted text, keyed by url.
    The candidate pair list is tiny relative to the corpus; it is
    broadcast back as an anti-join set."""
    import ray

    pairs = minhash_lsh_duplicates(
        articles.select_columns(["url", "extracted_text"]),
        text_col="extracted_text",
        id_col="url",
        num_perm=num_perm,
        bands=bands,
        shingle_k=shingle_k,
    )
    dup_urls = {r["url"] for r in pairs.take_all()}
    ref = ray.put(frozenset(dup_urls))

    class DropDups:
        def __init__(self):
            self.dups = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            mask = [u not in self.dups for u in batch["url"].to_pylist()]
            return batch.filter(pa.array(mask, pa.bool_()))

    from ..stages.fusion import map_stage

    return map_stage(articles, DropDups)


def curate(
    pages_path,
    out_dir: str | None = None,
    query_expression: str | None = None,
    rule_lines: list[str] | None = None,
    num_partitions: int = 16,
    concurrency="tasks",
    min_words: int = 20,
):
    """Full curation chain; returns the curated articles Dataset (written
    to ``out_dir`` when given)."""
    arts = build_articles(
        pages_path,
        query_expression=query_expression,
        rule_lines=rule_lines,
        num_partitions=num_partitions,
        concurrency=concurrency,
    )
    ok = arts.map_batches(
        lambda t: t.filter(pa.compute.equal(t["status"], pa.scalar("ok"))),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    gated = quality_gate(ok, min_words=min_words)
    deduped = drop_exact_dups(gated)
    curated = drop_near_dups(deduped)
    if out_dir:
        curated.write_parquet(out_dir)
    return curated
