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


def drop_exact_dups(articles, loser_broadcast_cap: int = 5_000_000):
    """Exact content dedup keyed on content_sha256: keep the earliest
    warc_ts (tie: lexicographic url).

    Key-only shuffle: only (content_sha256, url, warc_ts) rows cross the
    loser-picking groupby — never ``extracted_text`` — then the LOSER
    urls (the dup fraction, the genuinely small side) come back as a
    broadcast anti-join over the streaming articles. Exact: no Bloom in
    this path. When the loser set exceeds ``loser_broadcast_cap`` the
    stage falls back to the fully distributed full-row groupby (pays the
    wide shuffle, needs zero driver memory) — the same
    two-modes-by-threshold shape as ``connected_components``.

    (A native hash semi-join on winners was tried and rejected: Acero
    joins reject struct/list payload columns, which the articles schema
    carries.) Assumes url is unique per input row (the pages contract)."""
    import pyarrow.compute as pc

    keys = articles.select_columns(["content_sha256", "url", "warc_ts"])

    def losers_of(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[("warc_ts", "ascending"), ("url", "ascending")]
        )
        return g.take(idx[1:]).select(["url", "warc_ts"])  # all but the winner

    losers = keys.groupby("content_sha256").map_groups(
        losers_of, batch_format="pyarrow"
    ).materialize()
    n_losers = losers.count()
    if n_losers == 0:
        return articles
    if n_losers <= loser_broadcast_cap:
        import ray

        # row identity is (url, warc_ts), NOT url alone: a recrawl of the
        # same url dedupes into the same hash group, so the loser's url
        # can equal the winner's url
        loser_keys = frozenset(
            (r["url"], r["warc_ts"]) for r in losers.iter_rows()
        )
        ref = ray.put(loser_keys)

        class DropLosers:
            def __init__(self):
                self.losers = ray.get(ref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                mask = [
                    (u, t) not in self.losers
                    for u, t in zip(batch["url"].to_pylist(),
                                    batch["warc_ts"].to_pylist())
                ]
                return batch.filter(pa.array(mask, pa.bool_()))

        from ..stages.fusion import map_stage

        return map_stage(articles, DropLosers)

    # distributed fallback: exact, no driver memory, full-row exchange
    def pick(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[("warc_ts", "ascending"), ("url", "ascending")]
        )
        return g.take(idx[:1])

    return articles.groupby("content_sha256").map_groups(pick, batch_format="pyarrow")


def drop_near_dups(articles, num_perm: int = 64, bands: int = 16,
                   shingle_k: int = 5, fp_rate: float = 1e-4):
    """MinHash-LSH near-dup removal over extracted text, keyed by url.

    The dup-url set is folded into a Bloom filter built DISTRIBUTED
    (per-block partial filters ORed on the driver — driver memory is
    O(filter), never O(dup urls)), then applied as a streaming
    anti-join. A Bloom false positive drops a non-dup article; near-dup
    removal is already approximate, so ``fp_rate`` only needs to keep
    that loss negligible (default 1e-4)."""
    from ..state.bloom import bloom_anti_join, build_bloom

    pairs = minhash_lsh_duplicates(
        articles.select_columns(["url", "extracted_text"]),
        text_col="extracted_text",
        id_col="url",
        num_perm=num_perm,
        bands=bands,
        shingle_k=shingle_k,
    ).materialize()  # small: one row per near-dup candidate
    n_dups = pairs.count()
    if n_dups == 0:
        return articles
    bloom = build_bloom(pairs, "url", capacity=n_dups, fp_rate=fp_rate)
    return bloom_anti_join(articles, bloom, key="url")


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
    # checkpoint between the extract phase and the dedup phase: both dedup
    # stages make a key-gathering pass AND a filtering pass over the gated
    # corpus — materializing here means those passes iterate object-store
    # blocks (spilling as needed) instead of re-running extraction per pass.
    # At 100 TB the equivalent checkpoint is a parquet write + re-read.
    gated = quality_gate(ok, min_words=min_words).materialize()
    deduped = drop_exact_dups(gated)
    curated = drop_near_dups(deduped)
    if out_dir:
        curated.write_parquet(out_dir)
    return curated
