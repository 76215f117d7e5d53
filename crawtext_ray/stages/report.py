"""Report aggregates (SURVEY.md §2.8 A1–A4, T1; reference crawtext:
report.py — per-project counts by language / status / source exported to
CSV/JSON).

All of these are groupby aggregates over already-small key domains, so
the shuffle moves one partial row per (block, key) — Ray pre-aggregates
AggregateFn partials inside blocks before the exchange.
"""

from __future__ import annotations

from ray.data.aggregate import Count, Mean, Sum

from ..extract.urlnorm import domain_of


def report_lang(articles):
    """A1 (mandated by BASELINE.json:6): per-language doc counts."""
    return articles.groupby("lang").aggregate(Count(alias_name="n_docs"))


def report_status(articles):
    """A2: ok / empty / blocked / parse_error tallies."""
    return articles.groupby("status").aggregate(Count(alias_name="n_docs"))


def _add_domain(batch):
    batch["domain"] = [domain_of(u) for u in batch["url"]]
    return batch


def add_domain(ds):
    return ds.map_batches(_add_domain, batch_format="pandas")


def report_domain(articles):
    """A3: per-domain counts (host skew report)."""
    return add_domain(articles).groupby("domain").aggregate(Count(alias_name="n_docs"))


def top_domains(articles, k: int = 10):
    """T1: top-k domains by count (small post-agg sort)."""
    return report_domain(articles).sort("n_docs", descending=True).limit(k)


def global_counters(articles):
    """A4: one-row global tally (pages, ok pages, words)."""
    import pyarrow as pa

    def partial(batch: pa.Table) -> pa.Table:
        ok = sum(1 for s in batch["status"].to_pylist() if s == "ok")
        rel = sum(1 for r in batch["relevant"].to_pylist() if r)
        return pa.table(
            {
                "n_pages": [batch.num_rows],
                "n_ok": [ok],
                "n_relevant": [rel],
                "n_words": [
                    int(pa.compute.sum(batch["n_words"]).as_py() or 0)
                ],
            }
        )

    partials = articles.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return partials.aggregate(
        Sum("n_pages", alias_name="n_pages"),
        Sum("n_ok", alias_name="n_ok"),
        Sum("n_relevant", alias_name="n_relevant"),
        Sum("n_words", alias_name="n_words"),
    )
