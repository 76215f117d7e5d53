"""Report aggregates (SURVEY.md §2.8 A1–A4, T1; reference crawtext:
report.py — per-project counts by language / status / source exported to
CSV/JSON).

All of these are groupby aggregates over already-small key domains, so
the shuffle moves one partial row per (block, key) — Ray pre-aggregates
AggregateFn partials inside blocks before the exchange.
"""

from __future__ import annotations

from ray.data.aggregate import Count, Sum

from ..extract.urlnorm import domain_of


def _bounded_key_counts(articles, key: str, out_name: str = "n_docs"):
    """Grouped count for a BOUNDED key domain (langs, statuses): map-side
    partial value_counts (one row per key per block) merged on the driver
    — no all-to-all at all. A sort-shuffle Aggregate on the same data
    measured a fixed ~7s tail at 32 cpus; the partial rows here are
    ≤ |keys| × |blocks|. For unbounded keys (domains) use the groupby
    path (report_domain)."""
    import collections

    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    def partial(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch[key])
        return pa.table({key: vc.field("values"), "partial_n": vc.field("counts")})

    partials = (
        articles.select_columns([key])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .take_all()
    )
    cnt: collections.Counter = collections.Counter()
    for r in partials:
        cnt[r[key]] += r["partial_n"]
    keys = sorted(cnt)
    return rd.from_arrow(
        pa.table({key: keys, out_name: [int(cnt[k]) for k in keys]})
    )


def report_lang(articles):
    """A1 (mandated by BASELINE.json:6): per-language doc counts."""
    return _bounded_key_counts(articles, "lang")


def report_status(articles):
    """A2: ok / empty / blocked / parse_error tallies."""
    return _bounded_key_counts(articles, "status")


def _add_domain(batch):
    import pyarrow as pa

    # domain_of is stdlib urlsplit (exact host semantics incl. ports,
    # userinfo, IPv6 — a regex kernel would drift on those); the batch
    # stays Arrow so the surrounding pipeline never leaves arrow blocks
    doms = [domain_of(u) for u in batch["url"].to_pylist()]
    return batch.append_column("domain", pa.array(doms, pa.string()))


def add_domain(ds):
    return ds.map_batches(_add_domain, batch_format="pyarrow", zero_copy_batch=True)


def report_domain(articles):
    """A3: per-domain counts (host skew report; pruned to url first)."""
    return (
        add_domain(articles.select_columns(["url"]))
        .select_columns(["domain"])
        .groupby("domain")
        .aggregate(Count(alias_name="n_docs"))
    )


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
