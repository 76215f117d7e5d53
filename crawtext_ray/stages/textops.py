"""Vectorized text-analysis stages over a documents table (the
training-data operator set): language id, quality features, token
counting, fingerprinting, relevance filtering (M7 as a Dataset op)."""

from __future__ import annotations

import pyarrow as pa

from ..extract.query import Query
from ..functions.text import (
    language_id,
    quality_features,
    rolling_fingerprint,
    token_count,
    word_count,
)


class TextFeatures:
    """Actor-pool stage: stopword tables loaded once per actor; per batch
    emits doc_id + the feature columns."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 lang_col: str | None = "lang"):
        from ..extract.stopwords import KNOWN_LANGUAGES, stopword_set

        for lang in KNOWN_LANGUAGES:
            stopword_set(lang)
        self.text_col = text_col
        self.id_col = id_col
        self.lang_col = lang_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        ids = batch[self.id_col].to_pylist()
        langs = (
            batch[self.lang_col].to_pylist()
            if self.lang_col and self.lang_col in batch.column_names
            else ["en"] * len(texts)
        )
        rows = []
        for i, t, l in zip(ids, texts, langs):
            t = t or ""
            q = quality_features(t, l if l in ("en", "fr", "de", "es") else "en")
            rows.append(
                {
                    self.id_col: i,
                    "n_chars_calc": q["n_chars"],
                    "n_words": q["n_words"],
                    "n_tokens": token_count(t),
                    "mean_word_len": q["mean_word_len"],
                    "punct_ratio": q["punct_ratio"],
                    "stop_ratio": q["stop_ratio"],
                    "pred_lang": language_id(t),
                    "fingerprint": rolling_fingerprint(t),
                }
            )
        return pa.Table.from_pylist(rows)


def text_features(ds, text_col: str = "text", id_col: str = "doc_id",
                  lang_col: str | None = "lang", concurrency="tasks"):
    from .fusion import map_stage

    return map_stage(
        ds,
        lambda: TextFeatures(text_col=text_col, id_col=id_col, lang_col=lang_col),
        concurrency=concurrency,
    )


def word_counts(ds, text_col: str = "text", id_col: str = "doc_id"):
    """M9 as a stand-alone stage: doc_id, n_words, n_tokens."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        return pa.table(
            {
                id_col: batch[id_col],
                "n_words": pa.array([word_count(t or "") for t in texts], pa.int64()),
                "n_tokens": pa.array([token_count(t or "") for t in texts], pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def relevance_filter(ds, expression: str, text_col: str = "text",
                     id_col: str = "doc_id"):
    """M7 over a documents table: compile the boolean query once per
    actor, emit matching ids."""

    class Match:
        def __init__(self):
            self.q = Query(expression)

        def __call__(self, batch: pa.Table) -> pa.Table:
            texts = batch[text_col].to_pylist()
            mask = [self.q.match(t or "") for t in texts]
            return batch.filter(pa.array(mask, pa.bool_()))

    from .fusion import map_stage

    return map_stage(ds, Match)
