"""Deterministic synthetic ``pages`` table generator (FIXTURES.md §B).

Shape is exactly the driver's input hint (BASELINE.json:15):
``url:string, warc_ts:timestamp[us], html:binary, text:string,
lang:string``. Every page is derived from ``numpy.random.default_rng(42 +
row_id)`` only — no wall clock, no global state — so any row can be
regenerated independently (this is what makes sharded/parallel generation
and golden freezing safe).

Also emits ground truth (``truth_<name>.parquet``: url, expected_status,
expected_lang, is_duplicate, is_blocked, article_para_count) for e2e
assertions that don't depend on extraction bytes.

Usage:
    python -m fixtures.gen_pages --out fixtures/data --size small
    sizes: small=1_000 (1 file), mid=10_000 (8 files), large=100_000 (64 files)
"""

from __future__ import annotations

import argparse
import os
from concurrent.futures import ProcessPoolExecutor
from datetime import datetime, timedelta

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
BASE_TS = datetime(2024, 1, 1)
N_HOSTS = 50
ZIPF_A = 1.3
LANGS = ["en", "fr", "de", "es"]
LANG_W = [0.55, 0.20, 0.15, 0.10]
SECTIONS = ["news", "tech", "sport", "culture", "science", "world", "local"]

SIZES = {"small": (1_000, 1), "mid": (10_000, 8), "large": (100_000, 64),
         "xl": (250_000, 64)}

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

# per-language vocab: (stopword sample for sentence glue, content words)
_VOCAB = {
    "en": (
        "the of and to in that it is was for on are with as his they at be this from".split(),
        "market research climate energy report village garden station window "
        "journey mountain forest river engine signal treaty festival harvest "
        "border council library museum".split(),
    ),
    "fr": (
        "le la les de des du et en que qui dans pour sur avec ne pas ce une un au".split(),
        "marché recherche climat énergie rapport village jardin gare fenêtre "
        "voyage montagne forêt rivière moteur signal traité festival récolte "
        "frontière conseil bibliothèque musée".split(),
    ),
    "de": (
        "der die das und in den von zu mit sich des auf für ist im dem nicht ein eine als".split(),
        "markt forschung klima energie bericht dorf garten bahnhof fenster "
        "reise berg wald fluss motor signal vertrag fest ernte grenze rat "
        "bibliothek museum".split(),
    ),
    "es": (
        "el la los las de del y en que se un una por con no para al lo como más".split(),
        "mercado investigación clima energía informe pueblo jardín estación "
        "ventana viaje montaña bosque río motor señal tratado festival cosecha "
        "frontera consejo biblioteca museo".split(),
    ),
}

_NAUGHTY = [
    "comment", "footer", "sidebar", "menu", "sponsor", "pagination",
    "popup", "breadcrumbs", "social", "subscribe", "tags", "byline",
]


def _zipf_host(rng: np.random.Generator) -> str:
    # bounded zipf over N_HOSTS ranks
    ranks = np.arange(1, N_HOSTS + 1, dtype=np.float64)
    w = ranks ** (-ZIPF_A)
    w /= w.sum()
    i = int(rng.choice(N_HOSTS, p=w))
    return f"site{i:02d}.example"


def _sentence(rng: np.random.Generator, lang: str, rich: bool) -> str:
    stop, content = _VOCAB[lang]
    n = int(rng.integers(8, 41))
    words = []
    for _ in range(n):
        if rich and rng.random() < 0.55:
            words.append(stop[int(rng.integers(0, len(stop)))])
        else:
            words.append(content[int(rng.integers(0, len(content)))])
    words[0] = words[0].capitalize()
    return " ".join(words) + "."


def _paragraph(rng: np.random.Generator, lang: str, rich: bool = True) -> str:
    return " ".join(_sentence(rng, lang, rich) for _ in range(int(rng.integers(1, 4))))


def _poor_fragment(rng: np.random.Generator, lang: str) -> str:
    """< 3 stopwords: content words only (X9 removal fodder)."""
    _, content = _VOCAB[lang]
    n = int(rng.integers(2, 5))
    return " ".join(content[int(rng.integers(0, len(content)))] for _ in range(n))


def _linkfarm(rng: np.random.Generator, host: str) -> str:
    n = int(rng.integers(10, 31))
    items = "".join(
        f'<a href="http://{host}/l/{int(rng.integers(0, 9999))}">item {i}</a> '
        for i in range(n)
    )
    return f'<div class="related-items">{items}</div>'


def _boilerplate(rng: np.random.Generator, host: str) -> tuple[str, str]:
    c1, c2 = (
        _NAUGHTY[int(rng.integers(0, len(_NAUGHTY)))],
        _NAUGHTY[int(rng.integers(0, len(_NAUGHTY)))],
    )
    header = (
        f'<div class="{c1}"><a href="http://{host}/">Home</a> '
        f'<a href="http://{host}/news">News</a> <a href="http://{host}/contact-us">Contact</a></div>'
    )
    footer = f'<div id="{c2}">Copyright 2024 {host} — all rights reserved</div>'
    return header, footer


def build_page(row_id: int) -> dict:
    """Deterministic page for a row id. Returns the row dict + truth."""
    rng = np.random.default_rng(SEED + row_id)
    lang = str(rng.choice(LANGS, p=LANG_W))
    host = _zipf_host(rng)
    section = SECTIONS[int(rng.integers(0, len(SECTIONS)))]

    r = rng.random()
    is_dup = bool(r < 0.01 and row_id > 20)
    if is_dup:
        target = row_id - int(rng.integers(1, 16))
        base = build_page(target)
        if base["is_duplicate"]:  # avoid dup-of-dup chains
            is_dup = False
        else:
            html = base["html"] + b"\n<!-- recrawl -->"
            ts = BASE_TS + timedelta(seconds=row_id + 5_000_000)
            return {
                "url": base["url"],
                "warc_ts": ts,
                "html": html,
                "text": base["text"],
                "lang": base["lang"],
                "expected_status": base["expected_status"],
                "expected_lang": base["expected_lang"],
                "is_duplicate": True,
                "is_blocked": base["is_blocked"],
                "article_para_count": base["article_para_count"],
            }

    is_blocked = bool(r >= 0.01 and r < 0.03)
    if is_blocked:
        kind = int(rng.integers(0, 3))
        if kind == 0:
            url = f"http://ads.{host}/{section}/promo-{row_id}"
        elif kind == 1:
            url = f"http://{host}/banner/{section}-{row_id}"
        else:
            url = f"http://{host}/{section}/x-{row_id}?a=1&ad_box_1=2"
    else:
        url = f"http://{host}/{section}/story-{row_id}"

    is_empty = bool(r >= 0.03 and r < 0.13)
    is_broken = bool(r >= 0.13 and r < 0.14)

    header, footer = _boilerplate(rng, host)
    ad = '<div class="ad-banner">Great deal buy now cheap offer</div>'
    farm = _linkfarm(rng, host)
    title = f"{_poor_fragment(rng, lang).title()} | {host}"

    body_parts = [header, ad, farm]
    n_paras = 0
    if not is_empty:
        n_paras = int(rng.integers(3, 13))
        paras = [f"<p>{_paragraph(rng, lang)}</p>" for _ in range(n_paras)]
        # short paragraph with < 3 stopwords (X9)
        paras.insert(int(rng.integers(0, len(paras))), f"<p>{_poor_fragment(rng, lang)}</p>")
        # occasional inline markup (X8)
        if rng.random() < 0.5:
            paras[0] = paras[0].replace(
                "<p>", "<p><strong>Lead:</strong> ", 1
            )
        article = f'<div class="article-body">{"".join(paras)}</div>'
        lead = ""
        if rng.random() < 0.2:
            # sibling paragraphs outside the top node (X5)
            if rng.random() < 0.5:
                lead = f"<p>{_paragraph(rng, lang)}</p>"
            else:
                lead = f'<div class="intro"><p>{_paragraph(rng, lang)}</p></div>'
        body_parts.append(f'<div id="content">{lead}{article}</div>')
    body_parts.append(footer)

    enc_r = rng.random()
    if enc_r < 0.85 or lang == "en":
        charset, codec, bom = "utf-8", "utf-8", b""
    elif enc_r < 0.95:
        charset, codec, bom = "ISO-8859-1", "latin-1", b""
    else:
        charset, codec, bom = "utf-8", "utf-8", b"\xef\xbb\xbf"

    doc = (
        f'<!DOCTYPE html><html lang="{lang}"><head>'
        f'<meta charset="{charset}"><title>{title}</title>'
        f'<meta name="description" content="Synthetic page {row_id}">'
        f"</head><body>{''.join(body_parts)}</body></html>"
    )
    html = bom + doc.encode(codec, errors="replace")
    if is_broken:
        html = html[: max(100, int(len(html) * 0.6))]

    # naive tag-stripped text column (WARC-style passthrough)
    import re as _re

    naive = _re.sub(r"<[^>]+>", " ", doc)
    naive = _re.sub(r"\s+", " ", naive).strip()

    if is_blocked:
        expected = "blocked"
    elif is_broken:
        expected = "any"
    elif is_empty:
        expected = "empty"
    else:
        expected = "ok"

    return {
        "url": url,
        "warc_ts": BASE_TS + timedelta(seconds=row_id),
        "html": html,
        "text": naive,
        "lang": lang,
        "expected_status": expected,
        "expected_lang": lang,
        "is_duplicate": False,
        "is_blocked": is_blocked,
        "article_para_count": n_paras,
    }


def _gen_shard(args: tuple[int, int, int, str, str]) -> str:
    shard_id, start, end, out_dir, name = args
    rows = [build_page(i) for i in range(start, end)]
    t = pa.Table.from_pylist(
        [{k: r[k] for k in ("url", "warc_ts", "html", "text", "lang")} for r in rows],
        schema=PAGES_SCHEMA,
    )
    path = os.path.join(out_dir, f"pages_{name}", f"part-{shard_id:05d}.parquet")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(t, path + ".tmp")
    os.replace(path + ".tmp", path)  # atomic: concurrent generators are safe
    truth = pa.Table.from_pylist(
        [
            {
                k: r[k]
                for k in (
                    "url", "expected_status", "expected_lang", "is_duplicate",
                    "is_blocked", "article_para_count",
                )
            }
            for r in rows
        ]
    )
    tpath = os.path.join(out_dir, f"truth_{name}", f"part-{shard_id:05d}.parquet")
    os.makedirs(os.path.dirname(tpath), exist_ok=True)
    pq.write_table(truth, tpath + ".tmp")
    os.replace(tpath + ".tmp", tpath)
    return path


def generate(out_dir: str, name: str, n_rows: int | None = None,
             n_files: int | None = None, workers: int | None = None) -> str:
    """Generate pages_<name>/ + truth_<name>/ under out_dir; returns the
    pages directory. Idempotent: skips when the directory already has the
    expected number of files."""
    if n_rows is None:
        n_rows, n_files = SIZES[name]
    n_files = n_files or 1
    pages_dir = os.path.join(out_dir, f"pages_{name}")
    if os.path.isdir(pages_dir) and len(os.listdir(pages_dir)) == n_files:
        return pages_dir
    per = (n_rows + n_files - 1) // n_files
    tasks = [
        (s, s * per, min((s + 1) * per, n_rows), out_dir, name)
        for s in range(n_files)
        if s * per < n_rows
    ]
    workers = workers or min(16, os.cpu_count() or 1, len(tasks))
    if workers > 1 and len(tasks) > 1:
        with ProcessPoolExecutor(max_workers=workers) as ex:
            list(ex.map(_gen_shard, tasks))
    else:
        for t in tasks:
            _gen_shard(t)
    return pages_dir


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="fixtures/data")
    ap.add_argument("--size", default="small", choices=list(SIZES))
    ap.add_argument("--rows", type=int, default=None)
    ap.add_argument("--files", type=int, default=None)
    args = ap.parse_args()
    path = generate(args.out, args.size, args.rows, args.files)
    print(path)


if __name__ == "__main__":
    main()
