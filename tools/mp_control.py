"""No-Ray multiprocessing control for the scaling criterion.

Runs the SAME extraction kernel (extract.article.extract_article, default
rules) over the same 100k-page fixture with plain multiprocessing at two
worker counts, no Ray anywhere. Purpose: separate the framework from the
hardware — if per-core throughput decays from N to 4N workers here too,
the decay is the host's shared memory bandwidth, not Ray Data overhead,
and a real multi-NODE 4N cluster (own memory bus per node) does not
share it.

    python -m tools.mp_control [--pairs 8,32 4,16] [--pages <dir>]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time
from multiprocessing import Pool

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_RULES = None


def _work(path: str) -> int:
    global _RULES
    import pyarrow.parquet as pq

    from crawtext_ray.extract.adblock import default_rules
    from crawtext_ray.extract.article import extract_article

    if _RULES is None:
        _RULES = default_rules()
    t = pq.read_table(path, columns=["url", "html", "lang"])
    n = 0
    for r in t.to_pylist():
        extract_article(r["html"], r["url"], r["lang"], rules=_RULES)
        n += 1
    return n


def run(files: list[str], workers: int) -> float:
    t0 = time.time()
    with Pool(workers) as p:
        total = sum(p.map(_work, files, chunksize=1))
    dt = time.time() - t0
    return total / dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", default="/tmp/crawtext_ray_fixtures/pages_large")
    ap.add_argument("--pairs", nargs="+", default=["8,32"])
    args = ap.parse_args()
    files = sorted(glob.glob(os.path.join(args.pages, "*.parquet")))
    if not files:
        from fixtures.gen_pages import generate

        generate("/tmp/crawtext_ray_fixtures", "large")
        files = sorted(glob.glob(os.path.join(args.pages, "*.parquet")))
    out = {}
    legs = sorted({int(x) for pair in args.pairs for x in pair.split(",")})
    for n in legs:
        thr = run(files, n)
        out[n] = thr
        print(f"mp x{n}: {thr:.0f} docs/s ({thr / n:.0f} per core)")
    for pair in args.pairs:
        lo, hi = (int(x) for x in pair.split(","))
        eff = (out[hi] / out[lo]) / (hi / lo)
        print(f"mp {lo}->{hi} efficiency: {eff:.3f}")


if __name__ == "__main__":
    main()
