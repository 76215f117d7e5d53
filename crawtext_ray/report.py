"""Report CLI (SURVEY.md §3.2; reference crawtext: `crawtext.py <project>
report` → report.py aggregation + CSV/JSON export).

    python -m crawtext_ray.report --articles /tmp/out [--export dir] [--top-k 10]

Reads an extract-job output directory (part-*.parquet), prints the
per-language / per-status / top-domain / global reports, optionally
exports each as CSV + JSON.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="crawtext_ray.report")
    ap.add_argument("--articles", required=True, help="extract-job output dir")
    ap.add_argument("--export", default=None, help="directory for csv/json export")
    ap.add_argument("--top-k", type=int, default=10)
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "8")))
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    try:
        import ray.data as rd

        from crawtext_ray.stages.export import export_report
        from crawtext_ray.stages.report import (
            global_counters,
            report_lang,
            report_status,
            top_domains,
        )

        articles = rd.read_parquet(args.articles, file_extensions=["parquet"])
        reports = {
            "lang": report_lang(articles).take_all(),
            "status": report_status(articles).take_all(),
            "top_domains": top_domains(articles, args.top_k).take_all(),
            "global": global_counters(articles),
        }
        print(json.dumps(reports, default=str))
        if args.export:
            import pandas as pd

            os.makedirs(args.export, exist_ok=True)
            for name, rows in reports.items():
                df = pd.DataFrame(rows if isinstance(rows, list) else [rows])
                export_report(df, os.path.join(args.export, f"report_{name}.json"))
                export_report(df, os.path.join(args.export, f"report_{name}.csv"))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
