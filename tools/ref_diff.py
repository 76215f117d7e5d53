"""Reference re-verification tool (SURVEY.md §0 checklist, automated).

The extraction contract in this repo — cleaner regex lists, scoring
constants, the title rule, the golden corpus — was reconstructed from
public knowledge while ``/root/reference/`` was mounted EMPTY. The day
the mount appears, this tool validates the reconstruction instead of
trusting it:

    python -m tools.ref_diff [--ref /root/reference]

1. **Boilerplate pattern list**: every pattern in
   ``resources/boilerplate_patterns.txt`` must appear verbatim somewhere
   in the reference's cleaner sources (and the tool reports reference-
   side candidate patterns we do NOT carry, found by scanning REGEX-ish
   string lists in files named like cleaner/extractor).
2. **Scoring constants**: the named constants of the gravity-scoring
   contract (boost window, escape thresholds, grandparent factor,
   bottom-fraction negative weighting, link-density threshold) are
   grepped for in the reference scoring sources; any constant with zero
   textual hits is flagged for manual review.
3. **Golden byte-identity**: if the reference package is importable
   (``goose`` / ``crawtext``), every committed golden case's html is run
   through the REFERENCE extractor and byte-compared with our golden
   text — the real "byte-identical vs reference" check the north rule
   asks for (BASELINE.json:14).

Exit codes: 0 = reference empty (warning printed) or every check green;
1 = drift detected; 2 = reference present but no checkable surface found
(manual review required).
"""

from __future__ import annotations

import argparse
import importlib
import importlib.resources as _ilr
import json
import os
import sys

# the scoring contract constants this repo implements (extract/scoring.py);
# names follow the public goose lore so reference-side greps can find them
SCORING_CONSTANTS = {
    "boost_max_steps": "3",
    "boost_stopword_threshold": "5",
    "neg_escape_words": "40",
    "neg_escape_bonus": "5",
    "grandparent_factor": "0.5",
    "bottom_negative_fraction": "0.25",
    "link_density_threshold": "1.0",
}

_SRC_EXT = (".py", ".go", ".rs", ".cc", ".cpp", ".java", ".js", ".ts")


def _ref_files(ref_root: str) -> list[str]:
    out = []
    for dirpath, _dirs, files in os.walk(ref_root):
        for f in files:
            if f.endswith(_SRC_EXT):
                out.append(os.path.join(dirpath, f))
    return out


def _read(path: str) -> str:
    try:
        with open(path, encoding="utf-8", errors="replace") as f:
            return f.read()
    except OSError:
        return ""


def check_patterns(ref_files: list[str]) -> dict:
    ours = [
        ln.strip()
        for ln in (
            _ilr.files("crawtext_ray") / "resources" / "boilerplate_patterns.txt"
        ).read_text(encoding="utf-8").splitlines()
        if ln.strip()
    ]
    cleaner_files = [
        p for p in ref_files
        if any(k in os.path.basename(p).lower()
               for k in ("clean", "extract", "boilerplate"))
    ] or ref_files
    blob = "\n".join(_read(p) for p in cleaner_files)
    missing = [p for p in ours if p not in blob]
    return {
        "ours": len(ours),
        "missing_in_reference": missing,
        "scanned_files": len(cleaner_files),
    }


def check_constants(ref_files: list[str]) -> dict:
    score_files = [
        p for p in ref_files
        if any(k in os.path.basename(p).lower()
               for k in ("score", "scoring", "extract", "content"))
    ] or ref_files
    blob = "\n".join(_read(p) for p in score_files)
    unfound = [
        name for name, lit in SCORING_CONSTANTS.items() if lit not in blob
    ]
    return {"constants": len(SCORING_CONSTANTS), "unfound": unfound,
            "scanned_files": len(score_files)}


def check_goldens(ref_root: str) -> dict:
    """Byte-compare our golden texts against the reference extractor, if
    one is importable from the mount."""
    sys.path.insert(0, ref_root)
    extractor = None
    for modname, attr in (("goose", "Goose"), ("crawtext.article", None)):
        try:
            mod = importlib.import_module(modname)
            extractor = (mod, attr)
            break
        except Exception:
            continue
    if extractor is None:
        return {"status": "reference_not_importable", "compared": 0}

    # layout: tests/golden/<case>/{input.html, expected.txt, meta.json}
    golden_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "golden")
    mismatches = []
    compared = 0
    mod, attr = extractor
    goose = getattr(mod, attr)() if attr else mod
    for case in sorted(os.listdir(golden_dir)):
        case_dir = os.path.join(golden_dir, case)
        if not os.path.isfile(os.path.join(case_dir, "input.html")):
            continue
        html = _read(os.path.join(case_dir, "input.html"))
        want = _read(os.path.join(case_dir, "expected.txt"))
        try:
            art = goose.extract(raw_html=html)
            got = art.cleaned_text
        except Exception as e:
            mismatches.append({"case": case, "error": str(e)})
            continue
        compared += 1
        if got != want:
            mismatches.append({"case": case, "ref_len": len(got),
                               "golden_len": len(want)})
    return {"status": "compared", "compared": compared,
            "mismatches": mismatches}


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="tools.ref_diff")
    ap.add_argument("--ref", default="/root/reference")
    args = ap.parse_args(argv)

    ref_files = _ref_files(args.ref) if os.path.isdir(args.ref) else []
    if not ref_files:
        print(json.dumps({
            "status": "reference_empty",
            "note": "no source files under " + args.ref + "; the extraction "
            "contract stays validated by committed goldens only "
            "(SURVEY.md §0). Re-run when the mount is populated.",
        }))
        return 0

    pat = check_patterns(ref_files)
    cons = check_constants(ref_files)
    gold = check_goldens(args.ref)
    drift = bool(pat["missing_in_reference"]) or bool(
        gold.get("mismatches")
    )
    checkable = pat["scanned_files"] > 0 or gold["compared"] > 0
    out = {
        "status": "drift" if drift else ("ok" if checkable else "no_surface"),
        "patterns": pat,
        "constants": cons,
        "goldens": gold,
    }
    print(json.dumps(out, indent=2))
    if drift:
        return 1
    return 0 if checkable else 2


if __name__ == "__main__":
    sys.exit(main())
