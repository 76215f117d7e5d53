"""tools/: reference re-verification (ref_diff) behavior."""

import json


def test_ref_diff_empty_reference_is_warning_noop(tmp_path, capsys):
    from tools.ref_diff import main

    empty = tmp_path / "ref"
    empty.mkdir()
    assert main(["--ref", str(empty)]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["status"] == "reference_empty"


def test_ref_diff_flags_missing_patterns(tmp_path, capsys):
    ref = tmp_path / "ref"
    ref.mkdir()
    (ref / "cleaners.py").write_text('REGEX = ["mediaarticlerelated"]\n')
    from tools.ref_diff import main

    assert main(["--ref", str(ref)]) == 1  # drift: most patterns absent
    out = json.loads(capsys.readouterr().out)
    assert out["status"] == "drift"
    assert len(out["patterns"]["missing_in_reference"]) > 0


def test_ref_diff_green_when_reference_carries_contract(tmp_path, capsys):
    import importlib.resources as ilr

    pats = (ilr.files("crawtext_ray") / "resources" /
            "boilerplate_patterns.txt").read_text()
    ref = tmp_path / "ref"
    ref.mkdir()
    (ref / "cleaners.py").write_text(
        "REGEX = " + repr(pats.split()) +
        "\n# constants: 3 5 40 5.0 0.5 0.25 1.0\n"
    )
    from tools.ref_diff import main

    assert main(["--ref", str(ref)]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["status"] == "ok"
    assert out["patterns"]["missing_in_reference"] == []
