"""The FinalResults diff tool used by the parity recipe
(docs/PARITY.md §2c)."""

import json
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "script"))
import diff_final_results as DFR  # noqa: E402


def _write(path, pck_avg):
    res = {"final_results": {
        m: [50.0, 60.0, 55.0] for m in DFR.METRICS}}
    for m in list(res["final_results"]):
        res["final_results"][m + "_univ"] = res["final_results"][m]
    res["final_results"]["pck_rel"] = [80.0, 82.0, pck_avg]
    with open(path, "w") as f:
        json.dump(res, f)


def test_diff_passes_within_tolerance(tmp_path, capsys):
    a, b = str(tmp_path / "a.json"), str(tmp_path / "b.json")
    _write(a, 81.0)
    _write(b, 81.4)
    assert DFR.main([a, b]) == 0
    out = capsys.readouterr().out
    assert "PASS" in out and "Avg." in out


def test_diff_fails_outside_tolerance(tmp_path, capsys):
    a, b = str(tmp_path / "a.json"), str(tmp_path / "b.json")
    _write(a, 81.0)
    _write(b, 82.0)
    assert DFR.main([a, b]) == 1


def test_diff_custom_tolerance(tmp_path):
    a, b = str(tmp_path / "a.json"), str(tmp_path / "b.json")
    _write(a, 81.0)
    _write(b, 82.0)
    assert DFR.main([a, b, "--pck-tol", "2.0"]) == 0
