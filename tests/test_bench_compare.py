"""Unit pins for the bench-record adjudication logic in
``tools/bench_compare.py`` — the burst-note and declared-band mechanisms
are what make a noisy capture self-adjudicating, so their semantics are
pinned here against synthesized records (no Spark needed):

- extension flags consult ``calibration_timeline`` with a ±25-position
  neighborhood; headline flags consult the round-13
  ``headline_calibration_timeline`` with ±1;
- a declared probe band suppresses only the regression flag for readings
  inside it (improvements must still surface — r12 ADVICE);
- queries outside both phases never get an annotation.
"""

from __future__ import annotations

import importlib.util
import json
import os

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "bench_compare",
    os.path.join(os.path.dirname(__file__), "..", "tools", "bench_compare.py"),
)
bc = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(bc)


def _write(tmp_path, rec):
    p = tmp_path / "rec.json"
    p.write_text(json.dumps(rec))
    return str(p)


@pytest.fixture()
def record(tmp_path):
    return _write(
        tmp_path,
        {
            "queries": {"hl_a": 1.0, "hl_b": 2.0, "hl_c": 0.9},
            "extensions": {f"ext_{i}": 1.0 for i in range(60)},
            "capture": {
                # ext probes: clean at 0/25, burst at 50.
                "calibration_timeline": [[0, 0.2], [25, 0.21], [50, 0.66]],
                # headline probes: burst between entries 0 and 1.
                "headline_calibration_timeline": [
                    [-1, 0.2], [0, 0.55], [1, 0.2], [3, 0.2]
                ],
                "probe_bands": {"ext_0": [2.0, 7.0]},
            },
        },
    )


def test_burst_note_extension_neighborhood(record):
    note = bc.load_burst_note(record)
    # ext_55 sits within ±25 of the position-50 burst probe.
    assert "burst-adjacent" in note("ext_55")
    assert "sweep best 0.20s" in note("ext_55")
    # ext_10's neighborhood ([0, 25] probes) is clean.
    assert note("ext_10") == ""


def test_burst_note_headline_neighborhood(record):
    note = bc.load_burst_note(record)
    # hl_a (pos 0) and hl_b (pos 1) are within ±1 of the 0.55 s probe.
    assert "headline best" in note("hl_a")
    assert "headline best" in note("hl_b")
    # hl_c (pos 2): nearest probes are [1, 0.2] and [3, 0.2] — clean.
    assert note("hl_c") == ""


def test_burst_note_unknown_query(record):
    assert bc.load_burst_note(record)("nonexistent") == ""


def test_burst_note_missing_timelines(tmp_path):
    path = _write(tmp_path, {"queries": {"a": 1.0}, "extensions": {}})
    assert bc.load_burst_note(path)("a") == ""


def test_load_bands_and_values(record):
    assert bc.load_bands(record) == {"ext_0": [2.0, 7.0]}
    vals = bc.load(record)
    assert vals["hl_a"] == 1.0 and vals["ext_59"] == 1.0


def test_band_suppresses_regression_not_improvement(tmp_path, capsys):
    """End-to-end through main(): a banded probe reading inside its band
    is reported IN DECLARED BAND and not flagged; the same probe reading
    far BELOW its old median still surfaces as an improvement."""
    import sys

    new = _write(
        tmp_path,
        {
            "queries": {},
            "extensions": {"probe": 4.0, "fast": 0.2},
            "capture": {"probe_bands": {"probe": [2.0, 7.0]}},
        },
    )
    old = tmp_path / "old.json"
    old.write_text(json.dumps(
        {"queries": {}, "extensions": {"probe": 1.0, "fast": 0.9}}
    ))
    argv = sys.argv
    sys.argv = ["bench_compare.py", new, str(old)]
    try:
        bc.main()
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    assert "IN DECLARED BAND: probe" in out
    assert "REGRESSED: 0" in out
    assert "IMPROVED: 1" in out and "fast" in out
