"""Compare bench records and flag drift OUTSIDE the measured noise band.

Single-rep extension timings on this host swing ±30-50% run-to-run (GC /
page-cache / JVM-warm-up — see NOTES_r7.md "Bench discipline"), so a naive
old-vs-new ratio flags noise every round. This tool takes ANY number of
records (e.g. the committed idle capture BENCH_FULL_LOCAL.json, the latest
driver capture BENCH_FULL_DRIVER.json — bench.py writes there by default and
only writes BENCH_FULL_LOCAL.json under FXSPARK_BENCH_OUT — plus committed
versions via `git show <ref>:BENCH_FULL_LOCAL.json > /tmp/old.json`), uses
the per-query
MEDIAN across records as the stable signal, and flags only queries whose
newest reading exceeds both the cross-record median by `--band` (default
1.5x) AND an absolute floor (default 0.5 s) — sub-floor entries are
stage-floor-bound and never meaningfully regress.

Usage:
    python tools/bench_compare.py new.json old1.json [old2.json ...]
"""

from __future__ import annotations

import argparse
import json
import statistics


def load(path: str) -> dict[str, float]:
    with open(path) as fh:
        d = json.load(fh)
    out = dict(d.get("queries", {}))
    out.update(d.get("extensions", {}))
    return {k: v for k, v in out.items() if isinstance(v, (int, float)) and v > 0}


def load_bands(path: str) -> dict[str, list[float]]:
    """Per-probe DECLARED expected bands from the record's capture block.

    Some bench-only probes are sweep-context-sensitive (the Misra-Gries
    token pass, keyed ``tokens_mg_pass_{doc_rows//1000}k`` — the key is
    derived from FXSPARK_BENCH_DOC_ROWS, not hardcoded: ~1.0 s solo, 3-6 s
    after the 240-query sweep has filled the JVM heap with checkpoint
    blocks and code-cache — a recurring false regression since r8).
    bench.py declares the expected range for ONLY the in-sweep regime the
    capture can produce (the band endpoints scale linearly with the corpus
    size the capture declares via FXSPARK_BENCH_DOC_ROWS — the floor is
    2.0 s × doc_rows/200k, so a solo-fast reading still surfaces under
    the median rule at any corpus size); a new reading inside
    its declared band is reported separately and never flagged as a
    regression, but still gets the improvement check.
    """
    with open(path) as fh:
        d = json.load(fh)
    return dict((d.get("capture") or {}).get("probe_bands", {}))


def load_burst_note(path: str):
    """Return fn(query) -> annotation for mid-sweep load bursts.

    The capture's ``calibration_timeline`` holds [sweep position,
    calibration seconds] at each cleanup boundary; the record's
    ``extensions`` dict preserves sweep order, so a query's position is
    its key index. A flagged query whose NEAREST timeline probes read
    >1.5x the sweep's best probe sat inside a load burst — annotate it
    so the reader adjudicates burst-vs-regression from the record alone
    (round-11 observed two such bursts, different query segments, both
    solo-remeasure clean while endpoint calibrations read clean too).

    Headline queries get the same adjudication from the capture's
    ``headline_calibration_timeline`` (one probe between each pair of
    headline entries, positions = indices into the ``queries`` capture
    order) — before r13 the headline phase had only endpoint probes, so a
    mid-phase burst (r11 capture G: 4.56→6.64 s swing) was unadjudicable.
    """
    with open(path) as fh:
        d = json.load(fh)
    cap = d.get("capture") or {}
    ext_pos = {q: i for i, q in enumerate(d.get("extensions", {}))}
    hl_pos = {q: i for i, q in enumerate(d.get("queries", {}))}
    # A query present in BOTH maps would only ever get the first phase's
    # adjudication — currently impossible (HEADLINE and EXTENSION are
    # disjoint in bench.py), and enforced here so a future overlap fails
    # loudly instead of silently picking a phase.
    overlap = set(ext_pos) & set(hl_pos)
    assert not overlap, f"query in both capture phases: {sorted(overlap)}"

    def hl_brackets(p: int) -> set:
        # Headline probes run BETWEEN entries: the probe recorded at
        # position i runs after query i, except the final endpoint probe
        # which is recorded at position len(queries). Query p is therefore
        # bracketed by probes {p-1, p}, with the LAST query bracketed by
        # {p-1, len} — never by p+1, which only runs after query p+1
        # completes and would let a later burst tag this query.
        after = p if p < len(hl_pos) - 1 else len(hl_pos)
        return {p - 1, after}

    phases = [
        # (timeline, query→position, probe-position filter, phase label)
        (cap.get("calibration_timeline") or [], ext_pos,
         lambda p, q: abs(p - ext_pos[q]) <= 25, "sweep"),
        (cap.get("headline_calibration_timeline") or [], hl_pos,
         lambda p, q: p in hl_brackets(hl_pos[q]), "headline"),
    ]

    def note(q: str) -> str:
        for timeline, pos, near_fn, label in phases:
            if q not in pos or not timeline:
                continue
            best = min(c for _, c in timeline)
            near = [c for p, c in timeline if near_fn(p, q)]
            if near and max(near) > 1.5 * best:
                return (
                    f"  [burst-adjacent: calib {max(near):.2f}s near pos "
                    f"{pos[q]}, {label} best {best:.2f}s]"
                )
            return ""
        return ""

    return note


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("new")
    ap.add_argument("old", nargs="+")
    ap.add_argument("--band", type=float, default=1.5)
    ap.add_argument("--floor", type=float, default=0.5)
    args = ap.parse_args()

    new = load(args.new)
    bands = load_bands(args.new)
    burst_note = load_burst_note(args.new)
    olds = [load(p) for p in args.old]
    flagged, improved, in_band = [], [], []
    for q, v in sorted(new.items()):
        hist = [o[q] for o in olds if q in o]
        if not hist:
            continue
        ref = statistics.median(hist)
        # A declared band suppresses only the REGRESSION flag (the band
        # documents expected in-sweep elevation); the improvement check
        # still runs so a banded probe getting faster is never hidden
        # (r12 ADVICE: the old `continue` swallowed improvements too).
        banded = q in bands and bands[q][0] <= v <= bands[q][1]
        if banded:
            in_band.append((q, bands[q], v))
        if v > max(ref * args.band, args.floor):
            if not banded:
                flagged.append((v / ref, q, ref, v))
        elif ref > args.floor and v < ref / args.band:
            improved.append((ref / v, q, ref, v))

    for q, b, v in in_band:
        print(f"IN DECLARED BAND: {q} now={v:.2f}s band=[{b[0]}, {b[1]}]")
    for label, rows in (("REGRESSED", flagged), ("IMPROVED", improved)):
        print(f"{label}: {len(rows)}")
        for r, q, ref, v in sorted(rows, reverse=True):
            note = burst_note(q) if label == "REGRESSED" else ""
            print(
                f"  {r:5.2f}x  {q:40s} median(old)={ref:6.2f}s "
                f"now={v:6.2f}s{note}"
            )
    if not flagged:
        print("no drift outside the noise band")


if __name__ == "__main__":
    main()
