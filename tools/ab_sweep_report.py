#!/usr/bin/env python3
"""Aggregate the seeded A/B sweep into per-config noise bands.

Usage: python tools/ab_sweep_report.py [results/ab_sweep_r4]

Each cell directory (c<config>_s<seed>) holds `ref.out` (the unmodified
reference torch run, tools/reference_ab.py --phase ref) and `ours_tpu.out`
(our CLI on the same exported scene, --phase ours --ours-device tpu). The
final test PSNRs are printed by both sides in the same format
(`======> {ref|ours} test all psnr: <value> <===`). This report gives, per
config: per-seed PSNRs, per-seed gaps, and the gap mean +- sample std —
the measured run-noise band the +-0.1 dB parity question is judged
against (VERDICT round 3, item 1).
"""

from __future__ import annotations

import math
import re
import sys
from pathlib import Path

PSNR_RE = re.compile(r"======> (ref|ours) test all psnr: ([0-9.]+)")


def last_psnr(path: Path, side: str) -> tuple[float | None, str]:
    """Returns (value, status) with status in ok/missing/preempted/no-psnr
    — the caller WARNS on every non-ok cell so a silently shrunken n is
    impossible (round-4 ADVICE: rejected/lost cells used to vanish from
    the band with no indication)."""
    if not path.exists():
        return None, "missing"
    text = path.read_text(errors="replace")
    if "'preempted': True" in text:
        # A graceful SIGTERM preemption still evaluates and prints a final
        # PSNR — from a PARTIALLY TRAINED model. Never a valid sweep cell
        # (round-4 restarts left two such cells: c4_s0 @300/600, c4_s2
        # @8/600); the cell must be rerun.
        return None, "preempted"
    val = None
    for line in text.splitlines():
        m = PSNR_RE.search(line)
        if m and m.group(1) == side:
            val = float(m.group(2))
    return val, ("ok" if val is not None else "no-psnr")


def recovered_psnr(cell: Path, side: str) -> float | None:
    """Values salvaged from committed logs when a cell's own .out was lost
    (the per-cell log/ dirs are gitignored; a round restart wipes them).
    RECOVERED.json carries the value plus its provenance line."""
    f = cell / "RECOVERED.json"
    if not f.exists():
        return None
    import json

    return json.loads(f.read_text()).get(f"{side}_psnr_db")


# PARITY.md / BASELINE.json config numbering (tools/ab_seed_sweep.py)
CONFIG_NAMES = {
    "1": "plain TriPlane (InfoInv code, no --infoinv)",
    "2": "InfoInv encoding (control)",
    "3": "TriPlane, gauge disabled (gauge_start > iters)",
    "4": "TriPlane, learned gauge (gauge_start 400)",
}


def _stats(vals: list[float]) -> tuple[float, float | None]:
    mean = sum(vals) / len(vals)
    if len(vals) < 2:
        return mean, None
    var = sum((v - mean) ** 2 for v in vals) / (len(vals) - 1)
    return mean, math.sqrt(var)


def main() -> None:
    argv = [a for a in sys.argv[1:] if a != "--json"]
    write_json = "--json" in sys.argv
    root = Path(argv[0] if argv else "results/ab_sweep_r4")
    cells: dict[str, dict[int, tuple[float | None, float | None]]] = {}
    for d in sorted(root.iterdir()):
        m = re.fullmatch(r"c(\d+)_s(\d+)", d.name)
        if not m:
            continue
        cfg, seed = m.group(1), int(m.group(2))
        vals = {}
        for side, pattern in (("ref", "ref*.out"), ("ours", "ours_tpu*.out")):
            # Reruns get unique attempt-numbered logs (tools/launch_guard.sh)
            # — newest valid file wins; a fixed name never gets truncated
            # again (round-4 ADVICE, c2_s1 collision).
            val, status = None, "missing"
            for f in sorted(d.glob(pattern),
                            key=lambda p: p.stat().st_mtime, reverse=True):
                val, status = last_psnr(f, side)
                if val is not None:
                    break
            if val is None:
                val = recovered_psnr(d, side)
                if val is not None:
                    status = "recovered"
            if val is None:
                print(
                    f"WARNING: {d.name} {side} side dropped from the band "
                    f"({pattern}: {status}, no RECOVERED.json value) — "
                    f"n shrinks; rerun the cell",
                    file=sys.stderr,
                )
            vals[side] = val
        cells.setdefault(cfg, {})[seed] = (vals["ref"], vals["ours"])
    summary: dict[str, dict] = {}
    for cfg in sorted(cells):
        print(f"config #{cfg}: {CONFIG_NAMES.get(cfg, '?')}")
        gaps, refs, ourss = [], [], []
        for seed in sorted(cells[cfg]):
            ref, ours = cells[cfg][seed]
            gap = None if ref is None or ours is None else ours - ref
            if gap is not None:
                gaps.append(gap)
            if ref is not None:
                refs.append(ref)
            if ours is not None:
                ourss.append(ours)
            fmt = lambda v: "   --" if v is None else f"{v:5.2f}"
            print(
                f"  seed {seed}: ref {fmt(ref)}  ours {fmt(ours)}"
                f"  gap {fmt(gap)}"
            )
        row: dict = {"name": CONFIG_NAMES.get(cfg, "?"),
                     "cells": {s: {"ref": r, "ours": o}
                               for s, (r, o) in sorted(cells[cfg].items())}}
        if gaps:
            gm, gs = _stats(gaps)
            rm, rs = _stats(refs)
            om, os_ = _stats(ourss)
            row.update(gap_mean_db=round(gm, 2),
                       gap_std_db=None if gs is None else round(gs, 2),
                       n=len(gaps),
                       ref_mean_db=round(rm, 2),
                       ref_std_db=None if rs is None else round(rs, 2),
                       ours_mean_db=round(om, 2),
                       ours_std_db=None if os_ is None else round(os_, 2))
            if gs is not None:
                print(
                    f"  gap mean {gm:+.2f} dB, sample std {gs:.2f} dB"
                    f" (n={len(gaps)});  per-side seed std:"
                    f" ref {rs:.2f}, ours {os_:.2f}"
                )
        summary[cfg] = row
        print()
    # Markdown table for PARITY.md
    print("| config | ref mean±σ | ours mean±σ | gap mean±σ (n) |")
    print("|---|---|---|---|")
    for cfg, row in summary.items():
        if "gap_mean_db" not in row or row.get("gap_std_db") is None:
            continue
        print(
            f"| #{cfg} {row['name']} "
            f"| {row['ref_mean_db']:.2f} ± {row['ref_std_db']:.2f} "
            f"| {row['ours_mean_db']:.2f} ± {row['ours_std_db']:.2f} "
            f"| **{row['gap_mean_db']:+.2f} ± {row['gap_std_db']:.2f}**"
            f" (n={row['n']}) |"
        )
    if write_json:
        import json

        out = root / "BANDS.json"
        out.write_text(json.dumps(summary, indent=1))
        print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
