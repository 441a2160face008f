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


def last_psnr(path: Path, side: str) -> float | None:
    if not path.exists():
        return None
    text = path.read_text(errors="replace")
    if "'preempted': True" in text:
        # A graceful SIGTERM preemption still evaluates and prints a final
        # PSNR — from a PARTIALLY TRAINED model. Never a valid sweep cell
        # (round-4 restarts left two such cells: c4_s0 @300/600, c4_s2
        # @8/600); the cell must be rerun.
        return None
    val = None
    for line in text.splitlines():
        m = PSNR_RE.search(line)
        if m and m.group(1) == side:
            val = float(m.group(2))
    return val


def recovered_psnr(cell: Path, side: str) -> float | None:
    """Values salvaged from committed logs when a cell's own .out was lost
    (the per-cell log/ dirs are gitignored; a round restart wipes them).
    RECOVERED.json carries the value plus its provenance line."""
    f = cell / "RECOVERED.json"
    if not f.exists():
        return None
    import json

    return json.loads(f.read_text()).get(f"{side}_psnr_db")


def main() -> None:
    root = Path(sys.argv[1] if len(sys.argv) > 1 else "results/ab_sweep_r4")
    cells: dict[str, dict[int, tuple[float | None, float | None]]] = {}
    for d in sorted(root.iterdir()):
        m = re.fullmatch(r"c(\d+)_s(\d+)", d.name)
        if not m:
            continue
        cfg, seed = m.group(1), int(m.group(2))
        ref = last_psnr(d / "ref.out", "ref")
        if ref is None:
            ref = recovered_psnr(d, "ref")
        ours = last_psnr(d / "ours_tpu.out", "ours")
        if ours is None:
            ours = recovered_psnr(d, "ours")
        cells.setdefault(cfg, {})[seed] = (ref, ours)
    for cfg in sorted(cells):
        print(f"config #{cfg}:")
        gaps = []
        for seed in sorted(cells[cfg]):
            ref, ours = cells[cfg][seed]
            gap = None if ref is None or ours is None else ours - ref
            if gap is not None:
                gaps.append(gap)
            fmt = lambda v: "   --" if v is None else f"{v:5.2f}"
            print(
                f"  seed {seed}: ref {fmt(ref)}  ours {fmt(ours)}"
                f"  gap {fmt(gap)}"
            )
        if len(gaps) >= 2:
            mean = sum(gaps) / len(gaps)
            var = sum((g - mean) ** 2 for g in gaps) / (len(gaps) - 1)
            print(
                f"  gap mean {mean:+.2f} dB, sample std {math.sqrt(var):.2f} dB"
                f" (n={len(gaps)})"
            )
        print()


if __name__ == "__main__":
    main()
