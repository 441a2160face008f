#!/usr/bin/env python3
"""Decompose a training run's wall clock from its scalars.jsonl.

Usage: python tools/analyze_run_wall.py log/<exp>/scalars.jsonl

Reports total wall, per-stage steady-state ms/step (the stall gaps split
the run into stages — open stage, masked stage(s) — and each segment gets
its own median so the output matches the NOTES.md time-to-30k
decomposition), and the event/compile overhead at each stage boundary. A
"stall" is any inter-record gap > 5x the running median: at steady state
the trainer emits a scalar record every `progress_refresh_rate`
iterations, so stalls are compiles / event machinery / eval, not train
steps.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    path = sys.argv[1]
    recs = [json.loads(l) for l in open(path) if l.strip()]
    recs = [r for r in recs if "train/psnr" in r]
    if len(recs) < 3:
        print("too few records")
        return
    gaps = []  # (step, wall_gap, iters_in_gap)
    for a, b in zip(recs, recs[1:]):
        n = b["step"] - a["step"]
        if n <= 0:  # duplicate-step record (resume overlap): no iters ran
            continue
        gaps.append((b["step"], b["wall"] - a["wall"], n))
    per_step = sorted(g[1] / g[2] for g in gaps)
    med = per_step[len(per_step) // 2]
    stalls = [(s, w, n) for (s, w, n) in gaps if w / n > 5 * med]
    steady = [w / n for (s, w, n) in gaps if w / n <= 5 * med]
    steady_ms = 1000 * sum(steady) / max(1, len(steady))
    total = recs[-1]["wall"] - recs[0]["wall"]
    stall_s = sum(w for _, w, _ in stalls)
    print(f"records {len(recs)}  steps {recs[0]['step']}..{recs[-1]['step']}")
    print(
        f"initial trace+compile (wall at first record, step {recs[0]['step']}):"
        f" {recs[0]['wall']/60:.1f} min"
    )
    print(f"total wall between records: {total/60:.1f} min")
    print(f"steady-state: {steady_ms:.1f} ms/step (median-filtered, global)")
    print(f"stall total: {stall_s/60:.1f} min across {len(stalls)} gaps:")
    for s, w, n in stalls:
        print(f"  @step {s:>6}: {w:7.1f}s over {n} iters")
    # Per-stage steady state: stalls mark stage boundaries (events/compiles);
    # the segments between them are homogeneous programs (open vs masked).
    segments: list[list[tuple[int, float, int]]] = [[]]
    for s, w, n in gaps:
        if w / n > 5 * med:
            segments.append([])
            continue
        segments[-1].append((s, w, n))
    print("per-stage steady state (segments between stalls):")
    for seg in segments:
        if len(seg) < 3:
            continue
        rates = sorted(w / n for _, w, n in seg)
        seg_med = 1000 * rates[len(rates) // 2]
        lo, hi = seg[0][0], seg[-1][0]
        iters = sum(n for _, _, n in seg)
        print(f"  steps {lo:>6}..{hi:>6} ({iters:>5} iters): {seg_med:6.1f} ms/step")


if __name__ == "__main__":
    main()
