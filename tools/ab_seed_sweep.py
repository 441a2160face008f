#!/usr/bin/env python3
"""Seed-replicated A/B noise bands for the BASELINE config matrix.

Round-3 measured the gauge configs (#3 gauge-disabled, #4 learned gauge)
at -0.29 dB each with n=1 — consistent with run noise OR a small
systematic gap. This drives `tools/reference_ab.py` over seeds x configs
(both sides seeded identically per run; the exported scene is
deterministic and shared), serialized for the single-core host, and
reports per-config mean +- sigma per side plus the gap in units of the
pooled noise sigma. Resumable: a run with an existing ab_result.json is
skipped, so the sweep can be stopped/restarted freely.

Usage:
  python tools/ab_seed_sweep.py --out /tmp/ab_sweep [--seeds 0 1 2]
                                [--configs c3 c4 c2] [--report-only]

Writes <out>/summary.json and prints the table.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import subprocess
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

# BASELINE config matrix rows (PARITY.md): flags passed to reference_ab.py.
CONFIGS = {
    # 3: TriPlane, gauge disabled (gauge_start > n_iters); reference lego
    #   event order: alpha+shrink+upsample co-scheduled @300.
    "c3": ["--subsystem", "triplane", "--iters", "600", "--alpha-at", "300",
           "--upsamp-at", "300", "--gauge-start", "1000"],
    # 4: TriPlane, learned gauge active after the events (gauge@400).
    "c4": ["--subsystem", "triplane", "--iters", "600", "--alpha-at", "300",
           "--upsamp-at", "300", "--gauge-start", "400"],
    # 2: InfoInv encoding (control; round-3 n=1 gap was +0.08).
    "c2": ["--subsystem", "infoinv", "--infoinv", "1", "--iters", "800",
           "--alpha-at", "400"],
}


def run_one(out_root: str, cfg: str, seed: int,
            ours_device: str = "cpu") -> dict | None:
    out = os.path.join(out_root, f"{cfg}_s{seed}")
    result = os.path.join(out, "log", "ab_result.json")
    if os.path.exists(result):
        with open(result) as f:
            return json.load(f)
    cmd = [sys.executable, os.path.join(REPO, "tools", "reference_ab.py"),
           "--out", out, "--seed", str(seed),
           "--ours-device", ours_device] + CONFIGS[cfg]
    t0 = time.time()
    print(f"[sweep] {cfg} seed={seed} ...", flush=True)
    rc = subprocess.run(cmd, cwd=REPO).returncode
    if rc != 0 or not os.path.exists(result):
        print(f"[sweep] {cfg} seed={seed} FAILED rc={rc}", flush=True)
        return None
    print(f"[sweep] {cfg} seed={seed} done in {(time.time()-t0)/60:.1f} min",
          flush=True)
    with open(result) as f:
        return json.load(f)


def stats(xs: list[float]) -> tuple[float, float]:
    m = sum(xs) / len(xs)
    var = sum((x - m) ** 2 for x in xs) / max(1, len(xs) - 1)
    return m, math.sqrt(var)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/ab_sweep")
    p.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    p.add_argument("--configs", nargs="+", default=["c3", "c4", "c2"],
                   choices=sorted(CONFIGS))
    p.add_argument("--report-only", action="store_true",
                   help="summarize existing results without launching runs")
    p.add_argument("--ours-device", default="cpu", choices=["cpu", "tpu"],
                   dest="ours_device",
                   help="passed through to reference_ab.py (keep one device "
                        "per config so each noise band is methodologically "
                        "uniform)")
    a = p.parse_args()
    os.makedirs(a.out, exist_ok=True)

    summary: dict[str, dict] = {}
    for cfg in a.configs:
        rows = []
        for seed in a.seeds:
            if a.report_only:
                path = os.path.join(a.out, f"{cfg}_s{seed}",
                                    "log", "ab_result.json")
                if not os.path.exists(path):
                    continue
                with open(path) as f:
                    rows.append((seed, json.load(f)))
            else:
                r = run_one(a.out, cfg, seed, a.ours_device)
                if r is not None:
                    rows.append((seed, r))
        if not rows:
            continue
        refs = [r["ref_psnr_db"] for _, r in rows]
        ours = [r["ours_psnr_db"] for _, r in rows]
        gaps = [r["gap_db"] for _, r in rows]
        rm, rs = stats(refs)
        om, os_ = stats(ours)
        gm, gs = stats(gaps)
        # Pooled per-run noise: both sides' seed-to-seed sigma.
        pooled = math.sqrt((rs ** 2 + os_ ** 2) / 2) if len(rows) > 1 else 0.0
        summary[cfg] = {
            "seeds": [s for s, _ in rows],
            "ref_psnr_db": refs, "ours_psnr_db": ours, "gap_db": gaps,
            "ref_mean": round(rm, 2), "ref_sigma": round(rs, 3),
            "ours_mean": round(om, 2), "ours_sigma": round(os_, 3),
            "gap_mean": round(gm, 2), "gap_sigma": round(gs, 3),
            "pooled_run_sigma": round(pooled, 3),
            "gap_in_sigmas": round(gm / pooled, 2) if pooled else None,
        }
        print(f"{cfg}: ref {rm:.2f}±{rs:.2f}  ours {om:.2f}±{os_:.2f}  "
              f"gap {gm:+.2f}±{gs:.2f}  (pooled σ={pooled:.2f})", flush=True)
    with open(os.path.join(a.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
