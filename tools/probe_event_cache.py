"""Measure mask-event rebuild cost on the real chip: event 1 vs event 2.

The round-3 compile-cache change passes the occupancy volume/table/aabb (and
the event-time step_size) as runtime arguments instead of closure constants,
so a second mask event with an unchanged static config lowers to the SAME
HLO modules as the first (tests/test_compile_cache.py) and should hit the
remote-XLA service compile cache (~30 s) instead of paying fresh multi-minute
compiles. This probe times both events end-to-end (event machinery + the
first post-event train block, which is where the stage compile lands) on a
tiny synthetic config.

Run ON THE CHIP (default env): python tools/probe_event_cache.py
"""

import json
import sys
import time

sys.path.insert(0, ".")

from ngf_tpu.config import TrainArgs
from ngf_tpu.data import make_synthetic_dataset
from ngf_tpu.train.loop import TriPlaneTrainer


def main():
    args = TrainArgs(
        subsystem="infoinv",
        dataset_name="synthetic",
        batch_size=512,
        n_iters=192,
        nSamples=96,
        vis_every=0,
        N_vis=0,
        save_every=0,
        upsamp_list=[],
        update_AlphaMask_list=[],
        seed=0,
        plane_res=64,
        gauge_res=64,
        alpha_grid_res=64,
        sample_cap=-1,
        open_sample_cap=64,
        masked_sample_cap=64,  # fixed cap => identical static config at both events
        steps_per_call=8,
    )
    train_ds = make_synthetic_dataset("train", n_views=6, wh=(48, 48))
    trainer = TriPlaneTrainer(args, train_ds, None, None)

    t0 = time.time()
    trainer.train_block(8)  # open-stage compile
    t_open = time.time() - t0
    trainer.train_block(8)

    # event1: fresh compiles everywhere (no-prev alpha program + stage step).
    # event2: the alpha-grid build now takes the prev mask -> one fresh
    #   program; the count program and the masked STAGE step must be
    #   byte-identical to event1's -> service-cache hits.
    # event3: everything identical to event2 -> fully cached rebuild.
    timings = {"open_stage_first_block_s": round(t_open, 1)}
    for tag, first in (("event1", True), ("event2", False), ("event3", False)):
        t0 = time.time()
        trainer._event_update_alpha_mask(first=first)
        t_ev = time.time() - t0
        t0 = time.time()
        trainer.train_block(8)  # first masked block => stage compile (or cache hit)
        t_blk = time.time() - t0
        timings[f"{tag}_machinery_s"] = round(t_ev, 1)
        timings[f"{tag}_first_block_s"] = round(t_blk, 1)
        # a couple of steady blocks between events
        trainer.train_block(8)
        trainer.train_block(8)

    print(json.dumps(timings))


if __name__ == "__main__":
    main()
