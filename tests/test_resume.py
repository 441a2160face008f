"""Training-resume equivalence: a killed-and-resumed run must continue the
interrupted run's exact iteration sequence.

The reference has NO training resume (`InfoInv/main.py:191-360` /
`TriPlane/main.py:191-388` always start at iteration 0; `--ckpt` only feeds
render-only mode, `InfoInv/main.py:22-58`) — this is failure-recovery the
TPU framework adds for multi-hour runs. The contract tested here is strict:
train N iters straight vs. train to a checkpoint boundary, restart a fresh
trainer from the checkpoint, finish — identical final parameters, optimizer
moments, LR-schedule position, occupancy grid, kept-ray set and sampler
stream. On CPU the two paths run bit-identical programs, so the comparison
is exact equality, not a tolerance.
"""

import dataclasses
import os

import numpy as np
import pytest

import jax

from ngf_tpu.config import TrainArgs
from ngf_tpu.data import make_synthetic_dataset
from ngf_tpu.train.loop import TriPlaneTrainer
from ngf_tpu.utils.checkpoint import save_checkpoint


def resume_args(**kw) -> TrainArgs:
    base = dict(
        subsystem="infoinv",
        dataset_name="synthetic",
        batch_size=256,
        n_iters=160,
        nSamples=64,
        vis_every=0,
        N_vis=0,
        save_every=96,
        steps_per_call=8,
        upsamp_list=[],
        update_AlphaMask_list=[64],
        # Pin the decay horizon: n_iters differs between the straight run
        # and the to-the-checkpoint run, and lr_decay_iters defaults to
        # n_iters (config.py) — the schedules must match for equivalence.
        lr_decay_iters=160,
        seed=0,
        plane_res=32,
        gauge_res=32,
        alpha_grid_res=32,
        prewarm_events=0,  # background compile threads: pointless on CPU
    )
    base.update(kw)
    return TrainArgs(**base)


@pytest.fixture(scope="module")
def datasets():
    train = make_synthetic_dataset("train", n_views=6, wh=(40, 40))
    test = make_synthetic_dataset("test", n_views=2, wh=(40, 40))
    return train, test


def _leaves(tree):
    return [np.asarray(x) for x in jax.tree.leaves(tree)]


def _run_straight_and_resumed(args, datasets, tmp_path, tag):
    """Returns (straight_trainer, resumed_trainer) after n_iters each."""
    train_ds, test_ds = datasets

    straight_dir = os.path.join(tmp_path, f"{tag}_straight")
    straight = TriPlaneTrainer(args, train_ds, test_ds, straight_dir)
    straight.run()

    # Phase 1: identical config but stop AT the checkpoint boundary. All
    # run-loop boundaries below save_every coincide with the straight
    # run's, so the scan-block partition — and with it the PRNG-key and
    # sampler-draw sequences — is identical through iteration save_every.
    part_dir = os.path.join(tmp_path, f"{tag}_part")
    part_args = dataclasses.replace(args, n_iters=args.save_every)
    part = TriPlaneTrainer(part_args, train_ds, test_ds, part_dir)
    part.run()
    ckpt = os.path.join(part_dir, "model.npz")
    assert os.path.exists(ckpt)

    # Phase 2: fresh process-equivalent — a new trainer resumed from the
    # checkpoint, finishing the original schedule.
    resumed_dir = os.path.join(tmp_path, f"{tag}_resumed")
    resumed = TriPlaneTrainer.from_checkpoint(
        ckpt, args, train_ds, test_ds, resumed_dir
    )
    assert resumed.iteration == args.save_every
    resumed.run()
    return straight, resumed


class TestResumeEquivalence:
    def test_infoinv_resume_across_mask_event(self, datasets, tmp_path):
        args = resume_args()
        straight, resumed = _run_straight_and_resumed(
            args, datasets, str(tmp_path), "infoinv"
        )
        assert resumed.iteration == straight.iteration == args.n_iters
        for a, b in zip(_leaves(straight.params), _leaves(resumed.params)):
            np.testing.assert_array_equal(a, b)
        for a, b in zip(_leaves(straight.opt_state), _leaves(resumed.opt_state)):
            np.testing.assert_array_equal(a, b)
        # Stage state carried across the restart boundary.
        assert straight.all_rays.shape == resumed.all_rays.shape
        np.testing.assert_array_equal(straight._ray_ids, resumed._ray_ids)
        np.testing.assert_array_equal(
            np.asarray(straight.alpha.volume), np.asarray(resumed.alpha.volume)
        )
        assert straight._effective_sample_cap() == resumed._effective_sample_cap()

    def test_triplane_resume_event_at_boundary(self, datasets, tmp_path):
        # The hard case: shrink + upsample + optimizer reset fire AT the
        # checkpoint iteration (events run before save in the loop), and a
        # second upsample + gauge activation happen after the resume.
        args = resume_args(
            subsystem="triplane",
            update_AlphaMask_list=[64],
            upsamp_list=[96, 128],
            gauge_start=112,
            N_voxel_init=32 ** 3,
            N_voxel_final=40 ** 3,
        )
        straight, resumed = _run_straight_and_resumed(
            args, datasets, str(tmp_path), "triplane"
        )
        assert straight.grid_size == resumed.grid_size
        assert straight.n_voxel_list == resumed.n_voxel_list == []
        assert straight.step_size == pytest.approx(resumed.step_size)
        for a, b in zip(_leaves(straight.params), _leaves(resumed.params)):
            np.testing.assert_array_equal(a, b)
        for a, b in zip(_leaves(straight.opt_state), _leaves(resumed.opt_state)):
            np.testing.assert_array_equal(a, b)


class TestGracefulPreemption:
    def test_sigterm_checkpoints_and_resumes(self, datasets, tmp_path):
        # A real SIGTERM mid-run (preempted TPU slice): the loop must drain
        # the current block, write a RESUMABLE checkpoint at the exact
        # iteration, and exit cleanly — then a fresh trainer finishes the
        # schedule from it, mid-target remainder blocks and all.
        import signal

        train_ds, test_ds = datasets
        args = resume_args(n_iters=160, save_every=0, update_AlphaMask_list=[64])
        d = os.path.join(str(tmp_path), "preempt")
        trainer = TriPlaneTrainer(args, train_ds, test_ds, d)

        fired = []

        def cb(iteration, mse):
            # 100 is mid-target (not a boundary: spc=8, next boundary 160).
            if iteration >= 100 and not fired:
                fired.append(iteration)
                os.kill(os.getpid(), signal.SIGTERM)

        stats = trainer.run(progress_cb=cb)
        assert stats["preempted"] is True
        assert fired[0] <= stats["iterations"] < args.n_iters
        # Handler restored: a later SIGTERM must not be swallowed silently.
        assert signal.getsignal(signal.SIGTERM) != trainer.run

        ckpt = os.path.join(d, "model.npz")
        resumed = TriPlaneTrainer.from_checkpoint(
            ckpt, args, train_ds, test_ds, os.path.join(str(tmp_path), "pre2")
        )
        assert resumed.iteration == stats["iterations"]
        out = resumed.run()
        assert out["preempted"] is False
        assert out["iterations"] == args.n_iters
        # The resumed half actually trained (alpha stage, post-event).
        assert resumed.alpha is not None


class TestResumeGuards:
    def test_params_only_checkpoint_rejected(self, datasets, tmp_path):
        train_ds, test_ds = datasets
        args = resume_args()
        trainer = TriPlaneTrainer(args, train_ds, test_ds, None)
        path = os.path.join(str(tmp_path), "legacy.npz")
        # A reference-contract checkpoint: params + meta, no resume state.
        save_checkpoint(
            path, trainer.params,
            meta={"subsystem": "infoinv", "iteration": 0},
        )
        with pytest.raises(ValueError, match="no training-resume state"):
            TriPlaneTrainer.from_checkpoint(path, args, train_ds, test_ds)

    def test_subsystem_mismatch_rejected(self, datasets, tmp_path):
        train_ds, test_ds = datasets
        args = resume_args(n_iters=16, save_every=16, update_AlphaMask_list=[])
        d = os.path.join(str(tmp_path), "mismatch")
        trainer = TriPlaneTrainer(args, train_ds, test_ds, d)
        trainer.run()
        bad = dataclasses.replace(args, subsystem="triplane")
        with pytest.raises(ValueError, match="subsystem"):
            TriPlaneTrainer.from_checkpoint(
                os.path.join(d, "model.npz"), bad, train_ds, test_ds
            )
