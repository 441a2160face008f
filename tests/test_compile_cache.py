"""Cross-event program identity: mask events must not force fresh compiles.

On the remote-XLA TPU backend a fresh train-step compile costs minutes while
a byte-identical program hits the service-side compile cache in ~30 s
(CLAUDE.md "Environment quirks"). The trainer therefore passes everything a
mask event changes — the occupancy volume, its block table, its aabb — as
RUNTIME ARGUMENTS of the compiled stage block instead of closure constants,
so two events with the same static render config lower to byte-identical
HLO. These tests pin that property on CPU by comparing lowered module text
(constants baked into a program appear in its text, so equality proves
content-independence and cache-hit eligibility).

Reference events being accelerated: `InfoInv/main.py:320-332`,
`TriPlane/main.py:329-343`.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ngf_tpu.config import TrainArgs
from ngf_tpu.data import make_synthetic_dataset
from ngf_tpu.train.loop import TriPlaneTrainer


def tiny_args(**kw) -> TrainArgs:
    base = dict(
        subsystem="infoinv",
        dataset_name="synthetic",
        batch_size=512,
        n_iters=240,
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
    )
    base.update(kw)
    return TrainArgs(**base)


@pytest.fixture(scope="module")
def datasets():
    train = make_synthetic_dataset("train", n_views=6, wh=(48, 48))
    test = make_synthetic_dataset("test", n_views=2, wh=(48, 48))
    return train, test


def _lower_step_text(trainer, size: int = 4) -> str:
    args = trainer.args
    rays = jax.ShapeDtypeStruct((size, args.batch_size, 6), jnp.float32)
    rgbs = jax.ShapeDtypeStruct((size, args.batch_size, 3), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), size)
    its = jnp.zeros((size,), jnp.int32)
    l1 = jnp.float32(trainer.l1_weight)
    extra = ()
    if trainer._step_has_alpha:
        a = trainer.alpha
        extra = (a.volume, a.aabb, a.table)
    return trainer._step.lower(
        trainer.params, trainer.opt_state, rays, rgbs, keys, its, l1, *extra
    ).as_text()


class TestStageProgramIdentity:
    def test_mask_events_lower_to_identical_programs(self, datasets):
        """Two mask events with the same static config (fixed masked cap,
        dense shading, no shrink) must produce byte-identical stage programs
        even though the occupancy volume/table contents changed."""
        train_ds, test_ds = datasets
        trainer = TriPlaneTrainer(
            tiny_args(sample_cap=-1, open_sample_cap=64, masked_sample_cap=64),
            train_ds, test_ds, None,
        )
        for _ in range(2):
            trainer.train_block(8)

        trainer._event_update_alpha_mask(first=True)
        assert trainer._step_has_alpha
        vol1 = np.asarray(trainer.alpha.volume).copy()
        txt1 = _lower_step_text(trainer)

        for _ in range(4):
            trainer.train_block(8)
        trainer._event_update_alpha_mask(first=False)
        vol2 = np.asarray(trainer.alpha.volume)
        txt2 = _lower_step_text(trainer)

        # The event actually rebuilt the occupancy (the monotone-shrinking
        # rebuild may or may not flip voxels on a converging toy run, but the
        # arrays are distinct buffers either way) — and the program is
        # byte-identical regardless of the volume contents.
        assert vol1.shape == vol2.shape
        assert txt1 == txt2

    def test_mask_events_reuse_the_same_jit_wrapper(self, datasets):
        """Stronger than byte-identity: the second event must reuse the SAME
        jit wrapper (in-process memo, loop.py:_build_step), so every already
        compiled scan-block executable carries over — no re-trace and no
        compile-service round-trip at all (the measured ~2 min/event residual
        of the 4k-iter run, NOTES.md)."""
        train_ds, test_ds = datasets
        trainer = TriPlaneTrainer(
            tiny_args(sample_cap=-1, open_sample_cap=64, masked_sample_cap=64),
            train_ds, test_ds, None,
        )
        trainer.train_block(8)
        trainer._event_update_alpha_mask(first=True)
        step1 = trainer._step
        trainer.train_block(8)
        trainer._event_update_alpha_mask(first=False)
        assert trainer._step is step1

    def test_occupancy_machinery_jits_are_memoized(self):
        """The event-time machinery wrappers (alpha-grid chunk, occupied
        count, alpha ray filter) are module-level memos: the same static
        configuration returns the same wrapper, so later events hit the
        in-process executable cache."""
        from ngf_tpu.fields.triplane import TriPlaneConfig
        from ngf_tpu.train.occupancy import (
            _alpha_chunk_fn, _count_fn, _filter_alpha_fn,
        )

        cfg = TriPlaneConfig()
        assert _alpha_chunk_fn(cfg) is _alpha_chunk_fn(TriPlaneConfig())
        assert _count_fn(2.0, 6.0, 96) is _count_fn(2.0, 6.0, 96)
        assert _count_fn(2.0, 6.0, 96) is not _count_fn(2.0, 6.0, 128)
        assert _filter_alpha_fn(2.0, 6.0, 256) is _filter_alpha_fn(2.0, 6.0, 256)

    def test_stage_program_has_no_baked_occupancy(self, datasets):
        """The lowered stage program must not embed the occupancy volume or
        its 8-copy block table as constants: a 64^3 grid baked into the text
        would add megabytes. Program text staying small is the cheap proxy."""
        train_ds, test_ds = datasets
        trainer = TriPlaneTrainer(
            tiny_args(sample_cap=-1, open_sample_cap=64, masked_sample_cap=64),
            train_ds, test_ds, None,
        )
        trainer.train_block(8)
        trainer._event_update_alpha_mask(first=True)
        txt = _lower_step_text(trainer)
        table_bytes = int(np.prod(trainer.alpha.table.shape)) * 2  # bf16
        assert len(txt.encode()) < table_bytes, (
            f"stage HLO is {len(txt)} chars — larger than the occupancy "
            f"block table itself ({table_bytes} B); a mask array is likely "
            "baked in as a constant"
        )

    def test_prewarm_predicts_the_event_time_program(self, datasets):
        """The background prewarm (loop.py:_prewarm_worker) AOT-compiles a
        PREDICTED masked-stage program before the first event; its value is
        zero unless that program is byte-identical to the one `_build_step`
        creates at the event. Pin the prediction."""
        train_ds, test_ds = datasets
        trainer = TriPlaneTrainer(
            tiny_args(sample_cap=-1, open_sample_cap=64, masked_sample_cap=64),
            train_ds, test_ds, None,
        )
        rcfg_pred = trainer._predict_masked_stage_rcfg()
        assert rcfg_pred is not None
        fn_pred = trainer._build_step(rcfg=rcfg_pred, has_alpha=True, install=False)
        # the detached build must not have touched trainer state
        assert not trainer._step_has_alpha

        trainer.train_block(8)
        trainer._event_update_alpha_mask(first=True)
        assert trainer._render_cfg() == rcfg_pred

        # With the _build_step memo the prediction being right means the
        # event INSTALLS the prewarmed wrapper itself — every executable the
        # prewarm's warm calls compiled carries over to the run.
        assert trainer._step is fn_pred

    def test_prewarm_auto_cap_declines_unpredictable_stage(self, datasets):
        """With a fully-auto capacity (no masked_sample_cap) or rgb_cap=-2
        the stage program cannot be known before the event — the predictor
        must say so instead of seeding a wrong program."""
        train_ds, test_ds = datasets
        t1 = TriPlaneTrainer(
            tiny_args(sample_cap=-1, open_sample_cap=64), train_ds, test_ds, None
        )
        assert t1._predict_masked_stage_rcfg() is None
        t2 = TriPlaneTrainer(
            tiny_args(sample_cap=-1, open_sample_cap=64, masked_sample_cap=64,
                      rgb_cap=-2),
            train_ds, test_ds, None,
        )
        assert t2._predict_masked_stage_rcfg() is None

    def test_open_remainder_block_sizes(self, datasets):
        """The open stage's boundary-remainder scan blocks are distinct
        programs (measured: a 286 s main-thread compile at iteration 296 of
        the 30k schedule — the last cold compile the prewarm didn't cover).
        `_stage_block_sizes(0, stop=first_event)` must enumerate exactly the
        open-stage T values so `_prewarm_open_worker` can warm them."""
        train_ds, test_ds = datasets
        trainer = TriPlaneTrainer(
            tiny_args(sample_cap=-1, open_sample_cap=64, masked_sample_cap=64,
                      n_iters=3000, steps_per_call=8,
                      update_AlphaMask_list=[300, 2000, 2500]),
            train_ds, test_ds, None,
        )
        assert trainer._stage_block_sizes(0, stop=300) == {8, 4}
        # stop beyond n_iters clamps; stop at a multiple leaves only spc
        assert trainer._stage_block_sizes(0, stop=296) == {8}

    def test_open_prewarm_warms_the_installed_wrapper(self, datasets):
        """`_prewarm_open_worker` must execute the SAME memoized jit wrapper
        the run loop uses for the open stage (equal _build_step cache key),
        at the remainder block size — so the main thread's later call is an
        executable-cache hit, not a fresh compile."""
        import jax.tree_util as jtu

        train_ds, test_ds = datasets
        trainer = TriPlaneTrainer(
            tiny_args(sample_cap=-1, open_sample_cap=64, masked_sample_cap=64,
                      steps_per_call=8, update_AlphaMask_list=[12]),
            train_ds, test_ds, None,
        )
        trainer.train_block(8)  # installs the open wrapper (T=8 executable)
        installed = trainer._step
        opt_shapes = jtu.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), trainer.opt_state
        )
        sizes = trainer._stage_block_sizes(trainer.iteration, stop=12)
        sizes.discard(8)
        assert sizes == {4}
        trainer._prewarm_open_worker(trainer.params, opt_shapes, sizes)
        # the worker went through the same wrapper — no second jit object
        assert trainer._build_step(has_alpha=False, install=False) is installed
        # and the run itself completes through the remainder + event
        trainer.train_block(4)
        trainer._event_update_alpha_mask(first=True)
        assert trainer._step_has_alpha

    def test_occupancy_count_is_content_independent(self, datasets):
        """`occupied_samples_per_ray` runs at every event and upsample; its
        program must depend only on shapes. Two grids of identical shape but
        different contents must produce counts through the same traced path
        (exercised by calling with both and checking the math, since the jit
        wrapper is function-local)."""
        from ngf_tpu.train.occupancy import AlphaGrid, occupied_samples_per_ray

        train_ds, _ = datasets
        rng = np.random.default_rng(0)
        aabb = np.asarray(train_ds.scene_bbox, np.float32)
        rays = np.asarray(train_ds.all_rays[:2048], np.float32)
        near, far = (float(v) for v in train_ds.near_far)

        full = AlphaGrid(
            volume=jnp.ones((16, 16, 16), jnp.float32), aabb=jnp.asarray(aabb)
        )
        empty = AlphaGrid(
            volume=jnp.zeros((16, 16, 16), jnp.float32), aabb=jnp.asarray(aabb)
        )
        c_full = occupied_samples_per_ray(
            rays, full, aabb, near, far, 0.05, 96, chunk=1024
        )
        c_empty = occupied_samples_per_ray(
            rays, empty, aabb, near, far, 0.05, 96, chunk=1024
        )
        assert c_full.shape == (2048,) and c_empty.shape == (2048,)
        assert c_empty.sum() == 0
        assert c_full.max() > 0


class TestUpsamplePrewarm:
    """The TriPlane upsample event used to compile its stage program cold on
    the main thread (measured multi-minute stalls at shrink@600/upsample@800
    in the gauge E2E cert, NOTES.md). Everything that event installs becomes
    knowable at the end of the shrink (`TriPlane/main.py:345-357` is a pure
    function of the voxel schedule + final aabb + occupancy grid), so the
    trainer predicts and background-warms it. These pin the prediction."""

    def _trainer(self, datasets, **kw):
        train_ds, test_ds = datasets
        base = dict(
            subsystem="triplane", gauge_start=8, n_iters=64,
            update_AlphaMask_list=[16], upsamp_list=[32],
            N_voxel_init=48 ** 3, N_voxel_final=96 ** 3,
            sample_cap=-1, open_sample_cap=64, steps_per_call=8,
            prewarm_events=0,  # drive the worker synchronously in tests
        )
        base.update(kw)
        return TriPlaneTrainer(tiny_args(**base), train_ds, test_ds, None)

    def test_optimizer_reset_keeps_function_and_version(self, datasets):
        """An event reset re-creates a functionally identical optimizer
        (same per-leaf LRs and schedule) — the trainer must keep the
        optimizer OBJECT and `_opt_version`, or every program prewarmed
        before the event dies on the version bump."""
        t = self._trainer(datasets)
        opt, ver, state = t.optimizer, t._opt_version, t.opt_state
        t._make_optimizer(reset=True)
        assert t.optimizer is opt
        assert t._opt_version == ver
        assert t.opt_state is not state  # the STATE did restart

    def test_predicts_and_installs_the_event_program(self, datasets):
        t = self._trainer(datasets)
        for _ in range(2):
            t.train_block(8)
        t._event_update_alpha_mask(first=True)  # shrink @16
        pred = t._predict_upsample_rcfg()
        assert pred is not None
        nxt, reso, rcfg_pred = pred
        assert nxt == 32

        param_shapes = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), t.params
        )
        t._prewarm_upsample_worker(param_shapes)
        fn_pred = t._step_jit_cache.get((rcfg_pred, True, t._opt_version))
        assert fn_pred is not None
        assert fn_pred is not t._step  # a future stage, not the current one

        for _ in range(2):
            t.train_block(8)
        t._event_upsample()
        # the prediction held exactly: the event installed the prewarmed
        # wrapper itself, so every warmed scan-block executable carries over
        assert t._render_cfg() == rcfg_pred
        assert t._step is fn_pred
        assert tuple(t.grid_size) == reso  # the predicted target resolution
        t.train_block(8)  # and it trains

    def test_declines_when_a_mask_event_intervenes(self, datasets):
        """A mask event strictly BETWEEN now and the upsample rebuilds the
        occupancy grid from weights that haven't trained yet — prediction
        must decline."""
        t = self._trainer(datasets, update_AlphaMask_list=[16, 24])
        for _ in range(2):
            t.train_block(8)
        t._event_update_alpha_mask(first=True)
        assert t._predict_upsample_rcfg() is None

    def test_co_scheduled_mask_upsample_predicts_from_snapshot(self, datasets):
        """The reference lego schedule co-fires mask+upsample at the same
        iterations (`TriPlane/configs/lego.txt` 2000/2500). The mask rebuild
        the upsample's capacity re-measure uses is then SIMULATED from a
        params snapshot; without one the prediction declines (round-4 gauge
        30k run paid 121.8 s at the second upsample for want of this)."""
        t = self._trainer(datasets, update_AlphaMask_list=[16, 32])
        for _ in range(2):
            t.train_block(8)
        t._event_update_alpha_mask(first=True)  # first mask+shrink @16

        # co-scheduled at 32: declines without a snapshot...
        assert t._predict_upsample_rcfg() is None
        # ...predicts with one
        snap = jax.tree.map(lambda x: x.copy(), t.params)
        pred = t._predict_upsample_rcfg(params=snap)
        assert pred is not None
        nxt, reso, rcfg_pred = pred
        assert nxt == 32

        param_shapes = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), t.params
        )
        t._prewarm_upsample_worker(param_shapes, snap)
        fn_pred = t._step_jit_cache.get((rcfg_pred, True, t._opt_version))
        assert fn_pred is not None

        for _ in range(2):
            t.train_block(8)
        # the event sequence the run loop executes at iteration 32
        t._event_update_alpha_mask(first=False)
        t._event_upsample()
        assert tuple(t.grid_size) == reso
        # On this deterministic tiny run the simulated occupancy holds, so
        # the event installs the prewarmed wrapper itself.
        assert t._render_cfg() == rcfg_pred
        assert t._step is fn_pred
        t.train_block(8)  # and it trains

    def test_first_event_speculation_installs_exactly(self, datasets):
        """The first TriPlane event chain (grid → shrink → co-scheduled
        upsample → capacity → stage) simulated from a params snapshot
        yields the EXACT program the event installs when the weights don't
        drift in between (153.6 s @2000→2016 of the round-4 gauge 30k run;
        deterministic here: no training between speculation and event)."""
        t = self._trainer(datasets, update_AlphaMask_list=[16],
                          upsamp_list=[16])
        for _ in range(2):
            t.train_block(8)
        before = dict(t._step_jit_cache)
        t._first_event_worker(jax.tree.map(lambda x: x.copy(), t.params))
        speculated = [k for k in t._step_jit_cache if k not in before]
        assert len(speculated) == 1
        fn_pred = t._step_jit_cache[speculated[0]]

        t._event_update_alpha_mask(first=True)
        t._event_upsample()
        assert t._step is fn_pred  # prediction held: aabb, caps, geometry
        t.train_block(8)

    def test_first_event_prewarm_trigger_alignment(self, datasets):
        t = self._trainer(datasets, update_AlphaMask_list=[20],
                          upsamp_list=[40], prewarm_events=1)
        trig = t._first_event_prewarm_iter()
        assert trig is not None and trig % 8 == 0 and 0 < trig < 20
        # not for infoinv / already-masked / disabled
        assert self._trainer(datasets)._first_event_prewarm_iter() is None

    def test_stage_block_prewarm_covers_remainders(self, datasets, monkeypatch):
        """After an event installs a stage, its boundary-remainder scan
        blocks warm in the background (the 66.5 s 4-step-remainder stall at
        2496→2500 of the round-4 gauge 30k run). The first block size is
        the main thread's own next compile and is excluded."""
        t = self._trainer(datasets, prewarm_events=1, n_iters=60,
                          update_AlphaMask_list=[16], upsamp_list=[])
        calls = []
        monkeypatch.setattr(
            t, "_warm_stage_blocks",
            lambda fn, ps, os_, sizes, grid: calls.append((sizes, grid)),
        )
        for _ in range(2):
            t.train_block(8)
        t._event_update_alpha_mask(first=True)
        th = getattr(t, "_prewarm_stage_blocks_thread", None)
        assert th is not None
        th.join(timeout=60)
        # from iteration 16 with spc=8 and n_iters=60: blocks 8×5 + 4 —
        # the remainder {4} is warmed, the steady 8 is not re-warmed.
        assert calls and calls[-1][0] == [4]
        assert calls[-1][1] is t.alpha  # masked stage: grid args included

    def test_declines_event_measured_shading_cap(self, datasets):
        t = self._trainer(datasets, rgb_cap=-2)
        for _ in range(2):
            t.train_block(8)
        t._event_update_alpha_mask(first=True)
        assert t._predict_upsample_rcfg() is None

    def test_full_run_with_prewarm_thread(self, datasets):
        """End-to-end: the hook spawns the worker at the shrink event and
        the run completes through the upsample with the prewarmed program."""
        t = self._trainer(datasets, prewarm_events=1, n_iters=48)
        stats = t.run()
        assert stats["iterations"] == 48
        th = getattr(t, "_prewarm_upsample_thread", None)
        assert th is not None
        th.join(timeout=300)
        assert not th.is_alive()
