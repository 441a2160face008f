"""Staged training driver for the InfoInv / TriPlane subsystems.

Re-creates the training semantics of `InfoInv/main.py:191-360` and
`TriPlane/main.py:191-388` on TPU:

- one compiled train step per *stage* (static shapes for XLA); stage
  boundaries are the reference's mid-training events:
  * alpha-mask creation/update at ``update_AlphaMask_list`` iterations
    (`InfoInv/main.py:320-332`), with the L1 weight dropping 8e-5 -> 4e-5
    and ray re-filtering at the first one,
  * TriPlane-only AABB shrink at the first mask update
    (`TriPlane/main.py:334-341`),
  * TriPlane-only grid upsampling at ``upsamp_list`` iterations with
    optimizer re-creation at initial LRs (`TriPlane/main.py:345-357`).
- per-iteration exponential LR decay folded into the optimizer
  (`InfoInv/main.py:298-299`),
- periodic eval renders + `log.txt` lines (`InfoInv/main.py:304-317`),
- checkpoints every 10k iterations (`InfoInv/main.py:335-336`).

Steps are dispatched in blocks via ``lax.scan`` ("steps_per_call") so host
-> device dispatch overhead amortizes across iterations — the TPU-native
replacement for the reference's per-iteration Python loop.
"""

from __future__ import annotations

import os
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..config import TrainArgs
from ..data.dataset import RayDataset
from ..data.sampler import SimpleSampler
from ..fields.triplane import (
    TriPlaneConfig,
    init_triplane,
    shrink_planes,
    upsample_planes,
)
from ..render.volume import RenderConfig, render_rays
from ..render.evaluation import evaluation
from ..utils.checkpoint import save_checkpoint
from ..utils.grid import cal_n_samples, grid_step_size, n_to_reso
from ..utils.metrics import mse2psnr
from .occupancy import (
    AlphaGrid,
    auto_sample_cap,
    filter_rays_alpha,
    filter_rays_bbox,
    occupied_samples_per_ray,
    shrink_box_voxels,
    update_alpha_mask,
)
from .state import make_optimizer, triplane_lr_tree
from ..fields.triplane import density_l1
from ..parallel.mesh import data_sharding, replicated_sharding


def model_config_from_args(args: TrainArgs) -> TriPlaneConfig:
    if args.subsystem == "triplane":
        base = TriPlaneConfig.gauge_preset(gauge_start=args.gauge_start)
    else:
        base = TriPlaneConfig.infoinv_preset(infoinv=args.infoinv)
    return TriPlaneConfig(
        **{
            **base.__dict__,
            "density_shift": args.density_shift,
            "distance_scale": args.distance_scale,
            "plane_res": args.plane_res,
            "gauge_res": args.gauge_res,
            "compute_dtype": args.compute_dtype,
        }
    )


class TriPlaneTrainer:
    """Owns params/opt state and the stage-compiled step functions."""

    def __init__(
        self,
        args: TrainArgs,
        train_dataset: RayDataset,
        test_dataset: RayDataset | None = None,
        logfolder: str | None = None,
        mesh=None,
        init_params=None,
        init_alpha: AlphaGrid | None = None,
        resume_state: dict | None = None,
    ):
        self.args = args
        self.train_dataset = train_dataset
        self.test_dataset = test_dataset
        self.logfolder = logfolder
        self.mesh = mesh
        self.log_lines: list[str] = []

        if args.Ortho_weight > 0:
            # The reference's orthogonality regularizer references tensors
            # that do not exist in the tri-plane models (`vector_comp_diffs`,
            # `InfoInv/models/Field.py:104-105` -- it would AttributeError at
            # any nonzero weight); fail loudly instead of silently ignoring.
            raise NotImplementedError(
                "Ortho_weight > 0: the reference's vector_comp_diffs is dead "
                "code for tri-plane models; no equivalent is defined."
            )

        self.model_cfg = model_config_from_args(args)
        self.aabb = np.asarray(train_dataset.scene_bbox, np.float32)
        # `InfoInv/main.py:218` hard-codes 256^3 voxels; the voxel grid must
        # track the plane resolution (shrink crops planes in voxel coords,
        # `TriPlane/models/Field.py:121-128`), so derive it from plane_res
        # (== 256 by default, reproducing the reference exactly).
        self.reso_cur = n_to_reso(args.plane_res ** 3, self.aabb)
        self.n_samples = min(args.nSamples, cal_n_samples(self.reso_cur, args.step_ratio))
        self.step_size = grid_step_size(self.aabb, self.reso_cur, args.step_ratio)
        self.grid_size = list(self.reso_cur)
        self._check_marching_coverage("init")

        key = jax.random.PRNGKey(args.seed)
        self.key, init_key = jax.random.split(key)
        self.params = (
            init_params
            if init_params is not None
            else init_triplane(init_key, self.model_cfg)
        )
        self.alpha: AlphaGrid | None = init_alpha
        # Default 8e-5, matching the reference's hardcode (`InfoInv/main.py:259`);
        # explicit --L1_weight_initial values take effect (see config.py note).
        self.l1_weight = args.L1_weight_initial
        # rgb_cap = -2 (auto) machinery: running ~p99.9 of per-ray shaded
        # group counts, reported by the train step; 0 = dense until measured.
        self._rgb_stat = 0
        self._auto_rgb_cap = 0
        self.iteration = 0
        self._sampler_birth = 0  # iteration the current sampler was created
        from ..utils.checkpoint import AsyncCheckpointWriter

        self._ckpt_writer = AsyncCheckpointWriter()

        self.n_voxel_list = self._voxel_schedule()

        rs = resume_state or {}
        if rs:
            # Mid-run restore (TriPlaneTrainer.from_checkpoint): override the
            # fresh-start geometry/schedule state with the checkpointed one.
            # The reference has no training resume at all (a killed
            # `InfoInv/main.py:191` run restarts from iteration 0); this is
            # the failure-recovery path for multi-hour runs.
            meta, extra = rs["meta"], rs["extra"]
            r = meta["resume"]
            self.iteration = int(meta["iteration"])
            self.aabb = np.asarray(meta["aabb"], np.float32)
            self.grid_size = [int(v) for v in meta["grid_size"]]
            self.reso_cur = list(self.grid_size)
            self.step_size = float(meta["step_size"])
            self.n_samples = int(meta["n_samples"])
            self.l1_weight = float(r["l1_weight"])
            self._rgb_stat = int(r["rgb_stat"])
            self._auto_rgb_cap = int(r["auto_rgb_cap"])
            if r.get("auto_cap") is not None:
                self._auto_cap = int(r["auto_cap"])
            self.n_voxel_list = [int(v) for v in r["n_voxel_list"]]
            self._sampler_birth = int(r["sampler_birth"])
            self.key = jnp.asarray(extra["key"], jnp.uint32)
            if rs.get("alpha_volume") is not None:
                self.alpha = AlphaGrid(
                    volume=jnp.asarray(rs["alpha_volume"], jnp.float32),
                    aabb=jnp.asarray(rs["alpha_aabb"], jnp.float32),
                ).build_table()

        # Stage-step jit memo: events whose static render config is unchanged
        # (every InfoInv mask event after the first) reuse the SAME jit
        # wrapper — and with it every executable already compiled in-process
        # (all scan-block sizes). See _build_step.
        self._step_jit_cache: dict = {}
        self._opt_version = 0

        # Ray pre-filter (bbox) before training (`InfoInv/main.py:252`).
        self.all_rays = np.asarray(train_dataset.all_rays, np.float32)
        self.all_rgbs = np.asarray(train_dataset.all_rgbs, np.float32)
        # _ray_ids: indices into the dataset's original ray order surviving
        # every filter so far (bbox now, alpha at the first mask event) —
        # checkpointed so resume restores the exact training set instead of
        # re-running the filters against possibly-evolved state.
        self._ray_ids = np.arange(self.all_rays.shape[0], dtype=np.int64)
        if rs:
            self._ray_ids = np.asarray(rs["extra"]["ray_ids"], np.int64)
            self.all_rays = self.all_rays[self._ray_ids]
            self.all_rgbs = self.all_rgbs[self._ray_ids]
        elif args.filter_rays:
            keep = filter_rays_bbox(self.all_rays, self.aabb)
            self.all_rays, self.all_rgbs = self.all_rays[keep], self.all_rgbs[keep]
            self._ray_ids = self._ray_ids[keep]
        self.sampler = SimpleSampler(self.all_rays.shape[0], args.batch_size, args.seed)
        if rs:
            # Fast-forward the epoch-permutation stream to the number of
            # batches TRAINING has consumed since this sampler's creation
            # (prefetch lookahead draws are deliberately not counted: they
            # were never trained on, and the resumed prefetcher re-draws
            # them from the identical stream position).
            for _ in range(self.iteration - self._sampler_birth):
                self.sampler.nextids()

        self._make_optimizer(reset=True)
        if rs:
            leaves = [
                rs["extra"][f"opt/{i:04d}"]
                for i in range(len(jax.tree.leaves(self.opt_state)))
            ]
            treedef = jax.tree.structure(self.opt_state)
            ref_leaves = jax.tree.leaves(self.opt_state)
            for got, want in zip(leaves, ref_leaves):
                if got.shape != want.shape:
                    raise ValueError(
                        f"resume optimizer state mismatch: {got.shape} vs "
                        f"{want.shape} — config/schedule differs from the "
                        "checkpointed run"
                    )
            self.opt_state = jax.tree.unflatten(
                treedef,
                [jnp.asarray(l, dtype=w.dtype) for l, w in zip(leaves, ref_leaves)],
            )
        self._build_step()
        if rs:
            # Same post-stage hook the events run: background-warm the next
            # upsample's stage program when it is already predictable.
            self._start_upsample_prewarm()

    # ------------------------------------------------------------------ setup

    def _voxel_schedule(self) -> list[int]:
        ups = self.args.upsamp_list or []
        if not ups:
            return []
        # exp-interpolated N_voxel_init -> final. NOTE: the reference's
        # ACTIVE code (`TriPlane/main.py:248-249`) interpolates exactly
        # len(upsamp_list) points INCLUDING N_voxel_init (the drop-first
        # `[1:]` variant at :246-247 is commented out), and its grid starts
        # at the hardcoded 256^3 (`main.py:218`) regardless of N_voxel_init
        # — so with N_voxel_init < 256^3 the first "upsample" event shrinks
        # the grid in BOTH codebases. Reproduced faithfully; the shipped
        # lego config uses N_voxel_init = 256^3, where the first event is a
        # no-op resize.
        return [
            int(round(v))
            for v in np.exp(
                np.linspace(
                    np.log(self.args.N_voxel_init),
                    np.log(self.args.N_voxel_final),
                    len(ups),
                )
            )
        ]

    def _check_marching_coverage(self, where: str):
        """LOUD warning when ``--nSamples`` caps marching below the
        geometry-required count (`cal_n_samples`): rays then stop
        ``n_samples * step_size`` short of the aabb's longest chord and the
        far side of long chords silently never trains. The reference cannot
        hit this (its ``--nSamples`` default is 1e6, `InfoInv/opt.py:84`,
        so ``min`` always picks `cal_n_samples`); our TPU configs bound the
        compiled shape explicitly — MEASURED footgun: the round-5 gauge 30k
        run's second upsample raised the requirement to 1045 vs the
        config's 886 (84.8% diagonal coverage) and train PSNR collapsed
        52.6 → 39.2 permanently (results/gauge30k_r4b, NOTES.md)."""
        need = int(cal_n_samples(self.reso_cur, self.args.step_ratio))
        if self.n_samples < need:
            diag = float(np.linalg.norm(np.asarray(self.aabb)[1] - np.asarray(self.aabb)[0]))
            cover = self.n_samples * self.step_size / max(diag, 1e-9)
            print(
                f"[trainer] WARNING ({where}): nSamples {self.n_samples} < "
                f"required {need} at this resolution — marching covers only "
                f"{100.0 * cover:.1f}% of the aabb diagonal; long-chord rays "
                f"truncate and their far side NEVER trains. Raise --nSamples "
                f"to >= {need}.",
                flush=True,
            )

    def _make_optimizer(self, reset: bool):
        lr_tree = triplane_lr_tree(self.params, self.args.lr_init, self.args.lr_basis)
        decay_iters = (
            self.args.lr_decay_iters
            if self.args.lr_decay_iters > 0
            else self.args.n_iters
        )
        # The step jit closes over the optimizer: a NEW optimizer function
        # invalidates the stage-step memo (see _build_step). An event reset
        # that re-creates a functionally identical optimizer — same per-leaf
        # base LRs and decay schedule, the case at every shrink/upsample,
        # where only the STATE restarts (`TriPlane/main.py:345-357`) — keeps
        # the object and the version, so stage programs prewarmed before the
        # event (e.g. _prewarm_upsample_worker) stay installable.
        key = (
            jax.tree.structure(lr_tree),
            tuple(jax.tree.leaves(lr_tree)),
            float(self.args.lr_decay_target_ratio),
            int(decay_iters),
        )
        if getattr(self, "_opt_key", None) != key:
            self.optimizer = make_optimizer(
                lr_tree, self.args.lr_decay_target_ratio, decay_iters
            )
            self._opt_version = getattr(self, "_opt_version", 0) + 1
            self._opt_key = key
        if reset:
            self.opt_state = self.optimizer.init(self.params)

    def _effective_sample_cap(self) -> int:
        """Resolve sample_cap = -1 (auto): ``open_sample_cap`` before the
        first occupancy grid exists (no statistics yet), then the measured
        99.9th-percentile occupied-samples capacity (set at mask events) —
        or ``masked_sample_cap`` when set, overriding the measured value
        (the per-stage manual knob; open-stage capping below the valid
        count measurably destroys quality, NOTES.md)."""
        if self.args.sample_cap != -1:
            return self.args.sample_cap
        if self.alpha is None and not hasattr(self, "_auto_cap"):
            return self.args.open_sample_cap
        if self.args.masked_sample_cap > 0:
            return self.args.masked_sample_cap
        return getattr(self, "_auto_cap", 0)

    def _resolve_rgb_cap(self) -> int:
        """rgb_cap knob: 0 = dense shading (reference semantics, default);
        -1 = aggressive top-K at sample_cap/4 (documented lossy, NOTES.md);
        -2 = AUTO — the measured shading capacity: the train step reports
        the per-batch ~p99.9 count of groups whose best blend weight clears
        ``rm_weight_mask_thre`` (the set the reference actually shades,
        `InfoInv/models/FieldBase.py:259-262`), and event rebuilds set the
        cap to that count plus margin. Dense until the first measurement,
        so the open stage is never capped."""
        a = self.args.rgb_cap
        cap = self._effective_sample_cap()
        if a == -1 and cap:
            return max(32, cap // 4)
        if a == -2:
            return self._auto_rgb_cap
        return max(0, a)

    def _update_auto_rgb_cap(self):
        """Re-pick the auto shading capacity from the statistic collected
        since the last rebuild (called at event boundaries, where the step
        recompiles anyway)."""
        if self.args.rgb_cap != -2 or self._rgb_stat <= 0:
            return
        g = max(1, self.args.group_size)
        kg = int(np.ceil(self._rgb_stat * 1.25)) + 1  # groups + 25% margin
        self._auto_rgb_cap = kg * g
        # Per-stage statistic window: reset so the NEXT event re-picks from
        # the weights of the stage in between. Early-training (open-stage)
        # weight distributions are diffuse — a whole-run running max would
        # pin the cap above the sample capacity forever (measured: the
        # 1600-iter cert run picked 520 > sample cap 224, i.e. inert).
        # Weight support only concentrates as training converges, so
        # per-stage picks shrink toward the converged capacity; the 25%
        # margin covers within-stage drift.
        self._rgb_stat = 0
        print(
            f"[trainer] auto rgb_cap -> {self._auto_rgb_cap} "
            f"(~p99.9 shaded groups + margin, per-stage window)"
        )

    def _render_cfg(self, sample_cap: int | None = None) -> RenderConfig:
        return RenderConfig(
            aabb=tuple(map(tuple, self.aabb.tolist())),
            near=float(self.train_dataset.near_far[0]),
            far=float(self.train_dataset.near_far[1]),
            n_samples=self.n_samples,
            step_size=self.step_size,
            distance_scale=self.args.distance_scale,
            ray_march_weight_thres=self.args.rm_weight_mask_thre,
            white_bg=self.train_dataset.white_bg,
            sample_cap=self._effective_sample_cap() if sample_cap is None else sample_cap,
            rgb_cap=self._resolve_rgb_cap(),
            mask_stride=self.args.mask_stride,
            group_size=self.args.group_size,
            run_len=self.args.run_len,
            tile_q=self.args.tile_q,
            fused_fetch=bool(self.args.fused_fetch),
            pair_gather=bool(self.args.pair_gather),
            duo_bwd=bool(self.args.duo_bwd),
        )

    @property
    def _sample_parallel(self) -> bool:
        """True when the mesh has a 'sample' axis: train with the dense
        sample-sharded renderer (`parallel/sample_parallel.py`)."""
        return self.mesh is not None and "sample" in self.mesh.axis_names

    def _build_step(self, rcfg=None, has_alpha=None, install=True):
        """(Re)compile the scan-blocked train step for the current stage.

        With ``install=False`` the jitted block is returned without touching
        trainer state — used by the event-program prewarm to construct (and
        AOT-compile) the PREDICTED post-event stage program; byte-identity
        with the later event-time build is pinned by
        tests/test_compile_cache.py."""
        import dataclasses as _dc

        model_cfg = self.model_cfg
        if rcfg is None:
            rcfg = self._render_cfg()
        optimizer = self.optimizer
        if has_alpha is None:
            has_alpha = self.alpha is not None
        sp_mesh = self.mesh if self._sample_parallel else None
        if sp_mesh is not None:
            # Dense sample-parallel path: no compaction/occupancy (per-chip
            # concepts — see config.py:mesh_shape); n_samples padded to a
            # multiple of the sample-axis size.
            n_sp = sp_mesh.shape["sample"]
            rcfg = _dc.replace(
                rcfg, sample_cap=0, rgb_cap=0, group_size=0, mask_stride=1,
                n_samples=-(-rcfg.n_samples // n_sp) * n_sp,
            )
            has_alpha = False

        # In-process memo: the block below closes only over rcfg, has_alpha,
        # the optimizer and per-run constants (model_cfg, microbatch, TV/L1
        # wiring — l1 itself is a traced argument). Two stages with an equal
        # key therefore need the SAME program, and reusing the jit wrapper
        # reuses every executable it already compiled (all scan-block sizes)
        # — mask events with an unchanged static config (fixed masked cap,
        # dense shading) cost no re-trace and no compile-service round-trip
        # at all (tests/test_compile_cache.py pins wrapper identity).
        cache_key = (rcfg, has_alpha, self._opt_version)
        fn = self._step_jit_cache.get(cache_key)
        if fn is not None:
            if install:
                self._step_has_alpha = has_alpha
                self._step = fn
            return fn

        micro = max(1, self.args.microbatch)
        tv_density = float(self.args.TV_weight_density)
        tv_app = float(self.args.TV_weight_app)
        density_dim = model_cfg.density_dim

        def loss_fn(p, rays, rgbs, key, iteration, l1_w, vol, vaabb, vtable):
            if sp_mesh is not None:
                from ..parallel.sample_parallel import render_rays_sp

                out = render_rays_sp(
                    p, model_cfg, rcfg, rays, key, sp_mesh,
                    is_train=True, iteration=iteration,
                )
            else:
                out = render_rays(
                    p, model_cfg, rcfg, rays, key,
                    is_train=True, iteration=iteration,
                    alpha_volume=vol, alpha_aabb=vaabb, alpha_table=vtable,
                )
            mse = jnp.mean((out["rgb_map"] - rgbs) ** 2)
            cnt = out.get("shaded_groups")
            if cnt is None:
                stat = jnp.int32(0)
            else:
                # ~p99.9 of the batch: the 5th-largest per-ray count.
                k = min(5, cnt.shape[0])
                stat = jax.lax.top_k(cnt, k)[0][k - 1]
            loss = mse + l1_w * density_l1(p)
            # Optional TV regularizers over the plane channels (the reference
            # exposes the weights but comments the terms out,
            # `InfoInv/main.py:280-287`; implemented here as working knobs).
            if tv_density > 0 or tv_app > 0:
                from ..utils.metrics import tv_loss_2d

                for name in ("plane_xy", "plane_yz", "plane_xz"):
                    if tv_density > 0:
                        loss = loss + tv_density * 1e-2 * tv_loss_2d(
                            p[name][..., :density_dim]
                        )
                    if tv_app > 0:
                        loss = loss + tv_app * 1e-2 * tv_loss_2d(
                            p[name][..., density_dim:]
                        )
            return loss, (mse, stat)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        def one_step(carry, batch):
            params, opt_state = carry
            rays, rgbs, key, iteration, l1_w, vol, vaabb, vtable = batch

            if micro <= 1:
                (_, (mse, stat)), grads = grad_fn(
                    params, rays, rgbs, key, iteration, l1_w, vol, vaabb, vtable
                )
            else:
                # Gradient accumulation over ray microbatches bounds activation
                # memory: the backward of each chunk runs before the next
                # forward. Equal chunk sizes make the averaged gradient equal
                # to the full-batch gradient.
                rays_m = rays.reshape(micro, -1, rays.shape[-1])
                rgbs_m = rgbs.reshape(micro, -1, rgbs.shape[-1])
                keys_m = jax.random.split(key, micro)

                def acc_body(acc, xs):
                    g_acc, mse_acc, stat_acc = acc
                    r, g, k = xs
                    (_, (mse_i, stat_i)), grads_i = grad_fn(
                        params, r, g, k, iteration, l1_w, vol, vaabb, vtable
                    )
                    g_acc = jax.tree.map(lambda a, b: a + b, g_acc, grads_i)
                    return (g_acc, mse_acc + mse_i, jnp.maximum(stat_acc, stat_i)), None

                zero = jax.tree.map(jnp.zeros_like, params)
                (grads, mse, stat), _ = jax.lax.scan(
                    acc_body,
                    (zero, jnp.float32(0.0), jnp.int32(0)),
                    (rays_m, rgbs_m, keys_m),
                )
                grads = jax.tree.map(lambda g: g / micro, grads)
                mse = mse / micro

            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), (mse, stat)

        if has_alpha:
            # The alpha mask is a RUNTIME ARGUMENT, not a closure constant:
            # closed-over arrays are baked into the lowered program, so every
            # mask event would emit a byte-different HLO module and pay a full
            # remote-XLA compile (minutes). As arguments, the program depends
            # only on shapes — later events with an unchanged sample cap are
            # byte-identical and hit the service-side compile cache (~30 s).
            # Pinned by tests/test_compile_cache.py.

            def block(params, opt_state, rays, rgbs, keys, iterations, l1_w,
                      vol, vaabb, vtable):
                def body(carry, xs):
                    r, g, k, it = xs
                    return one_step(carry, (r, g, k, it, l1_w, vol, vaabb, vtable))

                (params, opt_state), (mses, stats) = jax.lax.scan(
                    body, (params, opt_state), (rays, rgbs, keys, iterations)
                )
                return params, opt_state, mses, stats
        else:

            def block(params, opt_state, rays, rgbs, keys, iterations, l1_w):
                def body(carry, xs):
                    r, g, k, it = xs
                    return one_step(carry, (r, g, k, it, l1_w, None, None, None))

                (params, opt_state), (mses, stats) = jax.lax.scan(
                    body, (params, opt_state), (rays, rgbs, keys, iterations)
                )
                return params, opt_state, mses, stats

        if self.mesh is not None:
            repl = replicated_sharding(self.mesh)
            data = data_sharding(self.mesh)
            # rays/rgbs blocks: (T, B, ...) sharded on the batch axis (1).
            from jax.sharding import NamedSharding, PartitionSpec as P

            block_sharding = NamedSharding(self.mesh, P(None, "data"))
            in_sh = [repl, repl, block_sharding, block_sharding, repl, repl, repl]
            if has_alpha:
                in_sh += [repl, repl, repl]
            fn = jax.jit(
                block,
                in_shardings=tuple(in_sh),
                out_shardings=(repl, repl, repl, repl),
                donate_argnums=(0, 1),
            )
        else:
            fn = jax.jit(block, donate_argnums=(0, 1))
        self._step_jit_cache[cache_key] = fn
        if install:
            self._step_has_alpha = has_alpha
            self._step = fn
        return fn

    # --------------------------------------------------------- event prewarm

    def _predict_masked_stage_rcfg(self):
        """Predicted render config of the first masked stage, or None when it
        cannot be known before the event (auto caps measured at event time,
        or a TriPlane shrink that changes aabb/step_size)."""
        import dataclasses as _dc

        args = self.args
        if args.subsystem == "triplane":
            return None  # first mask event shrinks -> aabb/step change
        if args.sample_cap != -1:
            cap = args.sample_cap
        elif args.masked_sample_cap > 0:
            cap = args.masked_sample_cap
        else:
            return None  # auto capacity: measured at the event
        if args.rgb_cap == -1:
            rgb = max(32, cap // 4)
        elif args.rgb_cap >= 0:
            rgb = args.rgb_cap
        else:
            return None  # rgb_cap=-2: measured at the event
        return _dc.replace(self._render_cfg(sample_cap=cap), rgb_cap=rgb)

    def _start_event_prewarm(self):
        """Kick off the background compile of everything the first mask
        event will need, while the open stage trains. On the remote-XLA
        backend a fresh program compiles in minutes but a byte-identical one
        hits the service cache in ~30 s — the worker's only job is seeding
        that cache (all results are discarded). Best-effort and state-free:
        any failure just means the event compiles cold, as before."""
        args = self.args
        if (
            not getattr(args, "prewarm_events", 0)
            or self.alpha is not None
            or not (args.update_AlphaMask_list or [])
            or self._sample_parallel
        ):
            return
        import threading

        # Snapshot device buffers NOW: the train step donates params/opt_state,
        # so the worker must hold its own copies (shapes are all that matter).
        params_snap = jax.tree.map(lambda x: x.copy(), self.params)
        opt_shapes = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), self.opt_state
        )
        self._prewarm_thread = threading.Thread(
            target=self._prewarm_worker,
            args=(params_snap, opt_shapes, self.all_rays),
            daemon=True,
            name="ngf-event-prewarm",
        )
        self._prewarm_thread.start()
        # The OPEN stage's boundary-remainder blocks (e.g. 300 % spc) are
        # distinct scan-length programs of the already-installed open step;
        # left alone, the main thread compiles them cold right before the
        # event (measured: a 286 s stall at iteration 296 on the 30k
        # schedule — bigger than the whole prewarmed mask event). Warm them
        # in a separate thread: the compile service runs concurrent requests,
        # and the main thread's later call on the SAME memoized wrapper
        # joins the in-flight compile instead of starting its own.
        first_mask = min(args.update_AlphaMask_list)
        open_order = self._stage_block_sizes(
            self.iteration, stop=first_mask, ordered=True
        )
        open_sizes = set(open_order)
        if open_order:
            # The main thread compiles the FIRST block itself (which is a
            # remainder, not steps_per_call, when a boundary lands within
            # the first spc iterations — e.g. resume just before an event).
            open_sizes.discard(open_order[0])
        if open_sizes:
            self._prewarm_open_thread = threading.Thread(
                target=self._prewarm_open_worker,
                args=(params_snap, opt_shapes, open_sizes),
                daemon=True,
                name="ngf-open-block-prewarm",
            )
            self._prewarm_open_thread.start()

    def _prewarm_open_worker(self, params, opt_shapes, sizes):
        """Warm the open-stage step at each remainder scan-block size.

        ``_build_step(install=False)`` returns the SAME memoized jit wrapper
        the run loop installed (equal cache key: same rcfg, has_alpha=False,
        same optimizer), so executing it here with zero-filled T-shaped args
        populates the executable cache the main thread will hit."""
        try:
            fn = self._build_step(has_alpha=False, install=False)
            param_shapes = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params
            )
            self._warm_stage_blocks(fn, param_shapes, opt_shapes, sorted(sizes), None)
        except Exception as e:  # pragma: no cover - best-effort by design
            print(f"[trainer] open-stage block prewarm skipped: {e}")

    def _prewarm_worker(self, params, opt_shapes, all_rays):
        try:
            args = self.args
            near = float(self.train_dataset.near_far[0])
            far = float(self.train_dataset.near_far[1])
            r = args.alpha_grid_res
            # Event machinery: the no-prev grid build (first event), the
            # with-prev build (later events), the capacity count and the ray
            # filter. aabb/step_size are traced arguments in all of them, so
            # these programs stay valid even for TriPlane's post-shrink
            # geometry.
            grid, _ = update_alpha_mask(
                params, self.model_cfg, self.aabb,
                self.args.alpha_mask_len or self.step_size,
                grid_size=(r, r, r), alpha_thres=args.alpha_mask_thre, prev=None,
            )
            grid, _ = update_alpha_mask(
                params, self.model_cfg, self.aabb,
                self.args.alpha_mask_len or self.step_size,
                grid_size=(r, r, r), alpha_thres=args.alpha_mask_thre, prev=grid,
            )
            if args.sample_cap == -1:
                occupied_samples_per_ray(
                    all_rays, grid, self.aabb, near, far,
                    self.step_size, self.n_samples,
                )
            filter_rays_alpha(
                all_rays, grid, self.aabb, near, far, self.step_size
            )
            rcfg = self._predict_masked_stage_rcfg()
            if rcfg is None:
                return
            # The SAME memoized jit wrapper the event will install (equal
            # cache key when the prediction holds — pinned in
            # tests/test_compile_cache.py). EXECUTING it here, rather than
            # AOT-lowering, additionally populates the wrapper's in-process
            # executable cache, so the event-time first block dispatches with
            # no re-trace and no compile-service round-trip. One throwaway
            # warm call per scan-block size the masked schedule will use
            # (boundary-remainder blocks are distinct programs: the measured
            # ~36 s odd-block recompiles before every event, NOTES.md).
            fn = self._build_step(rcfg=rcfg, has_alpha=True, install=False)
            first_mask = min(args.update_AlphaMask_list)
            param_shapes = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params
            )
            self._warm_stage_blocks(
                fn, param_shapes, opt_shapes,
                sorted(self._stage_block_sizes(first_mask)), grid,
            )
        except Exception as e:  # pragma: no cover - best-effort by design
            print(f"[trainer] event-program prewarm skipped: {e}")

    def _first_event_prewarm_iter(self) -> int | None:
        """Launch iteration for the first-TriPlane-event speculation, or
        None. The lead balances compile overlap (the cold stage compile is
        minutes on the remote service) against prediction staleness (the
        occupancy boundary — and with it the shrink aabb — still moves
        early in training)."""
        args = self.args
        if (
            not getattr(args, "prewarm_events", 0)
            or args.subsystem != "triplane"
            or self.alpha is not None
            or not (args.update_AlphaMask_list or [])
            or self._sample_parallel
        ):
            return None
        first = min(args.update_AlphaMask_list)
        spc = max(1, args.steps_per_call)
        # Aligned to steps_per_call: an unaligned trigger boundary would
        # itself mint a new remainder-block program (the 286 s class).
        trigger = (first - min(first // 4, 512)) // spc * spc
        if trigger <= 0 or self.iteration >= trigger:
            return None
        return trigger

    def _start_first_event_prewarm(self):
        """Speculatively compile everything the FIRST TriPlane mask event
        chain will install (shrink → [co-scheduled upsample] → capacity →
        stage program) by SIMULATING the whole chain from a params
        snapshot shortly before the event. The round-4 gauge 30k run paid
        153.6 s of main-thread stall at @2000→2016 for this compile
        (results/gauge30k_r4b; NOTES.md round-5 decomposition) — the only
        event the existing prewarms cannot predict because the shrink aabb
        is data-dependent. Speculation contract: the shrink box is
        voxel-quantized, so a snapshot a few hundred steps early usually
        lands the exact aabb; a miss costs nothing vs the status quo (the
        event compiles cold, as before)."""
        import threading

        params_snap = jax.tree.map(lambda x: x.copy(), self.params)
        self._first_event_thread = threading.Thread(
            target=self._first_event_worker,
            args=(params_snap,),
            daemon=True,
            name="ngf-first-event-prewarm",
        )
        self._first_event_thread.start()

    def _first_event_worker(self, params):
        import dataclasses as _dc

        try:
            args = self.args
            near = float(self.train_dataset.near_far[0])
            far = float(self.train_dataset.near_far[1])
            r = args.alpha_grid_res
            if args.rgb_cap == -2:
                return  # shading capacity is event-measured
            first = min(args.update_AlphaMask_list)
            # 1. the event's grid build (no prev at the first event)
            grid, new_aabb = update_alpha_mask(
                params, self.model_cfg, self.aabb,
                self.args.alpha_mask_len or self.step_size,
                grid_size=(r, r, r), alpha_thres=args.alpha_mask_thre,
                prev=None,
            )
            aabb2 = np.asarray(jax.device_get(new_aabb), np.float32)
            # 2. shrink simulation (warms the crop program at these shapes)
            t_l, b_r = shrink_box_voxels(self.aabb, aabb2, self.grid_size)
            p0 = jax.tree.map(jnp.zeros_like, params)
            p_stage = shrink_planes(p0, t_l, b_r)
            new_size = [int(v) for v in np.asarray(b_r - t_l, np.int64)]
            step = grid_step_size(aabb2, new_size, args.step_ratio)
            # 3. the event's post-shrink ray refilter
            keep = np.asarray(
                filter_rays_alpha(self.all_rays, grid, aabb2, near, far, step)
            )
            rays_f = self.all_rays[keep] if keep.any() else self.all_rays
            # 4. co-scheduled upsample (the reference lego schedule)
            n_samples = self.n_samples
            if first in (args.upsamp_list or []) and self.n_voxel_list:
                reso = n_to_reso(self.n_voxel_list[0], aabb2)
                n_samples = min(
                    args.nSamples, cal_n_samples(reso, args.step_ratio)
                )
                p_stage = upsample_planes(p_stage, tuple(int(v) for v in reso))
                step = grid_step_size(aabb2, list(reso), args.step_ratio)
            # 5. capacity at the post-event marching resolution
            if args.sample_cap != -1:
                cap = args.sample_cap
            elif args.masked_sample_cap > 0:
                cap = args.masked_sample_cap
            else:
                counts = occupied_samples_per_ray(
                    rays_f, grid, aabb2, near, far, step, n_samples
                )
                cap = auto_sample_cap(counts, n_samples)
            rgb = max(32, cap // 4) if args.rgb_cap == -1 else max(0, args.rgb_cap)
            rcfg = _dc.replace(
                self._render_cfg(sample_cap=cap),
                aabb=tuple(map(tuple, aabb2.tolist())),
                n_samples=int(n_samples), step_size=float(step), rgb_cap=rgb,
            )
            # 6. the stage program + its scan-block executables
            fn = self._build_step(rcfg=rcfg, has_alpha=True, install=False)
            param_shapes = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), p_stage
            )
            opt_shapes = jax.eval_shape(self.optimizer.init, param_shapes)
            self._warm_stage_blocks(
                fn, param_shapes, opt_shapes,
                sorted(self._stage_block_sizes(first)), grid,
            )
        except Exception as e:  # pragma: no cover - best-effort by design
            print(f"[trainer] first-event prewarm skipped: {e}")

    def _predict_upsample_rcfg(self, params=None):
        """(next_upsample_iter, target_reso, rcfg) for the NEXT upsample
        event, or None when it cannot be known yet.

        At the end of a TriPlane shrink (or a previous upsample) everything
        the next upsample will install (`TriPlane/main.py:345-357`) becomes
        computable minutes before it fires: the voxel schedule + the
        now-final aabb give the target plane resolution, step_size and
        n_samples; and the event's auto-capacity re-measurement
        (`_event_upsample`) is a deterministic function of the occupancy
        grid, the filtered ray set and the new marching step — all already
        in hand.

        CO-SCHEDULED mask event (the reference lego schedule itself:
        `upsamp_list == update_AlphaMask_list == [2000, 2500]`,
        `TriPlane/configs/lego.txt:15-16`): a mask event at the SAME
        iteration as the upsample runs first and rebuilds the grid the
        capacity re-measure then uses. With a params snapshot (``params``)
        that rebuild is SIMULATED from the current weights (the same
        chained `prev=self.alpha` build the event will run) — speculative
        where the between-events path is deterministic: if occupancy
        drifts over the remaining steps, the measured cap differs and the
        event compiles cold, exactly as before (best-effort). The round-4
        gauge 30k run paid 121.8 s of main-thread stall at the second
        upsample for want of this (results/gauge30k_r4b @2516). Declined
        when a mask event fires strictly BETWEEN now and the upsample
        (trained occupancy then feeds a grid we cannot simulate yet), when
        the co-scheduled mask event would be the FIRST (its shrink changes
        the aabb), or when the shading capacity is event-measured
        (rgb_cap=-2)."""
        import dataclasses as _dc

        args = self.args
        if (
            args.subsystem != "triplane"
            or self.alpha is None
            or not self.n_voxel_list
        ):
            return None
        ups = [u for u in (args.upsamp_list or []) if u > self.iteration]
        if not ups:
            return None
        nxt = min(ups)
        if any(
            self.iteration < e < nxt
            for e in (args.update_AlphaMask_list or [])
        ):
            return None
        if args.rgb_cap == -2:
            return None
        grid = self.alpha
        if nxt in (args.update_AlphaMask_list or []):
            if params is None:
                return None
            # Simulate the co-scheduled mask rebuild (never a shrink here:
            # self.alpha is not None ⇒ the first mask event already ran).
            # Side benefit: this executes the grid-build program at the
            # CURRENT (post-upsample) plane shapes, seeding the compile
            # cache for the event's own rebuild — part of the measured
            # 121.8 s @2516 stall was exactly that cold build.
            r = args.alpha_grid_res
            grid, _ = update_alpha_mask(
                params, self.model_cfg, self.aabb,
                self.args.alpha_mask_len or self.step_size,
                grid_size=(r, r, r), alpha_thres=args.alpha_mask_thre,
                prev=self.alpha,
            )
        reso = n_to_reso(self.n_voxel_list[0], self.aabb)
        n_samples = min(args.nSamples, cal_n_samples(reso, args.step_ratio))
        step = grid_step_size(self.aabb, list(reso), args.step_ratio)
        if args.sample_cap != -1:
            cap = args.sample_cap
        elif args.masked_sample_cap > 0:
            cap = args.masked_sample_cap
        else:
            counts = occupied_samples_per_ray(
                self.all_rays, grid, self.aabb,
                float(self.train_dataset.near_far[0]),
                float(self.train_dataset.near_far[1]),
                step, n_samples,
            )
            cap = auto_sample_cap(counts, n_samples)
        rgb = max(32, cap // 4) if args.rgb_cap == -1 else max(0, args.rgb_cap)
        rcfg = _dc.replace(
            self._render_cfg(sample_cap=cap),
            n_samples=n_samples, step_size=step, rgb_cap=rgb,
        )
        return nxt, tuple(int(r) for r in reso), rcfg

    def _start_upsample_prewarm(self):
        """Background-compile the predicted post-upsample stage program
        while the post-shrink stage trains (the gauge-run analog of the
        mask-event prewarm: measured multi-minute cold stage compiles at
        upsample events, NOTES.md). Because optimizer resets keep the same
        optimizer function (see _make_optimizer), the event-time
        `_build_step` finds the prewarmed wrapper in the in-process memo
        and installs it — every warmed scan-block executable carries over
        (pinned in tests/test_compile_cache.py)."""
        args = self.args
        if (
            not getattr(args, "prewarm_events", 0)
            or self._sample_parallel
            or args.subsystem != "triplane"
        ):
            return
        t = getattr(self, "_prewarm_upsample_thread", None)
        if t is not None and t.is_alive():
            return
        import threading

        param_shapes = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), self.params
        )
        # Co-scheduled mask+upsample needs a params SNAPSHOT for the grid
        # simulation (the train step donates self.params — the worker must
        # hold its own buffers, same discipline as _start_event_prewarm).
        ups = [u for u in (self.args.upsamp_list or []) if u > self.iteration]
        params_snap = None
        if ups and min(ups) in (self.args.update_AlphaMask_list or []):
            params_snap = jax.tree.map(lambda x: x.copy(), self.params)
        self._prewarm_upsample_thread = threading.Thread(
            target=self._prewarm_upsample_worker,
            args=(param_shapes, params_snap),
            daemon=True,
            name="ngf-upsample-prewarm",
        )
        self._prewarm_upsample_thread.start()

    def _prewarm_upsample_worker(self, param_shapes, params_snap=None):
        """Best-effort and state-free, like _prewarm_worker: failures or a
        wrong prediction just mean the upsample compiles cold, as before."""
        try:
            pred = self._predict_upsample_rcfg(params=params_snap)
            if pred is None:
                return
            nxt, reso, rcfg = pred
            # Execute (not just shape-infer) the plane resize once so the
            # event's own `upsample_planes` call hits a warm program.
            p0 = jax.tree.map(
                lambda s: jnp.zeros(s.shape, s.dtype), param_shapes
            )
            params_up = upsample_planes(p0, reso)
            opt_shapes = jax.eval_shape(
                self.optimizer.init,
                jax.tree.map(
                    lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params_up
                ),
            )
            fn = self._build_step(rcfg=rcfg, has_alpha=True, install=False)
            self._warm_stage_blocks(
                fn,
                jax.tree.map(
                    lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params_up
                ),
                opt_shapes,
                sorted(self._stage_block_sizes(nxt)),
                self.alpha,
            )
        except Exception as e:  # pragma: no cover - best-effort by design
            print(f"[trainer] upsample-stage prewarm skipped: {e}")

    def _warm_stage_blocks(self, fn, param_shapes, opt_shapes, sizes, grid):
        """AOT-compile ``fn`` (a memoized stage-step wrapper) at each
        scan-block size, seeding the REMOTE compile-service cache: the
        event-time first call then re-traces (seconds) and fetches the
        byte-identical program from the service cache (~30 s) instead of
        compiling cold (minutes). ``sizes`` is honored in the given order
        (soonest-needed first); ``grid=None`` for the open stage.

        AOT (lower+compile on ShapeDtypeStructs), NOT execution: a warm
        EXECUTION allocates a full second set of params/opt/batch buffers
        and live activations next to the concurrently-training stage —
        measured HBM OOM at the corrected gauge-30k scale (the @2000
        masked stage at nSamples 1045 / cap 704 crashed RESOURCE_EXHAUSTED
        while the upsample prewarm executed its warm call,
        results/gauge30k_fix_r5/run.attempt1.out, round 5)."""
        B = self.args.batch_size
        sds = jax.ShapeDtypeStruct
        for T in sizes:
            keys = jax.eval_shape(
                lambda: jax.random.split(jax.random.PRNGKey(0), T)  # noqa: B023
            )
            call = [
                param_shapes, opt_shapes,
                sds((T, B, 6), jnp.float32),
                sds((T, B, 3), jnp.float32),
                keys,
                sds((T,), jnp.int32), sds((), jnp.float32),
            ]
            if grid is not None:
                call += [
                    sds(grid.volume.shape, grid.volume.dtype),
                    sds(grid.aabb.shape, grid.aabb.dtype),
                    sds(grid.table.shape, grid.table.dtype),
                ]
            fn.lower(*call).compile()

    def _start_stage_block_prewarm(self):
        """After an event installs a new stage, background-warm its
        boundary-remainder scan blocks. The main thread compiles the first
        (steps_per_call-sized) block itself; every OTHER size the schedule
        will need — remainders at the next event/vis/save boundary — would
        otherwise compile cold on the main thread right at that boundary.
        Measured cost of not doing this: 66.5 s at step 2496→2500 of the
        round-4 gauge 30k run (the 4-step remainder of the post-upsample
        stage, results/gauge30k_r4b). Deterministic (no prediction): the
        stage is already installed; only its minor block sizes are warmed."""
        args = self.args
        if not getattr(args, "prewarm_events", 0) or self._sample_parallel:
            return
        order = self._stage_block_sizes(self.iteration, ordered=True)
        sizes = []
        for T in order[1:]:  # [0] is what the main thread compiles next
            if T != order[0] and T not in sizes:
                sizes.append(T)
        # The vis-eval render program for this stage: a fresh one compiles
        # cold ON the main thread at the next vis boundary otherwise —
        # measured 424.6 s at step 6000 of the round-4 gauge 30k run
        # (results/gauge30k_r4b, the first masked-stage eval).
        warm_eval = (
            args.N_vis != 0
            and args.vis_every > 0
            and self.test_dataset is not None
            and (self._render_cfg(), self.alpha is not None)
            not in getattr(self, "_eval_render_cache", {})
        )
        if not sizes and not warm_eval:
            return
        import threading

        fn = self._build_step(install=False)  # the just-installed wrapper
        param_shapes = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), self.params
        )
        opt_shapes = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), self.opt_state
        )
        grid = self.alpha if self._step_has_alpha else None
        t = threading.Thread(
            target=self._stage_block_worker,
            args=(fn, param_shapes, opt_shapes, sizes, grid, warm_eval),
            daemon=True,
            name="ngf-stage-block-prewarm",
        )
        t.start()
        self._prewarm_stage_blocks_thread = t

    def _stage_block_worker(
        self, fn, param_shapes, opt_shapes, sizes, grid, warm_eval=False
    ):
        try:
            self._warm_stage_blocks(fn, param_shapes, opt_shapes, sizes, grid)
        except Exception as e:  # pragma: no cover - best-effort by design
            print(f"[trainer] stage-block prewarm skipped: {e}")
        if not warm_eval:
            return
        try:
            # AOT-compile the vis-eval program through the CACHED inner jit
            # (the make_eval_render_fn lambda binds live — possibly donated
            # — param buffers; ShapeDtypeStructs lower the identical
            # program with zero device allocation). One (eval_chunk, 6)
            # shape covers every image: render_image pads the final chunk.
            self.make_eval_render_fn(iteration=self.iteration)
            render = self._eval_render_cache[
                (self._render_cfg(), grid is not None)
            ]
            sds = jax.ShapeDtypeStruct
            call = [
                param_shapes,
                sds((self.args.eval_chunk, 6), jnp.float32),
                sds((), jnp.int32),
            ]
            if grid is not None:
                call += [
                    sds(grid.volume.shape, grid.volume.dtype),
                    sds(grid.aabb.shape, grid.aabb.dtype),
                    sds(grid.table.shape, grid.table.dtype),
                ]
            render.lower(*call).compile()
        except Exception as e:  # pragma: no cover - best-effort by design
            print(f"[trainer] eval-render prewarm skipped: {e}")

    def _stage_block_sizes(
        self, start: int, stop: int | None = None, *, ordered: bool = False
    ) -> set[int] | list[int]:
        """Scan-block sizes (`train_block` T values) the run loop will use
        from iteration ``start`` to ``stop`` (default: end of training):
        ``steps_per_call`` plus every boundary remainder (events / vis /
        save / n_iters). Each distinct T is a separate compiled program; the
        prewarm warms them all so no stage block ever compiles at run time.
        (Measured: the 3000-iter prewarm run's single remaining stall was
        the open stage's 300 % 8 = 4 remainder block — 286 s of main-thread
        compile, bigger than the whole prewarmed mask event. NOTES.md.)"""
        args = self.args
        spc = max(1, args.steps_per_call)
        events = sorted(
            set(
                list(args.update_AlphaMask_list or [])
                + [
                    i for i in (args.upsamp_list or [])
                    if args.subsystem == "triplane"
                ]
            )
        )
        order: list[int] = []
        it = start
        end = args.n_iters if stop is None else min(stop, args.n_iters)
        while it < end:
            boundaries = [args.n_iters] + [e for e in events if e > it]
            if args.N_vis != 0 and args.vis_every > 0:
                boundaries.append(((it // args.vis_every) + 1) * args.vis_every)
            if args.save_every > 0:
                boundaries.append(((it // args.save_every) + 1) * args.save_every)
            target = min(min(b for b in boundaries if b > it), end)
            while it < target:
                b = min(spc, target - it)
                order.append(b)
                it += b
        return order if ordered else set(order)

    def make_forward_block(self):
        """Forward-only scan block (no grads/optimizer): the profiling probe
        that splits forward cost from backward+update cost (NOTES.md perf
        accounting). Same render config/stage as the train step."""
        model_cfg = self.model_cfg
        rcfg = self._render_cfg()
        alpha = self.alpha

        if alpha is not None:
            # Alpha as runtime arguments, same rationale as _build_step.
            def block(params, rays, rgbs, keys, iterations, vol, vaabb, vtable):
                def body(_, xs):
                    r, g, k, it = xs
                    out = render_rays(
                        params, model_cfg, rcfg, r, k,
                        is_train=True, iteration=it,
                        alpha_volume=vol, alpha_aabb=vaabb, alpha_table=vtable,
                    )
                    return None, jnp.mean((out["rgb_map"] - g) ** 2)

                _, mses = jax.lax.scan(body, None, (rays, rgbs, keys, iterations))
                return mses

            fn = jax.jit(block)
            vols = (alpha.volume, alpha.aabb, alpha.table)
            return lambda p, rays, rgbs, keys, its: fn(p, rays, rgbs, keys, its, *vols)

        def block(params, rays, rgbs, keys, iterations):
            def body(_, xs):
                r, g, k, it = xs
                out = render_rays(
                    params, model_cfg, rcfg, r, k,
                    is_train=True, iteration=it,
                )
                return None, jnp.mean((out["rgb_map"] - g) ** 2)

            _, mses = jax.lax.scan(body, None, (rays, rgbs, keys, iterations))
            return mses

        return jax.jit(block)

    def make_eval_render_fn(self, iteration: int | None = None, full: bool = False):
        """Compiled chunk renderer for the current stage.

        Jitted functions are cached per stage (render config + mask
        presence) with params/iteration as arguments, so periodic evals
        during training reuse one compilation (fresh compiles cost minutes
        on the remote-compile TPU backend).

        ``full=True`` mirrors the reference's FINAL-evaluation semantics
        (`InfoInv/main.py:338-346` passes N_samples=-1 -> the field's
        geometry-derived nSamples, `FieldBase.py:71-72,122`): march the full
        AABB diagonal regardless of the train-time ``--nSamples`` cap, with
        no fixed-capacity compaction. Mid-training evals keep the train
        marching length, exactly like the reference's
        (`InfoInv/main.py:313-314` passes N_samples=nSamples). A train-time
        marching cap otherwise silently truncates the far side of the scene
        at test views — measured -5.6 dB on the A/B harness scene
        (tools/reference_ab.py, NOTES.md round-3 log).
        """
        import dataclasses as _dc

        from ..utils.grid import grid_n_samples

        model_cfg = self.model_cfg
        rcfg = self._render_cfg()
        if full:
            rcfg = _dc.replace(
                self._render_cfg(sample_cap=0),
                n_samples=grid_n_samples(self.aabb, self.step_size),
                rgb_cap=0,
            )
        alpha = self.alpha
        cache_key = (rcfg, alpha is not None)
        if not hasattr(self, "_eval_render_cache"):
            self._eval_render_cache = {}
        if cache_key not in self._eval_render_cache:
            if alpha is not None:

                @jax.jit
                def render(params, rays, it, vol, vaabb, vtable):
                    out = render_rays(
                        params, model_cfg, rcfg, rays, None,
                        is_train=False, iteration=it,
                        alpha_volume=vol, alpha_aabb=vaabb, alpha_table=vtable,
                    )
                    return out["rgb_map"], out["depth_map"]
            else:

                @jax.jit
                def render(params, rays, it):
                    out = render_rays(
                        params, model_cfg, rcfg, rays, None,
                        is_train=False, iteration=it,
                    )
                    return out["rgb_map"], out["depth_map"]
            self._eval_render_cache[cache_key] = render
        render = self._eval_render_cache[cache_key]

        it = jnp.int32(self.args.n_iters + 1 if iteration is None else iteration)
        params = self.params
        if alpha is not None:
            vol, vaabb, vtable = alpha.volume, alpha.aabb, alpha.table
            return lambda rays: render(params, rays, it, vol, vaabb, vtable)
        return lambda rays: render(params, rays, it)

    # ------------------------------------------------------------------ events

    def _event_update_alpha_mask(self, first: bool):
        """`InfoInv/main.py:320-332` / `TriPlane/main.py:329-343`."""
        _t = {"start": time.time()}
        self._reset_prefetch()  # ray set / sampler about to change
        r = self.args.alpha_grid_res
        reso_mask = (r, r, r)
        self.alpha, new_aabb = update_alpha_mask(
            self.params,
            self.model_cfg,
            self.aabb,
            # Occupancy-threshold length: the reference's current-step
            # semantics by default; a fixed scale-invariant length with
            # alpha_mask_len > 0 (see config.py — the round-5 collapse fix).
            self.args.alpha_mask_len or self.step_size,
            grid_size=reso_mask,
            alpha_thres=self.args.alpha_mask_thre,
            # The reference's compute_alpha pre-culls with the EXISTING
            # mask at later events (`FieldBase.py:140-159`), keeping the
            # occupancy monotone-shrinking.
            prev=self.alpha,
        )
        # Force completion for an honest phase decomposition (dispatch is
        # async; without a readback the whole event cost lands on the first
        # consumer). Negligible next to the build itself.
        float(np.asarray(self.alpha.volume[0, 0, 0]))
        _t["grid"] = time.time()
        if first:
            # Both subsystems drop the L1 weight at the first mask event
            # (`InfoInv/main.py:328`, `TriPlane/main.py:337` — the TriPlane
            # reassignment sits inside the shrink branch).
            self.l1_weight = self.args.L1_weight_rest
            if self.args.subsystem == "triplane":
                self._event_shrink(new_aabb)
            keep = filter_rays_alpha(
                self.all_rays, self.alpha, self.aabb,
                float(self.train_dataset.near_far[0]),
                float(self.train_dataset.near_far[1]),
                self.step_size,
            )
            if keep.any():
                self.all_rays, self.all_rgbs = self.all_rays[keep], self.all_rgbs[keep]
                self._ray_ids = self._ray_ids[keep]
                self.sampler = SimpleSampler(
                    self.all_rays.shape[0], self.args.batch_size, self.args.seed
                )
                self._sampler_birth = self.iteration
            else:
                # Degenerate occupancy (e.g. mask update before any geometry
                # emerged) — keep the training set instead of starving.
                print("[trainer] alpha-mask ray filter kept 0 rays; skipping filter")
        _t["filter"] = time.time()
        if self.args.sample_cap == -1:
            counts = occupied_samples_per_ray(
                self.all_rays, self.alpha, self.aabb,
                float(self.train_dataset.near_far[0]),
                float(self.train_dataset.near_far[1]),
                self.step_size, self.n_samples,
            )
            self._auto_cap = auto_sample_cap(counts, self.n_samples)
            print(f"[trainer] auto sample_cap -> {self._auto_cap} "
                  f"(p99.9 occupied samples/ray)")
        _t["counts"] = time.time()
        self._update_auto_rgb_cap()
        self._build_step()
        self._event_phase_report("mask", _t)
        # TriPlane: the shrink above fixed the geometry the next upsample
        # will install — warm its stage program while this stage trains.
        self._start_upsample_prewarm()
        # Any boundary-remainder blocks of the just-installed stage compile
        # in the background instead of at the next boundary. Skipped when a
        # co-scheduled upsample fires at this same iteration — it replaces
        # this stage before a single block runs (run-loop event order).
        if not (
            self.args.subsystem == "triplane"
            and self.iteration in (self.args.upsamp_list or [])
            and self.n_voxel_list  # exhausted schedule = upsample no-ops
        ):
            self._start_stage_block_prewarm()

    def _event_shrink(self, new_aabb: np.ndarray):
        """`TriPlane/models/Field.py:117-132` + init_para re-derivation.

        Gauge grids are deliberately NOT cropped: the reference's shrink
        touches only plane_xy/yz/xz and leaves the fixed 256^2 gauge grids
        spanning the (new) normalized [-1, 1] square (`Field.py:126-128` —
        the learned offsets are spatially remapped by the shrink there
        too). Faithful reproduction.
        """
        t_l, b_r = shrink_box_voxels(self.aabb, new_aabb, self.grid_size)
        self.params = shrink_planes(self.params, t_l, b_r)
        new_size = (b_r - t_l).astype(int)
        self.aabb = np.asarray(new_aabb, np.float32)
        self.grid_size = [int(v) for v in new_size]
        self.step_size = grid_step_size(self.aabb, self.grid_size, self.args.step_ratio)
        # NOTE: the reference does NOT update the training n_samples after
        # shrink (`TriPlane/main.py:334-341` — nSamples only changes at
        # upsample events); preserved here.
        self._make_optimizer(reset=True)

    def _event_upsample(self):
        """`TriPlane/main.py:345-357`."""
        if not self.n_voxel_list:
            return
        _t = {"start": time.time()}
        n_voxels = self.n_voxel_list.pop(0)
        self.reso_cur = n_to_reso(n_voxels, self.aabb)
        self.n_samples = min(
            self.args.nSamples, cal_n_samples(self.reso_cur, self.args.step_ratio)
        )
        self.params = upsample_planes(self.params, tuple(self.reso_cur))
        # Scalar readback (4 bytes) to complete the resize for honest timing.
        float(jax.tree.leaves(self.params)[0][(0,) * jax.tree.leaves(self.params)[0].ndim])
        _t["resize"] = time.time()
        self.grid_size = list(self.reso_cur)
        self.step_size = grid_step_size(self.aabb, self.grid_size, self.args.step_ratio)
        self._check_marching_coverage(f"upsample@{self.iteration}")
        # optimizer recreated at initial LRs -> schedule restarts.
        self._make_optimizer(reset=True)
        if self.args.sample_cap == -1 and self.alpha is not None:
            # The upsample changed step_size (after a shrink, by the full
            # aabb-to-aabb ratio: 0.0059 -> 0.0017 on the reference lego
            # schedule), so per-ray OCCUPIED-sample counts scale up by the
            # same factor. A capacity measured at the old step would
            # silently truncate the rear of every object chord — re-measure
            # at the new marching resolution.
            counts = occupied_samples_per_ray(
                self.all_rays, self.alpha, self.aabb,
                float(self.train_dataset.near_far[0]),
                float(self.train_dataset.near_far[1]),
                self.step_size, self.n_samples,
            )
            self._auto_cap = auto_sample_cap(counts, self.n_samples)
            print(f"[trainer] auto sample_cap -> {self._auto_cap} "
                  f"(re-measured at upsampled step size)")
        _t["counts"] = time.time()
        self._update_auto_rgb_cap()
        self._build_step()
        self._event_phase_report("upsample", _t)
        # Chain: warm the NEXT upsample's stage program (if predictable).
        self._start_upsample_prewarm()
        self._start_stage_block_prewarm()

    def _event_phase_report(self, kind: str, t: dict):
        """Print + persist the event's internal phase decomposition (the
        round-4 VERDICT asked for exactly this at 30k scale: machinery vs
        stage compile vs occupancy rebuild). Phases are successive
        timestamps; the residual before the next scalars row is the stage's
        first-block compile, visible as the row gap minus these."""
        keys = [k for k in t if k != "start"]
        parts, prev = {}, t["start"]
        for k in keys:
            parts[f"event/{kind}_{k}_s"] = round(t[k] - prev, 2)
            prev = t[k]
        print(
            f"[trainer] {kind} event @{self.iteration}: "
            + " ".join(f"{k.split('_', 1)[1][:-2]} {v}s" for k, v in parts.items()),
            flush=True,
        )
        w = getattr(self, "_scalars", None)
        if w is not None:
            w.write(self.iteration, parts)

    # ------------------------------------------------------------------ train

    def _next_block(self, size: int):
        """Host-side batch block (T, B, ...) for one scan call. Serialized
        by a lock: the prefetch worker and boundary-block builds share the
        sampler's epoch-permutation state."""
        if not hasattr(self, "_block_lock"):
            self._block_lock = __import__("threading").Lock()
        with self._block_lock:
            rays = np.empty((size, self.args.batch_size, 6), np.float32)
            rgbs = np.empty((size, self.args.batch_size, 3), np.float32)
            for t in range(size):
                ids = self.sampler.nextids()
                rays[t] = self.all_rays[ids]
                rgbs[t] = self.all_rgbs[ids]
            return rays, rgbs

    def _get_block(self, size: int):
        """Prefetched block when the size matches steps_per_call (the steady
        state): a background thread assembles the next block while the
        device executes the current one — the DataLoader-workers analog
        (`UV-Mapping/data/dtu.py:294-297`). Odd-sized boundary blocks are
        built inline."""
        if size != self.args.steps_per_call:
            return self._next_block(size)
        if getattr(self, "_prefetcher", None) is None:
            from ..data.prefetch import BlockPrefetcher

            self._prefetcher = BlockPrefetcher(lambda: self._next_block(size))
        return self._prefetcher.next()

    def _reset_prefetch(self):
        """Drop prefetched blocks built from a stale ray set (called when
        the training set or sampler is replaced, e.g. at mask events)."""
        p = getattr(self, "_prefetcher", None)
        if p is not None:
            p.close()
            self._prefetcher = None

    def train_block(self, size: int) -> np.ndarray:
        """Run ``size`` optimizer steps in one device call; returns MSEs."""
        rays, rgbs = self._get_block(size)
        self.key, sub = jax.random.split(self.key)
        keys = jax.random.split(sub, size)
        iterations = jnp.arange(self.iteration, self.iteration + size, dtype=jnp.int32)
        extra = (
            (self.alpha.volume, self.alpha.aabb, self.alpha.table)
            if self._step_has_alpha
            else ()
        )
        self.params, self.opt_state, mses, stats = self._step(
            self.params, self.opt_state,
            jnp.asarray(rays), jnp.asarray(rgbs),
            keys, iterations, jnp.float32(self.l1_weight), *extra,
        )
        self.iteration += size
        self._rgb_stat = max(self._rgb_stat, int(np.max(np.asarray(stats))))
        return np.asarray(mses)

    def run(self, progress_cb=None) -> dict:
        """Full training run with events, eval, logging, checkpoints."""
        args = self.args
        events = sorted(
            set(
                [i for i in (args.update_AlphaMask_list or [])]
                + [i for i in (args.upsamp_list or []) if args.subsystem == "triplane"]
            )
        )
        log_path = None
        scalars = None
        if self.logfolder:
            os.makedirs(self.logfolder, exist_ok=True)
            os.makedirs(os.path.join(self.logfolder, "imgs_vis"), exist_ok=True)
            log_path = os.path.join(self.logfolder, "log.txt")
            from ..utils.scalars import ScalarWriter

            scalars = ScalarWriter(self.logfolder)
            self._scalars = scalars  # event-phase decomposition rows

        psnrs_test = [0.0]
        mses_accum: list[float] = []
        t0 = time.time()
        # An existing occupancy grid means the first mask event already ran
        # (this process or, via from_checkpoint, a previous one) — later
        # events must not re-run the first-event specials (ray refilter,
        # L1 drop, shrink).
        first_mask_done = self.alpha is not None
        # Graceful preemption: SIGTERM (preempted TPU slice, scheduler
        # shutdown) sets a flag; the loop drains the current scan block,
        # writes a RESUMABLE checkpoint at the exact iteration, and exits
        # cleanly — releasing the device lease instead of wedging it. The
        # handler only installs from the main thread (signal.signal raises
        # elsewhere) and is restored on exit.
        self._stop_requested = False
        prev_term = None
        if self.logfolder:
            import signal as _signal

            def _on_term(signum, frame):
                self._stop_requested = True
                print("[trainer] SIGTERM: will checkpoint and exit at the "
                      "next block boundary", flush=True)

            try:
                prev_term = _signal.signal(_signal.SIGTERM, _on_term)
            except ValueError:  # not the main thread
                prev_term = None
        # Seed the remote compile cache with the first event's programs while
        # the open stage trains (no-op when disabled / already masked).
        self._start_event_prewarm()

        while self.iteration < args.n_iters and not self._stop_requested:
            # run until the next boundary (event / vis / save / end)
            boundaries = [args.n_iters]
            boundaries += [e for e in events if e > self.iteration]
            few_trigger = self._first_event_prewarm_iter()
            if few_trigger is not None:
                boundaries.append(few_trigger)
            if args.N_vis != 0 and args.vis_every > 0:
                # The reference evaluates when the 0-based loop variable hits
                # vis_every-1, i.e. after vis_every completed steps
                # (`main.py:313`); our counter counts completed steps, so the
                # boundary is the next multiple of vis_every. Keeping it a
                # multiple also keeps the scan block size uniform (every
                # distinct block size is a separate multi-minute TPU compile).
                boundaries.append(
                    ((self.iteration // args.vis_every) + 1) * args.vis_every
                )
            if args.save_every > 0:
                nxt = ((self.iteration // args.save_every) + 1) * args.save_every
                boundaries.append(nxt)
            target = min(b for b in boundaries if b > self.iteration)

            while self.iteration < target and not self._stop_requested:
                block = min(max(1, args.steps_per_call), target - self.iteration)
                mses = self.train_block(block)
                mses_accum.extend(mses.tolist())
                if log_path and (self.iteration % args.progress_refresh_rate < block):
                    train_psnr = np.mean([mse2psnr(m) for m in mses_accum[-50:]])
                    line = (
                        f"Iteration {self.iteration:05d}:"
                        f" train_psnr = {train_psnr:.2f}"
                        f" test_psnr = {float(np.mean(psnrs_test)):.2f}"
                        f" mse = {mses_accum[-1]:.6f}"
                    )
                    with open(log_path, "a") as f:
                        f.write(line + "\n")
                    scalars.write(
                        self.iteration,
                        {"train/psnr": train_psnr, "train/mse": mses_accum[-1],
                         "train/l1_weight": self.l1_weight,
                         "train/shaded_groups_p999": self._rgb_stat},
                    )
                if progress_cb:
                    progress_cb(self.iteration, mses_accum[-1] if mses_accum else None)

            it = self.iteration
            if few_trigger is not None and it == few_trigger:
                # Speculative first-event compile: simulate the shrink chain
                # from a snapshot while the open stage trains the lead-in.
                self._start_first_event_prewarm()
            # Eval fires at vis_every completed steps (see boundary note above).
            if args.N_vis != 0 and args.vis_every > 0 and it % args.vis_every == 0 and it > 0 and self.test_dataset is not None and self.logfolder:
                fn = self.make_eval_render_fn(iteration=it)
                psnrs_test = evaluation(
                    self.test_dataset, fn,
                    os.path.join(self.logfolder, "imgs_vis"),
                    n_vis=args.N_vis, prtx=f"{it:06d}_",
                    chunk=args.eval_chunk, compute_extra_metrics=False,
                    write_video=False,
                ) or [0.0]
                if log_path:
                    with open(log_path, "a") as f:
                        f.write(
                            f"Iteration {it:05d}: test/psnr = {float(np.mean(psnrs_test)):.2f}\n"
                        )
                    scalars.write(it, {"test/psnr": float(np.mean(psnrs_test))})

            if it in (args.update_AlphaMask_list or []):
                self._event_update_alpha_mask(first=not first_mask_done)
                first_mask_done = True
            if args.subsystem == "triplane" and it in (args.upsamp_list or []):
                self._event_upsample()
            # it == n_iters is covered by the final synchronous save below —
            # skip the redundant periodic (background) write there.
            if args.save_every > 0 and it % args.save_every == 0 and 0 < it < args.n_iters and self.logfolder:
                blocked = self.save(
                    os.path.join(self.logfolder, "model.npz"), background=True
                )
                if scalars is not None:
                    scalars.write(it, {"ckpt/blocked_s": round(blocked, 3)})

        wall = time.time() - t0
        if prev_term is not None:
            import signal as _signal

            _signal.signal(_signal.SIGTERM, prev_term)
        if self.logfolder:
            self.save(os.path.join(self.logfolder, "model.npz"))
            if self._stop_requested:
                print(f"[trainer] preempted at iteration {self.iteration}; "
                      f"resumable checkpoint written to "
                      f"{os.path.join(self.logfolder, 'model.npz')}", flush=True)
        return {
            "iterations": self.iteration,
            "wall_time_s": wall,
            "final_train_mse": mses_accum[-1] if mses_accum else None,
            "rays_per_sec": args.batch_size * self.iteration / max(wall, 1e-9),
            "preempted": bool(self._stop_requested),
        }

    def export_mesh(self, path: str, grid_size: int = 256, level: float = 0.005):
        """Density grid -> marching-cubes PLY.

        The reference's `--export_mesh` flag calls an undefined `mesh()`
        (`TriPlane/main.py:400-401`, a latent NameError); this is the working
        equivalent built on the occupancy machinery + our marching cubes.
        """
        from ..utils.marching_cubes import convert_density_to_ply
        from .occupancy import dense_grid_points
        from ..render.volume import compute_alpha_grid_chunk
        from functools import partial as _partial

        pts = dense_grid_points(self.aabb, (grid_size,) * 3).reshape(-1, 3)
        alpha_fn = jax.jit(
            _partial(
                compute_alpha_grid_chunk,
                model_cfg=self.model_cfg,
                step_size=self.step_size,
            )
        )
        chunks = []
        aabb_j = jnp.asarray(self.aabb)
        for i in range(0, pts.shape[0], 256 * 256 * 8):
            chunks.append(
                np.asarray(alpha_fn(self.params, xyz=jnp.asarray(pts[i : i + 256 * 256 * 8]), aabb=aabb_j))
            )
        alpha = np.concatenate(chunks).reshape(grid_size, grid_size, grid_size)
        convert_density_to_ply(alpha, path, self.aabb, level=level)

    def save(self, path: str, background: bool = False) -> float:
        """Write a resumable checkpoint; returns the seconds the TRAINING
        thread was blocked.

        ``background=True`` (periodic ``save_every`` saves): only the state
        snapshot (device_get + flatten) blocks; npz serialization + disk
        happen on :class:`AsyncCheckpointWriter` with an atomic rename —
        the measured 74.6 s synchronous stall at gauge-30k scale
        (results/gauge30k_r4b @3000, 213 MB on a 1-core host) drops to the
        snapshot cost. ``background=False`` (final / SIGTERM-preemption
        saves): fully synchronous — joins any in-flight write first, so the
        file is guaranteed complete when the process exits.
        """
        t0 = time.time()
        meta = {
            "subsystem": self.args.subsystem,
            "model_cfg": self.model_cfg.__dict__,
            "aabb": self.aabb.tolist(),
            "grid_size": self.grid_size,
            "step_size": self.step_size,
            "n_samples": self.n_samples,
            "near_far": [float(v) for v in self.train_dataset.near_far],
            "iteration": self.iteration,
            # Training-resume state beyond the reference checkpoint
            # contract (`FieldBase.py:94-116` saves kwargs+state_dict only;
            # the reference cannot resume a killed run). Optimizer moments
            # / kept-ray ids / PRNG key ride as `extra/` arrays.
            "resume": {
                "l1_weight": float(self.l1_weight),
                "auto_cap": int(self._auto_cap)
                if hasattr(self, "_auto_cap")
                else None,
                "rgb_stat": int(self._rgb_stat),
                "auto_rgb_cap": int(self._auto_rgb_cap),
                "n_voxel_list": list(self.n_voxel_list),
                "sampler_birth": int(self._sampler_birth),
            },
        }
        extra = {
            f"opt/{i:04d}": leaf
            for i, leaf in enumerate(jax.tree.leaves(self.opt_state))
        }
        extra["key"] = np.asarray(self.key)
        extra["ray_ids"] = self._ray_ids.astype(np.int64)
        from ..utils.checkpoint import pack_checkpoint, write_arrays_atomic

        arrays = pack_checkpoint(
            self.params,
            meta=meta,
            alpha_volume=None if self.alpha is None else np.asarray(self.alpha.volume),
            alpha_aabb=None if self.alpha is None else np.asarray(self.alpha.aabb),
            extra_arrays=extra,
        )
        if background:
            self._ckpt_writer.submit(path, arrays)
        else:
            self._ckpt_writer.wait()
            write_arrays_atomic(path, arrays)
        return time.time() - t0

    @classmethod
    def from_checkpoint(
        cls,
        path: str,
        args: TrainArgs,
        train_dataset: RayDataset,
        test_dataset: RayDataset | None = None,
        logfolder: str | None = None,
        mesh=None,
    ) -> "TriPlaneTrainer":
        """Resume TRAINING from a checkpoint written by :meth:`save`.

        Restores params, optimizer moments + LR-schedule position, the
        occupancy grid, the filtered training-ray set, the PRNG key, and
        the sampler's epoch-stream position — the resumed process continues
        the interrupted run's iteration sequence exactly (stage programs
        are re-lowered byte-identical, so warm-cache compiles are ~30 s).
        Requires the same config the run was launched with; checkpoints
        written before resume support (no `extra/` arrays) are rejected.
        """
        from ..utils.checkpoint import load_checkpoint, load_extra_arrays

        params, meta, alpha_volume, alpha_aabb = load_checkpoint(path)
        extra = load_extra_arrays(path)
        if "resume" not in meta or "key" not in extra:
            raise ValueError(
                f"{path} has no training-resume state (params-only "
                "checkpoint) — re-save with the current trainer or use "
                "--render_only"
            )
        if meta["subsystem"] != args.subsystem:
            raise ValueError(
                f"checkpoint subsystem {meta['subsystem']!r} != configured "
                f"{args.subsystem!r}"
            )
        params = jax.tree.map(jnp.asarray, params)
        return cls(
            args,
            train_dataset,
            test_dataset,
            logfolder,
            mesh=mesh,
            init_params=params,
            resume_state={
                "meta": meta,
                "extra": extra,
                "alpha_volume": alpha_volume,
                "alpha_aabb": alpha_aabb,
            },
        )
