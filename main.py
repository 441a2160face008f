#!/usr/bin/env python3
"""CLI mirroring the reference entry points (`InfoInv/main.py:363-375`,
`TriPlane/main.py:391-406`):

    python main.py --config configs/lego_infoinv.txt [--infoinv]
    python main.py --config configs/lego_triplane.txt          # learned gauge
    python main.py --config ... --render_only 1 --render_test 1 --ckpt path

Subsystem selection (the reference uses two sibling directories) is via
``--subsystem infoinv|triplane`` (set in the bundled configs).
"""

from __future__ import annotations

import datetime
import os
import sys

import numpy as np


def main(argv=None):
    from ngf_tpu.config import config_parser
    from ngf_tpu.parallel.mesh import maybe_initialize_distributed

    # Multi-host opt-in (NGF_COORDINATOR/NGF_DISTRIBUTED): must run before
    # the first device query so jax.devices() spans the whole slice.
    maybe_initialize_distributed()
    args = config_parser(argv)
    np.random.seed(args.seed)

    if args.render_only and (args.render_test or args.render_path):
        run_test(args)
    else:
        run_train(args)


def _logfolder(args):
    if args.add_timestamp:
        stamp = datetime.datetime.now().strftime("-%Y%m%d-%H%M%S")
        return f"{args.basedir}/{args.expname}{stamp}"
    return f"{args.basedir}/{args.expname}"


def run_train(args):
    from ngf_tpu.data import load_dataset
    from ngf_tpu.parallel import make_mesh
    from ngf_tpu.render.evaluation import evaluation, evaluation_path
    from ngf_tpu.train.loop import TriPlaneTrainer

    train_dataset = load_dataset(
        args.dataset_name, args.datadir, split="train",
        downsample=args.downsample_train, is_stack=False,
    )
    test_dataset = load_dataset(
        args.dataset_name, args.datadir, split="test",
        # the reference passes downsample_train even here (main.py:26,196);
        # downsample_test is wired as the obvious intent of the flag.
        downsample=args.downsample_test, is_stack=True,
    )

    logfolder = _logfolder(args)
    os.makedirs(logfolder, exist_ok=True)

    import jax

    if args.mesh_shape:
        from ngf_tpu.parallel.mesh import make_mesh_2d

        d, s = (int(v) for v in args.mesh_shape.lower().split("x"))
        mesh = make_mesh_2d(d, s) if d * s > 1 else None
    else:
        mesh = make_mesh() if len(jax.devices()) > 1 else None
    if args.ckpt:
        # --ckpt without --render_only: RESUME training from the checkpoint
        # (failure recovery for multi-hour runs; the reference restarts from
        # scratch — `InfoInv/main.py:191` has no resume path).
        trainer = TriPlaneTrainer.from_checkpoint(
            args.ckpt, args, train_dataset, test_dataset, logfolder, mesh=mesh
        )
        print(f"[trainer] resumed from {args.ckpt} at iteration {trainer.iteration}")
    else:
        trainer = TriPlaneTrainer(args, train_dataset, test_dataset, logfolder, mesh=mesh)
    stats = trainer.run()
    print(f"training done: {stats}")

    if args.export_mesh:
        trainer.export_mesh(os.path.join(logfolder, "mesh.ply"))
        print("mesh exported")

    # Final evaluations march the full geometry-derived sample count with
    # no compaction, mirroring the reference's N_samples=-1 final evals
    # (`InfoInv/main.py:338-346`) — see make_eval_render_fn(full=True).
    render_fn = trainer.make_eval_render_fn(full=True)
    if args.render_train:
        train_stack = load_dataset(
            args.dataset_name, args.datadir, split="train",
            downsample=args.downsample_train, is_stack=True,
        )
        psnrs = evaluation(
            train_stack, render_fn, f"{logfolder}/imgs_train_all", n_vis=-1,
            chunk=args.eval_chunk,
            compute_extra_metrics=bool(args.compute_extra_metrics),
        )
        print(f"======> {args.expname} train all psnr: {np.mean(psnrs)} <========")
    if args.render_test:
        psnrs = evaluation(
            test_dataset, render_fn, f"{logfolder}/imgs_test_all", n_vis=-1,
            chunk=args.eval_chunk,
            compute_extra_metrics=bool(args.compute_extra_metrics),
        )
        print(f"======> {args.expname} test all psnr: {np.mean(psnrs)} <========")
    if args.render_path and test_dataset.render_path is not None:
        evaluation_path(
            test_dataset, render_fn, test_dataset.render_path,
            f"{logfolder}/imgs_path_all", chunk=args.eval_chunk,
        )


def run_test(args):
    """Render-only from a checkpoint (`InfoInv/main.py:22-58`)."""
    import jax

    from ngf_tpu.data import load_dataset
    from ngf_tpu.fields import TriPlaneConfig
    from ngf_tpu.render import RenderConfig, render_rays
    from ngf_tpu.render.evaluation import evaluation, evaluation_path
    from ngf_tpu.utils.checkpoint import load_checkpoint
    import jax.numpy as jnp

    if not args.ckpt or not os.path.exists(args.ckpt):
        print("the ckpt path does not exists!!")
        return

    test_dataset = load_dataset(
        args.dataset_name, args.datadir, split="test",
        # the reference passes downsample_train even here (main.py:26,196);
        # downsample_test is wired as the obvious intent of the flag.
        downsample=args.downsample_test, is_stack=True,
    )
    params, meta, alpha_volume, alpha_aabb = load_checkpoint(args.ckpt)
    model_cfg = TriPlaneConfig(**meta["model_cfg"])
    from ngf_tpu.utils.grid import grid_n_samples

    rcfg = RenderConfig(
        aabb=tuple(map(tuple, meta["aabb"])),
        near=meta["near_far"][0],
        far=meta["near_far"][1],
        # full geometry-derived marching, mirroring the reference's
        # render-only evals (N_samples=-1 -> field nSamples,
        # `InfoInv/main.py:46-58`, `FieldBase.py:71-72`)
        n_samples=grid_n_samples(meta["aabb"], meta["step_size"]),
        step_size=meta["step_size"],
        distance_scale=args.distance_scale,
        ray_march_weight_thres=args.rm_weight_mask_thre,
        white_bg=test_dataset.white_bg,
        sample_cap=args.sample_cap,
    )
    vol = None if alpha_volume is None else jnp.asarray(alpha_volume)
    vaabb = None if alpha_aabb is None else jnp.asarray(alpha_aabb)

    @jax.jit
    def render(rays):
        out = render_rays(
            params, model_cfg, rcfg, rays, None,
            is_train=False, iteration=args.n_iters + 1,
            alpha_volume=vol, alpha_aabb=vaabb,
        )
        return out["rgb_map"], out["depth_map"]

    logfolder = os.path.dirname(args.ckpt)
    if args.render_train:
        train_stack = load_dataset(
            args.dataset_name, args.datadir, split="train",
            downsample=args.downsample_train, is_stack=True,
        )
        psnrs = evaluation(
            train_stack, render, f"{logfolder}/imgs_train_all", n_vis=-1,
            chunk=args.eval_chunk,
            compute_extra_metrics=bool(args.compute_extra_metrics),
        )
        print(f"======> {args.expname} train all psnr: {np.mean(psnrs)} <========")
    if args.render_test:
        psnrs = evaluation(
            test_dataset, render, f"{logfolder}/{args.expname}/imgs_test_all",
            n_vis=-1, chunk=args.eval_chunk,
            compute_extra_metrics=bool(args.compute_extra_metrics),
        )
        print(f"======> {args.expname} test all psnr: {np.mean(psnrs)} <========")
    if args.render_path and test_dataset.render_path is not None:
        evaluation_path(
            test_dataset, render, test_dataset.render_path,
            f"{logfolder}/{args.expname}/imgs_path_all", chunk=args.eval_chunk,
        )


if __name__ == "__main__":
    main(sys.argv[1:])
