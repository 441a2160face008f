#!/usr/bin/env python3
"""UV-Mapping test/export CLI, mirroring `UV-Mapping/test.py` + `dtu_test.sh`.

Loads a checkpoint, exports the learned texture (sphere: 6-face cubemap
merged to a cross image + equirect view; square: single image —
`test.py:58-88`), then renders all test views chunked by
``random_sample_size**2`` rays, optionally with an edited
``--target_texture`` swapped in (`test.py:100-134`).
"""

from __future__ import annotations

import os

import numpy as np

from uv_train import make_dataset, parse_args


def main(argv=None):
    import imageio.v2 as imageio

    from ngf_tpu.fields.neutex import (
        NeuTexConfig,
        export_sphere_equirect,
        export_texture,
    )
    from ngf_tpu.train.uv_loop import UVTrainer
    from ngf_tpu.utils.cubemap import (
        load_cube_from_single_texture,
        load_square,
        merge_cube_to_single_texture,
    )

    opt = parse_args(argv)
    if not opt.resume_dir:
        opt.resume_dir = os.path.join(opt.checkpoints_dir, opt.name)

    dataset = make_dataset(opt, use_test_data=True)
    save_dir = os.path.join(opt.checkpoints_dir, opt.name)
    out_dir = os.path.join(save_dir, "test_output")
    os.makedirs(out_dir, exist_ok=True)

    cfg = NeuTexConfig(
        primitive_type=opt.primitive_type,
        sample_num=opt.sample_num,
        points_per_primitive=opt.points_per_primitive,
    )
    trainer = UVTrainer(cfg, dataset, save_dir=save_dir)
    trainer.load_networks(opt.resume_epoch, opt.resume_dir)
    print(f"loaded checkpoint at step {trainer.step_count}")

    # texture export (`test.py:58-88`)
    viewdir = [0, 0, 1]
    if opt.primitive_type == "sphere":
        faces = np.asarray(export_texture(trainer.params, cfg, 512, viewdir))
        cross = merge_cube_to_single_texture(faces)
        imageio.imwrite(
            os.path.join(out_dir, "texture_cube.png"),
            (np.clip(cross, 0, 1) * 255).astype(np.uint8),
        )
        eq = np.asarray(export_sphere_equirect(trainer.params, cfg, 512, viewdir))
        imageio.imwrite(
            os.path.join(out_dir, "texture_sphere.png"),
            (np.clip(eq, 0, 1) * 255).astype(np.uint8),
        )
    else:
        tex = np.asarray(export_texture(trainer.params, cfg, 512, viewdir))
        imageio.imwrite(
            os.path.join(out_dir, "texture.png"),
            (np.clip(tex, 0, 1) * 255).astype(np.uint8),
        )
    print("texture exported")

    edit = None
    if opt.target_texture != "None":
        if opt.primitive_type == "sphere":
            edit = load_cube_from_single_texture(opt.target_texture)
        else:
            edit = load_square(opt.target_texture)
        edit = edit.astype(np.float32)

    chunk = opt.random_sample_size ** 2
    for vi, idx in enumerate(dataset.indexes):
        rgb, trans = trainer.render_view(
            dataset.campos[idx], dataset.height, dataset.width,
            dataset.focal[idx], dataset.extrinsics[idx][0:3, 0:3],
            dataset.princpt[idx], chunk=chunk, edit_texture=edit,
        )
        imageio.imwrite(
            os.path.join(out_dir, f"render-{vi:03d}.png"),
            (np.clip(rgb, 0, 1) * 255).astype(np.uint8),
        )
        imageio.imwrite(
            os.path.join(out_dir, f"transmittance-{vi:03d}.png"),
            (np.clip(trans, 0, 1) * 255).astype(np.uint8),
        )
    print(f"rendered {len(dataset.indexes)} views to {out_dir}")


if __name__ == "__main__":
    main()
