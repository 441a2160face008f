"""Novel-camera-path rendering (`evaluation_path`) on the synthetic scene."""

import os

import numpy as np

from ngf_tpu.config import TrainArgs
from ngf_tpu.data import make_synthetic_dataset
from ngf_tpu.render.evaluation import evaluation_path
from ngf_tpu.train.loop import TriPlaneTrainer


def test_evaluation_path_renders_frames(tmp_path):
    train = make_synthetic_dataset("train", n_views=4, wh=(24, 24))
    test = make_synthetic_dataset("test", n_views=2, wh=(24, 24))
    args = TrainArgs(
        subsystem="infoinv", dataset_name="synthetic", batch_size=512,
        n_iters=192, nSamples=48, vis_every=0, N_vis=0, save_every=0,
        plane_res=32, gauge_res=32, alpha_grid_res=32, seed=0,
    )
    trainer = TriPlaneTrainer(args, train, test, None)
    trainer.run()
    fn = trainer.make_eval_render_fn()

    assert test.render_path is not None and test.render_path.shape[0] == 40
    out = str(tmp_path / "path")
    evaluation_path(test, fn, test.render_path[:3], out, chunk=576)
    frames = sorted(f for f in os.listdir(out) if f.endswith(".png"))
    assert len(frames) == 3
    import imageio.v2 as imageio

    img = imageio.imread(os.path.join(out, frames[0]))
    assert img.shape == (24, 24, 3)
    # novel poses look at the occupied scene: frames must not be blank white
    assert (np.asarray(img) < 250).any()
    assert os.path.isdir(os.path.join(out, "rgbd"))
