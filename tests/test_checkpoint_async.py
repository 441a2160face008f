"""Non-blocking checkpoint writes (round-5 item): periodic ``save_every``
saves must not stall training on npz serialization (the measured 74.6 s
stall at gauge-30k scale, results/gauge30k_r4b @3000), and a crash mid-write
must never corrupt an existing ``model.npz``.

Contrast with the reference: `InfoInv/main.py:335-336` saves synchronously
with a bare ``torch.save`` — a kill mid-write leaves a truncated,
unloadable ``.th`` (and the reference cannot resume training anyway).
"""

import os
import threading

import numpy as np
import pytest

from ngf_tpu.utils.checkpoint import (
    AsyncCheckpointWriter,
    load_checkpoint,
    pack_checkpoint,
    save_checkpoint,
    write_arrays_atomic,
)


def _params(seed: int):
    rng = np.random.default_rng(seed)
    return {"plane": rng.normal(size=(4, 8)).astype(np.float32),
            "mlp": {"w": rng.normal(size=(8, 3)).astype(np.float32)}}


class TestAtomicWrite:
    def test_async_equals_sync(self, tmp_path):
        params = _params(0)
        sync_p = os.path.join(tmp_path, "sync.npz")
        async_p = os.path.join(tmp_path, "async.npz")
        save_checkpoint(sync_p, params, {"it": 7})

        w = AsyncCheckpointWriter()
        w.submit(async_p, pack_checkpoint(params, {"it": 7}))
        w.wait()

        for got, want in zip(load_checkpoint(async_p), load_checkpoint(sync_p)):
            if isinstance(want, dict):
                assert {k: v.tolist() for k, v in _flat(got).items()} == {
                    k: v.tolist() for k, v in _flat(want).items()
                }
            else:
                assert (got is None and want is None) or np.array_equal(got, want)

    def test_crash_mid_write_preserves_old_checkpoint(self, tmp_path, monkeypatch):
        path = os.path.join(tmp_path, "model.npz")
        old = _params(1)
        save_checkpoint(path, old, {"it": 1})

        # Simulate a crash: the serializer dies after writing partial bytes.
        def _dying_savez(f, **arrays):
            f.write(b"PK\x03\x04 truncated npz bytes")
            raise RuntimeError("simulated crash mid-write")

        monkeypatch.setattr(np, "savez", _dying_savez)
        with pytest.raises(RuntimeError, match="simulated crash"):
            write_arrays_atomic(path, {"x": np.zeros(3)})
        monkeypatch.undo()

        # The original file is intact and loadable; no tmp litter remains.
        got, meta, _, _ = load_checkpoint(path)
        assert meta["it"] == 1
        assert np.array_equal(_flat(got)["plane"], old["plane"])
        assert not any(n.endswith(".tmp") for n in os.listdir(tmp_path))

    def test_writer_failure_is_loud_on_next_wait(self, tmp_path):
        w = AsyncCheckpointWriter()
        w.submit(os.path.join(tmp_path, "no_such_dir", "m.npz"),
                 {"x": np.zeros(2)})
        with pytest.raises(FileNotFoundError):
            w.wait()
        # the writer is reusable after a failure
        ok = os.path.join(tmp_path, "ok.npz")
        w.submit(ok, {"x": np.arange(3)})
        w.wait()
        assert np.array_equal(np.load(ok)["x"], np.arange(3))

    def test_submit_does_not_block_on_serialization(self, tmp_path, monkeypatch):
        """submit() returns while the (gated) write is still in flight —
        the non-blocking property itself, without wall-clock flakiness."""
        gate = threading.Event()
        real_savez = np.savez

        def _gated_savez(f, **arrays):
            gate.wait(timeout=30)
            real_savez(f, **arrays)

        monkeypatch.setattr(np, "savez", _gated_savez)
        path = os.path.join(tmp_path, "gated.npz")
        w = AsyncCheckpointWriter()
        w.submit(path, {"x": np.arange(4)})
        assert not os.path.exists(path)  # write is parked behind the gate
        gate.set()
        w.wait()
        assert np.array_equal(np.load(path)["x"], np.arange(4))


def _flat(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flat(v, f"{prefix}{k}/"))
        else:
            out[f"{prefix}{k}"] = np.asarray(v)
    return out


class TestTrainerIntegration:
    def test_periodic_save_background_and_final_sync(self, tmp_path):
        """A run with save_every writes ckpt/blocked_s scalars (the stall
        decomposition VERDICT asks for) and ends with a loadable, resume-
        complete checkpoint."""
        import json

        from ngf_tpu.config import TrainArgs
        from ngf_tpu.data import make_synthetic_dataset
        from ngf_tpu.train.loop import TriPlaneTrainer

        args = TrainArgs(
            subsystem="infoinv", dataset_name="synthetic", batch_size=128,
            n_iters=64, nSamples=32, vis_every=0, N_vis=0, save_every=32,
            steps_per_call=8, upsamp_list=[], update_AlphaMask_list=[],
            seed=0, plane_res=16, gauge_res=16, alpha_grid_res=16,
            prewarm_events=0,
        )
        train = make_synthetic_dataset("train", n_views=4, wh=(24, 24))
        out = os.path.join(tmp_path, "run")
        trainer = TriPlaneTrainer(args, train, None, out)
        trainer.run()

        rows = [json.loads(l) for l in open(os.path.join(out, "scalars.jsonl"))]
        blocked = [r for r in rows if "ckpt/blocked_s" in r]
        assert [r["step"] for r in blocked] == [32]  # 64 is the final sync save
        assert all(r["ckpt/blocked_s"] >= 0 for r in blocked)

        params, meta, _, _ = load_checkpoint(os.path.join(out, "model.npz"))
        assert meta["iteration"] == 64
        from ngf_tpu.utils.checkpoint import load_extra_arrays

        extra = load_extra_arrays(os.path.join(out, "model.npz"))
        assert "key" in extra and "ray_ids" in extra
