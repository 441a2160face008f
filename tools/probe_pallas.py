#!/usr/bin/env python3
"""Compiled-mode Mosaic gather probes on the real TPU (VERDICT item 7).

Runs each probe in its OWN subprocess (a Mosaic crash must not take down
the caller or wedge the device lease — SIGTERM only, tiny shapes, one
compile per process) and prints a one-line verdict + the exact error
signature for NOTES.md.

    python tools/probe_pallas.py            # all probes
    python tools/probe_pallas.py take       # one probe (in-process)
"""

from __future__ import annotations

import subprocess
import sys
import textwrap

PROBES = {
    # vector gather from a VMEM-resident table via jnp.take
    "take": """
        import jax, jax.numpy as jnp
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def kernel(tab_ref, idx_ref, out_ref):
            out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)

        tab = jnp.arange(512 * 128, dtype=jnp.float32).reshape(512, 128)
        idx = (jnp.arange(256, dtype=jnp.int32) * 7) % 512
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)
        import numpy as np
        ref = np.asarray(tab)[np.asarray(idx)]
        assert np.allclose(np.asarray(out), ref)
        print("PROBE_OK take")
    """,
    # take_along_axis form (indices broadcast to table rank)
    "take_along": """
        import jax, jax.numpy as jnp
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def kernel(tab_ref, idx_ref, out_ref):
            idx = jnp.broadcast_to(idx_ref[:][:, None], (256, 128))
            out_ref[:] = jnp.take_along_axis(tab_ref[:], idx, axis=0)

        tab = jnp.arange(512 * 128, dtype=jnp.float32).reshape(512, 128)
        idx = (jnp.arange(256, dtype=jnp.int32) * 7) % 512
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)
        import numpy as np
        ref = np.asarray(tab)[np.asarray(idx)]
        assert np.allclose(np.asarray(out), ref)
        print("PROBE_OK take_along")
    """,
    # fori_loop of scalar dynamic slices (always supported; rate question)
    "scalar_ds": """
        import jax, jax.numpy as jnp
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def kernel(tab_ref, idx_ref, out_ref):
            def body(i, _):
                out_ref[pl.ds(i, 1), :] = tab_ref[pl.ds(idx_ref[i], 1), :]
                return 0
            jax.lax.fori_loop(0, 256, body, 0)

        tab = jnp.arange(512 * 128, dtype=jnp.float32).reshape(512, 128)
        idx = (jnp.arange(256, dtype=jnp.int32) * 7) % 512
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)
        import numpy as np
        ref = np.asarray(tab)[np.asarray(idx)]
        assert np.allclose(np.asarray(out), ref)
        print("PROBE_OK scalar_ds")
    """,
    # round-1 kernel (4 row-gathers + weighting) on tiny shapes, compiled
    "round1_kernel": """
        import jax, jax.numpy as jnp
        from ngf_tpu.ops.pallas_kernels import pallas_grid_sample_2d
        plane = jax.random.normal(jax.random.PRNGKey(0), (32, 32, 8))
        coords = jax.random.uniform(jax.random.PRNGKey(1), (1024, 2)) * 2 - 1
        out = pallas_grid_sample_2d(plane, coords, interpret=False)
        from ngf_tpu.ops.grid_sample import _grid_sample_2d_rows
        import numpy as np
        ref = _grid_sample_2d_rows(plane, coords)
        assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
        print("PROBE_OK round1_kernel")
    """,
}


def main() -> None:
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    names = sys.argv[1:] or list(PROBES)
    if len(sys.argv) > 1 and len(names) == 1:
        exec(textwrap.dedent(PROBES[names[0]]), {})  # in-process (child mode)
        return
    for name in names:
        env = dict(os.environ)
        env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__))) + (
            ":" + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""
        )
        r = subprocess.run(
            [sys.executable, __file__, name],
            capture_output=True, text=True, timeout=1200, env=env,
        )
        ok = "PROBE_OK" in r.stdout
        print(f"== {name}: {'OK' if ok else 'FAIL rc=' + str(r.returncode)}")
        if not ok:
            sig = (r.stderr or r.stdout).strip().splitlines()
            print("   " + "\n   ".join(sig[-8:]))


if __name__ == "__main__":
    main()
