"""Interpreter-mode parity for the Pallas gather kernel.

`ngf_tpu/ops/pallas_kernels.py` is the documented dead-end probe of
Mosaic's dynamic-gather (the compiled path fails on the axon backend —
see its docstring); this pins the claim its docstring makes: the kernel
is CORRECT (vs `grid_sample_2d`, itself torch-oracle-tested in
tests/test_ops_parity.py) wherever the interpreter runs, so the moment a
libtpu ships working Mosaic gather the kernel can be promoted by flipping
`pallas_supported()`.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from ngf_tpu.ops.grid_sample import grid_sample_2d  # noqa: E402
from ngf_tpu.ops.pallas_kernels import pallas_grid_sample_2d  # noqa: E402


class TestPallasGridSampleInterpret:
    @pytest.mark.parametrize("shape", [(8, 8, 4), (16, 9, 3)])
    def test_matches_blocks_gather_random(self, shape):
        H, W, C = shape
        key = jax.random.PRNGKey(3)
        k1, k2 = jax.random.split(key)
        plane = jax.random.normal(k1, (H, W, C), jnp.float32)
        coords = jax.random.uniform(k2, (257, 2), minval=-1.2, maxval=1.2)
        want = grid_sample_2d(plane, coords)
        got = pallas_grid_sample_2d(plane, coords, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )

    def test_corners_and_padding(self):
        """align_corners=True: coord -1/+1 hits texel 0 / size-1 exactly;
        out-of-range stencils fade to zero (torch zero padding)."""
        H, W, C = 5, 7, 2
        plane = jnp.arange(H * W * C, dtype=jnp.float32).reshape(H, W, C)
        coords = jnp.array(
            [[-1.0, -1.0], [1.0, 1.0], [-1.0, 1.0], [-3.0, 0.0], [0.0, 3.0]]
        )
        got = np.asarray(pallas_grid_sample_2d(plane, coords, interpret=True))
        np.testing.assert_allclose(got[0], np.asarray(plane[0, 0]))
        np.testing.assert_allclose(got[1], np.asarray(plane[-1, -1]))
        np.testing.assert_allclose(got[2], np.asarray(plane[-1, 0]))
        np.testing.assert_allclose(got[3], 0.0)  # fully outside
        np.testing.assert_allclose(got[4], 0.0)

    def test_batch_shape_and_block_padding(self):
        """Non-multiple-of-block N exercises the internal pad/unpad; the
        batch shape round-trips."""
        key = jax.random.PRNGKey(0)
        plane = jax.random.normal(key, (8, 8, 8), jnp.float32)
        coords = jax.random.uniform(key, (3, 11, 2), minval=-1, maxval=1)
        got = pallas_grid_sample_2d(plane, coords, interpret=True)
        assert got.shape == (3, 11, 8)
        want = grid_sample_2d(plane, coords)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )
