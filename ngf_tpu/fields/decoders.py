"""MLP decoders as plain parameter pytrees + apply functions.

Functional equivalents of `InfoInv/models/networks.py`:
- ``rgb_decoder`` (lines 12-32): bias-free basis linear on plane features,
  then MLP([basis_feat, view, PE(view)]) -> sigmoid RGB, final bias zeroed.
- ``density_decoder`` (lines 34-54): 3-layer MLP -> raw density feature,
  final bias zeroed.

Init matches torch semantics: ``nn.Linear`` default init is kaiming-uniform
with a=sqrt(5) for weights (bound = 1/sqrt(fan_in)) and uniform
+-1/sqrt(fan_in) for bias; ``xavier_uniform`` follows
`InfoInv/models/networks.py:176-178` (bound = gain * sqrt(6/(fan_in+fan_out))).

Matmuls take ``preferred_element_type=float32`` with optionally bf16 operands
so XLA can schedule them on the MXU without precision loss in accumulation.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

from ..ops.encoding import positional_encoding

Params = dict[str, Any]


def init_linear(
    key: jax.Array,
    in_dim: int,
    out_dim: int,
    init: str = "torch",
    gain: float = 1.0,
    zero_bias: bool = False,
    bias: bool = True,
    dtype=jnp.float32,
) -> Params:
    """One linear layer's params: {'w': (in, out), 'b': (out,)?}."""
    wk, bk = jax.random.split(key)
    if init == "torch":
        bound = 1.0 / math.sqrt(in_dim)
        w = jax.random.uniform(wk, (in_dim, out_dim), dtype, -bound, bound)
    elif init == "xavier_uniform":
        bound = gain * math.sqrt(6.0 / (in_dim + out_dim))
        w = jax.random.uniform(wk, (in_dim, out_dim), dtype, -bound, bound)
    elif init == "zeros":
        w = jnp.zeros((in_dim, out_dim), dtype)
    else:
        raise ValueError(f"unknown init {init!r}")
    p: Params = {"w": w}
    if bias:
        if zero_bias or init == "zeros":
            p["b"] = jnp.zeros((out_dim,), dtype)
        else:
            bb = 1.0 / math.sqrt(in_dim)
            p["b"] = jax.random.uniform(bk, (out_dim,), dtype, -bb, bb)
    return p


def apply_linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    # Match the weight dtype so bf16 weights drive a bf16 MXU matmul with
    # f32 accumulation; f32 weights keep strict f32 compute.
    x = x.astype(p["w"].dtype)
    y = jnp.dot(x, p["w"], preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def init_mlp(
    key: jax.Array,
    dims: list[int],
    init: str = "torch",
    zero_last_bias: bool = True,
    relu_gain_hidden: bool = False,
) -> Params:
    """Sequential linear stack; activation is applied by the caller.

    ``relu_gain_hidden`` reproduces ``init_seq`` (`networks.py:180-189` /
    `UV-Mapping/util.py`): layers followed by ReLU get gain=sqrt(2), the last
    layer gain=1.
    """
    keys = jax.random.split(key, len(dims) - 1)
    layers = []
    for i, (d0, d1) in enumerate(zip(dims[:-1], dims[1:])):
        last = i == len(dims) - 2
        gain = math.sqrt(2.0) if (relu_gain_hidden and not last) else 1.0
        layers.append(
            init_linear(
                keys[i], d0, d1, init=init, gain=gain, zero_bias=(last and zero_last_bias)
            )
        )
    return {"layers": layers}


def apply_mlp(p: Params, x: jnp.ndarray, act=jax.nn.relu) -> jnp.ndarray:
    layers = p["layers"]
    for lp in layers[:-1]:
        x = act(apply_linear(lp, x))
    return apply_linear(layers[-1], x)


def init_rgb_decoder(
    key: jax.Array, feat_dim: int, view_pe: int = 6, middle_dim: int = 128
) -> Params:
    """`rgb_decoder.__init__` (`InfoInv/models/networks.py:12-23`).

    ``view_pe`` is static model config, not a parameter — pass it to
    ``apply_rgb_decoder``.
    """
    kb, km = jax.random.split(key)
    input_dim = feat_dim + 3 + 2 * view_pe * 3
    return {
        "basis": init_linear(kb, feat_dim, feat_dim, bias=False),
        "mlp": init_mlp(km, [input_dim, middle_dim, middle_dim, 3]),
    }


def apply_rgb_decoder(
    p: Params, features: jnp.ndarray, view_dirs: jnp.ndarray, view_pe: int
) -> jnp.ndarray:
    """`rgb_decoder.forward` (`InfoInv/models/networks.py:25-32`)."""
    features = apply_linear(p["basis"], features)
    mlp_in = jnp.concatenate(
        [features, view_dirs, positional_encoding(view_dirs, view_pe)], axis=-1
    )
    return jax.nn.sigmoid(apply_mlp(p["mlp"], mlp_in))


def init_density_decoder(key: jax.Array, feat_dim: int, middle_dim: int = 32) -> Params:
    """`density_decoder.__init__` (`InfoInv/models/networks.py:34-45`)."""
    return {"mlp": init_mlp(key, [feat_dim, middle_dim, middle_dim, 1])}


def apply_density_decoder(p: Params, features: jnp.ndarray) -> jnp.ndarray:
    """Raw density feature (no activation), (`networks.py:47-54`)."""
    return apply_mlp(p["mlp"], features)
