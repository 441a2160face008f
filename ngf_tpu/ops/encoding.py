"""Frequency positional encoding and the InfoInv phase-transform modulation.

Reproduces the encoding semantics of the reference implementation
(`InfoInv/models/networks.py:227-237`): for input of last-dim D and F
frequency bands, the output layout is coordinate-major / frequency-minor,
with the full sin block followed by the full cos block:

    [sin(x0*2^0), sin(x0*2^1), ..., sin(x0*2^{F-1}), sin(x1*2^0), ...,
     cos(x0*2^0), ...]

This exact (un-interleaved) layout matters for InfoInv: plane features are
multiplied elementwise by the encoding (`InfoInv/models/Field.py:63-64`),
so feature channel c is permanently bound to one (coord, freq, sin|cos)
triple.
"""

from __future__ import annotations

import jax.numpy as jnp


def positional_encoding(x: jnp.ndarray, freqs: int) -> jnp.ndarray:
    """Frequency encoding of ``x`` with ``freqs`` octave bands.

    Args:
      x: (..., D) input positions/directions.
      freqs: number of frequency bands F (powers of two: 1, 2, 4, ...).

    Returns:
      (..., 2*D*F) encoding, sin block then cos block, coordinate-major
      frequency-minor within each block.
    """
    freq_bands = (2.0 ** jnp.arange(freqs)).astype(x.dtype)  # (F,)
    pts = (x[..., None] * freq_bands).reshape(*x.shape[:-1], x.shape[-1] * freqs)
    return jnp.concatenate([jnp.sin(pts), jnp.cos(pts)], axis=-1)


def infoinv_modulate(feat: jnp.ndarray, xyz: jnp.ndarray, freqs: int) -> jnp.ndarray:
    """InfoInv sinusoidal phase-transform: multiply features by PE(xyz).

    The reference multiplies each plane's (C, N) feature matrix by the (C, N)
    positional encoding of the 3D point, with C == 2*3*freqs
    (`InfoInv/models/Field.py:54-64`: C=24 with freqs=4 for density, C=72
    with freqs=12 for rgb). We use channels-last: feat (..., C) * PE (..., C).

    Args:
      feat: (..., 2*3*freqs) plane features.
      xyz: (..., 3) normalized 3D points.
      freqs: frequency band count; 2*3*freqs must equal feat.shape[-1].

    Returns:
      Modulated features, same shape as ``feat``.
    """
    pe = positional_encoding(xyz, freqs)
    if pe.shape[-1] != feat.shape[-1]:
        raise ValueError(
            f"InfoInv channel mismatch: features have {feat.shape[-1]} channels "
            f"but PE({freqs} freqs) of 3D points has {pe.shape[-1]}"
        )
    return feat * pe
