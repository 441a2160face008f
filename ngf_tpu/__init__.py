"""ngf_tpu — a TPU-native (JAX/XLA/Pallas/pjit) Neural Gauge Fields framework.

A from-scratch rebuild of the capabilities of fnzhan/Neural-Gauge-Fields
(ICLR 2023, "General Neural Gauge Fields") designed for TPU hardware:

- ``ngf_tpu.ops``      — core math kernels: positional/InfoInv encodings,
  torch-parity bilinear/trilinear grid sampling (XLA + Pallas), ray-AABB
  intersection, stratified sampling, alpha compositing.
- ``ngf_tpu.fields``   — scene representations: tri-plane fields with
  identity / InfoInv / learned-gauge projections, and the NeuTex-style
  UV-mapping model (gauge transform, inverse gauge, texture/geometry MLPs).
- ``ngf_tpu.render``   — dense-masked volume renderer (static shapes, XLA
  friendly) replacing the reference's ragged boolean-mask compute.
- ``ngf_tpu.train``    — pjit-compiled train steps, staged training loop
  (alpha-mask updates, AABB shrink, grid upsampling), occupancy subsystem.
- ``ngf_tpu.parallel`` — device-mesh construction and sharded train steps
  (ray batches sharded over a ``data`` axis, params replicated, gradient
  psum over ICI).
- ``ngf_tpu.data``     — Blender/LLFF/NSVF/TanksTemple/own-data/DTU loaders
  and ray batch samplers (host-side numpy).
- ``ngf_tpu.utils``    — metrics (PSNR/SSIM/LPIPS), image/video IO,
  checkpointing with packed occupancy bitmaps.

The reference implementation being rebuilt lives at /root/reference (PyTorch,
single GPU); file:line citations in docstrings throughout this package point
at the behavior each component reproduces.
"""

__version__ = "0.1.0"
