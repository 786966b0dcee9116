"""lqer_tpu — a TPU-native low-rank quantization-error-reconstruction (LQER)
framework built on JAX/XLA/Pallas/pjit.

Capabilities mirror the reference research pipeline (ChengZhang-98/lqer,
mounted at /root/reference) — post-training quantization of LLMs with
low-rank error correction ``Y = X_q W_q^T + (X_q A) B`` — re-designed
TPU-first: functional quantizers with `jax.custom_vjp` STE, pytree models,
one `jax.sharding.Mesh` instead of device maps, and real fused Pallas
W4A8 dequant-GEMM + low-rank kernels where the reference only emulates.
"""

__version__ = "0.1.0"
