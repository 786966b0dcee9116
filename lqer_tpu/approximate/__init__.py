"""Offline low-rank approximation of quantization error (the method's core).

Equivalent of `/root/reference/src/lqer/approximate/`:

* ``lqer-svd`` — ``A,B ≈ SVD_k((W - W_q)^T)`` (`lqer_svd.py:36-47`)
* ``lqer-act`` (L²QER) — activation-scaled SVD
  ``A = diag(s)^-1 U_k``, ``B = diag(S_k) V^T_k`` of ``diag(s)(W - W_q)^T``
  (`lqer_act.py:83-97`)

TPU-native redesign: weights with the same shape+config are **batched** and
the SVD is ``vmap``-ed over the group (optionally sharded over a device mesh),
replacing the reference's per-weight CPU↔GPU staging loop and its job-level
"chunked runner" parallelism (`chunked_runners.py:45-183`).
"""

from .approximator import (
    ModelApproximator,
    approximate_weight,
    get_model_approximator,
)

__all__ = ["ModelApproximator", "approximate_weight", "get_model_approximator"]
