"""Load the reference (torch) PIPELINE modules in place as a numeric oracle.

Extends `ref_oracle.py` (quantizer-level) to the composed pipeline: the
scale-hook profiler (`statistic_profiler/scale.py`), the L²QER approximators
(`approximate/lqer_{svd,act}.py`), the quantized layers
(`quantize/quantized_layers/linear.py`), the forked OPT decoder surgery
(`models/opt_decoder.py`) and the perplexity loop (`evaluate/evaluate_lm.py`).

No reference code is copied — modules are imported from the read-only mount
at /root/reference with two tiny environment shims:

* ``colorlog`` / ``toml`` are not installed → stub modules (logging
  formatter passthrough; toml.load via stdlib tomllib — the oracle never
  saves configs).
* the reference pins transformers 4.37 while 4.57 is installed → inject the
  handful of symbols its forked decoders import that were since removed
  (``is_flash_attn_2_available``, the Llama scaling-rotary classes).

Tests that use this oracle must skip cleanly when the mount or torch is
unavailable.
"""

from __future__ import annotations

import importlib
import logging
import sys
import types
from pathlib import Path

_REF_SRC = Path("/root/reference/src")


def _stub_colorlog():
    if "colorlog" in sys.modules:
        return
    colorlog = types.ModuleType("colorlog")

    class _ColoredFormatter(logging.Formatter):
        def __init__(self, fmt=None, *args, **kwargs):
            if fmt:
                fmt = fmt.replace("%(log_color)s", "").replace("%(reset)s", "")
            super().__init__(fmt)

    colorlog.ColoredFormatter = _ColoredFormatter
    colorlog.StreamHandler = logging.StreamHandler
    sys.modules["colorlog"] = colorlog


def _stub_toml():
    if "toml" in sys.modules:
        return
    import tomllib

    toml = types.ModuleType("toml")

    def load(f):
        if hasattr(f, "read"):
            data = f.read()
            if isinstance(data, str):
                data = data.encode()
            return tomllib.loads(data.decode())
        with open(f, "rb") as fh:
            return tomllib.load(fh)

    def _unsupported(*a, **k):
        raise NotImplementedError("toml stub is read-only (oracle use)")

    toml.load = load
    toml.loads = lambda s: __import__("tomllib").loads(s)
    toml.dump = _unsupported
    toml.dumps = _unsupported
    sys.modules["toml"] = toml


def _stub_lm_eval():
    """`lqer.evaluate.__init__` re-exports from the forked lm-eval submodule
    (empty in the mount); stub just the two imported names."""
    if "lm_eval" in sys.modules:
        return
    lm_eval = types.ModuleType("lm_eval")
    evaluator = types.ModuleType("lm_eval.evaluator")

    def _unavailable(*a, **k):
        raise NotImplementedError("lm_eval stub (oracle use)")

    evaluator.simple_evaluate = _unavailable
    evaluator.make_table = _unavailable
    lm_eval.evaluator = evaluator
    sys.modules["lm_eval"] = lm_eval
    sys.modules["lm_eval.evaluator"] = evaluator


def _shim_transformers():
    """Inject names the forked decoders import that transformers >=4.48
    removed. flash-attn is reported unavailable (matching the reference's
    own override, `mistral_decoder.py:28-31`)."""
    import transformers.models.llama.modeling_llama as mll
    import transformers.models.mistral.modeling_mistral as mmis
    import transformers.models.opt.modeling_opt as mopt
    import transformers.utils as tutils

    if not hasattr(tutils, "is_flash_attn_2_available"):
        tutils.is_flash_attn_2_available = lambda: False
    if not hasattr(mll, "is_flash_attn_2_available"):
        mll.is_flash_attn_2_available = lambda: False
    for name in (
        "LlamaLinearScalingRotaryEmbedding",
        "LlamaDynamicNTKScalingRotaryEmbedding",
    ):
        if not hasattr(mll, name):
            setattr(mll, name, mll.LlamaRotaryEmbedding)
    if not hasattr(mmis, "_get_unpad_data"):
        # only used inside the flash-attn path the reference itself disables
        def _get_unpad_data(*a, **k):
            raise NotImplementedError("flash-attn path is disabled")

        mmis._get_unpad_data = _get_unpad_data
    from transformers.activations import ACT2FN

    for mod in (mopt, mmis):
        if not hasattr(mod, "ACT2FN"):
            mod.ACT2FN = ACT2FN


def load_reference_pipeline():
    """Import and return the reference ``lqer`` package (or None)."""
    if not _REF_SRC.is_dir():
        return None
    try:
        import torch  # noqa: F401
        import transformers  # noqa: F401
        import pandas  # noqa: F401
    except ImportError:
        return None

    if "lqer" in sys.modules:
        return sys.modules["lqer"]

    _stub_colorlog()
    _stub_toml()
    _stub_lm_eval()
    _shim_transformers()
    if str(_REF_SRC) not in sys.path:
        sys.path.insert(0, str(_REF_SRC))
    try:
        lqer = importlib.import_module("lqer")
        importlib.import_module("lqer.quantize")
        importlib.import_module("lqer.statistic_profiler")
        importlib.import_module("lqer.approximate")
        importlib.import_module("lqer.evaluate.evaluate_lm")
    except Exception as e:  # pragma: no cover - environment-dependent
        logging.getLogger(__name__).warning("reference pipeline load failed: %s", e)
        return None
    return lqer


def load_reference_opt_decoder():
    """The forked OPT decoder module, or None (its transformers-4.37 host
    model integration may be unloadable under the installed version)."""
    lqer = load_reference_pipeline()
    if lqer is None:
        return None
    try:
        return importlib.import_module("lqer.models.opt_decoder")
    except Exception as e:  # pragma: no cover
        logging.getLogger(__name__).warning("reference opt_decoder load failed: %s", e)
        return None


def _patch_llama_rotary(mod):
    """Rebind the fork's rotary globals to transformers-4.37-semantics
    shims: the fork calls ``rotary_emb(v, seq_len=...) -> full (s, d)
    tables`` and ``apply_rotary_pos_emb(..., position_ids)`` which gathers
    by position — both signatures changed in 4.38+. These are the standard
    public RoPE formulas (same ones `lqer_tpu/models/common.py` implements),
    reconstructed here so the fork's 4.37 call sites run unmodified."""
    import torch

    class _Rotary437(torch.nn.Module):
        def __init__(self, dim, max_position_embeddings=2048, base=10000,
                     device=None, scaling_factor=1.0):
            super().__init__()
            inv_freq = 1.0 / (
                base ** (torch.arange(0, dim, 2, dtype=torch.float32) / dim)
            )
            t = torch.arange(max_position_embeddings, dtype=torch.float32)
            t = t / scaling_factor
            freqs = torch.outer(t, inv_freq)
            emb = torch.cat([freqs, freqs], dim=-1)
            self.register_buffer("cos_cached", emb.cos(), persistent=False)
            self.register_buffer("sin_cached", emb.sin(), persistent=False)

        def forward(self, x, seq_len=None):
            return (self.cos_cached[:seq_len].to(x.dtype),
                    self.sin_cached[:seq_len].to(x.dtype))

    def _rotate_half(x):
        half = x.shape[-1] // 2
        return torch.cat([-x[..., half:], x[..., :half]], dim=-1)

    def _apply_rope_437(q, k, cos, sin, position_ids, unsqueeze_dim=1):
        cos = cos[position_ids].unsqueeze(unsqueeze_dim)
        sin = sin[position_ids].unsqueeze(unsqueeze_dim)
        return (q * cos + _rotate_half(q) * sin,
                k * cos + _rotate_half(k) * sin)

    mod.LlamaRotaryEmbedding = _Rotary437
    mod.LlamaLinearScalingRotaryEmbedding = _Rotary437
    mod.LlamaDynamicNTKScalingRotaryEmbedding = _Rotary437
    mod.MistralRotaryEmbedding = _Rotary437
    mod.apply_rotary_pos_emb = _apply_rope_437


def load_reference_llama_decoder():
    """The forked Llama decoder module with 4.37 rotary compat, or None."""
    lqer = load_reference_pipeline()
    if lqer is None:
        return None
    try:
        mod = importlib.import_module("lqer.models.llama_decoder")
    except Exception as e:  # pragma: no cover
        logging.getLogger(__name__).warning(
            "reference llama_decoder load failed: %s", e)
        return None
    _patch_llama_rotary(mod)
    return mod


def load_reference_mistral_decoder():
    """The forked Mistral decoder module with 4.37 rotary compat, or None.
    (The fork's flash path is dead by its own `is_flash_attn_available`
    override; only the eager attention runs.)"""
    lqer = load_reference_pipeline()
    if lqer is None:
        return None
    try:
        mod = importlib.import_module("lqer.models.mistral_decoder")
    except Exception as e:  # pragma: no cover
        logging.getLogger(__name__).warning(
            "reference mistral_decoder load failed: %s", e)
        return None
    _patch_llama_rotary(mod)  # same 4.37 rotary/apply_rope signatures
    return mod
