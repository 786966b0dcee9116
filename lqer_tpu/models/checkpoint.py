"""Checkpoint / artifact IO.

* HF pretrained checkpoints (safetensors or torch .bin shards) → flat
  ``{hf_name: np.ndarray}`` dicts, the param format of our models.
* Pipeline artifacts (scale_dict, low_rank_dict, error_T_dict): saved as
  ``.safetensors``; loading also accepts the reference's torch ``.pt``
  artifacts (`runners.py:40-52` `_load_tensor_dict`, incl. the chunked-list
  form) so reference-produced calibrations can be consumed directly for
  cross-validation.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from ..utils.logging import get_logger

logger = get_logger("checkpoint")


def load_tensor_dict(path) -> dict[str, np.ndarray]:
    """Load one artifact file, or merge a list of chunk paths
    (`runners.py:40-52`)."""
    if isinstance(path, (list, tuple)):
        merged: dict[str, np.ndarray] = {}
        for p in path:
            merged.update(load_tensor_dict(p))
        return merged
    path = Path(path)
    if path.suffix == ".safetensors":
        from safetensors.numpy import load_file

        return load_file(str(path))
    if path.suffix in (".pt", ".bin", ".pth"):
        import torch

        obj = torch.load(str(path), map_location="cpu", weights_only=True)
        return {k: v.float().numpy() for k, v in obj.items()}
    if path.suffix == ".npz":
        with np.load(str(path)) as z:
            return {k: z[k] for k in z.files}
    raise ValueError(f"Unknown artifact format: {path}")


def save_tensor_dict(d: dict, path) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    arrays = {k: np.asarray(v) for k, v in d.items()}
    if path.suffix == ".safetensors":
        from safetensors.numpy import save_file

        save_file(arrays, str(path))
    elif path.suffix == ".npz":
        np.savez(str(path), **arrays)
    else:
        raise ValueError(f"Unknown artifact format: {path}")


def load_hf_pretrained(model_dir) -> dict[str, np.ndarray]:
    """Load a local HF checkpoint directory into a flat param dict.

    Handles single/sharded safetensors and torch .bin; fp16/bf16 are upcast
    to fp32 (the reference evaluates in fp32/fp16 software emulation).
    """
    model_dir = Path(model_dir)
    params: dict[str, np.ndarray] = {}

    st_files = sorted(model_dir.glob("*.safetensors"))
    index = model_dir / "model.safetensors.index.json"
    if index.exists():
        with open(index) as f:
            weight_map = json.load(f)["weight_map"]
        st_files = sorted({model_dir / v for v in weight_map.values()})
    if st_files:
        from safetensors import safe_open

        for fp in st_files:
            with safe_open(str(fp), framework="np") as f:
                for k in f.keys():
                    t = f.get_tensor(k)
                    params[k] = _to_f32(t, k, fp)
        return params

    bin_files = sorted(model_dir.glob("pytorch_model*.bin"))
    if bin_files:
        import torch

        for fp in bin_files:
            obj = torch.load(str(fp), map_location="cpu", weights_only=True)
            for k, v in obj.items():
                params[k] = v.float().numpy()
        return params

    raise FileNotFoundError(f"No checkpoint files found under {model_dir}")


def _to_f32(t: np.ndarray, name: str, fp) -> np.ndarray:
    if t.dtype == np.float16 or str(t.dtype) == "bfloat16":
        return t.astype(np.float32)
    return t


def resolve_model_source(model_name: str, local_dir: str | None = None):
    """Find a local checkpoint dir for an HF model id, or None (random init —
    offline test mode)."""
    candidates = []
    if local_dir:
        candidates.append(Path(local_dir))
    cache = Path.home() / ".cache/huggingface/hub"
    hub_name = "models--" + model_name.replace("/", "--")
    if (cache / hub_name).exists():
        snaps = sorted((cache / hub_name / "snapshots").glob("*"))
        candidates.extend(snaps)
    for c in candidates:
        if c.is_dir():
            return c
    return None
