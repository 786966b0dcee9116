#!/usr/bin/env python
"""Print the sharding plan for a model over an N-device mesh.

TPU-native successor of the reference's `experiments/infer_device_map.py:22-44`
(which printed balanced decoder-layer→GPU maps to paste into configs). With a
Mesh there is nothing to paste — sharding is derived from rules — so this tool
*reports*: per-param PartitionSpec, per-device bytes, and the implied
collective pattern, for capacity planning.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from lqer_tpu import models  # noqa: E402
from lqer_tpu.parallel.mesh import mesh_shape_for  # noqa: E402
from lqer_tpu.parallel.sharding import spec_for_param  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model_name", type=str)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--tp", type=int, default=None)
    ap.add_argument("--bits", type=float, default=4.5,
                    help="effective bits/weight for quantized linears "
                         "(4-bit codes + 8-bit exponent per 16-group = 4.5)")
    ap.add_argument("--rank", type=int, default=32)
    args = ap.parse_args()

    cfg = models.get_model_config(args.model_name)
    dp, tp = mesh_shape_for(args.devices, args.tp)
    print(f"model={args.model_name} mesh=(dp={dp}, tp={tp})")

    total_bytes_per_dev = 0.0
    summary = {}
    for i in range(cfg.num_hidden_layers):
        for prefix, _ in models.quantizable_module_prefixes(cfg, i):
            # weight shape from config
            pass
    # group by spec for a compact report using layer 0 + embeddings
    import jax

    params = models.init_params(cfg.__class__(**{
        **cfg.__dict__,
        "num_hidden_layers": 1,
    }) if hasattr(cfg, "__dict__") else cfg, jax.random.PRNGKey(0))
    for name, arr in sorted(params.items()):
        spec = spec_for_param(name)
        sharded_dims = sum(1 for s in spec if s == "tp")
        shard_factor = tp if sharded_dims else 1
        is_quant_linear = any(
            name.endswith(p + ".weight")
            for p in ("q_proj", "k_proj", "v_proj", "o_proj", "out_proj",
                      "gate_proj", "up_proj", "down_proj", "fc1", "fc2")
        )
        bytes_per_el = args.bits / 8 if is_quant_linear else 2.0  # bf16 rest
        per_dev = arr.size * bytes_per_el / shard_factor
        mult = cfg.num_hidden_layers if ".layers." in name or "layers." in name else 1
        total_bytes_per_dev += per_dev * mult
        summary[name] = (tuple(arr.shape), str(spec), f"{per_dev/1e6:.2f}MB")

    for name, (shape, spec, mb) in summary.items():
        print(f"  {name:<60} {str(shape):<20} {spec:<24} {mb}/dev")
    print(f"\nestimated param bytes per device: {total_bytes_per_dev/1e9:.2f} GB "
          f"(x{cfg.num_hidden_layers} layers, W{args.bits}-bit linears, "
          f"rank-{args.rank} correctors not included)")


if __name__ == "__main__":
    main()
