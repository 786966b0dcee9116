"""Sweep runner — Python replacement for the reference's bash sweep loops
(`experiments/pipeline/sweep_lqer_act.sh:30-81` etc.). Exposed as
``lqer-tpu sweep`` and ``experiments/sweep.py``.

Runs the pipeline over the cartesian product of rank × W-bits × A-bits ×
block sizes, generating the same ~25 per-run config overrides the bash
scripts build, and enforcing the config invariants the reference documents
(`configs/template/llama-7b.toml:74-76,91`): the eval-time quantizers must
match the approximation-time quantizers, and l_config.rank must match the
approximator rank.
"""

import argparse
import itertools
import sys
from pathlib import Path

from .runners import run_pipeline
from .utils import get_logger

logger = get_logger("sweep")


def build_overrides(method, rank, w_bits, x_bits, w_block, x_block,
                    save_dir, num_profile_samples):
    """The override set of one sweep point (`sweep_lqer_act.sh:41-74`)."""
    approx_name = "lqer-act" if method.startswith("lqer-act") else method
    ov = [
        f"--project=lqer-sweep",
        f"--checkpoint_path={save_dir}",
        f"--profile:num_samples={num_profile_samples}",
        f"--approximate:name={approx_name}",
        # invariant: approximator quantizers ≡ eval quantizers
        f"--approximate:approximator:default:rank={rank}",
        f"--approximate:approximator:default:W_quantizer:width={w_bits}",
        f"--approximate:approximator:default:W_quantizer:block_size=:ast:{w_block}",
        f"--approximate:approximator:default:A_quantizer:width={x_bits}",
        f"--approximate:approximator:default:A_quantizer:block_size=:ast:{x_block}",
        f"--approximate:approximator:default:B_quantizer:width={x_bits}",
        f"--approximate:approximator:default:B_quantizer:block_size=:ast:{x_block}",
        f"--l_config:linear:rank={rank}",
        f"--q_config:linear:w_quantizer:width={w_bits}",
        f"--q_config:linear:w_quantizer:block_size=:ast:{w_block}",
        f"--q_config:linear:x_quantizer:width={x_bits}",
        f"--q_config:linear:x_quantizer:block_size=:ast:{x_block}",
        f"--q_config:linear:b_quantizer:width={x_bits}",
        f"--q_config:linear:b_quantizer:block_size=:ast:{x_block}",
        f"--q_config:bmm:w_quantizer:width={x_bits}",
        f"--q_config:bmm:w_quantizer:block_size=:ast:{x_block}",
        f"--q_config:bmm:x_quantizer:width={x_bits}",
        f"--q_config:bmm:x_quantizer:block_size=:ast:{x_block}",
        f"--q_config:matmul:w_quantizer:width={x_bits}",
        f"--q_config:matmul:w_quantizer:block_size=:ast:{x_block}",
        f"--q_config:matmul:x_quantizer:width={x_bits}",
        f"--q_config:matmul:x_quantizer:block_size=:ast:{x_block}",
    ]
    if method == "no-lqer":
        # baseline WxAy without A/B (`sweep_baseline_no_lqer.sh:46-50`):
        # rank 1 + disable_lqer
        ov = [o for o in ov if "approximate:name" not in o]
        ov += [
            "--approximate:name=lqer-svd",
            "--evaluate:disable_lqer=:ast:True",
        ]
    elif method in ("lqer-act-int", "lqer-act-w-only"):
        # the reference's INT and W-only (W4A16) variants
        # (`sweep_lqer_act_int.sh:52-66`, `sweep_lqer_act_w-only.sh`):
        # activations/A_out/B_out/bmm/matmul all passthrough (emulated FP16),
        # only the weight quantizer (and for -int its whole-row [1,-1]
        # blocking) is active
        drop = ("A_quantizer", "B_quantizer", "x_quantizer", "b_quantizer",
                "bmm", "matmul")
        ov = [o for o in ov if not any(d in o for d in drop)]
        ov += [
            "--approximate:approximator:default:A_quantizer:name=passthrough",
            "--approximate:approximator:default:B_quantizer:name=passthrough",
            "--q_config:linear:x_quantizer:name=passthrough",
            "--q_config:linear:b_quantizer:name=passthrough",
            "--q_config:bmm:w_quantizer:name=passthrough",
            "--q_config:bmm:x_quantizer:name=passthrough",
            "--q_config:matmul:w_quantizer:name=passthrough",
            "--q_config:matmul:x_quantizer:name=passthrough",
        ]
    return ov


def main(argv=None):
    ap = argparse.ArgumentParser(prog="lqer-tpu sweep")
    ap.add_argument("template", type=str)
    ap.add_argument("--method", default="lqer-act",
                    choices=["lqer-act", "lqer-svd", "no-lqer",
                             "lqer-act-int", "lqer-act-w-only"])
    ap.add_argument("--ranks", type=int, nargs="+", default=[32])
    ap.add_argument("--w-bits", type=int, nargs="+", default=[4])
    ap.add_argument("--x-bits", type=int, nargs="+", default=[8])
    ap.add_argument("--w-blocks", type=str, nargs="+", default=["[1,16]"])
    ap.add_argument("--x-blocks", type=str, nargs="+", default=["[1,16]"])
    ap.add_argument("--num-profile-samples", type=int, default=32)
    ap.add_argument("--save-root", type=str, default="checkpoints/sweeps")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args(argv)

    grid = list(itertools.product(
        args.ranks, args.w_bits, args.x_bits, args.w_blocks, args.x_blocks
    ))
    logger.info("sweep: %d points", len(grid))
    failures = []
    for rank, wb, xb, wblk, xblk in grid:
        tag = (f"{args.method}_W{wb}A{xb}_rank{rank}"
               f"_WB{wblk.replace(',', '-')}_XB{xblk.replace(',', '-')}")
        save_dir = Path(args.save_root) / tag
        ov = build_overrides(args.method, rank, wb, xb, wblk, xblk,
                             save_dir, args.num_profile_samples)
        argv = [args.template, tag, "--overwrite_checkpoint=:ast:True"] + ov
        logger.info("=== %s ===", tag)
        if args.dry_run:
            print(" \\\n  ".join(["pipeline.py"] + argv))
            continue
        try:
            run_pipeline(argv)
        except Exception as e:  # keep sweeping, report at the end
            logger.error("sweep point %s failed: %s", tag, e)
            failures.append((tag, str(e)))
    if failures:
        logger.error("%d/%d sweep points failed: %s",
                     len(failures), len(grid), [t for t, _ in failures])
        sys.exit(1)



if __name__ == "__main__":
    main()
