#!/usr/bin/env python
"""Disk GC: recursively delete bulky error_T_dict artifacts under a
checkpoints tree (reference: `experiments/remove_error_T_dict.py`, 37 LoC)."""

import argparse
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path", type=str)
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    total = 0
    for pat in ("error_T_dict.safetensors", "error_T_dict.pt", "error_T_dict.npz"):
        for f in Path(args.path).rglob(pat):
            size = f.stat().st_size
            total += size
            print(f"{'would remove' if args.dry_run else 'removing'} "
                  f"{f} ({size / 1e6:.1f} MB)")
            if not args.dry_run:
                f.unlink()
    print(f"{'would free' if args.dry_run else 'freed'} {total / 1e9:.2f} GB")


if __name__ == "__main__":
    main()
