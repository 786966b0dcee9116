"""`lqer-tpu` console entry point.

Subcommand dispatch over the framework's workflows (the reference drives
everything through `experiments/pipeline/pipeline.py` + bash sweeps,
`README.md:42-51`; here the same surfaces are installable commands):

    lqer-tpu pipeline <config.toml> [tags...] [--a:b:c=v ...]
    lqer-tpu serve <config.toml> --prompt "1 2 3" [--pallas --scan-layers]
    lqer-tpu sweep <template.toml> --method lqer-act --ranks 8 32 ...
    lqer-tpu collect-results <checkpoints-dir>
    lqer-tpu chunked-approximate <config.toml> --chunk-idx 0 --num-chunks 4
    lqer-tpu merge-chunks <project-dir>
"""

from __future__ import annotations

import sys

_USAGE = __doc__.split("surfaces are installable commands):", 1)[1]


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print("usage:" + _USAGE)
        return 0
    cmd, rest = argv[0], argv[1:]
    if cmd == "pipeline":
        from .runners import run_pipeline

        run_pipeline(rest)
    elif cmd == "serve":
        from .serving.cli import main as serve_main

        serve_main(rest)
    elif cmd == "sweep":
        from .sweep import main as sweep_main

        sweep_main(rest)
    elif cmd == "collect-results":
        from .collect import main as collect_main

        collect_main(rest)
    elif cmd == "chunked-approximate":
        from .chunked_runners import run_chunked_approximator

        run_chunked_approximator(rest)
    elif cmd == "merge-chunks":
        from .chunked_runners import merge_chunks

        if len(rest) != 1:
            print("usage: lqer-tpu merge-chunks <project-dir>",
                  file=sys.stderr)
            return 2
        merge_chunks(rest[0])
    else:
        print(f"unknown subcommand {cmd!r}\nusage:" + _USAGE, file=sys.stderr)
        return 2
    return 0


if __name__ == "__main__":
    sys.exit(main())
