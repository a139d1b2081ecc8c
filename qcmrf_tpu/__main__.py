"""Unified CLI: ``python -m qcmrf_tpu <command> [args]``.

Commands:
    run       experiment driver (counts JSON; reference run_experiment.py)
    eval      evaluation tables (reference eval.py)
    whisker   success-rate figures (reference whisker.py)
    bench     kernel/sampling micro-benchmarks
    train     fit an MRF to samples by exact MLE
    infer     serve queries on a model: lnz / prob / map / marginals /
              sample, with evidence clamping and --mesh sharding
"""

from __future__ import annotations

import sys


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0
    cmd, rest = argv[0], argv[1:]
    if cmd == "run":
        from qcmrf_tpu.runners.run_experiment import main as m

        m(rest)
    elif cmd == "eval":
        from qcmrf_tpu.runners.eval import main as m

        m(rest)
    elif cmd == "whisker":
        from qcmrf_tpu.viz.whisker import main as m

        m(rest)
    elif cmd == "bench":
        from qcmrf_tpu.runners.bench import main as m

        m(rest)
    elif cmd == "train":
        from qcmrf_tpu.runners.train_cli import main as m

        m(rest)
    elif cmd == "infer":
        from qcmrf_tpu.runners.infer_cli import main as m

        m(rest)
    else:
        print(f"unknown command {cmd!r}\n{__doc__}", file=sys.stderr)
        return 2
    return 0


if __name__ == "__main__":
    sys.exit(main())
