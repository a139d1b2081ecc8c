"""Fit the physical per-gate noise model to every stored hardware table
and write the calibration JSONs the `calibrated:<hw>` engine loads.

Run on the host CPU (the density engine is a numpy path):

    JAX_PLATFORMS=cpu python examples/fit_physical.py [--combos torino:0.1 ...]

Anchors: /root/reference/res_*/result_*.json (5 hardware tables),
reference eval semantics via evaluation.harness.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from qcmrf_tpu.evaluation.harness import (  # noqa: E402
    evaluate_suite,
    load_result_dists,
)
from qcmrf_tpu.models.suite import (  # noqa: E402
    load_suite,
    reference_models_path,
    reference_results_path,
)
from qcmrf_tpu.noise import physical as ph  # noqa: E402

ALL_COMBOS = [
    ("torino", 0.1), ("sherbrooke", 0.1), ("ehningen", 0.1),
    ("torino", 0.25), ("torino", 0.5),
]


def fit_one(backend: str, scale: float, root: str = "/root/reference"):
    suite = load_suite(reference_models_path(scale, root), scale)
    dists, norm = load_result_dists(
        reference_results_path(scale, backend, root)
    )
    t0 = time.time()
    # predictive per-backend-rate fit: one p2q per backend; per-graph
    # mean-statistic freedom = the two readout-drift residuals (jitter
    # sigma is per-graph but second-moment-only — see the fit docstring)
    model = ph.fit_physical_predictive(backend, suite, dists, norm,
                                       verbose=True)
    path = ph.save_physical(model)
    print(f"{backend}@{scale}: fitted in {time.time() - t0:.0f} s -> {path}")

    targets = evaluate_suite(suite, dists=dists, norm=norm)
    out = ph.run_physical_suite(jax.random.PRNGKey(1), suite, model,
                                shots=10_000)
    got = evaluate_suite(suite, dists=out["quasi_dists"], norm=1)
    print("graph | F tgt->got | std tgt->got | d tgt->got | "
          "stdd tgt->got | KL tgt->got")
    for t, g in zip(targets, got):
        print(f"  F {t.mean_f:.4f}->{g.mean_f:.4f} "
              f"stdF {t.std_f:.4f}->{g.std_f:.4f} | "
              f"d {t.mean_delta:.3f}->{g.mean_delta:.3f} "
              f"stdd {t.std_delta:.3f}->{g.std_delta:.3f} | "
              f"KL {t.mean_kl:.4f}->{g.mean_kl:.4f}")
    print("effective per-cx rates:",
          [round(r, 5) for r in ph.effective_cx_rates(suite, model)])
    return model


def polish_one(backend: str, scale: float, root: str = "/root/reference"):
    suite = load_suite(reference_models_path(scale, root), scale)
    dists, norm = load_result_dists(
        reference_results_path(scale, backend, root)
    )
    model = ph.load_physical(backend, scale)
    t0 = time.time()
    model = ph.polish_physical(suite, dists, norm, model, verbose=True)
    path = ph.save_physical(model)
    print(f"{backend}@{scale}: polished in {time.time() - t0:.0f} s "
          f"-> {path}")
    targets = evaluate_suite(suite, dists=dists, norm=norm)
    out = ph.run_physical_suite(jax.random.PRNGKey(1), suite, model,
                                shots=10_000)
    got = evaluate_suite(suite, dists=out["quasi_dists"], norm=1)
    for t, g in zip(targets, got):
        print(f"  F {t.mean_f:.4f}->{g.mean_f:.4f} "
              f"stdF {t.std_f:.4f}->{g.std_f:.4f} | "
              f"d {t.mean_delta:.3f}->{g.mean_delta:.3f} | "
              f"KL {t.mean_kl:.4f}->{g.mean_kl:.4f}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--combos", nargs="*", default=None,
                    help="backend:scale pairs (default: all stored tables)")
    ap.add_argument("--polish-only", action="store_true")
    args = ap.parse_args()
    combos = ALL_COMBOS
    if args.combos:
        combos = [(c.split(":")[0], float(c.split(":")[1]))
                  for c in args.combos]
    for backend, scale in combos:
        if args.polish_only:
            polish_one(backend, scale)
        else:
            fit_one(backend, scale)


if __name__ == "__main__":
    main()
