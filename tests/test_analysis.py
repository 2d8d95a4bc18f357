"""Analytic-vs-Monte-Carlo cross-checks (the reference's validation style,
SURVEY.md §4) — the closed forms our alpha tables come from must match
simulation."""

import numpy as np

from cnn_quantization_tpu.analysis.mse_analysis import compare
from cnn_quantization_tpu.analysis.bit_alloc_synthetic import (optimal_fraction,
                                                               run as ba_run)
from cnn_quantization_tpu.ops import aciq


def test_laplace_analytic_matches_simulation():
    alphas, analytic, simulated = compare('laplace', 4, n=200_000)
    # curves agree pointwise within Monte-Carlo noise
    rel = np.abs(analytic - simulated) / np.maximum(analytic, 1e-9)
    assert np.median(rel) < 0.15
    # minima agree and sit near the tabulated coefficient * b
    a_min = alphas[int(np.argmin(simulated))]
    assert abs(a_min - aciq.ALPHA_LAPLACE[4] * 2.0) < 0.6, a_min


def test_gaussian_analytic_matches_simulation():
    alphas, analytic, simulated = compare('gaus', 4, n=200_000)
    a_min = alphas[int(np.argmin(simulated))]
    assert abs(a_min - aciq.ALPHA_GAUS[4] * 2.0) < 0.6, a_min


def test_bit_alloc_rule_matches_simulation():
    fracs, mses = ba_run()
    best = fracs[int(np.argmin(mses))]
    pred = optimal_fraction(2.82845653294, 1.0)
    assert abs(best - pred) < 0.08, (best, pred)
