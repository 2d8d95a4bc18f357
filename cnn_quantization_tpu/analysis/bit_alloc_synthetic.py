"""Synthetic validation of the sigma^(2/3) per-channel bin-allocation rule.

Reference: bit_allocation_synthetic.py — two synthetic Gaussian channels
share a bin budget; sweeping the split shows the MSE minimum lands where the
sigma^(2/3) rule predicts (eq. 11 of the paper).

  python -m cnn_quantization_tpu.analysis.bit_alloc_synthetic
"""

from __future__ import annotations

import numpy as np

from .mse_analysis import uniform_midtread_quantize


def split_mse(x, y, total_bins: float, fracs):
    """MSE of quantizing x with frac*B bins and y with (1-frac)*B bins."""
    out = []
    for f in fracs:
        step_x = (x.max() - x.min()) / (f * total_bins)
        step_y = (y.max() - y.min()) / ((1 - f) * total_bins)
        mse_x = ((uniform_midtread_quantize(x, step_x) - x) ** 2).mean()
        mse_y = ((uniform_midtread_quantize(y, step_y) - y) ** 2).mean()
        out.append(float(mse_x + mse_y))
    return np.asarray(out)


def optimal_fraction(sigma_x: float, sigma_y: float) -> float:
    """The rule's prediction: bins_x / B = sx^(2/3) / (sx^(2/3) + sy^(2/3))."""
    px, py = sigma_x ** (2 / 3), sigma_y ** (2 / 3)
    return px / (px + py)


def run(sigma_x=2.82845653294, sigma_y=1.0, n=100_000, total_bins=32.0, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.normal(0, sigma_x, n)
    y = rng.normal(0, sigma_y, n)
    fracs = np.arange(0.15, 0.85, 0.01)
    mses = split_mse(x, y, total_bins, fracs)
    return fracs, mses


def main():
    fracs, mses = run()
    best = fracs[int(np.argmin(mses))]
    pred = optimal_fraction(2.82845653294, 1.0)
    print(f'empirical optimal fraction: {best:.3f}; sigma^(2/3) rule: {pred:.3f}')
    try:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        plt.plot(fracs, mses, 'b', linewidth=3)
        plt.axvline(pred, color='r', linestyle='--', label='sigma^(2/3) rule')
        plt.xlabel('fraction of bins allocated to channel i')
        plt.ylabel('Mean Square Error'); plt.legend()
        plt.savefig('bit_alloc_synthetic.png', dpi=120)
        print('saved bit_alloc_synthetic.png')
    except Exception as e:
        print(f'(no figure: {e})')


if __name__ == '__main__':
    main()
