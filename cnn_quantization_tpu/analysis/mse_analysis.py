"""Analytic-vs-Monte-Carlo validation of the ACIQ clipping MSE.

Reference: mse_analysis.py — overlays the closed-form clipping+quantization
MSE against simulation on synthetic Gaussian/Laplace draws; the minima of
these curves are the alpha coefficient tables in ops/aciq.py.

Run as a script to save the comparison figure:
  python -m cnn_quantization_tpu.analysis.mse_analysis --prior laplace -bits 4
"""

from __future__ import annotations

import argparse

import numpy as np

from ..ops.aciq import gaussian_clipping_mse, laplace_clipping_mse


def uniform_midtread_quantize(x: np.ndarray, step: float) -> np.ndarray:
    return np.round(x / step) * step


def simulate_clipping_mse(samples: np.ndarray, alphas, num_bits: int):
    """Monte-Carlo MSE of clip-at-alpha + 2^bits mid-tread quantization."""
    out = []
    for alpha in alphas:
        s = np.clip(samples, -alpha, alpha)
        s = uniform_midtread_quantize(s, (2 * alpha) / (2 ** num_bits))
        out.append(float(((s - samples) ** 2).mean()))
    return np.asarray(out)


def compare(prior: str, num_bits: int, scale: float = 2.0, n: int = 100_000,
            seed: int = 0):
    rng = np.random.RandomState(seed)
    alphas = np.arange(0.5 * scale, 10 * scale, 0.05 * scale)
    if prior == 'laplace':
        samples = rng.laplace(0.0, scale, size=n)
        analytic = np.array([laplace_clipping_mse(scale, a, num_bits) for a in alphas])
    else:
        samples = rng.normal(0.0, scale, size=n)
        analytic = np.array([gaussian_clipping_mse(scale, a, num_bits) for a in alphas])
    simulated = simulate_clipping_mse(samples, alphas, num_bits)
    return alphas, analytic, simulated


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--prior', default='laplace', choices=['laplace', 'gaus'])
    p.add_argument('-bits', '--num_bits', default=4, type=int)
    p.add_argument('--out', default='mse_analysis.png')
    args = p.parse_args(argv)
    alphas, analytic, simulated = compare(args.prior, args.num_bits)
    i_a, i_s = int(np.argmin(analytic)), int(np.argmin(simulated))
    print(f'{args.prior} {args.num_bits}-bit: argmin analytic alpha={alphas[i_a]:.2f} '
          f'simulated alpha={alphas[i_s]:.2f}')
    try:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        plt.plot(alphas, simulated, 'b', linewidth=4, label='simulation')
        plt.plot(alphas, analytic, 'r', linewidth=2, label='analysis')
        plt.legend(); plt.xlabel('Clipping Value'); plt.ylabel('Mean Square Error')
        plt.title(f'Bit Width={args.num_bits}')
        plt.savefig(args.out, dpi=120)
        print(f'saved {args.out}')
    except Exception as e:  # matplotlib optional
        print(f'(no figure: {e})')


if __name__ == '__main__':
    main()
