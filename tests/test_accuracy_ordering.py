"""End-to-end accuracy ordering of the quantization recipes on a *trained*
network, through the full CLI path (VERDICT r2 task 5).

Without ImageNet or pretrained checkpoints (see ACCURACY.md), the recipes
themselves can still be validated end-to-end: train a ResNet-18 in-repo on a
synthetic-but-structured task, then run the reference's golden configurations
through ``cli.inference_sim`` (real weights via ``--weights``, real eval data
via the ``--data *.npz`` packed-loader branch) and assert the *published
ordering* of the reference README (README.md:53-121, BASELINE.md):

    W8A8 ~ fp32  >  headline (laplace + bit-alloc + bias-corr)  >
    naive W4A4  >  2std clipping

The task is a low-SNR matched-filter problem (x = amp * prototype[class] +
noise) with **heavy-tailed input statistics** (per-sample contrast jitter +
sparse high-amplitude outlier pixels).  Heavy tails are the regime the ACIQ
clipping analysis targets (reference mse_analysis.py; the Laplace prior):
with benign Gaussian activations, naive min-max W4A4 loses almost nothing
and the headline recipe has nothing to fix — measured on an easy digits task
the ordering collapses to a tie.  With outliers, min-max spends its 16 grid
points covering the tails and the ACIQ clip recovers ~2pt of accuracy,
reproducing the reference's ImageNet ordering qualitatively.

Runtime: ~10-15 min CPU (dominated by training); session-scoped fixture so
the model is trained once for all ordering assertions.  Gated behind
``CNNQ_RUN_SLOW=1`` (ADVICE r3) so the default quick suite stays quick —
CI / pre-commit runs should export it periodically.
"""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get('CNNQ_RUN_SLOW'),
    reason='trains a ResNet-18 for ~10-15 min; set CNNQ_RUN_SLOW=1 to run')


def _smooth_prototypes(rs, n, size, ch):
    """Random smooth class prototypes via low-frequency Fourier synthesis."""
    k = 6
    coeff = rs.randn(n, k, k, ch) + 1j * rs.randn(n, k, k, ch)
    spec = np.zeros((n, size, size, ch), np.complex64)
    spec[:, :k, :k, :] = coeff
    img = np.fft.ifft2(spec, axes=(1, 2)).real.astype(np.float32)
    img /= img.std(axis=(1, 2, 3), keepdims=True) + 1e-8
    return img


def make_dataset(seed=0, n_classes=100, n_train=4000, n_test=2048,
                 amp=0.25, size=32):
    rs = np.random.RandomState(seed)
    protos = _smooth_prototypes(rs, n_classes, size, 3)

    def draw(n, seed2):
        r2 = np.random.RandomState(seed2)
        y = r2.randint(0, n_classes, n).astype(np.int32)
        x = amp * protos[y] + r2.randn(n, size, size, 3).astype(np.float32)
        gain = np.exp(0.5 * r2.randn(n, 1, 1, 1)).astype(np.float32)
        x = x * gain
        mask = r2.rand(*x.shape) < 0.005  # outlier pixels (heavy tails)
        x = np.where(mask, 8.0 * np.sign(r2.randn(*x.shape)).astype(np.float32), x)
        return x.astype(np.float32), y

    return draw(n_train, seed + 1), draw(n_test, seed + 2)


def _train(steps=1000, batch=128, lr=1e-3, seed=0):
    import jax
    import jax.numpy as jnp
    import optax
    from cnn_quantization_tpu.models import build_model
    from cnn_quantization_tpu.engine import TapContext

    (xtr, ytr), test = make_dataset(seed)
    model, _ = build_model('resnet18')  # full 1000-way head: keeps the
    # engine's classifier-tag policy (out_ch == 1000) on the real path
    x0 = jnp.zeros((2, 32, 32, 3), jnp.float32)
    params = jax.jit(lambda k: model.init(k, x0, TapContext())['params'])(
        jax.random.PRNGKey(seed))
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    def loss_fn(p, x, y):
        logits = model.apply({'params': p}, x, TapContext())
        return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()

    @jax.jit
    def step(p, s, x, y):
        loss, g = jax.value_and_grad(loss_fn)(p, x, y)
        updates, s = tx.update(g, s)
        return optax.apply_updates(p, updates), s, loss

    rs = np.random.RandomState(seed)
    for _ in range(steps):
        idx = rs.randint(0, len(xtr), batch)
        params, opt_state, _ = step(params, opt_state,
                                    jnp.asarray(xtr[idx]), jnp.asarray(ytr[idx]))
    return params, test


@pytest.fixture(scope='session')
def trained_assets(tmp_path_factory):
    from cnn_quantization_tpu.utils.checkpoint import save_params_npz
    out = tmp_path_factory.mktemp('ordering')
    params, (xte, yte) = _train()
    wpath = str(out / 'resnet18_syn.npz')
    dpath = str(out / 'eval.npz')
    save_params_npz(wpath, params)
    np.savez(dpath, images=xte, labels=yte)
    return wpath, dpath


# the reference README's golden configurations (flag-for-flag)
CONFIGS = {
    'fp32': ['--q_off'],
    'w8a8': ['--qtype', 'int8', '-qw', 'int8'],
    'naive_w4a4': ['-pcq_w', '-pcq_a', '--qtype', 'int4', '-qw', 'int4'],
    'headline': ['-pcq_w', '-pcq_a', '--qtype', 'int4', '-qw', 'int4',
                 '-c', 'laplace', '-baa', '-baw', '-bcw'],
    '2std': ['--qtype', 'int4', '-qw', 'int8', '-c', '2std'],
    # true-integer deployment path (the arithmetic the reference only
    # simulates): offline-prepared int8 weights + frozen activation scales
    'w8a8_serving': ['--qtype', 'int8', '-qw', 'int8', '--serving_int8'],
}


def _cli_top1(capsys, wpath, dpath, flags):
    from cnn_quantization_tpu.cli.inference_sim import main
    base = ['--device', 'cpu', '-a', 'resnet18', '-b', '256',
            '--data', dpath, '--weights', wpath]
    assert main(base + flags) == 0
    out = capsys.readouterr().out
    return json.loads(out.strip().splitlines()[-1])['top1']


def test_recipe_accuracy_ordering(trained_assets, capsys, tmp_path, monkeypatch):
    monkeypatch.setenv('HOME', str(tmp_path))
    monkeypatch.chdir(tmp_path)
    wpath, dpath = trained_assets
    top1 = {name: _cli_top1(capsys, wpath, dpath, flags)
            for name, flags in CONFIGS.items()}
    # sanity: the model actually learned the task
    assert top1['fp32'] > 70.0, top1
    # W8A8 ~ fp32 (reference: int8 is lossless to within run noise)
    assert top1['w8a8'] > top1['fp32'] - 2.0, top1
    # true-int8 SERVING ~ W8A8 simulation: the deployment arithmetic
    # (int8 MXU convs, frozen abs-max scales, int8-resident boundaries)
    # costs no real accuracy on a trained network
    assert top1['w8a8_serving'] > top1['w8a8'] - 1.5, top1
    # headline recipe strictly beats naive W4A4 (reference: 73.33 vs 62.15)
    assert top1['headline'] > top1['naive_w4a4'], top1
    # naive W4A4 strictly beats 2std clipping with margin (reference:
    # 62.15 vs 15.44 -- 2std over-clips and the error compounds with depth)
    assert top1['naive_w4a4'] > top1['2std'] + 2.0, top1
    # and every 4-bit config pays a real cost vs fp32 on this low-margin
    # task (quantization noise is actually being exercised)
    assert top1['naive_w4a4'] < top1['fp32'] - 3.0, top1
