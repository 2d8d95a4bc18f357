import numpy as np

from cnn_quantization_tpu.ops import bias_corr
from cnn_quantization_tpu.ops import quant_math as qm


def test_weight_bias_correction_restores_channel_means():
    rng = np.random.RandomState(0)
    w = rng.randn(3, 3, 8, 16).astype(np.float32)  # HWIO
    w_q = np.asarray(qm.fake_quant(w, w.max() - w.min(), w.min(), 15.0))
    corr = np.asarray(bias_corr.weight_correction(w, w_q, out_axis=-1, bias_corr=True))
    mu_o = w.reshape(-1, 16).mean(axis=0)
    mu_c = corr.reshape(-1, 16).mean(axis=0)
    np.testing.assert_allclose(mu_c, mu_o, atol=1e-5)


def test_weight_var_correction_restores_channel_stds():
    rng = np.random.RandomState(1)
    w = rng.randn(3, 3, 8, 16).astype(np.float32)
    w_q = np.asarray(qm.fake_quant(w, w.max() - w.min(), w.min(), 15.0))
    corr = np.asarray(bias_corr.weight_correction(w, w_q, out_axis=-1,
                                                  bias_corr=True, var_corr=True))
    std_o = w.transpose(3, 0, 1, 2).reshape(16, -1).std(axis=1, ddof=1)
    std_c = corr.transpose(3, 0, 1, 2).reshape(16, -1).std(axis=1, ddof=1)
    np.testing.assert_allclose(std_c, std_o, rtol=2e-2)
    mu_o = w.reshape(-1, 16).mean(axis=0)
    np.testing.assert_allclose(corr.reshape(-1, 16).mean(axis=0), mu_o, atol=1e-5)


def test_var_corr_order_matches_reference():
    # reference applies var-corr around the *quantized* mean, then bias-corr;
    # verify against a direct transcription of those equations
    rng = np.random.RandomState(2)
    w = rng.randn(5, 4).astype(np.float32)      # [out, in] linear weight, out_axis=0
    w_q = (w * 0.9 + 0.03).astype(np.float32)   # arbitrary "quantized" version
    got = np.asarray(bias_corr.weight_correction(w, w_q, out_axis=0,
                                                 bias_corr=True, var_corr=True))
    mu_q = w_q.mean(axis=1, keepdims=True)
    mu_o = w.mean(axis=1, keepdims=True)
    vc = w.std(axis=1, ddof=1, keepdims=True) / (w_q.std(axis=1, ddof=1, keepdims=True) + 1e-8)
    want = (w_q - mu_q) * vc + mu_q
    want = want - want.mean(axis=1, keepdims=True) + mu_o
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_activation_bias_correction():
    rng = np.random.RandomState(3)
    out = rng.randn(2, 4, 4, 8).astype(np.float32)
    out_q = out + 0.1 * rng.randn(*out.shape).astype(np.float32)
    got = np.asarray(bias_corr.activation_bias_correction(out, out_q, channel_axis=-1))
    # transcription of the reference equations
    r = np.maximum(out, 0)
    t = r.transpose(3, 0, 1, 2).reshape(8, -1)
    tq = out_q.transpose(3, 0, 1, 2).reshape(8, -1)
    qb = (t.sum(axis=1) - tq.sum(axis=1)) / ((t > 0).sum(axis=1) + 1e-8)
    want = out_q + (out_q > 0) * qb.reshape(1, 1, 1, 8)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
