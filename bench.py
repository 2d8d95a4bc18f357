"""Benchmark: ResNet-50 quantized-inference throughput on one chip.

Primary metric: true-int8 serving (per-channel int8 weights, frozen
activation scales, XLA-native int8 MXU convs) — the deployment arithmetic
the reference only simulates in fp32.  ``vs_baseline`` is the ratio against
the unquantized bf16 forward on the same chip (>1 = quantization makes
inference FASTER, which is the point of int8 on the MXU).  Secondary fields
report the W4A4 fake-quant simulation path (the reference's headline
configuration, frozen qparams).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Methodology notes (this machine's TPU is behind an RPC tunnel with ~30-40ms
per-dispatch latency, and XLA hoists loop-invariant computations):
  * the model step runs inside a lax.scan whose input depends on the carry
    (an epsilon-scaled logit sum folded into the image), forcing one real
    sequential execution per step — no hoisting, no async inflation;
  * per-step time is the slope between S=1 and S=LONG scans, cancelling the
    fixed RPC + dispatch overhead.

The reference publishes no throughput numbers (SURVEY.md §6), so
``vs_baseline`` is the quantized-vs-unquantized (bf16) throughput ratio on
the same chip: the cost of quantization (1.0 = free; the reference's
python/CUDA fake-quant path is far below 1).
"""

import json
import os
import sys
import time

import numpy as np


def _timed_scan(fn, params, images, steps_pair=(1, 8), reps=3):
    import jax
    import jax.numpy as jnp

    def make(S):
        @jax.jit
        def run(p, im):
            def body(carry, _):
                x = im + carry * 1e-30  # loop-carried dep: defeats LICM
                s = jnp.sum(fn(p, x)).astype(jnp.float32)
                return s * 1e-30, None
            out, _ = jax.lax.scan(body, jnp.float32(0), None, length=S)
            return out
        return run

    times = {}
    for S in steps_pair:
        run = make(S)
        float(run(params, images))  # compile + warmup (blocking readback)
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(params, images))
            best = min(best, time.perf_counter() - t0)
        times[S] = best
    s0, s1 = steps_pair
    return (times[s1] - times[s0]) / (s1 - s0)


def bench(arch='resnet50', batch=128, dtype='bfloat16'):
    import jax
    import jax.numpy as jnp
    cache = os.environ.get('JAX_CACHE_DIR', '/root/jax_cache')
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1)
    except Exception:
        pass

    from cnn_quantization_tpu.models import build_model
    from cnn_quantization_tpu.engine import QuantPolicy, QuantEngine, TapContext

    model, meta = build_model(arch, dtype=dtype)
    x0 = jnp.zeros((batch, 224, 224, 3), jnp.float32)
    params = jax.jit(lambda k: model.init(k, x0, TapContext())['params'])(
        jax.random.PRNGKey(0))
    images = jnp.asarray(np.random.RandomState(0).rand(batch, 224, 224, 3)
                         .astype(np.float32))

    policy = QuantPolicy(qtype='int4', qweight='int4', pcq_weights=True,
                         pcq_act=True, clipping='laplace', bit_alloc_act=True,
                         bit_alloc_weight=True, bias_corr_weight=True, arch=arch)
    eng = QuantEngine(model, policy, meta)
    pq = eng.quantize_params(params)

    # W4A4 with frozen qparams (the deployment path): calibrate on a few
    # batches, freeze, then measure the pure quantized forward.
    from cnn_quantization_tpu.calib.calibrator import collect_statistics
    cal = [(np.asarray(images[:8]), np.zeros(8, np.int32))]
    stats = collect_statistics(eng.jit_collect(), params, cal)
    qp = eng.freeze_qparams(stats, input_shape=(batch, 224, 224, 3))

    fwd_q = eng.make_forward(quantized=True, qparams=qp)
    t_q = _timed_scan(lambda p, im: fwd_q(p, None, im)[0], pq, images)

    fwd_fp = eng.make_forward(quantized=False)
    t_fp = _timed_scan(lambda p, im: fwd_fp(p, None, im)[0], params, images)

    # True-int8 serving (the arithmetic the reference only simulates):
    # offline-prepared per-channel int8 weights + frozen per-tensor
    # activation scales on the MXU's native int8 conv path, int8-resident
    # stem/maxpool and downsample identities — faster than bf16, not just
    # "as fast".
    policy8 = QuantPolicy(qtype='int8', qweight='int8', arch=arch)
    eng8 = QuantEngine(model, policy8, meta)
    pq8 = eng8.quantize_params(params)
    sp8 = eng8.prepare_serving_params(pq8)
    scales = eng8.freeze_serving_scales(
        sp8, [(np.asarray(images[:16]), np.zeros(16, np.int32))])
    fwd_s = eng8.make_forward(quantized='serving_int8', act_scales=scales)
    t_s = _timed_scan(lambda p, im: fwd_s(p, None, im)[0], sp8, images)

    # Roofline accounting (BASELINE.md: int path vs >=80%-of-roofline
    # target).  XLA's bytes-accessed is an upper bound on true HBM traffic
    # (fusion-internal accesses inflate it), so bandwidth_util can read
    # slightly above 1.0 when the path saturates HBM.
    from cnn_quantization_tpu.utils.profiling import roofline_report
    rep = roofline_report(lambda p, im: fwd_s(p, None, im)[0], (sp8, images),
                          calls_per_sec=1.0 / t_s, int8=True)
    return batch / t_s, batch / t_q, batch / t_fp, rep


def main():
    batch = int(os.environ.get('BENCH_BATCH', '128'))
    try:
        ips_s, ips_q, ips_fp, rep = bench(batch=batch)
        print(json.dumps({
            'metric': 'resnet50_int8_serving_images_per_sec_per_chip',
            'value': round(ips_s, 2),
            'unit': 'images/sec',
            'vs_baseline': round(ips_s / ips_fp, 4),
            'w4a4_sim_images_per_sec': round(ips_q, 2),
            'w4a4_sim_vs_bf16': round(ips_q / ips_fp, 4),
            'bf16_images_per_sec': round(ips_fp, 2),
            'mfu_int8': round(rep.compute_util, 4),
            'bandwidth_util': round(rep.bandwidth_util, 4),
            'mfu_ceiling_mem': round(rep.mem_roofline_mfu, 4),
            'bound': rep.bound,
        }))
    except Exception as e:  # noqa: BLE001 — bench must always emit a line
        print(json.dumps({
            'metric': 'resnet50_int8_serving_images_per_sec_per_chip',
            'value': 0.0,
            'unit': 'images/sec',
            'vs_baseline': 0.0,
            'error': f'{type(e).__name__}: {e}',
        }))
        sys.exit(1)


if __name__ == '__main__':
    main()
