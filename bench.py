"""Benchmark: ResNet-50 quantized-inference throughput on one chip.

Primary metric: true-int8 serving (per-channel int8 weights, frozen
activation scales, XLA-native int8 MXU convs) — the deployment arithmetic
the reference only simulates in fp32.  ``vs_baseline`` is the ratio against
the unquantized bf16 forward on the same chip (>1 = quantization makes
inference FASTER, which is the point of int8 on the MXU).  Secondary rows:

  * the W4A4 fake-quant simulation (the reference's headline configuration,
    frozen qparams),
  * W4A4 *serving* — real int4-valued arithmetic with frozen scales — in
    both the plain int8-resident form and the PACKED form (Pallas int4
    GEMMs, block boundaries crossing HBM at 4 bits,
    ops/kernels/int4_matmul.py),
  * a serving batch sweep (the "bigger batch is slower" claim as artifact,
    VERDICT r3 weak #5),
  * an on-device smoke of the stochastic-rounding Pallas kernel
    (pltpu.prng_* lowering executes on the chip and is unbiased —
    VERDICT r3 missing #5).

Roofline fields are grounded two ways (VERDICT r3 missing #3):
``bytes_xla`` = XLA cost-analysis 'bytes accessed' (upper bound: counts
fusion-internal accesses); ``bytes_hlo`` = optimized-HLO traffic with
memory-space awareness (S(1)/VMEM-resident buffers move no HBM bytes —
utils/hlo_analysis.py).  ``int8_resident_offenders`` counts activation-
sized wide tensors crossing HBM between fusions (0 = every large boundary
tensor travels as 1-byte codes).

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


def _images(batch, seed=0):
    import jax.numpy as jnp
    return jnp.asarray(np.random.RandomState(seed)
                       .rand(batch, 224, 224, 3).astype(np.float32))


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
    images = _images(batch)
    out = {}

    # ---- W4A4 fake-quant simulation (reference headline, frozen qparams)
    policy = QuantPolicy(qtype='int4', qweight='int4', pcq_weights=True,
                         pcq_act=True, clipping='laplace', bit_alloc_act=True,
                         bit_alloc_weight=True, bias_corr_weight=True, arch=arch)
    eng = QuantEngine(model, policy, meta)
    pq = eng.quantize_params(params)
    from cnn_quantization_tpu.calib.calibrator import collect_statistics
    cal = [(np.asarray(images[:8]), np.zeros(8, np.int32))]
    stats = collect_statistics(eng.jit_collect(), params, cal)
    qp = eng.freeze_qparams(stats, input_shape=(batch, 224, 224, 3))
    fwd_q = eng.make_forward(quantized=True, qparams=qp)
    t_q = _timed_scan(lambda p, im: fwd_q(p, None, im)[0], pq, images)

    # ---- unquantized bf16 baseline
    fwd_fp = eng.make_forward(quantized=False)
    t_fp = _timed_scan(lambda p, im: fwd_fp(p, None, im)[0], params, images)

    # ---- true-int8 serving (primary)
    policy8 = QuantPolicy(qtype='int8', qweight='int8', arch=arch)
    eng8 = QuantEngine(model, policy8, meta)
    pq8 = eng8.quantize_params(params)
    sp8 = eng8.prepare_serving_params(pq8)
    cal16 = [(np.asarray(images[:16]), np.zeros(16, np.int32))]
    scales = eng8.freeze_serving_scales(sp8, cal16)
    fwd_s = eng8.make_forward(quantized='serving_int8', act_scales=scales)
    t_s = _timed_scan(lambda p, im: fwd_s(p, None, im)[0], sp8, images)

    # ---- W4A4 serving: plain int8-resident and int4-PACKED boundaries
    policy4 = QuantPolicy(qtype='int4', qweight='int4', arch=arch)
    eng4 = QuantEngine(model, policy4, meta)
    sp4 = eng4.prepare_serving_params(eng4.quantize_params(params))
    scales4 = eng4.freeze_serving_scales(sp4, cal16, packed=True)
    fwd_w4 = eng4.make_forward(quantized='serving_int8', act_scales=scales4)
    t_w4 = _timed_scan(lambda p, im: fwd_w4(p, None, im)[0], sp4, images)
    fwd_w4p = eng4.make_forward(quantized='serving_int8', act_scales=scales4,
                                packed=True)
    t_w4p = _timed_scan(lambda p, im: fwd_w4p(p, None, im)[0], sp4, images)

    # ---- roofline + residency, grounded in the optimized HLO
    from cnn_quantization_tpu.utils.profiling import roofline_report
    from cnn_quantization_tpu.utils.hlo_analysis import (
        check_int8_residency, optimized_hlo)
    rep = roofline_report(lambda p, im: fwd_s(p, None, im)[0], (sp8, images),
                          calls_per_sec=1.0 / t_s, int8=True)
    rep4 = roofline_report(lambda p, im: fwd_w4p(p, None, im)[0],
                           (sp4, images), calls_per_sec=1.0 / t_w4p, int8=True)
    try:
        txt = optimized_hlo(lambda p, im: fwd_s(p, None, im)[0], sp8, images)
        # whitelist by output signature, not name (ADVICE r4): exactly ONE
        # bf16 tensor of the input's element count is expected — the
        # f32->bf16 cast feeding the bf16 stem (input-pipeline work, not an
        # inter-block boundary).  Any other wide tensor, including a second
        # convert of the same size, still flags.
        offenders = check_int8_residency(
            txt, min_elems=1 << 21,
            allow_outputs=(('bf16', images.size),))
        out['int8_resident_offenders'] = len(offenders)
    except Exception as e:  # noqa: BLE001
        out['int8_resident_offenders'] = f'error: {type(e).__name__}'

    out.update({
        'serving_ips': batch / t_s, 'w4a4_sim_ips': batch / t_q,
        'bf16_ips': batch / t_fp, 'w4a4_serving_ips': batch / t_w4,
        'w4a4_packed_ips': batch / t_w4p, 'rep': rep, 'rep4': rep4,
    })
    out['engines'] = (eng8, sp8, scales, eng4, sp4, scales4)
    return out


def _serving_spread(res, reps=3):
    """Re-time the primary serving path ``reps`` times (fresh timing loops,
    same executable) and report min/median/max — the run-to-run variance
    band as an ARTIFACT (VERDICT r4 task 7; README claims previously leaned
    on a prose-only band).  The primary measurement itself is included in
    the band so ``value`` is always inside its own spread (the primary is
    taken early/cold, the re-times late/warm — without inclusion they can
    disagree by more than the re-time-only band)."""
    eng8, sp8, scales = res['engines'][:3]
    fwd_s = eng8.make_forward(quantized='serving_int8', act_scales=scales)
    batch = int(os.environ.get('BENCH_BATCH', '128'))
    images = _images(batch)
    ips = sorted([batch / _timed_scan(lambda p, im: fwd_s(p, None, im)[0],
                                      sp8, images) for _ in range(reps)]
                 + [res['serving_ips']])
    return {'min': round(ips[0], 1), 'median': round(ips[len(ips) // 2], 1),
            'max': round(ips[-1], 1)}


def _mobilenet_serving(batch):
    """True-int8 serving throughput on MobileNet-v2 (depthwise trunk,
    per-channel frozen activation scales at the depthwise sites) — the
    depthwise serving row VERDICT r4 task 4 asks for."""
    import jax
    import jax.numpy as jnp
    from cnn_quantization_tpu.models import build_model
    from cnn_quantization_tpu.engine import (QuantEngine, QuantPolicy,
                                             TapContext)
    model, meta = build_model('mobilenet_v2')
    x0 = jnp.zeros((batch, 224, 224, 3), jnp.float32)
    params = jax.jit(lambda k: model.init(k, x0, TapContext())['params'])(
        jax.random.PRNGKey(0))
    eng = QuantEngine(model, QuantPolicy(qtype='int8', qweight='int8',
                                         arch='mobilenet_v2'), meta)
    sp = eng.prepare_serving_params(eng.quantize_params(params))
    images = _images(batch, seed=1)
    cal = [(np.asarray(images[:16]), np.zeros(16, np.int32))]
    scales = eng.freeze_serving_scales(sp, cal)
    n_vec = sum(1 for v in scales.values() if np.ndim(v) == 1)
    fwd = eng.make_forward(quantized='serving_int8', act_scales=scales)
    t = _timed_scan(lambda p, im: fwd(p, None, im)[0], sp, images)
    return {'mobilenet_serving_images_per_sec': round(batch / t, 2),
            'mobilenet_per_channel_act_sites': n_vec}


def _batch_sweep(res, batches):
    """Re-time the primary serving path at other batch sizes (same frozen
    scales — calibration is batch-independent)."""
    eng8, sp8, scales = res['engines'][:3]
    fwd_s = eng8.make_forward(quantized='serving_int8', act_scales=scales)
    sweep = {}
    for b in batches:
        t = _timed_scan(lambda p, im: fwd_s(p, None, im)[0], sp8, _images(b))
        sweep[str(b)] = round(b / t, 2)
    return sweep


def _mxu_rate_probe():
    """Measured int8 MXU rate on a large GEMM — the driver-captured
    evidence for BASELINE.md's 'int kernels >= 80% of per-chip roofline'
    target at the KERNEL level (BENCH_r04: 349.5 TOP/s = 88.7% of the 394
    TOP/s v5e int8 peak; the end-to-end model MFU is the weighted average
    with the memory-ceiling-bound stem/stage-1 shapes — README roofline
    section quotes this artifact value verbatim)."""
    import jax
    import jax.numpy as jnp
    from cnn_quantization_tpu.utils.profiling import device_peaks
    rs = np.random.RandomState(0)
    # large K amortizes the per-step carry-perturbation add (~64MB) to
    # ~10% of the ideal dot time; with M=N=K=4096 it is ~40% and the
    # probe under-reads (231 TOP/s measured vs 270+ here)
    M, K, N = 4096, 16384, 4096
    a = jnp.asarray(rs.randint(-127, 128, (M, K)).astype(np.int8))
    b = jnp.asarray(rs.randint(-127, 128, (K, N)).astype(np.int8))

    # custom scan: the shared _timed_scan folds an f32 epsilon into the
    # input, which would promote the int8 operands.  Here the carry is an
    # int32 that is always 0 (rem(sum, 2) of an even-wrapping reduction
    # would not be — use rem of a doubled value) added into the int8 input,
    # making each step's DOT data-dependent on the previous step so XLA can
    # neither hoist nor overlap them (an output-only carry measured 103%
    # of peak — the dots were loop-invariant and got pipelined/hoisted).
    def make(S):
        @jax.jit
        def run(x, y):
            def body(c, _):
                xx = x + jax.lax.rem(c, 2).astype(jnp.int8)
                acc = jax.lax.dot_general(xx, y, (((1,), (0,)), ((), ())),
                                          preferred_element_type=jnp.int32)
                s = jnp.sum(acc)
                return jax.lax.rem(s, 2), None  # 0/±1: real dependence
                # (a `* 0` here would be constant-folded and re-enable
                # hoisting — axon measurement protocol)
            out, _ = jax.lax.scan(body, jnp.int32(0), None, length=S)
            return out
        return run

    times = {}
    for S in (4, 36):
        run = make(S)
        float(run(a, b))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(a, b))
            best = min(best, time.perf_counter() - t0)
        times[S] = best
    t = (times[36] - times[4]) / 32
    tops = 2 * M * N * K / t
    return {'int8_dot_tops': round(tops / 1e12, 1),
            'int8_dot_mfu': round(tops / device_peaks()['int8_ops'], 4)}


def _dma_probe():
    """Practical on-chip HBM streaming rate: time an elementwise int8 pass
    over a serving-boundary-sized tensor (reads + writes 2x103MB).  The
    datasheet 819 GB/s is not achievable for real tiled access patterns —
    round 5 measured ~600-730 GB/s for XLA copies and Pallas streams — so
    roofline verdicts quote `mfu_ceiling_mem_practical` (scaled by this
    probe) alongside the datasheet-based ceiling.  This is the artifact
    anchoring the per-op "at the memory ceiling" claims in README."""
    import functools
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randint(-127, 128, (128 * 56 * 56, 256))
                    .astype(np.int8))
    nbytes = 2 * x.size  # read + write per step

    # A Pallas stream copy: pallas_call is opaque to XLA fusion, so every
    # scan step really reads and writes the 103MB tensor.  (Two XLA-level
    # versions were folded away: sum(v + c) strength-reduced to
    # sum(v) + c*n and read 1996 "GB/s"; an iterated elementwise map
    # unrolled + fused into ONE kernel and read a negative slope.  Both
    # caught by the dma_probe_sane bound below.)
    def _copy_kernel(s_ref, a_ref, o_ref, psum_ref):
        # add the loop-carried scalar IN the kernel (i32 then narrow —
        # free relative to the stream), and emit a per-program partial sum
        # so the NEXT step's scalar depends on EVERY block of this step's
        # output — steps cannot overlap or fold (a scalar derived from one
        # block let the scheduler pipeline steps and the probe read an
        # insane 1324 GB/s)
        blk = a_ref[:].astype(jnp.int32) + s_ref[0, 0]
        o_ref[:] = blk.astype(jnp.int8)
        # 8-row block (Mosaic sublane divisibility); row 0 holds the sum
        psum_ref[:] = jnp.zeros_like(psum_ref)
        psum_ref[0:1, :] = jnp.sum(blk, axis=0, keepdims=True)

    @jax.jit
    def pcopy(a, s):
        tm = 512
        out, psums = pl.pallas_call(
            _copy_kernel, grid=(a.shape[0] // tm,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec((tm, a.shape[1]), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((tm, a.shape[1]), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((8, a.shape[1]), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct(a.shape, a.dtype),
                       jax.ShapeDtypeStruct((a.shape[0] // tm * 8,
                                             a.shape[1]), jnp.int32)])(s, a)
        return out, psums

    def make(S):
        @jax.jit
        def run(v):
            def body(carry, _):
                c, s = carry
                out, psums = pcopy(c, s)
                s2 = jax.lax.rem(jnp.sum(psums), 2).reshape(1, 1)
                return (out, s2), None
            (o, _s), _ = jax.lax.scan(
                body, (v, jnp.zeros((1, 1), jnp.int32)), None, length=S)
            return jnp.sum(o[:8].astype(jnp.int32))
        return run

    runs = {S: make(S) for S in (4, 36)}
    for S, run in runs.items():
        int(run(x)[()])  # compile + warmup

    def one_reading():
        times = {}
        for S, run in runs.items():
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                int(run(x)[()])
                best = min(best, time.perf_counter() - t0)
            times[S] = best
        t = (times[36] - times[4]) / 32
        return nbytes / t / 1e9

    # RPC jitter occasionally corrupts a single slope reading (negative or
    # above-datasheet rates observed); take the median of sane readings,
    # retrying a few times
    sane = []
    for _ in range(5):
        g = one_reading()
        if 0 < g < 819:
            sane.append(g)
        if len(sane) >= 3:
            break
    if not sane:
        return {'dma_copy_gbps': round(one_reading(), 1),
                'dma_probe_sane': False}
    return {'dma_copy_gbps': round(float(np.median(sane)), 1),
            'dma_probe_sane': True}


def _stochastic_smoke():
    """Execute the stochastic-rounding Pallas kernel ON THE CHIP (the
    interpret-mode test path substitutes a jnp fallback, so this is the
    only place the pltpu.prng_* lowering actually runs) and check the
    rounding is unbiased and seed-dependent."""
    import jax.numpy as jnp
    from cnn_quantization_tpu.ops.kernels.fake_quant import fake_quant_fused
    rs = np.random.RandomState(0)
    n = 512 * 1024
    delta, qmax = 4.0, 15.0
    x = jnp.asarray(rs.rand(n // 256, 256).astype(np.float32) * delta)
    a = np.asarray(fake_quant_fused(x, delta, 0.0, qmax, stochastic=True,
                                    seed=7, interpret=False))
    b = np.asarray(fake_quant_fused(x, delta, 0.0, qmax, stochastic=True,
                                    seed=8, interpret=False))
    det = np.asarray(fake_quant_fused(x, delta, 0.0, qmax, stochastic=False,
                                      interpret=False))
    step = delta / qmax
    bias = float(np.mean(a - np.asarray(x)))
    se = step / np.sqrt(12.0 * n)
    # theory for uniform x with U[-0.5,0.5) noise: P(noisy != det) = 1/4,
    # P(two independent noisy roundings differ) = 1/3 — measured on-chip
    # 0.2494 / 0.3330 (round 4)
    ok = (abs(bias) < 6 * se) and 0.25 < (a != b).mean() < 0.42 \
        and 0.17 < (a != det).mean() < 0.33
    return {'pallas_stochastic_ok': bool(ok),
            'stochastic_mean_bias': round(bias, 7),
            'stochastic_bias_tol_6se': round(6 * se, 7)}


def main():
    batch = int(os.environ.get('BENCH_BATCH', '128'))
    try:
        r = bench(batch=batch)
        rep, rep4 = r['rep'], r['rep4']
        ips_s, ips_q, ips_fp = r['serving_ips'], r['w4a4_sim_ips'], r['bf16_ips']
        sweep = _batch_sweep(r, [64, 256])
        sweep[str(batch)] = round(ips_s, 2)
        try:
            from cnn_quantization_tpu.utils.profiling import per_op_profile
            eng8, sp8, scales, eng4, sp4, scales4 = r['engines']
            fwd_s = eng8.make_forward(quantized='serving_int8',
                                      act_scales=scales)
            images = _images(batch)
            per_op = {'serving': per_op_profile(
                lambda p, im: fwd_s(p, None, im)[0], (sp8, images))}
            fwd_p = eng4.make_forward(quantized='serving_int8',
                                      act_scales=scales4, packed=True)
            per_op['w4a4_packed'] = per_op_profile(
                lambda p, im: fwd_p(p, None, im)[0], (sp4, images))
        except Exception as e:  # noqa: BLE001
            per_op = {'error': f'{type(e).__name__}: {e}'}
        try:
            spread = _serving_spread(r)
        except Exception as e:  # noqa: BLE001
            spread = {'error': f'{type(e).__name__}: {e}'}
        try:
            mob = _mobilenet_serving(batch)
        except Exception as e:  # noqa: BLE001
            mob = {'mobilenet_serving_error': f'{type(e).__name__}: {e}'}
        try:
            smoke = _stochastic_smoke()
        except Exception as e:  # noqa: BLE001
            smoke = {'pallas_stochastic_ok': False,
                     'stochastic_error': f'{type(e).__name__}: {e}'}
        try:
            smoke.update(_mxu_rate_probe())
        except Exception as e:  # noqa: BLE001
            smoke['mxu_probe_error'] = f'{type(e).__name__}: {e}'
        try:
            smoke.update(_dma_probe())
            if smoke.get('dma_probe_sane'):
                smoke['mfu_ceiling_mem_practical'] = round(
                    rep.mem_roofline_mfu * smoke['dma_copy_gbps'] * 1e9
                    / rep.peak_bw, 4)
        except Exception as e:  # noqa: BLE001
            smoke['dma_probe_error'] = f'{type(e).__name__}: {e}'
        print(json.dumps({
            'metric': 'resnet50_int8_serving_images_per_sec_per_chip',
            'value': round(ips_s, 2),
            'unit': 'images/sec',
            'vs_baseline': round(ips_s / ips_fp, 4),
            'w4a4_sim_images_per_sec': round(ips_q, 2),
            'w4a4_sim_vs_bf16': round(ips_q / ips_fp, 4),
            'bf16_images_per_sec': round(ips_fp, 2),
            'w4a4_serving_images_per_sec': round(r['w4a4_serving_ips'], 2),
            'w4a4_packed_images_per_sec': round(r['w4a4_packed_ips'], 2),
            'mfu_int8': round(rep.compute_util, 4),
            'bandwidth_util': round(rep.bandwidth_util, 4),
            'mfu_ceiling_mem': round(rep.mem_roofline_mfu, 4),
            'bound': rep.bound,
            'bytes_xla': round(rep.bytes_xla / 1e9, 4),
            'bytes_hlo': round(rep.bytes_hlo / 1e9, 4),
            'w4a4_packed_mfu_int8': round(rep4.compute_util, 4),
            'w4a4_packed_bytes_hlo': round(rep4.bytes_hlo / 1e9, 4),
            'w4a4_packed_mfu_ceiling_mem': round(rep4.mem_roofline_mfu, 4),
            'int8_resident_offenders': r['int8_resident_offenders'],
            'batch_sweep': sweep,
            'serving_ips_spread': spread,
            'per_op_top': per_op,
            **mob,
            **smoke,
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
