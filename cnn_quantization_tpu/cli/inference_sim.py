"""Experiment CLI — flag-compatible with the reference's inference_sim.py.

Reference: inference/inference_sim.py:52-112 (flags), :130-275
(InferenceModel), :232-267 (sweeps), :278-343 (validate), :375-391 (main).

Usage examples (mirroring the reference README):
  # W4A4 naive
  python -m cnn_quantization_tpu.cli.inference_sim -a resnet50 -b 512 \
      -pcq_w -pcq_a -sh --qtype int4 -qw int4
  # headline recipe
  python -m cnn_quantization_tpu.cli.inference_sim -a resnet50 -b 512 \
      -pcq_w -pcq_a -sh --qtype int4 -qw int4 -c laplace -baa -baw -bcw
  # collect offline statistics on 32 images
  python -m cnn_quantization_tpu.cli.inference_sim -a resnet50 -b 1 \
      --qtype int8 -sm collect -ac -cs 32
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description='TPU quantized-inference simulator')
    p.add_argument('--data', metavar='DIR', default=os.environ.get(
        'IMAGENET_DIR', os.path.expanduser('~/datasets/ILSVRC2012')),
        help='path to ImageNet (falls back to synthetic data if absent)')
    p.add_argument('--arch', '-a', default='resnet18')
    p.add_argument('--weights', '-w', default=None,
                   help='torch .pth state dict or .npz params to load')
    p.add_argument('-j', '--workers', default=4, type=int)
    p.add_argument('-b', '--batch-size', default=256, type=int)
    p.add_argument('--print-freq', '-p', default=10, type=int)
    p.add_argument('--seed', default=None, type=int)
    p.add_argument('--device', default='tpu', help='tpu or cpu')
    p.add_argument('--dtype', default='float32', help='compute dtype: float32|bfloat16')
    p.add_argument('--input_size', default=None, type=int,
                   help='override input crop size (default: arch-native '
                        '224/299); for quick smoke runs')

    p.add_argument('--qtype', default=None, help='data type: int[N]')
    p.add_argument('--qweight', '-qw', default='int8')
    p.add_argument('--q_off', action='store_true', help='disable quantization')
    p.add_argument('--serving_int8', '-si8', action='store_true',
                   help='true-integer deployment path: int8 MXU convs with '
                        'frozen activation scales (bit widths from '
                        '--qtype/--qweight, clamped to int8 grid); beyond '
                        'the reference, which only simulates quantization')
    p.add_argument('--serving_cal', default='max',
                   choices=('max', 'percentile', 'aciq'),
                   help='serving scale calibration: abs-max, |x| percentile, '
                        'or ACIQ-Laplace optimal clip')
    p.add_argument('--serving_percentile', default=99.99, type=float,
                   help='percentile for --serving_cal percentile (any value, '
                        'used exactly)')
    p.add_argument('--serving_s2d_stem', action='store_true',
                   help='space-to-depth int8 stem rewrite (opt-in; measured '
                        '~parity with the default bf16 stem on v5e/XLA)')
    p.add_argument('--serving_packed', action='store_true',
                   help='int4-PACKED serving (W4A4, Bottleneck trunks): '
                        '1x1 convs run as Pallas int4 GEMMs and block '
                        'boundaries cross HBM two-codes-per-byte; falls '
                        'back to the plain serving path where not '
                        'applicable')
    p.add_argument('--serving_packed_stages', default=None,
                   help='comma list of ResNet stages (1-4) to Pallas-'
                        'orchestrate under --serving_packed (default all); '
                        'the XLA<->Pallas friction is per-stage — the '
                        'round-5 ablation artifact was measured with this')
    p.add_argument('--shuffle', '-sh', action='store_true')
    p.add_argument('--stochastic', '-s', action='store_true', default=False,
                   help='stochastic rounding (Pallas PRNG path)')
    p.add_argument('--eval_precision', '-ep', action='store_true', default=False)
    p.add_argument('--clipping', '-c', default='no',
                   help='[no, gaus, laplace, exp, <p>std, mix]')
    p.add_argument('--rho_act', '-ra', default=None, type=float,
                   help='fp32 statistical clip on activations before '
                        'quantization (live; dead in the reference)')
    p.add_argument('--rho_weight', '-rw', default=None, type=float,
                   help='fp32 ratio clip on weights before quantization')
    p.add_argument('--stats_mode', '-sm', default='no', help='[collect, use, no]')
    p.add_argument('--stats_kind', '-sk', default='mean', help='[mean, max]')
    p.add_argument('--stats_folder', '-sf', default=None)
    p.add_argument('--stats_batch_avg', '-sba', action='store_true')
    p.add_argument('--custom_test', '-ct', action='store_true', default=False)
    p.add_argument('--order_file', default=None,
                   help='custom_test layer ordering (json list); default: '
                        'derived from calibration stats')
    p.add_argument('--dump_dir', '-dd', default=None)
    p.add_argument('--measure_stats', '-ms', action='store_true', default=False,
                   help='measure per-layer float-vs-quantized error stats')
    p.add_argument('--mlf_experiment', '-mlexp', default=None)
    p.add_argument('--kld_threshold', '-kld', action='store_true', default=False)
    p.add_argument('--aciq_cal', '-ac', action='store_true', default=False)
    p.add_argument('--cal_set_size', '-cs', default=5120, type=int)
    p.add_argument('--subset', '-ss', default=None, type=int)
    p.add_argument('--per_channel_quant_weights', '-pcq_w', action='store_true')
    p.add_argument('--per_channel_quant_act', '-pcq_a', action='store_true')
    p.add_argument('--bit_alloc_act', '-baa', action='store_true')
    p.add_argument('--bit_alloc_weight', '-baw', action='store_true')
    p.add_argument('--bit_alloc_rmode', '-bam', default='round')
    p.add_argument('--bit_alloc_prior', '-bap', default='gaus')
    p.add_argument('--bit_alloc_target_act', '-bata', type=float, default=None)
    p.add_argument('--bit_alloc_target_weight', '-batw', type=float, default=None)
    p.add_argument('--bias_corr_act', '-bca', action='store_true')
    p.add_argument('--bias_corr_weight', '-bcw', action='store_true')
    p.add_argument('--var_corr_weight', '-vcw', action='store_true')
    p.add_argument('--measure_entropy', '-me', action='store_true')
    p.add_argument('--mid_thread_quant', '-mtq', action='store_true')
    p.add_argument('--mesh_data', type=int, default=None,
                   help='data-parallel axis size (default: all devices)')
    p.add_argument('--mesh_model', type=int, default=1,
                   help='model (channel) parallel axis size')
    return p


def policy_from_args(args):
    from ..engine import QuantPolicy
    return QuantPolicy(
        qtype=args.qtype, qweight=args.qweight, clipping=args.clipping,
        stats_kind=args.stats_kind, kld=args.kld_threshold,
        pcq_weights=args.per_channel_quant_weights,
        pcq_act=args.per_channel_quant_act,
        bit_alloc_act=args.bit_alloc_act, bit_alloc_weight=args.bit_alloc_weight,
        bit_alloc_rmode=args.bit_alloc_rmode, bit_alloc_prior=args.bit_alloc_prior,
        bit_alloc_target_act=args.bit_alloc_target_act,
        bit_alloc_target_weight=args.bit_alloc_target_weight,
        bias_corr_act=args.bias_corr_act, bias_corr_weight=args.bias_corr_weight,
        var_corr_weight=args.var_corr_weight,
        measure_entropy=args.measure_entropy, mtd_quant=args.mid_thread_quant,
        stochastic=args.stochastic, rho_act=args.rho_act,
        rho_weight=args.rho_weight, arch=args.arch)


def load_params(args, model, meta):
    import jax
    import jax.numpy as jnp
    from ..engine import TapContext

    if args.weights:
        if args.weights.endswith('.npz'):
            from ..utils.checkpoint import load_params_npz
            return load_params_npz(args.weights)
        from ..utils.torch_import import load_torch_checkpoint, import_arch
        state = load_torch_checkpoint(args.weights)
        return import_arch(args.arch, state, fold_bn=meta.fold_bn)
    print(f'=> no weights given; random init for {args.arch} '
          '(accuracy numbers will be meaningless)')
    size = meta.input_size
    x = jnp.zeros((2, size, size, 3), jnp.float32)
    return jax.jit(lambda k: model.init(k, x, TapContext())['params'])(
        jax.random.PRNGKey(args.seed or 0))


def _s2d_stem_applied(params_s) -> bool:
    """True if prepare_serving_params actually space-to-depth-transformed the
    stem kernel (a [4,4,12,O] int8 leaf exists somewhere in the tree)."""
    import jax
    return any(
        getattr(leaf, 'ndim', 0) == 4 and tuple(leaf.shape[:3]) == (4, 4, 12)
        for leaf in jax.tree_util.tree_leaves(params_s))


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.device == 'cpu':
        import jax
        jax.config.update('jax_platforms', 'cpu')
    import jax

    from ..models import build_model
    from ..engine import QuantEngine
    from ..engine.evaluate import evaluate
    from ..calib.calibrator import (collect_statistics, save_stats, load_stats,
                                    default_stats_path)
    from ..data.imagenet import make_loader
    from ..utils.eval_log import EvalLog

    print(f"=> building model '{args.arch}'")
    model, meta = build_model(args.arch, dtype=args.dtype)
    params = load_params(args, model, meta)
    policy = policy_from_args(args)
    if args.q_off:
        policy = policy_from_args(args).__class__(qtype=None, arch=args.arch)

    sf = args.stats_folder or args.arch
    if args.kld_threshold:
        sf += '_kld_' + (args.qtype or '')
    stats_path = default_stats_path(sf, per_channel=args.per_channel_quant_act)

    loader, real_data = make_loader(
        args.data, args.arch, args.batch_size,
        shuffle=(args.kld_threshold or args.aciq_cal or args.shuffle),
        limit=args.subset, seed=args.seed or 12345, size=args.input_size)
    if not real_data:
        print('=> ImageNet not found; using synthetic data')

    engine = QuantEngine(model, policy, meta)

    # ---------------- collect mode -------------------------------------
    if args.stats_mode == 'collect':
        print('Collecting statistics...')
        from ..engine.policy import parse_qtype_bits
        err_bits = parse_qtype_bits(args.qtype) if args.qtype else None
        summary = collect_statistics(
            engine.jit_collect(batch_avg=args.stats_batch_avg, err_bits=err_bits),
            params, loader,
            cal_set_size=args.cal_set_size if (args.kld_threshold or args.aciq_cal) else None)
        if args.kld_threshold:
            from ..calib.kld import add_kld_thresholds
            add_kld_thresholds(summary, engine, params, loader,
                               cal_set_size=args.cal_set_size)
        save_stats(stats_path, summary)
        print(f'Saved statistics for {len(summary)} sites -> {stats_path}')
        return 0

    stats = None
    if args.stats_mode == 'use':
        assert os.path.exists(stats_path), f'no stats at {stats_path}; run -sm collect'
        stats = load_stats(stats_path)
        print(f'Loaded statistics for {len(stats)} sites from {stats_path}')

    t0 = time.time()
    params_q = engine.quantize_params(params)
    jax.block_until_ready(params_q)
    print(f'Quantized weights in {time.time() - t0:.1f}s')

    def run_eval(eng, p, quantized=True):
        return evaluate(eng, p, loader, stats=stats, quantized=quantized,
                        subset=args.subset, print_freq=args.print_freq, verbose=True)

    # ---------------- precision sweep ----------------------------------
    if args.eval_precision:
        elog = EvalLog(['dtype', 'val_prec1', 'val_prec5'])
        print('\nFloat32 no quantization')
        res = run_eval(engine, params, quantized=False)
        elog.log('fp32', res['top1'], res['top5'])
        for q in (8, 7, 6, 5, 4):
            qargs = argparse.Namespace(**vars(args))
            qargs.qtype = f'int{q}'
            eng = QuantEngine(model, policy_from_args(qargs), meta)
            print(f'\nQuantize to int{q}')
            res = run_eval(eng, params_q)
            elog.log(f'int{q}', res['top1'], res['top5'])
        print(elog)
        elog.save(f'results/precision/{args.arch}_{args.clipping}_clipping.csv')
        return 0

    # ---------------- layer-sensitivity sweep --------------------------
    if args.custom_test:
        order = _load_order(args, stats)
        log_name = (f'results/custom_test/{args.arch}_max_mse_{args.clipping}'
                    '_cliping_layer_selection.csv')
        elog = EvalLog(['num_8bit_layers', 'indexes', 'val_prec1', 'val_prec5'],
                       log_name, auto_save=True)
        for i in range(len(order) + 1):
            eight_bit = ['conv0_activation'] + order[:i]
            print(f'it: {i}, 8 bit layers: {len(eight_bit)}')
            eng = QuantEngine(model, policy, meta, ignore_ids=tuple(eight_bit))
            res = run_eval(eng, params_q)
            elog.log(i + 1, str(eight_bit), res['top1'], res['top5'])
        print(elog)
        return 0

    # ---------------- float-vs-quantized measurement ---------------------
    if args.measure_stats:
        from ..calib.measure import measure_statistics, save_measure_csv
        frames = measure_statistics(engine, params, params_q, loader, stats=stats)
        out = save_measure_csv(
            frames, os.path.join(os.path.expanduser('~'), 'mxt-sim-tpu',
                                 'distance', args.arch), args.arch)
        print(f'Saved measurement summary for {len(frames)} sites -> {out}')
        return 0

    # ---------------- tensor dump (debug) -------------------------------
    if args.dump_dir:
        import jax.numpy as jnp
        from ..utils.dump_manager import dump_activations
        images, _ = next(iter(loader))
        names = dump_activations(engine, params_q, jnp.asarray(images),
                                 args.dump_dir)
        print(f'Dumped {len(names)} activations to {args.dump_dir}')
        return 0

    # ---------------- plain validation ---------------------------------
    from ..utils.tracker import MetricsTracker
    experiment = args.mlf_experiment or args.arch
    name = f"{args.arch}_W{args.qweight}A{args.qtype}"
    if args.serving_int8:
        name += '_serving'
    with MetricsTracker('~/mlruns_mxt_tpu', experiment, args, name) as tracker:
        if args.serving_int8:
            print(f'=> serving-int8: calibrating frozen activation scales '
                  f'({args.serving_cal})')
            # s2d stem is opt-in (measured ~parity with bf16 on v5e/XLA —
            # see engine.prepare_serving_params) and needs an even input size
            in_size = args.input_size or meta.input_size
            params_s = engine.prepare_serving_params(
                params_q,
                s2d_stem=args.serving_s2d_stem and in_size % 2 == 0)
            if args.serving_s2d_stem and not _s2d_stem_applied(params_s):
                # opt-in silently falling back to the bf16 stem is confusing
                # (ADVICE r3): say why the transform did not apply
                why = ('odd input size' if in_size % 2 else
                       'stem is not a BN-folded 7x7x3 conv')
                print(f'=> note: --serving_s2d_stem requested but not '
                      f'applied ({why}); stem runs in bf16')
            scales = engine.freeze_serving_scales(
                params_s, loader, mode=args.serving_cal,
                percentile=args.serving_percentile,
                packed=args.serving_packed)
            packed_arg = args.serving_packed
            if packed_arg and args.serving_packed_stages:
                stages = tuple(
                    int(s) for s in args.serving_packed_stages.split(',')
                    if s.strip())
                bad = [s for s in stages if not 1 <= s <= 4]
                if bad or not stages:
                    raise SystemExit(
                        f'--serving_packed_stages must list stages 1-4, '
                        f'got {args.serving_packed_stages!r}')
                packed_arg = stages
            res = evaluate(engine, params_s, loader, stats=stats,
                           quantized='serving_int8', act_scales=scales,
                           packed=packed_arg,
                           subset=args.subset, print_freq=args.print_freq,
                           verbose=True)
        else:
            res = run_eval(engine, params_q if policy.qtype else params,
                           quantized=policy.qtype is not None)
        for k in ('top1', 'top5', 'loss'):
            tracker.log_metric(k, res[k])
        print(f" * Prec@1 {res['top1']:.3f} Prec@5 {res['top5']:.3f} "
              f"({res['images_per_sec']:.1f} img/s)")
        if args.measure_entropy and 'avg_entropy' in res:
            tracker.log_metric('avg.entropy.act', res['avg_entropy'])
            print(f"Average bit rate: avg.entropy.act - {res['avg_entropy']}")
        print(json.dumps({k: round(float(v), 4) for k, v in res.items()}))
    return 0


def _load_order(args, stats):
    """Layer ordering for the sensitivity sweep: explicit file, or derived
    from calibration-time quantization-error stats (largest mse first) —
    the reference hardcodes measured per-arch orderings
    (inference_sim.py:114-125); we derive them from the stats artifact."""
    if args.order_file:
        with open(args.order_file) as f:
            return json.load(f)
    if stats:
        errs = {site: float(np.asarray(e['scalar/mean_mse_lowp']))
                for site, e in stats.items() if 'scalar/mean_mse_lowp' in e}
        if errs:
            return [s for s, _ in sorted(errs.items(), key=lambda kv: -kv[1])]
    raise SystemExit('custom_test needs --order_file or stats with mse columns '
                     '(-sm use after a collect run with error stats)')


if __name__ == '__main__':
    sys.exit(main())
