"""Flag system, mirroring arguments.py:3-74 of the reference (same flag
names/defaults so run scripts port 1:1; --loss-weight parsed with
ast.literal_eval rather than eval)."""

import argparse
import ast


def get_args(argv=None):
    parser = argparse.ArgumentParser(description='islam_tpu')

    parser.add_argument('--batch-size', type=int, default=1)
    parser.add_argument('--worker-num', type=int, default=1)
    parser.add_argument('--vo-model-name', default='',
                        help='reference .pkl or orbax dir for full VONet')
    parser.add_argument('--pose-model-name', default='',
                        help='checkpoint overriding the pose head')
    parser.add_argument('--imu-denoise-model-name', default='')
    parser.add_argument('--data-root', default='')
    parser.add_argument('--start-frame', type=int, default=0)
    parser.add_argument('--end-frame', type=int, default=-1)
    parser.add_argument('--train-epoch', type=int, default=10)
    parser.add_argument('--lr', type=float, default=1e-4)
    parser.add_argument('--print-interval', type=int, default=1)
    parser.add_argument('--snapshot-interval', type=int, default=1000)
    parser.add_argument('--project-name', default='')
    parser.add_argument('--train-name', default='')
    parser.add_argument('--result-dir', default='')
    parser.add_argument('--save-model-dir', default='')
    parser.add_argument('--loss-weight', default='(1,1,1,1)')
    parser.add_argument('--vo-optimizer', default='adam',
                        choices=['adam', 'rmsprop', 'sgd'])
    parser.add_argument('--data-type', default='tartanair',
                        choices=['tartanair', 'kitti', 'euroc', 'synthetic'])
    parser.add_argument('--fix-model-parts', default=[], nargs='+')
    parser.add_argument('--rot-w', type=float, default=1)
    parser.add_argument('--trans-w', type=float, default=1)
    parser.add_argument('--use-gt-scale', action='store_true', default=False)
    parser.add_argument('--start-epoch', type=int, default=1)
    # LIVE here, dead in the reference (parsed but never read by its
    # train.py): nonzero enables the dense reprojection factor as PVGO's
    # 5th residual block, weighted by loss_weight[4] (default 1.0).
    parser.add_argument('--reproj-points', type=int, default=0)
    # Bi-level coupling through the PVGO solve: 'detached' reproduces the
    # reference (stop-grad into the LM, one-step loss on the converged
    # nodes, pvgo.py:146-168); 'implicit' differentiates the solution via
    # the implicit function theorem; 'unrolled' backprops through the LM
    # iterations (the reference's dead code path, pvgo.py:81-92).
    parser.add_argument('--bilevel', default='detached',
                        choices=['detached', 'implicit', 'unrolled'])
    # The following flags are parsed but unused, exactly as in the reference
    # (arguments.py:26-69 defines them; train.py never reads them -- verified
    # by grep, SURVEY.md section 5).  Kept so reference command lines port
    # 1:1.
    parser.add_argument('--train-portion', type=float, default=1)
    parser.add_argument('--enable-mapping', action='store_true', default=False)
    parser.add_argument('--vo-reverse-edge', action='store_true', default=False)
    parser.add_argument('--vo-right-cam', action='store_true', default=False)
    parser.add_argument('--imu-epoch', type=int, default=50)
    parser.add_argument('--use-est-cov', action='store_true', default=False)
    # --imu-lr IS honored here (unlike the reference, which declares it with
    # default 1e-5 at arguments.py:64 but hard-codes lr=3e-5 at train.py:142);
    # the default is the reference's BEHAVIORAL value.
    parser.add_argument('--imu-lr', type=float, default=3e-5)
    # islam_tpu extensions (not in the reference flag set)
    parser.add_argument('--image-height', type=int, default=448,
                        help='input crop height (default 448)')
    parser.add_argument('--image-width', type=int, default=640,
                        help='input crop width (default 640)')
    parser.add_argument('--synthetic-frames', type=int, default=33,
                        help='frames for --data-type synthetic')
    parser.add_argument('--profile-dir', default='',
                        help='write a jax.profiler trace of one train step')
    parser.add_argument('--bf16', action='store_true', default=False,
                        help='run the conv stack in bfloat16')
    parser.add_argument('--scan-chunk', type=int, default=0,
                        help='fuse K sequential windows into one jitted '
                             'lax.scan program (0/1 = per-window stepping)')
    parser.add_argument('--frozen-bn-eval', action='store_true', default=False,
                        help='run the frozen StereoNet BatchNorms with '
                             'running averages (constant affine, fused by '
                             'XLA) instead of batch statistics; only takes '
                             'effect when stereo is in --fix-model-parts. '
                             'Deviates from the reference, which keeps even '
                             'frozen subnets in train-mode BN '
                             '(TartanVO.py:91); see docs/PARITY.md')
    parser.add_argument('--eval-only', action='store_true', default=False,
                        help='inference: one forward+PVGO pass over the '
                             'trajectory (no gradients, no updates), '
                             'snapshots to {result-dir}/0')

    args = parser.parse_args(argv)
    args.loss_weight = tuple(ast.literal_eval(args.loss_weight))
    return args
