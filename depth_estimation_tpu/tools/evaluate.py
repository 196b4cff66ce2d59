"""Console entry: dataset evaluation with the standard depth metrics.

Scores any registry model over (image, disparity) pairs with the zero-shot
MiDaS protocol (per-image lstsq scale+shift alignment in disparity space,
then abs_rel / sq_rel / rmse / rmse_log / log10 / δ<1.25^k in depth space —
train/metrics.py). The reference has no dataset evaluation (its only
metrics are the streaming HUD's distance RMSE/MAE, face.py:141-153).

Data: a directory of .npz files with ``image`` (H, W, 3) uint8 and
``disparity`` (H, W) float32 (train/data.py's storage format), or
``--synthetic N`` for a self-contained smoke run. The preprocess is fused
into the forward (make_training_apply) so each eval batch is one XLA
program from raw u8 to disparity.

`depth-evaluate --data <npz_dir>` after install, or
`python -m depth_estimation_tpu.tools.evaluate`. Prints one JSON line of
image-weighted mean metrics.
"""

from __future__ import annotations

import argparse
import functools
import json
import warnings

from depth_estimation_tpu.utils.platform import apply_platform_env


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--data", help="directory of .npz (image, disparity) pairs")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="evaluate on N synthetic pairs instead of --data")
    ap.add_argument("--hw", type=int, nargs=2, default=(192, 256), metavar=("H", "W"),
                    help="synthetic pair size")
    ap.add_argument("--model-type", default="MiDaS_small")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--no-align", action="store_true",
                    help="score raw predictions (metric-calibrated models)")
    args = ap.parse_args(argv)
    if not args.data and not args.synthetic:
        ap.error("one of --data / --synthetic is required")

    apply_platform_env()  # honor DEPTH_TPU_PLATFORM=cpu before backend init

    import jax

    from depth_estimation_tpu.estimator import DepthEstimator
    from depth_estimation_tpu.train.data import (
        iter_npz_dir,
        make_training_apply,
        synthetic_pairs,
    )
    from depth_estimation_tpu.train.metrics import evaluate_pairs

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # random-init warning is fine offline
        est = DepthEstimator(args.model_type, verbose=False)

    fused_apply = make_training_apply(est.model, est.preprocess_cfg)
    precision = est.matmul_precision

    @jax.jit
    def fwd(params, imgs_u8):
        with jax.default_matmul_precision(precision):
            return fused_apply(params, imgs_u8)

    pairs = (synthetic_pairs(args.synthetic, *args.hw) if args.synthetic
             else iter_npz_dir(args.data))
    result = evaluate_pairs(
        functools.partial(fwd, est.params), pairs,
        batch=args.batch, align=not args.no_align,
    )
    print(json.dumps({"model_type": args.model_type,
                      "aligned": not args.no_align, **result}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
