"""CLI: convert external checkpoints into the local cache.

Depth models (PyTorch hub .pt, as torch.hub.load("intel-isl/MiDaS", ...)
downloads in the reference, depth_midas.py:10):

    python -m depth_estimation_tpu.tools.import_weights <ckpt.pt> <model_type>

model_type ∈ {MiDaS_small, MiDaS, DPT_Large, DPT_Hybrid}; conversion is
content-hash cached.

Detector models (MediaPipe .tflite, the files mediapipe 0.8.11 bundles —
reference requirements.txt:2):

    python -m depth_estimation_tpu.tools.import_weights --tflite <file.tflite> [...]

Each file is copied into the TFLite cache dir
(~/.cache/depth_estimation_tpu/tflite/) and structurally converted +
verified immediately; PersonDetector/FaceDetector pick the weights up
automatically (detect/weights.py).
"""

import shutil
import sys


def _import_tflite(paths):
    from depth_estimation_tpu.detect.weights import load_detector_params, tflite_dir

    dst = tflite_dir()
    dst.mkdir(parents=True, exist_ok=True)
    for p in paths:
        shutil.copy2(p, dst)
        print(f"Staged {p} -> {dst}")
    params = load_detector_params()
    if not params:
        print("No detector matched the staged files (check the expected names "
              "in detect/weights.py).")
        return 1
    for key, tree in params.items():
        import jax

        n = sum(x.size for x in jax.tree_util.tree_leaves(tree))
        print(f"Converted + verified {key}: {n/1e6:.2f}M params cached.")
    return 0


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if argv and argv[0] == "--tflite":
        if len(argv) < 2:
            print(__doc__)
            return 2
        return _import_tflite(argv[1:])
    if len(argv) != 2:
        print(__doc__)
        return 2
    pt_path, model_type = argv
    from depth_estimation_tpu.utils.checkpoint import import_torch_checkpoint

    params = import_torch_checkpoint(pt_path, model_type)
    import jax

    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"Imported {model_type}: {n/1e6:.1f}M params cached.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
