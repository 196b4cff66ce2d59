"""CLI: convert a downloaded PyTorch-hub MiDaS checkpoint into the cache.

Usage:
    python -m depth_estimation_tpu.tools.import_weights <ckpt.pt> <model_type>

model_type ∈ {MiDaS_small, DPT_Large, DPT_Hybrid}. The hub files are e.g.
midas_v21_small_256.pt / dpt_large_384.pt / dpt_hybrid_384.pt (what
torch.hub.load("intel-isl/MiDaS", ...) downloads in the reference,
depth_midas.py:10). Conversion is content-hash cached.
"""

import sys


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
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
