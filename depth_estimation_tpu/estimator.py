"""DepthEstimator — the reference's top-level depth API, TPU-native.

Mirrors ``DepthEstimator`` (reference: depth_midas.py:6-35): construct by
model-type string, call ``.predict(bgr_u8_image) -> float32 HxW relative
inverse depth``.

TPU-first differences from the reference implementation:

* The reference crosses the host↔device boundary twice per frame *around*
  host-side preprocessing (transform on CPU, ``.to(device)`` at
  depth_midas.py:23, ``.cpu()`` at :34). Here the ENTIRE frame function —
  BGR→RGB flip, /255, cubic resize, normalize, network forward, bicubic
  upsample back to source resolution — is one jit-compiled XLA program:
  the frame ships to HBM once as raw uint8 (3× smaller than f32) and only
  the depth map comes back.
* ``.eval()``/device selection are replaced by jit warm-up; one executable
  is compiled and cached per source resolution (the resize output shape is
  static per input shape, as in the reference's per-video constant shape).
* Weights come from the converted-checkpoint cache (utils/checkpoint.py).
  With no checkpoint available (e.g. no network), the model runs with
  deterministic random init — pipeline-valid, numerically meaningless —
  and warns once.
"""

from __future__ import annotations

import warnings
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from depth_estimation_tpu.ops.preprocess import compute_resize_shape
from depth_estimation_tpu.ops.resize import resize2d
from depth_estimation_tpu.registry import get_entry
from depth_estimation_tpu.utils import checkpoint as ckpt


class DepthEstimator:
    def __init__(
        self,
        model_type: str,
        params: Optional[Dict] = None,
        seed: int = 0,
        verbose: bool = True,
        dtype: str = "float32",
        matmul_precision: Optional[str] = None,
    ):
        """dtype: 'float32' (default; numeric parity with the reference) or
        'bfloat16' (the MXU fast path — params and activations in bf16,
        depth output back in f32).

        matmul_precision: conv/matmul precision inside the frame program.
        Defaults to 'high' (bf16_3x passes) for float32 — measured 2.2e-4
        max abs-rel vs the torch oracle on a real v5e, inside the 1e-3
        accuracy gate, where the TPU's 'default' (single bf16 pass) fails at
        1.3e-2 — and 'default' for bfloat16."""
        self.model_type = model_type
        if verbose:
            print(f"Loading model: {self.model_type}")  # reference: depth_midas.py:9
        self.entry = get_entry(model_type)
        self.model = self.entry.make_model()
        self.preprocess_cfg = self.entry.preprocess
        self.dtype = jnp.dtype(dtype)
        self.matmul_precision = matmul_precision or (
            self.entry.f32_precision if dtype == "float32" else "default"
        )

        if params is None:
            params = ckpt.load_params(model_type)
        if params is None:
            warnings.warn(
                f"No converted checkpoint found for {model_type!r}; using random "
                f"initialization. Import hub weights with "
                f"`python -m depth_estimation_tpu.tools.import_weights <ckpt.pt> {model_type}`.",
                stacklevel=2,
            )
            init_hw = (
                self.preprocess_cfg.target_height // 1,
                self.preprocess_cfg.target_width // 1,
            )
            params = jax.jit(self.model.init)(
                jax.random.PRNGKey(seed), np.zeros((1, *init_hw, 3), np.float32)
            )["params"]
        self.params = {"params": params} if "params" not in params else params
        if self.dtype != jnp.float32:
            self.params = jax.tree_util.tree_map(
                lambda a: jnp.asarray(a, self.dtype), self.params
            )
        self._fn_cache: Dict[Tuple, object] = {}

    # -- fused frame function ----------------------------------------------

    def _make_frame_fn(self, in_hw: Tuple[int, int], bgr: bool, output: str = "f32"):
        """uint8 (H, W, 3) → depth map: the whole per-frame pipeline as one
        XLA program (preprocess + forward + bicubic upsample).

        output='f32' returns the float32 (H, W) map (reference
        ``predict`` semantics); output='u8' additionally applies the
        faithful wraparound uint8 cast ON DEVICE (depth_midas.py:83) so the
        streaming loop fetches 4× fewer bytes per frame."""
        cfg = self.preprocess_cfg
        net_hw = compute_resize_shape(*in_hw, cfg)
        # trace-time constants MUST stay host numpy: a jax.Array captured in
        # a jitted closure is fetched back D2H at LOWERING time (one blocking
        # tunnel RPC per constant, queued behind all pending device work —
        # observed stalling fn.lower() for minutes during tunnel congestion)
        mean = np.asarray(cfg.mean, np.float32)
        std = np.asarray(cfg.std, np.float32)
        model = self.model
        dtype = self.dtype
        precision = self.matmul_precision
        if output == "u8":
            from depth_estimation_tpu.ops.postprocess import wraparound_u8_jax

        @jax.jit
        def frame_fn(params, img_u8):
            with jax.default_matmul_precision(precision):
                x = img_u8[..., ::-1] if bgr else img_u8
                x = x.astype(jnp.float32) / 255.0
                x = resize2d(x, net_hw, method="cubic", align_corners=False)
                x = ((x - mean) / std).astype(dtype)
                pred = model.apply(params, x[None]).astype(jnp.float32)  # (1, h, w)
                # reference upsamples the prediction back to the source
                # resolution with bicubic align_corners=False (depth_midas.py:28-33)
                pred = resize2d(pred[0], in_hw, method="cubic", align_corners=False)
                if output == "u8":
                    pred = wraparound_u8_jax(pred)
                return pred

        return frame_fn

    def frame_fn(self, in_hw: Tuple[int, int], bgr: bool = True, output: str = "f32"):
        key = (int(in_hw[0]), int(in_hw[1]), bgr, output)
        fn = self._fn_cache.get(key)
        if fn is None:
            fn = self._make_frame_fn(key[:2], bgr, output)
            self._fn_cache[key] = fn
        return fn

    # -- public API ---------------------------------------------------------

    def predict(self, img: np.ndarray) -> np.ndarray:
        """BGR uint8 (H, W, 3) → float32 (H, W) relative inverse depth
        (reference: depth_midas.py:21-35)."""
        from depth_estimation_tpu.utils.debug import check_depth_output, check_frame_input

        check_frame_input(img)
        fn = self.frame_fn(img.shape[:2])
        out = np.asarray(fn(self.params, img))
        check_depth_output(out, img.shape[:2])
        return out

    def predict_device(self, img) -> jax.Array:
        """Same as predict but leaves the result on device (for fused
        pipelines that sample depth on-chip)."""
        fn = self.frame_fn(img.shape[:2])
        return fn(self.params, img)

    def predict_device_u8(self, img) -> jax.Array:
        """Depth map with the reference's raw uint8 output cast
        (depth_midas.py:83, wraparound preserved) applied ON DEVICE, left on
        device. The streaming loop's fast path: only H×W uint8 bytes cross
        D2H, vs 4 H W for the f32 map."""
        fn = self.frame_fn(img.shape[:2], output="u8")
        return fn(self.params, img)

    def predict_batch(self, imgs: np.ndarray) -> np.ndarray:
        """(B, H, W, 3) BGR uint8 → (B, H, W) float32, one XLA program."""
        fn = self._batched_fn(imgs.shape[1:3])
        return np.asarray(fn(self.params, imgs))

    def _params_for_mesh(self, mesh, tensor_parallel: bool):
        """Params placed on ``mesh``: megatron-style TP sharding of the
        transformer matmuls (parallel/mesh.py::_TP_RULES) when requested
        and the mesh has a ``tp`` axis of size > 1, replicated otherwise.
        Cached per (mesh, mode) — keyed by the Mesh object itself, which is
        hashable; id() could be reused after GC, serving stale placements."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        tp = (tensor_parallel and "tp" in mesh.axis_names
              and mesh.shape["tp"] > 1)
        cached = getattr(self, "_mesh_params", None)
        if cached is None:
            cached = self._mesh_params = {}
        key = (mesh, tp)
        if key not in cached:
            if tp:
                from depth_estimation_tpu.parallel.mesh import shard_params

                cached[key] = shard_params(self.params, mesh)
            else:
                cached[key] = jax.device_put(
                    self.params, NamedSharding(mesh, P())
                )
        return cached[key]

    def predict_batch_sharded(
        self, imgs: np.ndarray, mesh, tensor_parallel: bool = True
    ) -> np.ndarray:
        """Batched inference over a device mesh: batch data-parallel over
        the ``dp`` axis (SURVEY.md §2c: DP across chips over ICI for
        batched stills), and — when the mesh has a ``tp`` axis > 1 —
        transformer matmuls tensor-parallel over ``tp`` (GSPMD inserts the
        per-layer psums; models without attn/mlp blocks just replicate).

        Batch size must be divisible by the dp axis size. Params are
        placed once per (mesh, mode) and cached.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        params = self._params_for_mesh(mesh, tensor_parallel)
        fn = self._batched_fn(imgs.shape[1:3])
        imgs_sharded = jax.device_put(imgs, NamedSharding(mesh, P("dp")))
        return np.asarray(fn(params, imgs_sharded))

    def predict_sharded(self, img: np.ndarray, mesh) -> np.ndarray:
        """Single-frame inference with the transformer matmuls
        tensor-parallel over the mesh's ``tp`` axis — SURVEY.md §2c's
        optional extension (TP of DPT attention/MLP across ICI) for
        cutting single-frame latency beyond one chip. The frame is
        replicated (its preprocess is negligible); qkv/fc1 run
        column-parallel and proj/fc2 row-parallel per
        parallel/mesh.py::_TP_RULES, with XLA inserting the two psums per
        block over ICI. Conv-only models (MiDaS_small) fall back to
        replicated execution unchanged."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        params = self._params_for_mesh(mesh, tensor_parallel=True)
        fn = self.frame_fn(img.shape[:2])
        img_rep = jax.device_put(np.asarray(img), NamedSharding(mesh, P()))
        return np.asarray(fn(params, img_rep))

    def predict_spatial(self, img: np.ndarray, mesh, axis: str = "tp") -> np.ndarray:
        """Single-frame inference SPATIALLY partitioned over ``axis``: the
        source frame's rows are sharded across the mesh axis and GSPMD
        propagates that sharding through the whole frame program, inserting
        the halo exchanges each conv needs at shard edges (and collective
        matmuls for the resize contractions). This is the latency analogue
        of predict_sharded for the CONV families (MiDaS_small, the v2.1
        "MiDaS"), which have no transformer matmuls to tensor-parallelize;
        it works for any registry model. Params stay replicated — spatial
        partitioning pays in the regime where activation bytes, not
        weights, dominate (large source resolutions). The source height
        must divide by the axis size (jax sharding constraint)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        if img.shape[0] % mesh.shape[axis] != 0:
            raise ValueError(
                f"source height {img.shape[0]} not divisible by mesh axis "
                f"{axis!r} of size {mesh.shape[axis]}"
            )
        params = self._params_for_mesh(mesh, tensor_parallel=False)
        fn = self.frame_fn(img.shape[:2])
        img_sh = jax.device_put(np.asarray(img), NamedSharding(mesh, P(axis)))
        return np.asarray(fn(params, img_sh))

    def _batched_fn(self, in_hw: Tuple[int, int], output: str = "f32"):
        # cached per instance (lru_cache on a method would pin `self` — and
        # its full param tree — in a class-level cache for the process life)
        key = ("batched", int(in_hw[0]), int(in_hw[1]), output)
        fn = self._fn_cache.get(key)
        if fn is None:
            fn = self._make_batched_fn((int(in_hw[0]), int(in_hw[1])), output)
            self._fn_cache[key] = fn
        return fn

    def _make_batched_fn(self, in_hw: Tuple[int, int], output: str = "f32"):
        cfg = self.preprocess_cfg
        net_hw = compute_resize_shape(*in_hw, cfg)
        # host numpy, not jax.Arrays — see _make_frame_fn's constants note
        mean = np.asarray(cfg.mean, np.float32)
        std = np.asarray(cfg.std, np.float32)
        model = self.model
        dtype = self.dtype
        precision = self.matmul_precision
        if output == "u8":
            from depth_estimation_tpu.ops.postprocess import wraparound_u8_jax

        @jax.jit
        def batch_fn(params, imgs_u8):
            with jax.default_matmul_precision(precision):
                x = imgs_u8[..., ::-1].astype(jnp.float32) / 255.0
                x = resize2d(x, net_hw, method="cubic", align_corners=False)
                x = ((x - mean) / std).astype(dtype)
                pred = model.apply(params, x).astype(jnp.float32)  # (B, h, w)
                up = resize2d(pred[..., None], in_hw, method="cubic", align_corners=False)
                out = up[..., 0]
                if output == "u8":
                    out = wraparound_u8_jax(out)
                return out

        return batch_fn
