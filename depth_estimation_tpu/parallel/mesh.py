"""Device mesh + sharding rules (SURVEY.md §2c).

The reference is strictly single-device (depth_midas.py:17, no
torch.distributed anywhere); multi-chip scale-out is a new capability of
this framework, expressed the TPU way: a ``jax.sharding.Mesh`` with ``dp``
(batch/data) and ``tp`` (tensor) axes — optionally ``sp`` (sequence) and
``pp`` (pipeline, see parallel/pipeline.py) — PartitionSpec annotations on
the params/batch/activations, and XLA GSPMD inserting the collectives
over ICI.

TP rules target where DPT's FLOPs live: attention qkv/proj and MLP fc1/fc2
kernels are sharded column-/row-wise so each layer needs a single psum on
the row-parallel matmuls. Everything else (convs, norms) is replicated —
they are bandwidth-bound and small next to the transformer trunk.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    tp: int = 1,
    sp: int = 1,
    pp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Device mesh over the first ``n_devices`` devices.

    Default (``sp == pp == 1``) is the 2-axis ``(dp, tp)`` mesh. Asking for
    sequence (``sp``) or pipeline (``pp``) axes yields the full 4-axis
    ``(dp, pp, sp, tp)`` mesh; the remaining devices fill ``dp``. Axis
    order puts ``tp`` innermost (fastest-varying device index → shortest
    ICI hops for the per-layer psums), ``dp`` outermost (grad all-reduce
    tolerates the longest hops).
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % (tp * sp * pp) != 0:
        raise ValueError(f"n_devices={n} not divisible by tp*sp*pp={tp * sp * pp}")
    if sp == 1 and pp == 1:
        grid = np.asarray(devices).reshape(n // tp, tp)
        return Mesh(grid, axis_names=("dp", "tp"))
    grid = np.asarray(devices).reshape(n // (tp * sp * pp), pp, sp, tp)
    return Mesh(grid, axis_names=("dp", "pp", "sp", "tp"))


# (regex on the param path, PartitionSpec) — first match wins
_TP_RULES = (
    # column-parallel: shard the output features
    (re.compile(r"attn/qkv/kernel$"), P(None, "tp")),
    (re.compile(r"attn/qkv/bias$"), P("tp")),
    (re.compile(r"mlp/fc1/kernel$"), P(None, "tp")),
    (re.compile(r"mlp/fc1/bias$"), P("tp")),
    # row-parallel: shard the input features (psum after)
    (re.compile(r"attn/proj/kernel$"), P("tp", None)),
    (re.compile(r"mlp/fc2/kernel$"), P("tp", None)),
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def param_pspecs(params, tensor_parallel: bool = True):
    """PartitionSpec tree for a param tree: TP rules on the transformer
    matmuls, replicated elsewhere."""

    def spec_for(path, leaf):
        if tensor_parallel:
            s = _path_str(path)
            for rx, spec in _TP_RULES:
                if rx.search(s):
                    return spec
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params, mesh: Mesh, tensor_parallel: bool = True):
    specs = param_pspecs(params, tensor_parallel)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def batch_pspec() -> P:
    return P("dp")


def seq_sharding(mesh: Mesh) -> NamedSharding:
    """Sequence-parallel activation sharding for (B, N, C) token tensors:
    batch over dp, tokens over sp. Pass as ``act_sharding`` to ViT/DPT —
    LayerNorm/MLP then run token-sharded and GSPMD all-gathers K/V for the
    attention contractions (the tokens-per-chip memory saver; at DPT's 577
    tokens this is a capability demo, not a perf win — SURVEY §5)."""
    if "sp" not in mesh.shape:
        raise ValueError(f"mesh has no 'sp' axis: {mesh.axis_names}")
    return NamedSharding(mesh, P("dp", "sp", None))
