"""Checkpoint management (N10): orbax save/load + content-addressed cache.

Replaces the reference's implicit torch.hub download cache
(``~/.cache/torch/hub``, depth_midas.py:10-12) with an explicit store:
PyTorch hub checkpoints are converted once (utils/convert.py) and saved as
orbax trees under ``~/.cache/depth_estimation_tpu/<model_type>/``, keyed by
the source file's content hash so re-imports are no-ops.
"""

from __future__ import annotations

import hashlib
import json
import os
import pathlib
from typing import Dict, Optional

import numpy as np

CACHE_ENV = "DEPTH_ESTIMATION_TPU_CACHE"


def cache_dir() -> pathlib.Path:
    root = os.environ.get(CACHE_ENV) or os.path.join(
        os.path.expanduser("~"), ".cache", "depth_estimation_tpu"
    )
    return pathlib.Path(root)


def _ckpt_path(model_type: str) -> pathlib.Path:
    return cache_dir() / model_type / "params"


def save_params(model_type: str, params: Dict, meta: Optional[Dict] = None) -> pathlib.Path:
    import orbax.checkpoint as ocp

    path = _ckpt_path(model_type)
    path.parent.mkdir(parents=True, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    if path.exists():
        import shutil

        shutil.rmtree(path)
    ckptr.save(path.resolve(), params)
    ckptr.wait_until_finished()
    if meta:
        (path.parent / "meta.json").write_text(json.dumps(meta))
    return path


def load_params(model_type: str) -> Optional[Dict]:
    import orbax.checkpoint as ocp

    path = _ckpt_path(model_type)
    if not path.exists():
        return None
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path.resolve())


def content_hash(path: str | pathlib.Path, chunk: int = 1 << 20) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def import_torch_checkpoint(pt_path: str, model_type: str) -> Dict:
    """Convert a downloaded hub checkpoint (.pt state dict) and cache it.

    Skips conversion when the cached copy was built from the same content
    hash. Returns the Flax params.
    """
    digest = content_hash(pt_path)
    meta_file = _ckpt_path(model_type).parent / "meta.json"
    if meta_file.exists():
        meta = json.loads(meta_file.read_text())
        if meta.get("source_sha256") == digest:
            cached = load_params(model_type)
            if cached is not None:
                return cached

    import torch

    from depth_estimation_tpu.registry import get_entry

    sd = torch.load(pt_path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: np.asarray(v) for k, v in sd.items()}
    entry = get_entry(model_type)
    params = entry.convert(sd)
    save_params(model_type, params, meta={"source_sha256": digest, "model_type": model_type})
    return params


# -- training state (checkpoint/resume, SURVEY.md §5) -------------------------

def save_train_state(path: str | pathlib.Path, state) -> None:
    """Save a TrainState (or any pytree) with orbax."""
    import orbax.checkpoint as ocp

    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    if path.exists():
        import shutil

        shutil.rmtree(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path.resolve(), state)
    ckptr.wait_until_finished()


def load_train_state(path: str | pathlib.Path, template):
    """Restore into the structure of ``template`` (same pytree/shapes)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(pathlib.Path(path).resolve(), template)
