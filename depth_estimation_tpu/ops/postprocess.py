"""Depth-map → video-frame postprocessing.

Re-implements the reference's output conversions, including their uint8
wraparound semantics, which are part of the observed behavior:

* ``write_output`` (depth_midas.py:81-85): raw ``astype(np.uint8)`` cast — NO
  normalization, so float depth values alias mod 256 — then gray→3-channel.
* ``to_video_frame`` (midas_mediapipe.py:141-150): uint8 cast, ``*= 5``
  contrast and ``+= 10`` brightness *in uint8 arithmetic* (wraps around), then
  gray→3-channel merge.
* ``side_by_side`` (midas_mediapipe.py:152-155): hstack of two half-size
  frames.

Each has a ``faithful`` flag; the fixed variants min-max normalize before the
cast (what a user almost certainly wants for display).

Device-side variants (``*_jax``) run the same conversions INSIDE the frame
program so only uint8 bytes cross the device→host boundary — 4× less D2H
per frame than fetching the float32 map and casting on host (the
reference's ``.cpu()``-then-cast, depth_midas.py:34+83). jnp's float→uint8
cast does NOT wrap like numpy's C cast, so the mod-256 semantics are
reproduced explicitly (``wraparound_u8_jax``) and CI-tested against the
numpy implementations above.
"""

from __future__ import annotations

import numpy as np


def wraparound_u8_jax(x):
    """numpy ``astype(np.uint8)`` semantics for float inputs, on device:
    truncate toward zero, then wrap mod 256 (depth_midas.py:83's raw cast).

    jnp's own float→uint8 convert saturates instead of wrapping, so the
    wrap is spelled out: exact for |trunc(x)| < 2**24 (f32 integer range),
    far beyond any depth-map magnitude."""
    import jax.numpy as jnp

    t = jnp.trunc(x.astype(jnp.float32))
    t = t - 256.0 * jnp.floor(t / 256.0)
    return t.astype(jnp.uint8)


def depth_to_gray_u8_jax(depth, faithful: bool = True):
    """Device-side ``depth_to_gray_u8``: float map → uint8 gray."""
    import jax.numpy as jnp

    if faithful:
        return wraparound_u8_jax(depth)
    lo = depth.min()
    hi = depth.max()
    scale = jnp.where(hi > lo, 255.0 / (hi - lo), 0.0)
    return ((depth - lo) * scale).astype(jnp.uint8)


def to_video_frame_u8_jax(depth, faithful: bool = True):
    """Device-side ``to_video_frame`` minus the host 3-channel merge:
    uint8 cast, ``*5`` contrast, ``+10`` brightness — in uint8 arithmetic,
    which wraps on device exactly as numpy's does on host
    (midas_mediapipe.py:147-149). Returns the single-channel (H, W) u8
    frame; hosts ``merge_gray3`` it (a cheap repeat) before display."""
    import jax.numpy as jnp

    g = depth_to_gray_u8_jax(depth, faithful=faithful)
    if faithful:
        return g * jnp.uint8(5) + jnp.uint8(10)
    return jnp.clip(g.astype(jnp.int32) * 5 + 10, 0, 255).astype(jnp.uint8)


def depth_to_gray_u8(depth: np.ndarray, faithful: bool = True) -> np.ndarray:
    """float depth → uint8 gray. Faithful: bare cast with wraparound."""
    if faithful:
        return depth.astype(np.uint8)
    lo, hi = float(depth.min()), float(depth.max())
    scale = 255.0 / (hi - lo) if hi > lo else 0.0
    return ((depth - lo) * scale).astype(np.uint8)


def merge_gray3(gray_u8: np.ndarray) -> np.ndarray:
    """gray HxW → HxWx3 (cv2.merge([g,g,g]) equivalent, depth_midas.py:84)."""
    return np.repeat(gray_u8[..., None], 3, axis=-1)


def to_video_frame(depth: np.ndarray, faithful: bool = True) -> np.ndarray:
    """midas_mediapipe.py:141-150 equivalent (uint8 wraparound preserved)."""
    out = depth_to_gray_u8(depth, faithful=faithful)
    if faithful:
        out = out.copy()
        out *= 5  # uint8 arithmetic — wraps, as in the reference
        out += 10
    else:
        out = np.clip(out.astype(np.int32) * 5 + 10, 0, 255).astype(np.uint8)
    return merge_gray3(out)


def side_by_side(img1: np.ndarray, img2: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Half-size hstack (midas_mediapipe.py:152-155). Uses cv2-compatible
    bilinear (cv2.resize default INTER_LINEAR) via our resize ops on host."""
    import cv2  # host-side display path only

    f1 = cv2.resize(img1, (out_w // 2, out_h // 2))
    f2 = cv2.resize(img2, (out_w // 2, out_h // 2))
    return np.hstack((f1, f2))
