"""Unit parity for the Pallas grouped-conv kernel (interpret mode on CPU).

The shifted-matmul formulation (ops/pallas/grouped_conv.py) must equal
``lax.conv_general_dilated(feature_group_count=G)`` exactly up to f32
accumulation-order noise for every blocking the wrapper can pick: one or
many channel superblocks, one or many row chunks, batch > 1, non-square
maps. The model-level golden lives in tests/test_midas_v21.py; this file
exercises the wrapper's blocking decisions directly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from depth_estimation_tpu.ops.pallas.grouped_conv import (
    grouped_conv3x3_pallas,
    pick_block_channels,
)


def _ref(x, k, g):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=g)


@pytest.mark.parametrize(
    "b,h,w,c,g,bc,vb",
    [
        (1, 6, 6, 16, 4, 8, 1 << 20),    # 2 superblocks
        (2, 5, 7, 16, 4, 16, 1 << 20),   # batch>1, non-square, full-C block
        (1, 8, 8, 32, 8, 128, 1 << 20),  # target > C -> single block
        (1, 4, 4, 8, 8, 4, 1 << 20),     # bw == cg (one group per matmul)
        (1, 8, 6, 16, 4, 16, 400),       # row chunking (tiny VMEM budget)
        (2, 6, 6, 16, 4, 8, 300),        # chunking x batch x superblocks
    ],
)
def test_matches_lax_grouped_conv(rng, b, h, w, c, g, bc, vb):
    x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, c // g, c)).astype(np.float32))
    got = grouped_conv3x3_pallas(x, k, g, block_channels=bc, interpret=True,
                                 vmem_block_bytes=vb)
    ref = _ref(x, k, g)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_zero_padding_edges(rng):
    """Border outputs must see true zeros, not wrap-around pixels: compare
    against an explicitly pre-padded VALID conv."""
    x = jnp.asarray(rng.standard_normal((1, 6, 6, 8)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 2, 8)).astype(np.float32))
    got = grouped_conv3x3_pallas(x, k, 4, block_channels=4, interpret=True)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    ref = jax.lax.conv_general_dilated(
        xp, k, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_precision_high_is_3pass_emulation(rng):
    """precision="high" must agree with the exact conv to bf16_3x accuracy
    (~16 effective mantissa bits — rel err well under 1e-4 at these
    magnitudes) WITHOUT being bitwise equal to the HIGHEST path (it really
    runs the 3-pass decomposition, not a silent fallback)."""
    x = jnp.asarray(rng.standard_normal((1, 6, 6, 16)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 4, 16)).astype(np.float32))
    hi = grouped_conv3x3_pallas(x, k, 4, block_channels=8, interpret=True,
                                precision="high")
    exact = grouped_conv3x3_pallas(x, k, 4, block_channels=8, interpret=True,
                                   precision="highest")
    ref = _ref(x, k, 4)
    scale = np.abs(np.asarray(ref)).max()
    np.testing.assert_allclose(np.asarray(hi) / scale,
                               np.asarray(ref) / scale, atol=1e-4)
    assert not np.array_equal(np.asarray(hi), np.asarray(exact))


def test_bad_precision_raises():
    x = jnp.zeros((1, 4, 4, 16), jnp.float32)
    with pytest.raises(ValueError):
        grouped_conv3x3_pallas(x, jnp.zeros((3, 3, 4, 16)), 4,
                               interpret=True, precision="medium")


def test_pick_block_channels():
    assert pick_block_channels(1024, 32, 128) == 128
    assert pick_block_channels(256, 8, 128) == 128
    assert pick_block_channels(2048, 64, 128) == 128
    assert pick_block_channels(96, 32, 128) == 96   # 128 doesn't divide 96
    assert pick_block_channels(64, 64, 128) == 64   # target < one group
    assert pick_block_channels(64, 16, 8) == 16     # floor: one group


def test_bad_shapes_raise():
    x = jnp.zeros((1, 4, 4, 16), jnp.float32)
    with pytest.raises(ValueError):
        grouped_conv3x3_pallas(x, jnp.zeros((3, 3, 4, 8)), 4, interpret=True)
    with pytest.raises(ValueError):
        grouped_conv3x3_pallas(x, jnp.zeros((3, 3, 4, 16)), 3, interpret=True)
