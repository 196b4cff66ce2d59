"""DepthServer dynamic batching: concurrent submits → one padded
static-shape dispatch per batch, results identical to direct predict."""

import threading

import numpy as np
import pytest

from depth_estimation_tpu.runtime.server import DepthServer


@pytest.fixture(scope="module")
def est():
    import warnings

    from depth_estimation_tpu.estimator import DepthEstimator

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return DepthEstimator("MiDaS_small", verbose=False)


def _expected_u8(est, frames):
    fn = est._batched_fn(frames[0].shape[:2], output="u8")
    return np.asarray(fn(est.params, np.stack(frames)))


def test_server_results_match_direct(est, rng):
    frames = [rng.integers(0, 256, (64, 96, 3), np.uint8) for _ in range(6)]
    want = _expected_u8(est, frames)
    with DepthServer(est, (64, 96), max_batch=4, max_delay_ms=50) as srv:
        futs = [srv.submit(f) for f in frames]
        got = [f.result(timeout=120) for f in futs]
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)
        assert g.dtype == np.uint8
    assert srv.frames_served == 6
    # 6 requests, max_batch 4, 50 ms coalescing window → fewer dispatches
    # than requests (loose bound: a loaded 1-core host may preempt submits)
    assert srv.batches_dispatched < 6


def test_server_batches_concurrent_clients(est, rng):
    """N threads submitting simultaneously must coalesce into far fewer
    dispatches than requests (the whole point of dynamic batching)."""
    n = 12
    frames = [rng.integers(0, 256, (64, 96, 3), np.uint8) for _ in range(n)]
    want = _expected_u8(est, frames)
    srv = DepthServer(est, (64, 96), max_batch=8, max_delay_ms=100)
    # warm the executable so the first batch isn't a compile outlier
    srv.submit(frames[0]).result(timeout=300)
    results = [None] * n
    start = threading.Barrier(n)

    def client(i):
        start.wait()
        results[i] = srv.submit(frames[i]).result(timeout=300)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    srv.close()
    for i in range(n):
        np.testing.assert_array_equal(results[i], want[i])
    # 1 warm + 12 concurrent: coalescing must beat one-dispatch-per-request
    assert srv.batches_dispatched < 1 + n


def test_server_validates_and_closes(est, rng):
    srv = DepthServer(est, (64, 96), max_batch=2, max_delay_ms=1)
    with pytest.raises(ValueError, match="uint8"):
        srv.submit(np.zeros((64, 96, 3), np.float32))
    with pytest.raises(ValueError, match="expected"):
        srv.submit(np.zeros((32, 48, 3), np.uint8))
    f = srv.submit(rng.integers(0, 256, (64, 96, 3), np.uint8))
    srv.close()
    assert f.result(timeout=120).shape == (64, 96)  # drained before shutdown
    with pytest.raises(RuntimeError, match="closed"):
        srv.submit(rng.integers(0, 256, (64, 96, 3), np.uint8))
    srv.close()  # idempotent


class _SlowStubEstimator:
    """Stand-in with a slow batched program so queued requests can be
    cancelled deterministically while the dispatcher is busy."""

    params = None

    def _batched_fn(self, hw, output="u8"):
        def fn(params, batch):
            import time

            time.sleep(0.2)
            return batch[..., 0]  # (B, H, W) u8

        return fn


def test_server_survives_cancelled_requests(rng):
    """A client cancelling a queued Future must not kill the dispatcher
    (resolving a cancelled future raises InvalidStateError)."""
    frames = [rng.integers(0, 256, (16, 24, 3), np.uint8) for _ in range(3)]
    srv = DepthServer(_SlowStubEstimator(), (16, 24), max_batch=1,
                      max_delay_ms=0)
    f1 = srv.submit(frames[0])          # dispatcher goes busy for ~0.2 s
    import time

    time.sleep(0.05)
    f2 = srv.submit(frames[1])          # queued behind f1
    assert f2.cancel()                  # cancelled while queued
    f3 = srv.submit(frames[2])          # must still be served
    np.testing.assert_array_equal(f1.result(timeout=30), frames[0][..., 0])
    np.testing.assert_array_equal(f3.result(timeout=30), frames[2][..., 0])
    assert f2.cancelled()
    assert srv.frames_served == 2
    srv.close()


def test_fused_server_matches_direct_batched(rng):
    """FusedDepthServer results must equal a direct runner.batched call on
    the same frames (full output dict, per request)."""
    import warnings

    import jax

    from depth_estimation_tpu.estimator import DepthEstimator
    from depth_estimation_tpu.runtime.fused import FusedFrameRunner
    from depth_estimation_tpu.runtime.server import FusedDepthServer
    from tests.test_fused_iris import _make_detector

    from depth_estimation_tpu import registry
    from depth_estimation_tpu.config import SMALL_PREPROCESS
    from tests.test_estimator_stream import _TinyDepthNet

    if "Tiny_test" not in registry.available_models():
        registry.register(registry.ModelEntry(
            "Tiny_test", _TinyDepthNet, SMALL_PREPROCESS, lambda sd: sd))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        est = DepthEstimator("Tiny_test", verbose=False)
    det, _face = _make_detector()
    frames = [rng.integers(0, 256, (120, 160, 3), np.uint8)
              for _ in range(3)]
    K = 2
    with FusedDepthServer(est, det, (120, 160), max_batch=K,
                          max_delay_ms=50) as srv:
        futs = [srv.submit(f) for f in frames]
        got = [f.result(timeout=300) for f in futs]
    assert srv.frames_served == 3

    runner = FusedFrameRunner(est, det, emit_depth_map=False)
    want = jax.device_get(runner.batched(np.stack(frames[:2])))
    # compare request 0/1 against the direct K=2 batch of frames 0/1
    for i in (0, 1):
        assert set(got[i]) == set(want)
        for k in want:
            np.testing.assert_array_equal(got[i][k], np.asarray(want[k][i]),
                                          err_msg=k)
    assert got[2]["vis_u8"].dtype == np.uint8


def test_serve_cli_online(capsys):
    """`depth-serve --online`: end-to-end through the CLI — all frames
    served, coalesced into fewer dispatches than requests."""
    import warnings

    from depth_estimation_tpu.tools import serve

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        serve.main(["--src", "synthetic:4x64x96", "--src", "synthetic:3x64x96",
                    "--src", "synthetic:2x32x48",  # mixed resolution bucket
                    "--online", "--max-batch", "4", "--max-delay-ms", "50",
                    "--model-type", "MiDaS_small"])
    out = capsys.readouterr().out
    assert "Sucessfully read 9 frames over 3 streams." in out
    assert "9 requests in" in out
    assert "2 resolution bucket(s)" in out


def test_server_surfaces_dispatch_errors(rng):
    """A failing batched program must fail the waiting futures and leave
    the dispatcher alive for later requests."""
    class _Boom:
        params = None

        def _batched_fn(self, hw, output="u8"):
            def fn(params, batch):
                raise RuntimeError("boom")

            return fn

    srv = DepthServer(_Boom(), (8, 12), max_batch=2, max_delay_ms=1)
    frame = rng.integers(0, 256, (8, 12, 3), np.uint8)
    with pytest.raises(RuntimeError, match="boom"):
        srv.submit(frame).result(timeout=30)
    with pytest.raises(RuntimeError, match="boom"):  # still serving
        srv.submit(frame).result(timeout=30)
    assert srv.frames_served == 0
    srv.close()


def test_bucketed_server_mixed_resolutions(est, rng):
    """BucketedDepthServer routes by frame resolution; results match the
    direct batched program for each bucket."""
    from depth_estimation_tpu.runtime.server import BucketedDepthServer

    big = [rng.integers(0, 256, (64, 96, 3), np.uint8) for _ in range(3)]
    small = [rng.integers(0, 256, (32, 48, 3), np.uint8) for _ in range(2)]
    with BucketedDepthServer(est, max_batch=4, max_delay_ms=20) as srv:
        futs = [srv.submit(f) for f in big] + [srv.submit(f) for f in small]
        got = [f.result(timeout=120) for f in futs]
        with pytest.raises(ValueError, match="uint8"):
            srv.submit(np.zeros((8, 8, 3), np.float32))
    want_big = _expected_u8(est, big)
    want_small = _expected_u8(est, small)
    for i in range(3):
        np.testing.assert_array_equal(got[i], want_big[i])
    for i in range(2):
        np.testing.assert_array_equal(got[3 + i], want_small[i])
    assert set(srv.stats) == {(64, 96), (32, 48)}
    with pytest.raises(RuntimeError, match="closed"):
        srv.submit(big[0])


def test_bucketed_server_caps_buckets(est, rng):
    from depth_estimation_tpu.runtime.server import BucketedDepthServer

    with BucketedDepthServer(est, max_batch=2, max_delay_ms=1,
                             max_buckets=1) as srv:
        srv.submit(rng.integers(0, 256, (32, 48, 3), np.uint8)).result(
            timeout=120)
        with pytest.raises(ValueError, match="max_buckets"):
            srv.submit(rng.integers(0, 256, (64, 96, 3), np.uint8))


def test_fused_server_rejects_incapable_detector(est):
    from depth_estimation_tpu.runtime.server import FusedDepthServer

    class _NotADetector:
        pass

    with pytest.raises(ValueError, match="fused-capable"):
        FusedDepthServer(est, _NotADetector(), (64, 96))
