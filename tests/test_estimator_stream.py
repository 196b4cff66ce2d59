"""Estimator + streaming runtime tests (configs 1-3 of BASELINE.json).

Uses a tiny registered model so the full pipeline (preprocess → model →
bicubic upsample → postprocess → sink) runs fast on CPU.
"""

import flax.linen as nn
import numpy as np
import pytest

from depth_estimation_tpu import registry
from depth_estimation_tpu.config import SMALL_PREPROCESS
from depth_estimation_tpu.estimator import DepthEstimator
from depth_estimation_tpu.runtime.stream import VidStream
from depth_estimation_tpu.runtime.video import (
    NullSink,
    PrefetchSource,
    SyntheticSource,
    open_source,
)


class _TinyDepthNet(nn.Module):
    @nn.compact
    def __call__(self, x):
        h = nn.Conv(8, (3, 3), strides=(2, 2), padding="SAME")(x)
        h = nn.relu(h)
        h = nn.Conv(1, (3, 3), padding="SAME")(h)
        # model outputs half-res depth; estimator upsamples back
        return nn.relu(h)[..., 0]


@pytest.fixture(scope="module", autouse=True)
def _register_tiny():
    registry.register(
        registry.ModelEntry("Tiny_test", _TinyDepthNet, SMALL_PREPROCESS, lambda sd: sd)
    )


@pytest.fixture(scope="module")
def estimator():
    with pytest.warns(UserWarning, match="random"):
        return DepthEstimator("Tiny_test", verbose=False)


def test_unknown_model_type_raises():
    with pytest.raises(ValueError, match="unknown model_type"):
        DepthEstimator("NoSuchModel", verbose=False)


def test_predict_shape_and_dtype(estimator, rng):
    img = rng.integers(0, 256, (480, 640, 3), np.uint8)
    out = estimator.predict(img)
    assert out.shape == (480, 640)
    assert out.dtype == np.float32
    # note: bicubic upsample may overshoot below 0 even though the net is
    # ReLU-capped — identical to the reference's torch bicubic behavior


def test_predict_batch_matches_single(estimator, rng):
    imgs = rng.integers(0, 256, (2, 120, 160, 3), np.uint8)
    batched = estimator.predict_batch(imgs)
    single = estimator.predict(imgs[0])
    np.testing.assert_allclose(batched[0], single, atol=1e-5)


def test_frame_fn_cache_reuse(estimator, rng):
    f1 = estimator.frame_fn((480, 640))
    f2 = estimator.frame_fn((480, 640))
    f3 = estimator.frame_fn((240, 320))
    assert f1 is f2 and f1 is not f3


def test_synthetic_source_determinism():
    a = SyntheticSource(5, 64, 96)
    b = SyntheticSource(5, 64, 96)
    for _ in range(5):
        oka, fa = a.read()
        okb, fb = b.read()
        assert oka and okb
        np.testing.assert_array_equal(fa, fb)
    assert a.read()[0] is False


def test_synthetic_spec_parsing():
    s = open_source("synthetic:7x32x48")
    assert (s.frame_count, s.height, s.width) == (7.0, 32, 48)


def test_prefetch_source_delivers_all_frames():
    src = PrefetchSource(SyntheticSource(11, 32, 48))
    frames = []
    while True:
        ok, f = src.read()
        if not ok:
            break
        frames.append(f)
    assert len(frames) == 11
    # frames arrive in order
    ref = SyntheticSource(11, 32, 48)
    for f in frames:
        _, g = ref.read()
        np.testing.assert_array_equal(f, g)


def test_vidstream_end_to_end(estimator, capsys):
    sink = NullSink()
    vs = VidStream(estimator, "synthetic:6x120x160", sink, verbose=True)
    vs.update()
    assert sink.frames_written == 6
    assert sink.last_frame.shape == (120, 160, 3)
    assert sink.last_frame.dtype == np.uint8
    out = capsys.readouterr().out
    assert "Frame: 6" in out  # reference-style frame prints


def test_vidstream_output_matches_direct_predict(estimator):
    """Pipelined stream output (device-side wraparound u8 cast) must equal
    direct predict + the faithful numpy cast, byte-for-byte."""
    sink = NullSink()
    vs = VidStream(estimator, SyntheticSource(3, 120, 160), sink, verbose=False)
    vs.update()
    src = SyntheticSource(3, 120, 160)
    last = None
    while True:
        ok, f = src.read()
        if not ok:
            break
        last = f
    expect = estimator.predict(last).astype(np.uint8)
    np.testing.assert_array_equal(sink.last_frame[..., 0], expect)


@pytest.mark.parametrize("depth", [1, 4])
def test_vidstream_pipeline_depth_equivalent(estimator, depth):
    """Any in-flight depth writes the same frames in the same order."""
    sinks = []
    for pd in (2, depth):
        sink = NullSink()
        VidStream(estimator, SyntheticSource(5, 96, 128), sink, verbose=False,
                  pipeline_depth=pd).update()
        sinks.append(sink)
    assert sinks[0].frames_written == sinks[1].frames_written == 5
    np.testing.assert_array_equal(sinks[0].last_frame, sinks[1].last_frame)


class _CollectSink(NullSink):
    def __init__(self):
        super().__init__()
        self.frames = []

    def write(self, frame):
        super().write(frame)
        self.frames.append(np.asarray(frame).copy())


@pytest.mark.parametrize("n,k", [(7, 3), (6, 3), (5, 8)])
def test_vidstream_microbatch_equivalent(estimator, n, k):
    """microbatch=K (one batched dispatch + one K-frame fetch per tick) must
    write byte-identical frames in the same order as the per-frame loop —
    including a padded tail tick (n % k != 0) and K > n."""
    per_frame, micro = _CollectSink(), _CollectSink()
    VidStream(estimator, SyntheticSource(n, 96, 128), per_frame,
              verbose=False).update()
    vs = VidStream(estimator, SyntheticSource(n, 96, 128), micro,
                   verbose=False, microbatch=k)
    vs.update()
    assert len(micro.frames) == len(per_frame.frames) == n
    for got, want in zip(micro.frames, per_frame.frames):
        np.testing.assert_array_equal(got, want)
    # the amortized spans still cover every frame
    assert len(vs.timer.performance["depth"]) == n


def test_vidstream_microbatch_resume(estimator):
    """start_frame resume composes with the micro-batched loop."""
    full, resumed = _CollectSink(), _CollectSink()
    VidStream(estimator, SyntheticSource(6, 96, 128), full,
              verbose=False, microbatch=2).update()
    VidStream(estimator, SyntheticSource(6, 96, 128), resumed,
              verbose=False, microbatch=2, start_frame=4).update()
    assert len(resumed.frames) == 2
    np.testing.assert_array_equal(resumed.frames[-1], full.frames[-1])


class _SlowFetchArray:
    """Mimics an async device result: dispatch returns instantly, the value
    materializes only when fetched (np.asarray), after a wall-clock delay
    that accrues no process_time."""

    def __init__(self, value, delay_s):
        self._value = value
        self._delay = delay_s

    def __array__(self, dtype=None, copy=None):
        import time as _t

        _t.sleep(self._delay)
        v = self._value
        return v.astype(dtype) if dtype is not None else v


class _AsyncStubEstimator:
    def __init__(self, delay_s=0.05):
        self.delay_s = delay_s

    def predict_device(self, frame):
        return _SlowFetchArray(
            np.zeros(frame.shape[:2], np.float32), self.delay_s
        )


def test_depth_stage_times_completion_not_dispatch():
    """VERDICT r2 weak #2: the depth stage's reported time must cover the
    value fetch (frame completion), not just the async dispatch — with a
    slow-fetch stand-in the recorded spans must see the fetch delay."""
    sink = NullSink()
    est = _AsyncStubEstimator(delay_s=0.05)
    vs = VidStream(est, SyntheticSource(3, 32, 48), sink, verbose=False,
                   pipeline_depth=2)
    vs.update()
    assert sink.frames_written == 3
    spans = vs.timer.performance["depth"]
    assert len(spans) == 3
    assert min(spans) >= 0.05, f"depth stage missed the fetch: {spans}"
    # and the wall summary agrees
    assert vs.timer.summary()["depth"]["p50_ms"] >= 50.0


def test_bfloat16_estimator_close_to_f32(rng):
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        e32 = DepthEstimator("Tiny_test", verbose=False, dtype="float32")
        e16 = DepthEstimator("Tiny_test", verbose=False, dtype="bfloat16", seed=0)
    img = rng.integers(0, 256, (120, 160, 3), np.uint8)
    d32 = e32.predict(img)
    d16 = e16.predict(img)
    assert d16.dtype == np.float32  # output always comes back f32
    scale = np.abs(d32).max() + 1e-8
    assert np.abs(d32 - d16).max() / scale < 0.05


def test_predict_batch_sharded_matches_single(estimator, rng):
    from depth_estimation_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8, tp=1)
    imgs = rng.integers(0, 256, (8, 96, 128, 3), np.uint8)
    with mesh:
        sharded = estimator.predict_batch_sharded(imgs, mesh)
    single = estimator.predict_batch(imgs)
    np.testing.assert_allclose(sharded, single, atol=1e-5)


def test_stream_resume_from_frame(estimator):
    full = NullSink()
    VidStream(estimator, SyntheticSource(6, 120, 160), full, verbose=False).update()
    resumed = NullSink()
    VidStream(estimator, SyntheticSource(6, 120, 160), resumed, verbose=False, start_frame=4).update()
    assert full.frames_written == 6
    assert resumed.frames_written == 2
    np.testing.assert_array_equal(resumed.last_frame, full.last_frame)


def test_debug_mode_guards(estimator, rng, monkeypatch):
    monkeypatch.setenv("DEPTH_TPU_DEBUG", "1")
    img = rng.integers(0, 256, (64, 96, 3), np.uint8)
    out = estimator.predict(img)  # passes the guards
    assert out.shape == (64, 96)
    bad = img.astype(np.float32)
    with pytest.raises(AssertionError, match="uint8"):
        estimator.predict(bad)


class _FlakySource(SyntheticSource):
    """Fault injection: read() raises at the given frame indices (the decoder
    consumes and loses those frames), mimicking a corrupt-packet decode."""

    def __init__(self, n, h, w, fail_at=()):
        super().__init__(n, h, w)
        self.fail_at = set(fail_at)

    def read(self):
        idx = self._i
        ok, frame = super().read()
        if ok and idx in self.fail_at:
            raise RuntimeError(f"injected decode failure at frame {idx}")
        return ok, frame


def test_resilient_source_skips_and_counts_drops():
    from depth_estimation_tpu.runtime.video import ResilientSource

    src = ResilientSource(_FlakySource(10, 32, 48, fail_at=(3, 4, 7)))
    got = []
    while True:
        ok, f = src.read()
        if not ok:
            break
        got.append(f)
    assert len(got) == 7  # 10 frames minus 3 injected losses
    assert src.frames_dropped == 3


def test_resilient_source_dead_decoder_gives_up():
    from depth_estimation_tpu.runtime.video import ResilientSource

    src = ResilientSource(
        _FlakySource(100, 32, 48, fail_at=range(2, 100)), max_consecutive_drops=5
    )
    got = []
    while True:
        ok, f = src.read()
        if not ok:
            break
        got.append(f)
    assert len(got) == 2  # survived the healthy prefix
    assert src.frames_dropped == 6  # 5 consecutive allowed + the fatal one


class _OverstatedMetadataSource(SyntheticSource):
    """Container header claims more frames than actually decode (common with
    cv2 CAP_PROP_FRAME_COUNT on VFR/corrupt-header files)."""

    def __init__(self, n, h, w, claimed):
        super().__init__(n, h, w)
        self.frame_count = float(claimed)


class _CleanFalseGapSource(SyntheticSource):
    """read() returns a clean (False, None) at the given indices but keeps
    decoding afterwards — cv2's behavior for a corrupt-but-recoverable frame."""

    def __init__(self, n, h, w, gap_at=()):
        super().__init__(n, h, w)
        self.gap_at = set(gap_at)
        self._served = 0

    def read(self):
        if self._served in self.gap_at:
            self.gap_at.discard(self._served)
            self._served += 1
            return False, None
        self._served += 1
        return super().read()


def _drain(src):
    got = []
    while True:
        ok, f = src.read()
        if not ok:
            return got
        got.append(f)


def test_resilient_source_no_phantom_drops_at_clean_eof():
    """Metadata overstating the frame total must NOT produce drop counts at
    a clean EOF: drops are only committed when a later read succeeds."""
    from depth_estimation_tpu.runtime.video import ResilientSource

    src = ResilientSource(_OverstatedMetadataSource(8, 32, 48, claimed=250))
    assert len(_drain(src)) == 8
    assert src.frames_dropped == 0


def test_resilient_source_counts_midstream_clean_false_gap():
    """A clean-False read followed by a successful one is a real decode gap
    and IS counted as a drop."""
    from depth_estimation_tpu.runtime.video import ResilientSource

    src = ResilientSource(_CleanFalseGapSource(10, 32, 48, gap_at=(3,)), retries=2)
    assert len(_drain(src)) == 10
    assert src.frames_dropped == 1


def test_vidstream_survives_decode_failures(estimator, capsys, monkeypatch, tmp_path):
    log = tmp_path / "log.jsonl"
    monkeypatch.setenv("DEPTH_TPU_LOG_JSON", str(log))
    sink = NullSink()
    vs = VidStream(estimator, _FlakySource(8, 120, 160, fail_at=(2, 5)), sink)
    vs.update()
    assert sink.frames_written == 6
    assert "Dropped 2 undecodable frames." in capsys.readouterr().out
    import json

    end = [json.loads(l) for l in log.read_text().splitlines()][-1]
    assert end["event"] == "stream_end"
    assert end["frames_dropped"] == 2


def test_json_logging(estimator, tmp_path, monkeypatch):
    log = tmp_path / "log.jsonl"
    monkeypatch.setenv("DEPTH_TPU_LOG_JSON", str(log))
    VidStream(estimator, SyntheticSource(3, 120, 160), NullSink(), verbose=False).update()
    import json

    lines = [json.loads(l) for l in log.read_text().splitlines()]
    assert lines[-1]["event"] == "stream_end"
    assert lines[-1]["frames"] == 3


class _ReadyAtArray:
    """Device-handle stand-in whose value becomes ready at an absolute
    time; fetching earlier blocks until then (async-dispatch model)."""

    def __init__(self, value, ready_at):
        self._value = value
        self._ready_at = ready_at

    def __array__(self, dtype=None, copy=None):
        import time as _t

        d = self._ready_at - _t.perf_counter()
        if d > 0:
            _t.sleep(d)
        v = self._value
        return v.astype(dtype) if dtype is not None else v


class _QueuedDeviceStub:
    """Serialized-device model: each dispatched program takes device_s on
    the (single) device queue; values are ready when their program ends."""

    def __init__(self, device_s=0.05):
        self.device_s = device_s
        self._free_at = 0.0

    def predict_device(self, frame):
        import time as _t

        self._free_at = max(_t.perf_counter(), self._free_at) + self.device_s
        return _ReadyAtArray(
            np.zeros(frame.shape[:2], np.float32), self._free_at
        )


def test_depth_stage_fps_truthful_under_pipelining():
    """Overlapping in-flight spans must not multiply-count device time:
    with pipeline_depth=2 on a serialized device taking T per frame, the
    raw dispatch→fetch span of every steady-state frame is ~2T, but frames
    COMPLETE every T — record_completion's clamp must report ~T so the
    reference-format `1 // median` FPS states real throughput."""
    from statistics import median as _median

    T = 0.05
    sink = NullSink()
    vs = VidStream(_QueuedDeviceStub(device_s=T), SyntheticSource(6, 32, 48),
                   sink, verbose=False, pipeline_depth=2)
    vs.update()
    spans = vs.timer.performance["depth"]
    assert sink.frames_written == 6 and len(spans) == 6
    assert _median(spans) < 1.5 * T, f"overlap double-counted: {spans}"
    assert _median(spans) >= 0.5 * T, f"span misses device time: {spans}"


def test_fused_log_frame_numbers_match_under_pipelining(tmp_path, monkeypatch):
    """Per-frame JSON records must carry the number of the frame whose
    outputs were fetched, not the already-advanced read counter (the
    pipelined loop keeps pipeline_depth frames in flight)."""
    import json

    from depth_estimation_tpu.runtime.stream import FusedVidStream

    log = tmp_path / "frames.jsonl"
    monkeypatch.setenv("DEPTH_TPU_LOG_JSON", str(log))
    from tests.test_fused_iris import _make_detector

    det, face = _make_detector()
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        est = DepthEstimator("Tiny_test", verbose=False)
    vs = FusedVidStream(est, det, face, SyntheticSource(5, 120, 160),
                        NullSink(), verbose=False, pipeline_depth=2)
    vs.stream()
    ns = [json.loads(l)["n"] for l in log.read_text().splitlines()
          if json.loads(l)["event"] == "frame"]
    assert ns == [1, 2, 3, 4, 5], ns
