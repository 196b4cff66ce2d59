"""Native (C++) framepipe tests: build, parity with Python sources,
zero-copy borrow protocol, writer round-trip."""

import numpy as np
import pytest

from depth_estimation_tpu.runtime import native
from depth_estimation_tpu.runtime.video import SyntheticSource

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason=f"native framepipe unavailable: {native.native_load_error()}"
)


@pytest.mark.parametrize("n_frames", [6, 200])  # 200 wraps the depth-4 ring many times
def test_native_synthetic_matches_python(n_frames):
    ns = native.NativeSource(f"synthetic:{n_frames}x48x64")
    ps = SyntheticSource(n_frames, 48, 64)
    assert (ns.width, ns.height, ns.frame_count) == (64, 48, float(n_frames))
    n = 0
    while True:
        ok_n, fn_ = ns.read()
        ok_p, fp_ = ps.read()
        assert ok_n == ok_p
        if not ok_n:
            break
        np.testing.assert_array_equal(fn_, fp_)
        n += 1
    assert n == n_frames
    ns.release()


def test_native_borrow_protocol():
    ns = native.NativeSource("synthetic:3x32x32")
    seen = 0
    while True:
        slot, view = ns.read_borrowed()
        if slot < 0:
            break
        assert view.shape == (32, 32, 3)
        copied = view.copy()
        ns.release_slot(slot)
        seen += 1
        assert copied.dtype == np.uint8
    assert seen == 3
    ns.release()


def test_native_video_file_roundtrip(tmp_path):
    """Write frames with NativeSink, read them back with NativeSource."""
    import time

    path = str(tmp_path / "roundtrip.avi")
    sink = native.NativeSink(path, (64, 48), fps=20.0)
    src_frames = []
    ps = SyntheticSource(5, 48, 64)
    while True:
        ok, f = ps.read()
        if not ok:
            break
        src_frames.append(f)
        sink.write(f)
    # writer is async; wait for drain then close
    for _ in range(100):
        if sink.frames_written() == 5:
            break
        time.sleep(0.02)
    assert sink.frames_written() == 5
    sink.release()

    back = native.NativeSource(path)
    assert back.is_opened()
    assert (back.width, back.height) == (64, 48)
    count = 0
    while True:
        ok, f = back.read()
        if not ok:
            break
        # MJPG is lossy; frames should still be close
        assert f.shape == (48, 64, 3)
        err = np.abs(f.astype(int) - src_frames[count].astype(int)).mean()
        assert err < 12.0, err
        count += 1
    assert count == 5
    back.release()


def test_native_missing_file_reports_closed():
    ns = native.NativeSource("/nonexistent/nope.mp4")
    assert not ns.is_opened()
    ok, f = ns.read()
    assert not ok and f is None


def test_open_source_prefers_native():
    from depth_estimation_tpu.runtime.video import open_source

    s = open_source("synthetic:2x16x16")
    assert isinstance(s, native.NativeSource)
    s2 = open_source("synthetic:2x16x16", prefer_native=False)
    assert isinstance(s2, SyntheticSource)


