"""MultiStream batched serving: K streams, one dispatch/tick, per-stream
outputs identical to the single-stream VidStream path."""

import numpy as np
import pytest

from depth_estimation_tpu.estimator import DepthEstimator
from depth_estimation_tpu.ops.postprocess import merge_gray3
from depth_estimation_tpu.runtime.multistream import MultiStream
from depth_estimation_tpu.runtime.video import FrameSink, SyntheticSource


class CollectSink(FrameSink):
    def __init__(self):
        self.frames = []

    def write(self, frame):
        self.frames.append(frame.copy())


@pytest.fixture(scope="module")
def est():
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return DepthEstimator("MiDaS_small", verbose=False)


def test_multistream_matches_per_stream_predict(est):
    lengths = [2, 4, 3]
    sources = [SyntheticSource(n, 64, 96, seed=i) for i, n in enumerate(lengths)]
    sinks = [CollectSink() for _ in lengths]
    ms = MultiStream(est, sources, sinks, verbose=False)
    ms.run()

    assert ms.counts == lengths
    assert [len(s.frames) for s in sinks] == lengths

    # expected: the batched program on each tick's true batch, demuxed —
    # recreate the sources (deterministic) and drive the same batches
    sources2 = [SyntheticSource(n, 64, 96, seed=i) for i, n in enumerate(lengths)]
    fn = est._batched_fn((64, 96))
    batch = np.zeros((len(sources2), 64, 96, 3), np.uint8)
    alive = [True] * len(sources2)
    expected = [[] for _ in sources2]
    while any(alive):
        mask = []
        for i, s in enumerate(sources2):
            if not alive[i]:
                mask.append(False)
                continue
            ok, f = s.read()
            if not ok:
                alive[i] = False
                mask.append(False)
                continue
            batch[i] = f
            mask.append(True)
        if not any(mask):
            break
        preds = np.asarray(fn(est.params, batch))
        for i, live in enumerate(mask):
            if live:
                expected[i].append(merge_gray3(preds[i].astype(np.uint8)))

    for i in range(len(lengths)):
        assert len(sinks[i].frames) == len(expected[i])
        for got, want in zip(sinks[i].frames, expected[i]):
            np.testing.assert_array_equal(got, want)


def test_multistream_rejects_mixed_resolutions(est):
    with pytest.raises(ValueError):
        MultiStream(est, [SyntheticSource(2, 64, 96), SyntheticSource(2, 32, 48)])
    with pytest.raises(ValueError):
        MultiStream(est, [])
    with pytest.raises(ValueError):
        MultiStream(est, [SyntheticSource(2, 64, 96)], outputs=[None, None])


def test_multistream_file_sources(est, tmp_path):
    """Real video files (native C++ decode path when built, cv2 otherwise):
    per-stream outputs must equal the batched program driven on the decoded
    frames, with per-stream EOF at each file's true length."""
    import cv2

    lengths = [3, 2]
    paths = []
    rng = np.random.default_rng(7)
    for i, n in enumerate(lengths):
        p = str(tmp_path / f"s{i}.avi")
        w = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"MJPG"), 20, (96, 64))
        for _ in range(n):
            w.write(rng.integers(0, 256, (64, 96, 3), np.uint8))
        w.release()
        paths.append(p)

    sinks = [CollectSink() for _ in paths]
    ms = MultiStream(est, paths, sinks, verbose=False)
    ms.run()
    assert ms.counts == lengths
    assert [len(s.frames) for s in sinks] == lengths

    # expected: decode the same files again, drive the batched program
    from depth_estimation_tpu.runtime.video import open_source

    fn = est._batched_fn((64, 96))
    srcs = [open_source(p) for p in paths]
    batch = np.zeros((2, 64, 96, 3), np.uint8)
    expected = [[] for _ in srcs]
    alive = [True, True]
    while any(alive):
        mask = []
        for i, s in enumerate(srcs):
            if alive[i]:
                ok, f = s.read()
                if ok:
                    batch[i] = f
                    mask.append(True)
                    continue
                alive[i] = False
            mask.append(False)
        if not any(mask):
            break
        preds = np.asarray(fn(est.params, batch))
        for i, live in enumerate(mask):
            if live:
                expected[i].append(merge_gray3(preds[i].astype(np.uint8)))
    for s in srcs:
        s.release()
    for i in range(2):
        assert len(expected[i]) == lengths[i]
        for got, want in zip(sinks[i].frames, expected[i]):
            np.testing.assert_array_equal(got, want)
