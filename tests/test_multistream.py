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


def drive_batched(est, sources, hw):
    """Reference driver for MultiStream's semantics: read one frame per
    live source, pad dead slots with their last frame, run the batched
    program, demux live results. Returns per-source expected frame lists."""
    fn = est._batched_fn(hw)
    batch = np.zeros((len(sources), *hw, 3), np.uint8)
    alive = [True] * len(sources)
    expected = [[] for _ in sources]
    while any(alive):
        mask = []
        for i, s in enumerate(sources):
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
    for s in sources:
        s.release()
    return expected


def _assert_streams_match(sinks, expected, lengths):
    assert [len(e) for e in expected] == lengths
    for sink, exp in zip(sinks, expected):
        assert len(sink.frames) == len(exp)
        for got, want in zip(sink.frames, exp):
            np.testing.assert_array_equal(got, want)


def test_multistream_matches_per_stream_predict(est):
    lengths = [2, 4, 3]
    sources = [SyntheticSource(n, 64, 96, seed=i) for i, n in enumerate(lengths)]
    sinks = [CollectSink() for _ in lengths]
    ms = MultiStream(est, sources, sinks, verbose=False)
    ms.run()
    assert ms.counts == lengths

    # deterministic sources: recreate and drive the same batches
    sources2 = [SyntheticSource(n, 64, 96, seed=i) for i, n in enumerate(lengths)]
    expected = drive_batched(est, sources2, (64, 96))
    _assert_streams_match(sinks, expected, lengths)


def drive_microbatched(est, sources, hw, M):
    """Mirror driver for MultiStream(microbatch=M): read up to M frames per
    live stream per tick into a (K*M,...) batch (stream-major), pad short
    slots with the last frame, run the batched program, demux valid
    results per stream."""
    fn = est._batched_fn(hw, output="u8")
    K = len(sources)
    batch = np.zeros((K * M, *hw, 3), np.uint8)
    alive = [True] * K
    expected = [[] for _ in sources]
    while any(alive):
        valid = []
        for i, s in enumerate(sources):
            m = 0
            if alive[i]:
                while m < M:
                    ok, f = s.read()
                    if not ok:
                        alive[i] = False
                        break
                    batch[i * M + m] = f
                    m += 1
            if 0 < m < M:
                batch[i * M + m:(i + 1) * M] = batch[i * M + m - 1]
            valid.append(m)
        if not any(valid):
            break
        preds = np.asarray(fn(est.params, batch))
        for i, m in enumerate(valid):
            for j in range(m):
                expected[i].append(merge_gray3(preds[i * M + j]))
    for s in sources:
        s.release()
    return expected


@pytest.mark.parametrize(
    "M", [2, pytest.param(4, marks=pytest.mark.full)]
)
def test_multistream_microbatch_matches_driver(est, M):
    """microbatch=M must write the same per-stream frames in order —
    including streams ending mid-tick (lengths not multiples of M) and a
    stream shorter than one tick."""
    lengths = [5, 3, 1]
    sources = [SyntheticSource(n, 64, 96, seed=i) for i, n in enumerate(lengths)]
    sinks = [CollectSink() for _ in lengths]
    ms = MultiStream(est, sources, sinks, verbose=False, microbatch=M)
    ms.run()
    assert ms.counts == lengths

    sources2 = [SyntheticSource(n, 64, 96, seed=i) for i, n in enumerate(lengths)]
    expected = drive_microbatched(est, sources2, (64, 96), M)
    _assert_streams_match(sinks, expected, lengths)


def test_multistream_rejects_bad_configs(est):
    # mixed resolutions are SUPPORTED via bucketing (see
    # test_multistream_mixed_resolutions); only structural errors reject
    with pytest.raises(ValueError):
        MultiStream(est, [])
    with pytest.raises(ValueError):
        MultiStream(est, [SyntheticSource(2, 64, 96)], outputs=[None, None])


def test_multistream_file_sources(est, tmp_path):
    """Real video files (native C++ decode path when built, cv2 otherwise):
    per-stream outputs must equal the batched program driven on the decoded
    frames, with per-stream EOF at each file's true length."""
    import cv2

    from depth_estimation_tpu.runtime.video import open_source

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

    # expected: decode the same files again through the same source stack
    expected = drive_batched(est, [open_source(p) for p in paths], (64, 96))
    _assert_streams_match(sinks, expected, lengths)


@pytest.mark.parametrize(
    "M", [1, pytest.param(2, marks=pytest.mark.full)]
)
def test_multistream_mixed_resolutions(est, M):
    """Streams at different resolutions are served via per-(H,W) bucketing
    — each bucket batches into its own compiled program, per-stream outputs
    must equal a uniform-resolution run of just that bucket's streams."""
    lengths = [3, 2, 4]
    mk = lambda: [SyntheticSource(lengths[0], 64, 96, seed=0),
                  SyntheticSource(lengths[1], 48, 64, seed=1),
                  SyntheticSource(lengths[2], 64, 96, seed=2)]
    sinks = [CollectSink() for _ in lengths]
    ms = MultiStream(est, mk(), sinks, verbose=False, microbatch=M)
    ms.run()
    assert ms.counts == lengths
    assert len(ms.buckets) == 2

    # expected: drive each resolution bucket exactly as a uniform fleet
    srcs = mk()
    exp_a = drive_microbatched(est, [srcs[0], srcs[2]], (64, 96), M)
    exp_b = drive_microbatched(est, [srcs[1]], (48, 64), M)
    expected = [exp_a[0], exp_b[0], exp_a[1]]
    _assert_streams_match(sinks, expected, lengths)
