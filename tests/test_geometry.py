"""Geometry parity tests.

Oracle: the reference's own ``face.py`` (numpy/math only, so it imports
cleanly without torch/mediapipe). Our FaceDet must match it numerically,
including its quirks (transposed depth indexing, asymmetric clamping).
"""

import importlib.util
import math
import sys

import numpy as np
import pytest

from depth_estimation_tpu.config import CARD
from depth_estimation_tpu.geometry import triangle
from depth_estimation_tpu.geometry.face import FaceDet

REF_FACE = "/root/reference/face.py"


def _load_reference_facedet():
    spec = importlib.util.spec_from_file_location("_ref_face", REF_FACE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.FaceDet


RefFaceDet = _load_reference_facedet()


def make_pair():
    ours = FaceDet(20, list(CARD))
    ref = RefFaceDet(20, list(CARD))
    return ours, ref


def test_calibration_matches_reference():
    ours, ref = make_pair()
    assert ours.w_pix == ref.w_pix
    assert ours.d_2_obj == ref.d_2_obj
    assert ours.f == ref.f


def test_s2c_dist_matches_reference():
    ours, ref = make_pair()
    for w_obj, w_pix in [(11.7, 23.0), (85.6, 170.0), (150.0, 40.5)]:
        ours.s2c_dist(w_obj, w_pix)
        ref.s2c_dist(w_obj, w_pix)
    assert ours.s2c_ds == ref.s2c_ds
    assert ours.s2c_d == ref.s2c_d


def test_get_headw_matches_reference():
    ours, ref = make_pair()
    for o in (ours, ref):
        o.l_iris = {"center": (100.0, 120.0), "radius": 11.5}
    ours.get_headw((90, 200), (260, 210))
    ref.get_headw((90, 200), (260, 210))
    assert ours.head_w == ref.head_w
    assert ours.head_measurements == ref.head_measurements


def test_get_depth_faithful_matches_reference_quirks(rng):
    """The reference indexes img[x, y] (transposed) and clamps l's y with
    r's y (face.py:99-107). Faithful mode must reproduce this bit-for-bit."""
    img = rng.random((480, 640)).astype(np.float32)
    ours, ref = make_pair()
    for o in (ours, ref):
        o.mesh = np.zeros((478, 2), dtype=int)  # anything non-None
        o.l_iris = {"center": (300.7, 250.3), "radius": 10.0}
        o.r_iris = {"center": (400.2, 251.9), "radius": 10.0}
    ours.get_depth(img)
    ref.get_depth(img)
    assert ours.ri_depth == ref.ri_depth

    # out-of-range center exercises the clamp path
    ours2, ref2 = make_pair()
    for o in (ours2, ref2):
        o.mesh = np.zeros((478, 2), dtype=int)
        o.l_iris = {"center": (700.0, 300.0), "radius": 10.0}
        o.r_iris = {"center": (500.0, 310.0), "radius": 10.0}
    ours2.get_depth(img)
    ref2.get_depth(img)
    assert ours2.ri_depth == ref2.ri_depth


def test_get_depth_body_fallback_matches_reference(rng):
    img = rng.random((480, 640)).astype(np.float32)
    ours, ref = make_pair()
    for o in (ours, ref):
        o.mesh = None
        o.head_pts = ((120, 130), (140, 135))
    ours.get_depth(img)
    ref.get_depth(img)
    assert ours.ri_depth == ref.ri_depth


def test_rel2abs_and_errors_match_reference(rng):
    ours, ref = make_pair()
    depths = rng.random(20) * 900 + 30
    for o in (ours, ref):
        for d in depths:
            o.ri_depth = d
            o.rel2abs()
            o.s2c_ds.append(d * 1.1 + 3)
    assert ours.abs_depths == ref.abs_depths
    assert math.isclose(ours.rmse(), ref.rmse())
    assert math.isclose(ours.mae(), ref.mae())


def test_rel2abs_2_lstsq_matches_reference(rng):
    ours, ref = make_pair()
    gt = (rng.random(30) * 500 + 50).tolist()
    pred = [(1.0 / g) * 123.4 + 5.6 + rng.normal(0, 0.01) for g in gt]
    for o in (ours, ref):
        o.ri_depth = pred[-1]
    ours.rel2abs_2(pred, gt)
    ref.rel2abs_2(pred, gt)
    assert math.isclose(ours.m, ref.m)
    assert math.isclose(ours.b, ref.b)
    assert ours.abs_depth == ref.abs_depth


def test_unit_converters_match_reference():
    ours, ref = make_pair()
    for v in [0.0, 1.0, 2.54, 100.0, 1234.5]:
        assert ours.mm2cm(v) == ref.mm2cm(v)
        assert ours.cm_to_ft(v) == ref.cm_to_ft(v)
        assert ours.in_to_mm(v) == ref.in_to_mm(v)
        assert ours.diameter(v) == ref.diameter(v)
    assert ours.dist_euclid((1, 2), (4, 6)) == ref.dist_euclid((1, 2), (4, 6))


def test_triangle_free_functions():
    # depth_by_detection.py:142-158 semantics
    f = triangle.f_length(508.0, 82.6, 170.026)
    assert math.isclose(f, 508.0 * 170.026 / 82.6)
    assert math.isclose(triangle.s2c_dist(f, 11.7, 23.0), f * 11.7 / 23.0)
    assert triangle.cm_to_ft(30.48) == 1.0
    assert triangle.in_to_mm(20) == 508.0
    assert triangle.diameter(11.5) == 23


# -- property tests (SURVEY.md §4: round-trip converters, lstsq recovery) -----

def test_unit_converter_roundtrips(rng):
    f = FaceDet(20, list(CARD))
    for v in rng.random(50) * 1000:
        # mm -> cm -> mm is exact scaling
        assert math.isclose(f.mm2cm(v) * 10, v)
        # inches -> mm uses the exact 25.4 factor (rounded to 2 decimals)
        assert abs(f.in_to_mm(v) - v * 25.4) <= 0.005 + 1e-9
        # cm -> ft inverse within rounding resolution
        assert abs(f.cm_to_ft(v) * 2.54 * 12 - v) <= 0.005 * 2.54 * 12 + 1e-9


def test_rel2abs_2_recovers_exact_line(rng):
    f = FaceDet(20, list(CARD))
    m_true, b_true = 321.5, -7.25
    gt = (rng.random(40) * 400 + 20).tolist()
    pred = [m_true / g + b_true for g in gt]
    f.ri_depth = pred[0]
    f.rel2abs_2(pred, gt)
    assert math.isclose(f.m, m_true, rel_tol=1e-9)
    assert math.isclose(f.b, b_true, rel_tol=1e-6)


def test_config_constants_match_reference_source():
    """The config defaults must literally match the reference constants."""
    from depth_estimation_tpu import config as C

    ref_face = open(REF_FACE).read()
    assert f"self.w_card = {C.CREDIT_CARD_WIDTH_MM}" in ref_face
    assert f"self.w_iris = {C.IRIS_DIAMETER_MM}" in ref_face
    ref_det = open("/root/reference/detectors.py").read()
    assert f"self.CARD = {list(C.CARD)}" in ref_det
    assert f"self.LEFT_IRIS = {list(C.LEFT_IRIS)}" in ref_det
    assert f"self.HEAD = {list(C.HEAD)}" in ref_det
    ref_dbd = open("/root/reference/depth_by_detection.py").read()
    assert f"w_object={C.CARD_WIDTH_MM_DETECTION_PIPELINE}" in ref_dbd
