"""Golden tests for ORB extraction: FAST vs OpenCV, BRIEF/IC-angle vs
independent numpy transcriptions of the reference formulas (SURVEY.md §4.1)."""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam_mapsave_tpu.ops import orb
from orbslam_mapsave_tpu.ops.orb_pattern import BIT_PATTERN_31


@pytest.fixture(scope="module")
def test_image(rng=None):
    rng = np.random.default_rng(7)
    img = rng.uniform(0, 255, (120, 160)).astype(np.float32)
    # smooth a bit so corners aren't pure noise
    img = cv2.GaussianBlur(img, (5, 5), 1.0)
    return img


def test_umax_matches_reference_values():
    # values from running the reference ctor algorithm (ORBextractor.cc:452-468)
    assert list(orb.compute_umax()) == [15, 15, 15, 15, 14, 14, 14, 13, 13, 12, 11, 10, 9, 8, 6, 3]


def test_fast_matches_opencv(test_image):
    th = 20
    score = np.asarray(orb.fast_score_map(jnp.asarray(test_image), th))
    score = np.asarray(orb._nms3(jnp.asarray(score)))
    ours = {(x, y) for y, x in zip(*np.nonzero(score > 0))}

    det = cv2.FastFeatureDetector_create(
        threshold=th, nonmaxSuppression=True, type=cv2.FAST_FEATURE_DETECTOR_TYPE_9_16
    )
    kps = det.detect(test_image.astype(np.uint8))
    theirs = {(int(k.pt[0]), int(k.pt[1])) for k in kps}
    # allow boundary-region and NMS tie differences; require high agreement
    if len(theirs) == 0:
        pytest.skip("no cv2 corners on this image")
    inter = len(ours & theirs)
    union = len(ours | theirs)
    assert inter / union > 0.85, (len(ours), len(theirs), inter)


def _numpy_ic_angle(img_padded, x, y):
    """Independent transcription of IC_Angle (ORBextractor.cc:76-103)."""
    umax = orb.compute_umax()
    cy, cx = y + orb.EDGE, x + orb.EDGE
    m01 = m10 = 0.0
    # v = 0 row
    for u in range(-15, 16):
        m10 += u * img_padded[cy, cx + u]
    for v in range(1, 16):
        d = umax[v]
        for u in range(-d, d + 1):
            val_plus = img_padded[cy + v, cx + u]
            val_minus = img_padded[cy - v, cx + u]
            m10 += u * (val_plus + val_minus)
            m01 += v * (val_plus - val_minus)
    ang = np.degrees(np.arctan2(m01, m10))
    return ang + 360.0 if ang < 0 else ang


def test_ic_angle_matches_numpy(test_image):
    padded = np.asarray(orb.reflect101_pad(jnp.asarray(test_image), orb.EDGE))
    pts = np.array([[30, 40], [80, 60], [100, 100], [20, 20]], dtype=np.int32)
    ours = np.asarray(orb.ic_angles(jnp.asarray(padded), jnp.asarray(pts)))
    for i, (x, y) in enumerate(pts):
        expect = _numpy_ic_angle(padded, x, y)
        diff = abs(((ours[i] - expect) + 180) % 360 - 180)
        # 1e-2 deg: the prefix-sum moment formulation accumulates f32
        # rounding ~1e-3 deg; BRIEF sampling would need ~0.1 deg to move a
        # rounded sample and rotation-histogram bins are 12 deg wide.
        assert diff < 1e-2, (i, ours[i], expect)


def _numpy_brief(blurred_padded, x, y, angle_deg):
    """Independent transcription of computeOrbDescriptor
    (ORBextractor.cc:107-146)."""
    a = np.cos(np.radians(angle_deg))
    b = np.sin(np.radians(angle_deg))
    cy, cx = y + orb.EDGE, x + orb.EDGE

    def get(px, py):
        r = int(np.round(px * b + py * a))
        c = int(np.round(px * a - py * b))
        return blurred_padded[cy + r, cx + c]

    desc = np.zeros(32, np.uint8)
    for i in range(256):
        x0, y0, x1, y1 = BIT_PATTERN_31[i]
        bit = 1 if get(x0, y0) < get(x1, y1) else 0
        desc[i // 8] |= bit << (i % 8)
    return desc


def test_brief_matches_numpy(test_image):
    padded = orb.reflect101_pad(jnp.asarray(test_image), orb.EDGE)
    blurred = np.asarray(orb.gaussian_blur7(padded))
    pts = np.array([[30, 40], [80, 60], [100, 100]], dtype=np.int32)
    angles = np.array([0.0, 37.5, 291.0], dtype=np.float32)
    ours = np.asarray(
        orb.brief_descriptors(jnp.asarray(blurred), jnp.asarray(pts), jnp.asarray(angles))
    )
    for i, (x, y) in enumerate(pts):
        expect = _numpy_brief(blurred, x, y, angles[i])
        # float rounding at exact .5 boundaries can flip isolated samples;
        # require at most 2 differing bits out of 256
        diff_bits = bin(
            int.from_bytes(bytes(ours[i]), "little")
            ^ int.from_bytes(bytes(expect), "little")
        ).count("1")
        assert diff_bits <= 2, (i, diff_bits)


def test_blur_matches_opencv(test_image):
    ours = np.asarray(orb.gaussian_blur7(jnp.asarray(test_image)))
    theirs = cv2.GaussianBlur(
        test_image, (7, 7), 2.0, borderType=cv2.BORDER_REPLICATE
    )
    # interiors must agree to float tolerance
    np.testing.assert_allclose(ours[4:-4, 4:-4], theirs[4:-4, 4:-4], atol=1e-3)


def test_extract_end_to_end(synthetic_tum):
    from orbslam_mapsave_tpu.io import dataset

    ds = dataset.TUMDataset(synthetic_tum["root"])
    _, gray, _ = ds[0]
    spec = orb.ORBSpec.create(480, 640, n_features=1000, n_levels=4,
                              scale_factor=1.5, max_kp=1024)
    run = orb.make_extractor(spec)
    kp = run(jnp.asarray(gray))
    valid = np.asarray(kp["valid"])
    assert valid.sum() > 400, valid.sum()
    xy = np.asarray(kp["xy"])[valid]
    assert xy[:, 0].min() >= 0 and xy[:, 0].max() < 640
    assert xy[:, 1].min() >= 0 and xy[:, 1].max() < 480
    octv = np.asarray(kp["octave"])[valid]
    assert set(np.unique(octv)) == {0, 1, 2, 3}
    # descriptors should be non-trivial and distinct
    desc = np.asarray(kp["desc"])[valid]
    assert len(np.unique(desc, axis=0)) > 0.9 * len(desc)
    # spatial spread: keypoints should cover most of the image quadrants
    qx = (xy[:, 0] > 320).astype(int) * 2 + (xy[:, 1] > 240).astype(int)
    assert len(np.unique(qx)) == 4


def test_extract_respects_mask(synthetic_tum):
    from orbslam_mapsave_tpu.io import dataset

    ds = dataset.TUMDataset(synthetic_tum["root"])
    _, gray, _ = ds[0]
    spec = orb.ORBSpec.create(480, 640, n_features=500, n_levels=2, max_kp=512)
    mask = np.ones((480, 640), np.float32)
    mask[:, 320:] = 0.0  # mask out right half (human-mask hook)
    kp = orb.extract(spec, jnp.asarray(gray), jnp.asarray(mask))
    valid = np.asarray(kp["valid"])
    xy = np.asarray(kp["xy"])[valid]
    assert valid.sum() > 50
    assert (xy[:, 0] < 322).all()
