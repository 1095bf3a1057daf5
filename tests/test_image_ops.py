"""Image primitive parity tests vs OpenCV (ground-truth oracle only —
cv2 is never used in the compute path)."""

import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from tpu3drec.ops import image as im


def test_rgb_to_gray_matches_cv2(test_image):
    rgb = np.stack([test_image, test_image * 0.5, test_image * 0.25], -1)
    ours = np.asarray(im.rgb_to_gray(jnp.asarray(rgb)))
    ref = cv2.cvtColor(rgb.astype(np.float32), cv2.COLOR_RGB2GRAY)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.parametrize("sigma", [0.8, 1.6, 2.5])
def test_gaussian_blur_matches_cv2(test_image, sigma):
    ours = np.asarray(im.gaussian_blur(jnp.asarray(test_image), sigma))
    r = max(1, int(np.ceil(4.0 * sigma)))
    k = 2 * r + 1
    ref = cv2.GaussianBlur(test_image, (k, k), sigma,
                           borderType=cv2.BORDER_REFLECT)
    # interior must match tightly; borders differ only by pad convention
    np.testing.assert_allclose(ours[r:-r, r:-r], ref[r:-r, r:-r],
                               atol=2e-4)


def test_sobel_matches_cv2(test_image):
    dx, dy = im.sobel_gradients(jnp.asarray(test_image))
    ref_dx = cv2.Sobel(test_image, cv2.CV_32F, 1, 0, ksize=3,
                       borderType=cv2.BORDER_REFLECT)
    ref_dy = cv2.Sobel(test_image, cv2.CV_32F, 0, 1, ksize=3,
                       borderType=cv2.BORDER_REFLECT)
    np.testing.assert_allclose(np.asarray(dx)[1:-1, 1:-1],
                               ref_dx[1:-1, 1:-1], atol=1e-4)
    np.testing.assert_allclose(np.asarray(dy)[1:-1, 1:-1],
                               ref_dy[1:-1, 1:-1], atol=1e-4)


def test_resize_shapes(test_image):
    out = im.resize(jnp.asarray(test_image), (120, 160))
    assert out.shape == (120, 160)


def test_bilinear_sample_exact_at_integers(test_image):
    pts = np.array([[10.0, 20.0], [100.0, 50.0], [319.0, 239.0]], np.float32)
    vals = np.asarray(im.bilinear_sample(jnp.asarray(test_image),
                                         jnp.asarray(pts)))
    expect = test_image[pts[:, 1].astype(int), pts[:, 0].astype(int)]
    np.testing.assert_allclose(vals, expect, atol=1e-6)


def test_warp_perspective_identity(test_image):
    H = jnp.eye(3)
    out = np.asarray(im.warp_perspective(jnp.asarray(test_image), H,
                                         test_image.shape))
    np.testing.assert_allclose(out, test_image, atol=1e-5)


def test_warp_perspective_translation(test_image):
    H = jnp.asarray(np.array([[1, 0, 5], [0, 1, 3], [0, 0, 1]], np.float32))
    out = np.asarray(im.warp_perspective(jnp.asarray(test_image), H,
                                         test_image.shape))
    np.testing.assert_allclose(out[10:100, 10:100],
                               test_image[7:97, 5:95], atol=1e-4)


# ---------------------------------------------------------------------
# band-warp stencil (round 5): sample_grid_band must be EXACT vs the
# gather form whenever plan_grid_band returns a bucket. The e2e stereo
# check (tests/test_dense.py:test_band_warp_plans_match_gather_path)
# covers one rig pose; this sweeps randomized homographies, including
# subsampled-lattice planning (the production stride-8 form,
# ops/stereo.py:plan_pair_warps) and the flipped 180-degree frames.
def _rand_homography(rng, kind):
    if kind == "translation":
        H = np.eye(3)
        H[0, 2], H[1, 2] = rng.uniform(-6, 6, 2)
    elif kind == "rotation":
        a = rng.uniform(-0.01, 0.01)  # rad, small like a rectify map
        c, s = np.cos(a), np.sin(a)
        H = np.array([[c, -s, rng.uniform(-3, 3)],
                      [s, c, rng.uniform(-3, 3)], [0, 0, 1.0]])
    else:  # mild perspective
        H = np.eye(3)
        H[0, 2], H[1, 2] = rng.uniform(-4, 4, 2)
        H[2, 0], H[2, 1] = rng.uniform(-6e-6, 6e-6, 2)
    return H.astype(np.float32)


@pytest.mark.parametrize("kind", ["translation", "rotation", "perspective"])
def test_sample_grid_band_exact_vs_gather(kind):
    # tolerance: the stencil and gather programs compute the same four
    # weighted taps but XLA's fusion/FMA association differs between
    # them — measured worst case over 400 random draws is 1 f32 ULP
    # (1.19e-7); anything beyond ~2 ULP means the band failed to cover
    # an offset (a real planner bug, thousands of ULPs)
    seed = {"translation": 0, "rotation": 1, "perspective": 2}[kind]
    rng = np.random.default_rng(seed)
    img = rng.random((120, 160), np.float32)
    planned = 0
    for trial in range(6):
        H = _rand_homography(rng, kind)
        sx, sy = im.homography_grid(jnp.asarray(H), img.shape)
        sx_np, sy_np = np.asarray(sx), np.asarray(sy)
        plan = im.plan_grid_band(sx_np, sy_np, img.shape)
        if plan is None:
            continue
        planned += 1
        by, bx, fx, fy = plan
        a = np.asarray(im.sample_grid_band(jnp.asarray(img), sx, sy,
                                           by, bx, flip_x=fx, flip_y=fy))
        b = np.asarray(im.sample_grid(jnp.asarray(img), sx, sy))
        np.testing.assert_allclose(a, b, rtol=0, atol=2.4e-7,
                                   err_msg=str((kind, trial, plan)))
    assert planned > 0, kind


def test_sample_grid_band_subsampled_lattice_plan():
    """Planning on a stride-8 lattice (production form) must still cover
    the full grid's offsets: the adaptive margin absorbs what the
    lattice can't see between samples."""
    rng = np.random.default_rng(7)
    img = rng.random((120, 160), np.float32)
    H = _rand_homography(rng, "perspective")
    sx, sy = im.homography_grid(jnp.asarray(H), img.shape)
    sx_np, sy_np = np.asarray(sx), np.asarray(sy)
    ys8 = np.arange(0, 120, 8)
    xs8 = np.arange(0, 160, 8)
    plan = im.plan_grid_band(sx_np[np.ix_(ys8, xs8)],
                             sy_np[np.ix_(ys8, xs8)], img.shape,
                             xs=xs8[None, :], ys=ys8[:, None])
    assert plan is not None
    by, bx, fx, fy = plan
    a = np.asarray(im.sample_grid_band(jnp.asarray(img), sx, sy,
                                       by, bx, flip_x=fx, flip_y=fy))
    b = np.asarray(im.sample_grid(jnp.asarray(img), sx, sy))
    np.testing.assert_allclose(a, b, rtol=0, atol=2.4e-7)


def test_sample_grid_band_flip_covers_mirrored_map():
    """A 180-degree map (Fusiello's -x baseline frames) exceeds every
    band bucket unflipped; the planner must pick flips and the flipped
    stencil must stay exact."""
    rng = np.random.default_rng(11)
    img = rng.random((96, 128), np.float32)
    h, w = img.shape
    # x' = (w-1) - x + small jitter, y' = (h-1) - y: a flipped near-identity
    H = np.array([[-1, 0, w - 1 + 1.7], [0, -1, h - 1 - 0.6],
                  [0, 0, 1]], np.float32)
    sx, sy = im.homography_grid(jnp.asarray(H), img.shape)
    plan = im.plan_grid_band(np.asarray(sx), np.asarray(sy), img.shape)
    assert plan is not None
    by, bx, fx, fy = plan
    assert fx and fy, plan
    a = np.asarray(im.sample_grid_band(jnp.asarray(img), sx, sy,
                                       by, bx, flip_x=fx, flip_y=fy))
    b = np.asarray(im.sample_grid(jnp.asarray(img), sx, sy))
    np.testing.assert_allclose(a, b, rtol=0, atol=2.4e-7)


def test_plan_grid_band_rejects_large_rotation():
    """Past the bucket ladder the planner must return None (the caller
    falls back to the gather form) rather than a lying plan."""
    rng = np.random.default_rng(13)
    img_shape = (480, 640)
    a = 0.12  # ~7 degrees at 640 px: y-offsets span ~75 px, over the ladder
    c, s = np.cos(a), np.sin(a)
    H = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    sx, sy = im.homography_grid(jnp.asarray(H), img_shape)
    assert im.plan_grid_band(np.asarray(sx), np.asarray(sy),
                             img_shape) is None
