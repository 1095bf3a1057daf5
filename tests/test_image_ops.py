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
