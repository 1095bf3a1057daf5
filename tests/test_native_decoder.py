"""Native C++ decoder tests: parity with PIL, resize, batch path in the
image loader."""

import numpy as np
import pytest
from PIL import Image

from tpu3drec.io import native_decoder as nd
from tpu3drec.io.images import scan_folder_metadata, BatchImageLoader


@pytest.fixture(scope="module")
def image_folder(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("nimgs")
    rng = np.random.default_rng(0)
    for i in range(4):
        arr = (rng.random((60 + 4 * i, 80)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(tmp / f"g_{i}.png")
        Image.fromarray(np.stack([arr] * 3, -1)).save(
            tmp / f"c_{i}.jpg", quality=95)
    return tmp


def test_native_available():
    assert nd.available(), "native decoder failed to build/load"


def test_image_size(image_folder):
    h, w = nd.image_size(image_folder / "g_0.png")
    assert (h, w) == (60, 80)


def test_png_decode_matches_pil(image_folder):
    p = image_folder / "g_1.png"
    ref = np.asarray(Image.open(p).convert("L"), np.float32) / 255.0
    out = nd.decode_batch([p], [ref.shape])[0]
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_jpeg_decode_close_to_pil(image_folder):
    p = image_folder / "c_2.jpg"
    ref = np.asarray(Image.open(p).convert("L"), np.float32) / 255.0
    out = nd.decode_batch([p], [ref.shape])[0]
    # JPEG luma paths differ slightly between decoders
    assert np.abs(out - ref).mean() < 0.01


def test_batch_resize(image_folder):
    metas = scan_folder_metadata(image_folder)
    paths = [m.path for m in metas]
    sizes = [(m.height, m.width) for m in metas]
    outs = nd.decode_batch(paths, sizes, resize_to=(32, 48), n_threads=4)
    assert all(o is not None and o.shape == (32, 48) for o in outs)


def test_bad_path_reports_failure(image_folder):
    outs = nd.decode_batch([image_folder / "nope.png"], [(10, 10)])
    assert outs[0] is None


def test_loader_uses_native_path(image_folder):
    loader = BatchImageLoader(resize_to=(40, 50))
    metas = scan_folder_metadata(image_folder)
    out = loader.load_batch(metas)
    assert len(out) == 8
    assert all(v.shape == (40, 50) for v in out.values())


def test_resize_parity_on_smooth_image(tmp_path):
    """Bilinear (native) vs PIL antialiased resize agree on smooth content
    (noise images legitimately diverge between resampling filters)."""
    yy, xx = np.mgrid[0:120, 0:160].astype(np.float32)
    smooth = (0.5 + 0.4 * np.sin(xx / 25) * np.cos(yy / 20))
    p = tmp_path / "smooth.png"
    Image.fromarray((smooth * 255).astype(np.uint8)).save(p)
    out = nd.decode_batch([p], [(120, 160)], resize_to=(60, 80))[0]
    from tpu3drec.io.images import _read_image
    ref = _read_image(p, (60, 80))
    assert np.abs(out - ref).mean() < 0.01
