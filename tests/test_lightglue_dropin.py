"""The full LightGlue weight-drop-in loop (VERDICT r2 #3).

A random torch-mirror checkpoint file goes through
convert_torch_checkpoint -> lightglue.npz in the weights dir, and the
pipeline then actually routes matching through LightGlue end-to-end
(MethodResult.matcher_used == "lightglue"). Without weights the kNN
substitution must be RECORDED in the result, not silent
(reference semantics: feature_matchers.py:434-540 falls back loudly).
"""

import numpy as np
import pytest
import torch

import tpu3drec.models as models_pkg
import tpu3drec.models.lightglue as lg_mod
from tpu3drec.pipelines.matching import FeatureProcessingPipeline

from test_lightglue_parity import TorchLG  # torch mirror of cvg/LightGlue


@pytest.fixture
def weights_dir(tmp_path, monkeypatch):
    wd = tmp_path / "weights"
    monkeypatch.setattr(models_pkg, "WEIGHTS_DIR", wd)
    lg_mod._LG_CACHE.clear()
    yield wd
    lg_mod._LG_CACHE.clear()


def _pipeline():
    return FeatureProcessingPipeline({
        "methods": ["SIFT"],
        "max_features": 128,
        "matcher_config": {"SIFT": "lightglue"},
    })


def _pair(test_image):
    img1 = np.asarray(test_image)
    img2 = np.roll(img1, 3, axis=1)
    return img1, img2


def test_fallback_is_recorded_when_weights_absent(weights_dir, test_image):
    img1, img2 = _pair(test_image)
    res = _pipeline().match(img1, img2, "a.png", "b.png")
    mr = res["SIFT"]
    assert mr.matcher_used.startswith("knn (lightglue fallback")
    assert mr.num_raw_matches >= 0  # kNN substitution actually ran


def test_converted_checkpoint_routes_through_lightglue(
        weights_dir, tmp_path, test_image):
    # 1. a "checkpoint" file: random torch mirror, SIFT-compatible 128-d
    # input, small dim/layers for CPU speed (architecture identical)
    torch.manual_seed(3)
    tnet = TorchLG(input_dim=128, d=64, h=4, n_layers=2).eval()
    pth = tmp_path / "superpoint_lightglue.pth"
    torch.save(tnet.state_dict(), pth)

    # 2. convert: derives dim/n_layers from the state dict, lands
    # lightglue.npz + meta in the weights dir
    lg_mod.convert_torch_checkpoint(pth)
    assert (weights_dir / "lightglue.npz").exists()
    data = np.load(weights_dir / "lightglue.npz", allow_pickle=True)
    assert list(data["meta"][:3]) == [64, 2, 4]

    # 3. the pipeline now executes LightGlue (weights are random, so
    # match QUALITY is meaningless — the routing is the assertion)
    img1, img2 = _pair(test_image)
    res = _pipeline().match(img1, img2, "a.png", "b.png")
    mr = res["SIFT"]
    assert mr.matcher_used == "lightglue"
    assert mr.matches.method == "lightglue"
    assert not getattr(mr, "error", None)
