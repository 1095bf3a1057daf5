"""Tests: result converters, multi-method facade, correspondence manager,
CLI subcommands."""

import json
import pickle
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from tpu3drec.io.converters import (
    MethodReconstructionData, MultiMethodReconstruction,
    save_for_reconstruction, load_for_reconstruction, export_results_csv,
)
from tpu3drec.multi_method import MultiMethodFeatureDetector, create_multi_detector
from tpu3drec.sfm.correspondence import (
    CorrespondenceManager, CorrespondenceConfig, lookup_pair, diagnose_failure,
)
from tpu3drec.cli import main as cli_main


@pytest.fixture(scope="module")
def pair_images(tmp_path_factory):
    import cv2
    rng = np.random.default_rng(5)
    img = np.zeros((120, 160), np.float32)
    for _ in range(30):
        y, x = rng.integers(5, 100), rng.integers(5, 140)
        img[y:y + 14, x:x + 14] += rng.uniform(-0.5, 0.5)
    img -= img.min(); img /= img.max()
    M = cv2.getRotationMatrix2D((80, 60), 5.0, 0.97)
    warped = cv2.warpAffine(img, M, (160, 120))
    tmp = tmp_path_factory.mktemp("cli_imgs")
    for name, arr in (("a.png", img), ("b.png", warped)):
        Image.fromarray((arr * 255).astype(np.uint8)).save(tmp / name)
    return img, warped, tmp


def test_converters_roundtrip(pair_images, tmp_path):
    img, warped, _ = pair_images
    from tpu3drec.api import match_images
    from tpu3drec.core.types import MatchingResult
    r = match_images(img, warped, method="SIFT", max_features=256)
    mr = MatchingResult(results={"SIFT": r}, image1_name="a", image2_name="b")

    mm = MultiMethodReconstruction.from_matching_result(mr)
    assert "SIFT" in mm
    assert mm["SIFT"].num_correspondences == r.num_matches
    assert mm.get_best_method() == "SIFT"
    corr = mm["SIFT"].correspondences
    assert corr.shape[1] == 4

    p = save_for_reconstruction(mr, tmp_path / "recon.pkl")
    back = load_for_reconstruction(p)
    assert back["SIFT"].num_correspondences == r.num_matches
    np.testing.assert_allclose(back["SIFT"].correspondences, corr)

    mm.export_all(tmp_path)
    assert (tmp_path / "colmap_SIFT" / "matches.txt").exists()

    csv_path = export_results_csv([mr], tmp_path / "summary.csv")
    lines = csv_path.read_text().splitlines()
    assert len(lines) == 2 and "SIFT" in lines[1]


def test_multi_method_detector(pair_images):
    img, _, _ = pair_images
    det = create_multi_detector(["SIFT", "Harris", "NOPE"], max_features=128)
    assert det.skipped == ["NOPE"]
    out = det.detect_all(img)
    assert set(out) == {"SIFT", "Harris"}
    assert len(out["SIFT"]) > 10
    single = det.detect(img, "Harris")
    assert single.method == "Harris"


def test_correspondence_manager(tmp_path):
    import sys
    sys.path.insert(0, str(Path(__file__).parent))
    from test_sfm_pipeline import make_scene
    from tpu3drec.sfm import SfMPipeline
    matches_data, image_info, views, X, K, names = make_scene(n_views=3)
    pipe = SfMPipeline()
    recon = pipe.reconstruct(matches_data, image_info)

    mgr = CorrespondenceManager()
    # lookup handles reversed keys
    pair = next(iter(matches_data))
    assert lookup_pair(matches_data, pair[0], pair[1]) is not None
    rev = lookup_pair(matches_data, pair[1], pair[0])
    fwd = lookup_pair(matches_data, pair[0], pair[1])
    np.testing.assert_allclose(rev[:, :2], fwd[:, 2:])

    # finding correspondences for an already-registered image: plenty
    uv, pids, diag = mgr.find_correspondences(recon, names[2], matches_data)
    assert len(uv) >= 15
    assert diag["tolerance_used"] == 2.0

    d = diagnose_failure(recon, "unknown_img.png", matches_data)
    assert d["verdict"] == "no_connectivity"


def test_cli_pair_and_compat(pair_images, tmp_path, capsys):
    img, warped, folder = pair_images
    rc = cli_main(["pair", str(folder / "a.png"), str(folder / "b.png"),
                   "--method", "SIFT", "--max-features", "256",
                   "--viz", str(tmp_path / "m.png")])
    assert rc == 0
    out = capsys.readouterr().out
    data = json.loads(out[:out.index("visualization")])
    assert data["num_matches"] > 10
    assert (tmp_path / "m.png").exists()

    assert cli_main(["compat-matrix"]) == 0


def test_cli_match_folder_and_reconstruct(tmp_path, capsys):
    # build a small folder of shifted crops
    rng = np.random.default_rng(0)
    base = np.zeros((120, 200), np.float32)
    for _ in range(40):
        y, x = rng.integers(5, 100), rng.integers(5, 180)
        base[y:y + 12, x:x + 12] += rng.uniform(-0.5, 0.5)
    base -= base.min(); base /= base.max()
    folder = tmp_path / "imgs"
    folder.mkdir()
    for i in range(4):
        crop = base[:, i * 8:i * 8 + 160]
        Image.fromarray((crop * 255).astype(np.uint8)).save(
            folder / f"f_{i:02d}.png")
    out = tmp_path / "out"
    rc = cli_main(["match-folder", str(folder), str(out),
                   "--preset", "fast", "--max-features", "512"])
    assert rc == 0
    assert (out / "batch_summary.json").exists()
    assert (out / "progress.json").exists()
    summary = json.loads(capsys.readouterr().out)
    assert summary["stats"]["completed"] == 3


def test_visualization_data_and_result_converter(tmp_path):
    """ResultConverter facade (result_converters.py:605-783) +
    VisualizationData (:27-189)."""
    import cv2
    import numpy as np
    from tpu3drec.bench.synthetic import SyntheticImageGenerator
    from tpu3drec.io.converters import ResultConverter, VisualizationData
    from tpu3drec.pipelines.matching import create_pipeline

    img = SyntheticImageGenerator(seed=3).generate(320, 240)
    M = cv2.getRotationMatrix2D((160, 120), 5.0, 1.0)
    warped = cv2.warpAffine(img, M, (320, 240))
    res = create_pipeline("fast").match(img, warped)

    vd = ResultConverter.to_visualization(res, img, warped)
    assert isinstance(vd, VisualizationData)
    assert vd.num_methods >= 1
    for m in vd.methods:
        assert vd.keypoints1[m].shape[1] == 2
        assert vd.matches[m].shape[1] == 2
    fig = vd.plot()
    assert fig is not None

    # no images -> ValueError (reference's :127 precedence bug, fixed)
    vd2 = ResultConverter.to_visualization(res)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        vd2.plot()

    rec = ResultConverter.to_reconstruction(res)
    assert rec.get_best_method() in vd.methods
