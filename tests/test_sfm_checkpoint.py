"""SfM-stage checkpoint/resume tests (reference saved_variable.pkl
semantics, CPE/pipeline.py:529-533) and the pipeline2 refinement flag."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
from test_sfm_pipeline import make_scene

from tpu3drec.sfm import SfMPipeline
from tpu3drec.sfm.pipeline import SfMConfig
from tpu3drec.sfm.reconstruction import Reconstruction
from tpu3drec.sfm.quality import assess_reconstruction_quality


def test_reconstruction_state_roundtrip(tmp_path):
    matches_data, image_info, views, X, K, names = make_scene(n_views=3)
    recon = SfMPipeline().reconstruct(matches_data, image_info)
    p = tmp_path / "state.pkl"
    recon.save_state(p)
    back = Reconstruction.load_state(p)
    assert back.num_cameras == recon.num_cameras
    assert back.num_points == recon.num_points
    assert back.num_observations == recon.num_observations
    np.testing.assert_allclose(back.points_array(), recon.points_array())
    n0 = names[0]
    np.testing.assert_allclose(back.cameras[n0].K, recon.cameras[n0].K)


def test_sfm_checkpoint_and_resume(tmp_path):
    matches_data, image_info, views, X, K, names = make_scene(n_views=4)
    ckpt = tmp_path / "ckpt"
    pipe = SfMPipeline()
    recon = pipe.reconstruct(matches_data, image_info, checkpoint_dir=ckpt)
    assert (ckpt / "sfm_checkpoint.pkl").exists()
    assert recon.num_cameras == 4

    # resume: a fresh pipeline restarts from the checkpointed state and
    # skips two-view init
    pipe2 = SfMPipeline()
    recon2 = pipe2.reconstruct(matches_data, image_info,
                               checkpoint_dir=ckpt, resume=True)
    assert pipe2.history[0]["phase"] == "resume"
    assert recon2.num_cameras == 4
    q = assess_reconstruction_quality(recon2)
    assert q["mean_reprojection_error"] < 2.0


def test_pipeline2_refinement_flag(tmp_path):
    matches_data, image_info, views, X, K, names = make_scene(n_views=3)
    pipe = SfMPipeline(SfMConfig(use_iterative_refinement=True))
    recon = pipe.reconstruct(matches_data, image_info)
    assert recon.num_cameras == 3
    q = assess_reconstruction_quality(recon)
    assert q["mean_reprojection_error"] < 2.0


def test_orbax_checkpoint_roundtrip(tmp_path):
    """Array-native orbax checkpoint preserves the full reconstruction
    (SURVEY §5: orbax-style checkpoint of the reconstruction pytree)."""
    import numpy as np
    from tpu3drec.io.checkpoint import (load_reconstruction_orbax,
                                        save_reconstruction_orbax)
    from tpu3drec.sfm.reconstruction import Camera, Reconstruction

    rng = np.random.default_rng(0)
    recon = Reconstruction()
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    for i in range(3):
        R = np.eye(3)
        t = np.array([0.1 * i, 0.0, 0.0])
        recon.add_camera(Camera(f"im{i}.png", R, t, K, (640, 480)))
    ids = recon.add_points_batch(rng.uniform(-1, 1, (50, 3)))
    for i in range(3):
        recon.add_observations_batch(f"im{i}.png", ids[:30],
                                     rng.uniform(0, 640, (30, 2)))

    save_reconstruction_orbax(recon, tmp_path / "ckpt")
    back = load_reconstruction_orbax(tmp_path / "ckpt")

    assert sorted(back.cameras) == sorted(recon.cameras)
    np.testing.assert_allclose(back.cameras["im1.png"].t,
                               recon.cameras["im1.png"].t)
    np.testing.assert_allclose(back.points_array(), recon.points_array())
    assert len(back.observations) == len(recon.observations)
    got = sorted((c, p, tuple(np.round(uv, 6)))
                 for c, p, uv in back.observations)
    want = sorted((c, p, tuple(np.round(uv, 6)))
                  for c, p, uv in recon.observations)
    assert got == want
    # overwrite-safe: a second save to the same dir succeeds
    save_reconstruction_orbax(back, tmp_path / "ckpt")
