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
