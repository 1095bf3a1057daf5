"""Config system tests (presets / merge / validate / save-load / hw adjust)."""

import pytest

from tpu3drec.core.config import (
    DEFAULT_CONFIG, PRESET_CONFIGS, create_config_from_preset, merge_configs,
    validate_config, save_config, load_config, adjust_config_for_hardware,
)


def test_presets_exist_and_valid():
    # same five presets as reference config.py:46-122
    assert set(PRESET_CONFIGS) == {"fast", "balanced", "accurate",
                                   "deep_learning", "robust"}
    for name in PRESET_CONFIGS:
        cfg = create_config_from_preset(name)
        assert validate_config(cfg) == []


def test_preset_contents_match_reference():
    bal = create_config_from_preset("balanced")
    assert bal["methods"] == ["SIFT", "ORB"]
    assert bal["max_features"] == 2000
    assert bal["matcher_config"]["SIFT"] == "flann"
    fast = create_config_from_preset("fast")
    assert fast["methods"] == ["ORB"] and fast["max_features"] == 1000


def test_merge_deep():
    out = merge_configs({"a": {"b": 1, "c": 2}, "d": 3}, {"a": {"b": 9}})
    assert out == {"a": {"b": 9, "c": 2}, "d": 3}


def test_custom_override():
    cfg = create_config_from_preset("fast", {"max_features": 123})
    assert cfg["max_features"] == 123


def test_validate_catches_problems():
    bad = {"methods": ["NOPE"], "max_features": -1, "combine_strategy": "??",
           "matcher_config": {"SIFT": "magic"}}
    probs = validate_config(bad)
    assert len(probs) == 4


def test_unknown_preset_raises():
    with pytest.raises(ValueError):
        create_config_from_preset("warp9")


def test_save_load_roundtrip(tmp_path):
    cfg = create_config_from_preset("accurate")
    p = tmp_path / "cfg.json"
    save_config(cfg, p)
    assert load_config(p) == cfg


def test_hardware_adjust_drops_deep_methods():
    cfg = create_config_from_preset("deep_learning")
    out = adjust_config_for_hardware(cfg, have_deep_weights=False)
    assert out["methods"] == ["SIFT"]  # fallback (reference config.py:499-563)
    keep = adjust_config_for_hardware(cfg, have_deep_weights=True)
    assert keep["methods"] == ["SuperPoint", "DISK"]


def test_compile_cache_dir_is_host_fingerprinted():
    """Regression guard for the cross-host cache segfault: the persistent
    compile cache dir must end in a 12-hex host-CPU fingerprint so a VM
    migration lands in a fresh subdir instead of loading XLA:CPU AOT
    executables built for another machine's features (tpu3drec/__init__)."""
    import os
    import re
    import jax

    d = jax.config.jax_compilation_cache_dir
    if os.environ.get("TPU3DREC_NO_COMPILE_CACHE"):
        assert d is None
        return
    assert d, "persistent compile cache not configured"
    assert re.fullmatch(r"[0-9a-f]{12}", os.path.basename(d)), d
