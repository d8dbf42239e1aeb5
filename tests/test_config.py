"""Config system: reference configs/*.json load unmodified."""

import glob

import pytest

from gsmpm_tpu.config import SimConfig

REF_CONFIGS = sorted(glob.glob("/root/reference/configs/*.json"))


@pytest.mark.parametrize("path", REF_CONFIGS, ids=lambda p: p.split("/")[-1])
def test_reference_configs_load(path):
    cfg = SimConfig.from_json(path)
    assert cfg.mpm.n_grid > 0
    assert cfg.mpm.steps_per_frame == int(cfg.mpm.frame_dt / cfg.mpm.substep_dt)
    assert len(cfg.mpm.sim_area) == 2


def test_lego_values():
    cfg = SimConfig.from_json("/root/reference/configs/lego.json")
    assert cfg.mpm.E == 2e5
    assert cfg.mpm.substep_dt == 1e-4
    assert cfg.mpm.steps_per_frame == 100
    assert cfg.render.num_frames == 245
    assert cfg.render.white_background  # from model section
    assert len(cfg.mpm.boundary_conditions) == 3
    imp = [b for b in cfg.mpm.boundary_conditions if b.type == "impulse"][0]
    assert imp.force == [-0.8, 0.0, 0.0]


def test_cli_override():
    cfg = SimConfig.from_json("/root/reference/configs/lego.json")
    cfg2 = cfg.override_from_args(["--n_grid", "64", "--output_path", "/tmp/x"])
    assert cfg2.mpm.n_grid == 64
    assert cfg2.render.output_path == "/tmp/x"
    assert cfg.mpm.n_grid == 50  # original untouched


def test_defaults_match_reference():
    # Parity: /root/reference/arguments/__init__.py:47-78
    cfg = SimConfig()
    assert cfg.mpm.E == 2e6 and cfg.mpm.nu == 0.4
    assert cfg.mpm.substep_dt == 0.0006 and cfg.mpm.frame_dt == 0.03
    assert cfg.mpm.steps_per_frame == 50
    assert cfg.mpm.gravity == [0.0, -9.81, 0.0]
