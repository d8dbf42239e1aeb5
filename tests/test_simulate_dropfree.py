"""Product forward render is drop-free: when the default rasterizer caps
overflow, apps/simulate.py measures the needed caps at the offending
frame's geometry, resizes, and re-renders the same frame before saving
(VERDICT r4 item 3; parity: the reference renders every frame uncapped,
/root/reference/main.py:148-156)."""

import dataclasses

import numpy as np

from gsmpm_tpu.config import SimConfig


import pytest

# quick-tier CI runs `-m "not slow"` (README); the full suite stays
# the release gate
pytestmark = pytest.mark.slow


def test_simulate_resizes_caps_to_dropfree(tmp_path, capsys):
    from gsmpm_tpu.apps.simulate import simulate

    cfg = SimConfig.from_json("/root/reference/configs/lego.json")
    cfg = dataclasses.replace(
        cfg,
        mpm=dataclasses.replace(cfg.mpm, n_grid=24),
        render=dataclasses.replace(
            cfg.render, output_path=str(tmp_path / "out"), num_frames=2
        ),
    )
    # a dense synthetic blob at tiny caps: every block overflows k_block
    import gsmpm_tpu.apps.simulate as sim_mod
    from gsmpm_tpu.render.renderer import RasterConfig

    orig = sim_mod.RasterConfig
    try:
        # shrink the DEFAULT caps so the 2048-gaussian scene overflows them
        sim_mod.RasterConfig = lambda: orig(k_row=256, k_block=64)
        simulate(cfg, synthetic=2048, frames=2, quiet=False,
                 synthetic_res=256)
    finally:
        sim_mod.RasterConfig = orig

    out = capsys.readouterr().out
    # the resize loop fired at least once...
    assert "resizing for a drop-free frame" in out
    # ...and no frame was saved truncated
    assert "still dropped after cap rebuilds" not in out
    imgs = sorted((tmp_path / "out" / "images").glob("*.png"))
    assert len(imgs) == 3
    import imageio.v2 as imageio

    last = np.asarray(imageio.imread(imgs[-1]))
    assert last.std() > 0  # non-degenerate image
