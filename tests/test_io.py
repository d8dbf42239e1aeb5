"""PLY round-trips, synthetic scenes, camera loading."""

import numpy as np
import pytest

from gsmpm_tpu.io.ply import (
    read_gaussian_ply,
    write_gaussian_ply,
    write_particle_ply,
    read_particle_ply,
)
from gsmpm_tpu.io.cameras import load_cameras
from gsmpm_tpu.models.gaussians import GaussianScene, search_for_max_iteration
from gsmpm_tpu.models.synthetic import synthetic_box_scene


def test_gaussian_ply_roundtrip(tmp_path):
    scene = synthetic_box_scene(n=128, seed=1)
    path = str(tmp_path / "point_cloud.ply")
    scene.save_ply(path)
    back = GaussianScene.from_ply(path)
    np.testing.assert_allclose(np.asarray(back.xyz), np.asarray(scene.xyz), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(back.features_rest), np.asarray(scene.features_rest), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(back.rotation), np.asarray(scene.rotation), rtol=1e-6
    )
    assert back.features_dc.shape == (128, 1, 3)
    assert back.features_rest.shape == (128, 15, 3)


def test_particle_ply_roundtrip(tmp_path):
    pos = np.random.default_rng(0).normal(size=(77, 3)).astype(np.float32)
    path = str(tmp_path / "parts.ply")
    write_particle_ply(path, pos)
    back = read_particle_ply(path)
    np.testing.assert_array_equal(back, pos)


def test_lfs_stub_rejected():
    with pytest.raises(FileNotFoundError, match="git-lfs stub"):
        read_gaussian_ply(
            "/root/reference/models/lego/point_cloud/iteration_7000/point_cloud.ply"
        )


def test_search_for_max_iteration(tmp_path):
    for it in (100, 7000, 30):
        (tmp_path / f"iteration_{it}").mkdir()
    assert search_for_max_iteration(str(tmp_path)) == 7000


def test_load_reference_cameras():
    cams = load_cameras("/root/reference/models/lego")
    assert len(cams) == 300
    cam = cams[0]
    assert cam.width == 800 and cam.height == 800
    # view matrix is a rigid transform: R orthonormal
    R = np.asarray(cam.view)[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    # camera center maps to origin of view space
    p = np.asarray(cam.view) @ np.append(np.asarray(cam.campos), 1.0)
    np.testing.assert_allclose(p[:3], 0.0, atol=1e-4)


def test_activations():
    scene = synthetic_box_scene(n=64, seed=2)
    cov = np.asarray(scene.get_covariance())
    assert cov.shape == (64, 6)
    # covariances are PSD: diagonal entries positive, det >= 0
    from gsmpm_tpu.sim.coupling import mat_from_upper

    mats = np.asarray(mat_from_upper(scene.get_covariance()))
    eig = np.linalg.eigvalsh(mats)
    assert (eig > -1e-10).all()
    op = np.asarray(scene.get_opacity())
    assert ((op > 0) & (op < 1)).all()


def test_native_ply_codec_roundtrip(tmp_path):
    """C++ codec (csrc/gsmpm_native.cpp) vs the numpy PLY path."""
    import os

    import numpy as np

    from gsmpm_tpu.io import _native
    from gsmpm_tpu.io.ply import read_ply_vertices

    rng = np.random.default_rng(3)
    n, props = 1000, ["x", "y", "z", "opacity"]
    data = rng.normal(size=(len(props), n)).astype(np.float32)
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        + "".join(f"property float {p}\n" for p in props)
        + "end_header\n"
    )
    path = str(tmp_path / "native.ply")
    if not _native.write_ply_f32_planar(path, header, data):
        import pytest

        pytest.skip("native codec unavailable (no compiler)")
    # native read
    cols = _native.read_ply_f32_columns(path)
    assert cols is not None and set(cols) == set(props)
    for i, p in enumerate(props):
        np.testing.assert_array_equal(cols[p], data[i])
    # numpy reader agrees on the same bytes
    os.environ["GSMPM_NO_NATIVE"] = "1"
    try:
        _native._TRIED, _native._LIB = True, None
        ref = read_ply_vertices(path)
    finally:
        del os.environ["GSMPM_NO_NATIVE"]
        _native._TRIED = False
    for p in props:
        np.testing.assert_array_equal(ref[p], cols[p])


def test_scene_pruning():
    """drop_low_opacity / drop_empty_gaussians parity (main.py:172-173)."""
    import numpy as np

    from gsmpm_tpu.models.synthetic import synthetic_box_scene

    import dataclasses

    import jax.numpy as jnp

    scene = synthetic_box_scene(n=200)
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(200, 1)).astype(np.float32)
    scene = dataclasses.replace(scene, opacity=jnp.asarray(logits))
    kept = scene.drop_low_opacity(0.5)
    assert 0 < kept.num_gaussians < 200
    assert float(kept.get_opacity().min()) >= 0.5 - 1e-6
    sub = scene.drop_empty_gaussians(np.arange(200) < 50)
    assert sub.num_gaussians == 50


def test_mean_knn_dist():
    """Blocked 3-NN mean squared distance vs brute force (simple-knn parity)."""
    import numpy as np

    from gsmpm_tpu.models.knn import mean_knn_dist

    rng = np.random.default_rng(5)
    pts = rng.normal(size=(300, 3)).astype(np.float32)
    got = np.asarray(mean_knn_dist(pts, k=3, block=128))
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    ref = np.sort(d2, axis=1)[:, :3].mean(axis=1)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_native_mjpeg_avi(tmp_path):
    """Native MJPEG-AVI encoder: container structure + per-frame JPEG decode.

    Pulls the '00dc' chunks back out of the RIFF and decodes them with PIL;
    4:2:0 quality-90 JPEG should reproduce a smooth gradient within ~6 gray
    levels.
    """
    import struct

    pytest.importorskip("PIL")
    from PIL import Image

    from gsmpm_tpu.io import _native
    from gsmpm_tpu.io.video import encode_avi, save_frame

    if not _native.avi_available():
        pytest.skip("native tier unavailable")

    h, w, n_frames = 96, 120, 4
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    frames = []
    img_dir = tmp_path / "images"
    for t in range(n_frames):
        img = np.stack(
            [xx / w, yy / h, np.full_like(xx, t / max(n_frames - 1, 1))],
            axis=-1,
        )
        frames.append((255 * img).astype(np.uint8))
        save_frame(img, str(img_dir), t)

    out = tmp_path / "vid.avi"
    assert encode_avi(str(img_dir), str(out), fps=10)
    blob = out.read_bytes()
    assert blob[:4] == b"RIFF" and blob[8:12] == b"AVI "
    assert struct.unpack("<I", blob[4:8])[0] == len(blob) - 8
    assert b"MJPG" in blob[:300] and b"idx1" in blob

    # walk the movi chunks and decode each JPEG
    movi = blob.index(b"movi")
    pos = movi + 4
    decoded = 0
    while blob[pos:pos + 4] == b"00dc":
        size = struct.unpack("<I", blob[pos + 4:pos + 8])[0]
        jpg = blob[pos + 8:pos + 8 + size]
        assert jpg[:2] == b"\xff\xd8" and jpg[-2:] == b"\xff\xd9"
        import io as _io

        arr = np.asarray(Image.open(_io.BytesIO(jpg)).convert("RGB"),
                         np.float32)
        ref = frames[decoded].astype(np.float32)
        assert arr.shape == ref.shape
        assert np.mean(np.abs(arr - ref)) < 6.0
        decoded += 1
        pos += 8 + size + (size & 1)
    assert decoded == n_frames
