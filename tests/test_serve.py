"""Viewer-server geometry + render service (no HTTP, tiny model)."""
import sys
import os

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_look_at_pose_geometry():
    from serve import look_at_pose

    for theta, phi, r in ((0.0, 0.0, 4.0), (1.2, -0.7, 3.0), (2.5, 1.0, 5.5)):
        pose = look_at_pose(theta, phi, r)
        R, t = pose[:3, :3], pose[:3, 3]
        # rotation is orthonormal, right-handed
        np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-5)
        assert np.linalg.det(R) > 0.99
        # camera sits at the requested radius
        np.testing.assert_allclose(np.linalg.norm(t), r, atol=1e-5)
        # looks at the origin: camera -Z (view dir) points from t to 0
        view_dir = -R[:, 2]
        np.testing.assert_allclose(view_dir, -t / np.linalg.norm(t),
                                   atol=1e-5)


def test_render_service_jpeg(tmp_path, capsys):
    from nerf_tpu.config import make_cfg
    from serve import RenderService

    cfg = make_cfg("configs/nerf/lego.yaml", [
        "task_arg.N_samples", "4", "task_arg.N_importance", "0",
        "network.nerf.W", "32", "network.nerf.D", "2",
        "network.nerf.skips", "[0]", "network.dtype", "float32",
        "use_pallas_kernels", "False", "render_tile_rays", "256",
        "enable_ess", "False", "enable_ert", "False",
        "workspace", str(tmp_path / "ws"),
    ])
    svc = RenderService(cfg, size=16)  # random weights (warning printed)
    assert "WARNING" in capsys.readouterr().out
    jpg = svc.render_jpeg(theta=0.3, phi=0.2, radius=4.0)
    assert jpg[:2] == b"\xff\xd8"  # JPEG SOI marker
    import cv2

    img = cv2.imdecode(np.frombuffer(jpg, np.uint8), cv2.IMREAD_COLOR)
    assert img.shape == (16, 16, 3)
