#!/usr/bin/env python
"""Mesh extraction CLI: trained checkpoint -> density field -> surface.

Parity surface: reference ``src/utils/mesh_utils.py::extract_mesh`` +
``cfg.level``/``cfg.resolution`` (config.py:11-12) — the reference defines
but never wires this; here it is a working entry point.

Usage:
    python scripts/extract_mesh.py --cfg_file configs/nerf/lego.yaml \
        [mesh.level 5.0] [mesh.resolution 128] [mesh.out lego.ply]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    import numpy as np

    from nerf_tpu.config import parse_args
    from nerf_tpu.render.renderer import RenderOptions
    from nerf_tpu.train.loop import make_density_fn
    from nerf_tpu.utils.mesh import extract_mesh, save_obj, save_ply
    from run import _load_eval_params

    cfg, _ = parse_args(argv)
    opts = RenderOptions.from_cfg(cfg)
    params = _load_eval_params(cfg, opts)

    node = cfg.get("mesh", {})
    level = float(node.get("level", cfg.get("level", 5.0)))
    res = int(node.get("resolution", cfg.get("resolution", 128)))
    out = str(node.get("out", os.path.join(cfg.result_dir, "mesh.ply")))

    density = make_density_fn(params["fine"], opts)
    verts, faces = extract_mesh(
        lambda p: np.asarray(density(p)), level=level,
        bbox=((-2.0, -2.0, -2.0), (2.0, 2.0, 2.0)), resolution=res,
    )
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    (save_obj if out.endswith(".obj") else save_ply)(out, verts, faces)
    print(f"mesh: {len(verts)} verts, {len(faces)} faces -> {out}")


if __name__ == "__main__":
    main(sys.argv[1:])
