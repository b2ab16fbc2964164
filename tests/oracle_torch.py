"""Torch CPU oracle of the reference math contract.

An independent implementation of the formulas documented in SURVEY.md §2.5 /
§7.3 (positional encoding, NeRF MLP, stratified + inverse-CDF sampling,
alpha compositing) used to verify the JAX pipeline allclose. Written against
the documented behavior of ``/root/reference/src/models/nerf/renderer/
volume_renderer.py`` and ``network.py`` — not a copy of them.
"""
from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F


def freq_encode(x: torch.Tensor, num_freqs: int) -> torch.Tensor:
    """[x, sin(2^0 x), cos(2^0 x), ..., sin(2^(F-1) x), cos(2^(F-1) x)]."""
    outs = [x]
    for f in 2.0 ** torch.linspace(0.0, num_freqs - 1, num_freqs):
        outs.append(torch.sin(x * f))
        outs.append(torch.cos(x * f))
    return torch.cat(outs, dim=-1)


class OracleNeRF(torch.nn.Module):
    """8x256 MLP, skip-concat of input after layer-4 relu, viewdir head."""

    def __init__(self, D=8, W=256, input_ch=63, input_ch_views=27, skips=(4,)):
        super().__init__()
        self.D, self.W = D, W
        self.input_ch, self.input_ch_views = input_ch, input_ch_views
        self.skips = set(skips)
        layers = []
        in_dim = input_ch
        for i in range(D):
            layers.append(torch.nn.Linear(in_dim, W))
            in_dim = W + input_ch if i in self.skips else W
        self.pts_linears = torch.nn.ModuleList(layers)
        self.feature_linear = torch.nn.Linear(W, W)
        self.alpha_linear = torch.nn.Linear(W, 1)
        self.views_linears = torch.nn.ModuleList(
            [torch.nn.Linear(input_ch_views + W, W // 2)]
        )
        self.rgb_linear = torch.nn.Linear(W // 2, 3)

    def forward(self, x):
        pts, views = torch.split(x, [self.input_ch, self.input_ch_views], dim=-1)
        h = pts
        for i, layer in enumerate(self.pts_linears):
            h = F.relu(layer(h))
            if i in self.skips:
                h = torch.cat([pts, h], dim=-1)
        alpha = self.alpha_linear(h)
        feature = self.feature_linear(h)
        h = torch.cat([feature, views], dim=-1)
        for layer in self.views_linears:
            h = F.relu(layer(h))
        rgb = self.rgb_linear(h)
        return torch.cat([rgb, alpha], dim=-1)


def params_from_oracle(model: OracleNeRF):
    """Convert the oracle's torch weights into the jax pytree layout."""
    sd = model.state_dict()

    def t(name):
        return np.asarray(sd[name].detach().numpy())

    params = {
        "pts_linears": [
            {"w": t(f"pts_linears.{i}.weight").T.copy(),
             "b": t(f"pts_linears.{i}.bias")}
            for i in range(model.D)
        ],
        "feature_linear": {"w": t("feature_linear.weight").T.copy(),
                           "b": t("feature_linear.bias")},
        "alpha_linear": {"w": t("alpha_linear.weight").T.copy(),
                         "b": t("alpha_linear.bias")},
        "views_linears": [{"w": t("views_linears.0.weight").T.copy(),
                           "b": t("views_linears.0.bias")}],
        "rgb_linear": {"w": t("rgb_linear.weight").T.copy(),
                       "b": t("rgb_linear.bias")},
    }
    return params


def sample_coarse_det(n_rays, n_samples, near, far):
    t = torch.linspace(0.0, 1.0, n_samples)
    z = near * (1 - t) + far * t
    return z.expand(n_rays, n_samples).contiguous()


def sample_pdf_det(bins, weights, n_importance):
    """Deterministic (linspace-u) inverse-CDF sampling."""
    u = torch.linspace(0.0, 1.0, n_importance).expand(
        *weights.shape[:-1], n_importance
    ).contiguous()
    return sample_pdf_u(bins, weights, u)


def sample_pdf_u(bins, weights, u):
    weights = weights + 1e-5
    pdf = weights / weights.sum(-1, keepdim=True)
    cdf = torch.cumsum(pdf, -1)
    cdf = torch.cat([torch.zeros_like(cdf[..., :1]), cdf], -1)
    inds = torch.searchsorted(cdf, u, right=True)
    below = torch.clamp(inds - 1, min=0)
    above = torch.clamp(inds, max=cdf.shape[-1] - 1)
    cdf_b = torch.gather(cdf, -1, below)
    cdf_a = torch.gather(cdf, -1, above)
    bins_b = torch.gather(bins, -1, torch.clamp(below, max=bins.shape[-1] - 1))
    bins_a = torch.gather(bins, -1, torch.clamp(above, max=bins.shape[-1] - 1))
    denom = cdf_a - cdf_b
    denom = torch.where(denom < 1e-5, torch.ones_like(denom), denom)
    tt = (u - cdf_b) / denom
    return bins_b + tt * (bins_a - bins_b)


def raw2outputs(raw, z_vals, rays_d, white_bkgd=True):
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = torch.cat([dists, torch.full_like(dists[..., :1], 1e10)], -1)
    dists = dists * torch.norm(rays_d[..., None, :], dim=-1)
    rgb = torch.sigmoid(raw[..., :3])
    alpha = 1.0 - torch.exp(-F.relu(raw[..., 3]) * dists)
    trans = torch.cumprod(
        torch.cat([torch.ones_like(alpha[..., :1]), 1.0 - alpha[..., :-1] + 1e-10], -1),
        -1,
    )
    weights = alpha * trans
    rgb_map = (weights[..., None] * rgb).sum(-2)
    depth_map = (weights * z_vals).sum(-1)
    acc_map = weights.sum(-1)
    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])
    return rgb_map, acc_map, weights, depth_map


def render_rays_det(model_c, model_f, rays_o, rays_d, near, far,
                    n_samples, n_importance, white_bkgd=True,
                    xyz_freqs=10, dir_freqs=4):
    """Deterministic hierarchical render (perturb=0, eval-mode u, no noise)."""
    n = rays_o.shape[0]
    z_vals = sample_coarse_det(n, n_samples, near, far)
    pts = rays_o[:, None] + rays_d[:, None] * z_vals[..., None]
    viewdirs = rays_d

    def query(model, pts, z):
        s = z.shape[-1]
        emb = freq_encode(pts.reshape(-1, 3), xyz_freqs)
        dirs = viewdirs[:, None, :].expand(n, s, 3).reshape(-1, 3)
        emb = torch.cat([emb, freq_encode(dirs, dir_freqs)], -1)
        return model(emb).reshape(n, s, 4)

    raw = query(model_c, pts, z_vals)
    rgb0, acc0, weights, depth0 = raw2outputs(raw, z_vals, rays_d, white_bkgd)
    z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    z_fine = sample_pdf_det(z_mid, weights[..., 1:-1], n_importance)
    z_all, _ = torch.sort(torch.cat([z_vals, z_fine], -1), -1)
    pts_f = rays_o[:, None] + rays_d[:, None] * z_all[..., None]
    raw_f = query(model_f, pts_f, z_all)
    rgb, acc, _, depth = raw2outputs(raw_f, z_all, rays_d, white_bkgd)
    return {"rgb_map_0": rgb0, "rgb_map": rgb, "acc_map": acc,
            "depth_map": depth}
