"""Loss-function library.

Parity surface: reference ``src/utils/net_utils.py:13-285`` — the template's
loss zoo (CornerNet focal, weighted smooth-L1, associative-embedding
pull/push, cyclic polygon matching, edge attention, index-gathered L1,
geometric cross-entropy). Functional JAX re-implementations with the same
semantics (epsilons, normalizations, reductions); no module wrappers.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def clamped_sigmoid(x: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    """sigmoid clamped to [eps, 1-eps] (net_utils.py:13-15)."""
    return jnp.clip(jax.nn.sigmoid(x), eps, 1.0 - eps)


def focal_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """CornerNet modified focal loss (net_utils.py:_neg_loss).

    pred: probabilities in (0,1); gt: gaussian-splatted heatmap where 1
    marks positives and values <1 weight negatives by (1-gt)^4.
    """
    pos = (gt == 1.0).astype(pred.dtype)
    neg = (gt < 1.0).astype(pred.dtype)
    neg_w = (1.0 - gt) ** 4
    pos_loss = jnp.sum(jnp.log(pred) * (1.0 - pred) ** 2 * pos)
    neg_loss = jnp.sum(jnp.log(1.0 - pred) * pred ** 2 * neg_w * neg)
    num_pos = jnp.sum(pos)
    return jnp.where(num_pos == 0, -neg_loss,
                     -(pos_loss + neg_loss) / jnp.maximum(num_pos, 1.0))


def smooth_l1_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    weights: jnp.ndarray,
    sigma: float = 1.0,
    normalize: bool = True,
    reduce: bool = True,
) -> jnp.ndarray:
    """Weighted smooth-L1 (net_utils.py:smooth_l1_loss).

    pred/target [b, d, h, w], weights [b, 1, h, w]; quadratic below
    1/sigma^2, linear above; optionally normalized by d * sum(weights).
    """
    b, d = pred.shape[0], pred.shape[1]
    sigma2 = sigma ** 2
    diff = weights * (pred - target)
    abs_diff = jnp.abs(diff)
    quad = (abs_diff < 1.0 / sigma2).astype(pred.dtype)
    loss = diff ** 2 * (sigma2 / 2.0) * quad + (
        abs_diff - 0.5 / sigma2) * (1.0 - quad)
    if normalize:
        loss = jnp.sum(loss.reshape(b, -1), 1) / (
            d * jnp.sum(weights.reshape(b, -1), 1) + 1e-3)
    if reduce:
        loss = jnp.mean(loss)
    return loss


def ae_loss(
    ae: jnp.ndarray, ind: jnp.ndarray, ind_mask: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Associative-embedding pull/push (net_utils.py:AELoss).

    ae [b,1,h,w] embedding map, ind [b,max_objs,max_parts] flat pixel
    indices, ind_mask same shape. Returns (pull, push).
    """
    b, _, h, w = ae.shape
    _, max_objs, max_parts = ind.shape
    obj_mask = jnp.sum(ind_mask, axis=2) != 0

    flat = ae.reshape(b, h * w)
    tag = jnp.take_along_axis(
        flat, ind.reshape(b, max_objs * max_parts), axis=1
    ).reshape(b, max_objs, max_parts)

    tag_mean = jnp.sum(tag * ind_mask, 2) / (jnp.sum(ind_mask, 2) + 1e-4)

    pull_dist = (tag - tag_mean[:, :, None]) ** 2 * ind_mask
    obj_num = jnp.sum(obj_mask.astype(ae.dtype), 1)
    pull = jnp.sum(jnp.sum(pull_dist, (1, 2)) / (obj_num + 1e-4)) / b

    push_dist = jax.nn.relu(
        1.0 - jnp.abs(tag_mean[:, None, :] - tag_mean[:, :, None]))
    pair_mask = (obj_mask[:, None, :] & obj_mask[:, :, None]).astype(ae.dtype)
    push = jnp.sum(
        (jnp.sum(push_dist * pair_mask, (1, 2)) - obj_num)
        / (obj_num * (obj_num - 1) + 1e-4)) / b
    return pull, push


def poly_matching_loss(
    pred: jnp.ndarray, gt: jnp.ndarray, loss_type: str = "L2"
) -> jnp.ndarray:
    """Cyclic polygon matching (net_utils.py:PolyMatchingLoss): distance to
    the best cyclic permutation of the gt contour. pred/gt [b, pnum, 2]."""
    pnum = pred.shape[1]
    rolls = (jnp.arange(pnum)[:, None] + jnp.arange(pnum)[None, :]) % pnum
    gt_expand = gt[:, rolls]                    # [b, pnum, pnum, 2]
    dis = pred[:, None] - gt_expand             # [b, pnum(perm), pnum, 2]
    if loss_type == "L2":
        dis = jnp.sum(jnp.sqrt(jnp.sum(dis ** 2, 3)), 2)
    elif loss_type == "L1":
        dis = jnp.sum(jnp.sum(jnp.abs(dis), 3), 2)
    else:
        raise ValueError(f"unknown loss_type {loss_type!r}")
    return jnp.mean(jnp.min(dis, axis=1))


def attention_loss(
    pred: jnp.ndarray, gt: jnp.ndarray, beta: float = 4.0, gamma: float = 0.5
) -> jnp.ndarray:
    """Edge attention loss (net_utils.py:AttentionLoss): class-balanced BCE
    with beta^((1-p)^gamma) modulation. pred in (0,1), gt in {0,1}."""
    num_pos = jnp.sum(gt)
    num_neg = jnp.sum(1.0 - gt)
    alpha = num_neg / (num_pos + num_neg)
    edge_beta = beta ** ((1.0 - pred) ** gamma)
    bg_beta = beta ** (pred ** gamma)
    loss = -alpha * edge_beta * jnp.log(pred) * gt \
        - (1.0 - alpha) * bg_beta * jnp.log(1.0 - pred) * (1.0 - gt)
    return jnp.mean(loss)


def _gather_feat_2d(feat: jnp.ndarray, ind: jnp.ndarray) -> jnp.ndarray:
    """feat [b,c,h,w], ind [b,n] flat spatial indices -> [b,n,c]
    (net_utils.py:_tranpose_and_gather_feat)."""
    b, c = feat.shape[0], feat.shape[1]
    flat = feat.transpose(0, 2, 3, 1).reshape(b, -1, c)
    return jnp.take_along_axis(flat, ind[..., None].astype(jnp.int32), axis=1)


def ind2d_reg_l1_loss(
    output: jnp.ndarray,
    target: jnp.ndarray,
    ind: jnp.ndarray,
    ind_mask: jnp.ndarray,
) -> jnp.ndarray:
    """Index-gathered 2D regression L1 (net_utils.py:Ind2dRegL1Loss).

    output [b,c,h,w]; ind/ind_mask [b,max_objs,max_parts];
    target [b,max_objs,max_parts,c].
    """
    b, max_objs, max_parts = ind.shape
    pred = _gather_feat_2d(output, ind.reshape(b, -1)).reshape(
        b, max_objs, max_parts, output.shape[1])
    mask = ind_mask[..., None]
    loss = jnp.sum(jnp.abs(pred * mask - target * mask))
    return loss / (jnp.sum(jnp.broadcast_to(mask, pred.shape)) + 1e-4)


def ind_l1_loss_1d(
    output: jnp.ndarray,
    target: jnp.ndarray,
    ind: jnp.ndarray,
    weight: jnp.ndarray,
) -> jnp.ndarray:
    """Index-gathered 1D L1 (net_utils.py:IndL1Loss1d). output [b,c,h,w],
    ind [b,n], target [b,n,c], weight [b,n]."""
    pred = _gather_feat_2d(output, ind)
    w = weight[..., None]
    loss = jnp.sum(jnp.abs(pred * w - target * w))
    return loss / (jnp.sum(weight) * output.shape[1] + 1e-4)


def geo_cross_entropy_loss(
    output: jnp.ndarray, target: jnp.ndarray, poly: jnp.ndarray
) -> jnp.ndarray:
    """Geometric cross-entropy (net_utils.py:GeoCrossEntropyLoss): soft
    cross-entropy where the label is a gaussian kernel of distances from
    the target vertex along the polygon. output [b,k,n], target [b,4]
    (vertex index per quarter), poly [b,4*k',2] with k' = poly_num//4."""
    logp = jnp.log(jnp.clip(jax.nn.softmax(output, axis=1), 1e-4))
    b = poly.shape[0]
    poly4 = poly.reshape(b, 4, -1, 2)              # [b,4,k',2]
    idx = jnp.repeat(target[..., None, None].astype(jnp.int32), 2, axis=-1)
    tgt = jnp.take_along_axis(poly4, idx, axis=2)  # [b,4,1,2]
    sigma = jnp.sum((poly4[:, :, 0] - poly4[:, :, 1]) ** 2, -1,
                    keepdims=True)                 # [b,4,1]
    kernel = jnp.exp(-jnp.sum((poly4 - tgt) ** 2, 3) / (sigma / 3.0))
    return -jnp.mean(jnp.sum(logp * kernel.transpose(0, 2, 1), 1))
