"""Loss library vs loop-based NumPy oracles (reference net_utils.py math)."""
import numpy as np
import jax.numpy as jnp

from nerf_tpu.train import losses as L


def test_clamped_sigmoid():
    x = jnp.asarray([-100.0, 0.0, 100.0])
    y = np.asarray(L.clamped_sigmoid(x))
    assert y[0] == 1e-4 and y[2] == 1 - 1e-4 and abs(y[1] - 0.5) < 1e-6


def test_focal_loss_oracle():
    rng = np.random.RandomState(0)
    pred = np.clip(rng.rand(2, 1, 4, 4), 1e-4, 1 - 1e-4)
    gt = np.zeros((2, 1, 4, 4))
    gt[0, 0, 1, 1] = 1.0
    gt[0, 0, 1, 2] = 0.6  # gaussian tail -> weighted negative
    gt[1, 0, 3, 3] = 1.0

    # loop oracle
    pos_l = neg_l = npos = 0.0
    for i in np.ndindex(gt.shape):
        p, g = pred[i], gt[i]
        if g == 1.0:
            pos_l += np.log(p) * (1 - p) ** 2
            npos += 1
        else:
            neg_l += np.log(1 - p) * p ** 2 * (1 - g) ** 4
    want = -(pos_l + neg_l) / npos
    got = float(L.focal_loss(jnp.asarray(pred), jnp.asarray(gt)))
    assert abs(got - want) < 1e-5

    # no positives -> -neg_loss
    gt0 = np.zeros_like(gt)
    want0 = -sum(np.log(1 - pred[i]) * pred[i] ** 2 for i in np.ndindex(gt0.shape))
    got0 = float(L.focal_loss(jnp.asarray(pred), jnp.asarray(gt0)))
    assert abs(got0 - want0) < 1e-5


def test_smooth_l1_oracle():
    rng = np.random.RandomState(1)
    pred = rng.randn(2, 4, 3, 3).astype(np.float64) * 2
    target = rng.randn(2, 4, 3, 3).astype(np.float64)
    w = (rng.rand(2, 1, 3, 3) > 0.3).astype(np.float64)
    sigma = 1.5
    s2 = sigma ** 2

    per_batch = []
    for b in range(2):
        total = 0.0
        for c in range(4):
            for y in range(3):
                for x in range(3):
                    d = w[b, 0, y, x] * (pred[b, c, y, x] - target[b, c, y, x])
                    if abs(d) < 1.0 / s2:
                        total += d ** 2 * s2 / 2
                    else:
                        total += abs(d) - 0.5 / s2
        per_batch.append(total / (4 * w[b].sum() + 1e-3))
    want = np.mean(per_batch)
    got = float(L.smooth_l1_loss(jnp.asarray(pred), jnp.asarray(target),
                                 jnp.asarray(w), sigma=sigma))
    assert abs(got - want) < 1e-6


def test_poly_matching_min_over_cyclic_shifts():
    # pred equals gt rolled by 2: loss must be ~0 under L2 and L1
    rng = np.random.RandomState(2)
    gt = rng.rand(1, 6, 2)
    pred = np.roll(gt, 2, axis=1)
    for lt in ("L2", "L1"):
        got = float(L.poly_matching_loss(jnp.asarray(pred), jnp.asarray(gt),
                                         loss_type=lt))
        assert got < 1e-6
    # mismatched polygons -> positive loss
    got = float(L.poly_matching_loss(jnp.asarray(pred + 0.5), jnp.asarray(gt)))
    assert got > 0.1


def test_attention_loss_oracle():
    rng = np.random.RandomState(3)
    pred = np.clip(rng.rand(2, 1, 4, 4), 1e-3, 1 - 1e-3)
    gt = (rng.rand(2, 1, 4, 4) > 0.7).astype(np.float64)
    beta, gamma = 4.0, 0.5
    alpha = (1 - gt).sum() / gt.size
    loss = (-alpha * beta ** ((1 - pred) ** gamma) * np.log(pred) * gt
            - (1 - alpha) * beta ** (pred ** gamma) * np.log(1 - pred) * (1 - gt))
    want = loss.mean()
    got = float(L.attention_loss(jnp.asarray(pred), jnp.asarray(gt)))
    assert abs(got - want) < 1e-6


def test_ae_loss_pull_push():
    # two objects with well-separated constant embeddings:
    # pull ~ 0, push = relu(1 - |m1 - m2|) = 0 when means differ by >= 1
    ae = np.zeros((1, 1, 2, 4))
    ae[0, 0, 0] = 0.0   # object 1 pixels (row 0)
    ae[0, 0, 1] = 2.0   # object 2 pixels (row 1)
    ind = np.array([[[0, 1], [4, 5]]])      # flat indices rows 0 and 1
    mask = np.ones((1, 2, 2))
    pull, push = L.ae_loss(jnp.asarray(ae), jnp.asarray(ind),
                           jnp.asarray(mask))
    assert float(pull) < 1e-6
    assert float(push) < 1e-6
    # same embeddings -> push = relu(1-0) summed over off-diagonal pairs
    ae2 = np.zeros((1, 1, 2, 4))
    _, push2 = L.ae_loss(jnp.asarray(ae2), jnp.asarray(ind),
                         jnp.asarray(mask))
    assert abs(float(push2) - 1.0) < 1e-3  # (sum 4 pairs - 2 diag)/(2*1)


def test_ind_losses_gather():
    rng = np.random.RandomState(4)
    out = rng.randn(1, 3, 2, 2)  # [b,c,h,w]
    # 1d: gather two pixels, weight 1
    ind = np.array([[0, 3]])
    target = np.stack([out[0, :, 0, 0], out[0, :, 1, 1]])[None]
    got = float(L.ind_l1_loss_1d(jnp.asarray(out), jnp.asarray(target),
                                 jnp.asarray(ind), jnp.ones((1, 2))))
    assert got < 1e-6  # perfect prediction
    got2 = float(L.ind_l1_loss_1d(jnp.asarray(out),
                                  jnp.asarray(target + 1.0),
                                  jnp.asarray(ind), jnp.ones((1, 2))))
    assert abs(got2 - 6.0 / (2 * 3 + 1e-4)) < 1e-5  # sum |1| = 6 over (2,3)

    # 2d: same but [b,max_objs,max_parts]
    ind2 = np.array([[[0], [3]]])
    mask2 = np.ones((1, 2, 1))
    t2 = target.reshape(1, 2, 1, 3)
    got3 = float(L.ind2d_reg_l1_loss(jnp.asarray(out), jnp.asarray(t2),
                                     jnp.asarray(ind2), jnp.asarray(mask2)))
    assert got3 < 1e-6


def test_geo_cross_entropy_prefers_target_vertex():
    rng = np.random.RandomState(5)
    b, kq = 1, 3  # 4*kq polygon points
    poly = rng.rand(b, 4 * kq, 2)
    target = np.array([[1, 0, 2, 1]])
    # logits live in [b, k', 4]: a distribution over the k' polygon points
    # of each quarter. Peaking them on the loss's own gaussian kernel must
    # score lower than uniform logits.
    out_uniform = np.zeros((b, kq, 4))

    poly4 = poly.reshape(b, 4, kq, 2)
    tgt = np.stack([poly4[0, q, target[0, q]] for q in range(4)])[None]
    sigma = ((poly4[:, :, 0] - poly4[:, :, 1]) ** 2).sum(-1, keepdims=True)
    kernel = np.exp(-((poly4 - tgt[:, :, None]) ** 2).sum(-1) / (sigma / 3))
    out_peaked = 10.0 * kernel.transpose(0, 2, 1)  # [b, kq, 4]

    l_uni = float(L.geo_cross_entropy_loss(
        jnp.asarray(out_uniform), jnp.asarray(target), jnp.asarray(poly)))
    l_peak = float(L.geo_cross_entropy_loss(
        jnp.asarray(out_peaked), jnp.asarray(target), jnp.asarray(poly)))
    assert np.isfinite(l_uni) and np.isfinite(l_peak)
    assert l_peak < l_uni
