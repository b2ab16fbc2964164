"""Samplers + utility function tests."""
import numpy as np

from nerf_tpu.data.samplers import (
    DistributedEpochSampler, IterationBasedSampler, epoch_shuffled_indices,
    shard_indices,
)
from nerf_tpu.utils.img_utils import colorize_depth, horizon_concat, to8b
from nerf_tpu.utils.ray_utils import get_near_far


def test_epoch_shuffle_deterministic():
    a = epoch_shuffled_indices(100, epoch=3)
    b = epoch_shuffled_indices(100, epoch=3)
    c = epoch_shuffled_indices(100, epoch=4)
    assert (a == b).all() and not (a == c).all()
    assert sorted(a) == list(range(100))


def test_shards_cover_all():
    idx = epoch_shuffled_indices(10, 0)
    shards = [shard_indices(idx, r, 4) for r in range(4)]
    assert all(len(s) == 3 for s in shards)  # 10 -> padded 12 -> 3 each
    covered = set(np.concatenate(shards).tolist())
    assert covered == set(range(10))


def test_distributed_sampler_disjoint_between_ranks():
    s0 = DistributedEpochSampler(8, rank=0, world_size=2)
    s1 = DistributedEpochSampler(8, rank=1, world_size=2)
    s0.set_epoch(5)
    s1.set_epoch(5)
    i0, i1 = list(s0), list(s1)
    assert len(i0) == len(i1) == 4
    assert set(i0) | set(i1) == set(range(8))
    assert not set(i0) & set(i1)


def test_iteration_based_sampler():
    base = DistributedEpochSampler(4, shuffle=False)
    it = IterationBasedSampler(base, num_iterations=10)
    out = list(it)
    assert len(out) == 10
    assert out[:4] == [0, 1, 2, 3]


def test_get_near_far():
    rays_o = np.array([[0.0, 0.0, 5.0], [10.0, 0.0, 5.0]])
    rays_d = np.array([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    near, far, hit = get_near_far(rays_o, rays_d, [-2, -2, -2], [2, 2, 2])
    assert hit[0] and not hit[1]
    assert abs(near[0] - 3.0) < 1e-6 and abs(far[0] - 7.0) < 1e-6


def test_image_utils():
    a = np.zeros((4, 6, 3))
    b = np.ones((8, 2, 3))
    out = horizon_concat([a, b])
    assert out.shape == (8, 8, 3)
    assert to8b(np.array([0.0, 0.5, 2.0])).tolist() == [0, 127, 255]
    d = colorize_depth(np.random.rand(5, 5))
    assert d.shape == (5, 5, 3) and d.min() >= 0 and d.max() <= 1


def test_vis_utils_projection():
    import numpy as np
    from nerf_tpu.utils.vis_utils import (
        get_bbox_2d, get_bound_2d_mask, get_bound_corners, project,
    )

    bounds = np.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    corners = get_bound_corners(bounds)
    assert corners.shape == (8, 3)
    assert set(map(tuple, corners)) == {
        (x, y, z) for x in (-1, 1) for y in (-1, 1) for z in (-1, 1)}

    K = np.array([[50.0, 0, 32.0], [0, 50.0, 24.0], [0, 0, 1.0]])
    RT = np.eye(4)
    RT[2, 3] = 4.0  # camera 4 units back, box at origin, z forward
    uv = project(np.zeros((1, 3)), K, RT)
    np.testing.assert_allclose(uv[0], [32.0, 24.0])  # center projects to pp

    bb = get_bbox_2d(bounds, K, RT)
    assert bb[0] < 32 < bb[2] and bb[1] < 24 < bb[3]
    mask = get_bound_2d_mask(bounds, K, RT, 48, 64)
    assert mask.shape == (48, 64)
    assert mask[24, 32] == 1 and mask[0, 0] == 0


def test_pfm_roundtrip(tmp_path):
    import numpy as np
    from nerf_tpu.utils.img_utils import read_pfm, write_pfm

    rng = np.random.RandomState(2)
    rgb = rng.rand(6, 9, 3).astype(np.float32)
    gray = rng.rand(5, 4).astype(np.float32)
    for name, arr in (("c.pfm", rgb), ("g.pfm", gray)):
        p = str(tmp_path / name)
        write_pfm(p, arr, scale=2.0)
        got, scale = read_pfm(p)
        assert scale == 2.0
        np.testing.assert_allclose(got, arr)


def test_warmup_multi_step_schedule():
    import numpy as np
    from nerf_tpu.train.optim import warmup_multi_step_schedule

    s = warmup_multi_step_schedule(
        1.0, milestone_steps=[100, 200], gamma=0.1,
        warmup_factor=0.5, warmup_iters=10, warmup_method="linear")
    assert abs(float(s(0)) - 0.5) < 1e-6           # warmup start
    assert abs(float(s(5)) - 0.75) < 1e-6          # mid warmup
    assert abs(float(s(10)) - 1.0) < 1e-6          # warmup done
    assert abs(float(s(150)) - 0.1) < 1e-7         # after milestone 1
    assert abs(float(s(250)) - 0.01) < 1e-8        # after milestone 2

    sc = warmup_multi_step_schedule(
        2.0, [50], 0.1, warmup_factor=0.25, warmup_iters=4,
        warmup_method="constant")
    assert abs(float(sc(2)) - 0.5) < 1e-6          # constant warmup
    assert abs(float(sc(4)) - 2.0) < 1e-6

    # wires through make_optimizer
    from nerf_tpu.config import make_cfg
    cfg = make_cfg("configs/nerf/lego.yaml",
                   ["train.scheduler.type", "warmup_multi_step",
                    "train.scheduler.milestones", "[2,4]"])
    from nerf_tpu.train.optim import make_optimizer
    import jax.numpy as jnp
    tx = make_optimizer(cfg)
    params = {"w": jnp.ones((3,))}
    state = tx.init(params)
    _ = tx.update({"w": jnp.ones((3,))}, state, params)


def test_mask_utils_catalogs():
    from nerf_tpu.utils.mask_utils import (
        ADE20K_LABELS, get_class_ids_from_labels, get_label_id_mapping,
        id_label_mapping_ade20k, id_label_mapping_human,
        label_id_mapping_ade20k, label_id_mapping_human)

    assert len(ADE20K_LABELS) == 150
    # both directions are consistent bijections
    assert all(id_label_mapping_ade20k[label_id_mapping_ade20k[n]] == n
               for n in ADE20K_LABELS)
    assert label_id_mapping_ade20k["person"] == 12
    assert id_label_mapping_ade20k[2] == "sky"
    assert label_id_mapping_human == {"non_person": 0, "person": 1}
    assert id_label_mapping_human[1] == "person"
    assert get_label_id_mapping() is label_id_mapping_ade20k
    assert get_label_id_mapping(use_human_mask=True) is label_id_mapping_human
    assert get_class_ids_from_labels(["wall", "flag"]) == [0, 149]
    assert get_class_ids_from_labels(["person"], use_human_mask=True) == [1]


def test_image_size_batch_sampler():
    from nerf_tpu.data.samplers import ImageSizeBatchSampler

    s = ImageSizeBatchSampler(range(10), batch_size=4, min_size=256,
                              max_size=480, divisor=32, seed=0)
    batches = list(s)
    assert len(batches) == len(s) == 3
    assert [len(b) for b in batches] == [4, 4, 2]
    seen_sizes = set()
    for b in batches:
        idxs = [x[0] for x in b]
        sizes = {(h, w) for _, h, w in b}
        assert len(sizes) == 1  # one size per batch
        (h, w), = sizes
        assert h % 32 == 0 and w % 32 == 0
        assert 256 <= h <= 512 and 256 <= w <= 512
        seen_sizes.add((h, w))
        assert all(isinstance(i, int) for i in idxs)
    assert len(seen_sizes) > 1  # sizes vary across batches

    s2 = ImageSizeBatchSampler(range(10), batch_size=4, drop_last=True)
    assert len(list(s2)) == len(s2) == 2
