"""Multi-resolution hash-grid encoder (instant-NGP style), pure JAX.

Parity targets in the reference:
- pure-torch ``src/models/encoding/hashgrid.py:12-132`` (HashGrid): per-level
  resolution N_l = floor(N_min * b**l), spatial hash with primes
  [1, 19349663, 83492791] XOR-combined mod table size, trilinear
  interpolation of 8 corner features, concat over levels.
- CUDA ``src/models/encoding/hashencoder/`` (tcnn-style level geometry,
  fp16 tables): direct (non-hashed) indexing when a level's dense grid fits
  in the table, hashing otherwise (hashencoder.cu:36-76).

TPU-native: the table is one [L, T, F] array; lookups are XLA gathers and
gradients scatter-add into the table automatically.

Performance note (measured on v5e, scripts/gather_microbench.py —
docs/PERF.md "Gather cost model"): TPU row-gather cost is dominated by a
per-ROW charge that grows only sub-linearly with row width (116 Melem/s at
width 1 -> 1,657 Melem/s at width 128), so the lookup is gather-latency
bound and WIDE rows amortize. Hence: (a) all levels are fetched in ONE
flat row gather, (b) the ``cellpack`` layout packs a cell's 8 corner
features into one wide row (8x fewer rows, 4.9x measured forward; the
backward's wide-row scatter-add is likewise ~5.7x faster than the
corner layout's narrow scatters; END-TO-END the cellpack train step is
6.7x faster than corner — 3,292 vs 492 rays/s, scripts/diag_hash_r4.py.
Round 3 measured the opposite only because the int32 dense-flag overflow
produced negative scatter indices; see docs/PERF.md), (c) the table
defaults to
bfloat16 (tcnn keeps fp16 tables, hashencoder/hashgrid.py:15-118 casts to
half — parity), (d) pair hashgrid configs with fine-pass ESS compaction
(RenderOptions.ess_compaction) to cut queried points.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

# instant-NGP hash primes (first D used for a D-dim grid)
_PRIMES = (1, 2654435761, 805459861, 3674653429)


def level_resolutions(
    n_levels: int = 16,
    base_resolution: int = 16,
    per_level_scale: float = 1.3819,  # ~2^19 max at L=16 like tcnn defaults
) -> np.ndarray:
    return np.floor(
        base_resolution * per_level_scale ** np.arange(n_levels)
    ).astype(np.int32)


def init_hashgrid(
    key,
    n_levels: int = 16,
    n_features: int = 2,
    log2_table_size: int = 19,
    base_resolution: int = 16,
    per_level_scale: float = 1.3819,
    init_scale: float = 1e-4,
    dtype=jnp.bfloat16,
    layout: str = "corner",
    input_dim: int = 3,
) -> Dict:
    """Returns {table}; table init U(-1e-4, 1e-4).

    layout:
      - "corner" (reference parity): table [L, T, F]; each of the 2^D
        trilinear corners is hashed and gathered separately (8 narrow row
        gathers per point-level — the instant-NGP formulation,
        hashencoder.cu:78-140).
      - "cellpack" (TPU-native): table [L, T/2^D, 2^D*F]; ONE row per
        (point, level) holds all 2^D corner features of the point's CELL.
        8x fewer gathered rows at identical memory/elements — built for
        TPU gathers, whose cost scales with row count, not row width.
        Divergence from instant-NGP: adjacent cells no longer share corner
        entries, so the encoding is DISCONTINUOUS across every cell face at
        every level (instant-NGP hash collisions alias entries but keep the
        interpolated field continuous — both sides of a face read the same
        rows). Trilinear and C0 within each cell only; grid-seam artifacts
        are a real risk — quality is tracked by the trained cellpack runs
        (EVAL_r4 10-epoch probe showed no seam catastrophe; EVAL_r5 carries
        the converged number). End-to-end cellpack TRAINING is ~6.7x FASTER
        than corner (3,292 vs 492 rays/s, scripts/diag_hash_r4.py) — the
        round-3 "6.6x slower" was the int32 dense-flag overflow driving
        negative scatter indices, fixed + regression-tested (docs/PERF.md
        "contradiction RESOLVED").
    """
    T = 1 << log2_table_size
    if layout == "cellpack":
        shape = (n_levels, T >> input_dim, (1 << input_dim) * n_features)
    else:
        shape = (n_levels, T, n_features)
    table = jax.random.uniform(
        key, shape, jnp.float32, -init_scale, init_scale
    ).astype(dtype)
    # only the trainable table lives in the param pytree; level geometry is
    # derived statically from the config (level_resolutions) so optimizers
    # never see integer leaves
    return {"table": table}


def _corner_index(corner: jnp.ndarray, res: jnp.ndarray, table_size: int,
                  dense: jnp.ndarray) -> jnp.ndarray:
    """corner: [..., D] int32 grid coords (D in 2..4); res: level resolution.

    Direct indexing when the dense level grid fits in the table (``dense``,
    computed host-side in int64 — int32 (res+1)**D overflows for fine
    levels), else the instant-NGP XOR hash (hashencoder.cu:36-76 behavior).
    """
    D = corner.shape[-1]
    # direct: sum_d corner_d * (res+1)^d
    stride = res + 1
    direct_idx = corner[..., 0]
    mult = stride
    for d in range(1, D):
        direct_idx = direct_idx + corner[..., d] * mult
        mult = mult * stride
    # XOR hash in wrapping uint32 arithmetic (the primes exceed int32)
    cu = corner.astype(jnp.uint32)
    h = cu[..., 0] * jnp.uint32(_PRIMES[0])
    for d in range(1, D):
        h = h ^ (cu[..., d] * jnp.uint32(_PRIMES[d]))
    hash_idx = (h % jnp.uint32(table_size)).astype(jnp.int32)
    return jnp.where(dense, direct_idx % table_size, hash_idx)


def _cell_index(cell: jnp.ndarray, res: jnp.ndarray, n_rows: int,
                dense: jnp.ndarray) -> jnp.ndarray:
    """cell: [..., D] int32 base-cell coords in [0, res); one row per CELL.

    Direct indexing when the res^D dense cell grid fits in n_rows (``dense``
    computed host-side in int64 to dodge int32 overflow at fine levels),
    else the instant-NGP XOR hash (cellpack layout).
    """
    D = cell.shape[-1]
    direct_idx = cell[..., 0]
    mult = res
    for d in range(1, D):
        direct_idx = direct_idx + cell[..., d] * mult
        mult = mult * res
    cu = cell.astype(jnp.uint32)
    h = cu[..., 0] * jnp.uint32(_PRIMES[0])
    for d in range(1, D):
        h = h ^ (cu[..., d] * jnp.uint32(_PRIMES[d]))
    hash_idx = (h % jnp.uint32(n_rows)).astype(jnp.int32)
    return jnp.where(dense, direct_idx % n_rows, hash_idx)


from functools import partial


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _gather_rows_narrow_bwd(table2d: jnp.ndarray, flat_idx: jnp.ndarray,
                            sub: int) -> jnp.ndarray:
    """Row gather whose BACKWARD scatter-adds in ``sub`` narrow pieces.

    NEGATIVE RESULT, kept for documentation + the gradient-parity test:
    the hypothesis was that wide-row scatter-add lowers badly on TPU, but
    the measurement says the opposite (scripts/scatter_microbench.py:
    wide-row scatter 260 ms vs 1,486 ms for this narrow-split of the same
    update volume — scatter cost is per-ROW, like gathers). The cellpack
    encode therefore uses the PLAIN gather, whose autodiff transpose is
    the fast wide-row scatter. Do not use this in hot paths.
    """
    return table2d[flat_idx]


def _gather_rows_fwd(table2d, flat_idx, sub):
    return table2d[flat_idx], (table2d.shape, flat_idx)


def _gather_rows_bwd(sub, res, ct):
    (n_rows, W), flat_idx = res
    f = W // sub
    idx_sub = (flat_idx[:, None] * sub
               + jnp.arange(sub, dtype=flat_idx.dtype)[None]).reshape(-1)
    grad = jnp.zeros((n_rows * sub, f), ct.dtype).at[idx_sub].add(
        ct.reshape(-1, f))
    return (grad.reshape(n_rows, W),
            np.zeros(flat_idx.shape, jax.dtypes.float0))


_gather_rows_narrow_bwd.defvjp(_gather_rows_fwd, _gather_rows_bwd)


@jax.custom_vjp
def _gather_rows_slotpack_bwd(table2d: jnp.ndarray,
                              flat_idx: jnp.ndarray) -> jnp.ndarray:
    """Row gather whose BACKWARD scatter-adds 8 consecutive table rows as
    one 8x-wide "super-row" per update (round-5 winner).

    The cellpack train step is scatter-add bound (260 of 311 ms,
    docs/PERF.md): the gather's autodiff transpose scatters 3.1M 16-wide
    rows at ~12 Mrows/s. Scatter cost is per-ROW and sublinear in width,
    so packing each cotangent row into slot ``idx % 8`` of a 128-wide
    update addressed at ``idx // 8`` trades 8x more scattered elements
    (cheap, bandwidth) for 8x-wider rows at the SAME row count, which the
    per-row cost model rewards — measured 1.64x over the plain transpose
    on a duplication-realistic index mix (scripts/scatter_strategies_r5.py:
    434 vs 713 ms; `sorted` with indices_are_sorted measured WORSE, 832).
    The forward is the identical plain gather. Requires n_rows % 8 == 0
    (cellpack tables are [L * 2^16] rows). Gradient parity vs the plain
    transpose is tested in tests/test_hashgrid.py.
    """
    return table2d[flat_idx]


def _slotpack_fwd(table2d, flat_idx):
    return table2d[flat_idx], (table2d.shape, flat_idx)


def _slotpack_bwd(res, ct):
    (n_rows, W), flat_idx = res
    super_idx = flat_idx >> 3
    slot = flat_idx & 7
    wide = (ct[:, None, :]
            * jax.nn.one_hot(slot, 8, dtype=ct.dtype)[..., None]
            ).reshape(ct.shape[0], 8 * W)
    grad = jnp.zeros((n_rows >> 3, 8 * W), ct.dtype).at[super_idx].add(wide)
    return (grad.reshape(n_rows, W),
            np.zeros(flat_idx.shape, jax.dtypes.float0))


_gather_rows_slotpack_bwd.defvjp(_slotpack_fwd, _slotpack_bwd)


def hashgrid_encode(
    params: Dict,
    pts: jnp.ndarray,
    resolutions=None,
    bbox_min: float = -2.0,
    bbox_max: float = 2.0,
    base_resolution: int = 16,
    per_level_scale: float = 1.3819,
    layout: str = "corner",
) -> jnp.ndarray:
    """pts: [N, 3] -> features [N, L*F] via trilinear interpolation.

    ``resolutions``: [L] per-level grid sizes; derived from
    (base_resolution, per_level_scale) when not given.
    ``layout``: must match the ``init_hashgrid`` layout ("corner" gathers
    2^D rows per point-level; "cellpack" gathers one wide row — see
    init_hashgrid).
    """
    import itertools

    # checkpoints restore as numpy arrays; numpy fancy-indexing rejects
    # traced indices, so make the table a jnp array up front
    table = jnp.asarray(params["table"])
    L = table.shape[0]
    if resolutions is None:
        resolutions = level_resolutions(L, base_resolution, per_level_scale)
    res_np = np.asarray(resolutions).astype(np.int64)  # static per level
    res = jnp.asarray(resolutions)  # [L]

    D = pts.shape[-1]
    x = (pts - bbox_min) / (bbox_max - bbox_min)
    x = jnp.clip(x, 0.0, 1.0 - 1e-6)

    # [L, N, D] scaled coordinates
    xl = x[None] * res[:, None, None].astype(x.dtype)
    x0 = jnp.floor(xl)
    frac = xl - x0
    x0 = x0.astype(jnp.int32)

    # 2^D corners: offsets [2^D, D]
    offs = jnp.asarray(list(itertools.product((0, 1), repeat=D)), jnp.int32)

    if layout == "cellpack":
        _, Tc, row_w = table.shape
        F = row_w >> D
        dense_lv = jnp.asarray(res_np**D <= Tc)  # [L] bool, int64 host-side
        idx = jax.vmap(lambda c, r, d: _cell_index(c, r, Tc, d))(
            x0, res, dense_lv)  # [L, N]
        flat_idx = (
            idx + (jnp.arange(L, dtype=idx.dtype) * Tc)[:, None]
        ).reshape(-1)
        # gather with the slotpack backward: the plain gather's autodiff
        # transpose (3.1M 16-wide row scatter-adds, 260 ms — the train
        # step's dominant cost) is replaced by a custom VJP that scatters
        # the same rows packed 8-per-128-wide super-row (1.64x, round-5
        # measurement — see _gather_rows_slotpack_bwd). The narrow-split
        # VJP (_gather_rows_narrow_bwd) measured 5.7x WORSE and is kept
        # only as a documented negative result.
        feats = _gather_rows_slotpack_bwd(
            table.reshape(L * Tc, row_w), flat_idx
        ).reshape(
            L, x.shape[0], 1 << D, F
        )  # [L, N, 2^D, F] — ONE gathered row per (point, level)
    else:
        _, T, F = table.shape
        corners = x0[:, :, None, :] + offs[None, None]  # [L, N, 2^D, D]
        dense_lv = jnp.asarray((res_np + 1) ** D <= T)  # [L] bool, int64
        idx = jax.vmap(lambda c, r, d: _corner_index(c, r, T, d))(
            corners, res, dense_lv)
        # one flat row gather over all (level, point, corner) triples — TPU
        # gathers are scalar-latency bound, so never gather feature elements
        # separately (take_along_axis with a size-1 trailing index dim does)
        flat_idx = (
            idx + (jnp.arange(L, dtype=idx.dtype) * T)[:, None, None]
        ).reshape(-1)
        feats = table.reshape(L * T, F)[flat_idx].reshape(
            L, *idx.shape[1:], F
        )  # [L, N, 2^D, F]

    # trilinear weights per corner (interpolate in f32 whatever the table)
    w = jnp.where(offs[None, None] == 1, frac[:, :, None, :],
                  1.0 - frac[:, :, None, :])  # [L, N, 8, 3]
    w = jnp.prod(w, axis=-1, keepdims=True)  # [L, N, 8, 1]
    out = jnp.sum(feats.astype(w.dtype) * w, axis=2)  # [L, N, F]
    return jnp.moveaxis(out, 0, 1).reshape(x.shape[0], L * F)


def hashgrid_out_dim(n_levels: int = 16, n_features: int = 2) -> int:
    return n_levels * n_features
