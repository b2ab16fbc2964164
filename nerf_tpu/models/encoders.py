"""Positional (frequency / fourier-feature) encoding.

Behavioral parity target: reference ``src/models/encoding/freq.py`` with the
kwargs from ``src/models/encoding/__init__.py:7-18`` — include_input=True,
log-sampled bands 2**linspace(0, freq-1, freq), periodic fns [sin, cos].

Output channel layout (must match for weight-porting parity):
    [x, sin(2^0 x), cos(2^0 x), sin(2^1 x), cos(2^1 x), ...]
i.e. per frequency the full input vector under sin then cos.
out_dim = d * (2*num_freqs + 1):  xyz 10 freqs -> 63, dir 4 freqs -> 27.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def freq_bands(num_freqs: int, log_sampling: bool = True) -> np.ndarray:
    max_freq = num_freqs - 1
    if log_sampling:
        return 2.0 ** np.linspace(0.0, max_freq, num_freqs)
    return np.linspace(2.0**0.0, 2.0**max_freq, num_freqs)


def freq_encode(x: jnp.ndarray, num_freqs: int, include_input: bool = True) -> jnp.ndarray:
    """Fourier-feature encode the last axis of ``x``.

    x: [..., d] -> [..., d*(2*num_freqs + int(include_input))]
    """
    bands = jnp.asarray(freq_bands(num_freqs), dtype=x.dtype)  # [F]
    # [..., F, d]: x scaled by each band
    xb = x[..., None, :] * bands[:, None]
    # per band: sin then cos, matching the reference's [sin, cos] fn order
    enc = jnp.concatenate([jnp.sin(xb), jnp.cos(xb)], axis=-1)  # [..., F, 2d]
    enc = enc.reshape(*x.shape[:-1], 2 * num_freqs * x.shape[-1])
    if include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc


def freq_out_dim(input_dim: int, num_freqs: int, include_input: bool = True) -> int:
    return input_dim * (2 * num_freqs + int(include_input))


def get_encoder(enc_cfg):
    """Encoder factory mirroring reference ``src/models/encoding/__init__.py:6``.

    Returns ``(encode_fn, out_dim)``.
    """
    etype = enc_cfg["type"]
    if etype == "frequency":
        d, f = int(enc_cfg["input_dim"]), int(enc_cfg["freq"])
        return (lambda x: freq_encode(x, f)), freq_out_dim(d, f)
    raise ValueError(f"unknown encoder type: {etype}")
