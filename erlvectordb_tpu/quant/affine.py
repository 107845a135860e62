"""Affine (min/max) 8-bit and 4-bit quantization, batched on device.

Same scheme as the reference's quantization algorithms — per-vector min/max
affine scaling to unsigned codes, with nibble packing for 4-bit
(reference: src/vector_compression.erl:167-204 and pack/unpack :311-329) —
but computed as batched VPU programs instead of per-element list folds, and
with the packing done in integer vector ops.

Round-trip error bounds (asserted by tests, mirroring the reference's
compression_SUITE bounds): 8-bit max-abs error <= range/255, 4-bit <= range/15.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _minmax_scale(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    mn = jnp.min(x, axis=-1, keepdims=True)
    mx = jnp.max(x, axis=-1, keepdims=True)
    rng = mx - mn
    scale = jnp.where(rng > 0, rng, 1.0)
    return mn, scale


@jax.jit
def quantize_u8(x: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """[..., D] f32 -> (codes uint8 [..., D], min [..., 1], scale [..., 1])."""
    x = jnp.asarray(x, jnp.float32)
    mn, scale = _minmax_scale(x)
    codes = jnp.clip(jnp.round((x - mn) / scale * 255.0), 0, 255).astype(jnp.uint8)
    return codes, mn, scale


@jax.jit
def dequantize_u8(codes: jax.Array, mn: jax.Array, scale: jax.Array) -> jax.Array:
    return codes.astype(jnp.float32) / 255.0 * scale + mn


@jax.jit
def quantize_u4(x: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """[..., D] f32 -> (packed uint8 [..., ceil(D/2)], min, scale).

    Two 4-bit codes per byte, first value in the high nibble (the packing
    order of reference pack_4bit_values, src/vector_compression.erl:311-320).
    D is padded to even with a zero code before packing.
    """
    x = jnp.asarray(x, jnp.float32)
    mn, scale = _minmax_scale(x)
    codes = jnp.clip(jnp.round((x - mn) / scale * 15.0), 0, 15).astype(jnp.uint8)
    d = codes.shape[-1]
    if d % 2:
        pad = [(0, 0)] * (codes.ndim - 1) + [(0, 1)]
        codes = jnp.pad(codes, pad)
    hi = codes[..., 0::2]
    lo = codes[..., 1::2]
    return (hi << 4 | lo).astype(jnp.uint8), mn, scale


@functools.partial(jax.jit, static_argnames=("dim",))
def dequantize_u4(packed: jax.Array, mn: jax.Array, scale: jax.Array, *, dim: int) -> jax.Array:
    hi = (packed >> 4).astype(jnp.float32)
    lo = (packed & 0xF).astype(jnp.float32)
    codes = jnp.stack([hi, lo], axis=-1).reshape(*packed.shape[:-1], packed.shape[-1] * 2)
    codes = codes[..., :dim]
    return codes / 15.0 * scale + mn
