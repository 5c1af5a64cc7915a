"""Integer bit-manipulation primitives for the TPU codec, in jnp.

The CUDA reference uses PTX intrinsics (__umulhi, __clz, funnel-shift rotates
— utils/PtxUtils.cuh). TPU has no 64-bit scalar unit exposed through XLA by
default, so the wide operations are built from 16/32-bit vector ops, which
map directly onto the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

U32 = jnp.uint32
U16 = jnp.uint16


def u32(x):
    return jnp.asarray(x, U32)


def umulhi(a: jax.Array, b: jax.Array) -> jax.Array:
    """High 32 bits of the 64-bit product of two uint32 arrays.

    Decomposed into 16-bit partial products so it runs on 32-bit VPU lanes
    (replaces PTX __umulhi; reference use: GpuANSEncode.cuh:79).
    """
    a = a.astype(U32)
    b = b.astype(U32)
    a_lo = a & u32(0xFFFF)
    a_hi = a >> u32(16)
    b_lo = b & u32(0xFFFF)
    b_hi = b >> u32(16)

    lo = a_lo * b_lo
    m1 = a_lo * b_hi
    m2 = a_hi * b_lo
    hi = a_hi * b_hi

    # carry-correct accumulation of the middle partials
    t = (lo >> u32(16)) + (m1 & u32(0xFFFF)) + (m2 & u32(0xFFFF))
    return hi + (m1 >> u32(16)) + (m2 >> u32(16)) + (t >> u32(16))


def clz32(x: jax.Array) -> jax.Array:
    """Count leading zeros of uint32 (clz(0) == 32)."""
    return jax.lax.clz(x.astype(U32)).astype(U32)


def rotl16(x: jax.Array, k: int) -> jax.Array:
    x = x.astype(U16)
    return (x << U16(k)) | (x >> U16(16 - k))


def rotr16(x: jax.Array, k: int) -> jax.Array:
    x = x.astype(U16)
    return (x >> U16(k)) | (x << U16(16 - k))


def rotl32(x: jax.Array, k: int) -> jax.Array:
    x = x.astype(U32)
    return (x << u32(k)) | (x >> u32(32 - k))


def rotr32(x: jax.Array, k: int) -> jax.Array:
    x = x.astype(U32)
    return (x >> u32(k)) | (x << u32(32 - k))


def udiv_u43_by_u32(a_hi: jax.Array, divisor: jax.Array) -> jax.Array:
    """floor((a_hi << 32) / divisor) via 16-bit long division.

    Used for the magic-constant computation
    magic = (2^32 * (2^shift - pdf)) / pdf + 1 (GpuANSStatistics.cuh:345-358)
    where a_hi = 2^shift - pdf < pdf, so the quotient fits in uint32.
    """
    a_hi = a_hi.astype(U32)
    divisor = divisor.astype(U32)
    q1 = (a_hi << u32(16)) // divisor
    r1 = (a_hi << u32(16)) - q1 * divisor
    q2 = (r1 << u32(16)) // divisor
    return (q1 << u32(16)) + q2


# The u32<->u8 bitcast goes through a [..., 4]-minor intermediate whose
# lane dim XLA:TPU pads from 4 to the 128-lane tile — when the compiler
# materializes that copy (it does for ~0.5 GiB graphs) the temp is a 32x
# expansion and compress of 123M fp32 floats OOMs HBM. Above the word
# threshold the conversion runs as a lax.map over fixed flat chunks, so
# the padded temp is bounded at _BC_CHUNK*128 bytes regardless of size;
# flat chunking is pure reshapes, no data movement beyond the convert.
_BC_CHUNK = 1 << 21  # u32 words per chunk (8 MiB raw, 256 MiB padded temp)
_BC_MIN_WORDS = 1 << 26  # chunk only above 256 MiB arrays


def bitcast_u32_to_u8(x: jax.Array) -> jax.Array:
    """uint32[..., n] -> uint8[..., 4n], little-endian byte order."""
    words = x.size
    if words >= _BC_MIN_WORDS:
        C = -(-words // _BC_CHUNK)
        flat = jnp.pad(x.reshape(-1), (0, C * _BC_CHUNK - words))

        def one(c):
            return jax.lax.bitcast_convert_type(c, jnp.uint8).reshape(-1)

        b = jax.lax.map(one, flat.reshape(C, _BC_CHUNK)).reshape(-1)
        return b[: words * 4].reshape(*x.shape[:-1], x.shape[-1] * 4)
    b = jax.lax.bitcast_convert_type(x, jnp.uint8)
    return b.reshape(*x.shape[:-1], x.shape[-1] * 4)


def bitcast_u8_to_u32(x: jax.Array) -> jax.Array:
    """uint8[..., 4n] -> uint32[..., n], little-endian byte order."""
    words = x.size // 4
    if words >= _BC_MIN_WORDS:
        C = -(-words // _BC_CHUNK)
        flat = jnp.pad(x.reshape(-1), (0, 4 * (C * _BC_CHUNK - words)))

        def one(c):
            return jax.lax.bitcast_convert_type(
                c.reshape(_BC_CHUNK, 4), U32
            )

        w = jax.lax.map(one, flat.reshape(C, 4 * _BC_CHUNK)).reshape(-1)
        return w[:words].reshape(*x.shape[:-1], x.shape[-1] // 4)
    b = x.reshape(*x.shape[:-1], x.shape[-1] // 4, 4)
    return jax.lax.bitcast_convert_type(b, U32)


def bitcast_u32_to_u16(x: jax.Array) -> jax.Array:
    b = jax.lax.bitcast_convert_type(x, jnp.uint16)
    return b.reshape(*x.shape[:-1], x.shape[-1] * 2)


def bitcast_u16_to_u32(x: jax.Array) -> jax.Array:
    b = x.reshape(*x.shape[:-1], x.shape[-1] // 2, 2)
    return jax.lax.bitcast_convert_type(b, U32)
