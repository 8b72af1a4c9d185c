"""Bit-parallel prefix-automaton Pallas kernel (KMP's TPU execution engine).

The classic KMP scan is ``state = dfa[state, byte]`` — a 2-D table gather
whose general form Mosaic does not support (tpu.dynamic_gather requires
operand/indices/output to share one 2-D shape; see kernels/swar.py for the
other hardware constraints).  The bit-parallel Shift-AND automaton
(Baeza-Yates–Gonnet) computes the *same* prefix-automaton semantics — bit j
of the state word D is "pattern prefix of length j+1 ends at this byte" —
with a transition that IS expressible on the VPU:

    D = ((D << 1) | 1) & B[byte]        # branchless automaton step
    match ends here  <=>  bit (m-1) of D

``B[c]`` (bit j set iff pattern[j] == c) is a 256-entry table looked up per
byte via two lane-wise ``tpu.dynamic_gather``s over lane-replicated (8, 128)
halves plus a select.  One int32 state word per lane supports m <= 32; the
dense-DFA jnp path (ops/kmp.py) remains the reference implementation and
serves longer patterns.

Decomposition: each (128, W)-word tile = 128 chunks x 8 sub-chunks, giving
1024 independent automata, one per VPU element of an (8, 128) register —
full occupancy.  A sub-chunk owns matches STARTING in its C/8 bytes and
scans (m-1) halo bytes past its end (prefix-automaton state at a match
start depends only on bytes [start, start+m), so starting each automaton
cold at its sub-chunk is exact — SURVEY.md §7.4 item 6).

Emits the same nibble-mask contract as kernels/swar.py, in sub-chunk-major
layout (8, W8, L); ``nibble3_to_bool`` restores byte order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .swar import DEFAULT_CHUNK_BYTES, MIN_KERNEL_BYTES

MAX_SHIFT_AND_PATTERN = 32  # one int32 state word per lane


def shift_and_supported(m: int) -> bool:
    return 1 <= m <= MAX_SHIFT_AND_PATTERN


def b_table(pattern: np.ndarray) -> np.ndarray:
    """int32[2, 8, 128]: lane-replicated B-table halves.

    B[c] bit j == (pattern[j] == c); halves [0]=c<128, [1]=c>=128, each
    broadcast across the 8 sublanes so a lane-wise dynamic_gather with
    indices (c & 127) reads it directly.
    """
    pat = np.asarray(pattern, dtype=np.uint8)
    B = np.zeros(256, dtype=np.uint32)
    for j, c in enumerate(pat):
        B[c] |= np.uint32(1) << np.uint32(j)
    halves = B.view(np.int32).reshape(2, 128)
    return np.broadcast_to(halves[:, None, :], (2, 8, 128)).copy()


def _kernel(n_ref, blo_ref, bhi_ref, x3_ref, nib3_ref, *, W8, HS, m, Cp):
    """x3_ref: (8, W8+HS, 128) words — sub-chunk s of chunk l at [s, :, l].
    nib3_ref: (8, W8, 128) int32 — bit b of [s, tw, l] = match starting at
    byte 4*tw+b of sub-chunk s of chunk l."""
    nib3_ref[...] = jnp.zeros((8, W8, 128), jnp.int32)
    blo = blo_ref[:]
    bhi = bhi_ref[:]
    q, r = divmod(m - 1, 4)

    def step(tw, D):
        wv = x3_ref[:, pl.ds(tw, 1), :].reshape(8, 128)
        lo_bits = jnp.zeros((8, 128), jnp.int32)
        hi_bits = jnp.zeros((8, 128), jnp.int32)
        for b in range(4):
            c = (wv >> (8 * b)) & 0xFF
            g_lo = jnp.take_along_axis(blo, c & 127, axis=1)
            g_hi = jnp.take_along_axis(bhi, c & 127, axis=1)
            Bc = jnp.where(c < 128, g_lo, g_hi)
            D = ((D << 1) | 1) & Bc
            hit = jax.lax.shift_right_logical(D, m - 1) & 1
            # match ends at byte t=4*tw+b -> starts at sb = t-(m-1)
            #   = 4*(tw-q) + (b-r): bits b>=r land in word tw-q at bit b-r,
            #   bits b<r in word tw-q-1 at bit b+4-r.
            if b >= r:
                lo_bits |= hit << (b - r)
            else:
                hi_bits |= hit << (b + 4 - r)
        w2 = tw - q  # start-word for the b >= r bits (r is static)

        if r > 0:  # bits from b < r land one word earlier
            @pl.when((w2 >= 1) & (w2 - 1 < W8))
            def _():
                nib3_ref[:, pl.ds(w2 - 1, 1), :] = (
                    nib3_ref[:, pl.ds(w2 - 1, 1), :]
                    | hi_bits.reshape(8, 1, 128)
                )

        @pl.when((w2 >= 0) & (w2 < W8))
        def _():
            nib3_ref[:, pl.ds(w2, 1), :] = (
                nib3_ref[:, pl.ds(w2, 1), :] | lo_bits.reshape(8, 1, 128)
            )

        return D

    jax.lax.fori_loop(0, W8 + HS, step, jnp.zeros((8, 128), jnp.int32))


@functools.lru_cache(maxsize=256)
def _build_call(Nk: int, C: int, m: int, interpret: bool):
    W = C // 4
    W8 = W // 8
    Cp = C // 8
    HS = max(1, -(-(m - 1) // 4))  # halo words per sub-chunk
    L = Nk // C
    nt = L // 128
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # n (unused; kept for interface symmetry)
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # blo (8,128)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bhi (8,128)
            pl.BlockSpec((8, W8 + HS, 128), lambda i, n: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, W8, 128), lambda i, n: (0, 0, i),
                               memory_space=pltpu.VMEM),
    )
    kern = functools.partial(_kernel, W8=W8, HS=HS, m=m, Cp=Cp)
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, W8, L), jnp.int32),
        interpret=interpret,
    )


def _layout(words: jnp.ndarray, L: int, W: int, HS: int):
    """(8, W8+HS, L) sub-chunk-major word layout with per-sub-chunk halos."""
    W8 = W // 8
    wr = words.reshape(L * 8, W8)  # row j = sub-chunk j (global order)
    halo = jnp.concatenate(
        [wr[1:, :HS], jnp.zeros((1, HS), jnp.int32)], axis=0
    )  # next sub-chunk's first HS words
    x3 = wr.reshape(L, 8, W8).transpose(1, 2, 0)      # (8, W8, L)
    h3 = halo.reshape(L, 8, HS).transpose(1, 2, 0)    # (8, HS, L)
    return jnp.concatenate([x3, h3], axis=1)          # (8, W8+HS, L)


def nibble3_to_bool(nib3: jnp.ndarray) -> jnp.ndarray:
    """(8, W8, L) sub-chunk-major nibble mask -> bool[N] in byte order."""
    byte_major = nib3.transpose(2, 0, 1)  # (L, 8, W8)
    bits = (byte_major[..., None] >> jnp.arange(4, dtype=jnp.int32)) & 1
    return bits.astype(jnp.bool_).reshape(-1)


def kmp_mask(text_u8, n, blo, bhi, m, *,
             chunk_bytes: int = DEFAULT_CHUNK_BYTES,
             interpret: bool = False, jnp_tail_mask=None):
    """bool[N] start mask via the Shift-AND prefix automaton, or None if
    the input is below the kernel threshold.  ``blo``/``bhi`` come from
    ``b_table`` (tables dict).  Validity for n is applied downstream."""
    N = text_u8.shape[0]
    C = chunk_bytes
    tile_bytes = 128 * C
    Nk = (N // tile_bytes) * tile_bytes
    if Nk < max(tile_bytes, MIN_KERNEL_BYTES):
        return None
    W = C // 4
    HS = max(1, -(-(m - 1) // 4))
    L = Nk // C
    words = jax.lax.bitcast_convert_type(
        text_u8[:Nk].reshape(-1, 4), jnp.int32
    )
    x3e = _layout(words, L, W, HS)
    call = _build_call(Nk, C, m, interpret)
    nib3 = call(jnp.asarray(n, jnp.int32).reshape(1), blo, bhi, x3e)
    kmask = nibble3_to_bool(nib3)  # bool[Nk]

    cut = Nk - (m - 1) if m > 1 else Nk
    tail_mask = jnp_tail_mask(text_u8[cut:])
    return jnp.concatenate([kmask[:cut], tail_mask])
