"""Pallas TPU kernels for the hot small-block ops.

The reference leans on Eigen for tiny dense algebra (3x3 inverses,
pba_inverseV, /root/reference/linux/src/LinearSFMImp/LinearSFMImp.cpp:3022-3042)
and hand-unrolled block arithmetic. On TPU these are VPU workloads; the
kernels here keep them in VMEM with lane-friendly layouts:

* ``inv3x3_sym``: batched closed-form symmetric 3x3 inverse over a
  structure-of-arrays layout — the [N,3,3] batch is viewed as six [N] planes
  (symmetric blocks), tiled (8,128) on the VPU.
* ``block_congruence``: batched D_i^T B D_j over 6x6 blocks as explicit
  multiply-accumulate (MXU is wasted on 6-wide operands; the VPU fuses this).

Every kernel has an identical-semantics jnp fallback (ops/schur.py) used on
non-TPU backends and in tests; `use_pallas()` gates dispatch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # noqa: BLE001
        return False


def _inv3x3_kernel(a_ref, b_ref, c_ref, d_ref, e_ref, f_ref,
                   oa, ob, oc, od, oe, of_):
    a, b, c = a_ref[...], b_ref[...], c_ref[...]
    d, e, f = d_ref[...], e_ref[...], f_ref[...]
    A = d * f - e * e
    B = c * e - b * f
    C = b * e - c * d
    D = a * f - c * c
    E = b * c - a * e
    F = a * d - b * b
    det = a * A + b * B + c * C
    zero = det == 0
    inv_det = jnp.where(zero, 0.0, 1.0 / jnp.where(zero, 1.0, det))
    oa[...] = A * inv_det
    ob[...] = B * inv_det
    oc[...] = C * inv_det
    od[...] = D * inv_det
    oe[...] = E * inv_det
    of_[...] = F * inv_det


@functools.partial(jax.jit, static_argnames=("interpret",))
def inv3x3_sym(V: jax.Array, interpret: bool = False) -> jax.Array:
    """EXPERIMENTAL Pallas batched symmetric 3x3 inverse (test-only).

    Same semantics as schur.inv3x3_sym (zero blocks -> zero), which is what
    production dispatches: XLA already fuses the closed form into adjacent
    elementwise work, and this kernel has not measured faster in situ. Kept
    as the SoA-layout Pallas reference for future V-side fusion work."""
    N = V.shape[0]
    lanes = 128
    sub = 8
    tile = lanes * sub
    Np = ((N + tile - 1) // tile) * tile
    Vp = jnp.pad(V, ((0, Np - N), (0, 0), (0, 0)))
    # symmetric components as planes, shaped [rows, 128]
    rows = Np // lanes
    comp = [Vp[:, i, j].reshape(rows, lanes)
            for (i, j) in ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2))]

    spec = pl.BlockSpec((sub, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((rows, lanes), V.dtype)
    outs = pl.pallas_call(
        _inv3x3_kernel,
        grid=(rows // sub,),
        in_specs=[spec] * 6,
        out_specs=[spec] * 6,
        out_shape=[shape] * 6,
        interpret=interpret,
    )(*comp)
    a, b, c, d, e, f = [o.reshape(Np)[:N] for o in outs]
    row0 = jnp.stack([a, b, c], axis=-1)
    row1 = jnp.stack([b, d, e], axis=-1)
    row2 = jnp.stack([c, e, f], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


# ---------------------------------------------------------------------------
# Block-COO -> dense assembly
# ---------------------------------------------------------------------------
#
# The dense Schur path (ops/schur._assemble_schur_dense) must materialize
# [6M, 3N] / [6M, 6M] layouts from block-COO lists. The jnp formulation is an
# element-flattened scatter-add: exact and fast to EXECUTE (~50ms at the
# NC3500-root scale) but catastrophic to COMPILE on this TPU — XLA's scatter
# compile cost scales with the number of scattered elements (~50s per million;
# measured 86s / 93MB executable for the KW*18 = 1.6M-element W scatter at a
# 2048-map root join). A window-scatter (lax.scatter_add of [6,3] blocks)
# compiles in <1s but serializes at runtime (~470ms). This kernel gets both:
# compile in seconds, execute at HBM speed.
#
# Design: the output is processed in row stripes of `rtile` pose blocks
# ([6*rtile, C*N] in VMEM). Entries stream through the grid in chunks of `kc`;
# each (stripe, chunk) step scans the chunk serially on the scalar unit and
# accumulates the [6,C] blocks that land in the stripe. A per-chunk row range
# (rmin/rmax, prefetched to SMEM) skips chunks that cannot intersect the
# stripe: with row-sorted entry lists (the natural layout out of a pairwise
# join: end rows < M1 <= cur rows) the scan cost is O(K + chunks), not
# O(K * stripes). Unsorted lists stay CORRECT and degrade to the full scan —
# the mono join's remapped scale-pose entries (core/join.py slotmap2) only
# widen the ranges of the chunks they sit in.

def _coo_dense_kernel(rmin_ref, rmax_ref, rows_ref, tb_ref, sh_ref, vals_ref,
                      out_ref, *, rtile: int, R: int, C: int, kc: int):
    # Mosaic constraints shape the write: dynamic sublane offsets must be
    # 8-aligned and dynamic lane offsets 128-aligned. Rows are laid out
    # 8-padded per pose block ([8*M, Wpad], addressed at r*8; rows R..7 stay
    # zero). Columns land anywhere, so the [R, C] block is first placed into a
    # [R, 256] window at its lane remainder via an unrolled one-hot select
    # (C is 3 or 6 — a handful of VPU ops), then RMW'd at the 128-aligned
    # window base. The caller strips both paddings afterwards.
    s = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    base = s * rtile
    lanes = jax.lax.broadcasted_iota(jnp.int32, (8, 256), 1)

    @pl.when((rmax_ref[c] >= base) & (rmin_ref[c] < base + rtile))
    def _():
        def body(k, _):
            r = rows_ref[k] - base

            @pl.when((r >= 0) & (r < rtile))
            def _():
                t0 = pl.multiple_of(tb_ref[k], 128)
                sh = sh_ref[k]
                v = vals_ref[k]                     # [8, C] (rows R..7 zero)
                acc = jnp.zeros((8, 256), v.dtype)
                for j in range(C):                  # static unroll
                    acc = acc + v[:, j][:, None] * (lanes == sh + j)
                row = pl.multiple_of(r * 8, 8)
                out_ref[pl.ds(row, 8), pl.ds(t0, 256)] += acc
            return 0

        jax.lax.fori_loop(0, kc, body, 0)


def blockcoo_to_dense(rows: jax.Array, cols: jax.Array, vals: jax.Array,
                      M: int, N: int, *, rtile: int | None = None,
                      kc: int = 1024,
                      interpret: bool = False) -> jax.Array:
    """Dense [R*M, C*N] (R,C = vals block shape) from block-COO scatter-add.

    rows/cols: i32[K] block coordinates (row r occupies rows [R*r, R*r+R)).
    Entries with rows < 0 are padding and are skipped; zero-valued entries
    anywhere are harmless (callers should still route them to row -1 so the
    chunk-range pruning stays effective). Duplicate (row, col) pairs
    accumulate.

    rtile (pose rows per output stripe) defaults to the largest value whose
    [8*rtile, Wpad] VMEM stripe fits a ~6MB budget — fewer stripes means
    fewer grid steps and fewer chunk-range checks.
    """
    K, R, C = vals.shape
    # Contract: <=8-row blocks (one sublane tile) and f32 values (Mosaic has
    # no 64-bit vector types); an empty entry list is a plain zero matrix
    # (the (S, 0) grid would otherwise skip the c==0 output zeroing).
    assert R <= 8, f"block row count {R} exceeds the 8-sublane tile"
    assert vals.dtype == jnp.float32, f"f32 only, got {vals.dtype}"
    if K == 0:
        return jnp.zeros((R * M, C * N), vals.dtype)
    # Mosaic has no 64-bit types: pin every index input to i32 (with x64 on,
    # stray promotions upstream would otherwise leak i64 into the kernel)
    rows = rows.astype(jnp.int32)
    cols = cols.astype(jnp.int32)
    Kp = ((K + kc - 1) // kc) * kc
    if Kp != K:
        rows = jnp.pad(rows, (0, Kp - K), constant_values=-1)
        cols = jnp.pad(cols, (0, Kp - K))
        vals = jnp.pad(vals, ((0, Kp - K), (0, 0), (0, 0)))
    # 8-sublane-pad the value blocks (Mosaic vector shapes)
    vals = jnp.pad(vals, ((0, 0), (0, 8 - R), (0, 0)))
    nc = Kp // kc
    ch_rows = rows.reshape(nc, kc)
    valid = ch_rows >= 0
    big = jnp.iinfo(jnp.int32).max
    rmin = jnp.min(jnp.where(valid, ch_rows, big), axis=1).astype(jnp.int32)
    rmax = jnp.max(jnp.where(valid, ch_rows, -1), axis=1).astype(jnp.int32)
    # per-entry 128-aligned lane window base + in-window shift, precomputed
    # in XLA (keeps the kernel's scalar loop to loads and compares)
    off = (cols * C).astype(jnp.int32)
    tbase = (off // 128) * 128
    shift = off - tbase

    # width: 128-aligned + one extra 128-lane tile so every 256-wide RMW
    # window starting at an aligned base stays in bounds
    W = C * N
    Wpad = ((W + 127) // 128) * 128 + 128
    if rtile is None:
        # out stripes double-buffer across the stripe grid dim and the vals
        # chunks double-buffer too (~8.4MB at kc=1024): keep 2*stripe under
        # ~6MB of the 16MB VMEM limit
        budget = 3 * 1024 * 1024
        rtile = max(4, min(M, budget // (8 * Wpad * vals.dtype.itemsize)))
    S = (M + rtile - 1) // rtile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(S, nc),
        in_specs=[
            pl.BlockSpec((kc,), lambda s, c, rmn, rmx: (c,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((kc,), lambda s, c, rmn, rmx: (c,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((kc,), lambda s, c, rmn, rmx: (c,),
                         memory_space=pltpu.SMEM),
            # NB zeros as jnp.int32: with x64 enabled a Python-int 0 makes the
            # index map return mixed i32/i64, which Mosaic fails to legalize
            pl.BlockSpec((kc, 8, C),
                         lambda s, c, rmn, rmx: (c, jnp.int32(0),
                                                 jnp.int32(0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8 * rtile, Wpad),
                               lambda s, c, rmn, rmx: (s, jnp.int32(0)),
                               memory_space=pltpu.VMEM),
    )
    kern = functools.partial(_coo_dense_kernel, rtile=rtile, R=R, C=C, kc=kc)
    # the nested cond-in-fori-in-cond kernel traces deeper than CPython's
    # default stack allows once jnp dtype promotion frames stack up
    import sys as _sys
    old = _sys.getrecursionlimit()
    _sys.setrecursionlimit(max(old, 10000))
    try:
        padded = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((8 * M, Wpad), vals.dtype),
            interpret=interpret,
        )(rmin, rmax, rows, tbase, shift, vals)
    finally:
        _sys.setrecursionlimit(old)
    return padded.reshape(M, 8, Wpad)[:, :R, :W].reshape(R * M, W)
