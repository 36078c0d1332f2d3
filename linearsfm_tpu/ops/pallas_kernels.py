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
    """Pallas batched symmetric 3x3 inverse; same semantics as
    schur.inv3x3_sym (zero blocks -> zero)."""
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
