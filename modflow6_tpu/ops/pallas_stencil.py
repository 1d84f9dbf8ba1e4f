"""Pallas TPU kernel: fused 7-point structured-stencil SpMV.

The CVFD matvec y = D·x + Σ c_dir · shift(x) is the hot op of the whole
framework (one per Krylov inner iteration, ImsLinearBase.f90 amux role).
The XLA pad-shift formulation (`ops.system.spmv_structured`) materializes
six shifted copies of x; this kernel streams the eight input planes
(diag, six coefficient planes, x) through VMEM once and writes y once —
the HBM-bandwidth speed of light for the op.

Blocking: grid over row tiles; each block holds ALL layers
[nlay, TILE_R, ncol] so vertical (U/D) shifts stay in-block; north/south
neighbors across the tile boundary come from two extra x views of the
adjacent tiles (the coefficient fields are zero at true grid borders, so
clamped edge blocks contribute nothing).  The lane dimension is the
column axis (ncol % 128 == 0 required); callers fall back to the XLA
path for non-tileable shapes, f64, or non-TPU backends.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

TILE_R = 32


def _kernel(diag_ref, c_ref, xc_ref, xu_ref, xd_ref, y_ref):
    xc = xc_ref[:]                       # [nlay, TILE_R, ncol]

    # east/west: lane shifts (border coefficients are zero, so the
    # zero-filled edge values never contribute)
    xE = jnp.concatenate([xc[:, :, 1:], jnp.zeros_like(xc[:, :, :1])],
                         axis=2)
    xW = jnp.concatenate([jnp.zeros_like(xc[:, :, :1]), xc[:, :, :-1]],
                         axis=2)
    # north (row-1): first row comes from the previous tile's last row
    # (edge tiles read a clamped self-view; c_N is zero at global row 0)
    xN = jnp.concatenate([xu_ref[:, -1:, :], xc[:, :-1, :]], axis=1)
    # south (row+1): last row from the next tile's first row
    xS = jnp.concatenate([xc[:, 1:, :], xd_ref[:, :1, :]], axis=1)
    # up/down: layer shifts, fully in-block
    xU = jnp.concatenate([jnp.zeros_like(xc[:1]), xc[:-1]], axis=0)
    xD = jnp.concatenate([xc[1:], jnp.zeros_like(xc[:1])], axis=0)

    c = c_ref[:]                         # [6, nlay, TILE_R, ncol]
    y = diag_ref[:] * xc
    y = y + c[0] * xE
    y = y + c[1] * xW
    y = y + c[2] * xN
    y = y + c[3] * xS
    y = y + c[4] * xU
    y = y + c[5] * xD
    y_ref[:] = y


def supports(shape, dtype) -> bool:
    """Kernel applicability: TPU backend, f32/bf16, tileable shape."""
    nlay, nrow, ncol = shape
    if dtype not in (jnp.float32, jnp.bfloat16):
        return False
    if ncol % 128 != 0 or nrow % TILE_R != 0:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


@partial(jax.jit, static_argnames=("shape", "interpret"))
def spmv_structured_pallas(shape, diag, off, x, interpret=False):
    """Drop-in for ops.system.spmv_structured on supported shapes.

    ``off`` may be the [N, 6] slot array or a pre-transposed
    [6, nlay, nrow, ncol] plane stack (make_matvec pre-transposes once
    per system so the per-iteration kernel streams lane-contiguous
    planes — a trailing length-6 lane axis would pad 6→128)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nlay, nrow, ncol = shape
    dt = x.dtype
    x3 = x.reshape(shape)
    d3 = diag.reshape(shape)
    if off.ndim == 4:
        c4 = off
    else:
        c4 = jnp.moveaxis(off.reshape(nlay, nrow, ncol, 6), -1, 0)
    ntile = nrow // TILE_R

    # index maps return block indices; keep every component the same
    # (traced) dtype as the grid index — mixed python-int/traced tuples
    # fail Mosaic legalization
    def row_block(i):
        return (i * 0, i, i * 0)

    def row_block_c(i):
        return (i * 0, i * 0, i, i * 0)

    def row_block_up(i):
        return (i * 0, jnp.maximum(i - 1, 0), i * 0)

    def row_block_dn(i):
        return (i * 0, jnp.minimum(i + 1, ntile - 1), i * 0)

    blk = (nlay, TILE_R, ncol)
    kw = {}
    if not interpret:
        # "arbitrary" grid semantics lets Mosaic software-pipeline the
        # row tiles (double-buffered DMA); TILE_R=32 keeps the scoped
        # VMEM footprint (~11 MB double-buffered) inside the 16 MB stack
        # budget the kernel gets when embedded in the fused solve
        kw["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",))
    y = pl.pallas_call(
        _kernel,
        grid=(ntile,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec(blk, row_block, memory_space=pltpu.VMEM),
            pl.BlockSpec((6, nlay, TILE_R, ncol), row_block_c,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, row_block, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, row_block_up, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, row_block_dn, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(blk, row_block, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(shape, dt),
    )(d3, c4, x3, x3, x3)
    return y.reshape(-1)
