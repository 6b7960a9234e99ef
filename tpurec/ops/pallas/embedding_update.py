"""Fused embedding gather / scatter-Adam Pallas kernels — the sparse-update
engine's hot path.

Why: XLA's TPU gather runs at ~24M rows/s and scatter at ~7M rows/s
(measured on v5e — both are latency-bound row loops), so a single FM train
step at B=8192, F=26 spends 35+ ms in the embedding-table scatter-add alone
(BENCH r2: 42 ms step of which ~3 ms is roofline-justified). These kernels
replace random row access with a **tile-stream pass**: the table (and its
Adam moments) stream through VMEM once in (R, D) tiles while each tile's
slice of the *sorted* id/grad list is DMA'd in and applied with a one-hot
MXU matmul — duplicates sum naturally, HBM traffic is the theoretical
minimum (one read+write of table/moments + one read of grads), and no
per-row DMA is ever issued.

    scatter-Adam: p,m,v tiles + sorted grads -> dense-parity Adam update
                  (every row decays, exactly optax.adam math)
    gather:       table tiles + sorted ids   -> rows in sorted order

The reference has no counterpart (single-device eager TF embeddings,
2.FM/CustomLayers.py:103-106); this is TPU-native infrastructure per
SURVEY §2.10. Pure-JAX references (`*_reference`) pin the math; interpret
mode runs the kernels on CPU in CI.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:  # pallas imports fail on some non-TPU builds
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_IMPORTED = True
except Exception:  # pragma: no cover
    _PALLAS_IMPORTED = False


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def pick_block_rows(d: int, vmem_budget: int = 8 * 1024 * 1024, chunk: int = 512) -> int:
    """Largest power-of-two tile height R such that the kernel's VMEM
    footprint (7 table-shaped tiles + the (R, chunk) one-hot + grad window)
    stays under budget."""
    r = 1024
    while r > 64:
        need = 7 * r * d * 4 + r * chunk * 4 + chunk * d * 4
        if need <= vmem_budget:
            return r
        r //= 2
    return 64


class ScatterPlan(NamedTuple):
    """Sorted-id routing metadata, shared by every table of one id space."""

    sids: jnp.ndarray  # (N + chunk,) int32 sorted ids, padded with sentinel
    order: jnp.ndarray  # (N,) int32: ids[order] == sids[:N]
    starts: jnp.ndarray  # (T + 1,) int32 tile boundaries into sids
    n: int  # true id count
    num_rows: int  # table row count V
    block_rows: int  # R
    chunk: int  # W


def make_scatter_plan(
    ids: jnp.ndarray, num_rows: int, block_rows: int, chunk: int = 512
) -> ScatterPlan:
    """One sort + one searchsorted; reused across all tables and by both the
    gather and the scatter-Adam kernels in the same step."""
    flat = ids.reshape(-1).astype(jnp.int32)
    n = flat.shape[0]
    t = _cdiv(num_rows, block_rows)
    sentinel = jnp.int32(t * block_rows)
    iota = jax.lax.iota(jnp.int32, n)
    sids, order = jax.lax.sort((flat, iota), num_keys=1)
    starts = jnp.searchsorted(
        sids, (jnp.arange(t + 1, dtype=jnp.int32) * block_rows)
    ).astype(jnp.int32)
    sids = jnp.concatenate([sids, jnp.full((chunk,), sentinel, jnp.int32)])
    return ScatterPlan(sids, order, starts, n, num_rows, block_rows, chunk)


# ---------------------------------------------------------------------------
# pure-JAX references (parity tests, non-TPU fallback)
def scatter_adam_reference(
    table: jnp.ndarray,
    m: jnp.ndarray,
    v: jnp.ndarray,
    ids: jnp.ndarray,
    grads: jnp.ndarray,
    step: jnp.ndarray,
    lr: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-7,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Dense-parity Adam: identical to materializing the dense scatter-add
    gradient and applying ``optax.adam`` (every row's moments decay)."""
    g = (
        jnp.zeros_like(table)
        .at[ids.reshape(-1)]
        .add(grads.reshape(-1, table.shape[-1]).astype(table.dtype))
    )
    m2 = b1 * m + (1.0 - b1) * g
    v2 = b2 * v + (1.0 - b2) * jnp.square(g)
    t = step.astype(jnp.float32)
    m_hat = m2 / (1.0 - b1**t)
    v_hat = v2 / (1.0 - b2**t)
    return table - lr * m_hat / (jnp.sqrt(v_hat) + eps), m2, v2


# ---------------------------------------------------------------------------
# scatter-Adam kernel
def _scatter_adam_kernel(
    lr, b1, b2, eps, block_rows, chunk,
    starts_ref, step_ref,  # scalar prefetch (SMEM)
    p_ref, m_ref, v_ref,  # (R, D) VMEM tiles (auto-pipelined)
    sids_ref, gs_ref,  # HBM (manual DMA)
    po_ref, mo_ref, vo_ref,  # (R, D) VMEM output tiles
    acc_ref, idw_ref, gw_ref, sem,  # scratch
):
    t = pl.program_id(0)
    r0 = t * block_rows
    start = starts_ref[t]
    count = starts_ref[t + 1] - start
    acc_ref[:] = jnp.zeros_like(acc_ref)

    def body(c, carry):
        off = start + c * chunk
        cp_i = pltpu.make_async_copy(
            sids_ref.at[:, pl.ds(off, chunk)], idw_ref, sem.at[0]
        )
        cp_g = pltpu.make_async_copy(gs_ref.at[pl.ds(off, chunk), :], gw_ref, sem.at[1])
        cp_i.start()
        cp_g.start()
        cp_i.wait()
        cp_g.wait()
        j = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        # rows outside [0, R) or beyond this tile's count never match the iota
        local = jnp.where(j + c * chunk < count, idw_ref[:] - r0, -1)
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (block_rows, chunk), 0) == local
        ).astype(jnp.float32)
        acc_ref[:] += jax.lax.dot_general(
            onehot, gw_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return carry

    nchunks = jax.lax.div(count + (chunk - 1), chunk)
    jax.lax.fori_loop(0, nchunks, body, 0)

    g = acc_ref[:]
    m2 = b1 * m_ref[:] + (1.0 - b1) * g
    v2 = b2 * v_ref[:] + (1.0 - b2) * (g * g)
    tt = step_ref[0].astype(jnp.float32)
    m_hat = m2 / (1.0 - jnp.power(b1, tt))
    v_hat = v2 / (1.0 - jnp.power(b2, tt))
    po_ref[:] = p_ref[:] - lr * m_hat / (jnp.sqrt(v_hat) + eps)
    mo_ref[:] = m2
    vo_ref[:] = v2


def scatter_adam_sorted(
    table: jnp.ndarray,
    m: jnp.ndarray,
    v: jnp.ndarray,
    plan: ScatterPlan,
    grads_sorted: jnp.ndarray,  # (N, D) aligned to plan.sids[:N]
    step: jnp.ndarray,
    lr: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-7,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Tile-stream dense-parity Adam with fused scatter-add of sorted grads."""
    v_rows, d = table.shape
    r, w = plan.block_rows, plan.chunk
    t = _cdiv(v_rows, r)
    gs = jnp.pad(
        grads_sorted.reshape(-1, d).astype(jnp.float32), ((0, w), (0, 0))
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((r, d), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, d), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, d), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((r, d), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, d), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, d), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((r, d), jnp.float32),
            pltpu.VMEM((1, w), jnp.int32),
            pltpu.VMEM((w, d), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_scatter_adam_kernel, lr, b1, b2, eps, r, w)
    p2, m2, v2 = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(table.shape, jnp.float32),
            jax.ShapeDtypeStruct(table.shape, jnp.float32),
            jax.ShapeDtypeStruct(table.shape, jnp.float32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        plan.starts,
        jnp.asarray(step, jnp.int32).reshape(1),
        table.astype(jnp.float32),
        m.astype(jnp.float32),
        v.astype(jnp.float32),
        plan.sids.reshape(1, -1),
        gs,
    )
    return p2, m2, v2


def fused_scatter_adam(
    table, m, v, ids, grads, step, lr,
    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-7,
    chunk: int = 512, interpret: bool = False,
):
    """Convenience wrapper: unsorted (ids, grads) -> sorted plan -> kernel."""
    d = table.shape[-1]
    plan = make_scatter_plan(ids, table.shape[0], pick_block_rows(d, chunk=chunk), chunk)
    gs = jnp.take(grads.reshape(-1, d), plan.order, axis=0)
    return scatter_adam_sorted(table, m, v, plan, gs, step, lr, b1, b2, eps, interpret)


# ---------------------------------------------------------------------------
# gather kernel (rows in sorted order)
def _gather_kernel(
    block_rows, chunk, num_rows,
    starts_ref,  # scalar prefetch
    tbl_ref,  # (R, D) VMEM tile
    sids_ref,  # HBM
    out_ref,  # (Npad, D) HBM (manual DMA)
    idw_ref, rw_ref, sem,
):
    t = pl.program_id(0)
    r0 = t * block_rows
    start = starts_ref[t]
    count = starts_ref[t + 1] - start
    # zero the tail tile's out-of-bounds padding rows: they are never
    # selected (ids < V) but garbage/NaN fill would poison 0·x in the dot
    row_ok = (
        jax.lax.broadcasted_iota(jnp.int32, (block_rows, 1), 0) + r0
    ) < num_rows
    tile = jnp.where(row_ok, tbl_ref[:], 0.0)

    def body(c, carry):
        off = start + c * chunk
        cp_i = pltpu.make_async_copy(
            sids_ref.at[:, pl.ds(off, chunk)], idw_ref, sem.at[0]
        )
        cp_i.start()
        cp_i.wait()
        local = idw_ref[:] - r0  # (1, W); out-of-tile -> no iota match -> 0 row
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (block_rows, chunk), 0) == local
        ).astype(jnp.float32)
        # rows[j, d] = sum_r onehot[r, j] * tile[r, d]
        rw_ref[:] = jax.lax.dot_general(
            onehot, tile, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # overrun rows ([count, off+W)) belong to LATER tiles and are
        # rewritten by them — the TPU grid is sequential, so write order
        # guarantees the final value is the owning tile's.
        cp_o = pltpu.make_async_copy(rw_ref, out_ref.at[pl.ds(off, chunk), :], sem.at[1])
        cp_o.start()
        cp_o.wait()
        return carry

    nchunks = jax.lax.div(count + (chunk - 1), chunk)
    jax.lax.fori_loop(0, nchunks, body, 0)


def gather_rows_sorted(
    table: jnp.ndarray, plan: ScatterPlan, interpret: bool = False
) -> jnp.ndarray:
    """rows[j] = table[plan.sids[j]] for j < plan.n, streaming the table
    through VMEM once instead of issuing N random row loads."""
    v_rows, d = table.shape
    r, w = plan.block_rows, plan.chunk
    t = _cdiv(v_rows, r)
    npad = plan.sids.shape[0]  # N + W
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((r, d), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((1, w), jnp.int32),
            pltpu.VMEM((w, d), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_gather_kernel, r, w, v_rows),
        out_shape=jax.ShapeDtypeStruct((npad, d), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(plan.starts, table.astype(jnp.float32), plan.sids.reshape(1, -1))
    return out[: plan.n]


def unpermute_rows(rows_sorted: jnp.ndarray, plan: ScatterPlan) -> jnp.ndarray:
    """Back to original id order — as a custom-vjp permutation so the
    backward is a gather (take by plan.order), never an XLA scatter."""
    return _unpermute(rows_sorted, plan.order)


@jax.custom_vjp
def _unpermute(rows_sorted, order):
    # inverse permutation WITHOUT a scatter: sort (order, iota) pairs
    iota = jax.lax.iota(jnp.int32, order.shape[0])
    _, inv = jax.lax.sort((order, iota), num_keys=1)
    return jnp.take(rows_sorted, inv, axis=0)


def _unpermute_fwd(rows_sorted, order):
    return _unpermute(rows_sorted, order), order


def _unpermute_bwd(order, g):
    return jnp.take(g, order, axis=0), None


_unpermute.defvjp(_unpermute_fwd, _unpermute_bwd)
