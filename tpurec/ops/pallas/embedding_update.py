"""Fused embedding gather / scatter-grad Pallas kernels — the sparse-update
engine's hot path.

Why: XLA's TPU gather and scatter are latency-bound row loops whose cost
also scales with the SOURCE/DESTINATION row count (r5 measurements: a
213k-row gather costs 10.5 ms from a 2.08M-row source vs 2.1 ms from a
200k-row one; the same scatter runs 28.2 ms into (2M, 32) vs 5.1 ms into
the packed (520k, 128) view), so a plain FM train step at B=8192, F=26
spends most of its 42 ms in the table gather/scatter (vs ~3 ms
roofline-justified).

Design (third iteration — the measured constraints that shaped it):
  1. **Packed lanes.** A (V, D) table streams as its (V/k, 128) view with
     k = 128/D ids per packed row: narrow (R, D) blocks move at ~65 GB/s
     through the Pallas pipeline, full-lane (R, 128) blocks at ~340 GB/s.
     An id maps to packed row ``id // k``, lane group ``id % k``; grads are
     pre-packed into their lane group on the XLA side.
  2. **Chunk-major grid, static bodies.** In-kernel dynamic-trip DMA loops
     serialize the pipeline (measured 25-75 us/tile); instead the grid runs
     over fixed 512-id chunks of the SORTED id/grad stream (statically
     blocked inputs) while the table tile rides on a scalar-prefetch-driven
     *index map* — the documented dynamic-indexing pattern that keeps
     Pallas' automatic double-buffering.
  3. **Two-pass boundary handling.** A sorted chunk touches at most the
     tile holding its first id and the next one (wider straddles fall back
     to the XLA path via lax.cond). Pass A routes every chunk to its first
     tile, pass B to the next; each pass's output-block indices are
     monotone, so Pallas' revisiting rule accumulates chunks of the same
     tile in VMEM. Foreign ids self-mask through the one-hot row-range
     compare; G = maskedA + maskedB (unvisited tiles carry garbage and are
     masked by the per-tile visit flags).
  4. **Adam stays in XLA.** The element-wise p/m/v update runs at ~480 GB/s
     as a plain fused XLA loop — faster than a hand-rolled Pallas pass
     (~340 GB/s) — so the kernel's job ends at the dense aggregated grad.
     ``scatter_adam_*`` = G-build kernel + exact optax.adam math.

The reference has no counterpart (single-device eager TF embeddings,
2.FM/CustomLayers.py:103-106); this is TPU-native infrastructure per SURVEY
§2.10. Pure-JAX references (`*_reference`) pin the math; interpret mode runs
the kernels on CPU in CI. One-hot matmuls run at default MXU precision:
gathered rows / accumulated grads are bf16-rounded (~2^-8 relative) — the
same class as the trainer's bf16 compute_dtype.
"""

from __future__ import annotations

import functools
import math
from typing import List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:  # pallas imports fail on some non-TPU builds
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_IMPORTED = True
except Exception:  # pragma: no cover
    _PALLAS_IMPORTED = False

LANES = 128
CHUNK = 1024  # ids per grid step; multiple of 1024 (ids block sublane dim = CHUNK/128 must divide by 8)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _pack_factor(d: int) -> Tuple[int, int]:
    """(k, d_pad): ids per packed row; d_pad = smallest power of two >= d
    (so k divides 128). d > 128 is handled via 128-lane column slabs."""
    if d >= LANES:
        return 1, LANES
    d_pad = 1
    while d_pad < d:
        d_pad *= 2
    return LANES // d_pad, d_pad


class ScatterPlan(NamedTuple):
    """Sorted-id routing metadata, shared by every table of one id space."""

    sids: jnp.ndarray  # (Npad,) int32 sorted ids, sentinel-padded; Npad % CHUNK == 0
    order: jnp.ndarray  # (N,) int32: ids[order] == sids[:N]
    n: int  # true id count
    num_rows: int  # table row count V
    block_rows: int  # R: PACKED rows per table tile
    chunk: int  # = CHUNK


def make_scatter_plan(
    ids: jnp.ndarray, num_rows: int, block_rows: int = 4096, chunk: int = CHUNK
) -> ScatterPlan:
    """One sort, reused across all tables of the id space and by both the
    gather and the scatter kernels in the same step."""
    assert chunk % LANES == 0
    flat = ids.reshape(-1).astype(jnp.int32)
    n = flat.shape[0]
    iota = jax.lax.iota(jnp.int32, n)
    sids, order = jax.lax.sort((flat, iota), num_keys=1)
    npad = _cdiv(n, chunk) * chunk
    sentinel = jnp.int32(num_rows)  # maps at/beyond the last packed row
    sids = jnp.concatenate([sids, jnp.full((npad - n,), sentinel, jnp.int32)])
    return ScatterPlan(sids, order, n, num_rows, block_rows, chunk)


# ---------------------------------------------------------------------------
# pure-JAX references (parity tests, non-TPU fallback)
def scatter_add_reference(table_shape, ids, grads):
    return (
        jnp.zeros(table_shape, jnp.float32)
        .at[ids.reshape(-1)]
        .add(grads.reshape(-1, table_shape[-1]).astype(jnp.float32))
    )


def adam_update(table, m, v, g, step, lr, b1=0.9, b2=0.999, eps=1e-7):
    """Exact optax.adam math (element-wise XLA; ~480 GB/s measured)."""
    m2 = b1 * m + (1.0 - b1) * g
    v2 = b2 * v + (1.0 - b2) * jnp.square(g)
    t = step.astype(jnp.float32)
    m_hat = m2 / (1.0 - b1**t)
    v_hat = v2 / (1.0 - b2**t)
    return table - lr * m_hat / (jnp.sqrt(v_hat) + eps), m2, v2


def scatter_adam_reference(
    table, m, v, ids, grads, step, lr, b1=0.9, b2=0.999, eps=1e-7
):
    """Dense-parity Adam: identical to materializing the dense scatter-add
    gradient and applying ``optax.adam`` (every row's moments decay)."""
    g = scatter_add_reference(table.shape, ids, grads).astype(table.dtype)
    return adam_update(table, m, v, g, step, lr, b1, b2, eps)


# ---------------------------------------------------------------------------
# packing helpers (XLA side)
def _pack_table(x: jnp.ndarray, k: int, d_pad: int, rows128: int) -> jnp.ndarray:
    """(V, D) -> (rows128, 128) packed view (pads D to d_pad, rows to
    rows128; a pure reshape when D == d_pad and k | V)."""
    v, d = x.shape
    if d < d_pad:
        x = jnp.pad(x, ((0, 0), (0, d_pad - d)))
    v_pad = rows128 * k
    if v_pad != v:
        x = jnp.pad(x, ((0, v_pad - v), (0, 0)))
    return x.reshape(rows128, LANES)


def _unpack_table(x128: jnp.ndarray, v: int, d: int, d_pad: int) -> jnp.ndarray:
    return x128.reshape(-1, d_pad)[:v, :d]


def _pack_grads(gs, sids, n, k, d_pad):
    """(N, D) sorted grads -> (Npad, 128), each row's values in its id's
    lane group (sids % k); padding rows zero.

    Branch-free lane placement: tile the D columns k times across the 128
    lanes and mask every lane whose group != sids % k. A per-group Python
    loop (k concatenated wheres) compiles to k separate (N, d_pad) buffers
    that TPU tiling pads to (N, 128) EACH — 13 GB of HLO temps at k=128
    (measured OOM, benchmarks/fm_fused_profile.py scatter_kernel_w1)."""
    npad = sids.shape[0]
    d = gs.shape[1]
    gs = gs.astype(jnp.float32)
    if d < d_pad:
        gs = jnp.pad(gs, ((0, 0), (0, d_pad - d)))
    if k > 1:
        grp = jnp.mod(sids[:n], k)[:, None]
        lane = jax.lax.broadcasted_iota(jnp.int32, (n, LANES), 1)
        tiled = jnp.tile(gs, (1, k))  # (N, 128); broadcast when d_pad == 1
        gs = jnp.where(jax.lax.div(lane, d_pad) == grp, tiled, 0.0)
    if npad != n:
        gs = jnp.pad(gs, ((0, npad - n), (0, 0)))
    return gs


def _group_reduce_matrix(k: int, d_pad: int) -> jnp.ndarray:
    """Static (128, d_pad) summing matrix S[l, c] = (l % d_pad == c): for a
    lane-masked (N, 128) array, ``sel @ S`` folds the k groups onto their
    d_pad columns on the MXU — replacing a (N, k, d_pad) reshape+sum whose
    TPU tiled layout pads BOTH trailing dims (128x expansion at d_pad=1)."""
    lanes = np.arange(LANES)
    return jnp.asarray((lanes[:, None] % d_pad) == np.arange(d_pad)[None, :], np.float32)


def _unpack_rows(rows128, sids, n, k, d, d_pad):
    """(Npad, 128) packed gathered rows -> (N, D)."""
    if k == 1:
        return rows128[:n, :d]
    grp = jnp.mod(sids[:n], k)[:, None]
    lane = jax.lax.broadcasted_iota(jnp.int32, (n, LANES), 1)
    sel = jnp.where(jax.lax.div(lane, d_pad) == grp, rows128[:n], 0.0)
    return jax.lax.dot(sel, _group_reduce_matrix(k, d_pad),
                        precision=jax.lax.Precision.HIGHEST)[:, :d]


def _chunk_routing(plan: ScatterPlan, k: int, t_tiles: int):
    """Per-chunk routing: the tile of each chunk's first id, pass-A/B block
    init flags, per-tile visit masks, the all-chunks-span-<=2-tiles flag,
    and per-chunk straddle flags (chunk touches its second tile)."""
    r = plan.block_rows
    first = plan.sids[:: plan.chunk]  # (C,) first id of each chunk
    last = plan.sids[plan.chunk - 1 :: plan.chunk]  # (C,) last id
    raw_tile = jax.lax.div(first, jnp.int32(k * r))
    tile_a = jnp.clip(raw_tile, 0, t_tiles - 1).astype(jnp.int32)
    tile_last = jax.lax.div(last, jnp.int32(k * r))
    ok = jnp.all(tile_last - raw_tile <= 1)
    straddle = (tile_last > raw_tile).astype(jnp.int32)
    tile_b = jnp.clip(tile_a + 1, 0, t_tiles - 1)
    prev_a = jnp.concatenate([jnp.full((1,), -1, jnp.int32), tile_a[:-1]])
    prev_b = jnp.concatenate([jnp.full((1,), -1, jnp.int32), tile_b[:-1]])
    init_a = (tile_a != prev_a).astype(jnp.int32)
    init_b = (tile_b != prev_b).astype(jnp.int32)
    tiles = jnp.arange(t_tiles, dtype=jnp.int32)
    visited_a = _sorted_membership(tiles, tile_a)
    visited_b = _sorted_membership(tiles, tile_b)
    return tile_a, tile_b, init_a, init_b, visited_a, visited_b, ok, straddle


def _sorted_membership(queries: jnp.ndarray, sorted_vals: jnp.ndarray) -> jnp.ndarray:
    pos = jnp.searchsorted(sorted_vals, queries)
    pos = jnp.clip(pos, 0, sorted_vals.shape[0] - 1)
    return jnp.take(sorted_vals, pos) == queries


# ---------------------------------------------------------------------------
# scatter (dense aggregated grad build): chunk-major grid, two passes
def fused_scatter_add(
    table_rows: int,
    d: int,
    plan: ScatterPlan,
    grads_sorted: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Dense (V, D) aggregated gradient from sorted per-occurrence grads —
    the Pallas replacement for XLA's 29 ms scatter-add. Falls back to the
    XLA scatter when some chunk straddles more than two tiles (pathological
    id sparsity)."""
    if d > LANES:  # column slabs
        return jnp.concatenate(
            [
                fused_scatter_add(
                    table_rows, min(LANES, d - lo), plan,
                    grads_sorted[:, lo : lo + LANES], interpret,
                )
                for lo in range(0, d, LANES)
            ],
            axis=1,
        )
    k, d_pad = _pack_factor(d)
    r = plan.block_rows
    rows128 = _cdiv(_cdiv(table_rows, k), r) * r
    t_tiles = rows128 // r
    gs128 = _pack_grads(grads_sorted.reshape(-1, d), plan.sids, plan.n, k, d_pad)
    tile_a, tile_b, init_a, init_b, vis_a, vis_b, ok, straddle = _chunk_routing(
        plan, k, t_tiles
    )

    def run_fused(args):
        gs128, tile_a, tile_b, init_a, init_b, vis_a, vis_b, straddle = args
        g_a = _scatter_pass_k(
            plan, k, gs128, tile_a, init_a, None, t_tiles, interpret
        )
        # pass B only does work on straddling chunks (guarded in-kernel)
        g_b = _scatter_pass_k(
            plan, k, gs128, tile_b, init_b, straddle, t_tiles, interpret
        )
        mask_a = jnp.repeat(vis_a.astype(jnp.float32), r)[:, None]
        mask_b = jnp.repeat(vis_b.astype(jnp.float32), r)[:, None]
        g = g_a * mask_a + g_b * mask_b
        return _unpack_table(g, table_rows, d, d_pad)

    def run_xla(args):
        gs128 = args[0]
        gs = _unpack_rows(gs128, plan.sids, plan.n, k, d, d_pad)
        return scatter_add_reference((table_rows, d), plan.sids[: plan.n], gs)

    return jax.lax.cond(
        ok, run_fused, run_xla,
        (gs128, tile_a, tile_b, init_a, init_b, vis_a, vis_b, straddle),
    )


def _scatter_pass_k(plan, k, gs128, tile_idx, init_flags, straddle, t_tiles, interpret):
    r, w = plan.block_rows, plan.chunk
    c = gs128.shape[0] // w
    guarded = straddle is not None
    scalars = [tile_idx, init_flags] + ([straddle] if guarded else [])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars),
        grid=(c,),
        in_specs=[
            pl.BlockSpec(
                (w // LANES, LANES), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((w, LANES), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (r, LANES),
            lambda i, tile_ref, *_: (tile_ref[i], 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[],
    )
    return pl.pallas_call(
        functools.partial(_scatter_kernel_body, r, w, k, guarded),
        out_shape=jax.ShapeDtypeStruct((t_tiles * r, LANES), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(*scalars, plan.sids.reshape(-1, LANES), gs128)


def _scatter_kernel_body(block_rows, chunk, k, guarded, *refs):
    if guarded:
        tile_ref, init_ref, straddle_ref, sids_ref, gs_ref, g_ref = refs
    else:
        tile_ref, init_ref, sids_ref, gs_ref, g_ref = refs
        straddle_ref = None
    c = pl.program_id(0)

    @pl.when(init_ref[c] == 1)
    def _init():
        g_ref[:] = jnp.zeros_like(g_ref)

    def compute():
        r0 = tile_ref[c] * block_rows
        for a in range(chunk // LANES):
            ids_col = jnp.transpose(sids_ref[a : a + 1, :], (1, 0))  # (128, 1)
            local = jax.lax.div(ids_col, k) - r0
            onehot = (
                jax.lax.broadcasted_iota(jnp.int32, (LANES, block_rows), 1) == local
            ).astype(jnp.float32)  # foreign/sentinel ids never match
            g_ref[:] += jax.lax.dot_general(
                onehot, gs_ref[a * LANES : (a + 1) * LANES, :],
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    if guarded:
        pl.when(straddle_ref[c] == 1)(compute)
    else:
        compute()


def scatter_adam_sorted(
    table, m, v, plan, grads_sorted, step, lr,
    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-7, interpret: bool = False,
):
    """Dense-parity Adam for one (V, D) table: fused grad build + exact
    optax.adam element-wise math."""
    v_rows, d = table.shape
    g = fused_scatter_add(v_rows, d, plan, grads_sorted.reshape(-1, d), interpret)
    return adam_update(
        table.astype(jnp.float32), m.astype(jnp.float32), v.astype(jnp.float32),
        g, step, lr, b1, b2, eps,
    )


def scatter_adam_grouped(
    tables, ms, vs, plan, grads_sorted, step, lr,
    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-7, interpret: bool = False,
):
    """Every table of one id space, sharing the plan's single sort."""
    outs = [
        scatter_adam_sorted(t, m, v, plan, g, step, lr, b1, b2, eps, interpret)
        for t, m, v, g in zip(tables, ms, vs, grads_sorted)
    ]
    return [o[0] for o in outs], [o[1] for o in outs], [o[2] for o in outs]


def fused_scatter_adam(
    table, m, v, ids, grads, step, lr,
    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-7,
    chunk: int = CHUNK, interpret: bool = False,
):
    """Convenience wrapper: unsorted (ids, grads) -> sorted plan -> kernel."""
    d = table.shape[-1]
    plan = make_scatter_plan(ids, table.shape[0], chunk=chunk)
    gs = jnp.take(grads.reshape(-1, d), plan.order, axis=0)
    return scatter_adam_sorted(table, m, v, plan, gs, step, lr, b1, b2, eps, interpret)


# ---------------------------------------------------------------------------
# gather: chunk-major grid, two table tiles ride on prefetch-driven index maps
def _gather_kernel(
    block_rows, chunk, k,
    tile_ref, straddle_ref,  # scalar prefetch (C,)
    tile_a_ref, tile_b_ref, sids_ref,  # blocked inputs
    out_ref,  # (chunk, 128) output block at (c, 0)
):
    c = pl.program_id(0)
    r0 = tile_ref[c] * block_rows
    for a in range(chunk // LANES):
        ids_col = jnp.transpose(sids_ref[a : a + 1, :], (1, 0))  # (128, 1)
        local = jax.lax.div(ids_col, k) - r0
        onehot_a = (
            jax.lax.broadcasted_iota(jnp.int32, (LANES, block_rows), 1) == local
        ).astype(jnp.float32)
        out_ref[a * LANES : (a + 1) * LANES, :] = jnp.dot(
            onehot_a, tile_a_ref[:], preferred_element_type=jnp.float32
        )

    @pl.when(straddle_ref[c] == 1)
    def _next_tile():
        for a in range(chunk // LANES):
            ids_col = jnp.transpose(sids_ref[a : a + 1, :], (1, 0))
            local = jax.lax.div(ids_col, k) - r0 - block_rows
            onehot_b = (
                jax.lax.broadcasted_iota(jnp.int32, (LANES, block_rows), 1) == local
            ).astype(jnp.float32)
            out_ref[a * LANES : (a + 1) * LANES, :] += jnp.dot(
                onehot_b, tile_b_ref[:], preferred_element_type=jnp.float32
            )


def gather_rows_sorted(
    table: jnp.ndarray, plan: ScatterPlan, interpret: bool = False
) -> jnp.ndarray:
    """rows[j] = table[plan.sids[j]] for j < plan.n — chunk-major one-hot
    extraction against the (at most two) table tiles each sorted chunk
    touches; falls back to XLA take when a chunk straddles > 2 tiles."""
    v_rows, d = table.shape
    if d > LANES:  # column slabs
        return jnp.concatenate(
            [
                gather_rows_sorted(table[:, lo : lo + LANES], plan, interpret)
                for lo in range(0, d, LANES)
            ],
            axis=1,
        )
    k, d_pad = _pack_factor(d)
    r, w = plan.block_rows, plan.chunk
    rows128 = _cdiv(_cdiv(v_rows, k), r) * r
    t_tiles = rows128 // r
    t128 = _pack_table(table.astype(jnp.float32), k, d_pad, rows128)
    tile_a, tile_b, _, _, _, _, ok, straddle = _chunk_routing(plan, k, t_tiles)
    npad = plan.sids.shape[0]
    c = npad // w

    def run_fused(args):
        t128, tile_a, straddle = args
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(c,),
            in_specs=[
                pl.BlockSpec(
                    (r, LANES), lambda i, tref, sref: (tref[i], 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (r, LANES),
                    lambda i, tref, sref: (jnp.minimum(tref[i] + 1, t_tiles - 1), 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (w // LANES, LANES), lambda i, tref, sref: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (w, LANES), lambda i, tref, sref: (i, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[],
        )
        out = pl.pallas_call(
            functools.partial(_gather_kernel, r, w, k),
            out_shape=jax.ShapeDtypeStruct((npad, LANES), jnp.float32),
            grid_spec=grid_spec,
            interpret=interpret,
        )(tile_a, straddle, t128, t128, plan.sids.reshape(-1, LANES))
        return _unpack_rows(out, plan.sids, plan.n, k, d, d_pad)

    def run_xla(args):
        return jnp.take(table.astype(jnp.float32), plan.sids[: plan.n], axis=0)

    return jax.lax.cond(ok, run_fused, run_xla, (t128, tile_a, straddle))


def gather_rows_grouped(
    tables: Sequence[jnp.ndarray], plan: ScatterPlan, interpret: bool = False
) -> List[jnp.ndarray]:
    """Every table of one id space, sharing the plan's single sort."""
    return [gather_rows_sorted(t, plan, interpret) for t in tables]


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


def packed_take(table2d: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """rows[j] = table2d[ids[j]] via a take against the (V/k, 128) packed
    VIEW of the table (a free reshape when D is a power of two): XLA's TPU
    gather cost scales with the source's ROW COUNT, not its bytes
    (benchmarks/fm_fused_profile.py — 213k rows from a 2.08M-row source:
    10.5 ms; from a 200k-row source: 2.1 ms), so k = 128/D ids per packed
    row cuts the row loop k-fold; the lane group is selected on the VPU.
    Forward-only (no custom VJP): callers differentiate w.r.t. the returned
    rows, never through this gather."""
    v, d = table2d.shape
    ids = ids.reshape(-1).astype(jnp.int32)
    if d >= LANES:
        return jnp.take(table2d, ids, axis=0)
    k, d_pad = _pack_factor(d)
    if d_pad != d or v % k != 0:
        # any pad materializes an O(V*D) table copy per step — the packed
        # view is only a win when the reshape is FREE (ADVICE r4)
        return jnp.take(table2d, ids, axis=0)
    t128 = table2d.reshape(v // k, LANES)
    rows = jnp.take(t128, jax.lax.div(ids, k), axis=0)  # (N, 128)
    if k == 1:
        return rows[:, :d]
    # branch-free lane-group select: mask the k-1 foreign groups to zero in
    # ONE vectorized pass, then fold groups onto their columns with a static
    # (128, d_pad) matmul. Both a per-group Python loop AND a
    # (N, k, d_pad) reshape+sum materialize layout-padded intermediates
    # (TPU tiles pad the trailing dims — 128x expansion at d_pad=1).
    grp = jnp.mod(ids, k)[:, None]
    lane = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
    masked = jnp.where(jax.lax.div(lane, d_pad) == grp, rows, 0.0)
    return jax.lax.dot(masked, _group_reduce_matrix(k, d_pad),
                       precision=jax.lax.Precision.HIGHEST)[:, :d]


def packed_scatter_add(
    v_rows: int, ids: jnp.ndarray, grads: jnp.ndarray
) -> jnp.ndarray:
    """Dense (V, D) aggregated gradient via XLA's scatter-add into the FREE
    (V/k, 128) packed view — UNSORTED ids, no plan. XLA's TPU scatter is
    latency-bound per destination-visiting row; packing k = 128/D ids per
    row cuts the row loop k-fold (measured 5.07 ms vs 28.2 unpacked for
    213k ids x 32 cols @2M rows — fm_fused_profile_results.json; also beats
    the two-pass Pallas tile-stream kernel's 9.7 ms WITHOUT the 1.7 ms sort
    + 2.4 ms grad permute it requires)."""
    ids = ids.reshape(-1).astype(jnp.int32)
    d = grads.shape[-1]
    grads = grads.reshape(-1, d).astype(jnp.float32)
    k, d_pad = _pack_factor(d)
    if k == 1 or d_pad != d or v_rows % k != 0:
        return jnp.zeros((v_rows, d), jnp.float32).at[ids].add(grads)
    grp = jnp.mod(ids, k)[:, None]
    lane = jax.lax.broadcasted_iota(jnp.int32, (ids.shape[0], LANES), 1)
    g128 = jnp.where(jax.lax.div(lane, d_pad) == grp, jnp.tile(grads, (1, k)), 0.0)
    out = jnp.zeros((v_rows // k, LANES), jnp.float32).at[jax.lax.div(ids, k)].add(g128)
    return out.reshape(v_rows, d)


def packed_count_rows(v_rows: int, ids: jnp.ndarray) -> jnp.ndarray:
    """(V, 1) per-row occurrence counts via the same packed-destination
    scatter (k = 128 ids per packed row)."""
    ids = ids.reshape(-1).astype(jnp.int32)
    if v_rows % LANES != 0:
        return jnp.zeros((v_rows, 1), jnp.float32).at[ids].add(1.0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (ids.shape[0], LANES), 1)
    onehot = (lane == jnp.mod(ids, LANES)[:, None]).astype(jnp.float32)
    out = (
        jnp.zeros((v_rows // LANES, LANES), jnp.float32)
        .at[jax.lax.div(ids, LANES)]
        .add(onehot)
    )
    return out.reshape(v_rows, 1)


def pick_block_rows(d: int = LANES, vmem_budget: int = 10 * 1024 * 1024, chunk: int = CHUNK) -> int:
    """Kept for API compatibility: packed tiles are (R, 128) regardless of
    D; R = 4096 keeps tile-change (and one-hot) counts low."""
    return 4096
