"""Attribute the FUSED-engine FM train-step budget (VERDICT r3 item #3:
28.4 ms measured where the HBM roofline allows 2.5 ms — find the other 26).

Times isolated jitted programs at the exact bench.py FM shapes (B=8192,
F=26, D=32, 2.08M-row shared table) for every stage of the fused step
(trainer._build_fused_train_step):

    sort/plan | forward concatenated take | grad permute take |
    scatter-add kernel (v & w) | dense adam pass | full fused step

Prints one JSON block. Run on the real TPU: python benchmarks/fm_fused_profile.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bench import _checksum, _fm_info, _make_batch, _mk_trainer

    B = 8192
    vpf = int(sys.argv[1]) if len(sys.argv) > 1 else 80_000
    info = _fm_info(vocab_per_field=vpf)
    trainer = _mk_trainer("fm", info, B, "fused")
    batch_np = _make_batch(info, B, seed=1)
    state = trainer.init_state(batch_np)
    batch = trainer.device_batch(batch_np)
    mstate = trainer.metrics.init()

    results = {}

    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "fm_fused_profile_results.json"
    )

    def timed(name, fn, *args, iters=20, warmup=8):
        out = None
        for _ in range(warmup):
            out = fn(*args)
        _checksum(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _checksum(out)
        dt = (time.perf_counter() - t0) / iters
        results[name] = round(dt * 1e3, 3)
        with open(out_path, "w") as f:  # incremental: crashes keep data
            json.dump(results, f, indent=2)
        print(f"{name}: {dt*1e3:.3f} ms", flush=True)
        return out

    # full fused step, threaded like bench.py
    s, m = state, mstate
    for _ in range(12):
        s, m, _ = trainer.train_step(s, batch, m)
    _checksum(s.tables)
    t0 = time.perf_counter()
    for _ in range(20):
        s, m, _ = trainer.train_step(s, batch, m)
    _checksum(s.tables)
    results["full_fused_step"] = round((time.perf_counter() - t0) / 20 * 1e3, 3)
    print(f"full_fused_step: {results['full_fused_step']} ms", flush=True)

    from tpurec.ops.pallas.embedding_update import (
        CHUNK,
        adam_update,
        fused_scatter_add,
        gather_rows_sorted,
        make_scatter_plan,
        pick_block_rows,
    )

    v = s.tables["v"]["embedding"]  # (V, 32)
    w = s.tables["w"]["w"]["embedding"]  # (V, 1)
    v_rows = v.shape[0]
    ids_all = jnp.concatenate(
        [batch[n].reshape(-1).astype(jnp.int32) for n in info.feature_names]
    )
    n_ids = ids_all.shape[0]
    print(f"n_ids={n_ids} v_rows={v_rows}", flush=True)

    @jax.jit
    def plan_only(ids):
        p = make_scatter_plan(ids, v_rows, pick_block_rows(chunk=CHUNK), CHUNK)
        return p.sids, p.order

    timed("sort_plan", plan_only, ids_all)

    cat = jnp.concatenate([v, jnp.reshape(w, (v_rows, 1))], axis=1)  # (V, 33)

    @jax.jit
    def fwd_take(c, ids):
        return jnp.take(c, ids, axis=0)

    rows_cat = timed("forward_concat_take_33cols", fwd_take, cat, ids_all)

    sids, order = plan_only(ids_all)

    @jax.jit
    def grad_permute(g, o):
        return jnp.take(g, o, axis=0)

    timed("grad_permute_take_33cols", grad_permute, rows_cat, order)

    # eager build: jit would turn plan.n into a traced scalar and break the
    # static `npad != n` branch inside _pack_grads
    plan = make_scatter_plan(ids_all, v_rows, pick_block_rows(chunk=CHUNK), CHUNK)
    gs_sorted = jnp.take(rows_cat, order, axis=0)

    @jax.jit
    def scatter_v(gs):
        return fused_scatter_add(v_rows, 32, plan, gs[:, :32])

    @jax.jit
    def scatter_w(gs):
        return fused_scatter_add(v_rows, 1, plan, gs[:, 32:])

    gv = timed("scatter_kernel_v32", scatter_v, gs_sorted)
    timed("scatter_kernel_w1", scatter_w, gs_sorted)

    # --- block_rows sweep (r5): the kernels' one-hot + matmul cost scales
    # with N x R (every chunk compares/multiplies against a full (R, 128)
    # tile), so smaller tiles cut VPU+MXU work linearly until grid/DMA
    # overheads win. Output traffic is R-independent (rows128 x 128 x 2
    # passes either way).
    for r_try in (512, 1024, 2048):
        plan_r = make_scatter_plan(ids_all, v_rows, r_try, CHUNK)

        @jax.jit
        def scatter_v_r(gs, _p=plan_r):
            return fused_scatter_add(v_rows, 32, _p, gs[:, :32])

        @jax.jit
        def gather_v_r(t, _p=plan_r):
            return gather_rows_sorted(t, _p)

        timed(f"scatter_kernel_v32_R{r_try}", scatter_v_r, gs_sorted)
        timed(f"tile_stream_gather_v32_R{r_try}", gather_v_r, v)

    # today's XLA scatter at the same shapes (the r2-era 7M rows/s figure
    # that justified the Pallas kernel may be stale on this toolchain)
    @jax.jit
    def xla_scatter_v(ids, g):
        return jnp.zeros((v_rows, 32), jnp.float32).at[ids].add(g[:, :32])

    timed("xla_scatter_at_add_v32", xla_scatter_v, ids_all, rows_cat)

    # packed-dest XLA scatter: accumulate into the (V/4, 128) packed view
    # (fewer destination rows; lane-group masking on the VPU)
    @jax.jit
    def xla_scatter_packed(ids, g):
        grp = jnp.mod(ids, 4)[:, None]
        g128 = jnp.concatenate(
            [jnp.where(grp == q, g[:, :32], 0.0) for q in range(4)], axis=1
        )
        return jnp.zeros((v_rows // 4, 128), jnp.float32).at[ids // 4].add(g128)

    timed("xla_scatter_packed_v32", xla_scatter_packed, ids_all, rows_cat)

    # tile-stream gather (the alternative forward): sorted rows, no unpermute
    @jax.jit
    def tile_gather_v(t):
        return gather_rows_sorted(t, plan)

    timed("tile_stream_gather_v32_sorted", tile_gather_v, v)

    mm = jnp.zeros_like(v)
    vv = jnp.zeros_like(v)

    @jax.jit
    def adam_v(t, m_, v_, g):
        return adam_update(t, m_, v_, g, jnp.int32(5), 1e-3)

    timed("adam_dense_pass_v32", adam_v, v, mm, vv, gv)

    # --- candidate-optimization micro-experiments (r4) -------------------
    # packed-view takes: (V, 32) -> (V/4, 128) is a FREE reshape, so the
    # gather runs against a 4x-smaller source (row count, not bytes, is what
    # the XLA row loop pays for) and lanes are selected on the VPU
    assert v_rows % 4 == 0 and v_rows % 128 == 0
    v128 = v.reshape(v_rows // 4, 128)
    w128 = jnp.reshape(w, (v_rows // 128, 128))

    @jax.jit
    def packed_take_v(t128, ids):
        rows = jnp.take(t128, ids // 4, axis=0)  # (n, 128)
        grp = (ids % 4)[:, None]
        r3 = rows.reshape(-1, 4, 32)
        return sum(jnp.where(grp == q, r3[:, q, :], 0.0) for q in range(4))

    @jax.jit
    def packed_take_w(t128, ids):
        rows = jnp.take(t128, ids // 128, axis=0)
        lane = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
        return jnp.sum(jnp.where(lane == (ids % 128)[:, None], rows, 0.0), axis=1)

    timed("packed_take_v32", packed_take_v, v128, ids_all)
    timed("packed_take_w1", packed_take_w, w128, ids_all)

    @jax.jit
    def packed_take_both(tv, tw, ids):
        return packed_take_v(tv, ids), packed_take_w(tw, ids)

    timed("packed_take_v_and_w_one_jit", packed_take_both, v128, w128, ids_all)
    # (a) does sortedness help XLA's take? (row-loop locality)
    timed("take_sorted_ids_33cols", fwd_take, cat, sids[: n_ids])
    # (b) does the row rate depend on N? (16k subset = the 2-big-feature case)
    timed("take_16k_ids_33cols", fwd_take, cat, ids_all[:16384])
    # (c) payload-carrying sort, 1 column (the 34-operand variant does not
    # finish COMPILING on the v5e toolchain — see OptimizerConfig.fused_backward)
    cols = [rows_cat[:, j] for j in range(2)]

    @jax.jit
    def payload_sort_1col(ids, c0):
        return jax.lax.sort((ids, c0), num_keys=1)[1]

    timed("payload_sort_1col", payload_sort_1col, ids_all, cols[0])

    # (d) batched per-feature sort (26, 8192) — offset-disjoint features
    # concatenated in offset order are ALREADY globally sorted, so 26
    # independent row sorts could replace the global 213k sort
    ids_bf = ids_all.reshape(26, 8192)

    @jax.jit
    def batched_sort(x):
        io = jnp.broadcast_to(jnp.arange(8192, dtype=jnp.int32), (26, 8192))
        return jax.lax.sort((x, io), dimension=1, num_keys=1)

    timed("batched_feature_sort_26x8192", batched_sort, ids_bf)

    # (e) scatter kernel output combine cost: the two passes materialize two
    # full (rows128, 128) arrays + masked sum — time the masked-sum alone
    rows128 = (v_rows // 4 + 4095) // 4096 * 4096  # packed rows, d=32 k=4

    @jax.jit
    def masked_sum(a, b):
        return a * 0.5 + b * 0.5

    big_a = jnp.zeros((rows128, 128), jnp.float32)
    timed("two_pass_combine_sum", masked_sum, big_a, big_a)

    # component sum vs whole
    comp = (
        results["sort_plan"]
        + results["forward_concat_take_33cols"]
        + results["grad_permute_take_33cols"]
        + results["scatter_kernel_v32"]
        + results["scatter_kernel_w1"]
        + results["adam_dense_pass_v32"]
    )
    results["_sum_of_components"] = round(comp, 3)
    results["_shapes"] = {"n_ids": int(n_ids), "v_rows": int(v_rows), "B": B}
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
