"""End-to-end A/B of fused-engine strategy knobs — the measurement VERDICT r4
said was missing: every engine change must be validated on the FULL production
train step (micro-profiles are dispatch-dominated on the axon tunnel,
CLAUDE.md measurement pitfalls).

Measures the complete Trainer.train_step (fwd/bwd + optimizer + metrics in one
jit) at the bench.py shapes for each (model, engine-variant) pair and writes
benchmarks/engine_ab_results.json.

Run on the real TPU:  python benchmarks/engine_ab.py [fm|din|all]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "engine_ab_results.json")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    from bench import _din_model, _fm_info, _measure_trainer_step, _mk_trainer

    results = {}
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            results = json.load(f)

    def run(key, name, info, model_params=None, seq_len=0, mode="fused",
            emb=None, dim=32, **opt):
        trainer = _mk_trainer(
            name, info, 8192, mode, model_params=model_params, dim=dim,
            opt_overrides=opt, emb_overrides=emb,
        )
        r = _measure_trainer_step(trainer, info, 8192, seq_len=seq_len, mode=mode)
        r["opt_overrides"] = opt
        if emb:
            r["emb_overrides"] = emb
        results[key] = r
        print(f"{key}: {r['step_ms']} ms", flush=True)
        with open(RESULTS, "w") as f:
            json.dump(results, f, indent=2)

    if which in ("fm", "all"):
        info2m = _fm_info()  # 26 x 80k = 2.08M rows, D=32, B=8192
        run("fm2m_fused_concat", "fm", info2m, fused_forward="concat")
        run("fm2m_fused_packed", "fm", info2m, fused_forward="packed")
        run("fm2m_dense", "fm", info2m, mode="dense")

    if which in ("fmk",):
        # full-step A/B of the fm Pallas kernel inside the DENSE train step
        # (VERDICT r4 #6: the isolated 15.7 ms XLA kernel_bench row is
        # dispatch-dominated; only the full step decides the wiring)
        from tpurec.ops.pallas import kernels as K

        info2m = _fm_info()
        run("fm2m_dense_fmkernel", "fm", info2m, mode="dense")
        K.TRAIN_WINNERS = frozenset(K.TRAIN_WINNERS - {"fm"})
        run("fm2m_dense_nofmkernel", "fm", info2m, mode="dense")
        K.TRAIN_WINNERS = frozenset(K.TRAIN_WINNERS | {"fm"})

    if which in ("final",):
        # headline triple in ONE process (process-to-process drift on the
        # tunnel is ~10%): plain dense vs auto-packed dense vs fused default
        info2m = _fm_info()
        run("fm2m_final_dense_plain", "fm", info2m, mode="dense",
            emb={"dense_packed_gather": False})
        run("fm2m_final_dense_auto", "fm", info2m, mode="dense")
        run("fm2m_final_fused", "fm", info2m, mode="fused")

    if which in ("dink",):
        # full-step A/B of the DIN fused-attention kernel (fwd+bwd) on the
        # current toolchain — the one remaining TRAIN_WINNERS entry
        from tpurec.ops.pallas import kernels as K

        _, dinfo, seq_len = _din_model()
        dp = {
            "user_features": ["user_tag"],
            "item_features": ["item_id", "item_tag"],
            "sequence_features": ["history"],
        }
        run("din_dense_dinkernel", "din", dinfo, dp, seq_len, mode="dense")
        K.TRAIN_WINNERS = frozenset(K.TRAIN_WINNERS - {"din"})
        run("din_dense_nodinkernel", "din", dinfo, dp, seq_len, mode="dense")
        K.TRAIN_WINNERS = frozenset(K.TRAIN_WINNERS | {"din"})

    if which in ("wide",):
        # dim >= 128: no packed view exists — validates the 'auto' rule that
        # routes ONLY this regime to the fused tile-stream engine
        info520k = _fm_info(num_fields=26, vocab_per_field=20_000)  # 520k rows
        run("fm520k_d128_dense", "fm", info520k, mode="dense", dim=128)
        run("fm520k_d128_fused", "fm", info520k, mode="fused", dim=128)

    if which in ("xbk",):
        # 'xla_packed' backward: unsorted packed-destination XLA scatters —
        # no sort / no grad permute / no Pallas plan
        info2m = _fm_info()
        run("fm2m_fused_xla_packed", "fm", info2m, fused_backward="xla_packed")
        _, dinfo, seq_len = _din_model()
        dp = {
            "user_features": ["user_tag"],
            "item_features": ["item_id", "item_tag"],
            "sequence_features": ["history"],
        }
        run("din_fused_xla_packed", "din", dinfo, dp, seq_len,
            fused_backward="xla_packed")

    if which in ("fsort",):
        # global vs batched per-feature id sort inside the fused step
        info2m = _fm_info()
        run("fm2m_fused_sort_feature", "fm", info2m, fused_sort="feature")
        run("fm2m_fused_sort_global", "fm", info2m, fused_sort="global")

    if which in ("densepg",):
        # dense engine with packed-view lookups (EmbeddingConfig.
        # dense_packed_gather): k-fold fewer rows for BOTH the forward take
        # and the autodiff scatter
        info2m = _fm_info()
        run("fm2m_dense_packedg", "fm", info2m, mode="dense",
            emb={"dense_packed_gather": True})
        _, dinfo, seq_len = _din_model()
        dp = {
            "user_features": ["user_tag"],
            "item_features": ["item_id", "item_tag"],
            "sequence_features": ["history"],
        }
        run("din_dense_packedg", "din", dinfo, dp, seq_len, mode="dense",
            emb={"dense_packed_gather": True})

    if which in ("din", "all"):
        _, dinfo, seq_len = _din_model()
        dp = {
            "user_features": ["user_tag"],
            "item_features": ["item_id", "item_tag"],
            "sequence_features": ["history"],
        }
        run("din_fused_concat", "din", dinfo, dp, seq_len, fused_forward="concat")
        run("din_fused_packed", "din", dinfo, dp, seq_len, fused_forward="packed")
        run("din_dense", "din", dinfo, dp, seq_len, mode="dense")

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
