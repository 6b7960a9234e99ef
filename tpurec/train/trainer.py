"""Unified training runtime.

One trainer replaces the reference's 11 copy-evolved ModelManager.py files
(SURVEY §1-L3, 2.FM/ModelManager.py:11-307): model build via the registry,
jitted sharded train/eval steps, streaming metrics, early stopping, Orbax
checkpointing with export-on-best, TensorBoard scalars, and inference — for
every model family, selected purely by config.

TPU design notes:
- the whole step (forward, backward, optimizer, metric update) is one jit;
  the reference's eager per-batch Python loop (2.FM/ModelManager.py:187-196)
  becomes a single XLA program per step.
- batches are placed with the ('data',)-sharding; embedding tables carry
  ('model', None) partitioning metadata from tpurec.embedding, so GSPMD
  inserts the psum/all-gather collectives.
- dense compute runs in TrainConfig.compute_dtype (bfloat16 → MXU); params,
  optimizer state and loss stay fp32.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn
from flax import struct

from tpurec.config import ExperimentConfig
from tpurec.core.early_stop import EarlyStopper
from tpurec.core.mesh import MeshContext, make_mesh
from tpurec.core.metrics import AUC, Mean, MetricBundle
from tpurec.core.summary import NullSummaryWriter, SummaryWriter
from tpurec.data.schema import DataInfo
from tpurec.models.registry import build_model
from tpurec.ops.pallas.kernels import set_training_phase as _set_phase
from tpurec.train import checkpoint as ckpt_lib
from tpurec.train.losses import add_auxiliary, get_loss


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    model_state: Dict[str, Any]  # batch_stats and other mutable collections
    rng: jax.Array
    # sparse-embedding mode only: tables live here (outside optax) with their
    # row-sparse Adam moments (tpurec/embedding/sparse.py)
    tables: Any = None
    table_opt: Any = None


def _dtype_of(name: str):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32, "float16": jnp.float16}[name]


_CACHE_SET = False


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache: step programs (especially the
    sparse-update step) can take minutes to compile on the TPU toolchain —
    cache them across processes."""
    global _CACHE_SET
    if _CACHE_SET:
        return
    import os

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get(
                "TPUREC_COMPILE_CACHE",
                os.path.expanduser("~/.cache/tpurec_jax_cache"),
            ),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these options
    _CACHE_SET = True


# --- measured v5e engine crossovers (benchmarks/engine_ab_results.json +
# bench.py fm_crossover_step_ms), FULL production train steps -------------
# The dense engine wins or ties at EVERY measured shape once narrow-dim
# lookups route through the free (V/k, 128) packed view:
#   FM 2.08M rows D=32:  dense+packed 25.9-27.4  vs fused 27.3-30.7
#   FM 200k rows  D=32:  dense 10.2-12.3         vs fused 20.0-61.5
#   FM 520k rows  D=128: dense 12.5              vs fused 20.4
#   DIN 21.5k rows (550k ids/step): dense 10.1   vs fused 25.9-32.3
# The "slow XLA scatter" the tile-stream engine was built against is a
# NARROW-row artifact (rows lane-pad to 128 — 4x wasted traffic at D=32,
# 28.2 ms measured); full-lane rows scatter efficiently, and packing gives
# narrow dims the same escape. 'auto' therefore always picks dense; the
# fused engine stays available as an opt-in (tested, sharded).
FUSED_MIN_VOCAB_ELEMS = 32 * 1_000_000  # gate for dense auto-packed lookups


def resolve_embedding_engine(config: ExperimentConfig, info: DataInfo, n_model: int = 1) -> ExperimentConfig:
    """embedding_optimizer='auto': resolve to the measured-fastest engine.

    The dense engine (with auto-packed narrow-dim lookups,
    EmbeddingConfig.dense_packed_gather) wins or ties the fused tile-stream
    engine at every shape in the committed full-step A/B matrix (module
    header comment; benchmarks/engine_ab_results.json), so 'auto' always
    resolves to dense. The fused engine and the lazy sparse optimizers stay
    available as explicit choices — the sparse family for optimizer MEMORY
    (rowwise_adam 0.53x table memory, host_adam zero device bytes), not
    speed."""
    oc = config.train.optimizer
    if oc.embedding_optimizer != "auto":
        return config
    train = config.train.replace(
        sparse_embedding=False,
        optimizer=oc.replace(embedding_optimizer="adam"),
    )
    return config.replace(train=train)


class Trainer:
    def __init__(
        self,
        config: ExperimentConfig,
        info: DataInfo,
        mesh_ctx: Optional[MeshContext] = None,
        model: Optional[nn.Module] = None,
    ):
        _enable_compilation_cache()
        self.info = info
        self.mesh_ctx = mesh_ctx or make_mesh(config.mesh)
        config = resolve_embedding_engine(
            config, info, self.mesh_ctx.mesh.shape.get("model", 1)
        )
        self.config = config
        # trace-time flag (see tpurec.embedding.modules) — set explicitly in
        # BOTH directions so trainers with different modes can coexist; each
        # jitted step body also re-asserts it at trace time
        from tpurec.embedding.modules import set_sparse_mode

        set_sparse_mode(config.train.sparse_embedding)
        if model is None:
            mc = config.model
            params = dict(mc.params)
            params.setdefault("dtype", _dtype_of(config.train.compute_dtype))
            mc = mc.replace(params=params)
            model = build_model(mc, info, self.mesh_ctx.mesh)
        self.model = model
        self.loss_fn = get_loss(config.train.loss)
        self.tx = self._make_optimizer()
        self.metrics = self._make_metrics()
        self._train_step = None
        self._eval_step = None
        self.host_store = None  # set by init_state for embedding_optimizer='host_adam'
        self.ckpt = (
            ckpt_lib.CheckpointManager(config.train.checkpoint_dir, config.train.max_to_keep)
            if config.train.checkpoint_dir
            else None
        )

    # ------------------------------------------------------------------ setup
    def _make_optimizer(self) -> optax.GradientTransformation:
        oc = self.config.train.optimizer
        chain = []
        if oc.grad_clip_norm > 0:
            chain.append(optax.clip_by_global_norm(oc.grad_clip_norm))
        if oc.embedding_l2 > 0 or oc.embedding_l2_order1 > 0:
            # coupled full-table L2 on embedding tables (Keras
            # embeddings_regularizer="l2" semantics — the reference FM's
            # regularization, 2.FM/CustomLayers.py:129-134): grad += λ·w for
            # every param named 'embedding*', applied BEFORE the optimizer.
            # Order-1 ('w' LinearEmbedding) tables can take their own λ.
            def _is_emb(path):
                return str(getattr(path[-1], "key", path[-1])).startswith("embedding")

            def _is_order1(path):
                return any(str(getattr(k, "key", k)) == "w" for k in path[:-1])

            split = oc.embedding_l2_order1 >= 0

            def _emb_mask(params):
                return jax.tree_util.tree_map_with_path(
                    lambda path, _: _is_emb(path) and not (split and _is_order1(path)),
                    params,
                )

            if oc.embedding_l2 > 0:
                chain.append(optax.add_decayed_weights(oc.embedding_l2, mask=_emb_mask))
            if split and oc.embedding_l2_order1 > 0:

                def _w_mask(params):
                    return jax.tree_util.tree_map_with_path(
                        lambda path, _: _is_emb(path) and _is_order1(path), params
                    )

                chain.append(
                    optax.add_decayed_weights(oc.embedding_l2_order1, mask=_w_mask)
                )
            if oc.embedding_l2_overrides:
                # per-feature row-range decay on second-order tables: build a
                # (V, 1) coefficient vector over the shared id space
                lam = np.full((self.info.total_dims,), 0.0, np.float32)
                for name, off, dim in zip(
                    self.info.feature_names,
                    self.info.feature_offsets,
                    self.info.feature_dims,
                ):
                    if name in oc.embedding_l2_overrides:
                        # delta on top of the base embedding_l2 already added
                        lam[off : off + dim] = (
                            oc.embedding_l2_overrides[name] - oc.embedding_l2
                        )
                lam_vec = jnp.asarray(lam)

                def _rowwise_decay():
                    def init_fn(params):
                        return optax.EmptyState()

                    def update_fn(updates, state, params=None):
                        def add(path, u, p):
                            if not (_is_emb(path) and not _is_order1(path)):
                                return u
                            pad = p.shape[0] - lam_vec.shape[0]
                            v = (
                                jnp.pad(lam_vec, (0, pad)) if pad > 0 else lam_vec[: p.shape[0]]
                            ).reshape((p.shape[0],) + (1,) * (p.ndim - 1))
                            return u + v * p

                        return (
                            jax.tree_util.tree_map_with_path(add, updates, params),
                            state,
                        )

                    return optax.GradientTransformation(init_fn, update_fn)

                chain.append(_rowwise_decay())
        lr = oc.learning_rate
        if oc.lr_schedule == "cosine" and oc.schedule_steps > 0:
            lr = optax.cosine_decay_schedule(
                oc.learning_rate, oc.schedule_steps, alpha=oc.schedule_alpha
            )
        elif oc.lr_schedule:
            raise KeyError(f"unknown lr_schedule {oc.lr_schedule!r}")
        if oc.name == "adam":
            chain.append(optax.adam(lr, b1=oc.b1, b2=oc.b2, eps=oc.eps))
        elif oc.name == "adamw":
            chain.append(
                optax.adamw(
                    lr, b1=oc.b1, b2=oc.b2, eps=oc.eps,
                    weight_decay=oc.weight_decay,
                )
            )
        elif oc.name == "sgd":
            chain.append(optax.sgd(lr))
        else:
            raise KeyError(f"unknown optimizer {oc.name!r}")
        tx = optax.chain(*chain)
        prefixes = tuple(self.config.train.freeze_prefixes)
        if prefixes:
            # pretrain→freeze: zero every update under a frozen path prefix
            # (reference: frozen pretrained DIEN trunk inside SIM/CAN,
            # 7.SIM/CustomLayers.py:155-157)
            def labels(params):
                def lab(path, _):
                    p = "/".join(
                        str(getattr(k, "key", getattr(k, "idx", k))) for k in path
                    )
                    return (
                        "frozen"
                        if any(
                            p == pref or p.startswith(pref + "/") for pref in prefixes
                        )
                        else "trainable"
                    )

                return jax.tree_util.tree_map_with_path(lab, params)

            tx = optax.multi_transform(
                {"trainable": tx, "frozen": optax.set_to_zero()}, labels
            )
        return tx

    def _make_metrics(self) -> MetricBundle:
        loss_name = self.config.train.loss
        metrics: Dict[str, Any] = {"loss": Mean()}
        names = self.config.train.metrics
        if not names:
            names = {
                "bce": ("auc",),
                "gsu_esu": ("auc",),
                "multi_task": ("ctr_auc", "cvr_auc"),
                "in_batch_softmax": ("accuracy",),
                "model_loss": (),
            }[loss_name]
        for n in names:
            metrics[n] = Mean() if n == "accuracy" else AUC()
        return MetricBundle(metrics)

    def _metric_updates(self, outputs, batch) -> Dict[str, tuple]:
        loss_name = self.config.train.loss
        upd: Dict[str, tuple] = {}
        weight = batch.get("__weight__")  # wrap-padded eval batches
        configured = set(self.metrics.metrics) - {"loss"}
        if loss_name == "model_loss":
            # model computes its own loss; AUCs tracked for whatever task
            # outputs it exposes and the config requested
            if "ctr_auc" in configured and "ctr_output" in outputs:
                upd["ctr_auc"] = (batch["ctr"].reshape(-1), outputs["ctr_output"].reshape(-1))
            if "cvr_auc" in configured and ("cvr_output" in outputs or "ctcvr_output" in outputs):
                cvr_out = outputs.get("ctcvr_output", outputs.get("cvr_output"))
                upd["cvr_auc"] = (batch["cvr"].reshape(-1), cvr_out.reshape(-1))
            if "auc" in configured and "output" in outputs:
                upd["auc"] = (batch["label"].reshape(-1), outputs["output"].reshape(-1))
        elif loss_name == "bce":
            upd["auc"] = (batch["label"].reshape(-1), outputs["output"].reshape(-1))
        elif loss_name == "gsu_esu":
            # AUC from the ESU positive-class probability (reference
            # 7.SIM/ModelManager.py eval loop)
            p = jax.nn.softmax(outputs["esu_logits"].astype(jnp.float32), axis=-1)[:, 1]
            upd["auc"] = (batch["label"].reshape(-1), p)
        elif loss_name == "multi_task":
            upd["ctr_auc"] = (batch["ctr"].reshape(-1), outputs["ctr_output"].reshape(-1))
            cvr_out = outputs.get("ctcvr_output", outputs.get("cvr_output"))
            upd["cvr_auc"] = (batch["cvr"].reshape(-1), cvr_out.reshape(-1))
        elif loss_name == "in_batch_softmax":
            if "logits" in outputs:
                logits = outputs["logits"]
                hit = (jnp.argmax(logits, axis=-1) == 0).astype(jnp.float32)
            else:
                u = outputs["user_embedding"].astype(jnp.float32)
                v = outputs["item_embedding"].astype(jnp.float32)
                logits = u @ v.T
                hit = (jnp.argmax(logits, axis=-1) == jnp.arange(logits.shape[0])).astype(
                    jnp.float32
                )
            upd["accuracy"] = (hit,)
        if weight is not None:
            upd = {k: v + (weight.reshape(-1),) for k, v in upd.items()}
        return upd

    # ------------------------------------------------------------- state init
    def init_state(self, sample_batch: Dict[str, np.ndarray], seed: Optional[int] = None) -> TrainState:
        from tpurec.embedding.modules import set_sparse_mode

        set_sparse_mode(self.config.train.sparse_embedding)
        seed = self.config.train.seed if seed is None else seed
        rng = jax.random.key(seed)
        init_rng, state_rng = jax.random.split(rng)
        batch = self.device_batch(sample_batch)
        variables = self.model.init(
            {"params": init_rng, "dropout": init_rng}, batch, train=False
        )
        # apply the partitioning metadata for real: every param annotated by
        # nn.with_partitioning (embedding rows → ('model', None)) is placed
        # with its NamedSharding; unannotated params are replicated. The
        # optimizer state inherits shardings through zeros_like.
        specs = nn.get_partition_spec(variables)
        variables = nn.unbox(variables)
        if self.mesh_ctx.n_devices > 1:
            mesh = self.mesh_ctx.mesh

            def _place(x, spec):
                try:
                    return jax.device_put(
                        x, jax.sharding.NamedSharding(mesh, spec)
                    )
                except (ValueError, TypeError):
                    return jax.device_put(x, self.mesh_ctx.replicated)

            variables = jax.tree.map(_place, variables, specs)
        params = variables.pop("params")
        model_state = dict(variables)
        model_state.pop("regularization", None)
        tables = table_opt = None
        if self.config.train.sparse_embedding:
            from tpurec.embedding.sparse import (
                init_sparse_adagrad,
                init_sparse_adam,
                init_sparse_row_adam,
            )

            tables = model_state.pop("tables")
            opt_name = self.config.train.optimizer.embedding_optimizer
            if opt_name == "host_adam":
                # moments live in host DRAM (embedding/host_offload.py);
                # device state is just a slot index per table
                from tpurec.embedding.host_offload import (
                    HostAdamState,
                    HostAdamStore,
                )

                if self.mesh_ctx.n_devices > 1:
                    raise ValueError(
                        "embedding_optimizer='host_adam' requires a single "
                        "device (per-shard host callbacks are not wired yet)"
                    )
                self.host_store = HostAdamStore()
                leaves, treedef = jax.tree_util.tree_flatten(tables)
                table_opt = jax.tree_util.tree_unflatten(
                    treedef,
                    [
                        HostAdamState(jnp.int32(self.host_store.register(l.shape)))
                        for l in leaves
                    ],
                )
            else:
                init_opt = {
                    "rowwise_adagrad": init_sparse_adagrad,
                    "rowwise_adam": init_sparse_row_adam,
                    "adam": init_sparse_adam,
                    # fused_adam: dense-parity moments, updated by the Pallas
                    # tile-stream kernel (same state shape as 'adam')
                    "fused_adam": init_sparse_adam,
                }[opt_name]
                table_opt = jax.tree.map(init_opt, tables)
        opt_state = self.tx.init(params)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=opt_state,
            model_state=model_state,
            rng=state_rng,
            tables=tables,
            table_opt=table_opt,
        )

    def device_batch(self, batch: Dict[str, np.ndarray]) -> Dict[str, jnp.ndarray]:
        """Host → device with the batch dim sharded over 'data' (replicated
        fallback when the batch doesn't divide the data axis, e.g. tiny
        ad-hoc inference batches).

        Multi-process: ``batch`` is this host's shard of rows
        (``ArrayLoader(**host_loader_kwargs())``); the global array is
        assembled from every process's local rows without any host-side
        gather (jax.make_array_from_process_local_data)."""
        n = len(next(iter(batch.values())))
        if jax.process_count() > 1:
            sharding = self.mesh_ctx.batch
            return {
                k: jax.make_array_from_process_local_data(
                    sharding, np.asarray(v)
                )
                for k, v in batch.items()
            }
        sharding = (
            self.mesh_ctx.batch if n % self.mesh_ctx.n_data == 0 else self.mesh_ctx.replicated
        )
        return {k: jax.device_put(jnp.asarray(v), sharding) for k, v in batch.items()}

    # ------------------------------------------------------------------ steps
    @staticmethod
    def _variables(state: TrainState) -> Dict[str, Any]:
        v = {"params": state.params, **state.model_state}
        if state.tables is not None:
            v["tables"] = state.tables
        return v

    @property
    def _id_features(self):
        # every id-valued batch column, including the pipeline-sampled
        # negative series (neg_<series>) the DIEN aux loss embeds — in sparse
        # mode all of them must join the unique-row gather / position rewrite
        seqs = list(self.info.sequence_names)
        return list(self.info.feature_names) + seqs + [f"neg_{s}" for s in seqs]

    def _build_sparse_train_step(self) -> Callable:
        from tpurec.embedding.host_offload import HostAdamState
        from tpurec.embedding.sparse import (
            SparseAdagradState,
            SparseAdamState,
            SparseRowAdamState,
            sparse_adam,
            sparse_rowwise_adagrad,
            sparse_rowwise_adam,
            unique_with_positions,
        )

        host_store = getattr(self, "host_store", None)
        model = self.model
        tx = self.tx
        loss_fn = self.loss_fn
        metrics = self.metrics
        oc = self.config.train.optimizer
        l2_coeff = self.config.model.embedding.used_id_l2
        id_features = self._id_features
        mutable = ["batch_stats", "regularization"]

        @partial(jax.jit, donate_argnums=(0,))
        def train_step(state: TrainState, batch, metric_state):
            # set the module-level sparse flag at TRACE time, inside the
            # traced body — retraces (e.g. after sharding changes) then
            # always see the right mode regardless of global state
            from tpurec.embedding.modules import set_sparse_layout, set_sparse_mode

            set_sparse_mode(True)
            set_sparse_layout("unique")
            _set_phase(True)
            step_rng = jax.random.fold_in(state.rng, state.step)
            # batch key structure is static per trace — keep only the id
            # columns this dataset actually carries
            present = [n for n in id_features if n in batch]
            id_shapes = [batch[n].shape for n in present]
            ids_all = jnp.concatenate(
                [batch[n].reshape(-1).astype(jnp.int32) for n in present]
            )
            table_leaves = jax.tree.leaves(state.tables)
            pad_id = table_leaves[0].shape[0] - 1  # sacrificial row (pad_vocab)
            uniq, positions = unique_with_positions(ids_all, pad_id)
            rows = jax.tree.map(lambda t: jnp.take(t, uniq, axis=0), state.tables)
            # rewrite the batch's id features into row-position space (the
            # injected id-0 slot keeps padding_index==0 masks valid)
            batch = dict(batch)
            offset = 0
            for name, shape in zip(present, id_shapes):
                size = int(np.prod(shape))
                batch[name] = positions[offset : offset + size].reshape(shape)
                offset += size

            def compute_loss(params, rows):
                variables = {
                    "params": params,
                    "tables": state.tables,
                    "sparse_rows": rows,
                    **state.model_state,
                }
                outputs, mut = model.apply(
                    variables, batch, train=True, mutable=mutable,
                    rngs={"dropout": step_rng, "sampling": jax.random.fold_in(step_rng, 1)},
                )
                loss, logs = loss_fn(outputs, batch)
                loss, aux_logs = add_auxiliary(loss, outputs)
                logs.update(aux_logs)
                if l2_coeff > 0 and "regularization" in mut:
                    reg = sum(jnp.sum(x) for x in jax.tree.leaves(mut["regularization"]))
                    loss = loss + l2_coeff * reg
                    logs["used_id_l2"] = reg
                new_model_state = {k: v for k, v in mut.items() if k != "regularization"}
                return loss, (outputs, new_model_state, logs)

            (loss, (outputs, new_model_state, logs)), (grads, grad_rows) = (
                jax.value_and_grad(compute_loss, argnums=(0, 1), has_aux=True)(
                    state.params, rows
                )
            )
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            new_step = state.step + 1
            # row-sparse optimizer per table (adam | rowwise_adagrad)
            flat_tables, treedef = jax.tree_util.tree_flatten(state.tables)
            flat_grads = jax.tree.leaves(grad_rows)
            flat_opt = jax.tree_util.tree_flatten(
                state.table_opt,
                is_leaf=lambda x: isinstance(
                    x,
                    (
                        SparseAdamState,
                        SparseAdagradState,
                        SparseRowAdamState,
                        HostAdamState,
                    ),
                ),
            )[0]
            new_tables, new_opts = [], []
            for t, g, o in zip(flat_tables, flat_grads, flat_opt):
                if isinstance(o, HostAdamState):
                    nt, no = host_store.update(
                        t, o, uniq, g, new_step, oc.learning_rate, oc.b1, oc.b2, oc.eps
                    )
                elif isinstance(o, SparseAdagradState):
                    nt, no = sparse_rowwise_adagrad(t, o, uniq, g, oc.learning_rate)
                elif isinstance(o, SparseRowAdamState):
                    nt, no = sparse_rowwise_adam(
                        t, o, uniq, g, new_step, oc.learning_rate, oc.b1, oc.b2, oc.eps
                    )
                else:
                    nt, no = sparse_adam(
                        t, o, uniq, g, new_step, oc.learning_rate, oc.b1, oc.b2, oc.eps
                    )
                new_tables.append(nt)
                new_opts.append(no)
            tables = jax.tree_util.tree_unflatten(treedef, new_tables)
            table_opt = jax.tree_util.tree_unflatten(treedef, new_opts)
            new_state = TrainState(
                step=new_step,
                params=params,
                opt_state=opt_state,
                model_state={**state.model_state, **new_model_state},
                rng=state.rng,
                tables=tables,
                table_opt=table_opt,
            )
            metric_state = metrics.update(
                metric_state, loss=(loss,), **self._metric_updates(outputs, batch)
            )
            return new_state, metric_state, logs | {"loss": loss}

        return train_step

    def _build_fused_train_step(self) -> Callable:
        """Sparse mode with embedding_optimizer='fused_adam': identity-layout
        rows + the Pallas tile-stream gather / scatter-Adam kernels
        (tpurec.ops.pallas.embedding_update). Numerically identical to DENSE
        Adam training (every row's moments decay — unlike the lazy sparse
        optimizers) while never materializing a table-shaped gradient and
        never touching XLA's latency-bound gather/scatter row loops.

        Restrictions (falls back is NOT automatic — config error instead):
        padding_index == 0 for sequence datasets, and no id-equality-based
        losses (in_batch_softmax compares raw item ids across the batch;
        position-rewritten ids break that — use the 'unique' layout engines
        for retrieval training). Multi-device meshes dispatch to the
        shard_map variant (_build_fused_train_step_sharded)."""
        from tpurec.embedding.sparse import SparseAdamState
        from tpurec.ops.pallas.embedding_update import (
            CHUNK,
            ScatterPlan,
            _unpermute,
            adam_update,
            fused_scatter_add,
            make_scatter_plan,
            packed_count_rows,
            packed_scatter_add,
            packed_take as _packed_take,
            pick_block_rows,
            scatter_adam_grouped,
        )

        if self.info.sequence_names and self.info.padding_index != 0:
            raise ValueError(
                "embedding_optimizer='fused_adam' sequence support assumes "
                "padding_index == 0 (mask overrides are keyed off id 0)"
            )
        if self.config.train.loss == "in_batch_softmax":
            raise ValueError(
                "embedding_optimizer='fused_adam' cannot train "
                "in_batch_softmax losses (raw-id equality checks don't "
                "survive the position rewrite); use 'adam'/'rowwise_adam'"
            )
        if self.mesh_ctx.mesh.shape.get("model", 1) > 1:
            # row-sharded tables: the shard_map variant (tables over 'model',
            # id/grad streams over 'data'). n_model == 1 keeps the global
            # GSPMD path below (also the single-chip bench path).
            return self._build_fused_train_step_sharded()
        model = self.model
        tx = self.tx
        loss_fn = self.loss_fn
        metrics = self.metrics
        oc = self.config.train.optimizer
        l2_coeff = self.config.model.embedding.used_id_l2
        id_features = self._id_features
        seq_cols = set(self._id_features) - set(self.info.feature_names)
        padding_index = self.info.padding_index
        mutable = ["batch_stats"]
        interpret = jax.default_backend() != "tpu"
        chunk = CHUNK
        # 'sort_payload': one lax.sort carries the grad columns alongside the
        # id keys (streaming compare-exchange), replacing the id argsort AND
        # the latency-bound take(grads, order) permute; used-id L2 then moves
        # to table space (G += l2 * table on touched rows — identical math,
        # since rows[j] == table[id_j]), so the original-order
        # first-occurrence mask is never needed.
        # 'permute' | 'sort_payload' (Pallas tile-stream kernels over the
        # sorted stream) | 'xla_packed' (unsorted packed-destination XLA
        # scatters — no sort/permute/plan)
        use_sort_payload = oc.fused_backward == "sort_payload"
        use_xla_packed = oc.fused_backward == "xla_packed"
        forward_strategy = oc.fused_forward
        # 'feature' sort: tabular columns occupy disjoint ascending offset
        # ranges, so concat of per-column sorts IS the global sort (and the
        # iota tie-break yields the bit-identical permutation)
        feature_sort = oc.fused_sort == "feature" or (
            oc.fused_sort == "auto" and not seq_cols
        )

        def _build_plan(ids_all, present, shapes, v_rows):
            if feature_sort and all(len(s) == 1 for s in shapes):
                f = len(present)
                b = shapes[0][0]
                ids_fb = ids_all.reshape(f, b)
                io = jnp.broadcast_to(
                    jax.lax.iota(jnp.int32, b)[None, :], (f, b)
                )
                s, o = jax.lax.sort((ids_fb, io), dimension=1, num_keys=1)
                sids = s.reshape(-1)
                order = (o + (jnp.arange(f, dtype=jnp.int32) * b)[:, None]).reshape(-1)
                n = f * b
                npad = -(-n // chunk) * chunk
                sids = jnp.concatenate(
                    [sids, jnp.full((npad - n,), v_rows, jnp.int32)]
                )
                return ScatterPlan(
                    sids, order, n, v_rows, pick_block_rows(chunk=chunk), chunk
                )
            return make_scatter_plan(
                ids_all, v_rows, pick_block_rows(chunk=chunk), chunk
            )

        def _flat(x):
            # sequence (B, L) columns flatten COLUMN-major so that, after the
            # transposed position rewrite below, every reshape(B, -1) column
            # of a lookup is a contiguous arange — the contract
            # contiguous_take's scatter-free VJP relies on
            return (x.T if x.ndim == 2 else x).reshape(-1).astype(jnp.int32)

        @partial(jax.jit, donate_argnums=(0,))
        def train_step(state: TrainState, batch, metric_state):
            from tpurec.embedding.modules import set_sparse_layout, set_sparse_mode

            set_sparse_mode(True)
            set_sparse_layout("direct")
            _set_phase(True)
            step_rng = jax.random.fold_in(state.rng, state.step)
            present = [n for n in id_features if n in batch]
            shapes = [batch[n].shape for n in present]
            ids_all = jnp.concatenate([_flat(batch[n]) for n in present])
            n_ids = ids_all.shape[0]
            flat_tables, treedef = jax.tree_util.tree_flatten(state.tables)
            v_rows = flat_tables[0].shape[0]
            assert all(t.shape[0] == v_rows for t in flat_tables), (
                "fused_adam expects one shared id space across tables"
            )
            flat2d = [t.reshape(t.shape[0], -1) for t in flat_tables]
            plan = None
            if not (use_sort_payload or use_xla_packed):
                plan = _build_plan(ids_all, present, shapes, v_rows)
            # forward rows (original order). Gradients never flow through
            # this gather: rows enter compute_loss as a differentiated
            # ARGUMENT, so no VJP is traced through the take. Two strategies
            # (OptimizerConfig.fused_forward; A/B measured end-to-end in
            # benchmarks/fm_fused_profile_results.json):
            #  'concat' — ONE take over the column-concatenated tables: XLA's
            #   TPU gather is latency-bound per ROW (~24M rows/s), so a single
            #   take over the (V, sum D) concat costs the same row loop as the
            #   widest table's take alone.
            #  'packed' — per-table takes of ids//k against the free
            #   (V/k, 128) packed view (k = 128/D fewer source rows), lane
            #   group selected on the VPU.
            widths = [int(np.prod(t.shape[1:])) for t in flat_tables]
            rows_leaves = []
            if forward_strategy == "packed":
                for t, t2, wdt in zip(flat_tables, flat2d, widths):
                    rows_leaves.append(
                        _packed_take(t2, ids_all).reshape((n_ids,) + t.shape[1:])
                    )
            else:
                cat = jnp.concatenate(flat2d, axis=1)
                rows_cat = jnp.take(cat, ids_all, axis=0)
                col = 0
                for t, wdt in zip(flat_tables, widths):
                    rows_leaves.append(
                        rows_cat[:, col : col + wdt].reshape((n_ids,) + t.shape[1:])
                    )
                    col += wdt
            rows = jax.tree_util.tree_unflatten(treedef, rows_leaves)
            if l2_coeff > 0 and plan is not None:
                # first-occurrence mask in ORIGINAL order: used-id L2 counts
                # each unique id once (reference 5.DIN/ModelManager.py:175-190)
                first_sorted = jnp.concatenate(
                    [
                        jnp.ones((1,), jnp.float32),
                        (plan.sids[1 : plan.n] != plan.sids[: plan.n - 1]).astype(
                            jnp.float32
                        ),
                    ]
                )
                first_orig = _unpermute(first_sorted[:, None], plan.order)[:, 0]
            # rewrite batch id columns to identity positions (static aranges;
            # (B, L) sequences get TRANSPOSED positions to match _flat's
            # column-major concat order). The position rewrite destroys the
            # padding-index sentinel, so every sequence column's original
            # validity mask ships alongside as '__mask__<name>'
            # (models.base.series_mask prefers it). Padding occurrences keep
            # their own slots — their rows equal table[padding_index], so
            # forward values and (post-scatter) gradients match dense exactly.
            batch = dict(batch)
            offset = 0
            for name, shape in zip(present, shapes):
                size = int(np.prod(shape))
                pos = jnp.arange(offset, offset + size, dtype=jnp.int32)
                if name in seq_cols and len(shape) == 2:
                    batch[f"__mask__{name}"] = (
                        batch[name] != padding_index
                    ).astype(jnp.float32)
                    pos = pos.reshape(shape[1], shape[0]).T
                else:
                    pos = pos.reshape(shape)
                batch[name] = pos
                offset += size

            def compute_loss(params, rows):
                variables = {
                    "params": params,
                    "tables": state.tables,
                    "sparse_rows": rows,
                    **state.model_state,
                }
                outputs, mut = model.apply(
                    variables, batch, train=True, mutable=mutable,
                    rngs={"dropout": step_rng, "sampling": jax.random.fold_in(step_rng, 1)},
                )
                loss, logs = loss_fn(outputs, batch)
                loss, aux_logs = add_auxiliary(loss, outputs)
                logs.update(aux_logs)
                if l2_coeff > 0 and plan is not None:
                    reg = sum(
                        0.5
                        * jnp.sum(
                            first_orig
                            * jnp.sum(
                                jnp.square(r.reshape(n_ids, -1).astype(jnp.float32)),
                                axis=-1,
                            )
                        )
                        for r in jax.tree.leaves(rows)
                    )
                    loss = loss + l2_coeff * reg
                    logs["used_id_l2"] = reg
                return loss, (outputs, dict(mut), logs)

            (loss, (outputs, new_model_state, logs)), (grads, grad_rows) = (
                jax.value_and_grad(compute_loss, argnums=(0, 1), has_aux=True)(
                    state.params, rows
                )
            )
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            new_step = state.step + 1
            flat_grads = jax.tree.leaves(grad_rows)
            flat_opt = jax.tree_util.tree_flatten(
                state.table_opt, is_leaf=lambda x: isinstance(x, SparseAdamState)
            )[0]
            if use_xla_packed:
                # no sort, no permute, no plan: XLA scatter-add into each
                # table's free (V/k, 128) packed view on the UNSORTED stream
                # (measured 5.07 ms vs the Pallas kernel's 9.7 + 1.7 sort +
                # 2.4 permute at the FM bench shapes — packed_scatter_add)
                touched = None
                if l2_coeff > 0:
                    count = packed_count_rows(v_rows, ids_all)
                    touched = (count > 0).astype(jnp.float32)
                    reg = 0.0
                nps, nms, nvs = [], [], []
                for t2, o, g in zip(flat2d, flat_opt, flat_grads):
                    gd = packed_scatter_add(v_rows, ids_all, g.reshape(n_ids, -1))
                    tf32 = t2.astype(jnp.float32)
                    if touched is not None:
                        gd = gd + l2_coeff * touched * tf32
                        reg = reg + 0.5 * jnp.sum(
                            touched[:, 0] * jnp.sum(jnp.square(tf32), axis=-1)
                        )
                    p2, m2, v2 = adam_update(
                        tf32,
                        o.m.reshape(o.m.shape[0], -1).astype(jnp.float32),
                        o.v.reshape(o.v.shape[0], -1).astype(jnp.float32),
                        gd, new_step, oc.learning_rate, oc.b1, oc.b2, oc.eps,
                    )
                    nps.append(p2)
                    nms.append(m2)
                    nvs.append(v2)
                if touched is not None:
                    loss = loss + l2_coeff * reg
                    logs["used_id_l2"] = reg
                new_tables = [p.reshape(t.shape) for p, t in zip(nps, flat_tables)]
                new_opts = [
                    SparseAdamState(nm.reshape(t.shape), nv.reshape(t.shape))
                    for nm, nv, t in zip(nms, nvs, flat_tables)
                ]
                tables = jax.tree_util.tree_unflatten(treedef, new_tables)
                table_opt = jax.tree_util.tree_unflatten(treedef, new_opts)
                new_state = TrainState(
                    step=new_step,
                    params=params,
                    opt_state=opt_state,
                    model_state={**state.model_state, **new_model_state},
                    rng=state.rng,
                    tables=tables,
                    table_opt=table_opt,
                )
                metric_state = metrics.update(
                    metric_state, loss=(loss,), **self._metric_updates(outputs, batch)
                )
                return new_state, metric_state, logs | {"loss": loss}
            g_cat0 = jnp.concatenate(
                [g.reshape(n_ids, -1) for g in flat_grads], axis=1
            )
            if use_sort_payload:
                srt = jax.lax.sort(
                    (ids_all,) + tuple(g_cat0[:, j] for j in range(g_cat0.shape[1])),
                    num_keys=1,
                )
                npad = -(-n_ids // chunk) * chunk
                sids_p = jnp.concatenate(
                    [srt[0], jnp.full((npad - n_ids,), v_rows, jnp.int32)]
                )
                g_cat = jnp.stack(srt[1:], axis=1)  # (n, W); kernels pad rows
                plan = ScatterPlan(
                    sids_p, jnp.zeros((0,), jnp.int32), n_ids, v_rows,
                    pick_block_rows(chunk=chunk), chunk,
                )
            else:
                # one concatenated permute (latency-bound-per-row argument)
                g_cat = jnp.take(g_cat0, plan.order, axis=0)
            gs_list, col = [], 0
            for wdt in widths:
                gs_list.append(g_cat[:, col : col + wdt])
                col += wdt
            if use_sort_payload and l2_coeff > 0:
                # used-id L2 in table space: scatter a column of ones to get
                # per-row occurrence counts (sentinel pad rows self-mask in
                # the kernel), then G += l2 * table on touched rows — the
                # exact gradient the rows-space reg produced, each unique id
                # counted once
                count = fused_scatter_add(
                    v_rows, 1, plan,
                    jnp.ones((g_cat.shape[0], 1), jnp.float32), interpret,
                )
                touched = (count > 0).astype(jnp.float32)
                nps, nms, nvs = [], [], []
                reg = 0.0
                for t2, o, g in zip(flat2d, flat_opt, gs_list):
                    gd = fused_scatter_add(v_rows, t2.shape[1], plan, g, interpret)
                    tf32 = t2.astype(jnp.float32)
                    gd = gd + l2_coeff * touched * tf32
                    reg = reg + 0.5 * jnp.sum(
                        touched[:, 0] * jnp.sum(jnp.square(tf32), axis=-1)
                    )
                    p2, m2, v2 = adam_update(
                        tf32,
                        o.m.reshape(o.m.shape[0], -1).astype(jnp.float32),
                        o.v.reshape(o.v.shape[0], -1).astype(jnp.float32),
                        gd, new_step, oc.learning_rate, oc.b1, oc.b2, oc.eps,
                    )
                    nps.append(p2)
                    nms.append(m2)
                    nvs.append(v2)
                # reported loss matches the rows-space formulation (the model
                # loss above excluded the reg term in this mode)
                loss = loss + l2_coeff * reg
                logs["used_id_l2"] = reg
            else:
                nps, nms, nvs = scatter_adam_grouped(
                    flat2d,
                    [o.m.reshape(o.m.shape[0], -1) for o in flat_opt],
                    [o.v.reshape(o.v.shape[0], -1) for o in flat_opt],
                    plan,
                    gs_list,
                    new_step,
                    oc.learning_rate,
                    oc.b1,
                    oc.b2,
                    oc.eps,
                    interpret=interpret,
                )
            new_tables = [p.reshape(t.shape) for p, t in zip(nps, flat_tables)]
            new_opts = [
                SparseAdamState(nm.reshape(t.shape), nv.reshape(t.shape))
                for nm, nv, t in zip(nms, nvs, flat_tables)
            ]
            tables = jax.tree_util.tree_unflatten(treedef, new_tables)
            table_opt = jax.tree_util.tree_unflatten(treedef, new_opts)
            new_state = TrainState(
                step=new_step,
                params=params,
                opt_state=opt_state,
                model_state={**state.model_state, **new_model_state},
                rng=state.rng,
                tables=tables,
                table_opt=table_opt,
            )
            metric_state = metrics.update(
                metric_state, loss=(loss,), **self._metric_updates(outputs, batch)
            )
            return new_state, metric_state, logs | {"loss": loss}

        return train_step

    def _build_fused_train_step_sharded(self) -> Callable:
        """fused_adam over a multi-device mesh (VERDICT r4 #9): tables, Adam
        moments and the tile-stream kernels run PER SHARD under shard_map —
        rows sharded over 'model', the id/grad streams over 'data'.

        Design: the id sort is per-data-shard (n/n_data ids each — cheaper
        than the global sort). Each (data, model) device clips the sorted
        stream into its local row range: clip preserves monotonicity, and
        clipped-out ids land on sentinels that self-mask in the kernels'
        row-range compare (below-range ids clip to -LANES, whose truncated
        div never matches a local row; above-range to the local sentinel
        v_loc). The local aggregated grad is psum'd over 'data' (the DP
        table-grad reduction) before the shard-local Adam; forward rows are
        psum'd over 'model' (each shard contributes its rows, zeros
        elsewhere). Backward strategy is 'permute'; used-id L2 runs in table
        space (touched = psum'd occurrence count > 0)."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from tpurec.core.mesh import DATA_AXIS, MODEL_AXIS
        from tpurec.embedding.sparse import SparseAdamState
        from tpurec.ops.pallas.embedding_update import (
            CHUNK,
            LANES,
            ScatterPlan,
            adam_update,
            fused_scatter_add,
            packed_take as _packed_take,
            pick_block_rows,
        )

        mesh = self.mesh_ctx.mesh
        n_model = mesh.shape.get(MODEL_AXIS, 1)
        n_data = mesh.shape.get(DATA_AXIS, 1)
        model = self.model
        tx = self.tx
        loss_fn = self.loss_fn
        metrics = self.metrics
        oc = self.config.train.optimizer
        l2_coeff = self.config.model.embedding.used_id_l2
        id_features = self._id_features
        seq_cols = set(self._id_features) - set(self.info.feature_names)
        padding_index = self.info.padding_index
        mutable = ["batch_stats"]
        interpret = jax.default_backend() != "tpu"
        chunk = CHUNK

        def _flat(x):
            return (x.T if x.ndim == 2 else x).reshape(-1).astype(jnp.int32)

        def _local_plan(sids_local, v_loc, n_loc):
            npad = -(-n_loc // chunk) * chunk
            sids_p = jnp.concatenate(
                [sids_local, jnp.full((npad - n_loc,), v_loc, jnp.int32)]
            )
            return ScatterPlan(
                sids_p, jnp.zeros((0,), jnp.int32), n_loc, v_loc,
                pick_block_rows(chunk=chunk), chunk,
            )

        @partial(jax.jit, donate_argnums=(0,))
        def train_step(state: TrainState, batch, metric_state):
            from tpurec.embedding.modules import set_sparse_layout, set_sparse_mode

            set_sparse_mode(True)
            set_sparse_layout("direct")
            _set_phase(True)
            step_rng = jax.random.fold_in(state.rng, state.step)
            present = [n for n in id_features if n in batch]
            shapes = [batch[n].shape for n in present]
            ids_all = jnp.concatenate([_flat(batch[n]) for n in present])
            n_ids = ids_all.shape[0]
            flat_tables, treedef = jax.tree_util.tree_flatten(state.tables)
            v_rows = flat_tables[0].shape[0]
            assert all(t.shape[0] == v_rows for t in flat_tables), (
                "fused_adam expects one shared id space across tables"
            )
            assert v_rows % (n_model * LANES) == 0, (
                "pad_vocab must align shards to 128-row multiples"
            )
            assert n_ids % n_data == 0, (
                f"sharded fused_adam splits the id stream over 'data': "
                f"{n_ids} ids do not divide over {n_data} data shards "
                f"(make batch_size a multiple of the data axis)"
            )
            flat2d = [t.reshape(t.shape[0], -1) for t in flat_tables]
            widths = [int(np.prod(t.shape[1:])) for t in flat_tables]
            v_loc = v_rows // n_model

            # ---- forward rows: per-shard packed takes, psum over 'model'
            @partial(
                shard_map,
                mesh=mesh,
                in_specs=(P(MODEL_AXIS, None), P(DATA_AXIS)),
                out_specs=P(DATA_AXIS, None),
                check_vma=False,
            )
            def gather_local(t2, ids_chunk):
                lo = jax.lax.axis_index(MODEL_AXIS) * v_loc
                loc = ids_chunk - lo
                valid = (loc >= 0) & (loc < v_loc)
                out = _packed_take(t2, jnp.clip(loc, 0, v_loc - 1))
                out = jnp.where(valid[:, None], out, 0.0)
                return jax.lax.psum(out, MODEL_AXIS)

            rows_leaves = [
                gather_local(t2, ids_all).reshape((n_ids,) + t.shape[1:])
                for t, t2 in zip(flat_tables, flat2d)
            ]
            rows = jax.tree_util.tree_unflatten(treedef, rows_leaves)

            # ---- identity-position batch rewrite (as the unsharded step)
            batch = dict(batch)
            offset = 0
            for name, shape in zip(present, shapes):
                size = int(np.prod(shape))
                pos = jnp.arange(offset, offset + size, dtype=jnp.int32)
                if name in seq_cols and len(shape) == 2:
                    batch[f"__mask__{name}"] = (
                        batch[name] != padding_index
                    ).astype(jnp.float32)
                    pos = pos.reshape(shape[1], shape[0]).T
                else:
                    pos = pos.reshape(shape)
                batch[name] = pos
                offset += size

            def compute_loss(params, rows):
                variables = {
                    "params": params,
                    "tables": state.tables,
                    "sparse_rows": rows,
                    **state.model_state,
                }
                outputs, mut = model.apply(
                    variables, batch, train=True, mutable=mutable,
                    rngs={"dropout": step_rng, "sampling": jax.random.fold_in(step_rng, 1)},
                )
                loss, logs = loss_fn(outputs, batch)
                loss, aux_logs = add_auxiliary(loss, outputs)
                logs.update(aux_logs)
                return loss, (outputs, dict(mut), logs)

            (loss, (outputs, new_model_state, logs)), (grads, grad_rows) = (
                jax.value_and_grad(compute_loss, argnums=(0, 1), has_aux=True)(
                    state.params, rows
                )
            )
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            new_step = state.step + 1
            flat_grads = jax.tree.leaves(grad_rows)
            flat_opt = jax.tree_util.tree_flatten(
                state.table_opt, is_leaf=lambda x: isinstance(x, SparseAdamState)
            )[0]
            g_cat0 = jnp.concatenate(
                [g.reshape(n_ids, -1) for g in flat_grads], axis=1
            )

            # ---- per-shard sort + scatter + psum(G) over 'data' + local Adam
            @partial(
                shard_map,
                mesh=mesh,
                in_specs=(
                    [P(MODEL_AXIS, None)] * len(flat2d),
                    [P(MODEL_AXIS, None)] * len(flat2d),
                    [P(MODEL_AXIS, None)] * len(flat2d),
                    P(DATA_AXIS),
                    P(DATA_AXIS, None),
                ),
                out_specs=(
                    [P(MODEL_AXIS, None)] * len(flat2d),
                    [P(MODEL_AXIS, None)] * len(flat2d),
                    [P(MODEL_AXIS, None)] * len(flat2d),
                    P(),
                ),
                check_vma=False,
            )
            def update_local(t2s, m2s, v2s, ids_chunk, g_chunk):
                n_loc = ids_chunk.shape[0]
                sids_g, order = jax.lax.sort(
                    (ids_chunk, jax.lax.iota(jnp.int32, n_loc)), num_keys=1
                )
                lo = jax.lax.axis_index(MODEL_AXIS) * v_loc
                # map into the local range, keeping monotonicity: below-range
                # ids all land EXACTLY on -LANES (<= -k for every pack factor,
                # so lax.div's truncate-toward-zero gives <= -1 — never a
                # local row — while div(-128, k*R) == 0 keeps those chunks
                # routed to tile 0); above-range on the sentinel v_loc. A
                # plain clip would leave values in (-k, 0) whose truncated
                # div is 0 — false hits on packed row 0.
                sids_l = jnp.where(
                    sids_g < lo,
                    jnp.int32(-LANES),
                    jnp.minimum(sids_g - lo, v_loc),
                )
                plan = _local_plan(sids_l, v_loc, n_loc)
                g_sorted = jnp.take(g_chunk, order, axis=0)
                gs_list, col = [], 0
                for wdt in widths:
                    gs_list.append(g_sorted[:, col : col + wdt])
                    col += wdt
                reg = jnp.zeros((), jnp.float32)
                touched = None
                if l2_coeff > 0:
                    count = fused_scatter_add(
                        v_loc, 1, plan, jnp.ones((n_loc, 1), jnp.float32), interpret
                    )
                    count = jax.lax.psum(count, DATA_AXIS)
                    touched = (count > 0).astype(jnp.float32)
                nps, nms, nvs = [], [], []
                for t2, m2, v2, gs in zip(t2s, m2s, v2s, gs_list):
                    gd = fused_scatter_add(v_loc, t2.shape[1], plan, gs, interpret)
                    gd = jax.lax.psum(gd, DATA_AXIS)
                    tf32 = t2.astype(jnp.float32)
                    if touched is not None:
                        gd = gd + l2_coeff * touched * tf32
                        reg = reg + 0.5 * jnp.sum(
                            touched[:, 0] * jnp.sum(jnp.square(tf32), axis=-1)
                        )
                    p2, mm2, vv2 = adam_update(
                        tf32,
                        m2.astype(jnp.float32),
                        v2.astype(jnp.float32),
                        gd, new_step, oc.learning_rate, oc.b1, oc.b2, oc.eps,
                    )
                    nps.append(p2)
                    nms.append(mm2)
                    nvs.append(vv2)
                reg = jax.lax.psum(reg, MODEL_AXIS)
                return nps, nms, nvs, reg

            nps, nms, nvs, reg = update_local(
                flat2d,
                [o.m.reshape(o.m.shape[0], -1) for o in flat_opt],
                [o.v.reshape(o.v.shape[0], -1) for o in flat_opt],
                ids_all,
                g_cat0,
            )
            if l2_coeff > 0:
                loss = loss + l2_coeff * reg
                logs = logs | {"used_id_l2": reg}
            new_tables = [p.reshape(t.shape) for p, t in zip(nps, flat_tables)]
            new_opts = [
                SparseAdamState(nm.reshape(t.shape), nv.reshape(t.shape))
                for nm, nv, t in zip(nms, nvs, flat_tables)
            ]
            tables = jax.tree_util.tree_unflatten(treedef, new_tables)
            table_opt = jax.tree_util.tree_unflatten(treedef, new_opts)
            new_state = TrainState(
                step=new_step,
                params=params,
                opt_state=opt_state,
                model_state={**state.model_state, **new_model_state},
                rng=state.rng,
                tables=tables,
                table_opt=table_opt,
            )
            metric_state = metrics.update(
                metric_state, loss=(loss,), **self._metric_updates(outputs, batch)
            )
            return new_state, metric_state, logs | {"loss": loss}

        return train_step

    def _build_train_step(self) -> Callable:
        model = self.model
        tx = self.tx
        loss_fn = self.loss_fn
        metrics = self.metrics
        l2_coeff = self.config.model.embedding.used_id_l2
        mutable = ["batch_stats", "regularization"]
        pg_cfg = self.config.model.embedding.dense_packed_gather
        if pg_cfg is None:  # auto: packed views win only on LARGE tables
            pg_cfg = (
                self.info.total_dims * self.config.model.embedding.dim
                >= FUSED_MIN_VOCAB_ELEMS
            )
        packed_gather = bool(pg_cfg) and self.mesh_ctx.mesh.shape.get("model", 1) == 1

        @partial(jax.jit, donate_argnums=(0,))
        def train_step(state: TrainState, batch, metric_state):
            from tpurec.embedding.modules import (
                set_dense_packed_gather,
                set_sparse_mode,
            )

            set_sparse_mode(False)
            set_dense_packed_gather(packed_gather)
            _set_phase(True)
            step_rng = jax.random.fold_in(state.rng, state.step)

            def compute_loss(params):
                variables = {"params": params, **state.model_state}
                outputs, mut = model.apply(
                    variables,
                    batch,
                    train=True,
                    mutable=mutable,
                    rngs={"dropout": step_rng, "sampling": jax.random.fold_in(step_rng, 1)},
                )
                loss, logs = loss_fn(outputs, batch)
                loss, aux_logs = add_auxiliary(loss, outputs)
                logs.update(aux_logs)
                if l2_coeff > 0 and "regularization" in mut:
                    reg = sum(
                        jnp.sum(x) for x in jax.tree.leaves(mut["regularization"])
                    )
                    loss = loss + l2_coeff * reg
                    logs["used_id_l2"] = reg
                new_model_state = {
                    k: v for k, v in mut.items() if k != "regularization"
                }
                return loss, (outputs, new_model_state, logs)

            (loss, (outputs, new_model_state, logs)), grads = jax.value_and_grad(
                compute_loss, has_aux=True
            )(state.params)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            model_state = {**state.model_state, **new_model_state}
            new_state = TrainState(
                step=state.step + 1,
                params=params,
                opt_state=opt_state,
                model_state=model_state,
                rng=state.rng,
            )
            metric_state = metrics.update(
                metric_state, loss=(loss,), **self._metric_updates(outputs, batch)
            )
            return new_state, metric_state, logs | {"loss": loss}

        return train_step

    def _build_eval_step(self) -> Callable:
        model = self.model
        loss_fn = self.loss_fn
        metrics = self.metrics

        sparse = self.config.train.sparse_embedding
        pg_cfg = self.config.model.embedding.dense_packed_gather
        if pg_cfg is None:
            pg_cfg = (
                self.info.total_dims * self.config.model.embedding.dim
                >= FUSED_MIN_VOCAB_ELEMS
            )
        packed_gather = (
            bool(pg_cfg)
            and not sparse
            and self.mesh_ctx.mesh.shape.get("model", 1) == 1
        )

        @jax.jit
        def eval_step(state: TrainState, batch, metric_state):
            from tpurec.embedding.modules import (
                set_dense_packed_gather,
                set_sparse_layout,
                set_sparse_mode,
            )

            set_sparse_mode(sparse)
            set_sparse_layout("unique")
            set_dense_packed_gather(packed_gather)
            _set_phase(False)
            variables = Trainer._variables(state)
            outputs = model.apply(variables, batch, train=False)
            loss, _ = loss_fn(outputs, batch)
            loss, _ = add_auxiliary(loss, outputs)
            w = batch.get("__weight__")
            loss_args = (loss,) if w is None else (loss, jnp.sum(w))
            return metrics.update(
                metric_state, loss=loss_args, **self._metric_updates(outputs, batch)
            )

        return eval_step

    @property
    def train_step(self):
        if self._train_step is None:
            if not self.config.train.sparse_embedding:
                self._train_step = self._build_train_step()
            elif self.config.train.optimizer.embedding_optimizer == "fused_adam":
                self._train_step = self._build_fused_train_step()
            else:
                self._train_step = self._build_sparse_train_step()
        return self._train_step

    @property
    def eval_step(self):
        if self._eval_step is None:
            self._eval_step = self._build_eval_step()
        return self._eval_step

    # ------------------------------------------------------------------ loops
    def train_epoch(
        self,
        state: TrainState,
        batches: Iterable[Dict[str, np.ndarray]],
        writer=None,
        epoch: int = 0,
        eval_hook: Optional[Callable[[TrainState], None]] = None,
    ) -> Tuple[TrainState, Dict[str, float]]:
        writer = writer or NullSummaryWriter()
        metric_state = self.metrics.init()
        cfg = self.config.train
        log_every = cfg.log_every_steps
        eval_every = cfg.eval_every_steps
        profiling = False
        t0 = time.time()
        n = 0
        for batch in batches:
            n += 1
            if cfg.profile_dir and epoch == 0:
                if n == cfg.profile_start_step:
                    jax.profiler.start_trace(cfg.profile_dir)
                    profiling = True
                elif profiling and n == cfg.profile_start_step + cfg.profile_num_steps:
                    jax.block_until_ready(state.params)
                    jax.profiler.stop_trace()
                    profiling = False
            batch = self.device_batch(batch)
            state, metric_state, logs = self.train_step(state, batch, metric_state)
            if eval_hook is not None and eval_every and n % eval_every == 0:
                eval_hook(state)
            if log_every and n % log_every == 0:
                results = {k: float(v) for k, v in self.metrics.result(metric_state).items()}
                step = int(state.step)
                for k, v in results.items():
                    writer.scalar(f"train/{k}", v, step)
                rate = n * next(iter(batch.values())).shape[0] / (time.time() - t0)
                print(
                    f"epoch {epoch} step {step}: "
                    + " ".join(f"{k}={v:.4f}" for k, v in results.items())
                    + f" ({rate:.0f} ex/s)"
                )
        if profiling:  # epoch shorter than the profile window
            jax.block_until_ready(state.params)
            jax.profiler.stop_trace()
        results = {k: float(v) for k, v in self.metrics.result(metric_state).items()}
        return state, results

    def evaluate(
        self, state: TrainState, batches: Iterable[Dict[str, np.ndarray]]
    ) -> Dict[str, float]:
        metric_state = self.metrics.init()
        for batch in batches:
            batch = self.device_batch(batch)
            metric_state = self.eval_step(state, batch, metric_state)
        return {k: float(v) for k, v in self.metrics.result(metric_state).items()}

    def _selection_metric(self, eval_results: Dict[str, float]) -> float:
        """The early-stop / keep-best criterion: AUC for ranking, mean AUC for
        multi-task (reference 4.MMOE/ModelManager.py:285-293), −loss otherwise."""
        if "auc" in eval_results:
            return eval_results["auc"]
        aucs = [v for k, v in eval_results.items() if k.endswith("auc")]
        if aucs:
            return float(np.mean(aucs))
        return -eval_results["loss"]

    def run(
        self,
        train_data: Callable[[], Iterable[Dict[str, np.ndarray]]],
        eval_data: Callable[[], Iterable[Dict[str, np.ndarray]]],
        state: Optional[TrainState] = None,
        restore: bool = False,
    ) -> Tuple[TrainState, Dict[str, Any]]:
        """train_and_eval with early stopping + export-on-best
        (reference run loop, 2.FM/ModelManager.py:244-284)."""
        cfg = self.config.train
        if state is None:
            first = next(iter(train_data()))
            state = self.init_state(first)
        if restore and self.ckpt is not None and self.ckpt.latest_step() is not None:
            state = self.restore(state)
        writer = SummaryWriter(cfg.tensorboard_dir) if cfg.tensorboard_dir else NullSummaryWriter()
        stopper = EarlyStopper(
            num_trials=cfg.early_stop.num_trials,
            criterion=cfg.early_stop.criterion,
            mode=cfg.early_stop.mode,
        )
        history = []
        best_eval: Dict[str, float] = {}
        # mid-epoch eval (TrainConfig.eval_every_steps > 0): logs eval scalars
        # and keeps the best checkpoint at step granularity; early stopping
        # still decides on epoch-end evals
        best_mid = [-np.inf]

        def eval_hook(s: TrainState) -> None:
            res = self.evaluate(s, eval_data())
            step = int(s.step)
            for k, v in res.items():
                writer.scalar(f"eval/{k}", v, step)
            metric = self._selection_metric(res)
            if metric > best_mid[0]:
                best_mid[0] = metric
                if self.ckpt is not None:
                    self.save(s)

        hook = eval_hook if cfg.eval_every_steps > 0 else None
        for epoch in range(cfg.epochs):
            state, train_results = self.train_epoch(
                state, train_data(), writer, epoch, eval_hook=hook
            )
            eval_results = self.evaluate(state, eval_data())
            for k, v in eval_results.items():
                writer.scalar(f"eval/{k}", v, int(state.step))
            writer.flush()
            history.append({"epoch": epoch, "train": train_results, "eval": eval_results})
            print(f"epoch {epoch} eval: " + " ".join(f"{k}={v:.4f}" for k, v in eval_results.items()))
            metric = self._selection_metric(eval_results)
            best_mid[0] = max(best_mid[0], metric)  # keep the two best-trackers in sync
            cont = stopper.is_continuable(metric)
            if stopper.is_new_best:
                best_eval = eval_results
                if self.ckpt is not None:
                    self.save(state)
            if not cont:
                break
        writer.close()
        best_epoch, metric_history = stopper.check_record()
        return state, {
            "history": history,
            "best_epoch": best_epoch,
            "best_eval": best_eval,
            "metric_history": metric_history,
        }

    # ------------------------------------------------------------- ckpt/infer
    @staticmethod
    def _state_tree(state: TrainState) -> Dict[str, Any]:
        tree = {
            "step": state.step,
            "params": state.params,
            "opt_state": state.opt_state,
            "model_state": state.model_state,
        }
        if state.tables is not None:
            tree["tables"] = state.tables
            tree["table_opt"] = state.table_opt
        return tree

    def save(self, state: TrainState) -> None:
        self.ckpt.save(int(state.step), self._state_tree(state))
        store = getattr(self, "host_store", None)
        if store is not None:
            # host-offloaded moments live outside the jit state tree; persist
            # a step-stamped sidecar next to the Orbax checkpoints. Each
            # sidecar is 2·V·D fp32 (~2x the fp32 table it serves), so prune
            # sidecars whose step Orbax has already garbage-collected — the
            # giant-table use case host_adam targets cannot afford them to
            # accumulate unboundedly.
            store.save(
                os.path.join(self.ckpt.directory, f"host_moments_{int(state.step)}.npz")
            )
            kept = set(self.ckpt.all_steps())
            import glob as _glob
            import re as _re

            for path in _glob.glob(
                os.path.join(self.ckpt.directory, "host_moments_*.npz")
            ):
                m = _re.match(r"host_moments_(\d+)\.npz$", os.path.basename(path))
                if m and int(m.group(1)) not in kept:
                    try:
                        os.remove(path)
                    except OSError:
                        pass

    def restore(self, state_like: TrainState, step: Optional[int] = None) -> TrainState:
        restored = self.ckpt.restore(self._state_tree(state_like), step)
        store = getattr(self, "host_store", None)
        if store is not None:
            sidecar = os.path.join(
                self.ckpt.directory, f"host_moments_{int(restored['step'])}.npz"
            )
            if os.path.exists(sidecar):
                store.load(sidecar)
            else:
                # resuming at a large step with zeroed moments transiently
                # inflates the effective Adam LR (~1/(1-beta1) on the first
                # steps) — never do it silently
                import warnings

                warnings.warn(
                    f"host_adam sidecar missing for step {int(restored['step'])} "
                    f"({sidecar}); resuming with ZEROED moments — expect a "
                    "transient effective-LR overshoot on the first resumed steps",
                    stacklevel=2,
                )
        return TrainState(
            step=restored["step"],
            params=restored["params"],
            opt_state=restored["opt_state"],
            model_state=restored["model_state"],
            rng=state_like.rng,
            tables=restored.get("tables"),
            table_opt=restored.get("table_opt"),
        )

    def load_from_export(self, state: TrainState, directory: str) -> TrainState:
        """Incremental retraining: seed params/model_state from a frozen
        export while keeping a fresh optimizer (reference 'incremental' mode,
        2.FM/ModelManager.py:247-249)."""
        exported_state = dict(state.model_state)
        if state.tables is not None:
            exported_state["tables"] = state.tables
        loaded = ckpt_lib.load_exported_params(
            directory, {"params": state.params, "model_state": exported_state}
        )
        model_state = dict(loaded["model_state"])
        tables = model_state.pop("tables", state.tables)
        return state.replace(
            params=loaded["params"], model_state=model_state, tables=tables
        )

    def init_subtree_from_export(
        self, state: TrainState, directory: str, dst_prefix: str
    ) -> TrainState:
        """Graft a pretrained export's ENTIRE params tree under the param
        subtree ``dst_prefix`` (slash-separated path), e.g. seed SIM/CAN's
        DIEN trunk (submodule 'trunk') from a standalone DIEN training export
        — the reference loads pretrained DIEN weights into its ESU/CAN layers
        (7.SIM/CustomLayers.py:404-406). Combine with
        TrainConfig.freeze_prefixes=('trunk',) to keep it frozen.

        The submodule must be architecturally identical to the exported
        model so the param trees match leaf-for-leaf."""
        keys = dst_prefix.split("/")
        sub = state.params
        for k in keys:
            sub = sub[k]
        loaded = ckpt_lib.load_exported_raw(directory)["params"]
        # preserve device placement/sharding of the existing leaves
        loaded = jax.tree.map(
            lambda old, new: jax.device_put(jnp.asarray(new), old.sharding),
            sub,
            loaded,
        )
        new_params = jax.tree_util.tree_map(lambda x: x, state.params)  # copy refs
        node = new_params
        for k in keys[:-1]:
            node = node[k]
        node[keys[-1]] = loaded
        return state.replace(params=new_params)

    def export(self, state: TrainState, directory: str) -> None:
        exported_state = dict(state.model_state)
        if state.tables is not None:
            exported_state["tables"] = state.tables
        ckpt_lib.export_params(
            directory,
            {"params": state.params, "model_state": exported_state},
            meta={
                "model": self.config.model.name,
                "model_params": {
                    k: v for k, v in self.config.model.params.items() if k != "dtype"
                },
                "embedding": self.config.model.embedding.to_dict(),
            },
        )

    def infer(self, state: TrainState, batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        from tpurec.embedding.modules import set_sparse_mode

        set_sparse_mode(self.config.train.sparse_embedding)
        # inference phase at TRACE time: without this, a preceding train-step
        # trace leaves the process-global phase flag at True and the fused
        # inference forwards (senet/cin/capsule, 2.3-6.6x) silently dispatch
        # the training-phase reference math into the jit cache (ADVICE r4)
        _set_phase(False)
        variables = self._variables(state)
        batch = self.device_batch(batch)
        outputs = jax.jit(partial(self.model.apply, train=False))(variables, batch)
        set_sparse_mode(False)
        return jax.device_get(outputs)
