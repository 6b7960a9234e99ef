"""Typed configuration system.

The reference uses three ad-hoc config mechanisms — argparse in each
``__main__`` (2.FM/ModelManager.py:309-331), absl.flags in DataGenerators
(2.FM/DataGenerator.py:13-20), and stringly-typed ``eval()`` of list/dict args
(2.FM/ModelManager.py:330). This module replaces all three with plain typed
dataclasses; nothing is ever ``eval()``-ed.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Mapping, Optional, Sequence


def _coerce(cls, value):
    """Recursively build a dataclass from a mapping (for JSON/dict configs)."""
    if value is None or not dataclasses.is_dataclass(cls):
        return value
    if isinstance(value, cls):
        return value
    if not isinstance(value, Mapping):
        raise TypeError(f"cannot build {cls.__name__} from {type(value).__name__}")
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for key, val in value.items():
        if key not in fields:
            raise KeyError(f"unknown field {key!r} for {cls.__name__}")
        target = _DATACLASS_FIELD_TYPES.get((cls, key))
        if target is not None:
            val = _coerce(target, val)
        elif isinstance(val, list):
            val = tuple(val)  # JSON arrays ↔ tuple fields
        kwargs[key] = val
    return cls(**kwargs)


_DATACLASS_FIELD_TYPES: dict = {}


def _register_nested(cls, **nested):
    for name, sub in nested.items():
        _DATACLASS_FIELD_TYPES[(cls, name)] = sub


class _Base:
    def replace(self, **kw):
        return dataclasses.replace(self, **kw)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2, sort_keys=True)

    @classmethod
    def from_dict(cls, data: Mapping[str, Any]):
        return _coerce(cls, data)

    @classmethod
    def from_json(cls, text: str):
        return cls.from_dict(json.loads(text))


@dataclass(frozen=True)
class MeshConfig(_Base):
    """Device-mesh layout: ('data', 'model') axes over the available chips."""

    data: int = -1  # -1: fill with remaining devices
    model: int = 1
    axis_data: str = "data"
    axis_model: str = "model"


@dataclass(frozen=True)
class EmbeddingConfig(_Base):
    """Shared offset-encoded embedding id-space (reference: global
    LabelEncoder+offset scheme, 2.FM/DataGenerator.py:76-89)."""

    vocab_size: int = 0
    dim: int = 8
    # 'replicated' | 'row' (row-sharded over the model axis, all-to-all/psum
    # lookup) | 'column' (dim-sharded)
    sharding: str = "row"
    dtype: str = "float32"
    init_scale: float = 0.05
    # L2 only over ids used in the batch (reference: 5.DIN/ModelManager.py:175-190)
    used_id_l2: float = 0.0
    # dense-engine lookups through the free (V/k, 128) packed table view:
    # k-fold fewer source rows for the gather AND k-fold fewer destination
    # rows for the autodiff scatter (XLA's TPU row loops are latency-bound
    # per row). None = auto: ON for large tables (FM@2M 27.4 vs 42.6 ms —
    # engine_ab fm2m_dense_packedg), OFF for small ones where the lane
    # masking only adds overhead (DIN 12.0 vs 10.1). Single-model-axis only.
    dense_packed_gather: Optional[bool] = None


@dataclass(frozen=True)
class OptimizerConfig(_Base):
    name: str = "adam"
    learning_rate: float = 1e-3
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-7  # keras Adam default epsilon (reference parity)
    weight_decay: float = 0.0
    grad_clip_norm: float = 0.0  # 0 = off
    # learning-rate schedule: '' = constant; 'cosine' decays to
    # learning_rate*schedule_alpha over schedule_steps optimizer steps
    lr_schedule: str = ""
    schedule_steps: int = 0
    schedule_alpha: float = 0.0
    # full-table COUPLED L2 on embedding-table params: adds
    # ``embedding_l2 * w`` to the gradient before the optimizer (the exact
    # semantics of Keras ``embeddings_regularizer="l2"`` with coefficient c,
    # which the reference FM uses, 2.FM/CustomLayers.py:129-134 — Keras l2(c)
    # ⇔ embedding_l2 = 2c). Unlike used_id_l2 this shrinks RARE ids hardest
    # (decay applies every step, data gradients rarely), which is the right
    # prior for noisy high-cardinality features in the weak-signal regime.
    embedding_l2: float = 0.0
    # optional SEPARATE coupled L2 for order-1 (LinearEmbedding 'w') tables;
    # < 0 means "use embedding_l2 for them too". The bias table wants light
    # shrinkage (it carries per-id base rates) while the interaction table
    # wants heavy shrinkage (id vectors interact with every field) — a
    # split the reference's single Keras coefficient cannot express.
    embedding_l2_order1: float = -1.0
    # per-FEATURE overrides of embedding_l2 for second-order tables: feature
    # name -> coefficient, applied to that feature's offset row range of the
    # shared table (high-cardinality id features want far stronger
    # interaction-vector shrinkage than low-cardinality tags — the
    # per-feature regularization scale production recsys systems expose).
    embedding_l2_overrides: Mapping[str, float] = field(default_factory=dict)
    # sparse-embedding-mode table optimizer: 'adam' (dense-Adam-parity math,
    # O(2*V*D) moment memory) | 'rowwise_adagrad' (one fp32 accumulator per
    # row, O(V) optimizer memory - the production-embedding trade) |
    # 'rowwise_adam' (bf16 momentum + one fp32 second-moment scalar per row,
    # ~0.53x of one table's memory vs Adam's 2x, Adam-style adaptivity) |
    # 'fused_adam' (Pallas tile-stream engine, exact dense-Adam math) |
    # 'host_adam' (moments in host DRAM) | 'auto' (the Trainer picks dense
    # XLA vs the fused engine from vocab size and ids/step — measured v5e
    # crossovers, tpurec.train.trainer.resolve_embedding_engine; 'auto' also
    # decides TrainConfig.sparse_embedding, overriding the flag)
    embedding_optimizer: str = "adam"
    # fused_adam backward strategy. 'permute' (default): argsort the ids and
    # move grads with take(grads, order) — measured ~3.5 ms TOTAL for 213k
    # ids x 33 cols on v5e (the permute take from a batch-sized source is
    # near-free; only big-TABLE gathers hit the ~24M rows/s row-loop wall).
    # 'sort_payload' carries the grad columns as lax.sort payload operands
    # (one streaming network, no order array, used-id L2 in table space) —
    # numerically identical (tests/test_fused_embedding.py) but the
    # 34-operand variadic sort does NOT finish compiling in reasonable time
    # on the v5e toolchain (>8 min observed), so it stays opt-in.
    # 'xla_packed' (r5): NO sort/permute/plan — XLA scatter-add on the
    # UNSORTED id stream into each table's free (V/k, 128) packed view
    # (k = 128/D fewer destination rows; measured 5.07 ms vs the Pallas
    # tile-stream kernel's 9.7 + 1.7 sort + 2.4 permute at the FM bench
    # shapes — benchmarks/fm_fused_profile_results.json).
    fused_backward: str = "permute"
    # fused_adam forward gather strategy. 'concat': ONE take over the
    # column-concatenated tables (cost = one N-row XLA row loop; the concat
    # itself streams V*(sum D) bytes). 'packed': per-table takes against the
    # free (V/k, 128) packed view (k = 128/D fewer source rows per take, one
    # row loop per table + a VPU lane select). Default = the end-to-end A/B
    # winner (benchmarks/engine_ab_results.json: FM@2M packed 28.1 ms vs
    # concat 30.7; DIN packed 32.3 vs concat 33.6).
    fused_forward: str = "packed"
    # fused_adam id-sort strategy. 'feature' (tabular datasets only):
    # offset-encoded feature columns occupy disjoint ASCENDING id ranges, so
    # concatenating per-column sorts IS the global sort — one batched (F, B)
    # lax.sort replaces the (F*B,)-element global sort with a bit-identical
    # permutation (iota tie-break order is preserved within each column).
    # 'auto' picks 'feature' when the dataset has no sequence columns.
    fused_sort: str = "auto"


@dataclass(frozen=True)
class EarlyStopConfig(_Base):
    """Reference: EarlyStopper 'best'/'better' criteria (2.FM/Tools.py:56-99)."""

    num_trials: int = 3
    criterion: str = "best"  # 'best' | 'better'
    mode: str = "max"


@dataclass(frozen=True)
class TrainConfig(_Base):
    batch_size: int = 512
    epochs: int = 10
    eval_every_steps: int = 0  # 0 = eval at epoch end only
    log_every_steps: int = 100
    shuffle_buffer: int = 100_000
    seed: int = 0
    # 'bce' | 'multi_task' | 'in_batch_softmax' | 'gsu_esu' | 'model_loss'
    loss: str = "bce"
    loss_weights: Sequence[float] = (1.0,)
    # override the default metric set for the loss, e.g. ('ctr_auc','cvr_auc')
    # for model_loss multi-task models (ESCM2/FDN)
    metrics: Sequence[str] = ()
    # mixed precision for dense compute; embeddings/accumulators stay fp32
    compute_dtype: str = "bfloat16"
    # sparse embedding updates: tables leave the optimizer's params; each step
    # gathers only the batch's unique rows and applies row-sparse Adam —
    # O(U·D) instead of O(V·D) HBM traffic per step (tpurec/embedding/sparse.py)
    sparse_embedding: bool = False
    # param-path prefixes (slash-joined, e.g. 'trunk' or 'trunk/emb') whose
    # parameters receive NO updates — the pretrain→freeze composition used by
    # SIM/CAN over a pretrained DIEN trunk (reference freezes the loaded DIEN
    # with layer.trainable=False, 7.SIM/CustomLayers.py:155-157); seed the
    # frozen subtree with Trainer.init_subtree_from_export
    freeze_prefixes: Sequence[str] = ()
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    early_stop: EarlyStopConfig = field(default_factory=EarlyStopConfig)
    checkpoint_dir: str = ""
    max_to_keep: int = 3
    tensorboard_dir: str = ""
    # capture a jax.profiler trace (XProf/TensorBoard-viewable) for steps
    # [profile_start_step, profile_start_step + profile_num_steps) of the
    # first epoch — the TPU equivalent of the reference's
    # tf.summary.trace_on(profiler=True) (2.FM/ModelManager.py:258)
    profile_dir: str = ""
    profile_start_step: int = 10
    profile_num_steps: int = 5


@dataclass(frozen=True)
class DataConfig(_Base):
    path: str = ""
    train_pattern: str = "train_*.tfrecord"
    test_pattern: str = "test_*.tfrecord"
    meta_file: str = "data_info.json"
    max_seq_length: int = 0  # >0: padded behavior sequences
    padding_index: int = 0


@dataclass(frozen=True)
class ModelConfig(_Base):
    """One model instance = name + params dict (replaces the per-chapter
    make_layer_choice registries, 2.FM/ModelManager.py:61-84)."""

    name: str = "fm"
    params: Mapping[str, Any] = field(default_factory=dict)
    embedding: EmbeddingConfig = field(default_factory=EmbeddingConfig)


@dataclass(frozen=True)
class ExperimentConfig(_Base):
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    data: DataConfig = field(default_factory=DataConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)


_register_nested(TrainConfig, optimizer=OptimizerConfig, early_stop=EarlyStopConfig)
_register_nested(ModelConfig, embedding=EmbeddingConfig)
_register_nested(
    ExperimentConfig,
    model=ModelConfig,
    train=TrainConfig,
    data=DataConfig,
    mesh=MeshConfig,
)
