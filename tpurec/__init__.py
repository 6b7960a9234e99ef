"""tpurec — a TPU-native recommender-system framework (JAX/XLA/Pallas/pjit).

Re-designed from scratch with the capabilities of the reference TF2 model zoo
(PatrickHwang/Explicit-tf2-Recommendation): 45 model architectures across the
MatrixCF / FM / DCN / MMOE / DIN / MIND / SIM / DMR / ESCM2 / POSO / FiBiNet++
families, a feature pipeline, a unified sharded trainer, offline retrieval
indexing, and online serving — all built TPU-first:

- one shared offset-encoded id space feeding row-sharded embedding tables
  (reference: per-chapter ``tf.keras.layers.Embedding``; here: ``tpurec.embedding``)
- data-parallel dense towers + model-sharded embedding/expert matmuls via
  ``jax.sharding.Mesh`` + jit shardings (reference has no distribution at all)
- fused Pallas kernels for the hot interaction ops (``tpurec.ops.pallas``)
- a single trainer replacing the reference's 11 copy-evolved ModelManager.py
  files (``tpurec.train``)
"""

__version__ = "0.1.0"

from tpurec import config as config  # noqa: F401
