from tpurec.core.mesh import MeshContext, make_mesh  # noqa: F401
from tpurec.core.metrics import AUC, Mean, MetricBundle  # noqa: F401
from tpurec.core.early_stop import EarlyStopper  # noqa: F401
