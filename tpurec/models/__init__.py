from tpurec.models.registry import build_model, register_model, MODEL_REGISTRY  # noqa: F401
