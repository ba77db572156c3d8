from .checkpoint import save_state, load_state
from .metrics import MetricsLogger, StageTimer

__all__ = ["save_state", "load_state", "MetricsLogger", "StageTimer"]
