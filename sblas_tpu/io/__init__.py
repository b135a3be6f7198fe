from . import mmio  # noqa: F401
from .plancache import load_plan, save_plan  # noqa: F401
