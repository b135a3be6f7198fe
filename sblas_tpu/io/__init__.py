from . import mmio  # noqa: F401
