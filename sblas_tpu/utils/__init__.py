from . import errors, hostmath, timing, verify  # noqa: F401
