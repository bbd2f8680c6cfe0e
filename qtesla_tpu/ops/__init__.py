from . import modmul  # noqa: F401
