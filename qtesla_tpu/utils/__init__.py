from . import native, timing  # noqa: F401
