from .exact import cents, dsum, davg  # noqa: F401
