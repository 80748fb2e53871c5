from .laea import laea_forward, laea_inverse  # noqa: F401
