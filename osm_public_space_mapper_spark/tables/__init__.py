from .icelite import IceliteTable  # noqa: F401
