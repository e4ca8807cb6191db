from .analytics import REGISTRY, QuerySpec, register  # noqa: F401
