from .analytics import REGISTRY, QuerySpec, register  # noqa: F401
from . import analytics_llm  # noqa: F401,E402  (registers queries on import)
from . import analytics_olap  # noqa: F401,E402
