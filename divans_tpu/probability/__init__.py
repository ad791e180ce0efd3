from .speed import Speed  # noqa: F401
from . import cdf16  # noqa: F401
