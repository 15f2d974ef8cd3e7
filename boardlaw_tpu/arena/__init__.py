from . import common, neural, live  # noqa: F401
from .common import evaluate  # noqa: F401
