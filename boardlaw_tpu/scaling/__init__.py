from . import data, paper, inflation, transitive  # noqa: F401
