from .vocab import Vocab  # noqa: F401
