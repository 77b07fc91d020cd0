from . import nt  # noqa: F401
