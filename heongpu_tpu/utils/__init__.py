from . import nt, params, rng  # noqa: F401
