from . import modmath, ntt  # noqa: F401
