from . import pallas_mont  # noqa: F401
