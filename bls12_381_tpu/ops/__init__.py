from . import msm, ntt  # noqa: F401
