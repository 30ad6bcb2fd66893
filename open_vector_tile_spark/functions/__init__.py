from . import geo, sampling, text  # noqa: F401
