from . import geo, sampling, sketch, text  # noqa: F401
