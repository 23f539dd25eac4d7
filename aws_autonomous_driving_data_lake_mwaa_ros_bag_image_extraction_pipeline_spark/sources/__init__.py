from . import fixtures, frames_source  # noqa: F401
