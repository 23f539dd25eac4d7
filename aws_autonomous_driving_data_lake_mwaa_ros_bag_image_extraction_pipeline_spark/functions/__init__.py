from . import hashing, text, vectors  # noqa: F401
