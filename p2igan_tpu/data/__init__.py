from . import zarrlite  # noqa: F401
