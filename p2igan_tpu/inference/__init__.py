from .driver import SlidingWindowReconstructor, run_inference  # noqa: F401
