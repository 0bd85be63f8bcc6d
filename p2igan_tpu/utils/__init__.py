from .rng import KeyStream, seed_everything  # noqa: F401
