from .rng import GoRand, JitterRand, Lrand48, hash_64

__all__ = ["GoRand", "JitterRand", "Lrand48", "hash_64"]
