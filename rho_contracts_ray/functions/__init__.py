from .sketches import BloomFilter, HyperLogLog, TDigest  # noqa: F401
from .hashing import sha256_hex_array, stable_hash64  # noqa: F401
