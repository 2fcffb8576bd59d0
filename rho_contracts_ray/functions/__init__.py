from .sketches import HyperLogLog, TDigest  # noqa: F401
from .hashing import sha256_hex_array, stable_hash64  # noqa: F401
