"""Per-file key Bloom filters for merge candidate pruning.

Why: min/max key bounds prune poorly for a CDC merge — urls hash-spread
uniformly, so within a bucket every file's [min, max] range overlaps every
batch and the copy-on-write merge rewrites the whole bucket each
micro-batch. A per-file Bloom filter over the key column turns steady-state
pruning into "only files that (probably) contain an affected key", which at
100 TB is the difference between rewriting a handful of files and rewriting
1/n_buckets of the table every commit. Same role as Iceberg's puffin blobs
/ parquet column bloom filters (the reference's incremental sync relies on
the warehouse's own pruning; here the lake format provides it).

Filters live in a sidecar file next to each data file
(`<file>.parquet.bloom`) rather than inline in the manifest: the manifest
is re-read and rewritten on every commit, so it must stay O(#files) small;
sidecars are immutable like their data files and share their lifecycle
(vacuum removes both together).

Determinism contract: a key hashes identically at build time (pyarrow
column values) and probe time (Spark-collected winner keys) — both yield
python `str`/`int`, normalized to utf-8 bytes before hashing. Double
hashing (h1 + i*h2 mod m) from one md5 digest gives the k probe positions.
"""

from __future__ import annotations

import hashlib
import math
import struct

import numpy as np

_MAGIC = b"KBF1"

# Above this many distinct keys the filter is skipped: at ~9.6 bits/key
# (1% fpp) the sidecar would pass ~250 KB and driver-side probing stops
# being free. Large files keep min/max-only pruning — an optimization
# ceiling, never a correctness issue.
MAX_KEYS = 200_000


def key_hashes(value) -> tuple[int, int]:
    """(h1, h2) double-hash pair for one key value."""
    if isinstance(value, bytes):
        b = value
    elif isinstance(value, str):
        b = value.encode("utf-8")
    else:
        b = repr(value).encode("utf-8")
    h1, h2 = struct.unpack("<QQ", hashlib.md5(b).digest())
    return h1, h2 or 1  # h2=0 would collapse all k probes onto one bit


def hash_pairs(values) -> "np.ndarray":
    """(n, 2) uint64 array of hash pairs for a list of key values."""
    if len(values) == 0:
        return np.empty((0, 2), dtype=np.uint64)
    return np.array([key_hashes(v) for v in values], dtype=np.uint64)


class KeyBloom:
    __slots__ = ("m", "k", "bits")

    def __init__(self, m: int, k: int, bits: "np.ndarray"):
        self.m = m  # number of bits (multiple of 8)
        self.k = k  # probes per key
        self.bits = bits  # uint8 array, m // 8 bytes

    # ---- construction ----

    @staticmethod
    def build(values, fpp: float = 0.01) -> "KeyBloom | None":
        """Filter over the distinct non-null values, or None when empty or
        past MAX_KEYS (caller falls back to range-only pruning)."""
        distinct = {v for v in values if v is not None}
        n = len(distinct)
        if n == 0 or n > MAX_KEYS:
            return None
        m = max(64, math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
        m = (m + 7) // 8 * 8
        k = max(1, round(m / n * math.log(2)))
        bf = KeyBloom(m, k, np.zeros(m // 8, dtype=np.uint8))
        idx = bf._positions(hash_pairs(list(distinct))).ravel()
        np.bitwise_or.at(bf.bits, idx >> 3, np.uint8(1) << (idx & 7).astype(np.uint8))
        return bf

    def _positions(self, pairs: "np.ndarray") -> "np.ndarray":
        """(n, k) bit positions for (n, 2) hash pairs."""
        i = np.arange(self.k, dtype=np.uint64)
        return (pairs[:, :1] + i * pairs[:, 1:]) % np.uint64(self.m)

    # ---- probing ----

    def might_contain_any(self, pairs: "np.ndarray") -> bool:
        """True iff ANY of the hashed keys may be present (vectorized: the
        pruning question is per-file 'does any affected key live here')."""
        if len(pairs) == 0:
            return False
        pos = self._positions(pairs)
        hit = (self.bits[pos >> np.uint64(3)] >> (pos & np.uint64(7)).astype(np.uint8)) & 1
        return bool(hit.all(axis=1).any())

    def might_contain(self, value) -> bool:
        return self.might_contain_any(hash_pairs([value]))

    # ---- sidecar serialization ----

    def to_bytes(self) -> bytes:
        return _MAGIC + struct.pack("<II", self.m, self.k) + self.bits.tobytes()

    @staticmethod
    def from_bytes(raw: bytes) -> "KeyBloom":
        if raw[:4] != _MAGIC:
            raise ValueError("not a KeyBloom sidecar")
        m, k = struct.unpack("<II", raw[4:12])
        return KeyBloom(m, k, np.frombuffer(raw[12:12 + m // 8], dtype=np.uint8))
