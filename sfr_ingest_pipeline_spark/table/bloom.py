"""Per-data-file Bloom filters on ``conv_id`` — point-probe file skipping.

The manifest's (conv_id_min, conv_id_max) range envelope prunes well when
batches are conversation-localized, but a batch touching two far-apart
conv_ids spans the whole keyspace and prunes NOTHING — exactly the
point-correction / scattered-late-event workload a CDC table serves at
depth, where a bucket holds hundreds of MoR delta files each covering a
few conversations. A Bloom filter per data file answers "can this file
contain any of the batch's keys?" regardless of where the keys sit in the
sort order (no false negatives, so skipping on a miss is exact; a false
positive only costs reading one extra file).

Layout (the Iceberg-Puffin analog, sized for a driver-side metadata
plane): blooms for one commit's files are CONCATENATED into a single
sidecar blob under ``metadata/blooms/``, and each ``DataFileInfo`` carries
``(bloom_path, bloom_off, bloom_len, bloom_k)`` — manifests stay O(files)
small, the sidecar is read lazily with one seek per probed file, and
snapshot GC drops a blob when no retained manifest references it. Filters
are sized from the file's DISTINCT conv count at ``fpp`` (~9.6 bits/key at
1%) and skipped for files so key-dense a probe would almost surely hit
(cap ``max_bytes``) — a base file covering most of its bucket cannot be
pruned by any probe, so carrying a filter for it is pure overhead.

Hashing: one C-backed MD5 per key split into two 64-bit words,
double-hashed (Kirsch-Mitzenmacher: bit_i = h1 + i*h2 mod m) so each key
costs ONE digest regardless of k. The filter is internal metadata — it
never needs to match Spark's xxhash64, and the pure-Python XXH64 twin
(functions/xxh.py) measured ~20x slower per key, which at ~160k distinct
convs per delta wave turned harvest into an ingest-path tax.
"""

from __future__ import annotations

import hashlib
import math
import os
import uuid

BLOOM_DIR = "metadata/blooms"
_LN2 = math.log(2.0)


def bloom_params(n_distinct: int, fpp: float, max_bytes: int) -> tuple[int, int] | None:
    """(m_bits, k) for ``n_distinct`` keys at ``fpp``, or None when the
    optimal filter would exceed ``max_bytes`` (key-dense file: not worth
    carrying — see module docstring)."""
    if n_distinct <= 0:
        return 64, 1
    m = math.ceil(-n_distinct * math.log(fpp) / (_LN2 * _LN2))
    m = ((m + 63) // 64) * 64
    if m > max_bytes * 8:
        return None
    k = max(1, round((m / n_distinct) * _LN2))
    return m, min(k, 16)


def _hashes(key: str) -> tuple[int, int]:
    d = hashlib.md5(key.encode("utf-8")).digest()
    return (
        int.from_bytes(d[:8], "little"),
        int.from_bytes(d[8:], "little") | 1,  # odd h2: full cycle mod 2^j
    )


def build_bloom(keys, fpp: float, max_bytes: int) -> tuple[bytes, int] | None:
    """Filter bytes + k over ``keys`` (an iterable of distinct strings),
    or None when the file is too key-dense to be worth filtering."""
    keys = list(keys)
    params = bloom_params(len(keys), fpp, max_bytes)
    if params is None:
        return None
    m, k = params
    bits = bytearray(m // 8)
    for key in keys:
        h1, h2 = _hashes(key)
        for i in range(k):
            pos = (h1 + i * h2) % m
            bits[pos >> 3] |= 1 << (pos & 7)
    return bytes(bits), k


def might_contain_hashed(buf: bytes, k: int, h1: int, h2: int) -> bool:
    m = len(buf) * 8
    for i in range(k):
        pos = (h1 + i * h2) % m
        if not (buf[pos >> 3] >> (pos & 7)) & 1:
            return False
    return True


def might_contain(buf: bytes, k: int, key: str) -> bool:
    h1, h2 = _hashes(key)
    return might_contain_hashed(buf, k, h1, h2)


class BloomSidecarWriter:
    """Accumulates one commit's per-file filters into a single blob;
    ``add`` returns the (path, off, len, k) tuple the file's manifest
    entry records. Writes nothing when no filter was added."""

    def __init__(self, table_root: str):
        self.table_root = table_root
        self.rel_path = f"{BLOOM_DIR}/bl-{uuid.uuid4().hex[:12]}.bin"
        self._chunks: list[bytes] = []
        self._off = 0

    def add(self, keys, fpp: float, max_bytes: int):
        built = build_bloom(keys, fpp, max_bytes)
        if built is None:
            return None
        buf, k = built
        entry = (self.rel_path, self._off, len(buf), k)
        self._chunks.append(buf)
        self._off += len(buf)
        return entry

    def flush(self) -> None:
        if not self._chunks:
            return
        full = os.path.join(self.table_root, self.rel_path)
        os.makedirs(os.path.dirname(full), exist_ok=True)
        tmp = f"{full}.tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "wb") as f:
            f.write(b"".join(self._chunks))
        os.replace(tmp, full)


class BloomReader:
    """Lazy sidecar access with per-blob caching: probing N files of the
    same commit costs ONE file read (the blob is contiguous), probing a
    file with no filter costs nothing."""

    def __init__(self, table_root: str):
        self.table_root = table_root
        self._blobs: dict[str, bytes] = {}

    def filter_of(self, file_info) -> tuple[bytes, int] | None:
        rel = getattr(file_info, "bloom_path", None)
        if not rel:
            return None
        blob = self._blobs.get(rel)
        if blob is None:
            try:
                with open(os.path.join(self.table_root, rel), "rb") as f:
                    blob = f.read()
            except FileNotFoundError:
                # a half-GC'd or foreign-written sidecar degrades to
                # "no filter" (range pruning still applies) — never an error
                blob = b""
            self._blobs[rel] = blob
        off, ln = file_info.bloom_off, file_info.bloom_len
        if len(blob) < off + ln:
            return None
        return blob[off:off + ln], file_info.bloom_k

    def may_contain_any(self, file_info, hashed_keys) -> bool:
        """True unless the file's filter excludes EVERY key. ``hashed_keys``
        is a list of (h1, h2) from :func:`_hashes` — hash once, probe many
        files."""
        flt = self.filter_of(file_info)
        if flt is None:
            return True
        buf, k = flt
        return any(might_contain_hashed(buf, k, h1, h2) for h1, h2 in hashed_keys)


def hash_keys(keys) -> list[tuple[int, int]]:
    return [_hashes(k) for k in keys]
