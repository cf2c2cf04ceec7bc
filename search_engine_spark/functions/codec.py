"""Delta + varbyte posting-list codec, numpy-vectorized.

Plays the role of the reference's frame-of-reference codec
(codec/for.c:6-60 compress, :211-252 decompress; FOR-delta :254-324) in the
posting-block layout (mem-index/mem-posting-calls.c:63-203 splits each block
into docID / tf / positions streams and compresses each independently).
Per the north rule we use **delta-encoded, varbyte-compressed** streams —
same contract (lossless uint array codec), different bit layout.

Varbyte convention: little-endian 7-bit groups; high bit set = continuation
(more bytes follow), high bit clear = terminal byte. Values up to 2^63.

All encode/decode paths are numpy-vectorized — these run inside Arrow
batches on executors (mapInPandas / applyInPandas), never per-row Python.
"""

from __future__ import annotations

import numpy as np

_MAX_GROUPS = 10  # 7*10 = 70 bits; covers uint64


def vb_encode(values: np.ndarray) -> bytes:
    """Varbyte-encode a uint array (vectorized, no Python loop over values)."""
    if len(values) == 0:
        return b""
    v = np.asarray(values, dtype=np.uint64)
    # size the group matrix to the actual max value (positions/tfs need 2-3
    # groups, not 10 — the temp matrix is the dominant allocation)
    vmax = int(v.max())
    ngroups_needed = max(1, (vmax.bit_length() + 6) // 7)
    shifts = (np.uint64(7) * np.arange(ngroups_needed, dtype=np.uint64))[None, :]
    groups = (v[:, None] >> shifts) & np.uint64(0x7F)
    # number of groups per value: index of highest nonzero group + 1 (min 1)
    nonzero = groups != 0
    ngroups = np.maximum(
        1, ngroups_needed - np.argmax(nonzero[:, ::-1], axis=1)
    ) * np.any(nonzero, axis=1) + (~np.any(nonzero, axis=1)).astype(np.int64)
    # continuation bit on all but the last group of each value
    keep = np.arange(ngroups_needed)[None, :] < ngroups[:, None]
    cont = np.arange(ngroups_needed)[None, :] < (ngroups - 1)[:, None]
    bytes_mat = groups.astype(np.uint8)
    bytes_mat[cont] |= 0x80
    return bytes_mat[keep].tobytes()


def vb_decode(buf: bytes | bytearray | memoryview) -> np.ndarray:
    """Decode a varbyte stream back to uint64 (vectorized)."""
    if not buf:
        return np.empty(0, dtype=np.uint64)
    b = np.frombuffer(buf, dtype=np.uint8)
    terminal = (b & 0x80) == 0
    # value id of each byte = number of terminals strictly before it
    value_id = np.zeros(len(b), dtype=np.int64)
    np.cumsum(terminal[:-1], out=value_id[1:])
    n_values = int(terminal.sum())
    # position of byte within its value (little-endian group index)
    starts = np.zeros(len(b), dtype=np.int64)
    first_of_value = np.r_[True, terminal[:-1]]
    start_idx = np.flatnonzero(first_of_value)
    starts[start_idx] = np.arange(len(start_idx))
    # group offset = byte index - index of first byte of the value
    first_byte_pos = np.zeros(n_values, dtype=np.int64)
    first_byte_pos[value_id[start_idx]] = start_idx
    group_off = np.arange(len(b)) - first_byte_pos[value_id]
    payload = (b & 0x7F).astype(np.uint64) << (np.uint64(7) * group_off.astype(np.uint64))
    out = np.zeros(n_values, dtype=np.uint64)
    np.add.at(out, value_id, payload)
    return out


def vb_lengths(values: np.ndarray) -> np.ndarray:
    """Per-value encoded byte count (vectorized); values < 2^63."""
    v = np.asarray(values, dtype=np.uint64)
    n = np.ones(len(v), dtype=np.int64)
    bound = np.uint64(128)
    while True:
        mask = v >= bound
        if not mask.any():
            return n
        n += mask
        if bound > np.uint64(1) << np.uint64(56):
            return n
        bound = bound << np.uint64(7)


def delta_encode(sorted_values: np.ndarray) -> np.ndarray:
    """First value verbatim, then successive deltas (requires sorted input).

    Same contract as the reference's FOR-delta docID stream
    (codec/for.c:254-324 applied at mem-index/mem-posting-calls.c:78-102).
    """
    v = np.asarray(sorted_values, dtype=np.uint64)
    if len(v) == 0:
        return v
    out = np.empty_like(v)
    out[0] = v[0]
    np.subtract(v[1:], v[:-1], out=out[1:])
    return out


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    return np.cumsum(np.asarray(deltas, dtype=np.uint64), dtype=np.uint64)


def encode_ids(sorted_ids: np.ndarray) -> bytes:
    """delta + varbyte for a sorted docID stream."""
    return vb_encode(delta_encode(sorted_ids))


def decode_ids(buf: bytes) -> np.ndarray:
    return delta_decode(vb_decode(buf))
