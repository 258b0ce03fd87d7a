"""Gorilla-style segment compression: delta-of-delta timestamps + XOR floats.

From the published Gorilla design (Pelkonen et al., VLDB 2015 — Facebook's
in-memory TSDB), implemented from scratch:

  timestamps: first ts raw 64b, first delta raw 64b, then delta-of-delta with
  variable-length codes ('0' | '10'+7b | '110'+9b | '1110'+12b | '1111'+64b);
  values: first float raw 64b, then XOR against the previous value
  ('0' when identical, '10' + meaningful bits when they fit the previous
  leading/trailing window, else '11' + 6b leading + 7b length + bits).

The codec is lossless for (int64 ts, float64 value) — decode(encode(s)) == s
bit-for-bit, which is the engine's per-segment invariant. Encoding runs in a
pandas UDF per (series, segment) group and is FULLY vectorized: token values
and widths are computed as arrays and the bitstream is assembled in one
packbits pass (no per-point Python). To make that possible the encoder always
emits the explicit-window '11' control for changed values instead of the
stateful '10' inherit path — a size-for-speed trade (≤13 extra bits per
changed value) that the decoder, which supports both controls per the
published format, is unaffected by.
"""

from __future__ import annotations

import numpy as np
import numpy.typing as npt


class _BitWriter:
    def __init__(self) -> None:
        self._buf = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._nbits += nbits
        while self._nbits >= 8:
            self._nbits -= 8
            self._buf.append((self._acc >> self._nbits) & 0xFF)
        self._acc &= (1 << self._nbits) - 1

    def bytes(self) -> bytes:
        if self._nbits:
            return bytes(self._buf) + bytes([(self._acc << (8 - self._nbits)) & 0xFF])
        return bytes(self._buf)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self._data = data
        self._pos = 0  # bit position

    def read(self, nbits: int) -> int:
        """O(1) per call: pull the covering byte span, shift, mask."""
        if nbits == 0:
            return 0
        pos = self._pos
        start = pos >> 3
        end = (pos + nbits + 7) >> 3
        chunk = int.from_bytes(self._data[start:end], "big")
        self._pos = pos + nbits
        return (chunk >> ((end << 3) - pos - nbits)) & ((1 << nbits) - 1)


_DOD_CODES = (  # (prefix, prefix_len, payload_bits) — two's-complement payloads
    (0b10, 2, 7),
    (0b110, 3, 9),
    (0b1110, 4, 12),
)


def _pack_tokens(vals: npt.NDArray[np.uint64], nbits: npt.NDArray[np.int64]) -> bytes:
    """Assemble a bitstream from right-aligned (value, width ≤ 64) tokens in
    one vectorized pass. Each token is rendered into a 9-byte window aligned
    to its start byte (7 bits of in-byte offset + 64 payload bits ≤ 72), the
    windows are summed into the output buffer with np.bincount — token bit
    ranges are disjoint, so byte-wise SUM equals byte-wise OR exactly.
    O(9 bytes per token), no per-bit expansion, no Python loop."""
    keep = nbits > 0
    vals = vals[keep].astype(np.uint64)
    nb = nbits[keep].astype(np.int64)
    if vals.size == 0:
        return b""
    ends = np.cumsum(nb)
    off = ends - nb
    total_bytes = (int(ends[-1]) + 7) // 8
    byte_start = off >> 3
    bit_in = (off & 7).astype(np.int64)
    right_end = bit_in + nb  # ≤ 71
    over = np.maximum(right_end - 64, 0).astype(np.uint64)  # bits spilling into byte 8
    first_len = np.minimum(right_end, 64).astype(np.uint64)
    first64 = (vals >> over) << (np.uint64(64) - first_len)
    spill = (vals & ((np.uint64(1) << over) - np.uint64(1))) << (np.uint64(8) - over)
    win_bytes = first64.byteswap().view(np.uint8).reshape(-1, 8).astype(np.float64)
    idx = byte_start[:, None] + np.arange(8, dtype=np.int64)
    counts = np.bincount(
        np.concatenate([idx.ravel(), byte_start + 8]),
        weights=np.concatenate([win_bytes.ravel(), spill.astype(np.float64)]),
        minlength=total_bytes + 9,
    )
    return counts[:total_bytes].astype(np.uint8).tobytes()


def encode_segment(ts: npt.NDArray[np.int64], values: npt.NDArray[np.float64]) -> bytes:
    """Encode parallel (int64 timestamp, float64 value) arrays to one blob.
    No Python loop: per-point token values/widths are numpy arrays flattened
    row-major into stream order, packed by _pack_tokens."""
    ts = np.asarray(ts, dtype=np.int64)
    values = np.asarray(values, dtype=np.float64)
    n = ts.shape[0]
    u64 = np.uint64
    mask64 = u64(0xFFFFFFFFFFFFFFFF)

    header_vals = [u64(n)]
    header_bits = [32]
    if n >= 1:
        vbits = values.view(np.uint64)
        header_vals += [ts[0].astype(np.uint64), vbits[0]]
        header_bits += [64, 64]
    if n >= 2:
        deltas = np.diff(ts)
        header_vals.append(deltas[0].astype(np.uint64))
        header_bits.append(64)
    if n <= 1:
        return _pack_tokens(np.array(header_vals, dtype=np.uint64), np.array(header_bits, dtype=np.int64))

    dods = np.diff(deltas)  # for i in [2, n): dods[i-2]
    m = n - 1  # value records, i in [1, n)

    # -- timestamp stream: per record two slots (control[+payload], payload) --
    dod_a_val = np.zeros(m, dtype=np.uint64)
    dod_a_bits = np.zeros(m, dtype=np.int64)
    dod_b_val = np.zeros(m, dtype=np.uint64)
    dod_b_bits = np.zeros(m, dtype=np.int64)
    if m >= 2:
        d = dods.astype(np.int64)
        av, ab = dod_a_val[1:], dod_a_bits[1:]
        bv, bb = dod_b_val[1:], dod_b_bits[1:]
        zero = d == 0
        ab[...] = 1  # '0' control; value already 0
        for prefix, plen, payload in _DOD_CODES:
            fits = (~zero) & (ab == 1) & (d >= -(1 << (payload - 1))) & (d < (1 << (payload - 1)))
            enc = (u64(prefix) << u64(payload)) | (d.astype(np.uint64) & u64((1 << payload) - 1))
            av[fits] = enc[fits]
            ab[fits] = plen + payload
        big = (~zero) & (ab == 1)  # nothing fit → '1111' + raw 64
        av[big] = u64(0b1111)
        ab[big] = 4
        bv[big] = d.astype(np.uint64)[big] & mask64
        bb[big] = 64

    # -- value stream: vectorized XOR / leading / trailing analysis ----------
    xors = vbits[1:] ^ vbits[:-1]
    # float64 conversion can round a near-2^64 xor up to 2^64 (floor log2 = 64
    # → lead -1), so clamp into [0, 63]; an under-estimated lead only widens
    # the stored meaningful-bit window, never corrupts it.
    lead = (63 - np.floor(np.log2(xors.astype(np.float64) + (xors == 0)))).astype(np.int64)
    lead = np.where(xors == 0, 64, np.clip(lead, 0, 63))
    trail = np.zeros_like(lead)
    nz = xors != 0
    if nz.any():
        x = xors[nz]
        trail_nz = np.zeros(x.shape[0], dtype=np.int64)
        tmp = x.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            low_zero = ((tmp & ((u64(1) << u64(shift)) - u64(1))) == 0) & (tmp != 0)
            trail_nz += np.where(low_zero, shift, 0)
            tmp = np.where(low_zero, tmp >> u64(shift), tmp)
        trail[nz] = trail_nz

    mean = 64 - lead - trail
    val_a_val = np.zeros(m, dtype=np.uint64)
    val_a_bits = np.ones(m, dtype=np.int64)  # default: '0' single bit (x == 0)
    val_b_val = np.zeros(m, dtype=np.uint64)
    val_b_bits = np.zeros(m, dtype=np.int64)
    # control '11' + 6b lead + 7b meaningful for every changed value
    val_a_val[nz] = (u64(0b11) << u64(13)) | (lead[nz].astype(np.uint64) << u64(7)) | mean[nz].astype(np.uint64)
    val_a_bits[nz] = 15
    val_b_val[nz] = xors[nz] >> trail[nz].astype(np.uint64)
    val_b_bits[nz] = mean[nz]

    # interleave: per record (dodA, dodB, valA, valB) — row-major flatten
    stream_vals = np.stack([dod_a_val, dod_b_val, val_a_val, val_b_val], axis=1).ravel()
    stream_bits = np.stack([dod_a_bits, dod_b_bits, val_a_bits, val_b_bits], axis=1).ravel()
    all_vals = np.concatenate([np.array(header_vals, dtype=np.uint64), stream_vals])
    all_bits = np.concatenate([np.array(header_bits, dtype=np.int64), stream_bits])
    return _pack_tokens(all_vals, all_bits)


def decode_segment(blob: bytes) -> tuple[npt.NDArray[np.int64], npt.NDArray[np.float64]]:
    r = _BitReader(blob)
    n = r.read(32)
    ts = np.empty(n, dtype=np.int64)
    vals = np.empty(n, dtype=np.uint64)
    if n == 0:
        return ts, vals.view(np.float64)

    def _signed(v: int, bits: int) -> int:
        return v - (1 << bits) if v >= (1 << (bits - 1)) else v

    ts[0] = _signed(r.read(64), 64)
    vals[0] = r.read(64)
    if n == 1:
        return ts, vals.view(np.float64)

    delta = _signed(r.read(64), 64)
    prev_lead, prev_trail, prev_mean = 65, 0, 0
    prev_val = int(vals[0])
    for i in range(1, n):
        if i >= 2:
            if r.read(1) == 0:
                dod = 0
            else:
                if r.read(1) == 0:
                    dod = _signed(r.read(7), 7)
                elif r.read(1) == 0:
                    dod = _signed(r.read(9), 9)
                elif r.read(1) == 0:
                    dod = _signed(r.read(12), 12)
                else:
                    dod = _signed(r.read(64), 64)
            delta += dod
        ts[i] = ts[i - 1] + delta

        if r.read(1) == 0:
            x = 0
        else:
            if r.read(1) == 0:
                x = r.read(prev_mean) << prev_trail
            else:
                le = r.read(6)
                mean = r.read(7)
                tr = 64 - le - mean
                x = r.read(mean) << tr
                prev_lead, prev_trail, prev_mean = le, tr, mean
        prev_val ^= x
        vals[i] = prev_val
    return ts, vals.view(np.float64)
