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
pandas UDF per (series, segment) group; the XOR/leading/trailing analysis is
numpy-vectorized, only the final bit-packing is a Python loop.
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
        out = 0
        for _ in range(nbits):
            byte = self._data[self._pos >> 3]
            bit = (byte >> (7 - (self._pos & 7))) & 1
            out = (out << 1) | bit
            self._pos += 1
        return out


_DOD_CODES = (  # (prefix, prefix_len, payload_bits) — two's-complement payloads
    (0b10, 2, 7),
    (0b110, 3, 9),
    (0b1110, 4, 12),
)


def encode_segment(ts: npt.NDArray[np.int64], values: npt.NDArray[np.float64]) -> bytes:
    """Encode parallel (int64 timestamp, float64 value) arrays to one blob."""
    ts = np.asarray(ts, dtype=np.int64)
    values = np.asarray(values, dtype=np.float64)
    n = ts.shape[0]
    w = _BitWriter()
    w.write(n, 32)
    if n == 0:
        return w.bytes()

    bits = values.view(np.uint64)
    w.write(int(ts[0]) & ((1 << 64) - 1), 64)
    w.write(int(bits[0]), 64)
    if n == 1:
        return w.bytes()

    deltas = np.diff(ts)
    w.write(int(deltas[0]) & ((1 << 64) - 1), 64)
    dods = np.diff(deltas)

    # vectorized value-stream analysis
    xors = bits[1:] ^ bits[:-1]
    # float64 conversion can round a near-2^64 xor up to 2^64 (floor log2 = 64
    # → lead -1), so clamp into [0, 63]; an under-estimated lead only widens
    # the stored meaningful-bit window, never corrupts it.
    lead = (63 - np.floor(np.log2(xors.astype(np.float64) + (xors == 0)))).astype(int)
    lead = np.where(xors == 0, 64, np.clip(lead, 0, 63))
    trail = np.zeros_like(lead)
    nz = xors != 0
    if nz.any():
        x = xors[nz]
        trail_nz = np.zeros(x.shape[0], dtype=int)
        tmp = x.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            mask = (tmp & ((np.uint64(1) << np.uint64(shift)) - np.uint64(1))) == 0
            low_zero = mask & (tmp != 0)
            trail_nz += np.where(low_zero, shift, 0)
            tmp = np.where(low_zero, tmp >> np.uint64(shift), tmp)
        trail[nz] = trail_nz

    # interleaved timestamp/value stream packing
    prev_lead, prev_mean = 65, 0  # value-window state: (leading, meaningful)
    prev_trail = 0
    vi = 0  # index into xors
    for i in range(1, n):
        if i >= 2:
            dod = int(dods[i - 2])
            if dod == 0:
                w.write(0, 1)
            else:
                for prefix, plen, payload in _DOD_CODES:
                    if -(1 << (payload - 1)) <= dod < (1 << (payload - 1)):
                        w.write(prefix, plen)
                        w.write(dod & ((1 << payload) - 1), payload)
                        break
                else:
                    w.write(0b1111, 4)
                    w.write(dod & ((1 << 64) - 1), 64)
        # value stream
        x = int(xors[vi])
        if x == 0:
            w.write(0, 1)
        else:
            le, tr = int(lead[vi]), int(trail[vi])
            mean = 64 - le - tr
            if prev_lead <= 64 and le >= prev_lead and tr >= prev_trail:
                w.write(0b10, 2)
                w.write(x >> prev_trail, prev_mean)
            else:
                w.write(0b11, 2)
                w.write(le, 6)
                w.write(mean, 7)
                w.write(x >> tr, mean)
                prev_lead, prev_trail, prev_mean = le, tr, mean
        vi += 1
    return w.bytes()


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
