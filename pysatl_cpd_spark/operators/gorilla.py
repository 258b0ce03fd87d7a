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

Layout (v2, marker byte 0x47): the published token encodings, but the two
token streams are stored back-to-back instead of interleaved, plus a sparse
anchor index —
[marker 8][n 32][ts0 64][v0 64][delta0 64][ts_stream_bits 32]
[one 32-bit stream offset per 512 records, per stream]
[all delta-of-delta tokens][all value tokens].
Compressed size is the published format + ~0.07 bits/point of index. The
de-interleaving plus anchors make DECODE vectorized and O(points): every
record's width is a pure function of ≤15 bits at its start (no decoder
state — the encoder never emits the stateful '10' control), so the decoder
chases all 512-record blocks IN PARALLEL (a Python loop of ≤512 steps total,
independent of segment size, advancing one numpy cursor per block), then
gathers payloads with one unaligned read per token; timestamps close with
two cumsums, values with one bitwise-xor scan. Legacy interleaved (v1)
blobs — any blob not starting with 0x47 — decode through the original
sequential reader, which supports the full format including '10' inherit
controls.
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


_V2_MARKER = 0x47  # 'G'. v1 blobs begin with the high byte of a 32-bit point
# count, so any count < 0x47000000 (1.19e9 points/segment) cannot collide.


def encode_segment(ts: npt.NDArray[np.int64], values: npt.NDArray[np.float64]) -> bytes:
    """Encode parallel (int64 timestamp, float64 value) arrays to one blob
    (v2 layout). No Python loop: per-point token values/widths are numpy
    arrays, packed by _pack_tokens."""
    ts = np.asarray(ts, dtype=np.int64)
    values = np.asarray(values, dtype=np.float64)
    n = ts.shape[0]
    u64 = np.uint64
    mask64 = u64(0xFFFFFFFFFFFFFFFF)

    header_vals = [u64(_V2_MARKER), u64(n)]
    header_bits = [8, 32]
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

    # v2: the two streams back-to-back (ts tokens, then value tokens), with
    # the ts stream's bit length + per-512-record anchor offsets in the
    # header so each stream decodes independently and in parallel blocks
    ts_vals = np.stack([dod_a_val, dod_b_val], axis=1).ravel()
    ts_bits = np.stack([dod_a_bits, dod_b_bits], axis=1).ravel()
    val_vals = np.stack([val_a_val, val_b_val], axis=1).ravel()
    val_bits = np.stack([val_a_bits, val_b_bits], axis=1).ravel()
    ts_anchors = _anchors((dod_a_bits + dod_b_bits)[1:])  # records i in [2, n)
    val_anchors = _anchors(val_a_bits + val_b_bits)  # records i in [1, n)
    header_vals.append(u64(int(ts_bits.sum())))
    header_bits.append(32)
    all_vals = np.concatenate(
        [np.array(header_vals, dtype=np.uint64), ts_anchors, val_anchors, ts_vals, val_vals]
    )
    all_bits = np.concatenate(
        [
            np.array(header_bits, dtype=np.int64),
            np.full(ts_anchors.shape[0] + val_anchors.shape[0], 32, dtype=np.int64),
            ts_bits,
            val_bits,
        ]
    )
    return _pack_tokens(all_vals, all_bits)


def _signed(v: int, bits: int) -> int:
    return v - (1 << bits) if v >= (1 << (bits - 1)) else v


def decode_segment(blob: bytes) -> tuple[npt.NDArray[np.int64], npt.NDArray[np.float64]]:
    return decode_batch([blob])[0]


def decode_batch(
    blobs: list[bytes],
) -> list[tuple[npt.NDArray[np.int64], npt.NDArray[np.float64]]]:
    """Decode MANY blobs in one vectorized pass — the shape of the real read
    path (a rollup/verify task decodes every segment in its partition). All
    v2 blobs are concatenated into one buffer and every 512-record block of
    every blob advances in lockstep, so the Python-step count is ≤512 for the
    whole batch regardless of batch size or segment lengths; per-blob closes
    (delta/ts cumsums, xor scan) are segmented vector ops. v1 blobs decode
    through the sequential reader. Peak temp memory ≈ 16 bytes per point."""
    out: list = [None] * len(blobs)
    batch_idx: list[int] = []
    for i, b in enumerate(blobs):
        if len(b) == 0 or b[0] != _V2_MARKER:
            out[i] = _decode_v1(b)
        else:
            n = int.from_bytes(b[1:5], "big")
            if n == 0:
                out[i] = (np.empty(0, np.int64), np.empty(0, np.float64))
            elif n == 1:
                ts0 = int.from_bytes(b[5:13], "big", signed=False)
                v0 = int.from_bytes(b[13:21], "big", signed=False)
                out[i] = (
                    np.array([_signed(ts0, 64)], dtype=np.int64),
                    np.array([v0], dtype=np.uint64).view(np.float64),
                )
            else:
                batch_idx.append(i)
    if batch_idx:
        for i, res in zip(batch_idx, _decode_v2_core([blobs[i] for i in batch_idx])):
            out[i] = res
    return out


def _seg_cumsum(x: npt.NDArray, counts: npt.NDArray[np.int64]) -> npt.NDArray:
    """Per-segment cumulative sum of a concatenated array."""
    cs = np.cumsum(x)
    first = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    prefix = np.concatenate([[x.dtype.type(0)], cs])[first]
    return cs - np.repeat(prefix, counts)


_ANCHOR = 512  # records per decode block (32-bit offset stored per block)
_TS_WIDTH_LUT = np.array([1] * 8 + [9] * 4 + [12] * 2 + [16, 68], dtype=np.int64)


def _anchors(record_widths: npt.NDArray[np.int64]) -> npt.NDArray[np.uint64]:
    """Stream-relative bit offsets of records _ANCHOR, 2*_ANCHOR, ..."""
    cnt = record_widths.shape[0]
    n_anchor = max(0, -(-cnt // _ANCHOR) - 1)
    if n_anchor == 0:
        return np.empty(0, dtype=np.uint64)
    cw = np.cumsum(record_widths)
    return cw[np.arange(1, n_anchor + 1) * _ANCHOR - 1].astype(np.uint64)


def _win24(buf_pad: npt.NDArray[np.uint8], pos: npt.NDArray[np.int64]) -> npt.NDArray[np.int64]:
    """The 24-bit big-endian window starting at bit ``pos`` (bit 23 = first
    bit of the token), vectorized; ≥17 valid bits — enough for any control
    prefix + lead + mean."""
    b3 = buf_pad[(pos >> 3)[:, None] + np.arange(3)].astype(np.int64)
    win = (b3[:, 0] << 16) | (b3[:, 1] << 8) | b3[:, 2]
    return (win << (pos & 7)) & 0xFFFFFF


def _chase(
    buf_pad: npt.NDArray[np.uint8],
    block_starts: npt.NDArray[np.int64],
    iters: int,
    width_fn,
    limit: int,
) -> npt.NDArray[np.int64]:
    """(iters, n_blocks) record-start positions: every block advances in
    lockstep (one vectorized width gather per step), so the Python loop is
    ≤ _ANCHOR steps for an entire batch of blobs. Cursors that run off their
    block's records wander over clamped padding; callers mask those out."""
    b = block_starts.shape[0]
    out = np.empty((iters, b), dtype=np.int64)
    pos = block_starts.copy()
    for i in range(iters):
        out[i] = pos
        pos = np.minimum(pos + width_fn(_win24(buf_pad, pos)), limit)
    return out


def _ts_width(win: npt.NDArray[np.int64]) -> npt.NDArray[np.int64]:
    return _TS_WIDTH_LUT[(win >> 20) & 0xF]


def _val_width(win: npt.NDArray[np.int64]) -> npt.NDArray[np.int64]:
    return np.where((win >> 23) == 0, 1, 15 + ((win >> 9) & 0x7F))


def _read_payloads(
    buf_pad: npt.NDArray[np.uint8], q: npt.NDArray[np.int64], nbits
) -> npt.NDArray[np.uint64]:
    """Vectorized unaligned big-endian bit-span reads (nbits ≤ 64): gather the
    9 covering bytes per position, fold to u64, shift into alignment."""
    q = np.asarray(q, dtype=np.int64)
    if np.isscalar(nbits) or getattr(nbits, "shape", ()) == ():
        nb = np.full(q.shape[0], int(nbits), dtype=np.uint64)
    else:
        nb = np.asarray(nbits).astype(np.uint64)
    m9 = buf_pad[(q >> 3)[:, None] + np.arange(9)]
    u = np.zeros(q.shape[0], dtype=np.uint64)
    for j in range(8):
        u = (u << np.uint64(8)) | m9[:, j].astype(np.uint64)
    off = (q & 7).astype(np.uint64)
    tail = m9[:, 8].astype(np.uint64)
    u = np.where(off > 0, (u << off) | (tail >> (np.uint64(8) - off)), u)
    return np.where(nb > 0, u >> (np.uint64(64) - nb), np.uint64(0))


def _decode_v2_core(
    blobs: list[bytes],
) -> list[tuple[npt.NDArray[np.int64], npt.NDArray[np.float64]]]:
    """Batched v2 decode for blobs with n >= 2 points."""
    k = len(blobs)
    bufs = [np.frombuffer(b, dtype=np.uint8) for b in blobs]
    lens = np.array([x.shape[0] for x in bufs], dtype=np.int64)
    byte_off = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
    big = np.concatenate(bufs + [np.zeros(64, dtype=np.uint8)])
    bit_off = byte_off * 8
    limit = (big.shape[0] - 16) * 8

    n = _read_payloads(big, bit_off + 8, 32).astype(np.int64)
    ts0 = _read_payloads(big, bit_off + 40, 64).view(np.int64)
    v0 = _read_payloads(big, bit_off + 104, 64)
    delta0 = _read_payloads(big, bit_off + 168, 64).view(np.int64)
    tsbits = _read_payloads(big, bit_off + 232, 32).astype(np.int64)

    m = n - 1
    mc_ts = m - 1
    n_ats = np.maximum(0, -(-mc_ts // _ANCHOR) - 1)
    n_avs = np.maximum(0, -(-m // _ANCHOR) - 1)
    hdr = bit_off + 264

    def flat_local(counts: npt.NDArray[np.int64]) -> npt.NDArray[np.int64]:
        total = int(counts.sum())
        firsts = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
        return np.arange(total, dtype=np.int64) - np.repeat(firsts, counts)

    def read_anchors(base: npt.NDArray[np.int64], counts) -> npt.NDArray[np.int64]:
        if int(counts.sum()) == 0:
            return np.empty(0, dtype=np.int64)
        posn = np.repeat(base, counts) + 32 * flat_local(counts)
        return _read_payloads(big, posn, 32).astype(np.int64)

    a_ts = read_anchors(hdr, n_ats)
    a_val = read_anchors(hdr + 32 * n_ats, n_avs)
    ts_s0 = hdr + 32 * (n_ats + n_avs)
    val_s0 = ts_s0 + tsbits

    def stream_records(s0, anchors_flat, n_anchor, counts, width_fn):
        """Record start positions, blob-major, counts[b] records per blob."""
        n_blocks = n_anchor + 1
        local_block = flat_local(n_blocks)
        starts_b = np.repeat(s0, n_blocks)
        starts_b[local_block > 0] += anchors_flat
        iters = int(min(_ANCHOR, counts.max())) if counts.size else 0
        if iters == 0:
            return np.empty(0, dtype=np.int64)
        mat = _chase(big, starts_b, iters, width_fn, limit)
        keep = (local_block[:, None] * _ANCHOR + np.arange(iters)[None, :]) < np.repeat(
            counts, n_blocks
        )[:, None]
        return mat.T[keep]

    # -- timestamp streams: per blob, mc_ts dod records -----------------------
    rec_ts = stream_records(ts_s0, a_ts, n_ats, mc_ts, _ts_width)
    wtok = _ts_width(_win24(big, rec_ts))
    pb = np.select([wtok == 1, wtok == 9, wtok == 12, wtok == 16], [0, 7, 9, 12], 64)
    pre = np.select([wtok == 1, wtok == 9, wtok == 12, wtok == 16], [1, 2, 3, 4], 4)
    dod = _read_payloads(big, rec_ts + pre, pb).view(np.int64).copy()
    small = (pb > 0) & (pb < 64)
    wrap = np.int64(1) << pb[small]
    dod[small] -= (dod[small] >= (wrap >> 1)) * wrap

    total_m = int(m.sum())
    first_m = np.concatenate([[0], np.cumsum(m)[:-1]]).astype(np.int64)
    deltas = np.empty(total_m, dtype=np.int64)
    rest = np.ones(total_m, dtype=bool)
    rest[first_m] = False
    deltas[first_m] = delta0
    deltas[rest] = np.repeat(delta0, mc_ts) + _seg_cumsum(dod, mc_ts)

    total_n = int(n.sum())
    first_n = np.concatenate([[0], np.cumsum(n)[:-1]]).astype(np.int64)
    splits = np.cumsum(n)[:-1]
    ts_all = np.empty(total_n, dtype=np.int64)
    nrest = np.ones(total_n, dtype=bool)
    nrest[first_n] = False
    ts_all[first_n] = ts0
    ts_all[nrest] = np.repeat(ts0, m) + _seg_cumsum(deltas, m)

    # -- value streams: per blob, m xor records --------------------------------
    rec_v = stream_records(val_s0, a_val, n_avs, m, _val_width)
    win = _win24(big, rec_v)
    changed = (win >> 23) == 1
    winc = win[changed]
    mean = (winc >> 9) & 0x7F
    trail = (64 - ((winc >> 16) & 0x3F) - mean).astype(np.uint64)
    xors = np.zeros(total_m, dtype=np.uint64)
    xors[changed] = _read_payloads(big, rec_v[changed] + 15, mean) << trail

    arr = np.empty(total_n, dtype=np.uint64)
    arr[first_n] = v0
    arr[nrest] = xors
    acc = np.bitwise_xor.accumulate(arr)
    prefix = np.concatenate([[np.uint64(0)], acc])[first_n]
    vals_all = (acc ^ np.repeat(prefix, n)).view(np.float64)
    return list(zip(np.split(ts_all, splits), np.split(vals_all, splits)))


def _decode_v1(blob: bytes) -> tuple[npt.NDArray[np.int64], npt.NDArray[np.float64]]:
    """Sequential reader for legacy interleaved blobs; supports the full
    published format including the stateful '10' window-inherit control."""
    r = _BitReader(blob)
    n = r.read(32)
    ts = np.empty(n, dtype=np.int64)
    vals = np.empty(n, dtype=np.uint64)
    if n == 0:
        return ts, vals.view(np.float64)

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
