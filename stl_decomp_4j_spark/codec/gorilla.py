"""Gorilla compression for time-series chunks (engine-only; the reference has
no storage layer — algorithm follows the Gorilla paper: Pelkonen et al.,
VLDB'15), laid out as SPLIT STREAMS so both encode and decode are fully
NumPy-vectorized (packbits/unpackbits + boolean-mask gathers), with no
per-point Python loop.  The classic interleaved Gorilla bitstream forces a
sequential decoder; splitting control and payload keeps the same information
content (same XOR / delta-of-delta compression) while every stage maps to a
vectorized array pass — the property that matters when the 1h tier encode is
O(total points) at 100 TB.

float64 values:
    [u32 n][first value, 8B raw BE]
    [flags   : 1 bit per value 1..n-1, 1 = XOR with previous is nonzero]
    [headers : per nonzero XOR, 6b leading-zero count + 6b (meaningful-1)]
    [payload : per nonzero XOR, its meaningful bits]

int64 timestamps (e.g. epoch millis):
    [u32 n][t0, 8B][delta0, 8B]
    [flags   : 1 bit per stamp 2..n-1, 1 = delta-of-delta nonzero]
    [codes   : 2 bits per nonzero dod -> bucket 7/9/12/64 bits]
    [payload : per nonzero dod, bucket-width biased value]

decode(encode(x)) is bitwise-exact (NaNs included, via raw bit patterns).
Chunks are stored as BinaryType cells per (url, tier, time-range) in the
rollup sink.
"""
from __future__ import annotations

import struct

import numpy as np

_U64 = np.uint64

# precomputed shift vector for fixed-width 2-bit code packing
_SH2 = np.arange(1, -1, -1, dtype=np.uint16)[None, :]
_COLS64 = np.arange(64, dtype=np.uint8)[None, :]

_P1 = _U64(0x5555555555555555)
_P2 = _U64(0x3333333333333333)
_P4 = _U64(0x0F0F0F0F0F0F0F0F)
_PM = _U64(0x0101010101010101)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized SWAR popcount (numpy 1.26 has no bitwise_count)."""
    x = x - ((x >> _U64(1)) & _P1)
    x = (x & _P2) + ((x >> _U64(2)) & _P2)
    x = (x + (x >> _U64(4))) & _P4
    return (x * _PM) >> _U64(56)


def _bit_length64(x: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for nonzero uint64 via the float64 exponent
    field, with a one-step correction where the 53-bit rounding bumped the
    value up to exactly the next power of two."""
    f = x.astype(np.float64)
    bl = ((f.view(np.int64) >> 52) & 0x7FF) - 1022
    np.minimum(bl, 64, out=bl)
    pow_ = np.left_shift(_U64(1), (bl - 1).astype(_U64))
    return bl - (x < pow_)


def _trailing_zeros64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-trailing-zeros for nonzero uint64: the isolated
    lowest set bit is an exact power of two, so its float64 exponent is
    exact — no correction needed."""
    lowbit = x & (~x + _U64(1))
    f = lowbit.astype(np.float64)
    return ((f.view(np.int64) >> 52) & 0x7FF) - 1023


def _pack12(fields: np.ndarray) -> bytes:
    """Arithmetically pack 12-bit fields two-at-a-time into 3 bytes."""
    m = len(fields)
    hdr = fields.astype(np.uint32)
    if m & 1:
        hdr = np.append(hdr, np.uint32(0))
    h0, h1 = hdr[0::2], hdr[1::2]
    b = np.empty((len(h0), 3), dtype=np.uint8)
    b[:, 0] = h0 >> 4
    b[:, 1] = ((h0 & 15) << 4) | (h1 >> 8)
    b[:, 2] = h1 & 255
    return b.tobytes()[: (12 * m + 7) // 8]


def _pack_fields(values: np.ndarray, widths: np.ndarray) -> bytes:
    """MSB-first-concatenate per-row bit fields of per-row width (<= 64).

    Row i contributes the low ``widths[i]`` bits of ``values[i]``, most
    significant first.  Pure NumPy: a (m, maxw) bit matrix masked to each
    row's width, gathered row-major, then packbits."""
    m = len(values)
    if m == 0:
        return b""
    w = widths.astype(np.int64)
    maxw = int(w.max())
    shifts = w[:, None] - 1 - np.arange(maxw, dtype=np.int64)[None, :]
    valid = shifts >= 0
    bits = (
        (values[:, None].astype(_U64) >> np.clip(shifts, 0, 63).astype(_U64)) & _U64(1)
    ).astype(np.uint8)
    return np.packbits(bits[valid]).tobytes()


def _unpack_fields(bitstream: np.ndarray, widths: np.ndarray) -> np.ndarray:
    """Inverse of _pack_fields: ``bitstream`` is the unpacked 0/1 array;
    returns one uint64 per row.  The fields are scattered into a (m, 64)
    right-aligned bit matrix (single wraparound-free uint8 compare for the
    mask) and packed back to integers in one flat packbits pass."""
    m = len(widths)
    out_bits = np.zeros((m, 64), dtype=np.uint8)
    valid = _COLS64 >= (np.uint8(64) - widths.astype(np.uint8))[:, None]
    total = int(widths.sum())
    out_bits[valid] = bitstream[:total]
    return np.packbits(out_bits.reshape(-1)).view(">u8").astype(_U64)


def _unpack12(buf: bytes, m: int) -> np.ndarray:
    """Arithmetic inverse of _pack12: m 12-bit fields from the byte stream."""
    m2 = m + (m & 1)
    need = m2 // 2 * 3
    b = np.frombuffer(buf, dtype=np.uint8)
    if len(b) < need:
        b = np.concatenate([b, np.zeros(need - len(b), dtype=np.uint8)])
    b = b[:need].reshape(-1, 3).astype(np.uint16)
    out = np.empty(m2, dtype=np.int64)
    out[0::2] = (b[:, 0].astype(np.int64) << 4) | (b[:, 1] >> 4)
    out[1::2] = ((b[:, 1].astype(np.int64) & 15) << 8) | b[:, 2]
    return out[:m]


def encode_values(values: np.ndarray) -> bytes:
    """XOR-encode a float64 array; returns a self-describing chunk."""
    bits = np.ascontiguousarray(values, dtype=np.float64).view(_U64)
    n = len(bits)
    if n == 0:
        return struct.pack(">I", 0)
    head = struct.pack(">I", n) + bits[:1].astype(">u8").tobytes()
    if n == 1:
        return head
    xor = bits[1:] ^ bits[:-1]
    nz = xor != 0
    flags = np.packbits(nz).tobytes()
    nzx = xor[nz]
    m = len(nzx)
    if m == 0:
        return head + flags
    # leading/trailing zero counts via float-exponent tricks (cheap vector
    # ops); the meaningful-bit payload gathers straight off the MSB-first
    # bit matrix with a single wraparound uint8 column compare
    ntrail = _trailing_zeros64(nzx)
    nlead = 64 - _bit_length64(nzx)
    mlen = 64 - nlead - ntrail
    headers = _pack12((nlead << 6) | (mlen - 1))
    bit2d = np.unpackbits(nzx.astype(">u8").view(np.uint8).reshape(m, 8), axis=1)
    # (cols - lead) wraps below lead to >= 192 > mlen, so one compare suffices
    meaningful = (_COLS64 - nlead.astype(np.uint8)[:, None]) < mlen.astype(np.uint8)[:, None]
    payload = np.packbits(bit2d[meaningful]).tobytes()
    return head + flags + headers + payload


def decode_values(chunk: bytes) -> np.ndarray:
    (n,) = struct.unpack(">I", chunk[:4])
    if n == 0:
        return np.empty(0, dtype=np.float64)
    first = np.frombuffer(chunk[4:12], dtype=">u8").astype(_U64)
    if n == 1:
        return first.view(np.float64).copy()
    flags_len = (n - 1 + 7) // 8
    flag_bits = np.unpackbits(np.frombuffer(chunk[12 : 12 + flags_len], dtype=np.uint8))[: n - 1]
    nz = flag_bits.astype(bool)
    m = int(flag_bits.sum())
    xor = np.zeros(n - 1, dtype=_U64)
    if m:
        off = 12 + flags_len
        hdr_len = (12 * m + 7) // 8
        hdr = _unpack12(chunk[off : off + hdr_len], m)
        nlead = hdr >> 6
        mlen = (hdr & 63) + 1
        pay_bits = np.unpackbits(np.frombuffer(chunk[off + hdr_len :], dtype=np.uint8))
        mean = _unpack_fields(pay_bits, mlen)
        xor[nz] = mean << (np.int64(64) - nlead - mlen).astype(_U64)
    out = np.empty(n, dtype=_U64)
    out[0] = first[0]
    out[1:] = xor
    return np.bitwise_xor.accumulate(out).view(np.float64)


# delta-of-delta buckets: (value bits, bias lo, hi); 2-bit code = index
_DOD_WIDTHS = np.array([7, 9, 12, 64], dtype=np.int64)
_DOD_LO = np.array([-63, -255, -2047], dtype=np.int64)
_DOD_HI = np.array([64, 256, 2048], dtype=np.int64)


def encode_timestamps(ts: np.ndarray) -> bytes:
    """Delta-of-delta encode an int64 array (e.g. epoch millis)."""
    t = np.ascontiguousarray(ts, dtype=np.int64)
    n = len(t)
    if n == 0:
        return struct.pack(">I", 0)
    head = struct.pack(">I", n) + t[:1].astype(">i8").tobytes()
    if n == 1:
        return head
    delta = t[1:] - t[:-1]
    head += delta[:1].astype(">i8").tobytes()
    if n == 2:
        return head
    dod = delta[1:] - delta[:-1]
    nz = dod != 0
    flags = np.packbits(nz).tobytes()
    nzd = dod[nz]
    m = len(nzd)
    if m == 0:
        return head + flags
    code = np.select(
        [
            (nzd >= _DOD_LO[0]) & (nzd <= _DOD_HI[0]),
            (nzd >= _DOD_LO[1]) & (nzd <= _DOD_HI[1]),
            (nzd >= _DOD_LO[2]) & (nzd <= _DOD_HI[2]),
        ],
        [0, 1, 2],
        default=3,
    ).astype(np.int64)
    codes = np.packbits(
        ((code.astype(np.uint16)[:, None] >> _SH2) & np.uint16(1)).astype(np.uint8)
    ).tobytes()
    widths = _DOD_WIDTHS[code]
    lo = np.where(code < 3, _DOD_LO[np.minimum(code, 2)], 0)
    biased = np.where(code < 3, nzd - lo, nzd).astype(np.int64).view(_U64)
    payload = _pack_fields(biased, widths)
    return head + flags + codes + payload


def decode_timestamps(chunk: bytes) -> np.ndarray:
    (n,) = struct.unpack(">I", chunk[:4])
    if n == 0:
        return np.empty(0, dtype=np.int64)
    t0 = np.frombuffer(chunk[4:12], dtype=">i8").astype(np.int64)[0]
    if n == 1:
        return np.array([t0], dtype=np.int64)
    delta0 = np.frombuffer(chunk[12:20], dtype=">i8").astype(np.int64)[0]
    dod = np.zeros(n - 2, dtype=np.int64)
    if n > 2:
        flags_len = (n - 2 + 7) // 8
        flag_bits = np.unpackbits(np.frombuffer(chunk[20 : 20 + flags_len], dtype=np.uint8))[: n - 2]
        nz = flag_bits.astype(bool)
        m = int(flag_bits.sum())
        if m:
            off = 20 + flags_len
            code_len = (2 * m + 7) // 8
            code_bits = np.unpackbits(np.frombuffer(chunk[off : off + code_len], dtype=np.uint8))[: 2 * m]
            code = (code_bits[0::2].astype(np.int64) << 1) | code_bits[1::2]
            widths = _DOD_WIDTHS[code]
            pay_bits = np.unpackbits(np.frombuffer(chunk[off + code_len :], dtype=np.uint8))
            biased = _unpack_fields(pay_bits, widths)
            lo = np.where(code < 3, _DOD_LO[np.minimum(code, 2)], 0)
            vals = np.where(code < 3, biased.astype(np.int64) + lo, biased.view(np.int64))
            dod[nz] = vals
    deltas = np.empty(n - 1, dtype=np.int64)
    deltas[0] = delta0
    deltas[1:] = dod
    np.cumsum(deltas, out=deltas)  # dod -> per-step deltas
    np.cumsum(deltas, out=deltas)  # deltas -> offsets from t0
    out = np.empty(n, dtype=np.int64)
    out[0] = t0
    out[1:] = t0 + deltas
    return out


def encode_series(ts: np.ndarray, values: np.ndarray) -> bytes:
    """One chunk holding both streams: [u32 ts_len][ts blob][values blob]."""
    tsb = encode_timestamps(ts)
    vb = encode_values(values)
    return struct.pack(">I", len(tsb)) + tsb + vb


def decode_series(chunk: bytes):
    (tlen,) = struct.unpack(">I", chunk[:4])
    ts = decode_timestamps(chunk[4 : 4 + tlen])
    values = decode_values(chunk[4 + tlen :])
    return ts, values
