"""Gorilla compression for time-series chunks (engine-only; the reference has
no storage layer — format follows the Gorilla paper: Pelkonen et al., VLDB'15).

- float64 values: XOR with previous; '0' bit for identical, '10' reuse the
  previous leading/meaningful-bit window, '11' + 6-bit leading-zero count +
  6-bit (meaningful-length - 1) + meaningful bits.
- int64 epoch-ms timestamps: header t0 + first delta (64-bit), then
  delta-of-delta bucketed into '0' (D==0), '10'+7b, '110'+9b, '1110'+12b,
  '1111'+64b.

decode(encode(x)) is bitwise-exact (NaNs included, via raw bit patterns).
Chunks are stored as BinaryType cells per (url, tier, time-range) in the
rollup sink.
"""
from __future__ import annotations

import struct

import numpy as np

_MASK64 = (1 << 64) - 1


class _BitWriter:
    __slots__ = ("words", "cur", "fill")

    def __init__(self) -> None:
        self.words: list[int] = []
        self.cur = 0
        self.fill = 0

    def write(self, value: int, nbits: int) -> None:
        value &= (1 << nbits) - 1
        space = 64 - self.fill
        if nbits < space:
            self.cur = (self.cur << nbits) | value
            self.fill += nbits
        elif nbits == space:
            self.words.append((self.cur << nbits) | value)
            self.cur = 0
            self.fill = 0
        else:
            rem = nbits - space
            self.words.append((self.cur << space) | (value >> rem))
            self.cur = value & ((1 << rem) - 1)
            self.fill = rem

    def getvalue(self) -> bytes:
        words = list(self.words)
        if self.fill:
            words.append(self.cur << (64 - self.fill))
        return b"".join(struct.pack(">Q", w) for w in words)


class _BitReader:
    __slots__ = ("words", "pos", "cur", "avail")

    def __init__(self, buf: bytes) -> None:
        pad = (-len(buf)) % 8
        self.words = np.frombuffer(buf + b"\x00" * pad, dtype=">u8")
        self.pos = 0
        self.cur = 0
        self.avail = 0

    def read(self, nbits: int) -> int:
        while self.avail < nbits:
            self.cur = ((self.cur << 64) | int(self.words[self.pos])) & ((1 << (self.avail + 64)) - 1)
            self.pos += 1
            self.avail += 64
        self.avail -= nbits
        out = self.cur >> self.avail
        self.cur &= (1 << self.avail) - 1
        return out


def encode_values(values: np.ndarray) -> bytes:
    """XOR-encode a float64 array; returns a self-describing chunk."""
    bits = np.asarray(values, dtype=np.float64).view(np.uint64)
    n = len(bits)
    if n == 0:
        return struct.pack(">I", 0)
    w = _BitWriter()
    prev = int(bits[0])
    w.write(prev, 64)
    lead, mlen = -1, -1  # previous meaningful-bit window; -1 = none
    for i in range(1, n):
        cur = int(bits[i])
        xor = prev ^ cur
        prev = cur
        if xor == 0:
            w.write(0, 1)
            continue
        nlead = 64 - xor.bit_length()
        ntrail = (xor & -xor).bit_length() - 1
        nmean = 64 - nlead - ntrail
        if lead >= 0 and nlead >= lead and (64 - nlead - nmean) >= (64 - lead - mlen):
            # fits inside the previous window -> '10' + meaningful bits
            w.write(0b10, 2)
            w.write(xor >> (64 - lead - mlen), mlen)
        else:
            lead, mlen = nlead, nmean
            w.write(0b11, 2)
            w.write(nlead, 6)
            w.write(nmean - 1, 6)
            w.write(xor >> ntrail, nmean)
    return struct.pack(">I", n) + w.getvalue()


def decode_values(chunk: bytes) -> np.ndarray:
    (n,) = struct.unpack(">I", chunk[:4])
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.float64)
    r = _BitReader(chunk[4:])
    cur = r.read(64)
    out[0] = cur
    lead, mlen = -1, -1
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = cur
            continue
        if r.read(1) == 0:
            xor = r.read(mlen) << (64 - lead - mlen)
        else:
            lead = r.read(6)
            mlen = r.read(6) + 1
            xor = r.read(mlen) << (64 - lead - mlen)
        cur ^= xor
        out[i] = cur
    return out.view(np.float64)


_DOD_BUCKETS = (
    (0b10, 2, 7, -63, 64),
    (0b110, 3, 9, -255, 256),
    (0b1110, 4, 12, -2047, 2048),
)


def encode_timestamps(ts: np.ndarray) -> bytes:
    """Delta-of-delta encode an int64 array (e.g. epoch millis)."""
    t = np.asarray(ts, dtype=np.int64)
    n = len(t)
    if n == 0:
        return struct.pack(">I", 0)
    w = _BitWriter()
    w.write(int(t[0]) & _MASK64, 64)
    if n == 1:
        return struct.pack(">I", 1) + w.getvalue()
    prev_delta = int(t[1]) - int(t[0])
    w.write(prev_delta & _MASK64, 64)
    for i in range(2, n):
        delta = int(t[i]) - int(t[i - 1])
        dod = delta - prev_delta
        prev_delta = delta
        if dod == 0:
            w.write(0, 1)
            continue
        for marker, mbits, vbits, lo, hi in _DOD_BUCKETS:
            if lo <= dod <= hi:
                w.write(marker, mbits)
                w.write(dod - lo, vbits)
                break
        else:
            w.write(0b1111, 4)
            w.write(dod & _MASK64, 64)
    return struct.pack(">I", n) + w.getvalue()


def decode_timestamps(chunk: bytes) -> np.ndarray:
    (n,) = struct.unpack(">I", chunk[:4])
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    r = _BitReader(chunk[4:])

    def _signed64(v: int) -> int:
        return v - (1 << 64) if v >= (1 << 63) else v

    out[0] = _signed64(r.read(64))
    if n == 1:
        return out
    delta = _signed64(r.read(64))
    out[1] = out[0] + delta
    for i in range(2, n):
        if r.read(1) == 1:
            for marker, mbits, vbits, lo, hi in _DOD_BUCKETS:
                if r.read(1) == 0:
                    delta += r.read(vbits) + lo
                    break
            else:
                delta += _signed64(r.read(64))
        out[i] = out[i - 1] + delta
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
