#!/usr/bin/env python3
"""Generate the simhash oracle fixture: per-doc 64-bit simhash fingerprints
computed by an INDEPENDENT pure-Python implementation (own xxHash64 from the
public spec, own vote aggregation in NumPy) — no Spark, no engine code.

The DuckDB oracle then reproduces the banding + popcount pair logic in SQL
over this fixture, so the whole simhash_near_pairs operator is cross-checked
end-to-end by independent code.

Fixture: tests/fixtures/oracle/simhash.parquet
    (doc_id, simhash, sum_chars)   — sum_chars = sum(n_chars) of that sf's
    documents table, the discriminator a fixed oracle SQL string uses to
    select the right sf's rows.

Word semantics mirror the engine's JVM expressions for ASCII text (the
testdata documents are pure ASCII with no edge whitespace — asserted below):
distinct words of lower(trim(text)) split on \\s+.

Usage: python tools/make_simhash_fixture.py [sf_dir ...]
"""
from __future__ import annotations

import re
import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
FIXDIR = REPO / "tests" / "fixtures" / "oracle"

_M = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, lane: int) -> int:
    return (_rotl((acc + lane * _P2) & _M, 31) * _P1) & _M


def xxh64(data: bytes, seed: int = 42) -> int:
    """xxHash64 (Collet's public spec); Spark's xxhash64 uses seed 42."""
    n = len(data)
    i = 0
    if n >= 32:
        v1, v2, v3, v4 = (seed + _P1 + _P2) & _M, (seed + _P2) & _M, seed & _M, (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little")); i += 8
            v2 = _round(v2, int.from_bytes(data[i : i + 8], "little")); i += 8
            v3 = _round(v3, int.from_bytes(data[i : i + 8], "little")); i += 8
            v4 = _round(v4, int.from_bytes(data[i : i + 8], "little")); i += 8
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h ^= _round(0, v)
            h = (h * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def simhash_doc(text: str, bits: int = 64) -> int:
    words = sorted(set(re.split(r"\s+", text.strip().lower(), flags=re.ASCII)))
    hs = np.array([xxh64(w.encode("utf-8")) for w in words], dtype=np.uint64)
    n = len(hs)
    ones = np.array(
        [int(((hs >> np.uint64(b)) & np.uint64(1)).sum()) for b in range(bits)], dtype=np.int64
    )
    sim = 0
    for b in range(bits):
        if 2 * ones[b] > n:
            sim |= 1 << b
    return sim - (1 << 64) if sim >= (1 << 63) else sim


def main(sf_dirs: list[str]) -> None:
    parts = []
    for sf in sf_dirs:
        docs = duckdb.sql(
            f"SELECT doc_id, text, n_chars FROM read_parquet('{sf}/documents.parquet')"
        ).df()
        # the word-splitting parity between this tool (Python re) and the
        # engine (Java regex) holds for ASCII text without edge whitespace
        assert docs["text"].map(lambda t: t.isascii() and t == t.strip()).all(), sf
        sum_chars = int(docs["n_chars"].sum())
        parts.append(
            pd.DataFrame(
                {
                    "doc_id": docs["doc_id"].to_numpy(),
                    "simhash": np.array([simhash_doc(t) for t in docs["text"]], dtype=np.int64),
                    "sum_chars": np.int64(sum_chars),
                }
            )
        )
    FIXDIR.mkdir(parents=True, exist_ok=True)
    out = pd.concat(parts, ignore_index=True)
    out.to_parquet(FIXDIR / "simhash.parquet", index=False)
    print(f"simhash: {len(out)} rows -> {FIXDIR / 'simhash.parquet'}")


if __name__ == "__main__":
    main(sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
