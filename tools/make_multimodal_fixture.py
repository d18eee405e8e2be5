#!/usr/bin/env python3
"""Generate the multimodal oracle fixture: expected (media_id, kind, width,
height, n_frames, f0) rows computed by an INDEPENDENT pure-Python
re-implementation of the deterministic fake decoder — own xxHash64 (shared
with the simhash fixture tool, validated against Spark's), own sha256
digesting, own splitmix64 expansion.  The real decode is stubbed (no image
libs in this container); what this oracle verifies end-to-end is the Spark
plumbing: attach_media's kind/payload derivation, Arrow batch shape, and the
batched feature pipeline.

Fixture: tests/fixtures/oracle/multimodal.parquet
    (media_id, kind, width, height, n_frames, f0, sum_chars)

Usage: python tools/make_multimodal_fixture.py [sf_dir ...]
"""
from __future__ import annotations

import hashlib
import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
FIXDIR = REPO / "tests" / "fixtures" / "oracle"
sys.path.insert(0, str(REPO))

from tools.make_simhash_fixture import xxh64  # noqa: E402

_KINDS = ["image", "audio", "video"]
_M = (1 << 64) - 1


def _mix64(x: int) -> int:
    """splitmix64 finalizer (public constant-set spec), scalar."""
    x = (x + 0x9E3779B97F4A7C15) & _M
    x ^= x >> 30
    x = (x * 0xBF58476D1CE4E5B9) & _M
    x ^= x >> 27
    x = (x * 0x94D049BB133111EB) & _M
    x ^= x >> 31
    return x


def expected_row(doc_id: int, text: str, max_side: int = 64) -> dict:
    h = xxh64(int(doc_id).to_bytes(8, "little", signed=True))
    signed = h - (1 << 64) if h >= (1 << 63) else h
    kind = _KINDS[abs(signed) % 3]
    payload = text[:64].encode("utf-8")
    digest = hashlib.sha256(payload).digest()
    width = 16 + digest[8] % 240
    height = 16 + digest[9] % 240
    n_frames = 1 if kind == "image" else 1 + digest[10] % 32
    seed = int.from_bytes(digest[:8], "big")
    f0 = (_mix64(seed) >> 11) * 2.0**-52 - 1.0
    # independent recomputation of the resize geometry + fake-pixel payload
    # (engine: aspect-preserving fit + digest bytes cycled to ow*oh; see
    # operators/multimodal.py resize_images — np.rint is round-half-even)
    scale = min(1.0, max_side / float(max(width, height)))
    ow = max(1, int(np.rint(width * scale)))
    oh = max(1, int(np.rint(height * scale)))
    n_px = ow * oh
    resized = (digest * (n_px // len(digest) + 1))[:n_px]
    return {
        "media_id": doc_id, "kind": kind, "width": width, "height": height,
        "n_frames": n_frames, "f0": f0,
        "out_width": ow, "out_height": oh,
        "resized_md5": hashlib.md5(resized).hexdigest(),
    }


def main(sf_dirs: list[str]) -> None:
    parts = []
    for sf in sf_dirs:
        docs = duckdb.sql(
            f"SELECT doc_id, text, n_chars FROM read_parquet('{sf}/documents.parquet')"
        ).df()
        sum_chars = int(docs["n_chars"].sum())
        rows = [expected_row(int(r.doc_id), r.text) for r in docs.itertuples()]
        pdf = pd.DataFrame(rows)
        pdf["sum_chars"] = np.int64(sum_chars)
        parts.append(pdf)
    FIXDIR.mkdir(parents=True, exist_ok=True)
    out = pd.concat(parts, ignore_index=True)
    out.to_parquet(FIXDIR / "multimodal.parquet", index=False)
    print(f"multimodal: {len(out)} rows -> {FIXDIR / 'multimodal.parquet'}")


if __name__ == "__main__":
    main(sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
