#!/usr/bin/env python3
"""Perceptual-hash fixture: near-duplicate PNG pairs + expected dHash.

Writes two parquet files under fixtures/dhash/:
  pngs.parquet      media_id BIGINT, png BLOB   (the inputs)
  expected.parquet  media_id BIGINT, dhash BIGINT (the oracle)

The PNGs are encoded in pure Python (zlib + struct, filter 0, color
type 2 — same encoder as gen_media_fixture.py) and the expected dHash
is computed from the RAW pixel arrays, so the engine's
javax.imageio-decode + dHash kernel is cross-checked against a
different stack end to end.

dHash spec (shared exactly with MediaOps.decodeImageDHash):
  sample a 9x8 grid by integer nearest-neighbor:
      x_i = i*w // 9  (i = 0..8),  y_j = j*h // 8  (j = 0..7)
  luma L = (r*299 + g*587 + b*114) // 1000 at each sampled pixel
  bit j*8+i (i = 0..7) set iff L(x_{i+1}, y_j) > L(x_i, y_j)
  hash = signed 64-bit with bit index b contributing 1 << b

Corpus (300 images): every k with k % 3 == 2 is a companion of k-1 —
the same pattern with its phase shifted by +1 (k % 7 == 5: by +16) —
so luma comparisons flip only near ties: companions land at Hamming
0-6 of their base while unrelated images sit near the random-hash
expectation (~32 bits apart). The q205 entry finds the companion
pairs with the banded Hamming kernel; the oracle re-derives them
quadratically from the expected hashes.
"""
import struct
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N_IMAGES = 300
OUT_DIR = "/root/repo/fixtures/dhash"


def pixels(k: int) -> np.ndarray:
    """Deterministic RGB pattern; k % 3 == 2 is a near-dup of k - 1."""
    base = k - 1 if k % 3 == 2 else k
    shift = 0
    if k % 3 == 2:
        shift = 16 if k % 7 == 5 else 1
    w, h = 24 + base % 5, 24 + base % 7
    y, x = np.mgrid[0:h, 0:w]
    a, b = 3 + base % 5, 2 + base % 7
    # the x*y cross terms keyed on base decorrelate unrelated images
    # (without them the small (a, b) parameter space made distinct
    # bases collide under dHash); the phase shift still only flips
    # near-tie comparisons, so companions stay close
    r = (x * a + y * b + x * y * (1 + base % 11) + base * 11 + shift) % 256
    g = (x * (a + 2) + y * 3 + x * y * (2 + base % 13) + base * 17
         + shift) % 256
    bl = (x * 5 + y * (b + 3) + x * y * (1 + base % 7) + base * 7
          + shift) % 256
    return np.stack([r, g, bl], axis=-1).astype(np.uint8)


def dhash(pix: np.ndarray) -> int:
    h, w = pix.shape[:2]
    r = pix[..., 0].astype(np.int64)
    g = pix[..., 1].astype(np.int64)
    b = pix[..., 2].astype(np.int64)
    luma = (r * 299 + g * 587 + b * 114) // 1000
    xs = [i * w // 9 for i in range(9)]
    ys = [j * h // 8 for j in range(8)]
    out = 0
    for j in range(8):
        for i in range(8):
            if luma[ys[j], xs[i + 1]] > luma[ys[j], xs[i]]:
                out |= 1 << (j * 8 + i)
    # to signed 64-bit
    return out - (1 << 64) if out >= (1 << 63) else out


def encode_png(pix: np.ndarray) -> bytes:
    h, w = pix.shape[:2]
    raw = b"".join(b"\x00" + pix[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data +
                struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) +
            chunk(b"IDAT", zlib.compress(raw, 9)) + chunk(b"IEND", b""))


def decode_check(png: bytes, pix: np.ndarray) -> None:
    """Re-parse the PNG and verify pixel equality (encoder self-check)."""
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    pos, idat = 8, b""
    w = h = None
    while pos < len(png):
        (n,) = struct.unpack(">I", png[pos:pos + 4])
        tag = png[pos + 4:pos + 8]
        data = png[pos + 8:pos + 8 + n]
        if tag == b"IHDR":
            w, h = struct.unpack(">II", data[:8])
        elif tag == b"IDAT":
            idat += data
        pos += 12 + n
    raw = zlib.decompress(idat)
    stride = w * 3 + 1
    arr = np.frombuffer(raw, np.uint8).reshape(h, stride)[:, 1:]
    assert np.array_equal(arr.reshape(h, w, 3), pix)


def main():
    import os
    os.makedirs(OUT_DIR, exist_ok=True)
    ids, pngs, hashes = [], [], []
    for k in range(N_IMAGES):
        pix = pixels(k)
        png = encode_png(pix)
        decode_check(png, pix)
        ids.append(k)
        pngs.append(png)
        hashes.append(dhash(pix))
    pq.write_table(pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "png": pa.array(pngs, pa.binary()),
    }), f"{OUT_DIR}/pngs.parquet")
    pq.write_table(pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "dhash": pa.array(hashes, pa.int64()),
    }), f"{OUT_DIR}/expected.parquet")
    # companion-pair stats for the module doc's claim
    ham = []
    for k in range(2, N_IMAGES, 3):
        ham.append(bin((hashes[k] ^ hashes[k - 1]) &
                       0xFFFFFFFFFFFFFFFF).count("1"))
    import collections
    print("wrote", N_IMAGES, "pngs; companion hamming:",
          dict(collections.Counter(ham)))


if __name__ == "__main__":
    main()
