#!/usr/bin/env python3
"""Video fixture generator: deterministic multi-frame GIFs + expected stats.

Writes two parquet files under fixtures/media/:
  gifs.parquet            media_id BIGINT, gif BLOB       (the inputs)
  video_expected.parquet  media_id BIGINT, n_frames, width, height,
                          sum_r, sum_g, sum_b, h0..h7 BIGINT (the oracle)

The GIFs are encoded here in pure Python (GIF89a, global 256-entry
grayscale palette, one full-size image block per frame, LZW written with
the classic clear-code-reset "literal codes only" technique) so the
engine's javax.imageio multi-frame decode path is exercised on clips
produced by a *different* stack. Expected stats are computed from the
raw pixel arrays with integer-exact math, pooled over ALL frames:

  sum_c = sum of channel c over all pixels of all frames
  hist bin = ((r*299 + g*587 + b*114) // 1000) // 32   (8 luma bins)

The palette is grayscale (index i -> (i,i,i)), so a pixel's palette
index IS its channel value and luma == v, bin == v // 32.

Frame pattern for media_id k, frame f (covers the full 0..255 range):
  n_frames = 2 + k%4,  w = 12 + k%5,  h = 12 + k%3
  v = (x*7 + y*11 + k*13 + f*29) % 256

Every GIF is re-parsed from its own bytes before writing (block walk +
LZW decode + pixel-equality per frame) so an encoder bug cannot ship a
bad fixture.
"""
import struct

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N_CLIPS = 5000  # covers doc_id 0..4999 (sf0.001/0.01/0.1 documents)
OUT_DIR = "/root/repo/fixtures/media"


def frame_pixels(k: int, f: int) -> np.ndarray:
    w, h = 12 + k % 5, 12 + k % 3
    y, x = np.mgrid[0:h, 0:w]
    return ((x * 7 + y * 11 + k * 13 + f * 29) % 256).astype(np.uint8)


def lzw_encode(indices: bytes) -> bytes:
    """GIF LZW for 8-bit codes, literals only: CLEAR before every run of
    <=250 literals keeps the code table small enough that the code width
    stays 9 bits throughout. Standard, spec-conforming technique."""
    CLEAR, EOI, WIDTH = 256, 257, 9
    out = bytearray()
    acc = n_bits = 0

    def emit(code: int):
        nonlocal acc, n_bits
        acc |= code << n_bits
        n_bits += WIDTH
        while n_bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n_bits -= 8

    emit(CLEAR)
    for i, b in enumerate(indices):
        if i and i % 250 == 0:
            emit(CLEAR)
        emit(b)
    emit(EOI)
    if n_bits:
        out.append(acc & 0xFF)
    return bytes(out)


def gif_encode(frames: list) -> bytes:
    h, w = frames[0].shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0xF7, 0, 0])  # global table: 256 entries; bg 0; no aspect
    for i in range(256):        # grayscale palette: index == channel value
        out += bytes([i, i, i])
    for fr in frames:
        out += b"\x2C" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        out += bytes([8])  # LZW minimum code size
        data = lzw_encode(fr.tobytes())
        for off in range(0, len(data), 255):
            sub = data[off:off + 255]
            out += bytes([len(sub)]) + sub
        out += b"\x00"  # block terminator
    out += b"\x3B"
    return bytes(out)


def lzw_decode(data: bytes, n_pixels: int) -> bytes:
    """Full GIF LZW decoder (not just the encoder's subset) — self-check."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table, width, prev = [], 9, None
    acc = n_bits = pos = 0

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width, prev = 9, None

    reset()
    while len(out) < n_pixels:
        while n_bits < width:
            acc |= data[pos] << n_bits
            pos += 1
            n_bits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        n_bits -= width
        if code == CLEAR:
            reset()
            continue
        if code == EOI:
            break
        if code < len(table):
            entry = table[code]
            if prev is not None:
                table.append(prev + entry[:1])
        else:
            entry = prev + prev[:1]
            table.append(entry)
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    return bytes(out)


def gif_parse_back(gif: bytes) -> list:
    """Minimal strict reader for the encoder's own output (self-check)."""
    assert gif[:6] == b"GIF89a"
    w, h = struct.unpack("<HH", gif[6:10])
    assert gif[10] == 0xF7
    pos = 13
    palette = gif[pos:pos + 768]
    assert all(palette[3 * i] == i for i in range(256)), "not grayscale"
    pos += 768
    frames = []
    while gif[pos] == 0x2C:
        fx, fy, fw, fh = struct.unpack("<HHHH", gif[pos + 1:pos + 9])
        assert (fx, fy, fw, fh) == (0, 0, w, h) and gif[pos + 9] == 0
        assert gif[pos + 10] == 8
        pos += 11
        data = bytearray()
        while gif[pos]:
            ln = gif[pos]
            data += gif[pos + 1:pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        frames.append(np.frombuffer(
            lzw_decode(bytes(data), w * h), dtype=np.uint8).reshape(h, w))
    assert gif[pos] == 0x3B
    return frames


def stats(frames: list) -> dict:
    v = np.concatenate([f.astype(np.int64).ravel() for f in frames])
    hist = np.bincount(v // 32, minlength=8)  # luma of (v,v,v) == v
    return dict(n_frames=len(frames), width=frames[0].shape[1],
                height=frames[0].shape[0],
                sum_r=int(v.sum()), sum_g=int(v.sum()), sum_b=int(v.sum()),
                **{f"h{i}": int(hist[i]) for i in range(8)})


def main() -> None:
    import os
    os.makedirs(OUT_DIR, exist_ok=True)
    gifs, rows = [], []
    for k in range(N_CLIPS):
        frames = [frame_pixels(k, f) for f in range(2 + k % 4)]
        gif = gif_encode(frames)
        back = gif_parse_back(gif)
        assert len(back) == len(frames) and all(
            np.array_equal(a, b) for a, b in zip(back, frames)), f"k={k}"
        gifs.append(gif)
        rows.append(dict(media_id=k, **stats(frames)))

    pq.write_table(pa.table({
        "media_id": pa.array(range(N_CLIPS), pa.int64()),
        "gif": pa.array(gifs, pa.binary()),
    }), f"{OUT_DIR}/gifs.parquet")

    cols = ["media_id", "n_frames", "width", "height",
            "sum_r", "sum_g", "sum_b"] + [f"h{i}" for i in range(8)]
    pq.write_table(pa.table({
        c: pa.array([r[c] for r in rows], pa.int64()) for c in cols
    }), f"{OUT_DIR}/video_expected.parquet")
    print(f"wrote {N_CLIPS} gifs + expected stats to {OUT_DIR}")


if __name__ == "__main__":
    main()
