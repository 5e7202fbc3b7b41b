#!/usr/bin/env python3
"""Media fixture generator: deterministic RGB PNGs + expected pixel stats.

Writes two parquet files under fixtures/media/:
  pngs.parquet      media_id BIGINT, png BLOB          (the inputs)
  expected.parquet  media_id BIGINT, width, height,
                    sum_r, sum_g, sum_b, h0..h7 BIGINT (the oracle)

The PNGs are encoded here in pure Python (zlib + struct, filter 0,
color type 2, 8-bit) so the engine's javax.imageio decode path is
exercised on images produced by a *different* stack. Expected stats are
computed from the raw pixel arrays with integer-exact math:

  sum_c = sum of channel c over all pixels
  hist bin = ((r*299 + g*587 + b*114) // 1000) // 32   (8 luma bins)

Pixel pattern for media_id k (covers the full 0..255 range):
  w = 16 + k%7, h = 16 + k%5
  r = (x*7  + y*11 + k*13) % 256
  g = (x*3  + y*5  + k*17) % 256
  b = (x*13 + y*2  + k*7 ) % 256

Every PNG is re-parsed from its own bytes before writing (decompress +
unfilter + pixel-equality) so an encoder bug cannot ship a bad fixture.
"""
import struct
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N_IMAGES = 5000  # covers doc_id 0..4999 (sf0.001/0.01/0.1 documents)
OUT_DIR = "/root/repo/fixtures/media"


def pixels(k: int) -> np.ndarray:
    w, h = 16 + k % 7, 16 + k % 5
    y, x = np.mgrid[0:h, 0:w]
    r = (x * 7 + y * 11 + k * 13) % 256
    g = (x * 3 + y * 5 + k * 17) % 256
    b = (x * 13 + y * 2 + k * 7) % 256
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def png_encode(pix: np.ndarray) -> bytes:
    h, w, _ = pix.shape
    raw = b"".join(b"\x00" + pix[row].tobytes() for row in range(h))

    def chunk(typ: bytes, data: bytes) -> bytes:
        body = typ + data
        return (struct.pack(">I", len(data)) + body
                + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 9)) + chunk(b"IEND", b""))


def png_parse_back(png: bytes) -> np.ndarray:
    """Minimal strict reader for the encoder's own output (self-check)."""
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    pos, idat = 8, b""
    w = h = None
    while pos < len(png):
        (ln,) = struct.unpack(">I", png[pos:pos + 4])
        typ = png[pos + 4:pos + 8]
        data = png[pos + 8:pos + 8 + ln]
        if typ == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", data[:10])
            assert depth == 8 and ctype == 2
        elif typ == b"IDAT":
            idat += data
        pos += 12 + ln
    raw = zlib.decompress(idat)
    stride = 1 + 3 * w
    rows = []
    for row in range(h):
        line = raw[row * stride:(row + 1) * stride]
        assert line[0] == 0, "unexpected filter byte"
        rows.append(np.frombuffer(line[1:], dtype=np.uint8).reshape(w, 3))
    return np.stack(rows)


def stats(pix: np.ndarray) -> dict:
    p = pix.astype(np.int64)
    r, g, b = p[..., 0], p[..., 1], p[..., 2]
    luma_bin = ((r * 299 + g * 587 + b * 114) // 1000) // 32
    hist = np.bincount(luma_bin.ravel(), minlength=8)
    return dict(width=pix.shape[1], height=pix.shape[0],
                sum_r=int(r.sum()), sum_g=int(g.sum()), sum_b=int(b.sum()),
                **{f"h{i}": int(hist[i]) for i in range(8)})


def main() -> None:
    import os
    os.makedirs(OUT_DIR, exist_ok=True)
    pngs, rows, rrows = [], [], []
    for k in range(N_IMAGES):
        pix = pixels(k)
        png = png_encode(pix)
        assert np.array_equal(png_parse_back(png), pix), f"roundtrip k={k}"
        pngs.append(png)
        rows.append(dict(media_id=k, **stats(pix)))
        # stride-2 top-left nearest-neighbor downsample (out[X,Y] =
        # in[2X,2Y]; out dims = ceil(in/2)) — the deterministic resize
        # rule MediaOps.decodeImageResizeStats must reproduce exactly
        rrows.append(dict(media_id=k, **stats(pix[::2, ::2])))

    pq.write_table(pa.table({
        "media_id": pa.array(range(N_IMAGES), pa.int64()),
        "png": pa.array(pngs, pa.binary()),
    }), f"{OUT_DIR}/pngs.parquet")

    cols = ["media_id", "width", "height", "sum_r", "sum_g", "sum_b"] \
        + [f"h{i}" for i in range(8)]
    pq.write_table(pa.table({
        c: pa.array([r[c] for r in rows], pa.int64()) for c in cols
    }), f"{OUT_DIR}/expected.parquet")
    pq.write_table(pa.table({
        c: pa.array([r[c] for r in rrows], pa.int64()) for c in cols
    }), f"{OUT_DIR}/resize_expected.parquet")
    print(f"wrote {N_IMAGES} pngs + expected (+resize) stats to {OUT_DIR}")


if __name__ == "__main__":
    main()
