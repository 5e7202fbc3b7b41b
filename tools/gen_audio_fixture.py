#!/usr/bin/env python3
"""Audio fixture generator: deterministic PCM WAVs + expected stats.

Writes two parquet files under fixtures/media/:
  wavs.parquet            media_id BIGINT, wav BLOB       (the inputs)
  audio_expected.parquet  media_id BIGINT, n_frames, sample_rate,
                          channels, sum_abs, peak, energy,
                          zero_cross BIGINT               (the oracle)

The WAVs are written here with the stdlib `wave` module (RIFF/PCM16,
a different stack from the JVM), so the engine's pure-byte RIFF parser
is exercised on files it did not produce. Expected stats are computed
from the raw int16 sample arrays with integer-exact math:

  n_frames   = samples per channel
  sum_abs    = sum |s| over all channels and frames
  peak       = max |s|
  energy     = sum s^2 (int64 — max 2^31 * 1300 * 2, far inside range)
  zero_cross = count over CHANNEL 0 of i in [1, n) where
               (s[i-1] < 0) != (s[i] < 0)

Sample pattern for media_id k (deterministic, full int16 range, with
sign changes so zero_cross is non-trivial):
  sample_rate = [8000, 11025, 16000, 22050][k % 4]
  channels    = 1 + k % 2
  n_frames    = 300 + (k * 37) % 500
  s[i, c]     = ((k*31 + i*17 + c*101 + (i*i) % 7919) % 65536) - 32768

Every WAV is re-read from its own bytes with the wave module and the
stats recomputed from the parsed frames before writing, so a writer bug
cannot ship a bad fixture.
"""
import io
import struct
import wave

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N_CLIPS = 5000  # covers doc_id 0..4999 (sf0.001/0.01/0.1 documents)
OUT_DIR = "/root/repo/fixtures/media"
RATES = [8000, 11025, 16000, 22050]


def samples(k: int) -> np.ndarray:
    """(n_frames, channels) int16 array for clip k."""
    ch = 1 + k % 2
    n = 300 + (k * 37) % 500
    i = np.arange(n, dtype=np.int64)[:, None]
    c = np.arange(ch, dtype=np.int64)[None, :]
    v = (k * 31 + i * 17 + c * 101 + (i * i) % 7919) % 65536 - 32768
    return v.astype(np.int16)


def wav_encode(k: int) -> bytes:
    s = samples(k)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(s.shape[1])
        w.setsampwidth(2)
        w.setframerate(RATES[k % 4])
        w.writeframes(s.tobytes())  # interleaved little-endian int16
    return buf.getvalue()


def stats(s: np.ndarray, rate: int):
    a = s.astype(np.int64)
    ch0 = a[:, 0]
    neg = ch0 < 0
    return {
        "n_frames": s.shape[0],
        "sample_rate": rate,
        "channels": s.shape[1],
        "sum_abs": int(np.abs(a).sum()),
        "peak": int(np.abs(a).max()),
        "energy": int((a * a).sum()),
        "zero_cross": int((neg[1:] != neg[:-1]).sum()),
    }


def parse_back(wav: bytes):
    """Independent re-read of the produced bytes via the wave module."""
    with wave.open(io.BytesIO(wav), "rb") as w:
        ch, sw, rate, n = (w.getnchannels(), w.getsampwidth(),
                           w.getframerate(), w.getnframes())
        assert sw == 2
        raw = w.readframes(n)
    flat = np.array(struct.unpack(f"<{n * ch}h", raw), dtype=np.int16)
    return flat.reshape(n, ch), rate


def main():
    ids, wavs, rows, rrows = [], [], [], []
    for k in range(N_CLIPS):
        wav = wav_encode(k)
        s, rate = parse_back(wav)
        expect = stats(samples(k), RATES[k % 4])
        got = stats(s, rate)
        assert got == expect, f"clip {k}: {got} != {expect}"
        ids.append(k)
        wavs.append(wav)
        rows.append(expect)
        # decimate-by-2 resample (keep every 2nd frame, halve the rate
        # by integer division) — the deterministic rule
        # MediaOps.decodeWavResampleStats must reproduce exactly
        rrows.append(stats(samples(k)[::2], RATES[k % 4] // 2))
    pq.write_table(pa.table({"media_id": pa.array(ids, pa.int64()),
                             "wav": pa.array(wavs, pa.binary())}),
                   f"{OUT_DIR}/wavs.parquet")
    names = ["n_frames", "sample_rate", "channels", "sum_abs",
             "peak", "energy", "zero_cross"]
    cols = {"media_id": pa.array(ids, pa.int64())}
    for name in names:
        cols[name] = pa.array([r[name] for r in rows], pa.int64())
    pq.write_table(pa.table(cols), f"{OUT_DIR}/audio_expected.parquet")
    rcols = {"media_id": pa.array(ids, pa.int64())}
    for name in names:
        rcols[name] = pa.array([r[name] for r in rrows], pa.int64())
    pq.write_table(pa.table(rcols),
                   f"{OUT_DIR}/audio_resample_expected.parquet")
    print(f"wrote {N_CLIPS} wavs "
          f"({sum(len(w) for w in wavs) / 1e6:.1f} MB) + expected "
          f"(+resample) stats")


if __name__ == "__main__":
    main()
