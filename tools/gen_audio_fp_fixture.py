#!/usr/bin/env python3
"""Audio-fingerprint fixture: near-duplicate WAV pairs + expected
temporal energy-delta fingerprints.

Writes two parquet files under fixtures/afp/:
  wavs.parquet      media_id BIGINT, wav BLOB     (the inputs)
  expected.parquet  media_id BIGINT, afp BIGINT   (the oracle)

WAVs are encoded with the stdlib `wave` module (a different stack from
the engine's byte-level RIFF walk) and the expected fingerprint is
computed from the RAW integer samples, so decode+hash is cross-checked
end to end.

Fingerprint spec (shared exactly with MediaOps.decodeAudioFingerprint):
  channel 0 splits into 65 equal time bins
      (bin b covers frames [b*n // 65, (b+1)*n // 65))
  bin energy = exact integer sum of s^2
  bit b (0..63) set iff energy(b+1) > energy(b); signed 64-bit out

Corpus (240 clips): every k with k % 3 == 2 is a companion of k-1 —
the same integer synth with a few of its per-bin amplitude levels
nudged (1 level, or 16 when k % 7 == 5) — so bin-energy comparisons
flip only where the nudge crosses an adjacent level, while unrelated
clips draw independent level permutations and sit near the random
expectation (~32 bits; measured min 20 on a cross-pair sample).
"""
import io
import wave

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N_CLIPS = 240
OUT_DIR = "/root/repo/fixtures/afp"


def samples(k: int) -> np.ndarray:
    base = k - 1 if k % 3 == 2 else k
    shift = (16 if k % 7 == 5 else 1) if k % 3 == 2 else 0
    n = 6500 + (base % 7) * 13
    t = np.arange(n, dtype=np.int64)
    # integer synth: a fast carrier under a piecewise-constant per-BIN
    # amplitude drawn from a seeded RNG — bin-energy ORDERING is then
    # an independent random permutation per clip (unrelated clips sit
    # near the 32-bit random expectation; earlier shared-series
    # envelopes correlated clips into accidental near-pairs). The
    # companion's +shift on every level flips only near-tie
    # comparisons.
    rng = np.random.default_rng(base * 7919 + 11)
    levels = rng.integers(60, 460, size=65).astype(np.int64)
    if shift:
        # companion: nudge `shift` of the 65 levels by a small delta —
        # each nudge can flip at most its two adjacent comparisons, so
        # Hamming lands in 0..2*shift (1 -> near-exact dup, 16 -> a
        # heavier re-master that may cross the pairing threshold)
        rng2 = np.random.default_rng(base * 104729 + 5)
        idx = rng2.choice(65, size=shift, replace=False)
        levels[idx] += rng2.integers(-120, 121, size=shift)
    bin_of = np.minimum(t * 65 // n, 64)
    carrier = (t * (2 + base % 23)) % 201 - 100
    s = carrier * levels[bin_of] // 100
    return np.clip(s, -32768, 32767).astype(np.int64)


def afp(s: np.ndarray) -> int:
    n = len(s)
    bounds = [b * n // 65 for b in range(66)]
    e = [int(np.sum(s[bounds[b]:bounds[b + 1]] ** 2))
         for b in range(65)]
    out = 0
    for b in range(64):
        if e[b + 1] > e[b]:
            out |= 1 << b
    return out - (1 << 64) if out >= (1 << 63) else out


def encode_wav(s: np.ndarray) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(s.astype("<i2").tobytes())
    return buf.getvalue()


def main():
    import os
    os.makedirs(OUT_DIR, exist_ok=True)
    ids, wavs, fps = [], [], []
    for k in range(N_CLIPS):
        s = samples(k)
        ids.append(k)
        wavs.append(encode_wav(s))
        fps.append(afp(s))
    pq.write_table(pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "wav": pa.array(wavs, pa.binary()),
    }), f"{OUT_DIR}/wavs.parquet")
    pq.write_table(pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "afp": pa.array(fps, pa.int64()),
    }), f"{OUT_DIR}/expected.parquet")
    import collections
    ham = [bin((fps[k] ^ fps[k - 1]) & 0xFFFFFFFFFFFFFFFF).count("1")
           for k in range(2, N_CLIPS, 3)]
    cross = []
    for a in range(0, N_CLIPS, 7):
        for b in range(a + 2, N_CLIPS, 11):
            if not (b % 3 == 2 and b - a == 1):
                cross.append(bin((fps[a] ^ fps[b]) &
                                 0xFFFFFFFFFFFFFFFF).count("1"))
    print("wrote", N_CLIPS, "clips; companion hamming:",
          dict(collections.Counter(ham)),
          "min cross-pair sample:", min(cross))


if __name__ == "__main__":
    main()
