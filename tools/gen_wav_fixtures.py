#!/usr/bin/env python3
"""Deterministic generator for the m7/m8 audio fixtures
(src/main/resources/wav) and the REFERENCE decode + fingerprint
implementation the m7_wav_decode / m8_wav_near_dup golden oracles are
derived from.

Run: python3 tools/gen_wav_fixtures.py
Rewrites the fixture files, prints the m7 exact-integer decode stats and
every pairwise fingerprint Hamming distance. Pairs at d <= 3 are the
golden rows in SparkEntry.oracleSql.

The decode contract (independently re-implemented in Scala at
graft.ops.Audio.decodeWav — agreement here is the oracle):
  RIFF/WAVE container, chunks walked in order with odd-size pad bytes;
  fmt must be PCM (audioFormat=1), 16-bit, 1-2 channels; the data chunk
  must be fully present and frame-aligned; anything else rejects WHOLE.
Mono mix is (L+R)>>1 (arithmetic shift = floor — identical in Python and
JVM, unlike /2 truncation). The 64-bit fingerprint is delta-energy over
65 equal windows: bit w = energy[w] < energy[w+1], energies as exact
integer sums of squares. A uniform gain change scales every window
energy by the same factor, so it flips NO bits — the invariance a
volume-normalized re-encode needs; the stereo spread of the same signal
mixes back to the identical mono stream, so it is Hamming 0 too.
"""
import math
import os
import struct

OUT = os.path.join(os.path.dirname(__file__), "..", "src/main/resources/wav")

RATE = 8000
N = 8000  # frames per fixture (1 s)


def lcg(seed):
    s = seed
    while True:
        s = (s * 1103515245 + 12345) & 0x7FFFFFFF
        yield s


def clamp16(v):
    return max(-32768, min(32767, int(v)))


def tone(seed, freq, env_cycles, base, depth, noise):
    """Sine with a slowly-varying amplitude envelope + LCG noise: the
    envelope makes the 65-window energy profile strongly non-monotone so
    no fingerprint bit sits on a near-tie."""
    g = lcg(seed)
    out = []
    for i in range(N):
        a = base + depth * math.sin(2 * math.pi * env_cycles * i / N)
        s = a * math.sin(2 * math.pi * freq * i / RATE)
        s += (next(g) % (2 * noise + 1)) - noise
        out.append(clamp16(s))
    return out


def wav_bytes(samples, channels=1, extra_chunk=False, rate=RATE):
    """samples: mono list, or list of (l, r) when channels=2."""
    if channels == 1:
        data = b"".join(struct.pack("<h", s) for s in samples)
    else:
        data = b"".join(struct.pack("<hh", l, r) for (l, r) in samples)
    fmt = struct.pack("<HHIIHH", 1, channels, rate,
                      rate * channels * 2, channels * 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if extra_chunk:
        # an odd-size ancillary chunk (9 bytes + pad) pins the
        # chunk-skip + pad-byte walk in the decoder
        meta = b"generated"
        chunks += b"LIST" + struct.pack("<I", len(meta)) + meta + b"\x00"
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def write(name, payload):
    with open(os.path.join(OUT, name), "wb") as f:
        f.write(payload)


# ---- reference decode (independent of the Scala implementation) ----

def decode(payload):
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    i = 12
    fmt = None
    while i + 8 <= len(payload):
        cid = payload[i:i + 4]
        size = struct.unpack("<I", payload[i + 4:i + 8])[0]
        body_at = i + 8
        if cid == b"fmt " and size >= 16:
            fmt = struct.unpack("<HHIIHH", payload[body_at:body_at + 16])
        elif cid == b"data":
            if fmt is None or body_at + size > len(payload):
                return None
            af, ch, rate, _, _, bits = fmt
            if af != 1 or bits != 16 or ch not in (1, 2) or rate <= 0:
                return None
            if size % (2 * ch) != 0:
                return None
            n = size // (2 * ch)
            raw = struct.unpack("<%dh" % (n * ch), payload[body_at:body_at + size])
            if ch == 1:
                mono = list(raw)
            else:
                mono = [(raw[2 * k] + raw[2 * k + 1]) >> 1 for k in range(n)]
            return rate, ch, mono
        i = body_at + size + (size & 1)
    return None


def stats(mono):
    return (len(mono), sum(abs(s) for s in mono), max(abs(s) for s in mono))


def fingerprint(mono):
    W = 65
    n = len(mono)
    if n < W:
        return None
    e = []
    for w in range(W):
        x0 = w * n // W
        x1 = max(x0 + 1, (w + 1) * n // W)
        e.append(sum(s * s for s in mono[x0:x1]))
    sig = 0
    for w in range(64):
        if e[w] < e[w + 1]:
            sig |= 1 << w
    return sig, min(abs(e[w + 1] - e[w]) for w in range(64))


def main():
    os.makedirs(OUT, exist_ok=True)
    a = tone(seed=7, freq=440, env_cycles=3.7, base=9000, depth=7000, noise=200)
    b = tone(seed=91, freq=935, env_cycles=5.3, base=8000, depth=6500, noise=300)

    a_gain = [s >> 1 for s in a]  # uniform -6 dB: floor halving
    a_click = list(a)
    # a loud burst confined to window 10 of 65: flips the two delta bits
    # that border the window, nothing else
    x0, x1 = 10 * N // 65, 11 * N // 65
    for i in range(x0, x1):
        a_click[i] = 31000 if (i & 1) == 0 else -31000

    write("tonea.wav", wav_bytes(a))
    write("tonea_gain.wav", wav_bytes(a_gain, extra_chunk=True))
    write("tonea_click.wav", wav_bytes(a_click))
    write("toneb.wav", wav_bytes(b))
    write("toneb_stereo.wav", wav_bytes([(s, s) for s in b], channels=2))
    full = wav_bytes(a)
    write("corrupt.wav", full[:len(full) // 2])  # truncated data: reject

    names = ["corrupt.wav", "tonea.wav", "tonea_click.wav", "tonea_gain.wav",
             "toneb.wav", "toneb_stereo.wav"]
    sigs = {}
    print("== m7 golden stats (name, rate, channels, n_frames, sum_abs, peak) ==")
    for nm in names:
        payload = open(os.path.join(OUT, nm), "rb").read()
        d = decode(payload)
        if d is None:
            print("  %-18s REJECT" % nm)
            continue
        rate, ch, mono = d
        nfr, sab, pk = stats(mono)
        print("  %-18s %d %d %d %d %d" % (nm, rate, ch, nfr, sab, pk))
        sig, margin = fingerprint(mono)
        sigs[nm] = sig
        print("     sig=%016x  min-delta-margin=%d" % (sig & 0xFFFFFFFFFFFFFFFF, margin))

    print("== m8 pairwise fingerprint Hamming (golden pairs: d <= 3) ==")
    ks = sorted(sigs)
    for i in range(len(ks)):
        for j in range(i + 1, len(ks)):
            d = bin(sigs[ks[i]] ^ sigs[ks[j]]).count("1")
            mark = "  <= GOLDEN" if d <= 3 else ""
            print("  %-18s %-18s %2d%s" % (ks[i], ks[j], d, mark))


if __name__ == "__main__":
    main()
