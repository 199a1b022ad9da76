#!/usr/bin/env python3
"""Deterministic generator for the m9/m10 video fixtures
(src/main/resources/y4m) and the REFERENCE decode + signature
implementation the m9_y4m_decode / m10_video_near_dup golden oracles are
derived from.

Run: python3 tools/gen_y4m_fixtures.py
Rewrites the fixture files, prints the m9 exact-integer decode stats and
every pairwise video distance. Pairs at total distance <= 6 are the
golden rows in SparkEntry.oracleSql.

Y4M (YUV4MPEG2) is the raw-video interchange format: an ASCII parameter
line, then per frame an ASCII "FRAME" line (optionally with parameters)
followed by the raw planar YUV bytes — the simplest widely-produced
video container, decodeable without a codec library (the m4/m7
pure-JVM-real-codec rule on the video modality). The decode contract
(independently re-implemented in Scala at graft.ops.Video.decodeY4m):
C420 subsampling (any 420 variant tag), W/H/F params required, frames
must be complete — truncation rejects WHOLE.

The video signature is the dHash of 4 evenly-sampled frames (indices
floor(j*n/4)): per-frame 64-bit dHash over the luma plane (the SAME 9x8
box-average reference as gen_ppmnear_fixtures.py with r=g=b=Y), distance
= total Hamming over the 4 sampled frames. A re-wrapped copy (different
container params, same frames) and a uniform luma lift are distance 0;
a single-frame retouch costs only that frame's bits; unrelated videos
sit at ~100+.
"""
import os

OUT = os.path.join(os.path.dirname(__file__), "..", "src/main/resources/y4m")

W, H, N = 48, 32, 12


def lcg(seed):
    s = seed
    while True:
        s = (s * 1103515245 + 12345) & 0x7FFFFFFF
        yield s


def make_video(seed, fx, fy):
    """N luma frames: a moving 2-D gradient + LCG noise — strong
    per-frame dHash structure, distinct across frames."""
    g = lcg(seed)
    frames = []
    for f in range(N):
        plane = []
        for y in range(H):
            row = []
            for x in range(W):
                v = (fx * (x + 3 * f) + fy * y + (next(g) % 7)) % 256
                row.append(v)
            plane.append(row)
        frames.append(plane)
    return frames


def y4m_bytes(frames, extra_header=b"", frame_param=b""):
    hdr = b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C420jpeg" % (W, H) + extra_header + b"\n"
    out = [hdr]
    for plane in frames:
        out.append(b"FRAME" + frame_param + b"\n")
        out.append(bytes(v for row in plane for v in row))
        out.append(bytes([128] * ((W // 2) * (H // 2) * 2)))  # Cb, Cr
    return b"".join(out)


def write(name, payload):
    with open(os.path.join(OUT, name), "wb") as f:
        f.write(payload)


def bright(frames, d):
    return [[[min(255, v + d) for v in row] for row in plane] for plane in frames]


def retouch(frames, fidx):
    q = [[row[:] for row in plane] for plane in frames]
    for y in range(12, 20):
        for x in range(20, 28):
            q[fidx][y][x] = 255 if ((x + y) & 1) == 0 else 0
    return q


# ---- reference decode + signature (independent of the Scala side) ----

def decode(payload):
    nl = payload.find(b"\n")
    if nl < 0:
        return None
    parts = payload[:nl].split(b" ")
    if parts[0] != b"YUV4MPEG2":
        return None
    w = h = None
    chroma = b"420jpeg"
    for p in parts[1:]:
        if p.startswith(b"W"): w = int(p[1:])
        elif p.startswith(b"H"): h = int(p[1:])
        elif p.startswith(b"C"): chroma = p[1:]
    if not w or not h or not chroma.startswith(b"420"):
        return None
    fsize = w * h + 2 * ((w // 2) * (h // 2))
    i = nl + 1
    frames = []
    n = len(payload)
    while i < n:
        fnl = payload.find(b"\n", i)
        if fnl < 0 or not payload[i:fnl].startswith(b"FRAME"):
            return None
        body = fnl + 1
        if body + fsize > n:
            return None  # truncated frame: reject whole
        luma = payload[body:body + w * h]
        frames.append([[luma[y * w + x] for x in range(w)] for y in range(h)])
        i = body + fsize
    if not frames:
        return None
    return w, h, frames


def dhash(w, h, plane):
    def cell(x, y):
        x0, x1 = x * w // 9, max(x * w // 9 + 1, (x + 1) * w // 9)
        y0, y1 = y * h // 8, max(y * h // 8 + 1, (y + 1) * h // 8)
        tot = cnt = 0
        for yy in range(y0, y1):
            for xx in range(x0, x1):
                v = plane[yy][xx]
                tot += 1000 * v  # r=g=b=Y under the 299/587/114 weights
                cnt += 1
        return tot // cnt
    gray = [[cell(x, y) for x in range(9)] for y in range(8)]
    sig = 0
    for y in range(8):
        for x in range(8):
            if gray[y][x] < gray[y][x + 1]:
                sig |= 1 << (y * 8 + x)
    return sig


def signature(w, h, frames):
    n = len(frames)
    return [dhash(w, h, frames[j * n // 4]) for j in range(4)]


def main():
    os.makedirs(OUT, exist_ok=True)
    a = make_video(seed=7, fx=5, fy=3)
    b = make_video(seed=991, fx=11, fy=7)

    write("vida.y4m", y4m_bytes(a))
    write("vida_recode.y4m", y4m_bytes(a, extra_header=b" XREWRAP", frame_param=b" Xq=1"))
    write("vida_bright.y4m", y4m_bytes(bright(a, 8)))
    write("vida_retouch.y4m", y4m_bytes(retouch(a, 6)))  # frame 6 IS sampled (12*2//4)
    write("vidb.y4m", y4m_bytes(b))
    full = y4m_bytes(a)
    write("corrupt.y4m", full[:len(full) * 2 // 3])

    names = ["corrupt.y4m", "vida.y4m", "vida_bright.y4m", "vida_recode.y4m",
             "vida_retouch.y4m", "vidb.y4m"]
    sigs = {}
    print("== m9 golden stats (name, width, height, n_frames, sum_luma) ==")
    for nm in names:
        payload = open(os.path.join(OUT, nm), "rb").read()
        d = decode(payload)
        if d is None:
            print("  %-18s REJECT" % nm)
            continue
        w, h, frames = d
        sl = sum(v for plane in frames for row in plane for v in row)
        print("  %-18s %d %d %d %d" % (nm, w, h, len(frames), sl))
        sigs[nm] = signature(w, h, frames)
    print("== m10 pairwise total Hamming over 4 sampled frames (golden: <= 6) ==")
    ks = sorted(sigs)
    for i in range(len(ks)):
        for j in range(i + 1, len(ks)):
            d = sum(bin(x ^ y).count("1") for x, y in zip(sigs[ks[i]], sigs[ks[j]]))
            mark = "  <= GOLDEN" if d <= 6 else ""
            print("  %-18s %-18s %3d%s" % (ks[i], ks[j], d, mark))


if __name__ == "__main__":
    main()
