#!/usr/bin/env python3
"""Deterministic generator for the m5 near-dup PPM fixtures
(src/main/resources/ppmnear) and the REFERENCE dHash implementation the
m5_ppm_near_dup golden oracle is derived from.

Run: python3 tools/gen_ppmnear_fixtures.py
Rewrites the fixture files and prints every signature and pairwise Hamming
distance; pairs at Hamming <= 3 are the golden rows in SparkEntry.oracleSql.
The reference dHash is an independent re-implementation of
graft.ops.Multimodal.dHash64 (9x8 integer box-average luma grid, bit =
gray[x] < gray[x+1]) — agreement between the two is the point.

corrupt.ppm is NOT generated here: it is the same truncated fixture m4
uses (copied from src/main/resources/ppm), pinning the decode-reject path.
"""
import os

OUT = os.path.join(os.path.dirname(__file__), "..", "src/main/resources/ppmnear")


def lcg(seed):
    s = seed
    while True:
        s = (s * 1103515245 + 12345) & 0x7FFFFFFF
        yield s


def noise_img(w, h, seed):
    g = lcg(seed)
    return [[(next(g) % 256, next(g) % 256, next(g) % 256) for _ in range(w)]
            for _ in range(h)]


def write_ppm(name, w, h, px, comment=None):
    hdr = b"P6"
    if comment:
        hdr += b"\n# " + comment
    hdr += b"\n%d %d\n255\n" % (w, h)
    body = bytes(c for row in px for p in row for c in p)
    with open(os.path.join(OUT, name), "wb") as f:
        f.write(hdr + body)


def bright(px, d, perturb=()):
    """+d clamped, then overwrite pixels to flip a couple of dHash bits —
    a brightness shift alone flips none (dHash is shift-invariant)."""
    q = [[tuple(min(255, c + d) for c in p) for p in row] for row in px]
    for (x, y, v) in perturb:
        q[y][x] = (v, v, v)
    return q


def dhash(w, h, px):
    def cell(x, y, gw, gh):
        x0, x1 = x * w // gw, max(x * w // gw + 1, (x + 1) * w // gw)
        y0, y1 = y * h // gh, max(y * h // gh + 1, (y + 1) * h // gh)
        tot = n = 0
        for yy in range(y0, y1):
            for xx in range(x0, x1):
                r, g, b = px[yy][xx]
                tot += 299 * r + 587 * g + 114 * b
                n += 1
        return tot // n

    gray = [[cell(x, y, 9, 8) for x in range(9)] for y in range(8)]
    sig = 0
    for y in range(8):
        for x in range(8):
            if gray[y][x] < gray[y][x + 1]:
                sig |= 1 << (y * 8 + x)
    return sig - (1 << 64) if sig >= 1 << 63 else sig  # Spark LongType view


def main():
    A = noise_img(16, 12, 7)
    B = noise_img(16, 12, 1234577)
    C = noise_img(9, 8, 424243)
    Ab = bright(A, 8, perturb=((3, 4, 0), (11, 9, 255)))

    write_ppm("imga.ppm", 16, 12, A)
    write_ppm("imga_recode.ppm", 16, 12, A,
              comment=b"re-encoded copy, identical raster")
    write_ppm("imga_bright.ppm", 16, 12, Ab)
    write_ppm("imgb.ppm", 16, 12, B)
    write_ppm("imgc.ppm", 9, 8, C)

    sigs = {"imga.ppm": dhash(16, 12, A),
            "imga_recode.ppm": dhash(16, 12, A),
            "imga_bright.ppm": dhash(16, 12, Ab),
            "imgb.ppm": dhash(16, 12, B),
            "imgc.ppm": dhash(9, 8, C)}
    for k in sorted(sigs):
        print(k, sigs[k])
    print("pairs (hamming):")
    names = sorted(sigs)
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            h = bin((sigs[names[i]] ^ sigs[names[j]]) & (1 << 64) - 1).count("1")
            print(names[i], names[j], h, "<= 3 GOLDEN" if h <= 3 else "")


if __name__ == "__main__":
    main()
