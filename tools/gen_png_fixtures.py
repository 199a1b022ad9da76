#!/usr/bin/env python3
"""Deterministic generator for the m11 PNG fixtures
(src/main/resources/png) and the REFERENCE stats + dHash the
m11_png_decode / m12_png_near_dup / d40_png_incremental golden oracles are
derived from.

Run: python3 tools/gen_png_fixtures.py
Rewrites the fixture files and prints every image's exact integer stats
(the m11 golden rows), every signature, and pairwise Hamming distances;
pairs at Hamming <= 3 are the m12/d40 golden rows.

The PNG encoder here is the minimal standard form (public knowledge:
8-byte signature, IHDR/IDAT/IEND chunks, zlib-deflated scanlines with
filter byte 0, CRC32 per chunk) — fully independent of the JVM decode
path (javax.imageio) the engine uses, which is the point: PNG is
lossless, so the two must agree to the bit.

imga_recode.png carries an ancillary tEXt chunk and a different deflate
level: byte-different file, identical raster (the re-encoded copy exact
hashing misses). corrupt.png is imga truncated mid-IDAT, pinning the
whole-asset decode reject.
"""
import os
import struct
import zlib

OUT = os.path.join(os.path.dirname(__file__), "..", "src/main/resources/png")


def lcg(seed):
    s = seed
    while True:
        s = (s * 1103515245 + 12345) & 0x7FFFFFFF
        yield s


def noise_img(w, h, seed):
    g = lcg(seed)
    return [[(next(g) % 256, next(g) % 256, next(g) % 256) for _ in range(w)]
            for _ in range(h)]


def chunk(tag, body):
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def png_bytes(w, h, px, level=9, text=None):
    raw = b"".join(b"\x00" + bytes(c for p in row for c in p) for row in px)
    out = b"\x89PNG\r\n\x1a\n"
    out += chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
    if text:
        out += chunk(b"tEXt", b"Comment\x00" + text)
    out += chunk(b"IDAT", zlib.compress(raw, level))
    out += chunk(b"IEND", b"")
    return out


def write(name, data):
    with open(os.path.join(OUT, name), "wb") as f:
        f.write(data)


def bright(px, d, perturb=()):
    """+d clamped, then overwrite pixels to flip a couple of dHash bits —
    a brightness shift alone flips none (dHash is shift-invariant)."""
    q = [[tuple(min(255, c + d) for c in p) for p in row] for row in px]
    for (x, y, v) in perturb:
        q[y][x] = (v, v, v)
    return q


def stats(px):
    s = [0, 0, 0]
    for row in px:
        for p in row:
            for c in range(3):
                s[c] += p[c]
    return s


def box_resize(w, h, px, ow, oh):
    """Independent reference of graft.ops.Multimodal.boxResize: floor
    average per channel over the same integer cell grid."""
    out = []
    for y in range(oh):
        y0, y1 = y * h // oh, max(y * h // oh + 1, (y + 1) * h // oh)
        row = []
        for x in range(ow):
            x0, x1 = x * w // ow, max(x * w // ow + 1, (x + 1) * w // ow)
            s = [0, 0, 0]
            for yy in range(y0, y1):
                for xx in range(x0, x1):
                    for c in range(3):
                        s[c] += px[yy][xx][c]
            n = (y1 - y0) * (x1 - x0)
            row.append(tuple(v // n for v in s))
        out.append(row)
    return out


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
    os.makedirs(OUT, exist_ok=True)
    A = noise_img(16, 12, 90210)
    B = noise_img(16, 12, 555001)
    Ab = bright(A, 8, perturb=((5, 2, 0), (12, 10, 255)))

    imga = png_bytes(16, 12, A)
    write("imga.png", imga)
    write("imga_recode.png",
          png_bytes(16, 12, A, level=1, text=b"re-encoded copy, identical raster"))
    write("imga_bright.png", png_bytes(16, 12, Ab))
    write("imgb.png", png_bytes(16, 12, B))
    # truncate mid-IDAT: signature+IHDR survive, pixel data does not
    write("corrupt.png", imga[: len(imga) - 40])

    imgs = {"imga.png": (16, 12, A), "imga_recode.png": (16, 12, A),
            "imga_bright.png": (16, 12, Ab), "imgb.png": (16, 12, B)}
    print("stats (name w h n_pixels sum_r sum_g sum_b):")
    for k in sorted(imgs):
        w, h, px = imgs[k]
        s = stats(px)
        print(k, w, h, w * h, s[0], s[1], s[2])
    import hashlib
    print("resize goldens (9x7 box average: name sum_r sum_g sum_b sha256):")
    for k in sorted(imgs):
        w, h, px = imgs[k]
        t = box_resize(w, h, px, 9, 7)
        s = stats(t)
        raw = bytes(c for row in t for p in row for c in p)
        print(k, s[0], s[1], s[2], hashlib.sha256(raw).hexdigest())
    sigs = {k: dhash(*imgs[k]) for k in imgs}
    print("signatures:")
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
