#!/usr/bin/env python3
"""Deterministic generator for the m15 BMP and m16 GIF fixtures
(src/main/resources/bmp, src/main/resources/gif) and the REFERENCE stats
their golden oracles pin.

Both formats are LOSSLESS here (BMP is raw 24-bit; GIF palettizes, and the
16x12 rasters have <= 192 distinct colors, so the palette is exact), so the
JVM decode (javax.imageio) must agree with the source raster to the bit —
the same independence argument as tools/gen_png_fixtures.py, with the same
rasters: imga/imgb are the PNG fixtures' noise images (seeds 90210 /
555001), so the per-channel sums ALSO match m11's goldens, pinning that the
same raster through three container formats decodes identically.

Encoders here are the minimal standard forms (public knowledge):
  - BMP: BITMAPFILEHEADER + BITMAPINFOHEADER(40), 24-bit BI_RGB,
    bottom-up rows padded to 4 bytes;
  - GIF: GIF89a, global color table, one image, LZW-compressed indices in
    the "uncompressed GIF" style (literal codes with periodic CLEARs so the
    code size never grows — valid LZW, trivially correct).

corrupt.* are HEADER truncations (cut inside the DIB header / color table):
unambiguous whole-asset rejects for any decoder.

Run: python3 tools/gen_bmp_gif_fixtures.py
"""
import os
import struct

HERE = os.path.dirname(__file__)


def lcg(seed):
    s = seed
    while True:
        s = (s * 1103515245 + 12345) & 0x7FFFFFFF
        yield s


def noise_img(w, h, seed):
    g = lcg(seed)
    return [[(next(g) % 256, next(g) % 256, next(g) % 256) for _ in range(w)]
            for _ in range(h)]


def stats(px):
    s = [0, 0, 0]
    for row in px:
        for p in row:
            for c in range(3):
                s[c] += p[c]
    return s


def bmp_bytes(w, h, px):
    rowsize = (w * 3 + 3) & ~3
    data = b"".join(
        b"".join(bytes((b, g, r)) for (r, g, b) in px[y]) + b"\x00" * (rowsize - w * 3)
        for y in reversed(range(h)))
    header = b"BM" + struct.pack("<IHHI", 14 + 40 + len(data), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + dib + data


def gif_bytes(w, h, px):
    palette = sorted(set(p for row in px for p in row))
    assert len(palette) <= 256, "GIF fixture rasters must palettize exactly"
    index = {c: i for i, c in enumerate(palette)}
    # GCT size: the smallest power of two >= palette size (field stores n
    # where table has 2^(n+1) entries)
    n = 0
    while (2 << n) < len(palette):
        n += 1
    table = palette + [(0, 0, 0)] * ((2 << n) - len(palette))
    mcs = max(2, n + 1)  # LZW minimum code size
    clear, end = 1 << mcs, (1 << mcs) + 1
    code_size = mcs + 1

    # "uncompressed GIF" LZW: every pixel emitted as its own literal code,
    # with a CLEAR re-emitted before the decoder's dictionary would force a
    # code-size bump — after a CLEAR the next slot is end+1, and the decoder
    # bumps when slot 2^code_size - 1 is filled, so up to 2^mcs - 3 literal
    # codes are safe between CLEARs.
    bits = [(clear, code_size)]
    budget = (1 << mcs) - 3
    count = 0
    for row in px:
        for p in row:
            if count == budget:
                bits.append((clear, code_size))
                count = 0
            bits.append((index[p], code_size))
            count += 1
    bits.append((end, code_size))

    # LSB-first bit packing
    out = bytearray()
    acc = nbits = 0
    for code, size in bits:
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)

    blocks = b"".join(
        bytes((min(255, len(out) - i),)) + bytes(out[i:i + 255])
        for i in range(0, len(out), 255))

    return (b"GIF89a"
            + struct.pack("<HHBBB", w, h, 0x80 | (0 << 4) | n, 0, 0)
            + b"".join(bytes(c) for c in table)
            + b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
            + bytes((mcs,)) + blocks + b"\x00" + b"\x3b")


def write(sub, name, data):
    out = os.path.join(HERE, "..", "src/main/resources", sub)
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, name), "wb") as f:
        f.write(data)


def main():
    A = noise_img(16, 12, 90210)
    B = noise_img(16, 12, 555001)
    imga_bmp, imgb_bmp = bmp_bytes(16, 12, A), bmp_bytes(16, 12, B)
    imga_gif, imgb_gif = gif_bytes(16, 12, A), gif_bytes(16, 12, B)
    write("bmp", "imga.bmp", imga_bmp)
    write("bmp", "imgb.bmp", imgb_bmp)
    write("bmp", "corrupt.bmp", imga_bmp[:30])   # cut inside the DIB header
    write("gif", "imga.gif", imga_gif)
    write("gif", "imgb.gif", imgb_gif)
    write("gif", "corrupt.gif", imga_gif[:20])   # cut inside the color table

    print("distinct colors: imga %d, imgb %d (must be <= 256 for exact GIF)"
          % (len(set(p for r in A for p in r)), len(set(p for r in B for p in r))))
    print("stats (name w h n_pixels sum_r sum_g sum_b) — shared by bmp and gif:")
    for k, px in (("imga", A), ("imgb", B)):
        s = stats(px)
        print(k, 16, 12, 192, s[0], s[1], s[2])
    for nm, b in (("imga.bmp", imga_bmp), ("imgb.bmp", imgb_bmp),
                  ("imga.gif", imga_gif), ("imgb.gif", imgb_gif)):
        print(nm, len(b), "bytes")


if __name__ == "__main__":
    main()
