"""Baseline-sequential JPEG codec with no imaging library — stdlib +
numpy only, the same discipline as the PNG codec in ``multimodal``.

Decoder (``jpeg_decode``): marker walk (DQT/SOF0/DHT/SOS/DRI), canonical
Huffman entropy decode with byte-unstuffing and restart markers, dequant,
separable orthonormal IDCT (one 8x8 basis matmul pair per block),
sampling-factor plane assembly with nearest-neighbor chroma upsampling,
JFIF YCbCr→RGB. Supports 8-bit baseline (SOF0/SOF1) grayscale and
3-component scans at any sampling factors (4:4:4, 4:2:0, 4:2:2, ...).
Progressive (SOF2), arithmetic coding, and 12-bit raise
``NotImplementedError`` — the ``decode_image`` operator turns that into
its documented null-pixel-row contract.

Encoder (``jpeg_encode_gray``): baseline grayscale with the Annex K
luminance quantization + Huffman tables — enough to synthesize real
bitstreams for the oracle-checked roundtrip query (``mm_jpeg_roundtrip``
feeds DC-only blocks whose quantization is exactly lossless, so any bug
in either direction of the huffman → quant → DCT chain hash-fails).

Parity note: re-derives the decode capability the reference gates behind
an imaging library; written from the public JPEG spec (ITU-T T.81)
constants only.
"""

from __future__ import annotations

import numpy as np

# --- ITU-T T.81 Annex K reference tables (public spec constants) ----------

#: luminance quantization table, natural (row-major) order
STD_LUMA_QUANT = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

#: DC luminance Huffman spec: (bits[1..16], huffval)
STD_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)

#: AC luminance Huffman spec
STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

#: zig-zag scan order: ZIGZAG[k] = natural index of the k-th scanned coef
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

#: orthonormal DCT-II basis: forward F = M @ f @ M.T, inverse f = M.T @ F @ M
_M = np.array(
    [
        [
            (np.sqrt(1 / 8) if u == 0 else 0.5)
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


# --- Huffman machinery -----------------------------------------------------


class _HuffTable:
    """Canonical JPEG Huffman table (T.81 §C.2 generate_size/code)."""

    def __init__(self, bits: list[int], vals: list[int]):
        # lookup[(length, code)] -> symbol
        self.lookup: dict[tuple[int, int], int] = {}
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1
        # encode direction: symbol -> (code, length)
        self.encode: dict[int, tuple[int, int]] = {}
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.encode[vals[k]] = (code, length)
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over an entropy-coded segment with the
    0xFF00 byte-stuffing already stripped by the caller."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def bit(self) -> int:
        byte = self.data[self.pos >> 3]
        b = (byte >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def decode(self, table: _HuffTable) -> int:
        length, code = 0, 0
        while length < 17:
            code = (code << 1) | self.bit()
            length += 1
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map t-bit magnitude to signed value."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


# --- decoder ---------------------------------------------------------------


def jpeg_decode(data: bytes):
    """Decode a baseline JPEG. Returns (width, height, mode, pixels)
    with mode 'L' or 'RGB' and pixels uint8 [h, w, ch]. Raises
    ValueError on a malformed stream, NotImplementedError on
    progressive/arithmetic/12-bit variants."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    frame = None  # (w, h, components)
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        ln = int.from_bytes(data[pos : pos + 2], "big")
        seg = data[pos + 2 : pos + ln]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0xF
                p += 1
                n = 64 * (2 if prec else 1)
                raw = seg[p : p + n]
                q = (
                    np.frombuffer(raw, ">u2").astype(np.int32)
                    if prec
                    else np.frombuffer(raw, np.uint8).astype(np.int32)
                )
                tbl = np.zeros(64, np.int32)
                tbl[ZIGZAG] = q  # zig-zag order -> natural
                quant[tid] = tbl.reshape(8, 8)
                p += n
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1 baseline
            if seg[0] != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = (w, h, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG variant unsupported: SOF marker 0xFF{marker:02X} "
                "(baseline sequential only)"
            )
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                (huff_ac if tc else huff_dc)[th] = _HuffTable(bits, vals)
                p += 17 + nv
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[:2], "big")
        elif marker == 0xDA:  # SOS — entropy data follows the header
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan_map = {}
            for c in range(ns):
                cid, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_map[cid] = (tables >> 4, tables & 0xF)
            scan_start = pos + ln
            return _decode_scan(
                data, scan_start, frame, scan_map, quant, huff_dc, huff_ac,
                restart_interval,
            )
        pos += ln
    raise ValueError("JPEG has no SOS scan")


def _strip_stuffing(data: bytes, start: int) -> list[bytes]:
    """Return the entropy-coded bytes from ``start`` with 0xFF00 stuffing
    removed, split into restart segments at RSTn markers."""
    segments, cur = [], bytearray()
    i = start
    n = len(data)
    while i < n:
        b = data[i]
        if b == 0xFF:
            nxt = data[i + 1] if i + 1 < n else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # RSTn: new segment
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # any other marker ends the scan
        cur.append(b)
        i += 1
    segments.append(bytes(cur))
    return segments


def _decode_scan(data, start, frame, scan_map, quant, huff_dc, huff_ac, dri):
    w, h, comps = frame
    for c in comps:
        if c["id"] not in scan_map:
            raise ValueError(f"JPEG scan missing component {c['id']}")
        dc_t, ac_t = scan_map[c["id"]]
        if dc_t not in huff_dc or ac_t not in huff_ac or c["tq"] not in quant:
            raise ValueError(
                "JPEG scan references undefined huffman/quant tables "
                "(MJPG streams omit DHT — see ensure_huffman_tables)"
            )
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-w // mcu_w)
    mcus_y = -(-h // mcu_h)

    planes = {
        c["id"]: np.zeros(
            (mcus_y * 8 * c["v"], mcus_x * 8 * c["h"]), dtype=np.float64
        )
        for c in comps
    }
    segments = _strip_stuffing(data, start)
    seg_idx = 0
    reader = _BitReader(segments[seg_idx])
    pred = {c["id"]: 0 for c in comps}

    n_mcus = mcus_x * mcus_y
    for m in range(n_mcus):
        if dri and m and m % dri == 0:  # restart: next segment, reset preds
            seg_idx += 1
            reader = _BitReader(segments[seg_idx])
            pred = {c["id"]: 0 for c in comps}
        my, mx = divmod(m, mcus_x)
        for c in comps:
            dc_t, ac_t = scan_map[c["id"]]
            qt = quant[c["tq"]].astype(np.float64)
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    coefs = np.zeros(64, np.float64)
                    t = reader.decode(huff_dc[dc_t])
                    diff = _extend(reader.bits(t), t) if t else 0
                    pred[c["id"]] += diff
                    coefs[0] = pred[c["id"]]
                    k = 1
                    while k < 64:
                        rs = reader.decode(huff_ac[ac_t])
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        coefs[ZIGZAG[k]] = _extend(reader.bits(s), s)
                        k += 1
                    block = _M.T @ (coefs.reshape(8, 8) * qt) @ _M + 128.0
                    y0 = (my * c["v"] + by) * 8
                    x0 = (mx * c["h"] + bx) * 8
                    planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = block

    # assemble: upsample each plane to full MCU-grid size, then crop
    full = []
    for c in comps:
        p = planes[c["id"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        px = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return w, h, "L", px[:, :, None]
    if len(full) == 3:
        y, cb, cr = full
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        px = np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(
            np.uint8
        )
        return w, h, "RGB", px
    raise NotImplementedError(f"JPEG with {len(full)} components unsupported")


# --- encoder (baseline grayscale) ------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s
        return bytes(self.out)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def jpeg_encode_gray(img: np.ndarray, quant: np.ndarray | None = None) -> bytes:
    """Baseline grayscale JPEG encoder (Annex K luminance tables by
    default). Pads to 8x8 blocks by edge replication; forward DCT is the
    same orthonormal basis the decoder inverts, quantization is
    round-half-even (exact for the integer-valued DC-only blocks the
    roundtrip oracle feeds)."""
    img = np.asarray(img, dtype=np.float64)
    if img.ndim == 3:
        img = img[:, :, 0]
    h, w = img.shape
    qt = STD_LUMA_QUANT if quant is None else np.asarray(quant, np.int32)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(img, ((0, ph - h), (0, pw - w)), mode="edge")

    dc_tab = _HuffTable(*STD_DC_LUMA)
    ac_tab = _HuffTable(*STD_AC_LUMA)
    bw = _BitWriter()
    pred = 0
    for y0 in range(0, ph, 8):
        for x0 in range(0, pw, 8):
            block = padded[y0 : y0 + 8, x0 : x0 + 8] - 128.0
            coefs = _M @ block @ _M.T
            q = np.round(coefs / qt).astype(np.int64)
            zz = q.reshape(64)[ZIGZAG]
            # DC
            diff = int(zz[0]) - pred
            pred = int(zz[0])
            t = _category(diff)
            code, length = dc_tab.encode[t]
            bw.write(code, length)
            if t:
                bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
            # AC
            run = 0
            last_nz = np.nonzero(zz[1:])[0]
            last = last_nz[-1] + 1 if len(last_nz) else 0
            for k in range(1, last + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run >= 16:
                    code, length = ac_tab.encode[0xF0]  # ZRL
                    bw.write(code, length)
                    run -= 16
                s = _category(v)
                code, length = ac_tab.encode[(run << 4) | s]
                bw.write(code, length)
                bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                run = 0
            if last < 63:
                code, length = ac_tab.encode[0x00]  # EOB
                bw.write(code, length)
    scan = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    zz_q = qt.reshape(64)[ZIGZAG].astype(np.uint8).tobytes()
    dqt = seg(0xDB, b"\x00" + zz_q)
    sof = seg(
        0xC0,
        b"\x08" + h.to_bytes(2, "big") + w.to_bytes(2, "big") + b"\x01"
        + b"\x01\x11\x00",
    )
    bits_dc, vals_dc = STD_DC_LUMA
    bits_ac, vals_ac = STD_AC_LUMA
    dht = seg(0xC4, b"\x00" + bytes(bits_dc) + bytes(vals_dc)) + seg(
        0xC4, b"\x10" + bytes(bits_ac) + bytes(vals_ac)
    )
    sos = seg(0xDA, b"\x01\x01\x00\x00\x3f\x00")
    return b"\xff\xd8" + dqt + sof + dht + sos + scan + b"\xff\xd9"


#: DC chrominance Huffman spec (Annex K)
STD_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)

#: AC chrominance Huffman spec (Annex K)
STD_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def ensure_huffman_tables(data: bytes) -> bytes:
    """The classic MJPG quirk: motion-JPEG frames routinely OMIT the DHT
    segment, implying the Annex K default tables (luma on slot 0, chroma
    on slot 1). If the stream carries no DHT, splice the four standard
    tables in just before SOS; streams with their own tables pass
    through untouched."""
    if data[:2] != b"\xff\xd8":
        return data
    pos, sos_at = 2, None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            return data  # malformed; let the decoder raise
        marker = data[pos + 1]
        if marker == 0xC4:
            return data  # has its own tables
        if marker == 0xDA:
            sos_at = pos
            break
        if marker == 0xD9:
            return data
        pos += 2 + int.from_bytes(data[pos + 2 : pos + 4], "big")
    if sos_at is None:
        return data

    def dht(tc_th: int, spec) -> bytes:
        bits, vals = spec
        body = bytes([tc_th]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + (len(body) + 2).to_bytes(2, "big") + body

    tables = (
        dht(0x00, STD_DC_LUMA)
        + dht(0x10, STD_AC_LUMA)
        + dht(0x01, STD_DC_CHROMA)
        + dht(0x11, STD_AC_CHROMA)
    )
    return data[:sos_at] + tables + data[sos_at:]
