"""Dependency-free baseline JPEG codec (ITU-T T.81, public spec).

``decode_jpeg``: baseline/extended sequential (8- and 12-bit) and
progressive (SOF0/SOF1/SOF2) Huffman JPEGs — DQT (8- and 16-bit
entries)/DHT/SOS/DRI marker parse, Huffman entropy decode (byte-stuffing
+ restart markers), dequant + zigzag, matrix-form 8x8 IDCT (numpy),
chroma box upsampling for subsampled scans, JFIF full-range YCbCr→RGB;
12-bit samples downscale to their high 8 bits (the 16-bit-PNG
convention). Arithmetic-coded and hierarchical processes raise
NotImplementedError (permanent non-goals, COVERAGE.md); malformed
payloads return None.

``encode_jpeg``: the round-trip partner — 4:4:4 (or grayscale) baseline
encoder with the Annex K example quant (quality-scaled, IJG curve) and
Huffman tables. decode(encode(x)) is lossy by design; tests pin the
closed-form cases (solid blocks quantize exactly) and error bounds.

This closes the last compressed-raster stub in operators/multimodal.py —
the reference has no image analog (beyond-reference surface, SURVEY.md
LLM-pipeline section); video codec frames remain out of scope.
"""

from __future__ import annotations

import struct

# zigzag scan order: ZIGZAG[i] = row-major index of the i-th coefficient
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.1/K.2 example quantization tables (row-major)
QT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]
QT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
]

# Annex K.3-K.6 example Huffman tables: (BITS[1..16], HUFFVAL)
DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
AC_LUMA = (
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
AC_CHROMA = (
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


# AC table for the progressive encoder: the Annex K baseline AC tables
# lack the EOBRUN symbols ((r<<4)|0 for r=1..14) progressive scans emit,
# so scans use this full-coverage canonical table instead — every rs
# symbol 0x00..0xFF present (254 codes at 9 bits + 2 at 10; Kraft < 1 so
# the all-ones code stays unassigned). Wasteful but always valid; the
# tables ride in the file's DHT segments, so the decoder needs nothing
# special.
PROG_AC = (
    [0, 0, 0, 0, 0, 0, 0, 0, 254, 2, 0, 0, 0, 0, 0, 0],
    list(range(256)),
)


def _dct_matrix():
    """8x8 DCT-II basis M (orthonormal): forward C = M·(x−128)·Mᵀ,
    inverse x = Mᵀ·C·M + 128."""
    import math

    import numpy as np

    m = np.zeros((8, 8))
    for u in range(8):
        cu = math.sqrt(0.125) if u == 0 else 0.5
        for x in range(8):
            m[u, x] = cu * math.cos((2 * x + 1) * u * math.pi / 16)
    return m


def _canonical_codes(bits: list[int], vals: list[int]):
    """(length, code) → symbol decode map AND symbol → (code, length)
    encode map from a canonical Huffman spec (T.81 Annex C)."""
    dec, enc = {}, {}
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            dec[(ln, code)] = vals[k]
            enc[vals[k]] = (code, ln)
            k += 1
            code += 1
        code <<= 1
    return dec, enc


class _BitReader:
    """MSB-first bit reader over an entropy-coded segment (stuffing
    already removed)."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data, self.pos, self.bit = data, 0, 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise EOFError
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit, self.pos = 0, self.pos + 1
        return b

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _extend(r: int, s: int) -> int:
    """T.81 EXTEND: magnitude-category bits → signed value."""
    if s == 0:
        return 0
    return r if r >= (1 << (s - 1)) else r - (1 << s) + 1


def _decode_huff(reader: _BitReader, table: dict) -> int:
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | reader.read_bit()
        ln += 1
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _entropy_segments(data: bytes, start: int):
    """Split the scan into restart segments with 0xFF00 stuffing removed.
    Returns (segments, end_pos)."""
    segs, cur = [], bytearray()
    pos = len(data)
    i = start
    while i < len(data):
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        nxt = data[i + 1] if i + 1 < len(data) else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:  # restart marker
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # any other marker ends the scan
            pos = i
            break
    segs.append(bytes(cur))
    return segs, pos


def _execute_scan(
    segs, scan_comps, frame, huff_dc, huff_ac, ss, se, ah, al, restart_interval
) -> bool:
    """Decode one entropy-coded scan into the components' zigzag-order
    coefficient arrays. Handles all four T.81 huffman scan types:
    sequential full-band (baseline), progressive DC first/refine
    (interleaved or not), progressive AC first/refine (single-component,
    EOB runs, successive approximation). Restart segments reset DC
    predictors and the EOB run."""
    progressive = frame["progressive"]
    mcus_x, mcus_y = frame["mcus_x"], frame["mcus_y"]

    if len(scan_comps) > 1:
        n_units = mcus_x * mcus_y

        def unit(u):
            my, mx = divmod(u, mcus_x)
            out = []
            for c in scan_comps:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        out.append((c, my * c["v"] + by, mx * c["h"] + bx))
            return out
    else:
        c0 = scan_comps[0]
        n_units = c0["bw2"] * c0["bh2"]

        def unit(u):
            by, bx = divmod(u, c0["bw2"])
            return [(c0, by, bx)]

    if progressive:
        if ss == 0:
            kind = "dc_first" if ah == 0 else "dc_refine"
            if se != 0:
                return False
        else:
            kind = "ac_first" if ah == 0 else "ac_refine"
            if len(scan_comps) != 1:
                return False  # AC scans are single-component per T.81
    else:
        kind = "sequential"
        if ss != 0 or se != 63 or ah != 0 or al != 0:
            return False

    p1, mm1 = 1 << al, -1 << al
    per_seg = restart_interval if restart_interval else n_units
    u = 0
    for seg in segs:
        if u >= n_units:
            break
        reader = _BitReader(seg)
        pred = {c["id"]: 0 for c in scan_comps}
        eobrun = 0
        for _ in range(per_seg):
            if u >= n_units:
                break
            for c, by, bx in unit(u):
                coef = c["coef"][by, bx]
                if kind == "sequential":
                    s = _decode_huff(reader, huff_dc[c["td"]])
                    pred[c["id"]] += _extend(reader.receive(s), s)
                    coef[0] = pred[c["id"]]
                    k = 1
                    while k < 64:
                        rs = _decode_huff(reader, huff_ac[c["ta"]])
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC run past block")
                        coef[k] = _extend(reader.receive(s), s)
                        k += 1
                elif kind == "dc_first":
                    s = _decode_huff(reader, huff_dc[c["td"]])
                    pred[c["id"]] += _extend(reader.receive(s), s)
                    coef[0] = pred[c["id"]] << al
                elif kind == "dc_refine":
                    if reader.read_bit():
                        coef[0] = int(coef[0]) | p1
                elif kind == "ac_first":
                    if eobrun > 0:
                        eobrun -= 1
                        continue
                    k = ss
                    while k <= se:
                        rs = _decode_huff(reader, huff_ac[c["ta"]])
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += reader.receive(r)
                            break
                        k += r
                        if k > se:
                            raise ValueError("AC run past band")
                        coef[k] = _extend(reader.receive(s), s) << al
                        k += 1
                else:  # ac_refine — T.81 G.2 / Annex flow
                    k = ss
                    if eobrun == 0:
                        while k <= se:
                            rs = _decode_huff(reader, huff_ac[c["ta"]])
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r < 15:
                                    # TOTAL run incl. the current block —
                                    # its correction-bit pass below still
                                    # runs, then decrements
                                    eobrun = 1 << r
                                    if r:
                                        eobrun += reader.receive(r)
                                    break
                                val = 0  # ZRL: 16 zero-history skips
                            else:
                                if s != 1:
                                    raise ValueError("bad refine size")
                                val = p1 if reader.read_bit() else mm1
                            while k <= se:
                                if coef[k] != 0:
                                    if reader.read_bit() and not (coef[k] & p1):
                                        coef[k] += p1 if coef[k] >= 0 else mm1
                                else:
                                    if r == 0:
                                        break
                                    r -= 1
                                k += 1
                            if s and k <= se:
                                coef[k] = val
                            k += 1
                    if eobrun > 0:
                        while k <= se:
                            if coef[k] != 0:
                                if reader.read_bit() and not (coef[k] & p1):
                                    coef[k] += p1 if coef[k] >= 0 else mm1
                            k += 1
                        eobrun -= 1
            u += 1
    return u >= n_units


def decode_jpeg(data: bytes):
    """8-bit huffman JPEG → HxWx3 (or HxWx1 grayscale) uint8 numpy array
    — BOTH baseline sequential (SOF0/1) and progressive (SOF2: spectral
    selection + successive approximation, DC/AC first and refinement
    scans, EOB runs). None for non-JPEG/malformed; NotImplementedError
    for arithmetic-coded / hierarchical / 12-bit variants."""
    import numpy as np

    if len(data) < 4 or data[:2] != b"\xff\xd8":
        return None
    qt: dict[int, "np.ndarray"] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    pos = 2
    any_scan = False
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            return None
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seg_len,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4 : pos + 2 + seg_len]
        if marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "non-huffman/hierarchical JPEG process not implemented"
                " (baseline + huffman progressive only)"
            )
        if marker in (0xC0, 0xC1, 0xC2):
            precision, h, w, ncomp = body[0], *struct.unpack_from(">HH", body, 1), body[5]
            # T.81: baseline (C0) is 8-bit only; extended sequential (C1)
            # and progressive (C2) also allow 12-bit samples
            if not (precision == 8 or (precision == 12 and marker in (0xC1, 0xC2))):
                raise NotImplementedError(
                    f"JPEG sample precision {precision} not implemented"
                    " (8-bit, or 12-bit extended/progressive)"
                )
            comps = []
            for i in range(ncomp):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps, "progressive": marker == 0xC2,
                     "precision": precision}
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            if not (1 <= hmax <= 4 and 1 <= vmax <= 4):
                return None
            mcus_x = -(-w // (8 * hmax))
            mcus_y = -(-h // (8 * vmax))
            for c in comps:
                c["bw"] = mcus_x * c["h"]  # MCU-padded block grid
                c["bh"] = mcus_y * c["v"]
                # non-interleaved (single-component scan) block grid:
                # ceil(ceil(w·h_i/hmax) / 8)
                c["bw2"] = -(-(-(-(w * c["h"]) // hmax)) // 8)
                c["bh2"] = -(-(-(-(h * c["v"]) // vmax)) // 8)
                c["coef"] = np.zeros((c["bh"], c["bw"], 64), dtype=np.int32)
            frame.update(hmax=hmax, vmax=vmax, mcus_x=mcus_x, mcus_y=mcus_y)
        elif marker == 0xDB:
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 15
                if pq not in (0, 1):
                    return None
                tbl = np.zeros(64)
                # pq=0: 8-bit entries; pq=1: 16-bit big-endian entries
                # (the precision 12-bit streams typically use)
                for i in range(64):
                    tbl[ZIGZAG[i]] = (
                        struct.unpack_from(">H", body, p + 1 + 2 * i)[0]
                        if pq
                        else body[p + 1 + i]
                    )
                qt[tq] = tbl.reshape(8, 8)
                p += 129 if pq else 65
        elif marker == 0xC4:
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 15
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                vals = list(body[p + 17 : p + 17 + n])
                dec, _ = _canonical_codes(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = dec
                p += 17 + n
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:
            if frame is None:
                return None
            ns = body[0]
            by_id = {c["id"]: c for c in frame["comps"]}
            scan_comps = []
            for i in range(ns):
                cs, tdta = body[1 + 2 * i], body[2 + 2 * i]
                if cs not in by_id:
                    return None
                c = by_id[cs]
                c["td"], c["ta"] = tdta >> 4, tdta & 15
                scan_comps.append(c)
            ss, se, ahal = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 15
            segs, end = _entropy_segments(data, pos + 2 + seg_len)
            try:
                ok = _execute_scan(
                    segs, scan_comps, frame, huff_dc, huff_ac,
                    ss, se, ah, al, restart_interval,
                )
            except (EOFError, ValueError, KeyError):
                return None
            if not ok:
                return None
            any_scan = True
            pos = end
            continue
        pos += 2 + seg_len
    if frame is None or not any_scan or not qt:
        return None

    comps = frame["comps"]
    w, h, hmax, vmax = frame["w"], frame["h"], frame["hmax"], frame["vmax"]
    # level shift / clamp scale with sample precision (T.81 A.3.1): the
    # 12-bit range is 0..4095 centered on 2048; output downscales to the
    # high 8 bits (same convention as the 16-bit PNG path)
    prec = frame.get("precision", 8)
    half, full = float(1 << (prec - 1)), float((1 << prec) - 1)
    m = _dct_matrix()
    planes = []
    for c in comps:
        if c["tq"] not in qt:
            return None
        # de-zigzag + dequant + IDCT, all blocks vectorized
        nat = np.zeros_like(c["coef"], dtype=np.float64)
        nat[:, :, ZIGZAG] = c["coef"]
        blocks = nat.reshape(c["bh"], c["bw"], 8, 8) * qt[c["tq"]]
        px = np.einsum("ij,xyjk,kl->xyil", m.T, blocks, m) + half
        p = px.transpose(0, 2, 1, 3).reshape(c["bh"] * 8, c["bw"] * 8)
        if c["h"] < hmax or c["v"] < vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        planes.append(p[:h, :w])
    if len(planes) == 1:
        out = planes[0][:, :, None]
    elif len(planes) == 3:
        y, cb, cr = planes
        out = np.stack(
            [
                y + 1.402 * (cr - half),
                y - 0.344136 * (cb - half) - 0.714136 * (cr - half),
                y + 1.772 * (cb - half),
            ],
            axis=2,
        )
    else:
        return None
    clipped = np.clip(np.round(out), 0, full).astype(np.int64)
    if prec > 8:
        clipped >>= prec - 8
    return clipped.astype(np.uint8)


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out, self.acc, self.nbits = bytearray(), 0, 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            b = (self.acc << (8 - self.nbits)) | ((1 << (8 - self.nbits)) - 1)
            self.out.append(b & 0xFF)
            if (b & 0xFF) == 0xFF:
                self.out.append(0x00)
            self.acc = self.nbits = 0


def _encode_progressive_file(
    planes, nch, w, h, q0, q1, qts, hts, qtabs, m, enc_dc, enc_ac
) -> bytes:
    """Assemble the SOF2 stream: quantize all coefficients once, then
    emit the scan script (see encode_jpeg docstring)."""
    import numpy as np

    bw, bh = -(-w // 8), -(-h // 8)
    coefs = []
    for ci, plane in enumerate(planes):
        arr = np.zeros((bh, bw, 64), dtype=np.int64)
        for my in range(bh):
            for mx in range(bw):
                block = _get_block(plane, my * 8, mx * 8)
                qc = np.round(
                    (m @ (block - 128.0) @ m.T) / qtabs[qts[ci]]
                ).astype(np.int64)
                arr[my, mx] = qc.reshape(64)[ZIGZAG]
        coefs.append(arr)
    al = 1

    def dc_first() -> bytes:
        wtr = _BitWriter()
        pred = [0] * nch
        for u in range(bh * bw):
            my, mx = divmod(u, bw)
            for ci in range(nch):
                v = int(coefs[ci][my, mx, 0]) >> al
                diff = v - pred[ci]
                pred[ci] = v
                s = _category(diff)
                c, ln = enc_dc[hts[ci][0]][s]
                wtr.write(c, ln)
                if s:
                    wtr.write(diff if diff > 0 else diff + (1 << s) - 1, s)
        wtr.flush()
        return bytes(wtr.out)

    def dc_refine() -> bytes:
        wtr = _BitWriter()
        for u in range(bh * bw):
            my, mx = divmod(u, bw)
            for ci in range(nch):
                wtr.write(int(coefs[ci][my, mx, 0]) & 1, 1)
        wtr.flush()
        return bytes(wtr.out)

    _, prog_ac = _canonical_codes(*PROG_AC)

    def ac_scan(ci: int, refine: bool) -> bytes:
        wtr = _BitWriter()
        bands = (coefs[ci][u // bw, u % bw] for u in range(bh * bw))
        if refine:
            _emit_ac_refine(wtr, bands, prog_ac, 1, 63, 0)
        else:
            _emit_ac_first(wtr, bands, prog_ac, 1, 63, al)
        wtr.flush()
        return bytes(wtr.out)

    # scan script: (component list or None=all interleaved, Ss, Se, Ah, Al, data)
    scans = [(None, 0, 0, 0, al, dc_first())]
    for ci in range(nch):
        scans.append(([ci], 1, 63, 0, al, ac_scan(ci, refine=False)))
    scans.append((None, 0, 0, al, 0, dc_refine()))
    for ci in range(nch):
        scans.append(([ci], 1, 63, al, 0, ac_scan(ci, refine=True)))

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tq, q in ((0, q0), (1, q1))[: (2 if nch == 3 else 1)]:
        out += seg(0xDB, bytes([tq]) + bytes(int(q[ZIGZAG[i]]) for i in range(64)))
    sof = struct.pack(">BHHB", 8, h, w, nch)
    for i in range(nch):
        sof += bytes([i + 1, 0x11, qts[i]])
    out += seg(0xC2, sof)
    tables = [(0x00, DC_LUMA), (0x10, PROG_AC)]
    if nch == 3:
        tables += [(0x01, DC_CHROMA), (0x11, PROG_AC)]
    for tclass, (bits, vals) in tables:
        out += seg(0xC4, bytes([tclass]) + bytes(bits) + bytes(vals))
    for comp_list, ss, se, ah, al_s, payload in scans:
        ids = list(range(nch)) if comp_list is None else comp_list
        sos = bytes([len(ids)])
        for i in ids:
            td, ta = hts[i]
            sos += bytes([i + 1, (td << 4) | ta])
        sos += bytes([ss, se, (ah << 4) | al_s])
        out += seg(0xDA, sos)
        out += payload
    out += b"\xff\xd9"
    return bytes(out)


def _quality_scale(qtbl: list[int], quality: int):
    """IJG quality curve: 50 → table as-is, 100 → all ones."""
    import numpy as np

    quality = min(max(quality, 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = np.clip((np.asarray(qtbl) * s + 50) // 100, 1, 255).astype(np.int64)
    return t


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _emit_ac_first(wtr, band_iter, table, ss: int, se: int, al: int) -> None:
    """Progressive AC first-scan emitter (T.81 G.1.2.2): per-band RLE of
    the 2^-Al-truncated coefficients with accumulated EOB runs."""
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            c, ln = table[r << 4]
            wtr.write(c, ln)
            if r:
                wtr.write(eobrun - (1 << r), r)
            eobrun = 0

    for band in band_iter:
        vals = [
            (abs(int(v)) >> al) * (1 if v >= 0 else -1) for v in band[ss : se + 1]
        ]
        last = -1
        for i in range(len(vals) - 1, -1, -1):
            if vals[i]:
                last = i
                break
        if last < 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
            continue
        flush_eob()
        r = 0
        for i in range(last + 1):
            t = vals[i]
            if t == 0:
                r += 1
                continue
            while r > 15:
                c, ln = table[0xF0]
                wtr.write(c, ln)
                r -= 16
            s = _category(t)
            c, ln = table[(r << 4) | s]
            wtr.write(c, ln)
            wtr.write(t if t > 0 else t + (1 << s) - 1, s)
            r = 0
        if ss + last < se:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def _emit_ac_refine(wtr, band_iter, table, ss: int, se: int, al: int) -> None:
    """Progressive AC refinement emitter (T.81 G.1.2.3, the libjpeg
    encode_mcu_AC_refine flow): newly-nonzero coefficients (|v|>>Al == 1)
    are coded with runs counted over zero-HISTORY positions; already-
    nonzero coefficients contribute correction bits, buffered so they
    ride after the next coefficient/ZRL/EOBRUN symbol."""
    eobrun = 0
    be_bits: list[int] = []  # correction bits owned by the pending EOB run
    br_bits: list[int] = []  # correction bits of the CURRENT block so far

    def flush_eob():
        # the EOB-run symbol carries the run blocks' correction bits;
        # the current block's bits (br_bits) ride after ITS next symbol
        nonlocal eobrun, be_bits
        if eobrun:
            r = eobrun.bit_length() - 1
            c, ln = table[r << 4]
            wtr.write(c, ln)
            if r:
                wtr.write(eobrun - (1 << r), r)
            eobrun = 0
            for b in be_bits:
                wtr.write(b, 1)
            be_bits = []

    def flush_br():
        nonlocal br_bits
        for b in br_bits:
            wtr.write(b, 1)
        br_bits = []

    for band in band_iter:
        vals = [int(v) for v in band[ss : se + 1]]
        absv = [abs(v) >> al for v in vals]
        eobpos = -1
        for i, t in enumerate(absv):
            if t == 1:
                eobpos = i
        r = 0
        for i, t in enumerate(absv):
            if t == 0:
                r += 1
                continue
            while r > 15 and i <= eobpos:
                flush_eob()
                c, ln = table[0xF0]
                wtr.write(c, ln)
                r -= 16
                flush_br()
            if t > 1:
                br_bits.append(t & 1)  # correction bit for nonzero history
                continue
            flush_eob()
            c, ln = table[(r << 4) | 1]
            wtr.write(c, ln)
            wtr.write(0 if vals[i] < 0 else 1, 1)
            flush_br()
            r = 0
        if r > 0 or br_bits:
            eobrun += 1
            be_bits += br_bits
            br_bits = []
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def _get_block(plane, y0: int, x0: int):
    """8x8 block at (y0, x0) with edge-replicate padding past the plane."""
    import numpy as np

    ph, pw = plane.shape
    ys = np.clip(np.arange(y0, y0 + 8), 0, ph - 1)
    xs = np.clip(np.arange(x0, x0 + 8), 0, pw - 1)
    return plane[np.ix_(ys, xs)]


def encode_jpeg(
    arr,
    quality: int = 90,
    restart_interval: int = 0,
    subsampling: str = "444",
    progressive: bool = False,
) -> bytes:
    """HxWx{1,3} uint8 array → JFIF JPEG bytes (Annex K tables at the
    given IJG quality; optional DRI/RSTn restart markers every
    ``restart_interval`` MCUs; ``subsampling`` '444' or '420' — 4:2:0 box-
    averages chroma 2x2 and interleaves 4 luma + 1 Cb + 1 Cr blocks per
    MCU, the common real-world layout, exercising the decoder's MCU
    interleave + upsampling path). ``progressive=True`` writes an SOF2
    stream with the standard scan script — DC first (Al=1, interleaved),
    per-component AC 1..63 first (Al=1), DC refine, per-component AC
    refine — exercising every progressive scan type in
    :func:`decode_jpeg`; 4:4:4/grayscale only, no restart markers. The
    round-trip partner of :func:`decode_jpeg` — lossy; solid 8x8-aligned
    blocks survive exactly when their quantized DC is exact (pinned in
    tests); progressive and baseline decode to IDENTICAL pixels (same
    coefficients, different transmission order)."""
    import numpy as np

    a = np.asarray(arr, dtype=np.float64)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, nch = a.shape
    if nch == 3:
        r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
        qts = [0, 1, 1]
        hts = [(0, 0), (1, 1), (1, 1)]
    elif nch == 1:
        planes = [a[:, :, 0]]
        qts = [0]
        hts = [(0, 0)]
    else:
        raise ValueError("encode_jpeg expects HxWx1 or HxWx3")

    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    if subsampling == "420" and nch == 3:
        samp = [(2, 2), (1, 1), (1, 1)]
        for ci in (1, 2):
            p = planes[ci]
            if p.shape[0] % 2:
                p = np.vstack([p, p[-1:]])
            if p.shape[1] % 2:
                p = np.hstack([p, p[:, -1:]])
            planes[ci] = (
                p[0::2, 0::2] + p[1::2, 0::2] + p[0::2, 1::2] + p[1::2, 1::2]
            ) / 4.0
    else:
        samp = [(1, 1)] * nch

    q0 = _quality_scale(QT_LUMA, quality)
    q1 = _quality_scale(QT_CHROMA, quality)
    qtabs = [q0.reshape(8, 8), q1.reshape(8, 8)]
    m = _dct_matrix()
    dec_dc0, enc_dc0 = _canonical_codes(*DC_LUMA)
    dec_ac0, enc_ac0 = _canonical_codes(*AC_LUMA)
    dec_dc1, enc_dc1 = _canonical_codes(*DC_CHROMA)
    dec_ac1, enc_ac1 = _canonical_codes(*AC_CHROMA)
    enc_dc = [enc_dc0, enc_dc1]
    enc_ac = [enc_ac0, enc_ac1]

    if progressive:
        if samp != [(1, 1)] * nch:
            raise ValueError(
                "progressive encoder supports 4:4:4 / grayscale only"
            )
        return _encode_progressive_file(
            planes, nch, w, h, q0, q1, qts, hts, qtabs, m, enc_dc, enc_ac
        )

    hmax = max(hi for hi, _ in samp)
    vmax = max(vi for _, vi in samp)
    mcus_x, mcus_y = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    writer = _BitWriter()
    pred = [0] * len(planes)

    def encode_block(block, ci: int) -> None:
        coef = m @ (block - 128.0) @ m.T
        qc = np.round(coef / qtabs[qts[ci]]).astype(np.int64)
        zz = [int(qc.flat[ZIGZAG[i]]) for i in range(64)]
        diff = zz[0] - pred[ci]
        pred[ci] = zz[0]
        s = _category(diff)
        code, ln = enc_dc[hts[ci][0]][s]
        writer.write(code, ln)
        if s:
            writer.write(diff if diff > 0 else diff + (1 << s) - 1, s)
        run = 0
        last_nz = 0
        for k in range(63, 0, -1):
            if zz[k]:
                last_nz = k
                break
        for k in range(1, last_nz + 1):
            v = zz[k]
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = enc_ac[hts[ci][1]][0xF0]
                writer.write(code, ln)
                run -= 16
            s = _category(v)
            code, ln = enc_ac[hts[ci][1]][(run << 4) | s]
            writer.write(code, ln)
            writer.write(v if v > 0 else v + (1 << s) - 1, s)
            run = 0
        if last_nz < 63:
            code, ln = enc_ac[hts[ci][1]][0x00]
            writer.write(code, ln)

    mcu_n = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_n and mcu_n % restart_interval == 0:
                writer.flush()
                writer.out += bytes(
                    [0xFF, 0xD0 + (mcu_n // restart_interval - 1) % 8]
                )
                pred = [0] * len(planes)
            mcu_n += 1
            for ci, plane in enumerate(planes):
                hi, vi = samp[ci]
                for by in range(vi):
                    for bx in range(hi):
                        encode_block(
                            _get_block(
                                plane, (my * vi + by) * 8, (mx * hi + bx) * 8
                            ),
                            ci,
                        )
    writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tq, q in ((0, q0), (1, q1))[: (2 if nch == 3 else 1)]:
        # entry i of the DQT segment is coefficient i of the zigzag scan,
        # i.e. q[ZIGZAG[i]] of the row-major table
        zz = bytes(int(q[ZIGZAG[i]]) for i in range(64))
        out += seg(0xDB, bytes([tq]) + zz)
    sof = struct.pack(">BHHB", 8, h, w, nch)
    for i in range(nch):
        hi, vi = samp[i]
        sof += bytes([i + 1, (hi << 4) | vi, qts[i]])
    out += seg(0xC0, sof)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    tables = [(0x00, DC_LUMA), (0x10, AC_LUMA)]
    if nch == 3:
        tables += [(0x01, DC_CHROMA), (0x11, AC_CHROMA)]
    for tclass, (bits, vals) in tables:
        out += seg(0xC4, bytes([tclass]) + bytes(bits) + bytes(vals))
    sos = bytes([nch])
    for i in range(nch):
        td, ta = hts[i]
        sos += bytes([i + 1, (td << 4) | ta])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)


# 12-bit Huffman tables: the Annex K examples only cover 8-bit magnitude
# categories, so the 12-bit encoder ships flat canonical tables that
# cover the full T.81 12-bit alphabet — DC SSSS 0..15 (16 codes at 5
# bits) and AC rs for runs 0..15 × sizes 1..14 plus EOB/ZRL (226 codes
# at 8 bits; Kraft < 1, all-ones code unassigned). Wasteful but always
# valid; they ride in the file's DHT segments.
DC12 = ([0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0], list(range(16)))
AC12 = (
    [0, 0, 0, 0, 0, 0, 0, 226, 0, 0, 0, 0, 0, 0, 0, 0],
    [0x00, 0xF0] + [(r << 4) | sz for r in range(16) for sz in range(1, 15)],
)


def encode_jpeg12(arr, quality: int = 90) -> bytes:
    """HxWx{1,3} uint16 array (samples 0..4095) → 12-bit EXTENDED
    SEQUENTIAL JPEG bytes (SOF1): the high-dynamic-range variant medical
    and scientific imagery uses. Same DCT/Huffman machinery as
    :func:`encode_jpeg` with the 12-bit parameters — level shift 2048,
    quant tables written as 16-bit DQT entries (pq=1), and the
    full-alphabet 12-bit Huffman tables above — so the round trip
    exercises the decoder's precision-12 and 16-bit-DQT paths. 4:4:4 /
    grayscale, no restart markers. decode(encode12(x)) returns uint8
    (the decoder's high-8-bits convention)."""
    import numpy as np

    a = np.asarray(arr, dtype=np.float64)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.min() < 0 or a.max() > 4095:
        raise ValueError("encode_jpeg12 expects samples in 0..4095")
    h, w, nch = a.shape
    if nch == 3:
        r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 2048.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 2048.0,
        ]
        qts = [0, 1, 1]
    elif nch == 1:
        planes = [a[:, :, 0]]
        qts = [0]
    else:
        raise ValueError("encode_jpeg12 expects HxWx1 or HxWx3")

    # Annex K tables quality-scaled then ×16 so quantization error stays
    # proportionally the same as the 8-bit encoder's (samples are 16×);
    # entries can exceed 255 → written as pq=1 (16-bit) DQT
    q0 = _quality_scale(QT_LUMA, quality) * 16
    q1 = _quality_scale(QT_CHROMA, quality) * 16
    qtabs = [q0.reshape(8, 8), q1.reshape(8, 8)]
    m = _dct_matrix()
    enc_dc = _canonical_codes(*DC12)[1]
    enc_ac = _canonical_codes(*AC12)[1]

    mcus_x, mcus_y = -(-w // 8), -(-h // 8)
    writer = _BitWriter()
    pred = [0] * len(planes)

    def encode_block(block, ci: int) -> None:
        coef = m @ (block - 2048.0) @ m.T
        qc = np.round(coef / qtabs[qts[ci]]).astype(np.int64)
        zz = [int(qc.flat[ZIGZAG[i]]) for i in range(64)]
        diff = zz[0] - pred[ci]
        pred[ci] = zz[0]
        s = _category(diff)
        code, ln = enc_dc[s]
        writer.write(code, ln)
        if s:
            writer.write(diff if diff > 0 else diff + (1 << s) - 1, s)
        run = 0
        last_nz = 0
        for k in range(63, 0, -1):
            if zz[k]:
                last_nz = k
                break
        for k in range(1, last_nz + 1):
            v = zz[k]
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = enc_ac[0xF0]
                writer.write(code, ln)
                run -= 16
            s = _category(v)
            code, ln = enc_ac[(run << 4) | s]
            writer.write(code, ln)
            writer.write(v if v > 0 else v + (1 << s) - 1, s)
            run = 0
        if last_nz < 63:
            code, ln = enc_ac[0x00]
            writer.write(code, ln)

    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, plane in enumerate(planes):
                encode_block(_get_block(plane, my * 8, mx * 8), ci)
    writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    for tq, q in ((0, q0), (1, q1))[: (2 if nch == 3 else 1)]:
        zz16 = b"".join(
            struct.pack(">H", int(q[ZIGZAG[i]])) for i in range(64)
        )
        out += seg(0xDB, bytes([0x10 | tq]) + zz16)
    sof = struct.pack(">BHHB", 12, h, w, nch)
    for i in range(nch):
        sof += bytes([i + 1, 0x11, qts[i]])
    out += seg(0xC1, sof)
    for tclass, (bits, vals) in ((0x00, DC12), (0x10, AC12)):
        out += seg(0xC4, bytes([tclass]) + bytes(bits) + bytes(vals))
    sos = bytes([nch])
    for i in range(nch):
        sos += bytes([i + 1, 0x00])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)
