"""Dependency-free audio codecs for multimodal columns: G.711 µ-law and
A-law companding (ITU-T G.711, the classic public-domain Sun ``g711.c``
integer formulation) and IMA/DVI ADPCM (the public IMA algorithm with the
WAV format-0x11 block layout). Everything en/decodes to int16 PCM numpy
arrays; ``encode_wav`` writes RIFF/WAVE payloads in any of the four
formats so synthetic corpora can exercise every decode path.

G.711 closed forms (what makes the gate oracles possible): for a
non-negative 16-bit sample x,

* µ-law: p = x >> 2 (14-bit); m = min(p, 8158) + 33; e = floor(log2 m)-5;
  mantissa = (m >> (e+1)) & 15; decoded = (((mantissa<<3)+132) << e) - 132
* A-law: p = x >> 3 (13-bit); seg = first s with p <= [31,63,127,255,511,
  1023,2047,4095][s]; mantissa = (p >> (seg==0 ? 1 : seg)) & 15; decoded
  back through t = (mantissa<<4) + (seg==0 ? 8 : 0x108) << max(seg-1, 0)

— all integer shifts/compares, replicated term-for-term in DuckDB SQL by
the q104/q105 oracles. Both implementations are verified bit-exact
against CPython's ``audioop`` over the full 16-bit range in tests.
"""

from __future__ import annotations

import struct

import numpy as np

_ULAW_BIAS = 132
_ULAW_CLIP = 32635


def ulaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 PCM → µ-law bytes (uint8), vectorized. The 14-bit-domain
    formulation (pcm >> 2 with ARITHMETIC shift, bias 33, clip 8158) —
    bit-exact with CPython audioop / the ITU reference, including the
    floor-toward-−∞ magnitude of negative samples."""
    p = samples.astype(np.int32) >> 2  # arithmetic shift: floor division
    sign = np.where(p < 0, 0x80, 0)
    m = np.minimum(np.abs(p), 8158) + 33
    # e = floor(log2(m)) - 5; frexp exponent is floor(log2)+1, exact for ints
    e = np.frexp(m.astype(np.float64))[1] - 6
    mant = (m >> (e + 1).astype(np.int32)) & 0x0F
    return (~(sign | (e << 4) | mant) & 0xFF).astype(np.uint8)


def ulaw_decode(codes: np.ndarray) -> np.ndarray:
    """µ-law bytes → int16 PCM, vectorized."""
    u = (~codes.astype(np.int32)) & 0xFF
    e = (u >> 4) & 7
    mant = u & 0x0F
    t = (((mant << 3) + _ULAW_BIAS) << e) - _ULAW_BIAS
    return np.where(u & 0x80, -t, t).astype(np.int16)


_ALAW_SEG_END = np.array([0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF])


def alaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 PCM → A-law bytes (uint8), vectorized."""
    x = samples.astype(np.int32)
    mask = np.where(x >= 0, 0xD5, 0x55)
    p = np.where(x >= 0, x, -x - 1) >> 3  # 13-bit magnitude
    seg = np.searchsorted(_ALAW_SEG_END, p, side="left").astype(np.int32)
    shift = np.where(seg == 0, 1, seg)
    aval = np.where(
        seg >= 8, 0x7F, (np.minimum(seg, 7) << 4) | ((p >> shift) & 0x0F)
    )
    return ((aval ^ mask) & 0xFF).astype(np.uint8)


def alaw_decode(codes: np.ndarray) -> np.ndarray:
    """A-law bytes → int16 PCM, vectorized."""
    a = codes.astype(np.int32) ^ 0x55
    seg = (a & 0x70) >> 4
    t = (a & 0x0F) << 4
    t = np.where(seg == 0, t + 8, (t + 0x108) << np.maximum(seg - 1, 0))
    return np.where(a & 0x80, t, -t).astype(np.int16)


# ------------------------------------------------------------ IMA ADPCM --

_IMA_INDEX_ADJUST = [-1, -1, -1, -1, 2, 4, 6, 8]

_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 158, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]


def _ima_step(code: int, predictor: int, index: int) -> tuple[int, int]:
    """One IMA ADPCM decode step: (new_predictor, new_index)."""
    step = _IMA_STEPS[index]
    diff = step >> 3
    if code & 1:
        diff += step >> 2
    if code & 2:
        diff += step >> 1
    if code & 4:
        diff += step
    if code & 8:
        predictor -= diff
    else:
        predictor += diff
    predictor = max(-32768, min(32767, predictor))
    index = max(0, min(88, index + _IMA_INDEX_ADJUST[code & 7]))
    return predictor, index


def adpcm_ima_encode(samples: np.ndarray, block_samples: int = 505) -> bytes:
    """int16 PCM mono → IMA ADPCM WAV blocks (format 0x11 layout: 4-byte
    block header [predictor i16, step index u8, 0] holding the first
    sample verbatim, then 2 samples/byte low-nibble-first). The encoder
    is the standard closed-loop quantizer: each nibble is chosen against
    the decoder's own reconstruction, so error never accumulates past one
    step."""
    out = bytearray()
    index = 0
    n = len(samples)
    for b0 in range(0, n, block_samples):
        block = samples[b0 : b0 + block_samples]
        predictor = int(block[0])
        out += struct.pack("<hBB", predictor, index, 0)
        nibbles = []
        for s in block[1:]:
            target = int(s)
            step = _IMA_STEPS[index]
            diff = target - predictor
            code = 0
            if diff < 0:
                code = 8
                diff = -diff
            if diff >= step:
                code |= 4
                diff -= step
            if diff >= step >> 1:
                code |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                code |= 1
            predictor, index = _ima_step(code, predictor, index)
            nibbles.append(code)
        if len(nibbles) % 2:
            nibbles.append(0)
        for lo, hi in zip(nibbles[::2], nibbles[1::2]):
            out.append(lo | (hi << 4))
    return bytes(out)


def adpcm_ima_decode(data: bytes, block_samples: int = 505) -> np.ndarray:
    """IMA ADPCM WAV blocks → int16 PCM mono."""
    out: list[int] = []
    pos = 0
    bytes_per_block = 4 + (block_samples - 1 + 1) // 2
    while pos + 4 <= len(data):
        predictor, index, _ = struct.unpack_from("<hBB", data, pos)
        index = max(0, min(88, index))
        out.append(predictor)
        body = data[pos + 4 : pos + bytes_per_block]
        produced = 1
        for byte in body:
            for code in (byte & 0x0F, byte >> 4):
                if produced >= block_samples:
                    break
                predictor, index = _ima_step(code, predictor, index)
                out.append(predictor)
                produced += 1
        pos += bytes_per_block
    return np.array(out, dtype=np.int16)


# ------------------------------------------------------------ WAV writer --

WAVE_PCM, WAVE_ALAW, WAVE_MULAW, WAVE_IMA_ADPCM = 1, 6, 7, 0x11


def encode_wav(
    samples: np.ndarray,
    sample_rate: int = 8000,
    codec: int = WAVE_PCM,
    block_samples: int = 505,
) -> bytes:
    """int16 PCM mono → RIFF/WAVE payload in PCM (1), A-law (6), µ-law
    (7), or IMA ADPCM (0x11) format — the synthesis twin of
    ``multimodal.parse_wav``'s decode surface."""
    n = len(samples)
    if codec == WAVE_PCM:
        body = samples.astype("<i2").tobytes()
        bits, block_align, extra = 16, 2, b""
        byte_rate = sample_rate * 2
    elif codec == WAVE_MULAW:
        body = ulaw_encode(samples).tobytes()
        bits, block_align, extra = 8, 1, struct.pack("<H", 0)
        byte_rate = sample_rate
    elif codec == WAVE_ALAW:
        body = alaw_encode(samples).tobytes()
        bits, block_align, extra = 8, 1, struct.pack("<H", 0)
        byte_rate = sample_rate
    elif codec == WAVE_IMA_ADPCM:
        body = adpcm_ima_encode(samples, block_samples)
        bits = 4
        block_align = 4 + (block_samples - 1 + 1) // 2
        extra = struct.pack("<HH", 2, block_samples)  # cbSize, samples/block
        byte_rate = (sample_rate * block_align + block_samples - 1) // block_samples
    else:
        raise ValueError(f"unsupported WAV codec {codec:#x}")
    fmt = struct.pack("<HHIIHH", codec, 1, sample_rate, byte_rate, block_align, bits) + extra
    chunks = b""
    for cid, payload in ((b"fmt ", fmt), (b"fact", struct.pack("<I", n)), (b"data", body)):
        if cid == b"fact" and codec == WAVE_PCM:
            continue
        chunks += cid + struct.pack("<I", len(payload)) + payload
        if len(payload) % 2:
            chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


# ------------------------------------------------------- segmentation --


def silence_segments(
    samples: "np.ndarray",
    sample_rate: int,
    frame_ms: int = 10,
    threshold: float = 0.01,
) -> list[tuple[int, int, bool]]:
    """Energy-gated speech/silence segmentation of one int16 PCM signal:
    split into ``frame_ms`` frames, mark each frame active when its RMS
    (full-scale-normalized) exceeds ``threshold``, then merge consecutive
    same-state frames. Returns [(start_ms, end_ms, active)] with
    half-open [start, end) millisecond bounds."""
    frame_len = max(sample_rate * frame_ms // 1000, 1)
    n_frames = len(samples) // frame_len
    if n_frames == 0:
        return []
    x = samples[: n_frames * frame_len].astype(np.float64) / 32768.0
    rms = np.sqrt((x.reshape(n_frames, frame_len) ** 2).mean(axis=1))
    active = rms > threshold
    segs: list[tuple[int, int, bool]] = []
    start = 0
    for f in range(1, n_frames + 1):
        if f == n_frames or active[f] != active[start]:
            segs.append((start * frame_ms, f * frame_ms, bool(active[start])))
            start = f
    return segs
