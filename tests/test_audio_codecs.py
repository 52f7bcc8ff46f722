"""G.711 µ-law / A-law and IMA ADPCM codecs: bit-exactness against
CPython's audioop over the FULL 16-bit range, roundtrip properties, WAV
container round-trips through parse_wav, and the Spark feature path."""

from __future__ import annotations

import numpy as np
import pytest

from hfsa_spark.operators.audio import (
    WAVE_ALAW,
    WAVE_IMA_ADPCM,
    WAVE_MULAW,
    WAVE_PCM,
    adpcm_ima_decode,
    adpcm_ima_encode,
    alaw_decode,
    alaw_encode,
    encode_wav,
    ulaw_decode,
    ulaw_encode,
)
from hfsa_spark.operators.multimodal import parse_wav

audioop = pytest.importorskip("audioop")  # stdlib through 3.12

ALL16 = np.arange(-32768, 32768, dtype=np.int16)


def test_ulaw_encode_bit_exact_vs_audioop():
    ref = np.frombuffer(audioop.lin2ulaw(ALL16.astype("<i2").tobytes(), 2), dtype=np.uint8)
    assert np.array_equal(ulaw_encode(ALL16), ref)


def test_ulaw_decode_bit_exact_vs_audioop():
    codes = np.arange(256, dtype=np.uint8)
    ref = np.frombuffer(audioop.ulaw2lin(codes.tobytes(), 2), dtype="<i2")
    assert np.array_equal(ulaw_decode(codes), ref)


def test_alaw_encode_bit_exact_vs_audioop():
    ref = np.frombuffer(audioop.lin2alaw(ALL16.astype("<i2").tobytes(), 2), dtype=np.uint8)
    assert np.array_equal(alaw_encode(ALL16), ref)


def test_alaw_decode_bit_exact_vs_audioop():
    codes = np.arange(256, dtype=np.uint8)
    ref = np.frombuffer(audioop.alaw2lin(codes.tobytes(), 2), dtype="<i2")
    assert np.array_equal(alaw_decode(codes), ref)


def test_g711_roundtrip_idempotent():
    # decode∘encode is identity on the codec's output lattice
    for enc, dec in ((ulaw_encode, ulaw_decode), (alaw_encode, alaw_decode)):
        lattice = dec(np.arange(256, dtype=np.uint8))
        assert np.array_equal(dec(enc(lattice)), lattice)


def test_adpcm_roundtrip_snr():
    t = np.arange(4000)
    sig = (10000 * np.sin(2 * np.pi * 440 * t / 8000)).astype(np.int16)
    dec = adpcm_ima_decode(adpcm_ima_encode(sig))[: len(sig)]
    err = dec.astype(float) - sig.astype(float)
    snr = 10 * np.log10((sig.astype(float) ** 2).mean() / (err**2).mean())
    assert snr > 20  # standard IMA quality on a mid-level sine


def test_adpcm_block_boundaries_reset_header():
    # 3 blocks: first sample of each block must decode exactly (it is
    # carried verbatim in the block header)
    sig = (np.linspace(-30000, 30000, 1200)).astype(np.int16)
    dec = adpcm_ima_decode(adpcm_ima_encode(sig, block_samples=505), block_samples=505)
    for b0 in (0, 505, 1010):
        assert dec[b0] == sig[b0]


@pytest.mark.parametrize("codec", [WAVE_PCM, WAVE_MULAW, WAVE_ALAW, WAVE_IMA_ADPCM])
def test_wav_roundtrip_all_codecs(codec):
    amp = 1234
    sig = np.full(800, amp, dtype=np.int16)
    w = parse_wav(encode_wav(sig, 8000, codec))
    assert w is not None
    assert w["sample_rate"] == 8000
    assert w["duration_s"] == pytest.approx(0.1)
    tol = 0.02 if codec in (WAVE_MULAW, WAVE_ALAW) else 0.05
    assert w["rms"] == pytest.approx(amp / 32768.0, rel=tol)
    assert w["clip_ratio"] == 0.0


def test_parse_wav_rejects_unknown_tag():
    sig = np.zeros(10, dtype=np.int16)
    wav = bytearray(encode_wav(sig, 8000, WAVE_PCM))
    wav[20:22] = (0x55).to_bytes(2, "little")  # bogus format tag
    assert parse_wav(bytes(wav)) is None


def test_spark_audio_features_mulaw(spark):
    from hfsa_spark.operators.multimodal import (
        extract_audio_features,
        synthesize_audio_table,
    )

    docs = spark.createDataFrame([(i,) for i in range(5)], "doc_id bigint")
    media = synthesize_audio_table(docs, codec=WAVE_MULAW)
    feats = {r.doc_id: r for r in extract_audio_features(media).collect()}
    assert len(feats) == 5
    for i in range(5):
        amp = (997 * i) % 30000 + 100
        # µ-law closed form: p14+33 segment quantization
        m = (amp >> 2) + 33
        e = max(m.bit_length() - 6, 0)
        dec = ((((m >> (e + 1)) & 15) * 8 + 132) << e) - 132
        assert feats[i].rms == pytest.approx(dec / 32768.0)
        assert feats[i].sample_rate == 8000


def test_silence_segments_alternating_pattern():
    from hfsa_spark.operators.audio import silence_segments

    sr = 8000
    sig = np.zeros(200 * 8, dtype=np.int16)
    sig[40 * 8 : 100 * 8] = 5000  # tone 40-100ms
    sig[150 * 8 : 200 * 8] = 5000  # tone 150-200ms
    segs = silence_segments(sig, sr, frame_ms=10, threshold=0.01)
    assert segs == [
        (0, 40, False), (40, 100, True), (100, 150, False), (150, 200, True)
    ]


def test_silence_segments_edge_cases():
    from hfsa_spark.operators.audio import silence_segments

    assert silence_segments(np.zeros(0, dtype=np.int16), 8000) == []
    # shorter than one frame
    assert silence_segments(np.zeros(5, dtype=np.int16), 8000) == []
    # all-active single segment
    segs = silence_segments(np.full(160, 5000, dtype=np.int16), 8000)
    assert segs == [(0, 20, True)]


def test_spark_audio_segments_roundtrip(spark):
    from hfsa_spark.operators.multimodal import (
        extract_audio_segments,
        synthesize_segmented_audio_table,
    )

    docs = spark.createDataFrame([(i,) for i in range(4)], "doc_id bigint")
    media = synthesize_segmented_audio_table(docs)
    out = extract_audio_segments(media).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.start_ms, r.end_ms, r.active))
    for i in range(4):
        segs = by_doc[i]
        # alternates starting silent, covers [0, 200) without gaps
        assert segs[0][0] == 0 and segs[-1][1] == 200
        for (s1, e1, a1), (s2, e2, a2) in zip(segs, segs[1:]):
            assert e1 == s2 and a1 != a2
        assert segs[0][2] is False


def test_extract_spectral_peaks_offbin_and_codec(spark):
    """Peak detection works on arbitrary (off-bin) tones and on a
    compressed codec, not just the synthesized on-bin lattice."""
    import numpy as np

    from hfsa_spark.operators.audio import WAVE_MULAW, encode_wav
    from hfsa_spark.operators.multimodal import extract_spectral_peaks

    sr, n_fft = 8000, 256
    t = np.arange(n_fft * 2, dtype=np.float64)
    # off-bin tone between bins 10 and 11 — argmax must land on one of them
    x1 = np.rint(8000 * np.sin(2 * np.pi * 10.4 * t / n_fft)).astype(np.int16)
    # on-bin tone through the µ-law codec: quantization noise is broadband
    # and tens of dB below the tone, so bin 20 must still win
    x2 = np.rint(8000 * np.sin(2 * np.pi * 20 * t / n_fft)).astype(np.int16)
    rows = [
        (1, bytearray(encode_wav(x1, sample_rate=sr))),
        (2, bytearray(encode_wav(x2, sample_rate=sr, codec=WAVE_MULAW))),
        (3, bytearray(b"not a wav")),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    got = extract_spectral_peaks(df, n_fft=n_fft).collect()
    by = {}
    for r in got:
        by.setdefault(r["doc_id"], []).append(r)
    assert sorted(by) == [1, 2]  # non-WAV row yields nothing
    assert all(r["peak_bin"] in (10, 11) for r in by[1])
    assert all(r["peak_bin"] == 20 for r in by[2])
    assert by[2][0]["peak_hz_milli"] == 20 * sr * 1000 // n_fft
    assert len(by[1]) == len(by[2]) == 2


def test_audio_fingerprints_codec_invariance(spark):
    """Same on-bin tone through PCM and through the µ-law codec must
    yield the SAME fingerprint (peaks survive companding); a different
    tone must not."""
    import numpy as np

    from hfsa_spark.operators.audio import WAVE_MULAW, encode_wav
    from hfsa_spark.operators.multimodal import audio_fingerprints

    t = np.arange(256 * 3, dtype=np.float64)
    tone20 = np.rint(8000 * np.sin(2 * np.pi * 20 * t / 256)).astype(np.int16)
    tone21 = np.rint(8000 * np.sin(2 * np.pi * 21 * t / 256)).astype(np.int16)
    rows = [
        (1, bytearray(encode_wav(tone20))),
        (2, bytearray(encode_wav(tone20, codec=WAVE_MULAW))),
        (3, bytearray(encode_wav(tone21))),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    got = {r["doc_id"]: r["fingerprint"] for r in audio_fingerprints(df).collect()}
    assert got[1] == got[2] != got[3]
