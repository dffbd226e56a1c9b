"""Real pure-Python media codecs (VERDICT r9 item 7): WAV (RIFF/PCM)
and PPM/PGM (netpbm) payloads byte-built in the tests, decoded through
the REAL decode_audio/decode_images contract end-to-end — true bytes to
metadata and signal/pixel features, no media libraries, no fakes.
"""

import math
import struct

import numpy as np
import pytest

from feathr_spark.operators.multimodal import (
    decode_audio, decode_images, ppm_image_decoder, tolerant_decoder,
    wav_audio_decoder,
)


def make_wav(samples, rate=8000, channels=1, bits=16):
    """Byte-build a RIFF/WAVE PCM file: samples is a list of frames
    (ints, interleaved per channel when channels > 1)."""
    if bits == 8:
        data = bytes((s + 128) & 0xFF for s in samples)
    elif bits == 16:
        data = b"".join(struct.pack("<h", s) for s in samples)
    else:
        data = b"".join(struct.pack("<i", s) for s in samples)
    block = channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block,
                      block, bits)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def make_ppm(px, maxval=255, comment=False):
    """Byte-build a binary PPM (px: HxWx3 uint array) or PGM (HxW)."""
    arr = np.asarray(px)
    gray = arr.ndim == 2
    magic = b"P5" if gray else b"P6"
    h, w = arr.shape[:2]
    hdr = magic + (b"\n# test comment\n" if comment else b"\n")
    hdr += f"{w} {h}\n{maxval}\n".encode()
    dt = np.uint8 if maxval < 256 else ">u2"
    return hdr + arr.astype(dt).tobytes()


def test_wav_metadata_and_rms_features():
    # 1600 mono samples of a full-scale square wave: RMS = 1.0 in every
    # of the 16 segments (100 samples each)
    sq = [32767 if i % 2 == 0 else -32767 for i in range(1600)]
    d = wav_audio_decoder(make_wav(sq, rate=16000))
    assert (d["sample_rate"], d["n_samples"], d["channels"],
            d["format"]) == (16000, 1600, 1, "wav/pcm16")
    assert len(d["features"]) == 16
    for f in d["features"]:
        assert f == pytest.approx(32767 / 32768, abs=1e-9)
    # silence -> all-zero RMS
    z = wav_audio_decoder(make_wav([0] * 160))
    assert all(f == 0.0 for f in z["features"])


def test_wav_stereo_mono_mix_and_8bit():
    # stereo where L = -R: the mono mix is exactly zero everywhere
    frames = []
    for i in range(200):
        frames += [1000 + i, -(1000 + i)]
    d = wav_audio_decoder(make_wav(frames, channels=2))
    assert d["channels"] == 2 and d["n_samples"] == 200
    assert all(f == 0.0 for f in d["features"])
    # 8-bit unsigned: constant 127 offset-encoded -> amplitude ~127/128
    d8 = wav_audio_decoder(make_wav([127] * 320, bits=8))
    assert d8["format"] == "wav/pcm8"
    for f in d8["features"]:
        assert f == pytest.approx(127 / 128, abs=1e-9)


def test_wav_sine_rms_hand_computed():
    n, rate = 3200, 8000
    amp = 20000
    sine = [round(amp * math.sin(2 * math.pi * 50 * i / rate))
            for i in range(n)]
    d = wav_audio_decoder(make_wav(sine, rate=rate))
    x = np.array(sine) / 32768.0
    for got, seg in zip(d["features"], np.array_split(x, 16)):
        assert got == pytest.approx(float(np.sqrt(np.mean(seg ** 2))),
                                    rel=1e-12)


def test_wav_rejects_malformed():
    with pytest.raises(ValueError, match="RIFF"):
        wav_audio_decoder(b"not a wav")
    # non-PCM format code
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 16000, 2, 16)
    bad = (b"RIFF" + struct.pack("<I", 28) + b"WAVE"
           + b"fmt " + struct.pack("<I", 16) + fmt
           + b"data" + struct.pack("<I", 0))
    with pytest.raises(ValueError, match="format code"):
        wav_audio_decoder(bad)
    with pytest.raises(ValueError, match="fmt/data"):
        wav_audio_decoder(b"RIFF\x04\x00\x00\x00WAVE")


def test_ppm_grid_features_hand_computed():
    # 8x8 RGB: left half black, right half white -> each 2x2 grid cell
    # mean is 0.0 (cols 0-1) or 1.0 (cols 2-3)
    px = np.zeros((8, 8, 3), dtype=np.uint8)
    px[:, 4:, :] = 255
    d = ppm_image_decoder(make_ppm(px, comment=True))
    assert (d["width"], d["height"], d["channels"], d["format"]) == \
        (8, 8, 3, "ppm")
    expect = [0.0, 0.0, 1.0, 1.0] * 4
    assert d["features"] == pytest.approx(expect)


def test_pgm_16bit_and_luminance():
    # 4x4 grayscale, 16-bit maxval 65535, constant 32768
    px = np.full((4, 4), 32768, dtype=np.uint32)
    d = ppm_image_decoder(make_ppm(px, maxval=65535))
    assert (d["channels"], d["format"]) == (1, "pgm")
    for f in d["features"]:
        assert f == pytest.approx(32768 / 65535, rel=1e-12)


def test_ppm_rejects_malformed():
    with pytest.raises(ValueError, match="PPM/PGM"):
        ppm_image_decoder(b"P3\n1 1\n255\n0 0 0")   # ascii variant
    with pytest.raises(ValueError, match="truncated PNM raster"):
        ppm_image_decoder(b"P6\n4 4\n255\n\x00\x01")
    with pytest.raises(ValueError, match="header token"):
        ppm_image_decoder(b"P6\nxx 4\n255\n")


def test_real_codecs_through_spark_contract(spark):
    """E2E: byte-built WAV + PPM payloads through the actual
    decode_audio/decode_images mapInPandas path — metadata and features
    land typed and exact, NULL payloads stay NULL."""
    wavs = [
        (1, make_wav([32767 if i % 2 == 0 else -32767
                      for i in range(1600)], rate=16000)),
        (2, make_wav([0] * 160, rate=8000)),
        (3, None),
    ]
    df = spark.createDataFrame(wavs, "id bigint, payload binary")
    out = {r["id"]: r for r in
           decode_audio(df, decoder=wav_audio_decoder).collect()}
    assert out[1]["meta"]["sample_rate"] == 16000
    assert out[1]["meta"]["n_samples"] == 1600
    assert out[1]["features"][0] == pytest.approx(32767 / 32768,
                                                  abs=1e-6)
    assert out[2]["meta"]["format"] == "wav/pcm16"
    assert all(f == 0.0 for f in out[2]["features"])
    assert out[3]["meta"]["sample_rate"] is None
    assert out[3]["features"] is None

    px = np.zeros((8, 8, 3), dtype=np.uint8)
    px[:, 4:, :] = 255
    imgs = [(1, make_ppm(px)), (2, b"corrupt bytes"), (3, None)]
    idf = spark.createDataFrame(imgs, "id bigint, payload binary")
    dec = tolerant_decoder(
        ppm_image_decoder, ("width", "height", "channels", "format"))
    rows = {r["id"]: r for r in
            decode_images(idf, decoder=dec).collect()}
    assert rows[1]["meta"]["width"] == 8
    assert rows[1]["features"][:4] == pytest.approx([0.0, 0.0, 1.0, 1.0])
    # poison-row containment: corrupt payload -> NULL metadata with a
    # triage tag, job survives
    assert rows[2]["meta"]["format"] == "error:ValueError"
    assert rows[2]["features"] is None
    assert rows[3]["meta"]["width"] is None
