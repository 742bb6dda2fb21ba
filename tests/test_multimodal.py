"""Multimodal binary-column plumbing: schema, batch shape, determinism,
and the explicitly-marked decoder stub."""

import pytest
from pyspark.sql import functions as F

from sec_dl_spark.operators.multimodal import FEATURE_DIM, docs_as_media, extract_features


def test_binary_roundtrip_and_features(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "hello world"), (3, "something else")],
        "doc_id long, text string",
    )
    media = docs_as_media(docs)
    assert dict(media.dtypes)["content"] == "binary"

    feats = extract_features(media).collect()
    by_id = {r["media_id"]: r for r in feats}
    assert by_id[1]["n_bytes"] == len(b"hello world")
    assert len(by_id[1]["features"]) == FEATURE_DIM
    # deterministic: identical payloads → identical features
    assert by_id[1]["features"] == by_id[2]["features"]
    assert by_id[1]["features"] != by_id[3]["features"]


def test_real_decoder_stub_raises(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(Exception) as exc_info:
        extract_features(docs_as_media(docs), with_real_decoders=True).collect()
    assert "NotImplementedError" in str(exc_info.value) or "real decoders" in str(exc_info.value)


def test_resize_plumbing(spark):
    from sec_dl_spark.operators.multimodal import resize_images

    docs = spark.createDataFrame([(1, "x" * 100), (2, "y")], "doc_id long, text string")
    out = resize_images(docs_as_media(docs), width=32, height=32).collect()
    by_id = {r["media_id"]: r for r in out}
    assert by_id[1]["width"] == 32 and by_id[1]["height"] == 32
    # fake resize yields the deterministic target payload size for all inputs
    assert len(by_id[1]["content"]) == len(by_id[2]["content"]) == 32 * 32 // 64
    with pytest.raises(Exception, match="NotImplementedError|real image codecs"):
        resize_images(docs_as_media(docs), with_real_decoders=True).collect()


def test_frame_sampling_expansion(spark):
    from sec_dl_spark.operators.multimodal import sample_frames

    docs = spark.createDataFrame([(1, "a" * 2500), (2, "b" * 10)], "doc_id long, text string")
    out = sample_frames(docs_as_media(docs), every_ms=1000).collect()
    frames_1 = sorted([r for r in out if r["media_id"] == 1], key=lambda r: r["frame_idx"])
    # fake duration = n_bytes = 2500 ms → frames at 0, 1000, 2000
    assert [r["frame_ms"] for r in frames_1] == [0, 1000, 2000]
    assert frames_1[0]["frame"] == b"a" * 8
    assert len([r for r in out if r["media_id"] == 2]) == 1


def test_audio_chunking_window_hop(spark):
    from sec_dl_spark.operators.multimodal import chunk_audio

    docs = spark.createDataFrame([(1, "a" * 2200)], "doc_id long, text string")
    out = sorted(
        chunk_audio(docs_as_media(docs), window_ms=1000, hop_ms=500).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # 2200 'ms' with hop 500 → starts at 0,500,...,2000 (5 windows)
    assert [r["start_ms"] for r in out] == [0, 500, 1000, 1500, 2000]
    assert len(out[0]["chunk"]) == 1000      # full window
    assert len(out[-1]["chunk"]) == 200      # trailing partial kept
    # 50% overlap: second half of window 0 == first half of window 1
    assert out[0]["chunk"][500:] == out[1]["chunk"][:500]


def test_select_keyframes_scene_changes(spark):
    """Scene boundaries emit, steady content doesn't: a payload of three
    1000-byte 'scenes' with distinct byte levels yields exactly the three
    scene-start frames; a constant payload yields only frame 0."""
    from sec_dl_spark.operators.multimodal import select_keyframes

    scenes = bytes([10] * 1000 + [100] * 1000 + [200] * 1000)
    flat = bytes([42] * 3000)
    media = spark.createDataFrame(
        [(1, "video", bytearray(scenes)), (2, "video", bytearray(flat))],
        "media_id long, kind string, content binary",
    )
    out = select_keyframes(media, frame_ms=1000, threshold=8.0).collect()
    by_media = {}
    for r in out:
        by_media.setdefault(r["media_id"], []).append((r["frame_idx"], r["delta"]))
    assert [i for i, _ in sorted(by_media[1])] == [0, 1, 2]
    assert by_media[1][1][1] == 90.0 and by_media[1][2][1] == 100.0
    assert [i for i, _ in sorted(by_media[2])] == [0]

    import pytest

    with pytest.raises(Exception, match="NotImplementedError|real video"):
        select_keyframes(media, with_real_decoders=True).collect()


def test_decode_audio_wav_roundtrip(spark):
    """Real (non-stubbed) PCM WAV decode via stdlib wave: generate a known
    16-bit mono sine + a stereo ramp, push them through the Arrow-batched
    decode stage, and check rate/channels/length/values against the
    generated signal (VERDICT r4 #8)."""
    import io
    import math
    import wave

    from sec_dl_spark.operators.multimodal import decode_audio

    def make_wav(nch, sr, samples_per_ch):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(nch)
            w.setsampwidth(2)
            w.setframerate(sr)
            frames = bytearray()
            for i in range(samples_per_ch):
                for ch in range(nch):
                    v = int(
                        20000 * math.sin(2 * math.pi * 440 * i / sr)
                        if nch == 1
                        else (i * (ch + 1)) % 3000
                    )
                    frames += v.to_bytes(2, "little", signed=True)
            w.writeframes(bytes(frames))
        return buf.getvalue()

    sr = 8000
    mono = make_wav(1, sr, 800)  # 100 ms of 440 Hz
    stereo = make_wav(2, sr, 400)
    media = spark.createDataFrame(
        [(1, "wav", bytearray(mono)), (2, "wav", bytearray(stereo))],
        "media_id long, kind string, content binary",
    )
    rows = {r["media_id"]: r for r in decode_audio(media).collect()}

    m = rows[1]
    assert (m["sample_rate"], m["n_channels"], m["n_samples"]) == (sr, 1, 800)
    assert m["duration_ms"] == 100
    # decoded values match the generated sine to int16 quantization
    for i in (0, 100, 271):
        expect = int(20000 * math.sin(2 * math.pi * 440 * i / sr)) / 32768
        assert abs(m["samples"][i] - expect) < 1e-6

    s = rows[2]
    assert (s["n_channels"], s["n_samples"]) == (2, 400)  # downmixed length
    # mean of the two channel ramps at frame i: (i + 2i)/2 / 32768
    for i in (1, 7):
        expect = ((i % 3000) + (2 * i % 3000)) / 2 / 32768
        assert abs(s["samples"][i] - expect) < 1e-6


def test_decode_audio_rejects_compressed_kinds(spark):
    """Only PCM WAV decodes for real; compressed formats still need the
    absent codec libraries and must fail loudly, not fake silently."""
    import pytest

    from sec_dl_spark.operators.multimodal import decode_audio

    media = spark.createDataFrame(
        [(1, "mp3", bytearray(b"\xff\xfb\x90\x00"))],
        "media_id long, kind string, content binary",
    )
    with pytest.raises(Exception, match="NotImplementedError|librosa"):
        decode_audio(media).collect()


def _ppm_bytes(w, h, fn):
    rgb = bytearray()
    for y in range(h):
        for x in range(w):
            rgb += bytes(fn(x, y))
    return b"P6\n# test comment\n%d %d\n255\n" % (w, h) + bytes(rgb)


def _bmp_bytes(w, h, fn):
    """Minimal 24bpp bottom-up BMP."""
    import struct

    stride = (w * 3 + 3) & ~3
    pix = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up rows
        row = bytearray()
        for x in range(w):
            r, g, b = fn(x, y)
            row += bytes((b, g, r))  # BGR on disk
        row += b"\x00" * (stride - len(row))
        pix += row
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0)
    return header + info + bytes(pix)


def test_decode_image_ppm_and_bmp(spark):
    """Real stdlib raster decode: a generated P6 PPM and a 24bpp BMP of
    the SAME image decode to identical dimensions and channel means
    (BMP's BGR order and bottom-up rows must be unwound correctly)."""
    from sec_dl_spark.operators.multimodal import decode_image

    fn = lambda x, y: (x * 30 % 256, y * 40 % 256, (x + y) * 20 % 256)
    media = spark.createDataFrame(
        [
            (1, "ppm", bytearray(_ppm_bytes(5, 4, fn))),
            (2, "bmp", bytearray(_bmp_bytes(5, 4, fn))),
        ],
        "media_id long, kind string, content binary",
    )
    rows = {r["media_id"]: r for r in decode_image(media).collect()}
    assert (rows[1]["width"], rows[1]["height"]) == (5, 4)
    assert (rows[2]["width"], rows[2]["height"]) == (5, 4)
    for c in range(3):
        assert abs(rows[1]["mean_rgb"][c] - rows[2]["mean_rgb"][c]) < 1e-5
    # exact mean of the known generator for the red channel
    expect_r = sum(x * 30 % 256 for x in range(5) for _ in range(4)) / 20
    assert abs(rows[1]["mean_rgb"][0] - expect_r) < 1e-4


def test_resize_ppm_real_nearest_neighbor(spark):
    """Real PPM resize: 4×4 checkerboard → 2×2 via nearest neighbor picks
    the exact source pixels; output re-encodes as valid PPM."""
    from sec_dl_spark.operators.multimodal import _parse_ppm, resize_images

    fn = lambda x, y: ((255, 0, 0) if (x // 2 + y // 2) % 2 == 0 else (0, 0, 255))
    media = spark.createDataFrame(
        [(1, "ppm", bytearray(_ppm_bytes(4, 4, fn)))],
        "media_id long, kind string, content binary",
    )
    out = resize_images(media, width=2, height=2, with_real_decoders=True).collect()[0]
    w, h, rgb = _parse_ppm(bytes(out["content"]))
    assert (w, h) == (2, 2)
    px = [tuple(rgb[i : i + 3]) for i in range(0, 12, 3)]
    assert px == [(255, 0, 0), (0, 0, 255), (0, 0, 255), (255, 0, 0)]


def test_decode_image_rejects_compressed_kinds(spark):
    import pytest

    from sec_dl_spark.operators.multimodal import decode_image

    media = spark.createDataFrame(
        [(1, "png", bytearray(b"\x89PNG\r\n"))],
        "media_id long, kind string, content binary",
    )
    with pytest.raises(Exception, match="NotImplementedError|PIL"):
        decode_image(media).collect()


def test_sample_frames_y4m_real_demux(spark):
    """Real Y4M demux: a generated 2×2 4:2:0 clip at 25 fps sampled every
    80 ms emits the nearest Y planes (frames 0, 2, 4); compressed
    containers still raise."""
    from sec_dl_spark.operators.multimodal import sample_frames

    w = h = 2
    header = b"YUV4MPEG2 W2 H2 F25:1 Ip A1:1 C420\n"
    frames = []
    payload = bytearray(header)
    for i in range(5):
        y = bytes([i * 10 + k for k in range(w * h)])
        frames.append(y)
        payload += b"FRAME\n" + y + b"\x00" * (w * h // 2)  # chroma stub

    media = spark.createDataFrame(
        [(1, "y4m", bytearray(bytes(payload)))],
        "media_id long, kind string, content binary",
    )
    got = sorted(
        (r["frame_idx"], r["frame_ms"], bytes(r["frame"]))
        for r in sample_frames(media, every_ms=80, with_real_decoders=True).collect()
    )
    assert got == [(0, 0, frames[0]), (1, 80, frames[2]), (2, 160, frames[4])]

    bad = spark.createDataFrame(
        [(1, "mp4", bytearray(b"\x00\x00\x00 ftypmp42"))],
        "media_id long, kind string, content binary",
    )
    import pytest

    with pytest.raises(Exception, match="NotImplementedError|av/ffmpeg"):
        sample_frames(bad, with_real_decoders=True).collect()


def test_select_keyframes_y4m_real_scene_change(spark):
    """Real Y4M keyframe selection: three flat-luma scenes (two frames
    each) emit exactly one keyframe per scene boundary."""
    from sec_dl_spark.operators.multimodal import select_keyframes

    w = h = 2
    payload = bytearray(b"YUV4MPEG2 W2 H2 F10:1 C420\n")
    for luma in (10, 10, 100, 100, 200, 200):
        payload += b"FRAME\n" + bytes([luma] * (w * h)) + b"\x00" * (w * h // 2)
    media = spark.createDataFrame(
        [(1, "y4m", bytearray(bytes(payload)))],
        "media_id long, kind string, content binary",
    )
    got = sorted(
        (r["frame_idx"], r["frame_ms"], r["delta"])
        for r in select_keyframes(media, threshold=8.0, with_real_decoders=True).collect()
    )
    assert got == [(0, 0, 0.0), (2, 200, 90.0), (4, 400, 100.0)]


def test_perceptual_hash_near_dup_detection(spark):
    """aHash over the real decode path: identical content in two formats
    (PPM vs BMP) hashes IDENTICALLY; a tiny brightness-preserving edit
    stays within a few Hamming bits; a structurally different image is
    far away. Hashes match an independent numpy reference."""
    import numpy as np

    from sec_dl_spark.operators.multimodal import perceptual_hash

    def gradient(x, y):
        return ((x * 7) % 256, (y * 5) % 256, ((x + y) * 3) % 256)

    def gradient_edited(x, y):
        r, g, b = gradient(x, y)
        if x == 3 and y == 3:  # one-pixel edit
            return (255 - r, g, b)
        return (r, g, b)

    def checkers(x, y):
        v = 255 if (x // 4 + y // 4) % 2 else 0
        return (v, v, v)

    w = h = 32
    rows = [
        (1, "ppm", _ppm_bytes(w, h, gradient)),
        (2, "bmp", _bmp_bytes(w, h, gradient)),
        (3, "ppm", _ppm_bytes(w, h, gradient_edited)),
        (4, "ppm", _ppm_bytes(w, h, checkers)),
    ]
    media = spark.createDataFrame(rows, "media_id long, kind string, content binary")
    got = {r["media_id"]: r["ahash"] for r in perceptual_hash(media).collect()}

    def ref_hash(fn):
        px = np.array([[fn(x, y) for x in range(w)] for y in range(h)], dtype=float)
        gray = px.mean(axis=2)
        cells = gray.reshape(8, 4, 8, 4).mean(axis=(1, 3))  # 32/8 = 4 exact
        bits = (cells >= cells.mean()).flatten()
        v = sum(1 << i for i, b in enumerate(bits) if b)
        # signed two's complement, matching the operator: bit 63 (cell
        # (7,7) at grid=8) survives instead of being masked off
        return v - (1 << 64) if v & (1 << 63) else v

    assert got[1] == ref_hash(gradient)
    assert got[1] == got[2]  # format-independent
    ham13 = bin((got[1] ^ got[3]) & ((1 << 64) - 1)).count("1")
    ham14 = bin((got[1] ^ got[4]) & ((1 << 64) - 1)).count("1")
    assert ham13 <= 2  # near-dup stays close
    assert ham14 > 10  # different structure is far
