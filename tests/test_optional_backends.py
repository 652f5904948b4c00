"""Optional-backend conformance (r6 verdict #8): when a real media
backend (Pillow / PyAV) is importable, cross-check this repo's
stdlib decoders — and the container metadata its honest-stub rows
report — against the backend.  Skipped-by-default in the no-network
sandbox (neither backend ships there); green wherever the backend
exists, which keeps the stub boundary honest as environments change.

Scope: everything here uses the repo's OWN synthetic payload
generators (the same fixtures the pinned showcases decode), so the
cross-check needs no external files.
"""

from __future__ import annotations

import io

import pytest

from ocr_document_recognition_service_spark.operators import multimodal


def _pil():
    return pytest.importorskip(
        "PIL.Image", reason="Pillow not installed (expected in sandbox)"
    )


def _av():
    return pytest.importorskip(
        "av", reason="PyAV not installed (expected in sandbox)"
    )


def test_pillow_agrees_on_image_headers_and_pixels():
    """Every synthetic image payload our header parser reads must get
    identical dimensions from Pillow, and the PNG/BMP pixel decoders
    must produce byte-identical raster content."""
    Image = _pil()
    payloads = [
        ("png-gray", multimodal.synthetic_gray_png_payload(3)),
        ("png-rgb", multimodal.synthetic_rgb_png_payload(5)),
        ("png-interlaced", multimodal.synthetic_interlaced_png_payload(2)),
        ("png-palette", multimodal.synthetic_palette_png_payload(4)),
        ("bmp", multimodal.synthetic_bmp_payload(7)),
        ("jpeg", multimodal.synthetic_image_payload(1)),
    ]
    for name, b in payloads:
        hdr = multimodal.parse_image_header(b)
        assert hdr is not None, name
        with Image.open(io.BytesIO(b)) as im:
            assert (im.width, im.height) == (hdr[0], hdr[1]), name
            if name.startswith("png") or name == "bmp":
                w, h, mode, raw = multimodal.decode_image_pixels(b)
                ref = im.convert("L" if mode == "L" else "RGB")
                ref_bytes = ref.tobytes()
                assert raw == ref_bytes, f"{name}: pixel mismatch"


def test_pyav_agrees_on_wav_metadata():
    """PyAV's demuxer must report the same sample rate / channel count
    our WAV chunk walker parses, for every synthetic WAV variant
    (PCM8/16, G.711 mu/A-law, IMA ADPCM)."""
    av = _av()
    for i in range(10):
        b = multimodal.synthetic_wav_payload(i)
        hdr = multimodal.parse_wav_header(b)
        assert hdr is not None
        rate, channels, _bits, _fmt = hdr[0], hdr[1], hdr[2], hdr[3]
        with av.open(io.BytesIO(b)) as c:
            s = c.streams.audio[0]
            assert s.sample_rate == rate
            assert s.channels == channels


def test_pyav_agrees_on_mjpeg_frame_count():
    """The AVI/MOV sample-table walk must count exactly the frames
    PyAV demuxes — the container metadata the honest-stub video path
    reports for codecs it cannot decode."""
    av = _av()
    for i in range(4):
        for name, payload in (
            ("avi", multimodal.synthetic_avi_payload(i)),
            ("mov", multimodal.synthetic_mov_payload(i)),
        ):
            ours = (
                multimodal.parse_avi_mjpeg(payload)
                if name == "avi"
                else multimodal.parse_mov_mjpeg(payload)
            )
            assert ours, f"{name} {i}: walker found no frames"
            with av.open(io.BytesIO(payload)) as c:
                n_ref = sum(1 for _ in c.decode(video=0))
            assert len(ours) == n_ref, f"{name} {i}: frame count"
