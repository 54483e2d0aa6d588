"""Codec-free media decoders: synth -> decode must round-trip the
synthesis contract exactly, and malformed containers must fail loudly
(never return plausible garbage). Pure-Python kernels, no Spark."""

from __future__ import annotations

import pytest

from market_data_lakehouse_spark.queries.multimodal import (
    _bmp_params,
    _wav_params,
    decode_bmp,
    decode_media,
    decode_wav,
    synth_bmp,
    synth_wav,
)


class TestBmp:
    @pytest.mark.parametrize("mid", [0, 3, 7, 39, 1234, 99999])
    def test_roundtrip_closed_form(self, mid):
        w, h = _bmp_params(mid)
        d = decode_bmp(synth_bmp(mid))
        assert (d["width"], d["height"], d["n_pixels"]) == (w, h, w * h)
        assert d["sum_b"] == h * (w * (w - 1) // 2)
        assert d["sum_g"] == w * (h * (h - 1) // 2)
        assert d["sum_r"] == d["sum_b"] + d["sum_g"]

    def test_padding_variants(self):
        # widths covering all four row-padding residues (3w % 4)
        for mid in (0, 1, 2, 3):
            d = decode_bmp(synth_bmp(mid))
            assert d["n_pixels"] == d["width"] * d["height"]

    def test_rejects_non_bmp(self):
        with pytest.raises(ValueError, match="not a BMP"):
            decode_bmp(b"PNG\x00garbage")

    def test_rejects_unsupported_variant(self):
        payload = bytearray(synth_bmp(5))
        payload[28] = 8  # claim 8bpp
        with pytest.raises(ValueError, match="unsupported"):
            decode_bmp(bytes(payload))


class TestDecodeMediaRouting:
    def test_real_paths(self):
        assert decode_media(synth_wav(4), "audio")["sample_rate"] == 16000
        assert decode_media(synth_bmp(6), "image")["n_pixels"] > 0

    def test_stub_path_still_loud(self):
        with pytest.raises(NotImplementedError):
            decode_media(b"\x00\x01", "video")

    def test_wav_roundtrip(self):
        n, amp, _half = _wav_params(11)
        d = decode_wav(synth_wav(11))
        assert (d["n_frames"], d["rms"], d["peak"]) == (n, amp, amp)
