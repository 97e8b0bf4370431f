"""Codec invariants backing the per-row image checks (BASELINE.json:15)."""

import numpy as np
import pytest

from spiderman_spark import imagecodec as ic


@pytest.mark.parametrize("fmt", ic.FORMATS)
def test_roundtrip(fmt):
    px = ic.gen_pixels(42, "IMG1", 33, 17)
    out = ic.decode(ic.encode(px, fmt), fmt)
    assert out.shape == px.shape
    if fmt == "qjpg":
        assert ic.psnr(px, out) >= 40.0  # lossy stand-in must clear the gate
    else:
        assert (out == px).all()  # lossless formats exact


def test_determinism():
    a = ic.gen_pixels(42, "X", 20, 20)
    b = ic.gen_pixels(42, "X", 20, 20)
    c = ic.gen_pixels(43, "X", 20, 20)
    assert (a == b).all() and not (a == c).all()
    assert ic.gen_caption(42, "X") == ic.gen_caption(42, "X")
    assert ic.gen_caption(42, "X") != ic.gen_caption(42, "Y")


def test_phash_properties():
    px = ic.gen_pixels(42, "P", 48, 32)
    h1 = ic.average_phash(px)
    assert -(2**63) <= h1 < 2**63
    # lossy decode stays phash-identical or very close (hamming <= 4)
    out = ic.decode(ic.encode(px, "qjpg"), "qjpg")
    h2 = ic.average_phash(out)
    assert bin((h1 ^ h2) & ((1 << 64) - 1)).count("1") <= 4


def test_psnr_identical_inf():
    px = ic.gen_pixels(42, "Q", 16, 16)
    assert ic.psnr(px, px) == float("inf")
    noisy = np.clip(px.astype(int) + 2, 0, 255).astype(np.uint8)
    assert 30 < ic.psnr(px, noisy) < 60
