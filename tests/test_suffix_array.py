"""SA-IS native builder vs brute-force sorted-suffix oracle and the NumPy
prefix-doubling fallback."""

import numpy as np
import pytest

from awry_tpu.build.suffix_array import build_suffix_array, suffix_array_doubling


def naive_sa(text: bytes) -> np.ndarray:
    buf = text + b"\x00"
    return np.array(sorted(range(len(buf)), key=lambda i: buf[i:]), dtype=np.int64)


@pytest.mark.parametrize(
    "text",
    [
        b"A",
        b"AAAA",
        b"BANANA",
        b"MISSISSIPPI",
        b"ACGTACGTACGT",
        b"GTNNNACGTNAC",
    ],
)
def test_small_texts(text):
    expected = naive_sa(text)
    np.testing.assert_array_equal(build_suffix_array(text), expected)
    np.testing.assert_array_equal(
        build_suffix_array(text, force_fallback=True), expected
    )


def test_random_texts(rng):
    for trial in range(20):
        n = int(rng.integers(1, 2000))
        alpha = rng.choice([b"ACGT", b"AB", b"ACDEFGHIKLMNPQRSTVWY"])
        text = bytes(rng.choice(np.frombuffer(alpha, dtype=np.uint8), size=n))
        expected = naive_sa(text)
        np.testing.assert_array_equal(build_suffix_array(text), expected)
        np.testing.assert_array_equal(
            build_suffix_array(text, force_fallback=True), expected
        )


def test_sentinel_first():
    sa = build_suffix_array(b"ACGTGTCA")
    assert sa[0] == 8


def test_rejects_zero_byte():
    with pytest.raises(ValueError):
        build_suffix_array(b"AC\x00GT")


def test_large_random(rng):
    text = bytes(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=200_000))
    sa = build_suffix_array(text)
    fallback = build_suffix_array(text, force_fallback=True)
    np.testing.assert_array_equal(sa, fallback)
