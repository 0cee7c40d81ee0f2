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


def test_native_u32_variant_matches_i32(rng):
    """The uint32 SA-IS instantiation (the GRCh38-scale path, sentinel-based
    loops instead of sign-based) is exercised directly at small n against the
    int32 result."""
    import ctypes

    from awry_tpu.build.suffix_array import _load_native

    lib = _load_native()
    if lib is None:
        import pytest

        pytest.skip("native library unavailable")
    for ln in (1, 2, 5, 100, 1000):
        text = bytes(rng.choice(np.frombuffer(b"ACGNT", dtype=np.uint8), size=ln))
        buf = np.frombuffer(text + b"\x00", dtype=np.uint8)
        n = buf.shape[0]
        sa32 = np.empty(n, dtype=np.int32)
        sau = np.empty(n, dtype=np.uint32)
        assert lib.awry_sais_i32(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), ctypes.c_int32(n),
            sa32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))) == 0
        assert lib.awry_sais_u32(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), ctypes.c_uint32(n),
            sau.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))) == 0
        np.testing.assert_array_equal(sau.astype(np.int64), sa32.astype(np.int64))
