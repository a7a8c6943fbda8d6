"""RLE submission writer (legacy-layout contingency, SURVEY.md §A.1)."""

import numpy as np

from tpu_unet.submit import rle_decode, rle_encode


def test_rle_round_trip(rng):
    mask = (rng.random((23, 17)) > 0.6).astype(np.uint8)
    assert np.array_equal(rle_decode(rle_encode(mask), mask.shape), mask)


def test_rle_known_value():
    # Column-major, 1-indexed: pixels (r1,c0) and (r2,c0) → start 2, len 2.
    m = np.zeros((3, 3), np.uint8)
    m[1, 0] = m[2, 0] = 1
    assert rle_encode(m) == "2 2"


def test_rle_empty_and_full():
    assert rle_encode(np.zeros((4, 4), np.uint8)) == ""
    assert rle_encode(np.ones((2, 2), np.uint8)) == "1 4"
