"""Context-table generation tests; when the reference checkout is present,
assert bit-identity with its RFC 7932 tables (src/constants.rs)."""
import os
import re

import numpy as np
import pytest

from divans_tpu import constants as C


def test_utf8_table_shapes():
    assert C.UTF8_CONTEXT_P1.shape == (256,)
    assert C.UTF8_CONTEXT_P2.shape == (256,)
    assert C.UTF8_CONTEXT_P1.max() == 60
    assert C.UTF8_CONTEXT_P2.max() == 3
    assert C.SIGNED_3BIT_CONTEXT.max() == 7


def test_lut_combination_range():
    lut0 = C.literal_lut0(C.LITERAL_PREDICTION_MODE_UTF8)
    lut1 = C.literal_lut1(C.LITERAL_PREDICTION_MODE_UTF8)
    combined = lut0[:, None] | lut1[None, :]
    assert combined.max() <= 63
    lut0s = C.literal_lut0(C.LITERAL_PREDICTION_MODE_SIGN)
    lut1s = C.literal_lut1(C.LITERAL_PREDICTION_MODE_SIGN)
    assert (lut0s[:, None] | lut1s[None, :]).max() <= 63


_REF = "/root/reference/src/constants.rs"


@pytest.mark.skipif(not os.path.exists(_REF), reason="reference checkout not present")
def test_tables_match_reference_data():
    text = open(_REF).read()
    nums = [int(x) for x in re.findall(r"\d+", text.split("UTF8_CONTEXT_LOOKUP")[1]
                                       .split("SIGNED_3_BIT")[0].split("=", 1)[1])]
    utf8 = np.array(nums[:512], dtype=np.uint8)
    assert (C.literal_lut0(C.LITERAL_PREDICTION_MODE_UTF8) == utf8[:256]).all()
    assert (C.literal_lut1(C.LITERAL_PREDICTION_MODE_UTF8) == utf8[256:]).all()
    nums2 = [int(x) for x in re.findall(r"\d+", text.split("SIGNED_3_BIT_CONTEXT_LOOKUP")[1]
                                        .split("=", 1)[1])]
    signed = np.array(nums2[:256], dtype=np.uint8)
    assert (C.SIGNED_3BIT_CONTEXT == signed).all()


def test_speed_f8_roundtrip():
    from divans_tpu.probability.speed import speed_to_u8, u8_to_speed
    for v in [0, 1, 2, 3, 4, 5, 6, 7, 8, 10, 12, 16, 24, 32, 48, 64, 96,
              768, 1280, 1536, 1664, 16384]:
        assert u8_to_speed(speed_to_u8(v)) == v
