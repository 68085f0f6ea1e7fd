"""Property-based codec tests: lossless round-trips must hold for ALL
inputs, not just the fixtures (hypothesis drives the search)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from vtb_datafusion_2023_spark.operators import codecs as C
from vtb_datafusion_2023_spark.operators import flac as FL

int16s = st.lists(st.integers(-32768, 32767), min_size=1, max_size=400)


@settings(max_examples=40, deadline=None)
@given(int16s, st.sampled_from([1, 17, 32, 64]))
def test_flac_roundtrip_property(samples, block_size):
    sig = np.array(samples, dtype=np.int16)
    back, rate = FL.decode_flac(FL.encode_flac(sig, 8000, block_size=block_size))
    assert np.array_equal(back.ravel(), sig.astype(np.int32))


@settings(max_examples=40, deadline=None)
@given(int16s)
def test_g711_decode_encode_fixed_point_property(samples):
    s = np.array(samples, dtype=np.int16)
    for enc, dec in ((C.ulaw_encode, C.ulaw_decode), (C.alaw_encode, C.alaw_decode)):
        q = dec(enc(s))
        assert np.array_equal(dec(enc(q)), q)  # decoded values are fixed points


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(0, 255), min_size=1, max_size=600), st.integers(2, 8))
def test_gif_lzw_roundtrip_property(indices, min_code_size):
    idx = np.array([i % (1 << min_code_size) for i in indices], dtype=np.uint8)
    enc = C._gif_lzw_encode(idx, min_code_size)
    assert np.array_equal(C._gif_lzw_decode(enc, min_code_size, len(idx)), idx)


@settings(max_examples=30, deadline=None)
@given(int16s)
def test_ima_adpcm_never_overflows_and_tracks(samples):
    sig = np.array(samples, dtype=np.int16)
    back, _ = C.decode_wav(C.encode_wav(sig, 8000, codec="ima"))
    back = back.ravel()[: len(sig)]
    assert back.dtype == np.int16 and len(back) == len(sig)
    # first sample is stored verbatim in the block header
    assert back[0] == sig[0]


@settings(max_examples=30, deadline=None)
@given(st.binary(min_size=1, max_size=2000))
def test_tiff_lzw_roundtrip_property(data):
    assert C._tiff_lzw_decode(C._tiff_lzw_encode(data), len(data)) == data
