"""Property-based round-trip tests (hypothesis) for the pure-Python
codecs: z85, 64-bit roaring bitmap arrays, raw snappy, Avro OCF, and the
baseline JPEG encoder/decoder pair. These are the formats where a
hand-picked example can miss a boundary (container splits, varint
widths, filter types); randomized round-trips pin the full value space.
"""

from __future__ import annotations

import pytest

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from datafusion_server_spark.sources import avro_py, delta_py


@given(st.binary(min_size=0, max_size=256).map(lambda b: b + b"\x00" * (-len(b) % 4)))
def test_z85_roundtrip_any_4n_bytes(data):
    assert delta_py.z85_decode(delta_py.z85_encode(data)) == data


@given(
    st.lists(
        st.integers(min_value=0, max_value=(1 << 34) - 1), min_size=0, max_size=300
    )
)
def test_roaring_bitmap_array_roundtrip_any_indexes(indexes):
    data = delta_py.encode_roaring_bitmap_array(sorted(set(indexes)))
    assert delta_py.decode_roaring_bitmap_array(data) == set(indexes)


@given(st.binary(min_size=0, max_size=4096))
def test_snappy_literal_roundtrip_any_bytes(data):
    assert avro_py._snappy_decompress(avro_py._snappy_compress(data)) == data


_AVRO_SCHEMA = {
    "type": "record",
    "name": "Fuzz",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
        {"name": "maybe", "type": ["null", "string", "long"]},
        {"name": "xs", "type": {"type": "array", "items": "double"}},
        {"name": "kv", "type": {"type": "map", "values": "int"}},
        {"name": "raw", "type": "bytes"},
    ],
}

_text = st.text(max_size=40)
_record = st.fixed_dictionaries(
    {
        "id": st.integers(min_value=-(1 << 62), max_value=(1 << 62) - 1),
        "name": _text,
        "maybe": st.one_of(
            st.none(), _text, st.integers(min_value=-(1 << 30), max_value=1 << 30)
        ),
        "xs": st.lists(
            st.floats(allow_nan=False, allow_infinity=False, width=64), max_size=6
        ),
        "kv": st.dictionaries(
            st.text(min_size=1, max_size=8),
            st.integers(min_value=-1000, max_value=1000),
            max_size=4,
        ),
        "raw": st.binary(max_size=32),
    }
)


@settings(max_examples=40, deadline=None)
@given(st.lists(_record, max_size=8), st.sampled_from(["null", "deflate", "snappy"]))
def test_avro_ocf_roundtrip_any_records(records, codec):
    """Full OCF encode/decode round-trip across all three codecs, with a
    multi-branch union routed by Python type (zigzag widths, blocked
    arrays/maps, length prefixes all exercised)."""
    data = avro_py.write_ocf(_AVRO_SCHEMA, records, codec=codec)
    _, decoded = avro_py.read_ocf(data)
    assert decoded == records


@settings(max_examples=15, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=255), min_size=64, max_size=64),
)
def test_jpeg_roundtrip_any_8x8(pixels):
    """Flat-quant baseline JPEG: any 8x8 grayscale block survives
    encode->decode within DCT rounding error (a few levels/pixel)."""
    from datafusion_server_spark.operators import jpeg_py

    data = jpeg_py.encode_baseline_grayscale(pixels, 8, 8)
    w, h, planes = jpeg_py.decode_baseline(data)
    assert (w, h) == (8, 8)
    assert max(abs(a - b) for a, b in zip(planes[0], pixels)) <= 4
