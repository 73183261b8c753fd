"""Codec-level pins for the deletion-vector stack (sources/delta_dv.py):
z85 against the ZeroMQ RFC 32 test vector, roaring bitmap roundtrips
across container types (including a hand-built RUN container, which the
writer never emits but real engines do), and DV file framing."""

from __future__ import annotations

import io
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


def test_z85_spec_vector():
    """RFC 32's normative example: 0x86 0x4F 0xD2 0x6F 0xB5 0x59 0xF7
    0x5B encodes to the string 'HelloWorld'."""
    from hive_person_service_spark.sources.delta_dv import (
        z85_decode,
        z85_encode,
    )

    raw = bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
    assert z85_encode(raw) == "HelloWorld"
    assert z85_decode("HelloWorld") == raw
    with pytest.raises(ValueError, match="multiple of 4"):
        z85_encode(b"abc")
    with pytest.raises(ValueError, match="multiple of 5"):
        z85_decode("abcd")
    with pytest.raises(ValueError, match="invalid z85"):
        z85_decode('abcd"')


def test_roaring_run_container_decodes():
    """Hand-build a cookie-12347 bitmap whose single container is a RUN
    container ([5..10], [100..100]) -- the reader must expand it even
    though the writer only emits array/bitmap containers."""
    from hive_person_service_spark.sources.delta_dv import (
        _deserialize_roaring32,
    )

    buf = io.BytesIO()
    size = 1
    cookie = ((size - 1) << 16) | 12347
    buf.write(struct.pack("<i", cookie))
    buf.write(bytes([0b1]))  # run flag for container 0
    card = 7  # 6 + 1 values
    buf.write(struct.pack("<HH", 0, card - 1))  # key 0, cardinality-1
    # size < 4 => no offset header for the run cookie
    buf.write(struct.pack("<H", 2))  # n_runs
    buf.write(struct.pack("<HH", 5, 5))   # start 5, length 5 -> 5..10
    buf.write(struct.pack("<HH", 100, 0))  # start 100, length 0 -> 100
    vals, end = _deserialize_roaring32(buf.getvalue(), 0)
    assert list(vals) == [5, 6, 7, 8, 9, 10, 100]
    assert end == len(buf.getvalue())


@settings(max_examples=60, deadline=None)
@given(
    st.sets(
        st.one_of(
            st.integers(min_value=0, max_value=300_000),
            st.integers(min_value=(1 << 32) - 100, max_value=(1 << 32) + 100),
            st.integers(min_value=(1 << 33), max_value=(1 << 33) + 50),
        ),
        max_size=400,
    )
)
def test_roaring_portable_roundtrip_property(values):
    """Random position sets -- spanning the uint32 key boundary --
    roundtrip bit-exactly through the portable RoaringBitmapArray."""
    from hive_person_service_spark.sources.delta_dv import (
        deserialize_bitmap,
        serialize_bitmap,
    )

    got = deserialize_bitmap(serialize_bitmap(values))
    assert list(got) == sorted(values)


def test_dv_file_crc_is_full_32_bits(tmp_path):
    """The stored checksum must be the unmasked 32-bit CRC (interop: real
    engines write crc.getValue as a signed int; the bytes equal the
    unsigned big-endian form). Corruption is detected."""
    import zlib

    from hive_person_service_spark.sources.delta_dv import (
        read_dv,
        serialize_bitmap,
        write_dv_file,
    )

    d = str(tmp_path)
    # find a payload whose CRC has bit 31 set so the mask bug would bite
    for seed in range(64):
        bm = serialize_bitmap(range(seed, seed + 40))
        if zlib.crc32(bm) & 0x80000000:
            break
    else:
        pytest.skip("no high-bit CRC found (vanishingly unlikely)")
    fname, descs = write_dv_file(d, [bm])
    # on-disk CRC equals the full unmasked value
    import os

    with open(os.path.join(d, fname), "rb") as fh:
        fh.seek(descs[0]["offset"])
        (size,) = struct.unpack(">i", fh.read(4))
        data = fh.read(size)
        (crc,) = struct.unpack(">I", fh.read(4))
    assert crc == zlib.crc32(data) & 0xFFFFFFFF
    assert crc & 0x80000000  # the chosen payload really exercises bit 31
    assert list(read_dv(d, descs[0])) == list(range(seed, seed + 40))
    # flip a byte -> precise corruption error
    full = os.path.join(d, fname)
    blob = bytearray(open(full, "rb").read())
    blob[descs[0]["offset"] + 6] ^= 0xFF
    open(full, "wb").write(bytes(blob))
    with pytest.raises(ValueError, match="checksum mismatch"):
        read_dv(d, descs[0])
