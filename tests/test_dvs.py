"""Deletion-vector codec (sources/dvs.py): byte-level fidelity to the
public formats. delta-spark is not in this container, so these vectors
are computed BY HAND from the spec texts (delta.io PROTOCOL.md
"Deletion Vector Format"; ZeroMQ RFC 32/Z85; RoaringFormatSpec) —
they pin the wire format independently of the encoder, so an
encoder/decoder pair that agreed on a WRONG layout would still fail.
"""

import struct
import uuid
import zlib

import pytest

from computer_vision_foundations_spark.sources.dvs import (
    decode_rba,
    dv_absolute_path,
    dv_unique_id,
    encode_rba,
    inline_dv_descriptor,
    read_dv,
    write_dv_file,
    z85_decode,
    z85_encode,
)


def test_z85_spec_vector():
    """The reference vector from ZeroMQ RFC 32: 864FD26FB559F75B
    encodes to 'HelloWorld'."""
    raw = bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
    assert z85_encode(raw) == "HelloWorld"
    assert z85_decode("HelloWorld") == raw


def test_z85_uuid_roundtrip_and_errors():
    u = uuid.UUID("01234567-89ab-cdef-0123-456789abcdef")
    enc = z85_encode(u.bytes)
    assert len(enc) == 20
    assert z85_decode(enc) == u.bytes
    with pytest.raises(ValueError, match="multiple of 4"):
        z85_encode(b"abc")
    with pytest.raises(ValueError, match="multiple of 5"):
        z85_decode("abcd")
    with pytest.raises(ValueError, match="invalid z85"):
        z85_decode('a"bcd')


def test_rba_bytes_match_hand_computed_layout():
    """[1, 2, 3] serialized per spec: magic 1681511377 (i32 LE), one
    bucket (i64 LE), key 0 (u32 LE), then a portable 32-bit bitmap —
    cookie 12346 (no runs), 1 container, descriptive header (key 0,
    cardinality-1 = 2), one offset (16 = bytes from bitmap start to
    its first container), three u16 values."""
    expected = (
        struct.pack("<i", 1681511377)
        + struct.pack("<q", 1)
        + struct.pack("<I", 0)
        + struct.pack("<I", 12346)
        + struct.pack("<I", 1)
        + struct.pack("<HH", 0, 2)
        + struct.pack("<I", 16)
        + struct.pack("<HHH", 1, 2, 3)
    )
    assert encode_rba([1, 2, 3]) == expected
    assert decode_rba(expected) == [1, 2, 3]


def test_rba_run_container_decodes():
    """Foreign writers run-optimize: cookie 12347, size encoded in the
    high 16 bits (size-1), a run-flag bitset, NO offset header below 4
    containers, and (start, length-1) u16 pairs. Hand-built: one run
    container covering 5..9."""
    bitmap = (
        struct.pack("<I", 12347)  # SERIAL_COOKIE, size-1 = 0 in high bits
        + bytes([0x01])  # run flag for container 0
        + struct.pack("<HH", 0, 4)  # key 0, cardinality-1 = 4
        + struct.pack("<H", 1)  # one run
        + struct.pack("<HH", 5, 4)  # start 5, 4 additional values
    )
    data = (
        struct.pack("<i", 1681511377)
        + struct.pack("<q", 1)
        + struct.pack("<I", 0)
        + bitmap
    )
    assert decode_rba(data) == [5, 6, 7, 8, 9]


def test_rba_bitmap_container_roundtrip():
    """>4096 values in one 2^16 bucket forces a bitmap container
    (8 KiB of u64 words) on encode; decode recovers them exactly."""
    vals = list(range(5000)) + [65535]
    data = encode_rba(vals)
    # container is a bitmap: 8192-byte body after the headers
    assert len(data) == 12 + 4 + (4 + 4 + 4 + 4) + 8192
    assert decode_rba(data) == sorted(vals)


def test_rba_64bit_buckets():
    vals = [3, (1 << 32) + 7, (1 << 32) + 8, (5 << 32)]
    data = encode_rba(vals)
    assert decode_rba(data) == sorted(vals)
    # three buckets, ascending keys
    assert struct.unpack_from("<q", data, 4)[0] == 3


def test_rba_rejects_garbage():
    with pytest.raises(ValueError, match="magic"):
        decode_rba(struct.pack("<iq", 1234, 0))
    with pytest.raises(ValueError, match="cookie"):
        decode_rba(
            struct.pack("<iq", 1681511377, 1)
            + struct.pack("<I", 0)
            + struct.pack("<I", 999)
        )


def test_dv_file_roundtrip_and_checksum(tmp_path):
    """On-disk 'u' DV: version byte 1, then (i32 BE size, data,
    i32 BE CRC-32) at the descriptor offset; read_dv verifies all
    three and the cardinality."""
    root = str(tmp_path)
    idx = [0, 2, 5, 1000, (1 << 32) + 1]
    d = write_dv_file(root, idx, random_prefix="ab")
    assert d["storageType"] == "u"
    assert d["offset"] == 1 and d["cardinality"] == len(idx)
    p = dv_absolute_path(d, root)
    assert "/ab/deletion_vector_" in p and p.endswith(".bin")
    with open(p, "rb") as fh:
        blob = fh.read()
    assert blob[0] == 1  # format version
    (size,) = struct.unpack_from(">i", blob, 1)
    assert size == d["sizeInBytes"]
    data = blob[5 : 5 + size]
    (crc,) = struct.unpack_from(">I", blob, 5 + size)
    assert crc == zlib.crc32(data) & 0xFFFFFFFF
    assert read_dv(d, root) == sorted(idx)
    # flip one data byte -> checksum failure
    bad = bytearray(blob)
    bad[6] ^= 0xFF
    with open(p, "wb") as fh:
        fh.write(bytes(bad))
    with pytest.raises(ValueError, match="checksum|mismatch|cookie|magic"):
        read_dv(d, root)


def test_inline_dv_roundtrip():
    idx = [1, 7, 42]
    d = inline_dv_descriptor(idx)
    assert d["storageType"] == "i"
    assert len(d["pathOrInlineDv"]) % 5 == 0
    assert read_dv(d, "/nonexistent") == idx


def test_unique_id():
    assert dv_unique_id(None) is None
    assert dv_unique_id({"storageType": "i", "pathOrInlineDv": "xyz"}) == "ixyz"
    assert (
        dv_unique_id(
            {"storageType": "u", "pathOrInlineDv": "abQQ", "offset": 1}
        )
        == "uabQQ@1"
    )
