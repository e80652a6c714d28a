"""Codec tests, anchored to ground-truth ISCC strings from the reference repo."""

import pytest

from iscc_search_tpu import codec as ic


# Ground-truth examples taken from the reference's schema examples and tests
# (openapi examples in /root/reference/iscc_search/schema.py and tests/).
META_UNIT = "ISCC:AAAUHBUDQUT3LPWR"
SEMANTIC_UNIT = "ISCC:CAAUT7A2ADPTWAUL"
CONTENT_UNIT = "ISCC:EAA57SMMEN62J7ZA"
DATA_UNIT = "ISCC:GAAVB2JS4SVPWSEE"
INSTANCE_UNIT = "ISCC:IAATI64Q5HJYOXFF"
ISCC_ID = "ISCC:MAIGIIFJRDGEQQAA"
ISCC_CODE_TEXT = "ISCC:KADUHBUDQUT3LPWRJH6BUAG7HMBIXX6JRQRX3JH7EBIOSMXEVL5URBBUPOIOTU4HLSSQ"
ISCC_CODE_IMAGE = "ISCC:KECYCMZIOY36XXGZ7S6QJQ2AEEXPOVEHZYPK6GMSFLU3WF54UPZMTPY"
META_256 = "ISCC:AADWN77F73NA44D6X3N4VEUAPOW5HJKGK5JKLNGLNFPOESXWYDVDVUQ"


def test_varnibble_roundtrip():
    for v in [0, 1, 7, 8, 71, 72, 583, 584, 4679]:
        bits = ic.encode_varnibble(v)
        out, pos = ic.decode_varnibble(bits, 0)
        assert out == v
        assert pos == len(bits)


def test_varnibble_out_of_range():
    with pytest.raises(ValueError):
        ic.encode_varnibble(4680)
    with pytest.raises(ValueError):
        ic.encode_varnibble(-1)


def test_base32_roundtrip():
    data = bytes(range(10))
    assert ic.decode_base32(ic.encode_base32(data)) == data


def test_base32_invalid():
    with pytest.raises(ValueError):
        ic.decode_base32("!!!!")


def test_base64_roundtrip():
    data = bytes(range(16))
    enc = ic.encode_base64(data)
    assert "=" not in enc
    assert ic.decode_base64(enc) == data
    # Standard alphabet + padding also accepted
    import base64

    assert ic.decode_base64(base64.b64encode(data).decode()) == data


def test_decode_header_unit_types():
    cases = [
        (META_UNIT, ic.MT.META, 0, ic.VS.V0, 64),
        (SEMANTIC_UNIT, ic.MT.SEMANTIC, 0, ic.VS.V0, 64),
        (CONTENT_UNIT, ic.MT.CONTENT, 0, ic.VS.V0, 64),
        (DATA_UNIT, ic.MT.DATA, 0, ic.VS.V0, 64),
        (INSTANCE_UNIT, ic.MT.INSTANCE, 0, ic.VS.V0, 64),
    ]
    for s, mt, st, vs, bits in cases:
        digest = ic.decode_base32(ic.iscc_clean(s))
        fields = ic.decode_header(digest)
        assert fields.maintype == mt
        assert fields.subtype == st
        assert fields.version == vs
        assert ic.decode_length(fields.maintype, fields.length) == bits
        assert len(fields.body) * 8 == bits


def test_decode_header_iscc_id():
    digest = ic.decode_base32(ic.iscc_clean(ISCC_ID))
    fields = ic.decode_header(digest)
    assert fields.maintype == ic.MT.ID
    assert fields.subtype == ic.ST_ID_REALM.REALM_0
    assert fields.version == ic.VS.V1
    assert fields.length == 0
    assert len(fields.body) == 8


def test_decode_header_composites():
    d = ic.decode_base32(ic.iscc_clean(ISCC_CODE_TEXT))
    f = ic.decode_header(d)
    assert f.maintype == ic.MT.ISCC
    assert f.subtype == ic.ST_ISCC.TEXT
    assert ic.decode_units(f.length) == (ic.MT.META, ic.MT.SEMANTIC, ic.MT.CONTENT)
    assert len(f.body) == 40

    d = ic.decode_base32(ic.iscc_clean(ISCC_CODE_IMAGE))
    f = ic.decode_header(d)
    assert f.subtype == ic.ST_ISCC.IMAGE
    assert ic.decode_units(f.length) == (ic.MT.META, ic.MT.CONTENT)
    assert len(f.body) == 32


def test_encode_header_roundtrip():
    for mt in range(8):
        for st in range(5):
            for vs in range(2):
                for ln in range(8):
                    hdr = ic.encode_header(mt, st, vs, ln)
                    assert len(hdr) == 2
                    fields = ic.decode_header(hdr + b"\x00" * 8)
                    assert (fields.maintype, fields.subtype, fields.version, fields.length) == (mt, st, vs, ln)


def test_encode_length():
    assert ic.encode_length(ic.MT.META, 64) == 1
    assert ic.encode_length(ic.MT.DATA, 256) == 7
    assert ic.encode_length(ic.MT.ID, 64) == 0
    with pytest.raises(ValueError):
        ic.encode_length(ic.MT.META, 63)
    with pytest.raises(ValueError):
        ic.encode_length(ic.MT.ISCC, 128)
    with pytest.raises(ValueError):
        ic.encode_length(ic.MT.ID, 128)


def test_decode_length():
    assert ic.decode_length(ic.MT.META, 1) == 64
    assert ic.decode_length(ic.MT.DATA, 7) == 256
    assert ic.decode_length(ic.MT.ID, 0) == 64
    assert ic.decode_length(ic.MT.ISCC, 7) == 3 * 64 + 128
    assert ic.decode_length(ic.MT.ISCC, 0, ic.ST_ISCC.WIDE) == 256


def test_units_bitfield():
    assert ic.encode_units(()) == 0
    assert ic.encode_units((ic.MT.CONTENT,)) == 1
    assert ic.encode_units((ic.MT.META, ic.MT.SEMANTIC, ic.MT.CONTENT)) == 7
    assert ic.decode_units(5) == (ic.MT.META, ic.MT.CONTENT)
    with pytest.raises(ValueError):
        ic.decode_units(8)


def test_gen_iscc_code_roundtrip_standard():
    # Compose from the reference's example units, decompose via models, compare.
    from iscc_search_tpu.models import IsccCode

    units = [META_UNIT, SEMANTIC_UNIT, CONTENT_UNIT, DATA_UNIT, INSTANCE_UNIT]
    code = ic.gen_iscc_code_v0(units, wide=True)["iscc"]
    assert code == ISCC_CODE_TEXT
    decomposed = [str(u) for u in IsccCode(code).units]
    assert decomposed == units


def test_gen_iscc_code_wide():
    from iscc_search_tpu.models import IsccCode

    data = ic.encode_header(ic.MT.DATA, 0, 0, ic.encode_length(ic.MT.DATA, 128)) + bytes(range(16))
    inst = ic.encode_header(ic.MT.INSTANCE, 0, 0, ic.encode_length(ic.MT.INSTANCE, 128)) + bytes(range(16, 32))
    code = ic.gen_iscc_code_v0([data, inst], wide=True)["iscc"]
    assert code.startswith("ISCC:K4A")  # canonical WIDE prefix
    fields = ic.decode_header(ic.decode_base32(ic.iscc_clean(code)))
    assert fields.subtype == ic.ST_ISCC.WIDE
    units = IsccCode(code).units
    assert [u.iscc_type for u in units] == ["DATA_NONE_V0", "INSTANCE_NONE_V0"]
    assert units[0].body == bytes(range(16))
    assert units[1].body == bytes(range(16, 32))


def test_gen_iscc_code_sum():
    data = ic.encode_header(ic.MT.DATA, 0, 0, 1) + bytes(8)
    inst = ic.encode_header(ic.MT.INSTANCE, 0, 0, 1) + bytes(8)
    code = ic.gen_iscc_code_v0([data, inst], wide=False)["iscc"]
    fields = ic.decode_header(ic.decode_base32(ic.iscc_clean(code)))
    assert fields.subtype == ic.ST_ISCC.SUM
    # wide=True on 64-bit bodies falls back to SUM transparently
    code2 = ic.gen_iscc_code_v0([data, inst], wide=True)["iscc"]
    assert code2 == code


def test_gen_iscc_code_missing_required():
    with pytest.raises(ValueError):
        ic.gen_iscc_code_v0([META_UNIT, CONTENT_UNIT])


def test_gen_iscc_code_rejects_id_units():
    with pytest.raises(ValueError):
        ic.gen_iscc_code_v0([ISCC_ID, DATA_UNIT, INSTANCE_UNIT])


def test_gen_iscc_id_v1():
    res = ic.gen_iscc_id_v1(timestamp_us=1234567, server_id=42, realm_id=0)
    digest = res["digest"]
    fields = ic.decode_header(digest)
    assert fields.maintype == ic.MT.ID
    assert fields.subtype == 0
    assert fields.version == ic.VS.V1
    key = int.from_bytes(fields.body, "big")
    assert key >> 12 == 1234567
    assert key & 0xFFF == 42


def test_gen_iscc_id_v1_validation():
    with pytest.raises(ValueError):
        ic.gen_iscc_id_v1(server_id=5000)
    with pytest.raises(ValueError):
        ic.gen_iscc_id_v1(realm_id=3)
    with pytest.raises(ValueError):
        ic.gen_iscc_id_v1(timestamp_us=1 << 52)


def test_encode_component():
    digest32 = bytes(range(32))
    s = ic.encode_component(ic.MT.INSTANCE, ic.ST.NONE, ic.VS.V0, 256, digest32)
    fields = ic.decode_header(ic.decode_base32(s))
    assert fields.maintype == ic.MT.INSTANCE
    assert fields.body == digest32
    with pytest.raises(ValueError):
        ic.encode_component(ic.MT.INSTANCE, 0, 0, 256, b"short")


def test_meta_256_header():
    digest = ic.decode_base32(ic.iscc_clean(META_256))
    fields = ic.decode_header(digest)
    assert fields.maintype == ic.MT.META
    assert ic.decode_length(fields.maintype, fields.length) == 256
    assert len(fields.body) == 32


# ----------------------------------------------------------- fuzz roundtrips


def test_fuzz_header_roundtrip():
    """Random (mt, st, vs, ln) headers roundtrip through encode/decode,
    including multi-nibble varnibble values past the fast path."""
    import random

    rnd = random.Random(1234)
    for _ in range(2000):
        mt = rnd.randint(0, 7)
        st = rnd.randint(0, 7) if rnd.random() < 0.9 else rnd.randint(8, 71)
        vs = rnd.randint(0, 7) if rnd.random() < 0.9 else rnd.randint(8, 71)
        ln = rnd.randint(0, 7) if rnd.random() < 0.9 else rnd.randint(8, 71)
        tail = bytes([rnd.randint(0, 255) for _ in range(rnd.randint(0, 8))])
        data = ic.encode_header(mt, st, vs, ln) + tail
        f = ic.decode_header(data)
        assert (f.maintype, f.subtype, f.version, f.length) == (mt, st, vs, ln)
        assert f.body == tail


def test_fuzz_base32_roundtrip():
    import random

    rnd = random.Random(99)
    for _ in range(500):
        raw = bytes([rnd.randint(0, 255) for _ in range(rnd.randint(1, 40))])
        enc = ic.encode_base32(raw)
        assert ic.decode_base32(enc) == raw
        assert ic.decode_base32(enc.lower()) == raw  # case-insensitive


def test_fuzz_decode_garbage_never_crashes_unexpectedly():
    """Arbitrary byte soup either decodes or raises ValueError — nothing else."""
    import random

    rnd = random.Random(7)
    for _ in range(1000):
        blob = bytes([rnd.randint(0, 255) for _ in range(rnd.randint(0, 12))])
        try:
            ic.decode_header(blob)
        except ValueError:
            pass
        s = "".join(rnd.choice("ABCDEFGHIJKLMNOPQRSTUVWXYZ234567=!abc089 ") for _ in range(rnd.randint(0, 16)))
        try:
            ic.decode_base32(s)
        except ValueError:
            pass
