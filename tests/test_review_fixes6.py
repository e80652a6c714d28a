"""Regression tests for the memory/remote/models/commons review findings.

1. ISCC-IDs with realm subtypes 2-7 passed validation but poisoned the
   index (nothing downstream can reconstruct them) — now rejected at
   ingest/query validation, and IsccID.from_int/from_body guard the range
   (a negative realm silently wrapped to the other realm).
2. MemoryIndex had no synchronization under the thread-per-request
   server and committed half a batch on a mid-batch validation error.
3. A composite ISCC-CODE with TRAILING bytes decomposed DATA/INSTANCE
   from the wrong byte ranges (end-anchored slices); now rejected.
4. Corrupt stored asset records raised ValueError (mapped to HTTP 400,
   blaming the client); now RuntimeError -> 500.
"""

import threading

import pytest

from iscc_search_tpu import codec as ic
from iscc_search_tpu.indexes import common
from iscc_search_tpu.indexes.memory import MemoryIndex
from iscc_search_tpu.models import IsccCode, IsccID
from iscc_search_tpu.schema import IsccEntry, IsccIndex

from tests.conftest import make_iscc_id, make_unit


# 1. ---------------------------------------------------------------------


def test_unsupported_realm_rejected_at_validation():
    digest = ic.encode_header(ic.MT.ID, 3, ic.VS.V1, 0) + b"\x00" * 8
    crafted = "ISCC:" + ic.encode_base32(digest)
    with pytest.raises(ValueError, match="realm"):
        common.validate_iscc_id(crafted)
    with pytest.raises(ValueError, match="realm"):
        common.parse_iscc_id(crafted)


def test_unsupported_realm_rejected_at_ingest(tmp_path):
    from iscc_search_tpu.indexes.tpu import TpuIndex

    digest = ic.encode_header(ic.MT.ID, 5, ic.VS.V1, 0) + b"\x01" * 8
    crafted = "ISCC:" + ic.encode_base32(digest)
    idx = TpuIndex(tmp_path / "idx")
    try:
        entry = IsccEntry.model_construct(
            iscc_id=crafted, units=[make_unit(3, 0, 64), make_unit(4, 0, 64)]
        )
        with pytest.raises(ValueError, match="realm"):
            idx.add_assets([entry])
        assert len(idx) == 0  # nothing committed, index not poisoned
    finally:
        idx.close()


def test_from_int_rejects_out_of_range_realm():
    with pytest.raises(ValueError, match="realm"):
        IsccID.from_int(42, 2)
    with pytest.raises(ValueError, match="realm"):
        IsccID.from_int(42, -1)  # previously wrapped silently to realm 1
    with pytest.raises(ValueError, match="realm"):
        IsccID.from_body(b"\x00" * 8, 3)


# 2. ---------------------------------------------------------------------


def test_memory_backend_all_or_nothing():
    idx = MemoryIndex()
    idx.create_index(IsccIndex(name="m"))
    good = IsccEntry(iscc_id=make_iscc_id(1), units=[make_unit(3, 0, 64), make_unit(4, 0, 64)])
    bad = IsccEntry.model_construct(iscc_id=None, units=None)
    with pytest.raises(ValueError):
        idx.add_assets("m", [good, bad])
    assert idx.get_index("m").assets == 0  # good was NOT half-committed


def test_memory_backend_concurrent_add_and_search():
    from iscc_search_tpu.schema import IsccQuery

    idx = MemoryIndex()
    idx.create_index(IsccIndex(name="m"))
    seed = IsccEntry(iscc_id=make_iscc_id(0), units=[make_unit(3, 0, 64), make_unit(4, 0, 64)])
    idx.add_assets("m", [seed])
    errors = []
    stop = threading.Event()

    def adder():
        i = 1
        try:
            while not stop.is_set():
                e = IsccEntry(
                    iscc_id=make_iscc_id(i), units=[make_unit(3, 0, 64), make_unit(4, 0, 64)]
                )
                idx.add_assets("m", [e])
                i += 1
        except Exception as e:
            errors.append(repr(e))

    def searcher():
        try:
            q = IsccQuery(iscc_code=ic.gen_iscc_code_v0(seed.units)["iscc"])
            for _ in range(300):
                idx.search_assets("m", q, limit=10)
                idx.list_indexes()
        except Exception as e:
            errors.append(repr(e))

    threads = [threading.Thread(target=adder), threading.Thread(target=searcher)]
    for t in threads:
        t.start()
    threads[1].join(timeout=30)
    stop.set()
    threads[0].join(timeout=30)
    assert errors == []  # no "dictionary changed size during iteration"


# 3. ---------------------------------------------------------------------


def test_composite_with_trailing_bytes_rejected():
    units = [make_unit(ic.MT.DATA, 0, 64), make_unit(ic.MT.INSTANCE, 0, 64)]
    code = ic.gen_iscc_code_v0(units)["iscc"]
    digest = ic.decode_base32(code.removeprefix("ISCC:"))
    padded = "ISCC:" + ic.encode_base32(digest + b"\xaa" * 8)  # 8 trailing bytes
    with pytest.raises(ValueError, match="too short|!="):
        IsccCode(padded).units


# 4. ---------------------------------------------------------------------


def test_corrupt_stored_record_is_server_fault(tmp_path):
    import httpx

    from iscc_search_tpu.indexes.kv.index import KvIndex
    from iscc_search_tpu.options import SearchOptions, get_index
    from iscc_search_tpu.server.app import create_app

    base = tmp_path / "srv"
    opts = SearchOptions(index_uri=f"kv://{base}")
    index = get_index(opts.index_uri)
    app = create_app(index=index, opts=opts)
    transport = httpx.WSGITransport(app=app)
    with httpx.Client(transport=transport, base_url="http://testserver") as c:
        c.post("/indexes", json={"name": "idx"})
        iscc_id = make_iscc_id(9)
        entry = {"iscc_id": iscc_id, "units": [make_unit(3, 0, 64), make_unit(4, 0, 64)]}
        assert c.post("/indexes/idx/assets", json=[entry]).status_code == 201
        # Corrupt the stored record behind the server's back
        kv = index._get_or_load("idx")  # type: KvIndex
        kv.store.put("assets", iscc_id.encode(), b"{corrupt")
        r = c.get(f"/indexes/idx/assets/{iscc_id}")
        assert r.status_code == 500, r.text  # server fault, not 400 user error
    index.close()
