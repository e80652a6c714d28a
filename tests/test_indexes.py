"""Backend-parametrized protocol integration tests.

Mirrors the reference's backend_index fixture strategy (tests/conftest.py:361)
so every protocol behavior is exercised against memory, kv, and tpu backends.
"""

import pytest

from iscc_search_tpu.indexes.kv import KvIndexManager
from iscc_search_tpu.indexes.memory import MemoryIndex
from iscc_search_tpu.indexes.tpu import TpuIndexManager
from iscc_search_tpu.protocols.index import IsccIndexProtocol
from iscc_search_tpu.schema import IsccEntry, IsccIndex, IsccQuery


@pytest.fixture(params=["memory", "kv", "tpu"])
def backend(request, tmp_path):
    if request.param == "memory":
        idx = MemoryIndex()
    elif request.param == "kv":
        idx = KvIndexManager(tmp_path / "kv")
    else:
        idx = TpuIndexManager(tmp_path / "tpu")
    yield idx
    idx.close()


def test_protocol_conformance(backend):
    assert isinstance(backend, IsccIndexProtocol)


def test_protocol_rejects_incomplete():
    class Incomplete:
        def list_indexes(self):
            return []

    assert not isinstance(Incomplete(), IsccIndexProtocol)


def test_create_list_get_delete(backend):
    created = backend.create_index(IsccIndex(name="myindex"))
    assert created.name == "myindex"
    assert created.assets == 0

    names = [i.name for i in backend.list_indexes()]
    assert "myindex" in names

    info = backend.get_index("myindex")
    assert info.assets == 0

    backend.delete_index("myindex")
    assert "myindex" not in [i.name for i in backend.list_indexes()]


def test_create_duplicate_raises(backend):
    backend.create_index(IsccIndex(name="dup"))
    with pytest.raises(FileExistsError):
        backend.create_index(IsccIndex(name="dup"))


def test_create_invalid_name_raises(backend):
    with pytest.raises(Exception):  # pydantic ValidationError or ValueError
        backend.create_index(IsccIndex(name="Invalid-Name"))


def test_get_missing_index_raises(backend):
    with pytest.raises(FileNotFoundError):
        backend.get_index("missing")
    with pytest.raises(FileNotFoundError):
        backend.delete_index("missing")


def test_add_and_get_asset(backend, entry_factory):
    backend.create_index(IsccIndex(name="idx"))
    entry = entry_factory(metadata={"name": "Test Asset"})
    results = backend.add_assets("idx", [IsccEntry(**entry)])
    assert len(results) == 1
    assert results[0].status == "created"
    assert results[0].iscc_id == entry["iscc_id"]

    fetched = backend.get_asset("idx", entry["iscc_id"])
    assert fetched.iscc_id == entry["iscc_id"]
    assert fetched.units == entry["units"]
    assert fetched.metadata == {"name": "Test Asset"}


def test_add_update_status(backend, entry_factory):
    backend.create_index(IsccIndex(name="idx"))
    entry = entry_factory()
    assert backend.add_assets("idx", [IsccEntry(**entry)])[0].status == "created"
    assert backend.add_assets("idx", [IsccEntry(**entry)])[0].status == "updated"


def test_add_missing_iscc_id_raises(backend, entry_factory):
    backend.create_index(IsccIndex(name="idx"))
    entry = entry_factory()
    del entry["iscc_id"]
    with pytest.raises(ValueError):
        backend.add_assets("idx", [IsccEntry(**entry)])


def test_add_to_missing_index_raises(backend, entry_factory):
    with pytest.raises(FileNotFoundError):
        backend.add_assets("missing", [IsccEntry(**entry_factory())])


def test_get_missing_asset_raises(backend, entry_factory):
    backend.create_index(IsccIndex(name="idx"))
    backend.add_assets("idx", [IsccEntry(**entry_factory())])
    with pytest.raises(FileNotFoundError):
        backend.get_asset("idx", "ISCC:MAIGIIFJRDGEQQAA")


def test_search_exact_self_match(backend, entry_factory):
    backend.create_index(IsccIndex(name="idx"))
    entries = [entry_factory() for _ in range(5)]
    backend.add_assets("idx", [IsccEntry(**e) for e in entries])

    result = backend.search_assets("idx", IsccQuery(units=entries[2]["units"]), limit=10)
    top = result.global_matches[0]
    assert top.iscc_id == entries[2]["iscc_id"]
    assert top.score == pytest.approx(1.0)
    assert all(v == pytest.approx(1.0) for v in top.types.values())


def test_search_by_iscc_id_excludes_self(backend, entry_factory):
    backend.create_index(IsccIndex(name="idx"))
    e1, e2 = entry_factory(), entry_factory()
    # Identical units/code for both assets so each matches the other at 1.0
    e2["units"] = e1["units"]
    e2["iscc_code"] = e1["iscc_code"]
    backend.add_assets("idx", [IsccEntry(**e1), IsccEntry(**e2)])

    result = backend.search_assets("idx", IsccQuery(iscc_id=e1["iscc_id"]), limit=10)
    ids = [m.iscc_id for m in result.global_matches]
    assert e1["iscc_id"] not in ids
    assert e2["iscc_id"] in ids


def test_search_by_missing_iscc_id_raises(backend, entry_factory):
    backend.create_index(IsccIndex(name="idx"))
    backend.add_assets("idx", [IsccEntry(**entry_factory())])
    with pytest.raises(FileNotFoundError):
        backend.search_assets("idx", IsccQuery(iscc_id="ISCC:MAIGIIFJRDGEQQAA"))


def test_search_empty_query_raises(backend, entry_factory):
    backend.create_index(IsccIndex(name="idx"))
    backend.add_assets("idx", [IsccEntry(**entry_factory())])
    with pytest.raises(ValueError):
        backend.search_assets("idx", IsccQuery())


def test_search_by_iscc_code(backend, entry_factory):
    from iscc_search_tpu import codec as ic

    backend.create_index(IsccIndex(name="idx"))
    entry = entry_factory()
    backend.add_assets("idx", [IsccEntry(**entry)])
    code = ic.gen_iscc_code_v0(entry["units"], wide=True)["iscc"]
    result = backend.search_assets("idx", IsccQuery(iscc_code=code), limit=5)
    assert result.global_matches[0].iscc_id == entry["iscc_id"]


def test_realm_mismatch_rejected(backend, entry_factory):
    from tests.conftest import make_iscc_id

    backend.create_index(IsccIndex(name="idx"))
    e1 = entry_factory()
    backend.add_assets("idx", [IsccEntry(**e1)])
    if isinstance(backend, MemoryIndex):
        pytest.skip("memory backend does not enforce realms")
    e2 = entry_factory()
    e2["iscc_id"] = make_iscc_id(999, realm_id=1)
    with pytest.raises(ValueError):
        backend.add_assets("idx", [IsccEntry(**e2)])


def test_close_idempotent(backend):
    backend.close()
    backend.close()


def test_crafted_names_rejected_before_filesystem(backend, tmp_path):
    """Names like '..' must never address paths outside the base directory."""
    if isinstance(backend, MemoryIndex):
        pytest.skip("memory backend has no filesystem")
    for name in ("..", "a..b", "UPPER"):
        with pytest.raises((ValueError, FileNotFoundError)):
            backend.get_index(name)
        with pytest.raises((ValueError, FileNotFoundError)):
            backend.delete_index(name)
    # Specifically: '..' raises ValueError (pattern), not a path operation
    with pytest.raises(ValueError):
        backend.delete_index("..")
