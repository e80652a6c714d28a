"""Hub ingest row conversion tests (pure parts of cli/hub.py)."""

import json

import pytest

from iscc_search_tpu import codec as ic
from iscc_search_tpu.cli.hub import _IdGenerator, row_to_entry

from tests.conftest import make_unit

DATA = make_unit(ic.MT.DATA, 0, 64)
INST = make_unit(ic.MT.INSTANCE, 0, 64)
CODE = ic.gen_iscc_code_v0([DATA, INST], wide=False)["iscc"]


def test_id_generator_monotonic():
    gen = _IdGenerator()
    ids = [gen.next() for _ in range(5)]
    assert len(set(ids)) == 5
    keys = [int.from_bytes(ic.decode_base32(i.removeprefix("ISCC:"))[2:], "big") for i in ids]
    assert keys == sorted(keys)


def test_row_with_iscc_code():
    gen = _IdGenerator()
    entry = row_to_entry({"iscc": CODE, "name": "Title"}, gen)
    assert entry.iscc_code == CODE
    assert len(entry.units) == 2
    assert entry.metadata == {"name": "Title"}
    assert entry.iscc_id.startswith("ISCC:")


def test_row_with_units():
    gen = _IdGenerator()
    entry = row_to_entry({"units": [DATA, INST]}, gen)
    assert entry.units == [DATA, INST]


def test_row_without_code_skipped():
    gen = _IdGenerator()
    assert row_to_entry({"name": "no code"}, gen) is None


def test_row_with_features_json_string():
    gen = _IdGenerator()
    features = json.dumps(
        [
            {
                "maintype": "content",
                "subtype": "text",
                "version": 0,
                "simprints": [ic.encode_base64(bytes(range(16)))],
                "offsets": [0],
                "sizes": [42],
            }
        ]
    )
    entry = row_to_entry({"iscc": CODE, "features": features}, gen)
    assert entry.simprints is not None
    assert "CONTENT_TEXT_V0" in entry.simprints
    assert entry.simprints["CONTENT_TEXT_V0"][0].size == 42


def test_row_with_bad_features_ignored():
    gen = _IdGenerator()
    entry = row_to_entry({"iscc": CODE, "features": "{notjson"}, gen)
    assert entry is not None
    assert entry.simprints is None


def test_hub_command_skips_bad_rows_and_closes_on_error(tmp_path, monkeypatch):
    """One malformed row is skipped; a mid-ingest crash still closes the
    index (try/finally — derived segments flush even on failure)."""
    import sys
    import types

    from click.testing import CliRunner

    from iscc_search_tpu.cli import cli
    from iscc_search_tpu.cli import common as cli_common
    from iscc_search_tpu.config import ConfigManager

    manager = ConfigManager(config_dir=tmp_path / "cfg")
    cli_common.set_config_manager(manager)
    try:
        rows = [
            {"units": [DATA, INST]},
            {"iscc": "ISCC:NOTVALID!"},  # malformed -> skipped, not fatal
            {"units": [DATA, INST]},
        ]

        class FakeBatch:
            def to_pylist(self):
                return rows

        class FakeParquet:
            def __init__(self, _):
                pass

            def iter_batches(self, batch_size):
                yield FakeBatch()

        fake_hf = types.SimpleNamespace(
            list_repo_files=lambda ds, repo_type: ["data.parquet"],
            hf_hub_download=lambda ds, f, repo_type: str(tmp_path / "data.parquet"),
        )
        fake_pq = types.SimpleNamespace(ParquetFile=FakeParquet)
        monkeypatch.setitem(sys.modules, "huggingface_hub", fake_hf)
        monkeypatch.setitem(sys.modules, "pyarrow", types.SimpleNamespace(parquet=fake_pq))
        monkeypatch.setitem(sys.modules, "pyarrow.parquet", fake_pq)

        r = CliRunner()
        r.invoke(cli, ["index", "add", "main", "--path", str(tmp_path / "data")])
        result = r.invoke(cli, ["hub", "some/dataset"])
        assert result.exit_code == 0, result.output
        assert "Ingested 2 assets" in result.output

        # Failure mid-ingest must still close the index (no unraisable state)
        closed = {"n": 0}
        real_get_active = cli_common.get_active_index

        def tracking_get_active(index_name=None):
            idx, name = real_get_active(index_name)
            real_close = idx.close

            def close():
                closed["n"] += 1
                real_close()

            idx.close = close
            return idx, name

        def boom(ds, f, repo_type):
            raise OSError("network down")

        fake_hf.hf_hub_download = boom
        monkeypatch.setattr("iscc_search_tpu.cli.hub.get_active_index", tracking_get_active)
        result = r.invoke(cli, ["hub", "some/dataset"])
        assert result.exit_code != 0
        assert closed["n"] == 1
    finally:
        cli_common.set_config_manager(None)


def test_row_with_iscc_code_key_variant():
    """Datasets that name the column iscc_code (not iscc) still convert."""
    gen = _IdGenerator()
    entry = row_to_entry({"iscc_code": CODE}, gen)
    assert entry.iscc_code == CODE
    assert entry.units  # derived from the code


def test_row_with_both_code_and_units_keeps_given_units():
    gen = _IdGenerator()
    entry = row_to_entry({"iscc": CODE, "units": [DATA, INST]}, gen)
    assert entry.iscc_code == CODE
    assert sorted(entry.units) == sorted([DATA, INST])


def test_row_with_empty_features_list_has_no_simprints():
    gen = _IdGenerator()
    entry = row_to_entry({"iscc": CODE, "features": []}, gen)
    assert entry.simprints is None


def test_row_with_features_already_a_list_and_all_junk():
    """Non-string features skip the JSON parse; junk features yield no
    simprints key (parse_simprints_from_features returns falsy)."""
    gen = _IdGenerator()
    entry = row_to_entry({"iscc": CODE, "features": [{"maintype": "junk"}]}, gen)
    assert entry.simprints is None


def test_hub_command_simprint_bits_none_rows_and_exact_batches(tmp_path, monkeypatch):
    """--simprint-bits engages truncation; codeless rows are skipped (None
    entries); an exact batch-size multiple leaves the final flush empty."""
    import sys
    import types

    from click.testing import CliRunner

    from iscc_search_tpu.cli import cli
    from iscc_search_tpu.cli import common as cli_common
    from iscc_search_tpu.config import ConfigManager

    manager = ConfigManager(config_dir=tmp_path / "cfg")
    cli_common.set_config_manager(manager)
    try:
        features = json.dumps(
            [
                {
                    "maintype": "content",
                    "subtype": "text",
                    "version": 0,
                    "simprints": [ic.encode_base64(bytes(range(32)))],
                    "offsets": [0],
                    "sizes": [100],
                }
            ]
        )
        rows = [
            {"name": "codeless row"},  # row_to_entry -> None, skipped silently
            {"iscc": CODE, "features": features},
            {"units": [DATA, INST]},
            {"iscc_code": CODE},
            {"units": [DATA, INST]},
        ]

        class FakeBatch:
            def to_pylist(self):
                return rows

        class FakeParquet:
            def __init__(self, _):
                pass

            def iter_batches(self, batch_size):
                yield FakeBatch()

        fake_hf = types.SimpleNamespace(
            list_repo_files=lambda ds, repo_type: ["data.parquet"],
            hf_hub_download=lambda ds, f, repo_type: str(tmp_path / "data.parquet"),
        )
        fake_pq = types.SimpleNamespace(ParquetFile=FakeParquet)
        monkeypatch.setitem(sys.modules, "huggingface_hub", fake_hf)
        monkeypatch.setitem(sys.modules, "pyarrow", types.SimpleNamespace(parquet=fake_pq))
        monkeypatch.setitem(sys.modules, "pyarrow.parquet", fake_pq)

        r = CliRunner()
        r.invoke(cli, ["index", "add", "main", "--path", str(tmp_path / "data")])
        # 4 valid rows at --batch-size 2: two in-loop flushes, empty final flush
        result = r.invoke(
            cli, ["hub", "some/dataset", "--simprint-bits", "128", "--batch-size", "2"]
        )
        assert result.exit_code == 0, result.output
        assert "Ingested 4 assets" in result.output
    finally:
        cli_common.set_config_manager(None)


def test_simprint_bits_truncation_is_prefix_preserving():
    from iscc_search_tpu.cli.common import parse_simprints_from_features

    raw = bytes(range(32))
    features = [
        {
            "maintype": "content",
            "subtype": "text",
            "version": 0,
            "simprints": [ic.encode_base64(raw)],
            "offsets": [0],
            "sizes": [100],
        }
    ]
    out = parse_simprints_from_features(features, simprint_bits=128)
    [sp] = out["CONTENT_TEXT_V0"]
    assert ic.decode_base64(sp["simprint"]) == raw[:16]
