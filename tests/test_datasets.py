"""DataSet framework: registry, fetch-once, manifest, version, clients."""

from __future__ import annotations

import json

import pytest

from obsplus_spark.structures.datasets import (
    DataSet,
    DataVersionError,
    FileHashChangedError,
    MissingDataFileError,
    SyntheticDataSet,
    load_dataset,
)


@pytest.fixture()
def ds(spark, tmp_path):
    return load_dataset("synthetic", spark, base_path=tmp_path)


def test_registry_and_first_load(spark, tmp_path):
    assert "synthetic" in DataSet._datasets
    with pytest.raises(ValueError, match="unknown dataset"):
        load_dataset("nope", spark, base_path=tmp_path)
    ds = load_dataset("synthetic", spark, base_path=tmp_path)
    assert ds.data_loaded
    assert not ds.events_need_downloading
    assert not ds.waveforms_need_downloading
    assert not ds.stations_need_downloading
    assert ds.read_data_version() == SyntheticDataSet.version
    # second load hits the instance cache
    assert load_dataset("synthetic", spark, base_path=tmp_path) is ds


def test_clients_and_fetcher(ds):
    assert ds.event_client.read_index().count() == SyntheticDataSet.n_events
    assert (
        ds.waveform_client.read_index().count() == SyntheticDataSet.n_channels
    )
    assert ds.station_client.count() == SyntheticDataSet.n_channels
    fetcher = ds.get_fetcher()
    assert fetcher.events.count() == SyntheticDataSet.n_events
    assert fetcher.stations.count() == SyntheticDataSet.n_channels


def test_hash_manifest_roundtrip(ds):
    out = ds.create_sha256_hash()
    assert out  # parquet files hashed
    manifest = json.loads((ds.data_path / ds._hash_filename).read_text())
    assert manifest == dict(sorted(out.items()))
    # untouched data passes, even with strict hash checking
    ds.check_hashes(check_hash=True)

    # corrupt one data file → strict check raises, lax check passes.
    # (Drop Hadoop's local-fs .crc sidecar: on real object stores there is
    # no sidecar, and here it would reject the read before hashing.)
    victim = next(p for p in ds.event_path.rglob("*.parquet") if p.is_file())
    victim.write_bytes(victim.read_bytes() + b"tampered")
    crc = victim.parent / f".{victim.name}.crc"
    if crc.exists():
        crc.unlink()
    with pytest.raises(FileHashChangedError):
        ds.check_hashes(check_hash=True)
    ds.check_hashes(check_hash=False)

    # delete a manifest file → always raises
    victim.unlink()
    with pytest.raises(MissingDataFileError):
        ds.check_hashes(check_hash=False)


def test_version_semantics(spark, tmp_path, ds):
    # older on-disk version → hard error with redownload advice
    ds._version_path.write_text("0.0.1")
    with pytest.raises(DataVersionError, match="out of date"):
        ds.check_version()
    # newer on-disk version → warn, don't raise
    ds._version_path.write_text("9.9.9")
    with pytest.warns(UserWarning, match="mismatch"):
        assert ds.check_version() is True
    # malformed version string → invalid
    ds._version_path.write_text("not-a-version")
    with pytest.raises(ValueError):
        ds.read_data_version()


def test_copy_to_and_delete(ds, tmp_path):
    dest = tmp_path / "copydest"
    twin = ds.copy_to(dest)
    assert twin.data_path != ds.data_path
    assert twin.event_client.read_index().count() == SyntheticDataSet.n_events
    twin.delete_data_directory()
    assert not twin.data_path.exists()


def test_no_redownload_when_present(spark, tmp_path, monkeypatch):
    load_dataset("synthetic", spark, base_path=tmp_path)
    # clear the instance cache to force a fresh lifecycle pass
    DataSet._loaded.clear()
    calls = {"n": 0}
    orig = SyntheticDataSet.download_events

    def counting(self):
        calls["n"] += 1
        return orig(self)

    monkeypatch.setattr(SyntheticDataSet, "download_events", counting)
    load_dataset("synthetic", spark, base_path=tmp_path)
    assert calls["n"] == 0  # data already on disk → hooks not re-run
