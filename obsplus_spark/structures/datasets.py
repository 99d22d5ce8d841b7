"""Named-dataset framework: fetch-once, verify, serve (reference
``datasets/dataset.py:48-685``).

The reference's ``DataSet`` downloads seismic data into an ``opsdata``
directory tree, guards it with a sha256 manifest + semantic version file,
and serves obspy clients. Re-expressed Spark-first:

- **storage** is a directory of parquet tables / bank directories rather
  than miniSEED+SQLite; "download" hooks are Spark jobs that materialize
  tables (subclasses may fetch from anywhere — the contract is only that
  the hook leaves parquet under ``data_path``).
- **hash manifest** (``create_sha256_hash``, reference ``:493-521``) is a
  distributed ``binaryFile`` scan + ``sha2(content, 256)`` — the hash of a
  multi-TB dataset is one map-only Spark job, not a driver loop; the
  manifest itself stays a tiny sorted json for git-friendliness.
- **clients** are bank facades (:class:`EventBank` / :class:`WaveBank`)
  and DataFrames; ``get_fetcher`` wires them into a
  :class:`~obsplus_spark.structures.fetcher.Fetcher` exactly like the
  reference's ``get_fetcher`` (reference ``:239-257``).

Lifecycle parity (reference ``load_dataset`` / ``_run_downloads``):
first load copies ``source_path`` → ``data_path`` (copy-on-first-use),
runs each ``download_*`` hook whose data is missing, writes the version
file, then verifies; later loads re-verify hashes + version and raise
:class:`DataVersionError` / :class:`FileHashChangedError` /
:class:`MissingDataFileError` with the reference's escalation rules.
"""

from __future__ import annotations

import abc
import json
import os
import shutil
import warnings
from pathlib import Path
from typing import ClassVar

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class DataVersionError(ValueError):
    """Dataset version on disk is incompatible (reference exceptions)."""


class FileHashChangedError(ValueError):
    """A data file's sha256 no longer matches the manifest."""


class MissingDataFileError(FileNotFoundError):
    """A manifest file is absent from the data directory."""


def _version_tuple(version: str) -> tuple[int, int, int]:
    parts = version.strip().split(".")
    if len(parts) != 3 or not all(p.isdigit() for p in parts):
        raise ValueError(f"{version!r} is not a xx.yy.zz version string")
    return tuple(int(p) for p in parts)  # type: ignore[return-value]


def hash_file_df(
    spark: SparkSession, path: str | os.PathLike, exclude: tuple[str, ...] = ()
) -> DataFrame:
    """Distributed sha256 of every file under ``path``: one binaryFile
    scan, one JVM ``sha2`` per file — no bytes on the driver. Returns
    (rel_path, sha256). Hidden files (``.``/``_`` prefixes) are excluded
    by the source's listing rules, matching the reference default."""
    root = str(Path(path).resolve())
    # drop any cached FileStatus for this tree: verification must see the
    # files as they are NOW (a stale cached length aborts the binary read)
    spark.catalog.refreshByPath(root)
    df = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(root)
    )
    rel = F.regexp_replace(
        F.regexp_replace(F.col("path"), "^file:", ""), re_escape(root) + "/?", ""
    )
    out = df.select(
        rel.alias("rel_path"), F.sha2(F.col("content"), 256).alias("sha256")
    )
    if exclude:
        out = out.filter(~F.element_at(F.split("rel_path", "/"), -1).isin(*exclude))
    return out


def re_escape(s: str) -> str:
    import re

    return re.escape(s)


class DataSet(abc.ABC):
    """Abstract fetch-once dataset (subclass and set ``name``/``version``).

    Subclasses implement the three ``download_*`` hooks as Spark jobs and
    are auto-registered by class definition (reference
    ``__init_subclass__`` ``:120-127``); ``DataSet.load_dataset(name)``
    instantiates from the registry.
    """

    _datasets: ClassVar[dict[str, type["DataSet"]]] = {}
    _loaded: ClassVar[dict[tuple[str, str], "DataSet"]] = {}

    _version_filename = "dataset_version.txt"
    _hash_filename = "dataset_hash.json"
    _saved_path_filename = ".dataset_data_path.txt"
    _hash_excludes = (
        "readme.txt",
        _version_filename,
        _hash_filename,
        _saved_path_filename,
        "_last_update.json",
        "meta.json",
        "_SUCCESS",
    )

    #: subclass contract
    name: ClassVar[str]
    version: ClassVar[str] = "0.0.0"

    data_loaded = False

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        if getattr(cls, "name", None):
            DataSet._datasets[cls.name.lower()] = cls

    def __init__(self, spark: SparkSession, base_path: str | os.PathLike | None = None):
        self.spark = spark
        self.base_path = Path(self._resolve_base_path(base_path))
        self.data_path.mkdir(parents=True, exist_ok=True)

    # -- path resolution (reference ``:129-157``, priority chain) ----------
    def _resolve_base_path(self, base_path) -> Path:
        if base_path is not None:
            return Path(base_path)
        saved = Path(self.source_path) / self._saved_path_filename
        if saved.exists():
            return Path(saved.read_text().strip())
        env = os.environ.get("OPSDATA_PATH")
        if env:
            return Path(env)
        return Path.home() / "opsdata"

    @property
    def data_path(self) -> Path:
        return self.base_path / self.name

    @property
    def source_path(self) -> Path:
        """Files shipped with the dataset's code (copied on first use)."""
        import inspect

        try:
            here = Path(inspect.getfile(self.__class__)).parent
        except (TypeError, OSError):
            return Path(".") / self.name
        return here / self.name

    # -- client paths -------------------------------------------------------
    @property
    def waveform_path(self) -> Path:
        return self.data_path / "waveforms"

    @property
    def event_path(self) -> Path:
        return self.data_path / "events"

    @property
    def station_path(self) -> Path:
        return self.data_path / "stations"

    @property
    def waveforms_need_downloading(self) -> bool:
        return not any(self.waveform_path.glob("**/*"))

    @property
    def events_need_downloading(self) -> bool:
        return not any(self.event_path.glob("**/*"))

    @property
    def stations_need_downloading(self) -> bool:
        return not any(self.station_path.glob("**/*"))

    # -- lifecycle ----------------------------------------------------------
    @classmethod
    def load_dataset(
        cls,
        name: str,
        spark: SparkSession,
        base_path: str | os.PathLike | None = None,
    ) -> "DataSet":
        """Registry lookup → instantiate → download-if-needed → verify
        (reference ``:273-318``)."""
        key = name.lower()
        if key not in cls._datasets:
            raise ValueError(
                f"unknown dataset {name!r}; registered: {sorted(cls._datasets)}"
            )
        ds = cls._datasets[key](spark, base_path=base_path)
        cache_key = (key, str(ds.data_path))
        cached = cls._loaded.get(cache_key)
        if cached is not None and cached.data_loaded:
            return cached
        ds._run_downloads()
        ds.check_version()
        ds.check_hashes(check_hash=False)
        ds.data_loaded = True
        cls._loaded[cache_key] = ds
        return ds

    def _run_downloads(self) -> None:
        """Copy packaged source files once, then run each missing
        domain's download hook (reference ``:159-186``)."""
        src = self.source_path
        if src.is_dir() and src != self.data_path:
            shutil.copytree(src, self.data_path, dirs_exist_ok=True)
        ran = False
        if self.events_need_downloading:
            self.pre_download_hook()
            self.download_events()
            ran = True
        if self.waveforms_need_downloading:
            self.download_waveforms()
            ran = True
        if self.stations_need_downloading:
            self.download_stations()
            ran = True
        if ran:
            self.post_download_hook()
            self.write_version()

    def copy_to(self, destination: str | os.PathLike) -> "DataSet":
        """Deep-copy the data directory and return a dataset bound to the
        copy (reference ``copy_to`` ``:218-237``)."""
        dest_base = Path(destination)
        shutil.copytree(self.data_path, dest_base / self.name, dirs_exist_ok=True)
        return type(self)(self.spark, base_path=dest_base)

    def delete_data_directory(self) -> None:
        shutil.rmtree(self.data_path, ignore_errors=True)
        type(self)._loaded.pop((self.name.lower(), str(self.data_path)), None)

    # -- verification -------------------------------------------------------
    def create_sha256_hash(
        self, path: str | os.PathLike | None = None, hidden: bool = False
    ) -> dict:
        """Write the sorted manifest json; hashing is a map-only Spark job
        (reference ``:493-521``; ``hidden`` is accepted for parity — the
        binaryFile listing already skips dot/underscore files)."""
        rows = hash_file_df(
            self.spark, self.data_path, exclude=self._hash_excludes
        ).collect()
        out = {r["rel_path"]: r["sha256"] for r in rows}
        target = Path(path) if path is not None else self.data_path
        hash_path = (
            target / self._hash_filename if target.is_dir() else target
        )
        hash_path.write_text(json.dumps(dict(sorted(out.items())), indent=2))
        return out

    def check_hashes(self, check_hash: bool = False) -> None:
        """Compare current file hashes to the manifest (reference
        ``:523-558``): missing files always raise; changed hashes raise
        only with ``check_hash=True``."""
        hash_path = self.data_path / self._hash_filename
        if not hash_path.exists():
            return
        old = json.loads(hash_path.read_text())
        rows = hash_file_df(
            self.spark, self.data_path, exclude=self._hash_excludes
        ).collect()
        current = {r["rel_path"]: r["sha256"] for r in rows}
        overlap = set(old) & set(current)
        changed = {p for p in overlap if old[p] != current[p]}
        missing = set(old) - set(current)
        if changed and check_hash:
            raise FileHashChangedError(
                f"dataset {self.name} hash mismatch: {sorted(changed)}"
            )
        if missing:
            raise MissingDataFileError(
                f"dataset {self.name} is missing files: {sorted(missing)}"
            )

    @property
    def _version_path(self) -> Path:
        return self.data_path / self._version_filename

    def write_version(self) -> None:
        self._version_path.write_text(self.version)

    def read_data_version(self) -> str:
        if not self._version_path.exists():
            raise DataVersionError(f"{self._version_path} does not exist")
        version = self._version_path.read_text().strip()
        _version_tuple(version)  # validate
        return version

    def check_version(self) -> bool:
        """Reference ``:560-594``: older on disk → raise; newer → warn."""
        redl = f"Delete the following directory {self.data_path}"
        try:
            version = self.read_data_version()
        except (DataVersionError, ValueError):
            need = (
                self.events_need_downloading
                or self.waveforms_need_downloading
                or self.stations_need_downloading
            )
            if not need:
                # data is present and intact, only the version marker is
                # gone — HEAL it (write the current version) instead of
                # warning about a re-download that nothing performs; the
                # warning would otherwise repeat on every load forever
                warnings.warn(
                    "Version file was missing; restored it from the"
                    f" dataset definition ({self.version})."
                )
                self.write_version()
                return True
            return False
        if _version_tuple(version) < _version_tuple(self.version):
            raise DataVersionError(
                f"Dataset version is out of date: {version} < {self.version}. {redl}"
            )
        if _version_tuple(version) > _version_tuple(self.version):
            warnings.warn(
                f"Dataset version mismatch: {version} > {self.version}."
                f" It may be necessary to reload the dataset. {redl}"
            )
        return True

    # -- clients (reference ``:460-477``) -----------------------------------
    @property
    def event_client(self):
        from obsplus_spark.sources.bank import EventBank

        return EventBank(self.spark, self.event_path)

    @property
    def waveform_client(self):
        from obsplus_spark.sources.bank import WaveBank

        return WaveBank(self.spark, self.waveform_path)

    @property
    def station_client(self) -> DataFrame:
        return self.spark.read.parquet(str(self.station_path))

    def get_fetcher(self, **kwargs):
        """Wire the three clients into a Fetcher (reference ``:239-257``)."""
        from obsplus_spark.structures.fetcher import Fetcher

        return Fetcher(
            events=self.event_client.read_index(),
            stations=self.station_client,
            waveform_index=self.waveform_client.read_index(),
            **kwargs,
        )

    # -- hooks (reference ``:643-676``) --------------------------------------
    @abc.abstractmethod
    def download_events(self) -> None: ...

    @abc.abstractmethod
    def download_waveforms(self) -> None: ...

    @abc.abstractmethod
    def download_stations(self) -> None: ...

    def pre_download_hook(self) -> None:
        pass

    def post_download_hook(self) -> None:
        pass

    def __str__(self) -> str:
        return f"Dataset: {self.name}"

    __repr__ = __str__


def load_dataset(
    name: str, spark: SparkSession, base_path: str | os.PathLike | None = None
) -> DataSet:
    """Module-level convenience mirroring ``obsplus.load_dataset``."""
    return DataSet.load_dataset(name, spark, base_path=base_path)


class SyntheticDataSet(DataSet):
    """Deterministic synthetic dataset (plays the reference's
    ``default_test`` role, reference ``datasets/default_test.py``): the
    download hooks are pure Spark jobs, so the full lifecycle — fetch,
    manifest, version, clients, fetcher — exercises without a network."""

    name = "synthetic"
    version = "0.1.0"

    n_events = 20
    n_channels = 6

    _T0 = 1_577_836_800 * 1_000_000_000  # 2020-01-01 ns

    def download_events(self) -> None:
        from obsplus_spark.sources.bank import EventBank

        spark = self.spark
        ev = spark.range(self.n_events).select(
            F.concat(F.lit("ev"), F.col("id")).alias("event_id"),
            (F.lit(self._T0) + F.col("id") * F.lit(3_600_000_000_000)).alias("time"),
            (F.lit(40.0) + F.col("id") * F.lit(0.01)).alias("latitude"),
            (F.lit(-111.0) - F.col("id") * F.lit(0.01)).alias("longitude"),
            (F.lit(5.0) + (F.col("id") % 3).cast("double")).alias("depth"),
            (F.lit(1.0) + (F.col("id") % 40) / F.lit(10.0)).alias("magnitude"),
        )
        EventBank(spark, self.event_path).put_events(ev)

    def download_waveforms(self) -> None:
        from obsplus_spark.sources.bank import WaveBank

        spark = self.spark
        ns = 1_000_000_000
        tr = spark.range(self.n_channels).select(
            F.lit("SY").alias("network"),
            F.concat(F.lit("STA"), F.col("id")).alias("station"),
            F.lit("").alias("location"),
            F.lit("HHZ").alias("channel"),
            (F.lit(self._T0) + F.col("id") * F.lit(60 * ns)).alias("starttime"),
            (F.lit(self._T0) + (F.col("id") + 100) * F.lit(60 * ns)).alias(
                "endtime"
            ),
            F.lit(10_000_000).alias("sampling_period"),
            F.transform(
                F.sequence(F.lit(1), F.lit(64)),
                lambda i: i.cast("double") / 64.0,
            ).alias("samples"),
        )
        WaveBank(spark, self.waveform_path).put_waveforms(tr)

    def download_stations(self) -> None:
        spark = self.spark
        st = spark.range(self.n_channels).select(
            F.lit("SY").alias("network"),
            F.concat(F.lit("STA"), F.col("id")).alias("station"),
            F.lit("").alias("location"),
            F.lit("HHZ").alias("channel"),
            (F.lit(40.0) + F.col("id") * F.lit(0.05)).alias("latitude"),
            (F.lit(-111.0) - F.col("id") * F.lit(0.05)).alias("longitude"),
            F.lit(1500.0).alias("elevation"),
            F.lit(self._T0).alias("start_date"),
            F.lit(self._T0 + 365 * 86_400 * 1_000_000_000).alias("end_date"),
        )
        st.write.mode("overwrite").parquet(str(self.station_path))
