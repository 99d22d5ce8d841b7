"""Cross-domain structures: the Fetcher (events × stations × waveforms)."""

from obsplus_spark.structures.fetcher import Fetcher

__all__ = ["Fetcher"]
