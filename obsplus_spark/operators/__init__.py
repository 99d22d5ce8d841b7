"""Relational operator programs (SURVEY.md §2.3-§2.5, §9 scale extensions)."""

from obsplus_spark.operators.availability import availability, uptime
from obsplus_spark.operators.gaps import gaps_df, segments_df, sessionize
from obsplus_spark.operators.joins import (
    asof_join,
    interval_overlap_join,
    topk_per_group,
)
from obsplus_spark.operators.geo_search import radius_search, spatial_join

__all__ = [
    "availability",
    "uptime",
    "gaps_df",
    "segments_df",
    "sessionize",
    "asof_join",
    "interval_overlap_join",
    "topk_per_group",
    "radius_search",
    "spatial_join",
]
