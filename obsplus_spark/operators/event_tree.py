"""Nested event trees: the Spark re-expression of the reference's extractor
stack (``structures/dfextractor.py``, ``events/pd.py``, ``events/schema.py``).

The reference walks a QuakeML object tree with per-node extractor callables.
Here the tree is **data, not objects**: one nested StructType column layout
(`Catalog → Event → origins[] / magnitudes[] / picks[]`, mirror of the
pydantic models at ``events/schema.py:321-609``), and every "extractor"
becomes a column expression over ``explode()`` views — fully Catalyst-visible,
no per-row Python.

Includes the two semantics that are easy to get wrong (SURVEY.md §7):
- **preferred-object fallback chain** (``utils/events.py:425-480``):
  preferred id → lookup in list → last element → null.
- **origin-quality aggregates** (``events/pd.py:73-163``): conditional
  counts over the exploded picks with rejected-status exclusion.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

S, D, L = T.StringType(), T.DoubleType(), T.LongType()


def _struct(fields: list[tuple[str, T.DataType]]) -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


ORIGIN_STRUCT = _struct(
    [
        ("resource_id", S),
        ("time", L),  # ns
        ("latitude", D),
        ("longitude", D),
        ("depth", D),
    ]
)

MAGNITUDE_STRUCT = _struct(
    [
        ("resource_id", S),
        ("mag", D),
        ("magnitude_type", S),
        ("origin_id", S),
    ]
)

PICK_STRUCT = _struct(
    [
        ("resource_id", S),
        ("time", L),
        ("phase_hint", S),
        ("evaluation_status", S),
        ("network", S),
        ("station", S),
        ("location", S),
        ("channel", S),
    ]
)

#: nested event row (the reference's Event pydantic model, schema.py:584)
NESTED_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", S, False),
        T.StructField("event_description", S, True),
        T.StructField("preferred_origin_id", S, True),
        T.StructField("preferred_magnitude_id", S, True),
        T.StructField("creation_time", L, True),
        T.StructField("origins", T.ArrayType(ORIGIN_STRUCT), True),
        T.StructField("magnitudes", T.ArrayType(MAGNITUDE_STRUCT), True),
        T.StructField("picks", T.ArrayType(PICK_STRUCT), True),
    ]
)


def preferred(
    list_col: str, preferred_id_col: str, id_field: str = "resource_id"
) -> Column:
    """The preferred-object fallback chain as one expression.

    Mirror of ``utils/events.py:425-480 get_preferred``: (1) the element
    whose id equals the preferred id, else (2) the **last** element of the
    list, else (3) null. Order matters for parity with ``events_to_df``.
    """
    lst = F.col(list_col)
    match = F.filter(lst, lambda o: o[id_field] == F.col(preferred_id_col))
    return F.when(F.size(match) > 0, F.element_at(match, 1)).otherwise(
        F.when(F.size(lst) > 0, F.element_at(lst, -1))
    )


def events_to_df(tree: DataFrame) -> DataFrame:
    """Flatten nested events into the event-summary table.

    The Spark twin of ``events/pd.py events_to_df`` over the extractor
    registry: origin/magnitude fields resolve through :func:`preferred`;
    quality counts come from :func:`origin_quality` (joined back).
    """
    o = preferred("origins", "preferred_origin_id")
    m = preferred("magnitudes", "preferred_magnitude_id")
    base = tree.select(
        "event_id",
        "event_description",
        o["time"].alias("time"),
        o["latitude"].alias("latitude"),
        o["longitude"].alias("longitude"),
        o["depth"].alias("depth"),
        m["mag"].alias("magnitude"),
        m["magnitude_type"].alias("magnitude_type"),
        "creation_time",
    )
    qual = origin_quality(tree)
    return base.join(qual, "event_id", "left")


def picks_to_df(tree: DataFrame) -> DataFrame:
    """Sub-entity explode view (PICK_DTYPES table, constants.py:124-150):
    one row per pick with denormalized parent keys."""
    ev_time = preferred("origins", "preferred_origin_id")["time"]
    return tree.select(
        "event_id",
        ev_time.alias("event_time"),
        F.explode_outer("picks").alias("p"),
    ).select(
        "event_id",
        "event_time",
        F.col("p.resource_id").alias("resource_id"),
        F.col("p.time").alias("time"),
        F.col("p.phase_hint").alias("phase_hint"),
        F.col("p.evaluation_status").alias("evaluation_status"),
        F.col("p.network").alias("network"),
        F.col("p.station").alias("station"),
        F.col("p.location").alias("location"),
        F.col("p.channel").alias("channel"),
        F.concat_ws(
            ".", "p.network", "p.station", "p.location", "p.channel"
        ).alias("seed_id"),
    )


def magnitudes_to_df(tree: DataFrame) -> DataFrame:
    return tree.select(
        "event_id", F.explode_outer("magnitudes").alias("m")
    ).select(
        "event_id",
        F.col("m.resource_id").alias("resource_id"),
        F.col("m.mag").alias("mag"),
        F.col("m.magnitude_type").alias("magnitude_type"),
        F.col("m.origin_id").alias("origin_id"),
    )


def origins_to_df(tree: DataFrame) -> DataFrame:
    return tree.select(
        "event_id", F.explode_outer("origins").alias("o")
    ).select(
        "event_id",
        F.col("o.resource_id").alias("resource_id"),
        F.col("o.time").alias("time"),
        F.col("o.latitude").alias("latitude"),
        F.col("o.longitude").alias("longitude"),
        F.col("o.depth").alias("depth"),
    )


def origin_quality(tree: DataFrame) -> DataFrame:
    """Per-event quality counts (events/pd.py:73-163 _OriginQualityExtractor):
    P/S pick counts excluding rejected picks, distinct station count."""
    p = tree.select("event_id", F.explode("picks").alias("p"))
    # null-safe: a missing status is NOT rejected (reference pandas
    # semantics: ``None != 'rejected'`` is True) — plain != drops nulls
    status = F.col("p.evaluation_status")
    ok = status.isNull() | (status != "rejected")
    return p.groupBy("event_id").agg(
        F.count(F.when((F.col("p.phase_hint") == "P") & ok, 1)).alias(
            "p_pick_count"
        ),
        F.count(F.when((F.col("p.phase_hint") == "S") & ok, 1)).alias(
            "s_pick_count"
        ),
        F.size(F.collect_set(F.col("p.station"))).alias("station_count"),
        F.collect_set(F.col("p.station")).alias("stations"),
    )


def last_magnitude_per_type(tree: DataFrame) -> DataFrame:
    """Per event: last ML/MW/MD in document order (events/pd.py:166-175 —
    'last wins', via the array position as the ordinal)."""
    m = tree.select(
        "event_id", F.posexplode("magnitudes").alias("pos", "m")
    )
    typed = m.filter(F.col("m.magnitude_type").isin("ML", "MW", "MD"))
    agg = typed.groupBy("event_id").pivot(
        "m.magnitude_type", ["ML", "MW", "MD"]
    ).agg(F.max_by(F.col("m.mag"), F.col("pos")))
    return agg.withColumnsRenamed(
        {"ML": "local_magnitude", "MW": "moment_magnitude", "MD": "duration_magnitude"}
    )


def first_pick_origins(tree: DataFrame) -> DataFrame:
    """make_origins (utils/events.py:258-317): for events lacking origins,
    fabricate one at the earliest pick time.

    The picks already live inside each event row, so the earliest pick is
    an array_min over the nested list — map-only, no explode, no window
    shuffle. Returns (event_id, first_pick_time) for events with ≥1
    resolvable pick."""
    fp = F.array_min(
        F.expr(
            "transform(filter(picks, p -> p.resource_id IS NOT NULL),"
            " p -> p.time)"
        )
    )
    return tree.select(
        "event_id", fp.alias("first_pick_time")
    ).filter(F.col("first_pick_time").isNotNull())


def make_origins(
    tree: DataFrame,
    rid_prefix: str = "fpo:",
    preferred: bool = True,
    only_missing: bool = True,
) -> DataFrame:
    """Tree-native make_origins (utils/events.py:258-317): fabricate an
    origin at the earliest pick time for events lacking one, append it to
    ``origins`` and (optionally) mark it preferred — one projection over
    the nested rows, zero shuffles/joins. The general attach path for
    externally-supplied origins stays :func:`surgery.attach_new_origin`."""
    fp = F.array_min(
        F.expr(
            "transform(filter(picks, p -> p.resource_id IS NOT NULL),"
            " p -> p.time)"
        )
    )
    need = fp.isNotNull()
    if only_missing:
        need = need & (F.size(F.coalesce(F.col("origins"), F.array())) == 0)
    rid = F.concat(F.lit(rid_prefix), F.col("event_id"))
    new_origin = F.struct(
        rid.alias("resource_id"),
        fp.alias("time"),
        F.lit(None).cast("double").alias("latitude"),
        F.lit(None).cast("double").alias("longitude"),
        F.lit(None).cast("double").alias("depth"),
    )
    out = tree.withColumn("_need", need).withColumn(
        "origins",
        F.when(
            F.col("_need"),
            F.concat(F.coalesce(F.col("origins"), F.array()), F.array(new_origin)),
        ).otherwise(F.col("origins")),
    )
    if preferred:
        out = out.withColumn(
            "preferred_origin_id",
            F.when(F.col("_need"), rid).otherwise(F.col("preferred_origin_id")),
        )
    return out.drop("_need")


def tree_to_json(tree: DataFrame) -> DataFrame:
    """Event tree → JSON strings (events/json.py:35-57 cat_to_json)."""
    return tree.select(
        "event_id",
        F.to_json(F.struct(*[c for c in tree.columns])).alias("json"),
    )


def json_to_tree(df: DataFrame, json_col: str = "json") -> DataFrame:
    """JSON strings → nested event rows (events/json.py dict_to_cat)."""
    return df.select(
        F.from_json(F.col(json_col), NESTED_EVENT_SCHEMA).alias("e")
    ).select("e.*")
