"""Element predicates as pure Spark Column expressions (SURVEY.md §2.2).

Each predicate transliterates one boolean tag/geometry rule from the
reference's OsmElement methods (utils/osm_element.py) into a Catalyst
expression over `tags: map<string,string>` + `geom_kind: string` — JVM-side,
codegen-friendly, no UDFs. Citations are reference file:line.

Null discipline: the reference probes tags with dict.get() where a missing
key is None and `None == v` → False, `None != v` → True. Spark's map access
returns NULL and NULL comparisons propagate NULL, which silently drops rows
in filters — so every comparison here goes through the null-safe helpers
`teq` (missing → False) / `tne` (missing → True) / `tin` (missing → False).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tag(key: str) -> Column:
    return F.col("tags").getItem(key)


def has(key: str) -> Column:
    return tag(key).isNotNull()


def teq(key: str, value: str) -> Column:
    """tags.get(key) == value with missing-key → False."""
    return tag(key).eqNullSafe(F.lit(value))


def tne(key: str, value: str) -> Column:
    """tags.get(key) != value with missing-key → True."""
    return ~tag(key).eqNullSafe(F.lit(value))


def tin(key: str, *values: str) -> Column:
    """tags.get(key) in values with missing-key → False."""
    return F.coalesce(tag(key).isin(*values), F.lit(False))


def _k(kind: str) -> Column:
    return F.col("geom_kind").eqNullSafe(F.lit(kind))


def is_point() -> Column:
    return _k("point")


def is_linestring() -> Column:
    return _k("linestring")


def is_polygon() -> Column:
    return _k("polygon")


def is_multipolygon() -> Column:
    return _k("multipolygon")


def is_poly_like() -> Column:
    return is_polygon() | is_multipolygon()


def is_building() -> Column:
    """osm_element.py:60-73 — polygon with building-ish key, excl roof/no."""
    any_key = has("building") | has("building:part") | has("building:levels")
    not_excluded = tne("building", "roof") & tne("building", "no")
    return is_poly_like() & any_key & not_excluded


def is_building_passage() -> Column:
    """osm_element.py:75-79"""
    return has("highway") & teq("tunnel", "building_passage")


def is_crossing() -> Column:
    """osm_element.py:82-97"""
    return (
        (F.coalesce(tag("crossing"), F.lit("no")) != "no")
        | teq("highway", "crossing")
        | teq("footway", "crossing")
        | teq("railway", "crossing")
    )


def is_pedestrian_way() -> Column:
    """osm_element.py:99-106"""
    return tin("highway", "footway", "steps", "path", "pedestrian", "living_street", "track") & ~is_crossing()


def is_shared_cycleway_footway() -> Column:
    """osm_element.py:108-112"""
    return tin("highway", "cycleway", "footway") & teq("segregated", "no")


def is_platform_polygon() -> Column:
    """osm_element.py:114-127"""
    return is_poly_like() & (
        teq("public_transport", "platform")
        | teq("railway", "platform")
        | teq("highway", "platform")
        | teq("shelter_type", "public_transport")
    )


def is_parking_polygon() -> Column:
    """osm_element.py:129-138"""
    return is_poly_like() & (
        tin("amenity", "parking", "parking_space")
        | has("parking")
        | has("motorcycle_parking")
        | has("parking_space")
    )


def is_rail() -> Column:
    """osm_element.py:140-146"""
    return tin("railway", "tram", "rail") | teq("landuse", "railway")


def is_highway_polygon() -> Column:
    """osm_element.py:148-150"""
    return has("highway") & is_polygon()


def is_construction() -> Column:
    """osm_element.py:153-161"""
    return (
        has("construction")
        | has("construction:highway")
        | teq("landuse", "construction")
        | teq("highway", "construction")
        | teq("railway", "construction")
    )


def is_barrier_polygon() -> Column:
    """osm_element.py:164-166"""
    return tin("barrier", "fence", "hedge") & is_polygon()


def is_wall_polygon() -> Column:
    """osm_element.py:168-170"""
    return teq("barrier", "wall") & ~has("building") & is_polygon()


def is_entrance() -> Column:
    """osm_element.py:172-185"""
    return (
        (has("highway") & tne("highway", "motorway") & is_linestring())
        | is_crossing()
        | teq("barrier", "gate")
    )


def is_barrier() -> Column:
    """osm_element.py:187-208 — `embedded != 'yes'` with missing key → True."""
    return (
        (has("barrier") & is_linestring())
        | (teq("highway", "motorway") & is_linestring())
        | (teq("railway", "rail") & is_linestring() & tne("embedded", "yes"))
        | (teq("landuse", "railway") & is_poly_like())
    )


def is_area() -> Column:
    """osm_element.py:211-212"""
    return teq("area", "yes")


def is_non_groundlevel() -> Column:
    """osm_element.py:215-231.

    level key present: parse ';'-split floats; unparseable → NOT non-ground
    (reference swallows ValueError); parseable without 0 → non-ground.
    level key absent: tunnel=yes / parking=underground / location=underground.
    """
    parsed = F.expr("transform(split(tags['level'], ';'), x -> try_cast(x as double))")
    parse_ok = ~F.exists(parsed, lambda x: x.isNull())
    has_zero = F.coalesce(F.array_contains(parsed, F.lit(0.0)), F.lit(False))
    level_case = parse_ok & ~has_zero
    other_case = (
        teq("tunnel", "yes") | teq("parking", "underground") | teq("location", "underground")
    )
    return F.coalesce(F.when(has("level"), level_case).otherwise(other_case), F.lit(False))
