"""Regional parameter surface (reference example_application/regional_defaults.py:6-55).

The reference keeps its region-specific inputs — street widths from the
Austrian RSV guidelines, cycle-lane widths, streetside-parking assumptions,
rail gauges — in a per-application defaults module that users swap when
mapping a different city. This dataclass is that surface for the Spark
engine: every width the classify/overlay stages consume comes from a
`RegionalConfig`, with `VIENNA` (the reference's values, regional_defaults.py)
as the default. Pass a different instance to `road_width` /
`build_overlay_records` / `run_pipeline` to re-map another region without
touching operator code.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from types import MappingProxyType
from typing import Mapping


def _vienna_highway_widths() -> Mapping[str, tuple[float, float]]:
    # (bi-directional, uni-directional) metres — RSV 04.03.12 minima
    # (regional_defaults.py:6-21)
    return MappingProxyType(
        {
            "service": (4.5, 3.6),
            "residential": (4.5, 3.6),
            "tertiary": (5.25, 3.8),
            "primary": (6.5, 3.8),
            "cycleway": (2, 1),
            "secondary": (6.5, 3.8),
            "motorway_link": (6.5, 3.8),
            "platform": (1.5, 1),
            "motorway": (6.5, 3.8),
            "unclassified": (5.25, 3.8),
            "primary_link": (6.5, 3.8),
            "secondary_link": (6.5, 3.8),
            "construction": (5.25, 3.8),
            "everything else": (5.25, 3.6),
        }
    )


def _vienna_cycleway_widths() -> Mapping[str, Mapping[str, float]]:
    # RSV 03.02.13 minima (regional_defaults.py:23-43)
    return MappingProxyType(
        {
            "cycleway": MappingProxyType(
                {"lane": 1.5, "opposite": 0.5, "track": 1.5, "opposite_lane": 1, "opposite_track": 1.5}
            ),
            "cycleway:right": MappingProxyType({"lane": 1.5, "track": 1.5}),
            "cycleway:both": MappingProxyType({"lane": 3.0, "track": 3.0}),
            "cycleway:left": MappingProxyType({"lane": 1.5, "track": 1.5}),
        }
    )


@dataclass(frozen=True)
class RegionalConfig:
    """Widths and assumptions that vary by mapped region."""

    highway_default_widths: Mapping[str, tuple[float, float]] = field(
        default_factory=_vienna_highway_widths
    )
    cycleway_default_widths: Mapping[str, Mapping[str, float]] = field(
        default_factory=_vienna_cycleway_widths
    )
    # streetside parking assumed on these highway types (regional_defaults.py:45)
    highway_types_with_parking: tuple[str, ...] = ("residential", "tertiary", "secondary", "primary")
    default_parking_width: float = 6.5  # regional_defaults.py:46
    pedestrian_way_default_width: float = 1.8  # regional_defaults.py:55
    # gauge + additional carriageway width (regional_defaults.py:50-53)
    tram_width: float = 1.435 + 1.0
    train_width: float = 1.435 + 1.5

    def with_highway_widths(self, widths: Mapping[str, tuple[float, float]]) -> "RegionalConfig":
        """Copy with a replaced street-width table (partial overrides merge
        over the existing table)."""
        merged = dict(self.highway_default_widths)
        merged.update(widths)
        from dataclasses import replace

        return replace(self, highway_default_widths=MappingProxyType(merged))


VIENNA = RegionalConfig()
