"""Role-annotated schema config for long-format multi-entity time series.

This is the Spark-native analogue of the reference's parameter objects
(`paqarin/generator.py:52-62`, `paqarin/generators/timegan.py:42-70`,
`paqarin/generators/doppleganger.py:46-80`): the caller declares which
columns play which roles (entity id, timestamp, measurements, attributes)
instead of the engine inferring them. See SURVEY.md §1.3.
"""

from __future__ import annotations

from dataclasses import dataclass, field


# Reference: paqarin/generator.py:20 (SURROGATE_ITEM_ID constant).
SURROGATE_ITEM_ID = "surrogate_item_id"

# strftime -> Java SimpleDateTimeFormatter translation table for the
# format-driven timestamp parsing contract (reference
# `paqarin/utils/data_utils.py:45-50`: pd.to_datetime(..., format=fmt)).
_STRFTIME_TO_JAVA = {
    "%Y": "yyyy",
    "%y": "yy",
    "%m": "MM",
    "%d": "dd",
    "%H": "HH",
    "%I": "hh",
    "%M": "mm",
    "%S": "ss",
    "%f": "SSSSSS",
    "%j": "DDD",
    "%p": "a",
    "%%": "%",
}


def strftime_to_java(fmt: str) -> str:
    """Translate a strftime pattern (pandas) to a Java datetime pattern.

    The reference treats the date format as a hard contract (a wrong
    format raises — `tests/test_synthcity_adapter.py:135-145`); we keep
    that by translating the pattern, not guessing.
    """
    out = []
    i = 0
    while i < len(fmt):
        ch = fmt[i]
        if ch == "%" and i + 1 < len(fmt):
            token = fmt[i : i + 2]
            if token not in _STRFTIME_TO_JAVA:
                raise ValueError(f"Unsupported strftime token {token!r} in {fmt!r}")
            out.append(_STRFTIME_TO_JAVA[token])
            i += 2
        elif ch.isalpha():
            # Literal letters must be quoted in Java patterns.
            out.append(f"'{ch}'")
            i += 1
        else:
            out.append(ch)
            i += 1
    return "".join(out)


# pandas offset alias -> (Spark date_trunc unit, interval expression)
_FREQ_MAP = {
    "D": ("DAY", "interval 1 day"),
    "1D": ("DAY", "interval 1 day"),
    "H": ("HOUR", "interval 1 hour"),
    "h": ("HOUR", "interval 1 hour"),
    "1H": ("HOUR", "interval 1 hour"),
    "T": ("MINUTE", "interval 1 minute"),
    "min": ("MINUTE", "interval 1 minute"),
    "W": ("WEEK", "interval 1 week"),
    "M": ("MONTH", "interval 1 month"),
    "MS": ("MONTH", "interval 1 month"),
    "Y": ("YEAR", "interval 1 year"),
    "S": ("SECOND", "interval 1 second"),
}


def freq_to_spark(frequency: str) -> tuple[str, str]:
    """Map a pandas frequency alias ("D", "1H", ...) to Spark primitives.

    Returns ``(date_trunc unit, interval expression)``. The reference
    accepts pandas offset aliases (`paqarin/utils/data_utils.py:33-59`,
    `tests/test_doppleganger.py:155`).
    """
    if frequency not in _FREQ_MAP:
        raise ValueError(f"Unsupported frequency alias: {frequency!r}")
    return _FREQ_MAP[frequency]


@dataclass
class TimeSeriesSchema:
    """Declares column roles for a long-format time-series DataFrame.

    One row = one observation of one entity at one timestamp
    (SURVEY.md §1.1). ``item_id_columns`` may be composite (reference
    `paqarin/generators/par.py:27-41` uses ``item_id_columns: tuple``).
    """

    item_id_columns: tuple[str, ...]
    timestamp_column: str
    value_columns: tuple[str, ...]
    attribute_columns: tuple[str, ...] = ()
    frequency: str = "D"
    date_format: str | None = None  # strftime pattern if ts is a string col
    order_columns: tuple[str, ...] = ()  # arrival-order tie-break columns

    @property
    def ids(self) -> list[str]:
        return list(self.item_id_columns)

    @property
    def values(self) -> list[str]:
        return list(self.value_columns)

    def arrival_order(self) -> list[str]:
        """Columns that define "first appearance" deterministically.

        pandas semantics depend on physical row order; Spark has no
        implicit order, so the contract is an explicit ordinal
        (SURVEY.md §7 "First-appearance ordering").
        """
        return [self.timestamp_column, *self.order_columns]


# Schema for the driver's `events` table (TESTDATA.md / FIXTURES.md F-8).
EVENTS_SCHEMA = TimeSeriesSchema(
    item_id_columns=("user_id",),
    timestamp_column="ts",
    value_columns=("value",),
    attribute_columns=("event_type",),
    frequency="D",
    order_columns=("event_id",),
)
