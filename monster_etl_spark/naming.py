"""Column-name normalization (reference operators T6/T7).

Behavior pinned to the reference's snake-case rules
(``MsgTransformations.scala:167-173``): kebab-case and camel-case both
normalize, and underscores are inserted at every letter<->digit boundary.
Verified against the reference's unit vectors
(``MsgTransformationsSpec.scala:323-346``):

    hi-There / HIThere / hiThere -> hi_there
    hi11There / hi11there        -> hi_11_there
    hiThere11                    -> hi_there_11
    11hiThere                    -> 11_hi_there

In the reference this is a per-record key rewrite; in a fixed-schema
relational engine it is a *metadata* operation applied once to the schema
(``df.toDF(*names)``), which costs nothing at any data scale.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_ACRONYM = re.compile(r"([A-Z]+)([A-Z][a-z])")
_LOWER_UPPER = re.compile(r"([a-z0-9])([A-Z])")
_LETTER_DIGIT = re.compile(r"([a-z])([0-9])")
_DIGIT_LETTER = re.compile(r"([0-9])([a-z])")


def to_snake_case(name: str) -> str:
    """Snake-case one name, with the reference's digit-boundary rules."""
    s = name.replace("-", "_")
    s = _ACRONYM.sub(r"\1_\2", s)
    s = _LOWER_UPPER.sub(r"\1_\2", s)
    s = _LETTER_DIGIT.sub(r"\1_\2", s)
    s = _DIGIT_LETTER.sub(r"\1_\2", s)
    return s.lower()


def columns_to_snake_case(df: DataFrame) -> DataFrame:
    """T7 ``keysToSnakeCase`` as a schema rename (no row work, no shuffle)."""
    return df.toDF(*[to_snake_case(c) for c in df.columns])
