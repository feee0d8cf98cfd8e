"""Snake-case parity with the reference's unit vectors
(MsgTransformationsSpec.scala:323-346) and the transcript-consequences
header rules (FIXTURES.md §5)."""

import pytest

from monster_etl_spark.naming import to_snake_case

REFERENCE_VECTORS = [
    ("hi-There", "hi_there"),
    ("HIThere", "hi_there"),
    ("hiThere", "hi_there"),
    ("hi11There", "hi_11_there"),
    ("hi11there", "hi_11_there"),
    ("hiThere11", "hi_there_11"),
    ("11hiThere", "11_hi_there"),
]

HEADER_VECTORS = [
    ("gm12878_confidence_value", "gm_12878_confidence_value"),
    ("phastcons100way_vertebrate", "phastcons_100_way_vertebrate"),
    ("polyphen2_hdiv_pred", "polyphen_2_hdiv_pred"),
    ("vest3_score", "vest_3_score"),
    ("h1-hesc_confidence_value", "h_1_hesc_confidence_value"),
    ("eigen-pc-raw", "eigen_pc_raw"),
    ("siphy_29way_logodds", "siphy_29_way_logodds"),
    ("varId", "var_id"),
    ("pValue", "p_value"),
    ("gerp++_nr", "gerp++_nr"),  # ++ untouched; handled by explicit rename
]


@pytest.mark.parametrize("raw,expected", REFERENCE_VECTORS + HEADER_VECTORS)
def test_to_snake_case(raw, expected):
    assert to_snake_case(raw) == expected
