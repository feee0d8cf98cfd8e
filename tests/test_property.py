"""Property-based tests (hypothesis): the engine's transform semantics vs
an independent pure-Python model of the reference behavior, over randomized
records. One Spark job per property (a single createDataFrame with many
generated rows) keeps runtime sane."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from monster_etl_spark.naming import to_snake_case
from monster_etl_spark.operators import transforms as tr

# --- pure-Python models of reference behavior ------------------------------


def model_snake(name: str) -> str:
    s = name.replace("-", "_")
    s = re.sub(r"([A-Z]+)([A-Z][a-z])", r"\1_\2", s)
    s = re.sub(r"([a-z0-9])([A-Z])", r"\1_\2", s)
    s = re.sub(r"([a-z])([0-9])", r"\1_\2", s)
    s = re.sub(r"([0-9])([a-z])", r"\1_\2", s)
    return s.lower()


def model_parse_long(raw: str | None, nans: set[str]) -> int | None:
    if raw is None or raw in nans:
        return None
    s = raw[:-2] if raw.endswith(".0") else raw
    return int(s)


def model_java_split(raw: str | None, delim: str) -> list[str] | None:
    if raw is None:
        return None
    if raw == "":
        return [""]
    out = raw.split(delim)
    while out and out[-1] == "":
        out.pop()
    return out


# --- properties ------------------------------------------------------------

ident = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"), max_codepoint=127),
    min_size=1,
    max_size=12,
)


@given(st.lists(ident, min_size=1, max_size=30))
@settings(max_examples=200, deadline=None)
def test_snake_case_matches_model(names):
    for n in names:
        assert to_snake_case(n) == model_snake(n)


longish = st.one_of(
    st.none(),
    st.from_regex(r"-?[0-9]{1,15}", fullmatch=True),
    st.from_regex(r"-?[0-9]{1,12}\.0", fullmatch=True),
    st.just("."),
)


def test_parse_longs_matches_model(spark):
    samples = [
        None, "0", "-7", "184305.0", "9.0", ".", "-12.0", "00.0", "5",
        "123456789012345", "-123456789012.0",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "x string")
    out = [r["x"] for r in tr.parse_longs(df, {"x"}, nan_values={"."}).collect()]
    expected = [model_parse_long(s, {"."}) for s in samples]
    assert out == expected


@given(
    st.lists(
        st.one_of(
            st.none(),
            st.text(alphabet="ab,", max_size=8),
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(max_examples=30, deadline=None)
def test_java_split_matches_model(spark_global, values):
    df = spark_global.createDataFrame([(v,) for v in values], "x string")
    out = [r["x"] for r in tr.parse_string_arrays(df, {"x"}, ",").collect()]
    expected = [model_java_split(v, ",") for v in values]
    assert out == expected


@given(
    st.integers(min_value=0, max_value=40),  # token count
    st.integers(min_value=2, max_value=10),  # chunk size
    st.integers(min_value=0, max_value=8),  # overlap (clamped below chunk)
)
@settings(max_examples=25, deadline=None)
def test_chunking_reconstructs_document(spark_global, n_tokens, chunk, raw_overlap):
    """Stripping each chunk's leading overlap and concatenating in chunk_id
    order must reconstruct the original token sequence exactly — no token
    lost or duplicated for ANY (n, chunk, overlap)."""
    from monster_etl_spark.operators.text import chunk_documents

    overlap = min(raw_overlap, chunk - 1)
    text = " ".join(f"t{i}" for i in range(n_tokens))
    df = spark_global.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        chunk_documents(df, chunk_tokens=chunk, overlap=overlap).collect(),
        key=lambda r: r["chunk_id"],
    )
    rebuilt: list[str] = []
    for r in rows:
        toks = r["chunk_text"].split(" ") if r["chunk_text"] else [""]
        rebuilt.extend(toks if not rebuilt else toks[overlap:])
    # empty text tokenizes to [''] on both sides (split semantics)
    expected = text.split(" ") if text else [""]
    assert rebuilt == expected


# hypothesis can't take the function-scoped spark fixture directly; use a
# module-level handle initialized lazily from the session fixture
import pytest  # noqa: E402


@pytest.fixture(scope="module")
def spark_global(spark):
    return spark


@given(
    st.lists(st.sampled_from(["a", "b", "ab", "ba", "c"]), min_size=0, max_size=12),
    st.sampled_from([("a", "b"), ("b", "a"), ("ab", "a")]),
)
def test_bpe_two_pass_replace_equals_greedy_for_distinct_pairs(syms, pair):
    """The operator contract (operators/text.py::_bpe_apply_merge): for
    w1 != w2, two non-overlapping left-to-right literal replaces of
    '|w1|w2|'->'|w1w2|' reproduce greedy left-to-right BPE merge
    application exactly (distinct-pair occurrences never share a symbol,
    only the boundary delimiter, which the second pass repairs).
    Pure-Python mirror of the column expression."""
    w1, w2 = pair
    s = "|" + "|".join(syms) + "|" if syms else "|"
    pat, rep = f"|{w1}|{w2}|", f"|{w1}{w2}|"
    two_pass = s.replace(pat, rep).replace(pat, rep)

    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == w1 and syms[i + 1] == w2:
            out.append(w1 + w2)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    greedy = "|" + "|".join(out) + "|" if out else "|"
    assert two_pass == greedy


def test_bpe_self_pair_run_semantics_pinned():
    """Self-pair (w1 == w2) runs: identical to greedy up to k = 4; the
    documented deterministic variant (anchored every-third pairing)
    beyond — pinned exactly so a change to the replace scheme is loud."""
    def two_pass(k):
        s = "|" + "|".join(["a"] * k) + "|"
        return s.replace("|a|a|", "|aa|").replace("|a|a|", "|aa|")

    assert two_pass(2) == "|aa|"
    assert two_pass(3) == "|aa|a|"
    assert two_pass(4) == "|aa|aa|"
    # divergence starts at 5: greedy would give |aa|aa|a|
    assert two_pass(5) == "|aa|a|aa|"
    assert two_pass(6) == "|aa|a|aa|a|"
    assert two_pass(8) == "|aa|a|aa|a|aa|"
