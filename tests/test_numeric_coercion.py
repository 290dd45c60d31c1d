"""P11 numeric cell coercion vs the reference's exact pandas behavior
(table_extraction.py:373-392: ``df.apply(pd.to_numeric, errors="ignore")``
— a column converts only when every cell parses)."""

import warnings

import pandas as pd
import pytest

from pdf_extractor_spark.parsers import coerce_numeric_columns, infer_column_types

CASES = [
    # (rows, description)
    ([["1", "2.5", "abc"], ["3", "4", "def"]], "int col, float col, str col"),
    ([["1", "x"], ["2", "y"]], "ints and strings"),
    ([["1", "1"], ["2.5", "2"]], "mixed int/float col -> float; int col"),
    ([["", "1"], ["2", "3"]], "empty cell blocks conversion"),
    ([["-4", "+5"], ["0", "17"]], "signed ints"),
    ([["1e3", "nan"], ["2.5e-1", "inf"]], "scientific / special floats"),
    ([["007", "1.50"], ["042", "2.25"]], "leading zeros, trailing zeros"),
]


def reference_coerce(rows):
    df = pd.DataFrame(rows)
    with warnings.catch_warnings():
        # pandas >= 2.2 deprecates errors="ignore"; replicate its
        # column-wise fall-back explicitly (identical semantics)
        warnings.simplefilter("ignore")
        def to_num(col):
            try:
                return pd.to_numeric(col)
            except (ValueError, TypeError):
                return col
        df = df.apply(to_num)
    return df


@pytest.mark.parametrize("rows,desc", CASES, ids=[c[1] for c in CASES])
def test_coercion_matches_pandas(rows, desc):
    ours = coerce_numeric_columns(rows)
    ref = reference_coerce(rows)
    for i in range(len(rows)):
        for j in range(len(rows[0])):
            got, want = ours[i][j], ref.iloc[i, j]
            if isinstance(want, str):
                assert got == want, (desc, i, j)
            elif pd.isna(want):
                assert got != got, (desc, i, j)  # NaN
            else:
                assert float(got) == float(want), (desc, i, j)


@pytest.mark.parametrize("rows,desc", CASES, ids=[c[1] for c in CASES])
def test_inferred_types_match_pandas_dtypes(rows, desc):
    tags = infer_column_types(rows)
    ref = reference_coerce(rows)
    for j, tag in enumerate(tags):
        dtype = ref.dtypes.iloc[j]
        if pd.api.types.is_integer_dtype(dtype):
            assert tag == "bigint", (desc, j)
        elif pd.api.types.is_float_dtype(dtype):
            assert tag == "double", (desc, j)
        else:
            assert tag == "string", (desc, j)


def test_underscore_literals_stay_strings():
    # Python's int("1_0") parses; pandas and Spark reject — the twin
    # must follow pandas
    assert infer_column_types([["1_0"], ["2"]]) == ["string"]


def test_spark_native_types_match_python_twin(spark):
    from pyspark.sql import functions as F

    from pdf_extractor_spark.operators.quality import column_types_expr

    data = [
        (["h1", "h2", "h3"], rows)
        for rows, _ in CASES
        if len(rows[0]) <= 3
    ]
    padded = [
        (h[: len(r[0])], r) for h, r in data
    ]
    df = spark.createDataFrame(
        padded, "table_headers array<string>, table_rows array<array<string>>"
    )
    got = df.select(
        column_types_expr(F.col("table_headers"), F.col("table_rows")).alias("t")
    ).collect()
    for (h, rows), row in zip(padded, got):
        expected = infer_column_types(rows)
        # Spark's double cast accepts "nan"/"inf"? verify agreement
        assert list(row["t"]) == expected, rows


def test_with_column_types_over_extracted_tables(spark):
    from pdf_extractor_spark.corpus import corpus_df
    from pdf_extractor_spark.operators.extract import extract_elements
    from pdf_extractor_spark.operators.quality import with_column_types

    docs = corpus_df(spark, 40, partitions=2)
    typed = with_column_types(extract_elements(docs))
    rows = typed.collect()
    assert rows
    for r in rows:
        assert len(r["col_types"]) == len(r["table_headers"])
        assert set(r["col_types"]) <= {"bigint", "double", "string"}


def test_ragged_rows_pad_like_pandas():
    # pandas pads short rows with NaN: int column becomes float, string
    # column unaffected; must not raise
    rows = [["1", "x"], ["3"]]
    got = coerce_numeric_columns(rows)
    assert got[0][0] == 1.0 and got[1][0] == 3.0
    assert got[0][1] == "x" and got[1][1] is None
    assert infer_column_types(rows) == ["bigint", "string"]
    # all-numeric ragged: missing cell -> NaN -> float column
    rows2 = [["1", "2"], ["3"]]
    tags = infer_column_types(rows2)
    assert tags == ["bigint", "double"]


def test_column_types_expr_empty_headers_no_crash(spark):
    from pyspark.sql import functions as F

    from pdf_extractor_spark.operators.quality import column_types_expr

    df = spark.createDataFrame(
        [([], [["1", "2"]])],
        "table_headers array<string>, table_rows array<array<string>>",
    )
    got = df.select(
        column_types_expr(F.col("table_headers"), F.col("table_rows")).alias("t")
    ).collect()
    assert list(got[0]["t"]) == []
