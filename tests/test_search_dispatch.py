

def test_validate_search_params_reference_defaults():
    """search_api/utils.py:12-34 parity: empty query -> '', top_n<=0 ->
    5, initial_k<=0 -> 20, valid values pass through."""
    from pdf_extractor_spark.analytics.search_api import (
        validate_search_params,
    )

    assert validate_search_params(None, 0, -1) == ("", 5, 20)
    assert validate_search_params("", -3, 0) == ("", 5, 20)
    assert validate_search_params("q", 7, 33) == ("q", 7, 33)
