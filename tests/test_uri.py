"""URI matcher — the 7 assertions of the reference's own unit suite
(/root/reference/pkg/es/base_es_test.go:8-55), ported verbatim, plus
router smoke checks. Pure Python (no Spark session needed)."""

from ela_lib_spark.plans.uri import match_rule, route


def test_reference_case_1_all_optionals_absent():
    variables, ok = match_rule("/_search", "/${index}?/${docType}?/_search")
    assert ok and variables == {}


def test_reference_case_2_one_optional_bound():
    variables, ok = match_rule("/a/_search", "/${index}?/${docType}?/_search")
    assert ok and variables == {"index": "a"}


def test_reference_case_3_both_optionals_bound():
    variables, ok = match_rule("/a/b/_search", "/${index}?/${docType}?/_search")
    assert ok and variables == {"index": "a", "docType": "b"}


def test_reference_case_4_action_mismatch():
    _, ok = match_rule("/_sarch", "/${index}?/${docType}?/_search")
    assert not ok


def test_reference_case_5_too_few_segments():
    _, ok = match_rule("/_sarch", "/${index}/${docType}/${docId}")
    assert not ok


def test_reference_case_6_still_too_few_segments():
    _, ok = match_rule("/a/_sarch", "/${index}/${docType}/${docId}")
    assert not ok


def test_reference_case_7_action_like_segment_binds_as_doc_id():
    variables, ok = match_rule("/a/b/_sarch", "/${index}/${docType}/${docId}")
    assert ok and variables == {"index": "a", "docType": "b", "docId": "_sarch"}


def test_route_dispatch():
    pattern, variables = route("GET", "/web/_doc/_search")
    assert pattern == "/${index}?/${docType}?/_search"
    assert variables == {"index": "web", "docType": "_doc"}
    pattern, variables = route("PUT", "/newindex")
    assert pattern == "/${index}" and variables == {"index": "newindex"}
    pattern, _ = route("GET", "/no/such/deep/route/here")
    assert pattern is None


def test_extra_uri_segments_fail():
    _, ok = match_rule("/a/b/c/_search", "/${index}?/${docType}?/_search")
    assert not ok


def test_literal_segments_require_equality():
    """Review r2: literal (non-${var}) pattern segments must EQUAL the
    URI segment — '/_cat/indices' must not swallow arbitrary URIs."""
    from ela_lib_spark.plans.uri import match_rule, route

    assert match_rule("/_cat/indices", "/_cat/indices") == ({}, True)
    assert match_rule("/myindex/mytype", "/_cat/indices")[1] is False
    pattern, variables = route("GET", "/_cat/indices")
    assert pattern == "/_cat/indices" and variables == {}
    assert route("GET", "/myindex/mytype") == (None, {})
