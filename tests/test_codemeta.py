"""Code-element metadata (tree-sitter stand-in) — golden units.

Mirrors the reference's code-block expectations: the call-site contract
at markdown_extractor.py:627-636 / :529-535 (code_type = fence info
first word lowercased) and the repo's own expected fixture at
context7/pdf_extractor/markdown_extractor.py:719
({"language": "python", "length": 54, "functions": ["hello_world"]}).
"""

from pdf_extractor_spark.codemeta import (
    classify_code_language,
    extract_code_metadata,
    extract_functions,
)
from pdf_extractor_spark.docmodel import extract_document


# --- the reference's own code case (markdown_extractor.py test doc,
# :712-717 — "```python\ndef hello_world(): ...") -------------------------

REF_CODE = 'def hello_world():\n    print("Hello, world!")\n    return 42'


def test_reference_hello_world_contract():
    meta = extract_code_metadata(REF_CODE, info="python")
    assert meta["language"] == "python"
    assert meta["length"] == len(REF_CODE)
    assert [f["name"] for f in meta["functions"]] == ["hello_world"]
    assert meta["functions"][0]["params"] == []


def test_fence_info_first_word_lowercased():
    # token.info.split()[0].lower() — markdown_extractor.py:529-531
    assert classify_code_language("x", info="Python 3.12 {title}") == "python"
    assert classify_code_language("x", info="RUST") == "rust"
    # empty/whitespace info falls back to content heuristics
    assert classify_code_language("def f(): pass", info="  ") == "python"


def test_content_classification_heuristics():
    assert classify_code_language("def f(a, b):\n    return a") == "python"
    assert classify_code_language("from os import path\nprint(1)") == "python"
    assert classify_code_language("fn add(a: i32, b: i32) -> i32 { a + b }") == "rust"
    assert classify_code_language("func main() {\n}\n") == "go"
    assert classify_code_language("package main\n\nvar x = 1") == "go"
    assert classify_code_language("function go(x) { return x; }") == "javascript"
    assert classify_code_language("const f = (x) => x * 2;") == "javascript"
    assert classify_code_language("public static void main(String[] a) {}") == "java"
    assert classify_code_language("SELECT a FROM t WHERE b = 1") == "sql"
    assert classify_code_language("#!/bin/sh\necho hi") == "shell"
    assert classify_code_language("<div>hello</div>") == "html"
    assert classify_code_language('{"a": 1}') == "json"
    assert classify_code_language("just some words") == "text"


def test_python_params_strip_annotations_and_defaults():
    code = "async def run(self, n: int = 3, *args, **kwargs):\n    pass"
    fns = extract_functions(code, "python")
    assert fns == [{"name": "run", "params": ["self", "n", "args", "kwargs"]}]


def test_rust_params_skip_self_receiver():
    code = "pub fn scale(&mut self, factor: f64, label: &str) -> f64 { 0.0 }"
    fns = extract_functions(code, "rust")
    assert fns == [{"name": "scale", "params": ["factor", "label"]}]


def test_go_grouped_params_and_method_receiver():
    code = "func (s *Store) Put(key string, a, b int) error {\n return nil\n}"
    fns = extract_functions(code, "go")
    assert fns == [{"name": "Put", "params": ["key", "a", "b"]}]


def test_js_function_and_arrow():
    code = "export function render(props) {}\nconst fmt = (v, width = 2) => pad(v, width);"
    fns = extract_functions(code, "javascript")
    assert {f["name"]: f["params"] for f in fns} == {
        "render": ["props"],
        "fmt": ["v", "width"],
    }


def test_alias_languages_route_to_extractor():
    assert extract_functions("def f(x): pass", "py")[0]["name"] == "f"
    assert extract_functions("fn f(x: u8) {}", "rs")[0]["name"] == "f"
    assert extract_functions("function f(x) {}", "ts")[0]["name"] == "f"


def test_unknown_language_yields_empty_functions():
    # the reference's minimal fallback has no function extraction either
    # (markdown_extractor.py:75-78; context7 mock :91-97 returns [])
    assert extract_functions("SELECT 1", "sql") == []
    assert extract_code_metadata("SELECT 1")["functions"] == []


def test_pipeline_attaches_code_metadata():
    spans = [
        {"kind": "heading", "text": "# T", "media_ref": "", "offset": 0},
        {
            "kind": "code",
            "text": "def handler_3(x):\n    return x * 4\n",
            "media_ref": "",
            "offset": 1,
        },
        {"kind": "text", "text": "plain", "media_ref": "", "offset": 2},
    ]
    out = extract_document(spans)
    code = next(e for e in out if e["kind"] == "code")
    assert code["code_language"] == "python"
    assert code["code_functions"] == [{"name": "handler_3", "params": ["x"]}]
    # length contract is derivable: len(text) == code_metadata.length
    assert len(code["text"]) == extract_code_metadata(code["text"])["length"]
    # non-code elements carry nulls, not empty lists
    text_el = next(e for e in out if e["kind"] == "text")
    assert text_el["code_language"] is None and text_el["code_functions"] is None
