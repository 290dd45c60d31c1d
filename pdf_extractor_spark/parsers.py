"""Structured-text parsers (reference: context7/pdf_extractor/parsers.py).

Pure-Python (Arrow-batch friendly) re-implementations used inside
pandas UDFs and directly in tests; each mirrors a reference routine's
observable behavior including its embedded EXPECTED_RESULTS cases
(parsers.py:216-485).
"""

from __future__ import annotations

import re
from typing import Any, Dict, List

_HEADING_RE = re.compile(r"^(#{1,6})\s+(.+)$")
_KV_RE = re.compile(r"^([A-Za-z0-9_\- ]+):\s*(.+)$", re.MULTILINE)
_TITLE_RE = re.compile(r"^(?:Title|#)\s*[:.\s]*\s*(.+)$", re.MULTILINE)
_AUTHOR_RE = re.compile(r"^(?:Author|By)\s*[:.\s]*\s*(.+)$", re.MULTILINE)
_DATE_RE = re.compile(r"^(?:Date|Published)\s*[:.\s]*\s*(.+)$", re.MULTILINE)


def parse_structured_text(text: str) -> List[Dict[str, Any]]:
    """Line scan → typed blocks; parsers.py:39-117.

    Headings (#{1,6}) and code-fence openers emit their own blocks;
    blank lines end the current paragraph; expected block sequence for
    the reference's own fixture is
    [heading, paragraph, heading, code, paragraph] (parsers.py:222-236).
    """
    if not text:
        return []
    blocks: List[Dict[str, Any]] = []
    current = {"type": "paragraph", "content": "", "metadata": {}}
    for line in text.split("\n"):
        hm = _HEADING_RE.match(line)
        if hm:
            if current["content"]:
                blocks.append(current)
            blocks.append(
                {
                    "type": "heading",
                    "content": hm.group(2).strip(),
                    "metadata": {"level": len(hm.group(1))},
                }
            )
            current = {"type": "paragraph", "content": "", "metadata": {}}
            continue
        if line.startswith("```"):
            if current["content"]:
                blocks.append(current)
            blocks.append(
                {"type": "code", "content": "", "metadata": {"language": line[3:].strip()}}
            )
            current = {"type": "paragraph", "content": "", "metadata": {}}
            continue
        if not line.strip() and current["content"]:
            blocks.append(current)
            current = {"type": "paragraph", "content": "", "metadata": {}}
            continue
        if current["content"]:
            current["content"] += "\n"
        current["content"] += line
    if current["content"]:
        blocks.append(current)
    return blocks


def parse_table_data(table_data: List[List[str]]) -> Dict[str, Any]:
    """list-of-lists → {headers, rows}; parsers.py:119-152.

    Row 0 is headers; short rows are padded with "" and long rows
    truncated to the header width; all cells trimmed.
    """
    if not table_data or len(table_data) < 2:
        return {"headers": [], "rows": []}
    headers = [c.strip() for c in table_data[0]]
    rows = []
    for row in table_data[1:]:
        if len(row) < len(headers):
            row = row + [""] * (len(headers) - len(row))
        elif len(row) > len(headers):
            row = row[: len(headers)]
        rows.append([c.strip() for c in row])
    return {"headers": headers, "rows": rows}


def extract_metadata(text: str) -> Dict[str, str]:
    """``Key: Value`` + Title/Author/Date patterns; parsers.py:154-189."""
    metadata: Dict[str, str] = {}
    for m in _KV_RE.finditer(text):
        metadata[m.group(1).strip().lower().replace(" ", "_")] = m.group(2).strip()
    tm = _TITLE_RE.search(text)
    if tm:
        metadata["title"] = tm.group(1).strip()
    am = _AUTHOR_RE.search(text)
    if am:
        metadata["author"] = am.group(1).strip()
    dm = _DATE_RE.search(text)
    if dm:
        metadata["date"] = dm.group(1).strip()
    return metadata


# ---------------------------------------------------------------------------
# P11 — numeric cell coercion (reference table_extraction.py:373-392
# clean_table_dataframe: ``df.apply(pd.to_numeric, errors="ignore")``,
# i.e. a COLUMN is converted to a numeric dtype only when EVERY cell in
# it parses; otherwise the column stays string, cell values untouched).
# ---------------------------------------------------------------------------


_INT_CELL_RE = re.compile(r"[+-]?\d+")


def _cell_int(v: Any) -> int:
    # Python's int() accepts underscore groupings ("1_0"); pandas'
    # to_numeric and Spark's cast do not — gate on a strict digit regex.
    if not isinstance(v, str) or not _INT_CELL_RE.fullmatch(v.strip()):
        raise ValueError(v)
    return int(v)


_NONFINITE_RE = re.compile(r"[+-]?(nan|inf|infinity)", re.IGNORECASE)


def _cell_float(v: Any) -> float:
    if v is None:
        return float("nan")  # missing cell (ragged row pad) → NaN
    if not isinstance(v, str) or "_" in v:
        raise ValueError(v)
    if not v.strip():
        return float("nan")  # pandas: empty cell → NaN, column still floats
    if _NONFINITE_RE.fullmatch(v.strip()):
        raise ValueError(v)  # pandas rejects "nan"/"inf" strings
    return float(v)


def _pad_rect(rows: List[List[str]]) -> List[List[Any]]:
    """Pad ragged rows with None to the widest row — pandas'
    DataFrame constructor does the same (NaN) before to_numeric."""
    width = max(len(r) for r in rows)
    return [list(r) + [None] * (width - len(r)) for r in rows]


def coerce_numeric_columns(rows: List[List[str]]) -> List[List[Any]]:
    """Column-wise numeric coercion of table data rows.

    Mirrors pandas' column semantics: a column becomes int when every
    cell parses as an integer, float when every cell parses as a float,
    and stays the original strings otherwise (errors="ignore" — no
    partial conversion within a column).
    """
    if not rows:
        return rows
    rect = _pad_rect(rows)
    ncols = len(rect[0])
    cols: List[List[Any]] = []
    for c in range(ncols):
        vals = [r[c] for r in rect]
        coerced: List[Any]
        try:
            coerced = [_cell_int(v) for v in vals]
        except (TypeError, ValueError):
            try:
                coerced = [_cell_float(v) for v in vals]
            except (TypeError, ValueError):
                coerced = list(vals)
        cols.append(coerced)
    return [[cols[c][i] for c in range(ncols)] for i in range(len(rect))]


def infer_column_types(rows: List[List[str]]) -> List[str]:
    """Per-column inferred type tag ('bigint' | 'double' | 'string') —
    the metadata twin of :func:`coerce_numeric_columns`, matching the
    Spark-native ``column_types_expr`` (operators/quality.py)."""
    if not rows:
        return []
    rect = _pad_rect(rows)
    out = []
    for c in range(len(rect[0])):
        vals = [r[c] for r in rect]
        try:
            [_cell_int(v) for v in vals]
            out.append("bigint")
            continue
        except (TypeError, ValueError):
            pass
        try:
            [_cell_float(v) for v in vals]
            out.append("double")
        except (TypeError, ValueError):
            out.append("string")
    return out
