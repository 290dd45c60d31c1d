"""Table-region detection via ruling-line / whitespace heuristics.

Re-expression of the reference's Camelot two-flavor detection
(S9 lattice: ruling lines, ``camelot.read_pdf(flavor="lattice",
line_scale=15)``, context7/table_extractor.py:69-85; S10 stream:
whitespace columns, ``flavor="stream", edge_tol=500``, :75-76) plus
the lattice→stream fallback when lattice accuracy < 80
(context7/table_extractor.py:95-108) — as deterministic numpy
heuristics over a monospace page-text grid, batched inside a pandas
UDF (mapInPandas). No ML, no external library.

* lattice: maximal runs of lines whose ``|`` pipe-column positions
  agree; accuracy = 100 · mean per-line alignment with the run's
  consensus columns.
* stream: maximal runs (≥3 lines) of non-empty lines sharing interior
  whitespace columns (a character column that is blank in every line
  of the run, with text on both sides); accuracy scales with the
  consensus column count.
"""

from __future__ import annotations

from typing import Iterator, List

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

LATTICE_MIN_ACCURACY = 80.0  # context7/table_extractor.py:95
MIN_STREAM_LINES = 3

REGION_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("page", IntegerType()),
        StructField("top_line", IntegerType()),
        StructField("bottom_line", IntegerType()),
        StructField("n_cols", IntegerType()),
        StructField("method", StringType()),
        StructField("accuracy", DoubleType()),
    ]
)


def _char_grid(lines: List[str]) -> np.ndarray:
    width = max((len(ln) for ln in lines), default=0)
    grid = np.full((len(lines), max(width, 1)), " ", dtype="<U1")
    for i, ln in enumerate(lines):
        if ln:
            grid[i, : len(ln)] = list(ln)
    return grid


def detect_lattice_regions(lines: List[str]) -> List[dict]:
    """Runs of pipe-aligned lines → lattice regions with accuracy."""
    pipe_cols = [
        frozenset(i for i, ch in enumerate(ln) if ch == "|") for ln in lines
    ]
    regions: List[dict] = []
    i = 0
    while i < len(lines):
        if len(pipe_cols[i]) >= 2:
            j = i
            while j + 1 < len(lines) and len(pipe_cols[j + 1]) >= 2:
                j += 1
            if j > i:  # at least 2 ruled lines
                consensus = frozenset.intersection(*pipe_cols[i : j + 1])
                if len(consensus) >= 2:
                    per_line = [
                        len(consensus) / len(c) for c in pipe_cols[i : j + 1]
                    ]
                    regions.append(
                        {
                            "top_line": i,
                            "bottom_line": j,
                            "n_cols": len(consensus) - 1,
                            "method": "lattice",
                            "accuracy": round(100.0 * float(np.mean(per_line)), 2),
                        }
                    )
            i = j + 1
        else:
            i += 1
    return regions


def detect_stream_regions(lines: List[str]) -> List[dict]:
    """Runs of lines sharing interior blank columns → stream regions."""
    regions: List[dict] = []
    nonempty = [bool(ln.strip()) for ln in lines]
    i = 0
    while i < len(lines):
        if not nonempty[i]:
            i += 1
            continue
        j = i
        while j + 1 < len(lines) and nonempty[j + 1]:
            j += 1
        run = lines[i : j + 1]
        if len(run) >= MIN_STREAM_LINES:
            grid = _char_grid(run)
            blank = (grid == " ").all(axis=0)
            width = grid.shape[1]
            first_text = np.argmax(~blank) if (~blank).any() else width
            last_text = width - 1 - np.argmax((~blank)[::-1]) if (~blank).any() else 0
            interior = blank.copy()
            interior[: first_text + 1] = False
            interior[last_text:] = False
            # count contiguous interior blank bands of width >= 2
            bands = 0
            k = int(first_text)
            while k < last_text:
                if interior[k]:
                    w = 0
                    while k < last_text and interior[k]:
                        w += 1
                        k += 1
                    if w >= 2:
                        bands += 1
                else:
                    k += 1
            if bands >= 1:
                regions.append(
                    {
                        "top_line": i,
                        "bottom_line": j,
                        "n_cols": bands + 1,
                        "method": "stream",
                        "accuracy": round(min(100.0, 60.0 + 20.0 * bands), 2),
                    }
                )
        i = j + 1
    return regions


def detect_table_regions(page_text: str) -> List[dict]:
    """Lattice first; fall back to stream when the best lattice
    accuracy is below the 80.0 threshold
    (context7/table_extractor.py:95-108)."""
    lines = page_text.split("\n")
    lattice = detect_lattice_regions(lines)
    if lattice and max(r["accuracy"] for r in lattice) >= LATTICE_MIN_ACCURACY:
        return lattice
    stream = detect_stream_regions(lines)
    return stream if stream else lattice


def detect_regions_df(pages: DataFrame) -> DataFrame:
    """(doc_id, page:int, page_text:string) → detected regions.

    Arrow-batched mapInPandas — map-only, no shuffle; at 100 TB this
    runs scan-side next to the extraction kernel."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict = {f.name: [] for f in REGION_SCHEMA.fields}
            for did, page, text in zip(
                pdf["doc_id"], pdf["page"], pdf["page_text"]
            ):
                for r in detect_table_regions(text):
                    rows["doc_id"].append(did)
                    rows["page"].append(page)
                    for k in ("top_line", "bottom_line", "n_cols", "method", "accuracy"):
                        rows[k].append(r[k])
            yield pd.DataFrame(rows)

    return pages.mapInPandas(gen, schema=REGION_SCHEMA)
