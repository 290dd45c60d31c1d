"""spark-submit driver CLI — the engine's answer to the reference's
typer CLI (`cli.py:396-495` convert, `search_cli.py`) per SURVEY.md
§3.1/§3.2 ("Spark shape: not a service; spark-submit --py-files driver").

Subcommands mirror the reference's verbs on the distributed pipeline:

  convert       directory of md/txt (or text-layer PDFs) → extracted
                element parquet, optional JSON-lines sink (S13)
  search        unified search dispatch (bm25 / bm25_stemmed /
                semantic / hybrid / tag) over an SF dir, rendered like
                main_usage.py:92-119's result log
  quality-gate  streaming Gopher + bloom ingestion gate over a
                document inbox (availableNow drain)

Usage: ``python -m pdf_extractor_spark <cmd> ...`` (or spark-submit
with the package zip on --py-files; session.get_spark ships it).
"""

from __future__ import annotations

import argparse
import sys


def _cmd_convert(args) -> int:
    from .operators.extract import extract_spans, extracted_flat
    from .session import get_spark
    from .sources import read_pdf_docs, read_text_docs, write_docs_json

    spark = get_spark("pdf_extractor_spark.convert", master=args.master)
    if args.format == "pdf":
        docs = read_pdf_docs(spark, args.input, glob=args.glob or "*.pdf")
    else:
        docs = read_text_docs(spark, args.input, glob=args.glob or "*.md")
    extracted = extract_spans(
        docs,
        merge_strategy=args.merge_strategy,
        mega_span_threshold=args.mega_span_threshold,
    )
    flat = extracted_flat(extracted)
    flat.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    if args.json_dir:
        write_docs_json(extracted, args.json_dir)
    print(f"convert: {n} elements -> {args.output}")
    return 0


def _cmd_search(args) -> int:
    from .analytics.search_api import unified_search
    from .session import get_spark

    spark = get_spark("pdf_extractor_spark.search", master=args.master)
    df = unified_search(
        spark,
        args.sf_dir,
        search_type=args.type,
        query=args.query,
        top_n=args.top_n,
    )
    rows = df.limit(args.top_n).collect()
    # main_usage.py:92-119-style result log: rank, score-ish field, id
    print(f"search[{args.type}]: {len(rows)} results")
    for i, r in enumerate(rows, 1):
        d = r.asDict()
        key = next(
            (k for k in ("doc_id", "vec_id", "term", "o_orderkey") if k in d),
            list(d)[0],
        )
        score = next(
            (
                f"{k}={d[k]}"
                for k in ("bm25", "score", "rrf_score", "cosine", "similarity_score")
                if k in d and d[k] is not None
            ),
            "",
        )
        print(f"  {i}. {key}={d[key]} {score}".rstrip())
    return 0


def _cmd_quality_gate(args) -> int:
    from .session import get_spark
    from .streaming import stream_quality_gate

    spark = get_spark("pdf_extractor_spark.quality_gate", master=args.master)
    bits = None
    if args.bloom_sf_dir:
        from .analytics.curation import bloom_bench_bits

        bits = bloom_bench_bits(spark, args.bloom_sf_dir)
    stream_quality_gate(
        spark, args.input, args.output, args.checkpoint, bench_bits=bits
    )
    n = spark.read.parquet(args.output).count()
    print(f"quality-gate: {n} docs routed -> {args.output}")
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="pdf_extractor_spark")
    p.add_argument("--master", default=None, help="spark master override")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("convert", help="extract a directory of documents")
    c.add_argument("--input", required=True)
    c.add_argument("--output", required=True)
    c.add_argument("--format", choices=["md", "pdf"], default="md")
    c.add_argument("--glob", default=None)
    c.add_argument("--json-dir", default=None)
    c.add_argument("--merge-strategy", default="default")
    c.add_argument("--mega-span-threshold", type=int, default=5_000)
    c.set_defaults(fn=_cmd_convert)

    s = sub.add_parser("search", help="unified search over an SF dir")
    s.add_argument("--sf-dir", required=True)
    s.add_argument(
        "--type",
        default="hybrid",
        help="bm25|bm25_stemmed|semantic|hybrid|tag (unknown → hybrid)",
    )
    s.add_argument("--query", default=None)
    s.add_argument("--top-n", type=int, default=10)
    s.set_defaults(fn=_cmd_search)

    g = sub.add_parser("quality-gate", help="streaming ingestion gate")
    g.add_argument("--input", required=True)
    g.add_argument("--output", required=True)
    g.add_argument("--checkpoint", required=True)
    g.add_argument(
        "--bloom-sf-dir",
        default=None,
        help="SF dir whose benchmark slice builds the decon bitset",
    )
    g.set_defaults(fn=_cmd_quality_gate)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
