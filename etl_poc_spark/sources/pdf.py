"""PDF download + text extraction operators (SURVEY.md §2.1 S2/S3, §2.11 X1).

- download_pdfs: per-row idempotent fetch on executors (mapInPandas). The
  reference skips downloads when the target exists and is >= 1 KB
  (arxiv_hook.py:125-128) — same check here; idempotency comes from the
  deterministic target path, so retried tasks converge. The fetcher is
  pluggable; the default StubPdfFetcher synthesizes a deterministic
  PDF-magic payload (no network in this environment).
- extract_pdf_text: binary content -> text. Uses PyMuPDF (fitz) when
  importable — page-by-page extraction joined with a separator and a
  too-short warning flag, matching arxiv_hook.py:145-182 — else a
  deterministic stub that decodes the synthetic payload. The import-try is
  per-executor, inside the UDF.
- PARSING_TOOLS: the named parsing-tool registry (X1): name -> function
  `dict -> list[dict]` (may fan out), the reference's parsing_tools
  contract (article_pipeline.yaml.j2:2-12).
"""

from __future__ import annotations

import hashlib
import os
from typing import Any, Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

PAGE_SEPARATOR = "\n\n"
MIN_TEXT_LEN = 100  # arxiv_hook warns when extracted text is shorter


def stub_pdf_bytes(arxiv_id: str, n_pages: int = 3) -> bytes:
    """Deterministic fake PDF: magic header + per-page text payload."""
    pages = [
        f"Page {i} of {arxiv_id}: " + " ".join(hashlib.md5(f"{arxiv_id}|{i}|{j}".encode()).hexdigest() for j in range(20))
        for i in range(n_pages)
    ]
    return b"%PDF-1.4\n" + "\x0c".join(pages).encode() + b"\n%%EOF"


class StubPdfFetcher:
    def fetch(self, url: str, arxiv_id: str) -> bytes:
        return stub_pdf_bytes(arxiv_id)


def download_pdfs(
    df: DataFrame,
    out_dir: str,
    id_col: str = "arxiv_id",
    url_col: str = "pdf_url",
    fetcher=None,
) -> DataFrame:
    """Adds pdf_path + was_cached columns; downloads happen on executors,
    skipped when the target exists with >= 1 KB (idempotent re-runs)."""
    fetcher = fetcher or StubPdfFetcher()
    in_fields = df.schema.fields
    out_schema = T.StructType(
        list(in_fields) + [T.StructField("pdf_path", T.StringType()), T.StructField("was_cached", T.BooleanType())]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        os.makedirs(out_dir, exist_ok=True)
        for pdf in batches:
            paths, cached = [], []
            for rec in pdf.to_dict("records"):
                safe = "".join(ch if ch.isalnum() or ch in "._-" else "_" for ch in str(rec[id_col]))
                target = os.path.join(out_dir, f"{safe}.pdf")
                if os.path.exists(target) and os.path.getsize(target) >= 1024:
                    cached.append(True)
                else:
                    data = fetcher.fetch(str(rec.get(url_col, "")), str(rec[id_col]))
                    with open(target, "wb") as f:
                        f.write(data)
                    cached.append(False)
                paths.append(target)
            pdf = pdf.copy()
            pdf["pdf_path"] = paths
            pdf["was_cached"] = cached
            yield pdf

    return df.mapInPandas(fn, schema=out_schema)


def _extract_text(data: bytes) -> str | None:
    try:
        import fitz  # PyMuPDF — optional, not bundled here

        doc = fitz.open(stream=data, filetype="pdf")
        return PAGE_SEPARATOR.join(page.get_text() for page in doc)
    except ImportError:
        if data[:5] == b"%PDF-":
            body = data[9:].rsplit(b"\n%%EOF", 1)[0]
            return PAGE_SEPARATOR.join(p.decode(errors="replace") for p in body.split(b"\x0c"))
        return None


def extract_pdf_text(df: DataFrame, content_col: str = "content", keep_cols: list[str] | None = None) -> DataFrame:
    """binary PDF column -> full_text (+ text_too_short flag)."""
    keep = keep_cols or [c for c in df.columns if c != content_col]
    in_fields = [f for f in df.schema.fields if f.name in keep]
    out_schema = T.StructType(
        list(in_fields)
        + [T.StructField("full_text", T.StringType()), T.StructField("text_too_short", T.BooleanType())]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                text = _extract_text(bytes(rec[content_col]))
                rows.append(
                    {**{k: rec[k] for k in keep}, "full_text": text, "text_too_short": text is None or len(text) < MIN_TEXT_LEN}
                )
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.mapInPandas(fn, schema=out_schema)


# ---------------------------------------------------------------------------
# X1: named parsing-tool registry — Dict -> List[Dict] (may fan out)
# ---------------------------------------------------------------------------

ParsingTool = Callable[[dict[str, Any]], list[dict[str, Any]]]
PARSING_TOOLS: dict[str, ParsingTool] = {}


def parsing_tool(name: str) -> Callable[[ParsingTool], ParsingTool]:
    def deco(fn: ParsingTool) -> ParsingTool:
        PARSING_TOOLS[name] = fn
        return fn
    return deco


@parsing_tool("extract_pdf_text")
def _tool_extract_pdf_text(record: dict[str, Any]) -> list[dict[str, Any]]:
    data = record.get("content")
    text = _extract_text(bytes(data)) if data is not None else None
    return [{**{k: v for k, v in record.items() if k != "content"}, "full_text": text or ""}]


@parsing_tool("split_lines")
def _tool_split_lines(record: dict[str, Any]) -> list[dict[str, Any]]:
    text = str(record.get("full_text") or record.get("text") or "")
    return [{**record, "line_no": i, "line": ln} for i, ln in enumerate(text.splitlines()) if ln.strip()]


def apply_parsing_tool(df: DataFrame, tool_name: str, out_schema: T.StructType) -> DataFrame:
    """Run a registered Dict->List[Dict] tool as a fan-out mapInPandas
    (the reference's parsing_tools execution contract)."""
    tool = PARSING_TOOLS[tool_name]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        names = [f.name for f in out_schema.fields]
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                for out in tool(rec):
                    rows.append({k: out.get(k) for k in names})
            yield pd.DataFrame(rows, columns=names)

    return df.mapInPandas(fn, schema=out_schema)


from etl_poc_spark._serde import register_by_value as _rbv  # noqa: E402

_rbv(__name__)
