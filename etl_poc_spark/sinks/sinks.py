"""Non-tabular sinks (SURVEY.md §2.1 S6/S7/S9).

- write_json_records: the reference's list-of-records JSON file (S6,
  zara_hybrid_etl.py:240-243). Two modes: `single_file=True` collects to
  the driver and dumps one JSON array (faithful to the reference; only for
  small result sets like its ~10-article batches), else distributed
  `df.write.json` (JSON-lines, the scale path).
- write_markdown_articles: per-article directory with article.md (YAML
  front-matter + body + pull-quote blockquotes + takeaways section) and
  article.json (S7, zara_hybrid_etl.py:96-128). Runs via foreachPartition —
  row-wise filesystem layout is inherently per-row work; executors write
  directly, nothing funnels through the driver.
- write_error_record: error-quarantine sink (S9, docetl_operator.py:319-334)
  as an append-mode JSON-lines errors table.
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone
from typing import Any

from pyspark.sql import DataFrame

from etl_poc_spark.functions.text import slugify


def write_json_records(df: DataFrame, path: str, single_file: bool = False) -> int:
    """Write records as JSON; returns the row count."""
    if single_file:
        records = [row.asDict(recursive=True) for row in df.collect()]
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w", encoding="utf-8") as f:
            json.dump(records, f, indent=2, ensure_ascii=False, default=str)
        return len(records)
    df.write.mode("overwrite").json(path)
    return df.count()


def _article_markdown(article: dict[str, Any]) -> str:
    import yaml

    fm = {
        "title": article.get("headline", "") or article.get("title", ""),
        "subtitle": article.get("subtitle", ""),
        "tags": article.get("topic_tags") or [],
        "authors": article.get("authors") or [],
        "arxiv_id": article.get("arxiv_id", ""),
        "word_count": article.get("word_count", 0),
        "meta_description": article.get("meta_description", ""),
        "created": datetime.now(timezone.utc).isoformat(),
    }
    front = "---\n" + yaml.safe_dump(fm, sort_keys=False, allow_unicode=True) + "---\n\n"
    body = article.get("article_body", "") or ""
    if article.get("pull_quotes"):
        body += "\n\n> " + "\n> ".join(article["pull_quotes"])
    if article.get("key_takeaways"):
        body += "\n\n## What This Means\n" + "\n".join(f"- {t}" for t in article["key_takeaways"])
    return front + body


def write_markdown_articles(df: DataFrame, out_dir: str, name_col: str = "headline") -> None:
    """Materialize one directory per article: <slug>/article.md + article.json.

    The slug is disambiguated with a short content hash of the whole row, so
    two articles with identically-slugging headlines (or writes racing
    across partitions) land in distinct directories instead of silently
    overwriting each other. The suffix is deterministic — re-running the
    sink on the same data reuses the same directories (idempotent). Rows
    that are byte-identical in EVERY column share a directory by design:
    they are the same article, and the identical payload makes the double
    write harmless (content-keyed dedup, not data loss)."""
    from pyspark.sql import functions as F

    disamb = F.substring(F.md5(F.to_json(F.struct(*[F.col(c) for c in df.columns]))), 1, 8)
    with_slug = df.withColumn(
        "__slug", F.concat_ws("-", slugify(F.col(name_col)), disamb)
    )

    def write_partition(rows) -> None:
        for row in rows:
            article = row.asDict(recursive=True)
            slug = article.pop("__slug")
            folder = os.path.join(out_dir, slug)
            os.makedirs(folder, exist_ok=True)
            with open(os.path.join(folder, "article.md"), "w", encoding="utf-8") as f:
                f.write(_article_markdown(article))
            with open(os.path.join(folder, "article.json"), "w", encoding="utf-8") as f:
                json.dump(article, f, indent=2, ensure_ascii=False, default=str)

    with_slug.foreachPartition(write_partition)


def write_error_record(error: Exception, context: dict[str, Any], errors_dir: str) -> str:
    """Quarantine a failure as a JSON record; returns the file path."""
    os.makedirs(errors_dir, exist_ok=True)
    ts = datetime.now(timezone.utc).strftime("%Y%m%d_%H%M%S_%f")
    path = os.path.join(errors_dir, f"error_{ts}.json")
    with open(path, "w", encoding="utf-8") as f:
        json.dump(
            {"error": str(error), "type": type(error).__name__, "context": context, "timestamp": ts},
            f,
            indent=2,
            default=str,
        )
    return path


from etl_poc_spark._serde import register_by_value as _rbv  # noqa: E402

_rbv(__name__)
