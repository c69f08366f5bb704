"""llm_map / llm_reduce — the engine's versions of the reference's LLM
map/reduce operators (SURVEY.md §2.9 L2-L6, §4.3.1).

Design (Spark-first):

- llm_map: `mapInPandas` — Arrow-batched, one provider call per row within
  a batch (a real HTTP provider would batch/async inside the UDF); the
  reference's per-op `output_schema` becomes an explicit StructType appended
  to the input columns.
- llm_reduce: `groupBy(...).applyInPandas` — the grouped fold
  (`synthesize_paper_content`, paper_extraction.yaml:63-108): all rows of a
  group are presented to the provider as one concatenated context.
- Validation + retry (L7): per-row validator exprs evaluated against the
  output dict; on failure the provider is re-invoked up to
  `num_retries_on_validate_failure` times (the reference default is 2,
  article_pipeline.yaml.j2:49). Rows that still fail get `_valid = False`
  rather than being dropped silently.
- Cost accounting (§4.1): an accumulator counts provider calls + prompt
  chars — first-class metrics instead of the reference's stdout scraping.
- The resulting DataFrame is plan-opaque to Catalyst; order relational
  filters BEFORE these ops so pushdown reduces provider calls (§4.2).

Validators are restricted expressions evaluated with NO builtins except
`len` over the `output` dict (the reference evals arbitrary Python,
docetl/config/article_pipeline.yaml.j2:45-48 — we deliberately narrow that).
"""

from __future__ import annotations

import ast
import re
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from etl_poc_spark.llm.provider import LLMProvider, StubProvider

_TEMPLATE_RE = re.compile(r"\{\{\s*input\.([A-Za-z_][A-Za-z0-9_]*)\s*\}\}")


def render_prompt(template: str, record: dict[str, Any]) -> str:
    """DocETL-style `{{ input.field }}` substitution."""
    return _TEMPLATE_RE.sub(lambda m: str(record.get(m.group(1), "")), template)


_VALIDATOR_CALLS: dict[str, Any] = {"len": len, "str": str, "int": int, "float": float, "bool": bool}

# Safe data-methods a validator may CALL (immediately — bare attribute
# access is rejected). All are plain str/list/dict inspection methods; none
# can reach dunders, and the dunder escape chains (e.g. __class__,
# mro()[1].__subclasses__()) require attribute names this list excludes.
_VALIDATOR_METHODS = frozenset({
    "split", "strip", "lstrip", "rstrip", "lower", "upper", "startswith",
    "endswith", "count", "find", "isdigit", "isalpha", "isalnum", "get",
    "keys", "values", "items", "index",
})

# AST node whitelist for validator expressions: literals, boolean logic,
# comparisons (incl. membership), arithmetic, subscripts, conditional
# expressions, and calls to the five safe builtins above. ast.Attribute is
# the sandbox-escape vector (e.g. str.mro()[1].__subclasses__() reaches os
# from an "empty" eval namespace), so it is allowed ONLY as the target of an
# immediate call to a whitelisted non-dunder data method.
_VALIDATOR_NODES: tuple[type, ...] = (
    ast.Expression, ast.BoolOp, ast.And, ast.Or, ast.UnaryOp, ast.Not, ast.USub, ast.UAdd,
    ast.Compare, ast.Eq, ast.NotEq, ast.Lt, ast.LtE, ast.Gt, ast.GtE,
    ast.In, ast.NotIn, ast.Is, ast.IsNot,
    ast.BinOp, ast.Add, ast.Sub, ast.Mult, ast.Div, ast.FloorDiv, ast.Mod,
    ast.Call, ast.Name, ast.Load, ast.Constant, ast.Subscript, ast.Slice,
    ast.Tuple, ast.List, ast.IfExp, ast.Attribute,
)


def eval_validator(expr: str, output: dict[str, Any]) -> bool:
    """Evaluate a restricted validator expression against the output dict.

    The expression is parsed and structurally whitelisted (ast-based) before
    evaluation: only literals, boolean/comparison/arithmetic operators,
    subscripts, and calls to `len`/`str`/`int`/`float`/`bool` over the
    `output` name are allowed. Attribute access, keyword arguments, and any
    other name are rejected, so a YAML-configured validator cannot execute
    arbitrary code on executors (the reference evals arbitrary Python — we
    deliberately narrow that)."""
    allowed_names = {"output", *_VALIDATOR_CALLS}
    try:
        tree = ast.parse(expr, mode="eval")
        called_methods = {
            id(n.func) for n in ast.walk(tree)
            if isinstance(n, ast.Call) and isinstance(n.func, ast.Attribute)
        }
        for node in ast.walk(tree):
            if not isinstance(node, _VALIDATOR_NODES):
                return False
            if isinstance(node, ast.Call):
                if node.keywords:
                    return False
                if isinstance(node.func, ast.Name):
                    if node.func.id not in _VALIDATOR_CALLS:
                        return False
                elif not isinstance(node.func, ast.Attribute):
                    return False
            if isinstance(node, ast.Attribute):
                # attributes exist only as immediately-called safe methods
                if id(node) not in called_methods or node.attr not in _VALIDATOR_METHODS or node.attr.startswith("_"):
                    return False
            if isinstance(node, ast.Name) and node.id not in allowed_names:
                return False
        code = compile(tree, "<validator>", "eval")
        return bool(eval(code, {"__builtins__": {}}, {"output": output, **_VALIDATOR_CALLS}))  # noqa: S307
    except Exception:  # noqa: BLE001 — a crashing validator is a failed validation
        return False


def _coerce(value: Any, dt: T.DataType) -> Any:
    if value is None:
        return None
    try:
        if isinstance(dt, T.StringType):
            return str(value)
        if isinstance(dt, (T.LongType, T.IntegerType)):
            return int(value)
        if isinstance(dt, T.DoubleType):
            return float(value)
        if isinstance(dt, T.BooleanType):
            return bool(value)
        if isinstance(dt, T.ArrayType):
            return [_coerce(v, dt.elementType) for v in value]
        if isinstance(dt, T.MapType):
            return {str(k): _coerce(v, dt.valueType) for k, v in dict(value).items()}
        if isinstance(dt, T.StructType):
            return {f.name: _coerce(dict(value).get(f.name), f.dataType) for f in dt.fields}
    except (TypeError, ValueError):
        return None
    return value


def _run_one(
    provider: LLMProvider,
    prompt_template: str,
    record: dict[str, Any],
    out_fields: list[str],
    validators: tuple[str, ...],
    max_retries: int,
) -> tuple[dict[str, Any], bool, int]:
    calls = 0
    out: dict[str, Any] = {}
    for _ in range(max_retries + 1):
        prompt = render_prompt(prompt_template, record)
        out = provider.complete(prompt, record, out_fields)
        calls += 1
        if all(eval_validator(v, out) for v in validators):
            return out, True, calls
    return out, False, calls


def llm_map(
    df: DataFrame,
    prompt_template: str,
    output_schema: T.StructType,
    provider: LLMProvider | None = None,
    validators: tuple[str, ...] = (),
    max_retries: int = 2,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Apply an LLM map op row-wise; appends the declared output fields plus
    a `_valid` boolean (validation-retry survivors keep False, not dropped)."""
    provider = provider or StubProvider()
    keep = keep_cols if keep_cols is not None else df.columns
    # output fields shadow same-named input columns (chained llm ops each
    # produce their own _valid; the latest op's verdict wins)
    shadowed = {f.name for f in output_schema.fields} | {"_valid"}
    keep = [c for c in keep if c not in shadowed]
    in_schema = T.StructType([f for f in df.schema.fields if f.name in keep])
    out_schema = T.StructType(
        list(in_schema.fields) + list(output_schema.fields) + [T.StructField("_valid", T.BooleanType())]
    )
    out_fields = [f.name for f in output_schema.fields]
    spark = df.sparkSession
    calls_acc = spark.sparkContext.accumulator(0)
    chars_acc = spark.sparkContext.accumulator(0)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                out, ok, calls = _run_one(provider, prompt_template, rec, out_fields, validators, max_retries)
                calls_acc.add(calls)
                chars_acc.add(len(render_prompt(prompt_template, rec)))
                row = {k: rec.get(k) for k in keep}
                for f in output_schema.fields:
                    row[f.name] = _coerce(out.get(f.name), f.dataType)
                row["_valid"] = ok
                rows.append(row)
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    result = df.select(*keep).mapInPandas(fn, schema=out_schema)
    result._llm_metrics = {"calls": calls_acc, "prompt_chars": chars_acc}  # type: ignore[attr-defined]
    return result


def llm_reduce(
    df: DataFrame,
    group_cols: list[str],
    prompt_template: str,
    output_schema: T.StructType,
    provider: LLMProvider | None = None,
    text_col: str = "chunk_text",
    order_col: str | None = "chunk_id",
    validators: tuple[str, ...] = (),
    max_retries: int = 2,
    max_context_chars: int | None = None,
) -> DataFrame:
    """Grouped LLM fold: one provider call per group over the concatenation
    of the group's `text_col` values (ordered by `order_col` for
    determinism). Output: group cols + declared schema + `_valid`.

    Hierarchical fold (SURVEY §2.4 A1): when `max_context_chars` is set and
    a group's concatenation exceeds it, the chunks are folded in
    context-sized windows first (partial synthesis), then the partial
    outputs are folded once more (final synthesis) — the map-side-combine
    shape for groups larger than the model context. Recursion depth is
    bounded because each level shrinks the text by the summarization."""
    provider = provider or StubProvider()
    shadowed = {f.name for f in output_schema.fields} | {"_valid"}
    group_cols = [c for c in group_cols if c not in shadowed]
    group_fields = [f for f in df.schema.fields if f.name in group_cols]
    out_schema = T.StructType(
        group_fields + list(output_schema.fields) + [T.StructField("_valid", T.BooleanType())]
    )
    out_fields = [f.name for f in output_schema.fields]
    calls_acc = df.sparkSession.sparkContext.accumulator(0)

    def fold_texts(texts: list[str], rec_base: dict[str, Any], depth: int = 0) -> tuple[dict[str, Any], bool]:
        joined = " ".join(texts)
        if max_context_chars and len(joined) > max_context_chars and len(texts) > 1 and depth < 8:
            # plan context-sized windows of chunks; only recurse when the
            # hierarchy actually makes progress (fewer nodes per level) —
            # degenerate budgets (smaller than a single chunk) fall through
            # to the truncating base case instead of recursing forever
            windows: list[list[str]] = []
            cur: list[str] = []
            size = 0
            for t in texts:
                if cur and size + len(t) + 1 > max_context_chars:
                    windows.append(cur)
                    cur, size = [], 0
                cur.append(t)
                size += len(t) + 1
            if cur:
                windows.append(cur)
            if len(windows) < len(texts):
                partials = []
                for w in windows:
                    out, _ = fold_texts(w, rec_base, depth + 1)
                    partials.append(" ".join(str(out.get(f, "")) for f in out_fields))
                return fold_texts(partials, rec_base, depth + 1)
        if max_context_chars and len(joined) > max_context_chars:
            joined = joined[:max_context_chars]  # last resort: context-limit truncation
        rec = dict(rec_base)
        rec["text"] = joined
        out, ok, calls = _run_one(provider, prompt_template, rec, out_fields, validators, max_retries)
        calls_acc.add(calls)
        return out, ok

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        if order_col and order_col in pdf.columns:
            pdf = pdf.sort_values(order_col)
        texts = [str(v) for v in pdf[text_col].tolist()]
        rec_base = {c: pdf[c].iloc[0] for c in group_cols}
        out, ok = fold_texts(texts, rec_base)
        row = {c: pdf[c].iloc[0] for c in group_cols}
        for f in output_schema.fields:
            row[f.name] = _coerce(out.get(f.name), f.dataType)
        row["_valid"] = ok
        return pd.DataFrame([row], columns=[f.name for f in out_schema.fields])

    result = df.groupBy(*group_cols).applyInPandas(fold, schema=out_schema)
    result._llm_metrics = {"calls": calls_acc}  # type: ignore[attr-defined]
    return result


from etl_poc_spark._serde import register_by_value as _rbv  # noqa: E402

_rbv(__name__)
