"""LLM provider interface + deterministic stub.

The reference's LLM ops (SURVEY.md §2.9 L2-L6) call a hosted model through
DocETL. For a reproducible, oracle-checkable engine the default provider is a
DETERMINISTIC STUB: a pure function of (prompt, input record) implementing
extractive heuristics (first-k-words etc.). Real API providers plug in behind
the same interface but are import-gated — this environment has no network and
no client libraries, and tests never depend on them.

The stub's string operations are intentionally chosen to be expressible in
SQL (whitespace tokenization == split on \\s+ after trim; char slicing ==
substr) so whole stub-LLM pipelines remain DuckDB-oracle-checkable.
"""

from __future__ import annotations

import json
from typing import Any, Protocol


class LLMProvider(Protocol):
    name: str

    def complete(self, prompt: str, record: dict[str, Any], output_fields: list[str]) -> dict[str, Any]:
        """Return a dict with the requested output fields."""


def _words(s: str) -> list[str]:
    return (s or "").split()


class StubProvider:
    """Extractive deterministic provider.

    Field-name conventions (mirroring the reference's declared schemas,
    FIXTURES.md §B3/B4): known fields get extractive derivations from the
    record's `text` (or longest string field); unknown string fields get the
    first 5 words; integers get the token count; numbers get an exact
    rational in [0, 1]."""

    name = "stub"

    def complete(self, prompt: str, record: dict[str, Any], output_fields: list[str]) -> dict[str, Any]:
        text = record.get("text") or record.get("chunk_text") or record.get("full_text") or ""
        if not text:
            str_vals = [v for v in record.values() if isinstance(v, str)]
            text = max(str_vals, key=len) if str_vals else ""
        w = _words(text)
        out: dict[str, Any] = {}
        for f in output_fields:
            if f == "title":
                out[f] = " ".join(w[:6])
            elif f == "abstract_summary":
                out[f] = " ".join(w[:30])
            elif f == "key_findings":
                out[f] = " ".join(w[30:50])
            elif f in ("research_question", "methodology", "significance", "limitations", "section_type"):
                out[f] = " ".join(w[:8])
            elif f == "headline":
                out[f] = " ".join(w[:6])[:60]
            elif f == "subtitle":
                out[f] = ("Insights: " + " ".join(w[:4]))[:80]
            elif f == "article_body":
                out[f] = " ".join(w[:30] * 25)
            elif f == "meta_description":
                out[f] = " ".join(w[:30])[:150]
            elif f in ("pull_quotes", "key_takeaways", "topic_tags", "authors"):
                out[f] = w[:3]
            elif f == "word_count":
                out[f] = len(_words(out.get("article_body", text)))
            elif f == "confidence_score":
                out[f] = (len(w) % 10) / 10.0
            else:
                out[f] = " ".join(w[:5])
        return out


class JsonEchoProvider:
    """Test provider: expects the prompt to end with a JSON payload and
    echoes it back — used to exercise validation-retry paths."""

    name = "json_echo"

    def __init__(self, responses: list[dict[str, Any]] | None = None):
        self._responses = list(responses or [])
        self.calls = 0

    def complete(self, prompt: str, record: dict[str, Any], output_fields: list[str]) -> dict[str, Any]:
        self.calls += 1
        if self._responses:
            return self._responses.pop(0)
        return json.loads(prompt[prompt.index("{") :])


def get_provider(name: str = "stub", **kwargs: Any):
    if name == "stub":
        return StubProvider()
    if name == "json_echo":
        return JsonEchoProvider(**kwargs)
    if name in ("openai", "anthropic"):
        # real clients are intentionally not bundled; fail loudly and early
        raise NotImplementedError(
            f"provider {name!r} requires the corresponding client library and "
            "network access; configure it in a deployment environment and "
            "pass the instance directly to llm_map/llm_reduce"
        )
    raise ValueError(f"unknown provider {name!r}")


from etl_poc_spark._serde import register_by_value as _rbv  # noqa: E402

_rbv(__name__)
