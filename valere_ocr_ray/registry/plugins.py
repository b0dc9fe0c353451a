"""Runtime doc-type plugin API (SURVEY.md §2.11).

The reference's extension mechanism is copy-the-template-and-edit
(``IDD/queryCodes/queryCodeTemplate.py:56-75`` — "Delete and change
queries as needed"); the engine formalizes it: a doc type registers

* **url rules** (C1 analog): substring → this type;
* **keywords + threshold** (C2 analog): content-score fallback;
* **query set** (T3 analog): ordered ``(question, aliases)`` answered
  from the document's KV lines, A1 confidence fold — or a custom
  ``extractor(text) -> (payload, confidence, spans)`` for non-KV
  semantics.

Registered types participate in ``classify``/``extract_document``
dispatch ahead of the built-ins.  Registration is per-process module
state: workers register inside the ``map_batches`` callable (module
import or actor ``__init__``), exactly like the built-in registry —
nothing is shipped implicitly across processes.
"""

from __future__ import annotations

import json
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from valere_ocr_ray.registry.querysets import QuerySpec, derive_field_name

ExtractorFn = Callable[[str], tuple[dict[str, Any], float, list]]


@dataclass(frozen=True)
class DocTypePlugin:
    name: str
    url_tokens: tuple[str, ...] = ()
    keywords: tuple[str, ...] = ()
    keyword_threshold: int = 3
    query_set: tuple[QuerySpec, ...] = ()
    extractor: ExtractorFn | None = field(default=None, compare=False)


_PLUGINS: dict[str, DocTypePlugin] = {}


def register_doc_type(plugin: DocTypePlugin) -> None:
    """Register (or replace) a doc type; effective immediately in this
    process for ``classify_plugin`` / ``extract_plugin`` dispatch."""
    if not plugin.name or plugin.name != plugin.name.upper():
        raise ValueError("plugin name must be non-empty UPPER_SNAKE")
    if plugin.query_set and plugin.extractor:
        raise ValueError("give query_set OR extractor, not both")
    _PLUGINS[plugin.name] = plugin


def unregister_doc_type(name: str) -> None:
    _PLUGINS.pop(name, None)


def registered() -> dict[str, DocTypePlugin]:
    return dict(_PLUGINS)


def classify_plugin(url: str, text: str) -> str | None:
    """Plugin classification: url rules first (C1 order = registration
    order), then keyword scoring at each plugin's threshold (C2 shape);
    ``None`` → fall through to the built-in classifier."""
    low_url = url.lower()
    for p in _PLUGINS.values():
        if any(tok in low_url for tok in p.url_tokens):
            return p.name
    low = None
    for p in _PLUGINS.values():
        if not p.keywords:
            continue
        if low is None:
            low = text.lower()
        score = sum(1 for kw in p.keywords if kw in low)
        if score >= p.keyword_threshold:
            return p.name
    return None


def extract_plugin(doc_type: str, text: str) -> dict[str, Any] | None:
    """Extraction for a registered type; ``None`` if not registered.

    Query-set plugins reuse the reference's E1 shape: derived field
    names, KV-line lookup, A1 confidence, 4-space-indent JSON bytes.
    """
    p = _PLUGINS.get(doc_type)
    if p is None:
        return None
    if p.extractor is not None:
        payload, confidence, spans = p.extractor(text)
    else:
        from valere_ocr_ray.registry.extractors import (
            _fold_kvs,
            _kv_lookup,
            parse_kv_lines,
        )

        by_fold = _fold_kvs(parse_kv_lines(text))
        document_data: dict[str, str] = {}
        spans = []
        empty = 0
        for question, aliases in p.query_set:
            fname = derive_field_name(question)
            value, start, end = _kv_lookup(by_fold, fname, *aliases)
            document_data[fname] = value
            if value == "":
                empty += 1
            else:
                spans.append((fname, value, start, end))
        n = len(document_data)
        confidence = (n - empty) / n if n else 0.0
        payload = {
            "confidence": {"confidence_score": confidence},
            "document_data": document_data,
        }
    return {
        "doc_type": doc_type,
        "fields_json": json.dumps(payload, indent=4),
        "confidence": float(confidence),
        "spans": [
            {"field": f, "value": v, "start": s, "end": e} for f, v, s, e in spans
        ],
    }
