"""kuery-lite query-string parser for the discover search box.

The reference's discover panel (internal/setup/assets/kibana.ndjson:8)
feeds a Kibana kuery string to ES. The subset picdexer users actually type
over an analyzed text field is flat: bare words (OR semantics, kuery's
default for analyzed matches) or `AND`-joined words (conjunction). This
parser covers exactly that subset and refuses anything it cannot represent
faithfully (mixed AND/OR, parentheses, field qualifiers) rather than
guessing.

Every word goes through the SAME analyzer as indexed text
(functions/tokenize.py), so `Batch,` matches the indexed term `batch` —
query-side and index-side analysis agree, the Lucene contract.
"""

from __future__ import annotations

from picdexer_spark.functions.tokenize import tokenize_py

_OPS = ("AND", "OR")


def parse_query_string(q: str) -> tuple[list[str], str]:
    """'a b' -> ([a, b], disjunctive); 'a AND b' -> ([a, b], conjunctive).

    Returns (analyzed terms, mode). Raises ValueError on constructs outside
    the supported subset (mixed operators, parentheses, field:value).
    """
    if q is None or not q.strip():
        return [], "disjunctive"
    if any(ch in q for ch in "():"):
        raise ValueError(
            "unsupported query-string construct (parentheses/field qualifier)"
        )
    stripped = q.strip()
    if '"' in stripped:
        # kuery quoted phrase: the WHOLE query must be one quoted phrase
        # (mixing phrases with bare terms is outside the supported subset —
        # refuse rather than silently degrade a phrase to OR terms)
        if (stripped.startswith('"') and stripped.endswith('"')
                and '"' not in stripped[1:-1] and len(stripped) >= 2):
            return tokenize_py(stripped[1:-1]), "phrase"
        raise ValueError("quotes are only supported as one whole-query phrase")
    raw = q.split()
    ops = {w.upper() for w in raw if w.upper() in _OPS}
    if ops == {"AND"}:
        mode = "conjunctive"
    elif ops <= {"OR"}:
        mode = "disjunctive"
    else:
        raise ValueError("mixed AND/OR is not supported by kuery-lite")
    words = [w for w in raw if w.upper() not in _OPS]
    terms = [t for w in words for t in tokenize_py(w)]
    return terms, mode
