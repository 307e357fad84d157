"""Character-set Jaccard similarity with commons-text semantics.

The reference resolves LLM-emitted occurrence lines to sentence numbers
with ``org.apache.commons.text.similarity.JaccardSimilarity`` over the
*unique characters* of the two lowercased strings, threshold 0.90,
first-max tie-break (reference: model/SoftwareArchitectureDocumentation.java:145-168).

commons-text semantics (public Apache source, text/similarity/JaccardSimilarity.java):
  - both empty  -> 1.0
  - one empty   -> 0.0
  - else        -> |chars(a) & chars(b)| / |chars(a) | chars(b)|
"""

from __future__ import annotations

import numpy as np
import pandas as pd

JACCARD_THRESHOLD = 0.90


def char_jaccard(a: str, b: str) -> float:
    """Jaccard over unique-character sets (commons-text compatible)."""
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    sa, sb = set(a), set(b)
    return len(sa & sb) / len(sa | sb)


def char_jaccard_series(a: pd.Series, b: pd.Series) -> pd.Series:
    """Vectorized (Arrow-batch) char-set Jaccard of two string Series.

    Used inside pandas UDFs: the batch arrives as one Arrow record batch,
    python-level set ops run per element but over the whole batch at once
    (no per-row Spark<->Python round trips).
    """
    sets_a = a.fillna("").map(set)
    sets_b = b.fillna("").map(set)
    inter = np.fromiter(
        (len(x & y) for x, y in zip(sets_a, sets_b)), dtype=np.float64, count=len(a)
    )
    union = np.fromiter(
        (len(x | y) for x, y in zip(sets_a, sets_b)), dtype=np.float64, count=len(a)
    )
    out = np.where(union > 0, inter / np.where(union == 0, 1, union), 1.0)
    return pd.Series(out, index=a.index)


def best_line_number(lines: list[str], text_line: str, threshold: float = JACCARD_THRESHOLD) -> int:
    """Reference ``SoftwareArchitectureDocumentation.getLineNumber``:

    argmax over char-Jaccard of lowercased strings; strict ``>`` running
    max means the FIRST maximal line wins; returns -1 when the best score
    is below ``threshold``. 1-indexed.
    """
    tl = text_line.lower()
    best_score = 0.0
    best_no = -1
    for i, line in enumerate(lines, 1):
        score = char_jaccard(line.lower(), tl)
        if score > best_score:
            best_score = score
            best_no = i
    return best_no if best_score >= threshold else -1
