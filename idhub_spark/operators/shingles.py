"""Word-shingle construction — shared by the batch dedup plans
(plans/dedup_q.py) and the incremental dedup index
(operators/dedup_index.py). Lives in operators so both layers can
import it without a plans<->operators cycle."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_shingles(corpus: DataFrame) -> DataFrame:
    """Distinct word-3-gram shingles per doc: (doc_id, sh).

    The naive transform(sequence, i -> element_at(split(text), i))
    is quadratic: CollapseProject inlines the split into every
    element_at, re-splitting the whole document per shingle element.
    The fix is a Generate barrier — explode(array(split(text))) emits
    the split array ONCE as a real attribute, so the downstream
    transform's ws[i] lookups are O(1) array reads, and the whole
    shingle build is projection-only (no exchange at all; the earlier
    window-based variant paid a per-doc shuffle+sort: measured
    2.4s -> 1.1s steady-state at sf0.1). distinct() is the only
    shuffle, and it's required by shingle semantics anyway.
    """
    ws = corpus.select("doc_id", F.explode(F.array(F.split("text", " "))).alias("ws"))
    return (
        ws.filter(F.size("ws") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(ws)-3), "
                    "i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))"
                )
            ).alias("sh"),
        )
        .distinct()
    )
