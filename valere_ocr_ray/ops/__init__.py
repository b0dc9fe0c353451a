"""Large-scale training-data operations (beyond the reference's own
operators): deduplication families (``dedup``), similarity search
(``similarity``), DSIR importance weights (``dsir``), boilerplate-line
removal (``linededup``), text analysis (``textstats``), sectioning + URL
projections (``urlmeta``), approximate distinct sketches (``sketch``), Misra-Gries heavy
hitters (``heavyhitters``), content-defined-chunking dedup (``cdc``),
deterministic domain-mixture sampling (``mixing``),
leakage-safe train/holdout splitting (``split``),
multimodal plumbing (``multimodal``), as-of/range joins (``asof``),
and the keyed-combine machinery for high-cardinality groupbys
(``exchange`` — custom hash exchange; ``combine`` — tree reduce;
``bucketed`` — durable key-bucketed layout: pay the shuffle once at
write, grouped reads are shuffle-free forever after).

All are Dataset→Dataset transforms built on ``map_batches`` plus the
custom exchange — no driver-side row loops.
"""

from valere_ocr_ray.ops import (  # noqa: F401
    asof,
    bloom,
    bucketed,
    cdc,
    combine,
    decontam,
    dedup,
    dsir,
    exchange,
    heavyhitters,
    incremental,
    invindex,
    joins,
    linear,
    linededup,
    mixing,
    multimodal,
    packing,
    ranged,
    segdedup,
    similarity,
    sketch,
    split,
    textstats,
    urlmeta,
)

__all__ = [
    "asof",
    "bloom",
    "bucketed",
    "cdc",
    "combine",
    "decontam",
    "dedup",
    "dsir",
    "exchange",
    "heavyhitters",
    "incremental",
    "invindex",
    "joins",
    "linear",
    "linededup",
    "mixing",
    "multimodal",
    "packing",
    "ranged",
    "segdedup",
    "similarity",
    "sketch",
    "split",
    "textstats",
    "urlmeta",
]
