from . import (  # noqa: F401
    annotate,
    asof,
    dedup,
    discovery,
    flatten,
    frame_stats,
    frames,
    sessionize,
    similarity,
    textstats,
)
