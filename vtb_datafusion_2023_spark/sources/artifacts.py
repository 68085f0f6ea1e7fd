"""S5: sidecar artifact loading (SURVEY §2.1).

The reference loads a pickle of per-feature bin edges
(/root/reference/model.py:223-224: ``nn_bins.pickle`` with a ``features``
key listing feature names and per-feature edge arrays), torch checkpoints,
and a CatBoost ``.cbm``.  Engine pattern: load once driver-side, compile
small artifacts (bin edges, vocabularies) directly into projections, and
broadcast model weights into ``mapInPandas`` closures (inference.udfs).
"""

from __future__ import annotations

import pickle
from pathlib import Path


def load_bin_edges(path: str | Path) -> dict[str, list[float]]:
    """Load a bin-edges pickle in the reference's nn_bins format.

    Accepts either the reference layout ``{"features": [names...],
    <name>: edges, ...}`` or a plain ``{name: edges}`` dict.  Returns
    {feature: [edge0, edge1, ...]} ready for
    ``operators.projections.bin_by_edges`` / ``plans.rnn_input_sequences``.
    """
    with open(path, "rb") as f:
        raw = pickle.load(f)
    if isinstance(raw, dict) and "features" in raw:
        names = list(raw["features"])
        out = {}
        for name in names:
            edges = raw.get(name)
            if edges is None:
                continue
            out[name] = [float(e) for e in list(edges)]
        return out
    if isinstance(raw, dict):
        return {k: [float(e) for e in list(v)] for k, v in raw.items()}
    raise ValueError(f"unrecognized bin-edges artifact shape: {type(raw)}")
