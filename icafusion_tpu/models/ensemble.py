"""Multi-checkpoint NMS-ensemble inference.

Behavioral counterpart of reference models/experimental.py:98-134 (Ensemble /
attempt_load with a weights list): each model's decoded predictions are
concatenated along the candidate axis and NMS runs over the union."""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp


def ensemble_predict(members: Sequence[Tuple["ICAFusionModel", dict]],  # noqa: F821
                     rgb, ir):
    """-> (pred (B, sum_N, no), logits (B, sum_N, nc)) over all members."""
    preds, logits = [], []
    for model, variables in members:
        p, l, _ = model.apply(variables, rgb, ir, train=False, decode=True)
        preds.append(p)
        logits.append(l)
    return jnp.concatenate(preds, axis=1), jnp.concatenate(logits, axis=1)


def load_ensemble(cfg_specs: List[str], weights_list: List[str], nc=None):
    """attempt_load for a weights list (experimental.py:113-134)."""
    from icafusion_tpu.cli._common import load_model_for_inference
    members = []
    for cfg, w in zip(cfg_specs, weights_list):
        _, model, variables = load_model_for_inference(cfg, w, nc=nc)
        members.append((model, variables))
    return members
