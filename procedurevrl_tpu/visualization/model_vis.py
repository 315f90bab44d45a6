"""Model visualization: weights, activations, Grad-CAM.

TPU-native re-design of the reference's hook-based machinery
(reference ``lib/visualization/utils.py:157-252`` GetWeightAndActivation,
``slowfast gradcam_utils.GradCAM`` as driven by
``tools/visualization.py:40-141``):

- **weights** come straight off the flax param tree (no hooks needed);
- **activations** use ``capture_intermediates`` — flax records every
  module's outputs functionally;
- **Grad-CAM** uses ``nn.intercept_methods`` to add a zero "probe" tensor
  to the target module's output; the gradient of the class score w.r.t.
  the probe IS dS/dA, with A captured in the same pass.  Channel weights
  are the spatial mean of dS/dA and the CAM is ReLU(sum_c w_c A_c)
  normalized to [0, 1], exactly the reference's math.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax.traverse_util import flatten_dict


def get_layer_weights(params, layer_list: Sequence[str]) -> Dict[str, np.ndarray]:
    """Fetch weights by '/'-joined path substring
    (reference ``lib/visualization/utils.py:235-252``)."""
    flat = flatten_dict(params, sep="/")
    out = {}
    for name, value in flat.items():
        if any(layer in name for layer in layer_list):
            out[name] = np.asarray(jax.device_get(value))
    return out


def get_activations(model, variables, x, layer_list: Sequence[str],
                    **apply_kwargs) -> Tuple[Dict[str, np.ndarray], np.ndarray]:
    """Forward pass capturing the named modules' outputs
    (reference ``lib/visualization/utils.py:210-233``).

    ``layer_list`` entries are matched as substrings of the flax module
    path ('encoder/blocks_11/attn', ...).  Returns (activations, preds).
    """
    def keep(module, method_name):
        name = "/".join(module.path)
        return method_name == "__call__" and any(
            layer in name for layer in layer_list
        )

    preds, state = model.apply(
        variables, x, capture_intermediates=keep, mutable=["intermediates"],
        **apply_kwargs,
    )
    acts = {}
    for name, value in flatten_dict(
        state["intermediates"], sep="/"
    ).items():
        v = value[0] if isinstance(value, tuple) else value
        if isinstance(v, tuple):  # modules returning (out, aux)
            v = v[0]
        acts[name.removesuffix("/__call__")] = np.asarray(jax.device_get(v))
    return acts, np.asarray(jax.device_get(preds))


class GradCAM:
    """Grad-CAM for flax video models (functional re-design of the
    reference's hook-based ``gradcam_utils.GradCAM``).

    Args:
        model: the flax module (apply with (variables, x, **kwargs)).
        target_layer: module path substring, e.g. 'encoder/blocks_11/norm1'.
        token_grid: (T, H, W) grid to reshape token activations into; for
            token streams with a leading CLS the extra token is dropped.
    """

    def __init__(self, model, target_layer: str,
                 token_grid: Optional[Tuple[int, int, int]] = None):
        self.model = model
        self.target_layer = target_layer
        self.token_grid = token_grid

    def _forward_with_probe(self, variables, x, probes: dict, **kwargs):
        """Apply the model with `out + probe` spliced into the target
        module's output; returns (preds, activation)."""
        captured = {}

        def interceptor(next_fn, args, kw, context):
            out = next_fn(*args, **kw)
            name = "/".join(context.module.path)
            if self.target_layer in name and context.method_name == "__call__":
                main = out[0] if isinstance(out, tuple) else out
                captured["act"] = main
                patched = main + probes["p"]
                if isinstance(out, tuple):
                    return (patched,) + out[1:]
                return patched
            return out

        with nn.intercept_methods(interceptor):
            preds = self.model.apply(variables, x, **kwargs)
        return preds, captured["act"]

    def __call__(self, variables, x, labels=None, **kwargs):
        """Returns (cam [B, T, H, W] in [0, 1], preds)."""
        # one plain pass for the activation shape + predictions
        preds, act = self._forward_with_probe(
            variables, x, {"p": jnp.zeros(())}, **kwargs)
        target = (
            jnp.asarray(labels)
            if labels is not None
            else jnp.argmax(preds, axis=-1)
        )

        def score(probe):
            p, _ = self._forward_with_probe(variables, x, {"p": probe},
                                            **kwargs)
            rows = jnp.take_along_axis(p, target[:, None], axis=-1)
            return jnp.sum(rows)

        grads = jax.grad(score)(jnp.zeros_like(act))  # dS/dA

        a = np.asarray(act, np.float32)
        g = np.asarray(grads, np.float32)
        if a.ndim == 3 and self.token_grid:  # token stream [B, N(+1), C]
            t, h, w = self.token_grid
            if a.shape[1] == t * h * w + 1:
                a, g = a[:, 1:], g[:, 1:]
            a = a.reshape(a.shape[0], t, h, w, a.shape[-1])
            g = g.reshape(g.shape[0], t, h, w, g.shape[-1])
        weights = g.mean(axis=tuple(range(1, g.ndim - 1)), keepdims=True)
        cam = np.maximum((weights * a).sum(axis=-1), 0.0)
        flat = cam.reshape(cam.shape[0], -1)
        lo = flat.min(axis=1).reshape((-1,) + (1,) * (cam.ndim - 1))
        hi = flat.max(axis=1).reshape((-1,) + (1,) * (cam.ndim - 1))
        cam = (cam - lo) / np.maximum(hi - lo, 1e-8)
        return cam, np.asarray(preds)
