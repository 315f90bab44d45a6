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
                 token_grid: Optional[Tuple[int, int, int]] = None,
                 num_frames: Optional[int] = None):
        self.model = model
        self.target_layer = target_layer
        self.token_grid = token_grid
        # with token_grid=None the (T, H, W) grid is inferred from the
        # captured activation's token count and num_frames — works for any
        # patch size / pooled token stream with a square spatial grid
        self.num_frames = num_frames

    def _forward_with_probe(self, variables, x, probes: dict, **kwargs):
        """Apply the model with `out + probe` spliced into the target
        module's output; returns (preds, activation)."""
        captured = {}

        matched = set()

        def interceptor(next_fn, args, kw, context):
            out = next_fn(*args, **kw)
            name = "/".join(context.module.path)
            # suffix match one module: substring matching would probe every
            # block's layer of that name and sum gradients across layers
            # while keeping only the last activation
            if (
                context.method_name == "__call__"
                and (name == self.target_layer
                     or name.endswith("/" + self.target_layer))
            ):
                matched.add(name)
                if len(matched) > 1:
                    raise ValueError(
                        f"GradCAM target {self.target_layer!r} matches "
                        f"multiple modules: {sorted(matched)}; qualify the "
                        "path (e.g. 'blocks_11/norm1')"
                    )
                main = out[0] if isinstance(out, tuple) else out
                # a module may run more than once per step with different
                # shapes (the divided block norms the cls stream [B, 1, D]
                # and the frame stream [B*T, N, D] separately): keep the
                # LARGEST output as the cam activation and attach the
                # probe only to shape-matching calls (the scalar zero
                # probe of the capture pass attaches everywhere)
                prev = captured.get("act")
                if prev is None or main.size > prev.size:
                    captured["act"] = main
                p = probes["p"]
                if p.ndim != 0 and p.shape != main.shape:
                    return out
                patched = main + p
                if isinstance(out, tuple):
                    return (patched,) + out[1:]
                return patched
            return out

        with nn.intercept_methods(interceptor):
            preds = self.model.apply(variables, x, **kwargs)
        if "act" not in captured:
            raise ValueError(
                f"GradCAM target {self.target_layer!r} matched no module"
            )
        return preds, captured["act"]

    def _infer_grid(self, n_tokens: int):
        """(T, H, W) from the token count: try with/without a CLS token and
        T in (num_frames, num_frames//2, ...); square spatial grid."""
        import math

        cands = []
        if self.num_frames:
            t0 = self.num_frames
            while t0 >= 1:
                cands.append(t0)
                if t0 == 1:
                    break
                t0 //= 2
        else:
            cands = [1]
        for cls in (1, 0):
            rem = n_tokens - cls
            for t in cands:
                if rem % t:
                    continue
                side = math.isqrt(rem // t)
                if side * side == rem // t:
                    return (t, side, side)
        return None

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
        B = np.asarray(preds).shape[0]
        if a.ndim == 3 and a.shape[0] != B and a.shape[0] % B == 0:
            # spatial-residence stream [B*T, N, C] -> time-major [B, T*N, C]
            a = a.reshape(B, -1, a.shape[-1])
            g = g.reshape(B, -1, g.shape[-1])
        if a.ndim == 3:  # token stream [B, N(+1), C]
            grid = self.token_grid or self._infer_grid(a.shape[1])
            if grid is None:
                raise ValueError(
                    f"GradCAM: cannot infer a (T, H, W) grid for "
                    f"{a.shape[1]} tokens (num_frames={self.num_frames}); "
                    "pass token_grid= explicitly"
                )
            t, h, w = grid
            if a.shape[1] == t * h * w + 1:
                a, g = a[:, 1:], g[:, 1:]
            if a.shape[1] != t * h * w:
                raise ValueError(
                    f"GradCAM: grid {grid} does not match {a.shape[1]} tokens"
                )
            a = a.reshape(a.shape[0], t, h, w, a.shape[-1])
            g = g.reshape(g.shape[0], t, h, w, g.shape[-1])
        weights = g.mean(axis=tuple(range(1, g.ndim - 1)), keepdims=True)
        cam = np.maximum((weights * a).sum(axis=-1), 0.0)
        flat = cam.reshape(cam.shape[0], -1)
        lo = flat.min(axis=1).reshape((-1,) + (1,) * (cam.ndim - 1))
        hi = flat.max(axis=1).reshape((-1,) + (1,) * (cam.ndim - 1))
        cam = (cam - lo) / np.maximum(hi - lo, 1e-8)
        return cam, np.asarray(preds)
