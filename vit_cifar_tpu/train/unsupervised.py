"""The AE-internal optimizer loop (unsupervised updates).

Reference: each AEAttention owns a private ``AE_optimizer`` (Adam lr=1e-3, or
Madam for the NNMF-heads variant) created at construction (layers.py:844,
963-975); ``--unsupervised-steps N`` runs N optimizer steps per training batch
on ``MSE(AE(AE_input), AE_input)`` with the stored forward input
(network.py:172-178, vit.py:473-486, layers.py:893-907).

Under jit this becomes: a second optax state in the TrainState
(``ae_opt_state``), the stored inputs arrive via the ``intermediates``
collection, and the AE submodule is re-applied with params extracted from the
main tree (disjoint per-layer Adam == one Adam over the union with summed
loss, since the param groups are disjoint).

Parity details preserved:
  * the heads variant SKIPS the update when the loss is nan/inf
    (layers.py:1071-1072) — implemented with jnp.where on the updates
  * the NNMF-heads variant applies Madam + the pre/after weight care inside
    the inner loop (layers.py:1077-1085); pre-care is folded into the NNMF
    custom VJP, after-care runs on the AE subtree with threshold 1e-3
  * gradients flow ONLY to AE params (the input is already detached)
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax

from ..config import Config


def uses_unsupervised(cfg: Config) -> bool:
    # only AEViT can learn unsupervised (utils.py:279; ae_baseline never sets it)
    return cfg.model_name == "ae" and cfg.unsupervised_steps > 0


def _is_heads(cfg: Config) -> bool:
    return cfg.ae_type == "heads" and not cfg.legacy_heads


def build_ae_module(cfg: Config):
    from ..models import nnmf_params_from_cfg
    from ..ops.ae_attention import build_ae

    return build_ae(
        ae_type=cfg.ae_type,
        seq_len=cfg.seq_len,
        ffn_features=cfg.ffn_features,
        heads=cfg.head,
        chunk=cfg.chunk,
        legacy_heads=cfg.legacy_heads,
        ae_hidden_features=cfg.ae_hidden_features,
        ae_hidden_seq_len=cfg.ae_hidden_seq_len,
        order_2d=cfg.order_2d,
        nnmf=cfg.use_nnmf_layers,
        nnmf_params=nnmf_params_from_cfg(cfg),
        dtype=jnp.float32,
        name="AE",
    )


def make_ae_tx(cfg: Config) -> optax.GradientTransformation:
    if _is_heads(cfg) and cfg.use_nnmf_layers:
        from ..ops.nnmf.optimizer import scale_by_madam

        return scale_by_madam(learning_rate=lambda _: 1e-3)
    return optax.adam(1e-3)


def ae_subtree(params, num_layers: int) -> dict[str, Any]:
    return {f"enc{i}": params[f"enc{i}"]["mixer"]["AE"] for i in range(num_layers)}


def write_ae_subtree(params, ae_params, num_layers: int):
    params = dict(params)
    for i in range(num_layers):
        enc = dict(params[f"enc{i}"])
        mixer = dict(enc["mixer"])
        mixer["AE"] = ae_params[f"enc{i}"]
        enc["mixer"] = mixer
        params[f"enc{i}"] = enc
    return params


def collect_ae_inputs(intermediates, num_layers: int) -> dict[str, Any]:
    out = {}
    for i in range(num_layers):
        node = intermediates[f"enc{i}"]["mixer"]["ae_input"]
        out[f"enc{i}"] = node[0] if isinstance(node, (tuple, list)) else node
    return out


def make_unsupervised_update(cfg: Config):
    """Returns (init_ae_opt_state, run_updates).

    ``run_updates(params, ae_opt_state, intermediates)
        -> (params, ae_opt_state, total_loss)``
    """
    ae_module = build_ae_module(cfg)
    ae_tx = make_ae_tx(cfg)
    heads = _is_heads(cfg)
    heads_nnmf = heads and cfg.use_nnmf_layers
    L = cfg.num_layers

    def init_ae_opt_state(params):
        return ae_tx.init(ae_subtree(params, L))

    def _ae_forward(layer_params, ae_input):
        out = ae_module.apply({"params": layer_params}, ae_input,
                              deterministic=True)
        return out[0] if isinstance(out, tuple) else out

    def run_updates(params, ae_opt_state, intermediates):
        ae_params = ae_subtree(params, L)
        ae_inputs = collect_ae_inputs(intermediates, L)
        ae_inputs = jax.tree_util.tree_map(
            lambda a: jax.lax.stop_gradient(a.astype(jnp.float32)), ae_inputs
        )

        total_loss = jnp.zeros((), jnp.float32)
        for _ in range(cfg.unsupervised_steps):

            def loss_fn(ps):
                loss = jnp.zeros((), jnp.float32)
                for k, inp in ae_inputs.items():
                    preds = _ae_forward(ps[k], inp)
                    loss = loss + jnp.mean((preds - inp) ** 2)
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(ae_params)
            updates, new_opt_state = ae_tx.update(grads, ae_opt_state, ae_params)
            new_params = optax.apply_updates(ae_params, updates)
            if heads_nnmf:
                from ..ops.nnmf.layers import nnmf_after_care

                new_params = nnmf_after_care(new_params, 1e-3)
            if heads:
                # nan/inf loss -> skip the update (layers.py:1071-1072)
                ok = jnp.isfinite(loss)
                new_params = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(ok, new, old), new_params, ae_params
                )
                new_opt_state = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(ok, new, old)
                    if hasattr(new, "shape") else new,
                    new_opt_state, ae_opt_state,
                )
                loss = jnp.where(ok, loss, 0.0)
            ae_params, ae_opt_state = new_params, new_opt_state
            total_loss = total_loss + loss

        params = write_ae_subtree(params, ae_params, L)
        return params, ae_opt_state, total_loss

    return init_ae_opt_state, run_updates
