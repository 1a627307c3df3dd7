"""Token-regenerator study: can an autoencoder reconstruct masked tokens?

Reference: test_regenerator.py — a wandb experiment training a patch-token
autoencoder ("regenerator") to reconstruct images, then measuring how well it
regenerates each token from a one-token-masked sequence (cosine and MSE score
matrices, with and without the self-reconstruction diagonal).  The reference
script is broken as shipped (imports ``autotoencoders`` — a typo —
test_regenerator.py:15, and references undefined ``nnmf_layers``/``AutoNNMF``,
:150,385); this is a working equivalent with matplotlib/CSV output instead of
wandb.

    python -m vit_cifar_tpu.analysis.regenerator --epochs 2 --out regen_report/
"""

from __future__ import annotations

import argparse
import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.augment import normalize
from ..data.datasets import load_dataset
from ..ops.autoencoders import Autoencoder, Autoencoder2D, AutoencoderT
from ..ops.init import TorchLinear, normal
from ..ops.patchify import from_words, to_words


class RegeneratorNet(nn.Module):
    """test_regenerator.py:19-122: patchify -> embed -> cls+pos -> regenerator
    AE -> un-embed -> fold back to an image."""

    regenerator: str = "simple"  # simple | transpose | 2d
    in_c: int = 3
    img_size: int = 32
    patch: int = 8
    hidden: int = 384
    ae_hidden: int = 128
    is_cls_token: bool = True

    def setup(self):
        f = (self.img_size // self.patch) ** 2 * self.in_c
        T = self.patch**2 + (1 if self.is_cls_token else 0)
        self.emb = TorchLinear(self.hidden, name="emb")
        if self.is_cls_token:
            self.cls_token = self.param("cls_token", normal(1.0), (1, 1, self.hidden))
        self.pos_emb = self.param("pos_emb", normal(1.0), (1, T, self.hidden))
        if self.regenerator == "simple":
            self.regen = Autoencoder(self.hidden, self.ae_hidden, name="regenerator")
        elif self.regenerator == "transpose":
            self.regen = AutoencoderT(T, 8, name="regenerator")
        elif self.regenerator == "2d":
            self.regen = Autoencoder2D(
                order="sfsf", seq=T, features=self.hidden, seq_hidden=8,
                features_hidden=self.ae_hidden, name="regenerator",
            )
        else:
            raise NotImplementedError(self.regenerator)
        self.emb_transpose_norm = nn.LayerNorm(epsilon=1e-5, name="unembed_norm")
        self.emb_transpose_fc = TorchLinear(f, name="unembed_fc")

    def tokens(self, x):
        out = self.emb(to_words(x, self.patch))
        if self.is_cls_token:
            cls = jnp.broadcast_to(self.cls_token, (out.shape[0], 1, self.hidden))
            out = jnp.concatenate([cls, out], axis=1)
        return out + self.pos_emb

    def __call__(self, x, *, mask: bool = False):
        tok = self.tokens(x)
        regen_input = jax.lax.stop_gradient(tok)
        if mask:
            # eye-masked (B,T,T,H): row i keeps only token i
            T = tok.shape[1]
            rep = jnp.broadcast_to(tok[:, None], (tok.shape[0], T, T, tok.shape[-1]))
            out = jnp.eye(T)[None, :, :, None] * rep
            out = self.regen(out)[0]
            return regen_input, jax.lax.stop_gradient(out)
        out = self.regen(tok)[0]
        regen_output = jax.lax.stop_gradient(out)
        if self.is_cls_token:
            out = out[:, 1:, :]
        out = self.emb_transpose_fc(self.emb_transpose_norm(out))
        img = from_words(out, self.patch, self.img_size, self.in_c)
        return img, regen_input, regen_output

    def regenerate(self, regen_input):
        """One regenerator forward for its private optimizer."""
        return self.regen(regen_input)[0]


def score_matrices(regen_input, masked_output):
    """Cosine and MSE score matrices (test_regenerator.py:229-273)."""
    num = jnp.einsum("bjh,bijh->bij", regen_input, masked_output)
    den = (
        jnp.linalg.norm(regen_input, axis=-1)[:, None, :]
        * jnp.linalg.norm(masked_output, axis=-1)
        + 1e-8
    )
    cos = num / den
    mse = jnp.mean(
        (masked_output - regen_input[:, None, :, :]) ** 2, axis=-1
    )
    return cos, mse


def run_study(
    dataset: str = "c10",
    regenerator: str = "simple",
    epochs: int = 1,
    batch_size: int = 128,
    regenerator_iterations: int = 1,
    lr: float = 1e-3,
    hidden: int = 384,
    patch: int = 8,
    out_dir: str = "regen_report",
    log_interval: int = 100,
    synthetic: bool = False,
    seed: int = 0,
    verbose: bool = True,
):
    os.makedirs(out_dir, exist_ok=True)
    raw = load_dataset(dataset, synthetic=synthetic)
    # reference uses Normalize((0.5,), (0.5,))
    mean = std = (0.5, 0.5, 0.5)
    model = RegeneratorNet(regenerator=regenerator, hidden=hidden, patch=patch)
    x0 = normalize(jnp.asarray(raw.x_train[:2]), mean, std)
    variables = model.init(jax.random.PRNGKey(seed), x0)
    params = variables["params"]

    tx = optax.adam(lr)
    opt_state = tx.init(params)
    regen_tx = optax.adam(lr)
    regen_opt_state = regen_tx.init(params["regenerator"])

    @jax.jit
    def train_step(params, opt_state, regen_opt_state, img):
        def loss_fn(p):
            out, regen_in, _ = model.apply({"params": p}, img)
            return jnp.mean((out - img) ** 2), regen_in

        (loss, regen_in), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

        regen_loss = jnp.zeros(())
        for _ in range(regenerator_iterations):
            def r_loss(rp):
                full = {**params, "regenerator": rp}
                pred = model.apply({"params": full}, regen_in, method=RegeneratorNet.regenerate)
                return jnp.mean((pred - regen_in) ** 2)

            rl, rg = jax.value_and_grad(r_loss)(params["regenerator"])
            rupd, regen_opt_state = regen_tx.update(
                rg, regen_opt_state, params["regenerator"]
            )
            params = {
                **params,
                "regenerator": optax.apply_updates(params["regenerator"], rupd),
            }
            regen_loss = regen_loss + rl
        return params, opt_state, regen_opt_state, loss, regen_loss

    @jax.jit
    def masked_scores(params, img):
        regen_in, masked_out = model.apply({"params": params}, img, mask=True)
        return score_matrices(regen_in, masked_out)

    n = len(raw.x_train)
    steps_per_epoch = n // batch_size
    rng = np.random.default_rng(seed)
    history = []
    for epoch in range(epochs):
        order = rng.permutation(n)
        for i in range(steps_per_epoch):
            idx = order[i * batch_size : (i + 1) * batch_size]
            img = normalize(jnp.asarray(raw.x_train[idx]), mean, std)
            params, opt_state, regen_opt_state, loss, regen_loss = train_step(
                params, opt_state, regen_opt_state, img
            )
            step = epoch * steps_per_epoch + i
            if i % log_interval == log_interval - 1:
                cos, mse = masked_scores(params, img[:32])
                cosm = np.asarray(cos.mean(0))
                msem = np.asarray(mse.mean(0))
                nsr = cosm.copy()
                np.fill_diagonal(nsr, 0.0)
                row = dict(
                    step=step,
                    loss=float(loss),
                    regenerator_loss=float(regen_loss),
                    score=float(cosm.mean()),
                    score_nsr=float(nsr.mean()),
                    mse=float(msem.mean()),
                )
                history.append(row)
                if verbose:
                    print(row)
                _plot_scores(cosm, nsr, msem, os.path.join(out_dir, f"scores_{step}.png"))

    # final reconstruction grid (test_regenerator.py's Network_reconstruct image)
    test_img = normalize(jnp.asarray(raw.x_test[:10]), mean, std)
    recon = model.apply({"params": params}, test_img)[0]
    _plot_recon(np.asarray(test_img), np.asarray(recon),
                os.path.join(out_dir, "reconstruction.png"))

    import csv

    with open(os.path.join(out_dir, "metrics.csv"), "w", newline="") as f:
        if history:
            w = csv.DictWriter(f, fieldnames=list(history[0]))
            w.writeheader()
            w.writerows(history)
    return history


def _plot_scores(cos, nsr, mse, path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(13, 4))
    for ax, data, title in [
        (axes[0], cos, "regenerator_score"),
        (axes[1], nsr, "regenerator_score (NSR)"),
        (axes[2], mse, "MSE"),
    ]:
        im = ax.imshow(data, cmap="viridis")
        ax.set_title(title)
        fig.colorbar(im, ax=ax)
    fig.tight_layout()
    fig.savefig(path, dpi=100)
    plt.close(fig)


def _plot_recon(orig, recon, path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(orig)
    fig, axes = plt.subplots(2, n, figsize=(1.4 * n, 3))
    for i in range(n):
        axes[0][i].imshow(np.clip(orig[i] * 0.5 + 0.5, 0, 1))
        axes[1][i].imshow(np.clip(recon[i] * 0.5 + 0.5, 0, 1))
        for ax in (axes[0][i], axes[1][i]):
            ax.set_xticks([])
            ax.set_yticks([])
    axes[0][0].set_ylabel("input")
    axes[1][0].set_ylabel("reconstruction")
    fig.tight_layout()
    fig.savefig(path, dpi=100)
    plt.close(fig)


def main(argv=None):
    p = argparse.ArgumentParser(description="Token-regenerator study")
    p.add_argument("--dataset", default="c10", choices=["c10", "c100", "svhn"])
    p.add_argument("--regenerator", default="simple", choices=["simple", "transpose", "2d"])
    p.add_argument("--epochs", default=1, type=int)
    p.add_argument("--batch-size", default=128, type=int)
    p.add_argument("--regenerator-iterations", default=1, type=int)
    p.add_argument("--lr", default=1e-3, type=float)
    p.add_argument("--hidden", default=384, type=int)
    p.add_argument("--patch", default=8, type=int)
    p.add_argument("--log-interval", default=100, type=int)
    p.add_argument("--out", default="regen_report")
    p.add_argument("--synthetic-data", action="store_true")
    a = p.parse_args(argv)
    run_study(
        dataset=a.dataset, regenerator=a.regenerator, epochs=a.epochs,
        batch_size=a.batch_size, regenerator_iterations=a.regenerator_iterations,
        lr=a.lr, hidden=a.hidden, patch=a.patch, out_dir=a.out,
        log_interval=a.log_interval, synthetic=a.synthetic_data,
    )


if __name__ == "__main__":
    main()
