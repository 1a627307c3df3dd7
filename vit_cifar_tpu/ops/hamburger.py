"""Hamburger: matrix-decomposition token mixing.

Reference: hamburger/ham.py (NMF2D/VQ2D/CD2D multiplicative-update loops),
hamburger/burger.py (V1/V2/V2+ assemblies), hamburger/bread.py (ConvBNReLU
with SynchronizedBatchNorm), layers.py:243-300 (Hamburger / HamburgerAttention
wrappers that run the burger over the TOKEN dimension, in_c = seq_len).

Semantics preserved:
  * local_inference runs ``train_steps``(6)/``eval_steps``(7) NO-GRAD
    multiplicative-update iterations (ham.py:47-57) — here a ``lax.fori_loop``
    under ``stop_gradient`` — followed by ONE gradient-tracked ``compute_coef``
    step (ham.py:85-88).  The one-step-gradient trick is the point of the
    paper; getting the stop_gradient boundary exactly here is the correctness
    detail.
  * NMF2D: uniform-random bases, inv_t=1, eta=0.1 (ham.py:215-255).
  * VQ2D: cosine-similarity VQ (ham.py:115-163).
  * CD2D: concept decomposition.  The reference's ``compute_coef`` has a bare
    ``device`` NameError (ham.py:206) — broken as shipped; we implement the
    intended ridge-regression solve.
  * persistent bases with EMA online_update when RAND_INIT=False
    (ham.py:75-83,102-112) — a flax "state" variable updated during training;
    JAX has no buffers, so this is explicit mutable state in the train step.
  * burger conv weights He-normal with fan = k*k*OUT channels
    (burger.py:44-50); BN gamma=1, beta=0; BN momentum 3e-4 (bread.py:17).
  * SynchronizedBatchNorm -> TorchBatchNorm (ops/norm.py, torch running-stat
    semantics incl. the unbiased running_var of sync_bn.py:128-132): under
    pjit the batch is one global logical tensor, so BN stats are
    cross-replica by construction — the entire SyncMaster/SlavePipe thread
    machinery (hamburger/comm.py) has no equivalent here because nothing
    needs it.

Known-broken reference behavior NOT replicated (documented):
  * ``hamburger``/``hamburger_attention`` CRASH in the reference for any
    input: layers.py:252-259 passes the (B,T,F) token tensor straight into
    Conv2d (torch reads it as an unbatched 3D image -> channel mismatch).
    We implement the intended semantics: tokens become channels with a
    trailing spatial dim of 1, i.e. (B,T,F) -> NHWC (B,F,1,T).
  * ``--burger-mode Gated`` KeyErrors in the reference (main.py:135 vs
    burger.py:209-217); we raise a clear NotImplementedError.

TPU notes: the MD inner loop is a chain of small batched matmuls
((B,512,384)x(B,384,64) etc.) — MXU-friendly; the fori_loop keeps one fused
kernel per iteration with no host round-trips.
"""

from __future__ import annotations

import functools
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .init import TorchLinear
from .norm import TorchBatchNorm

Dtype = Any


def he_conv_init(key, shape, dtype=jnp.float32):
    """burger.py:44-47: normal(0, sqrt(2/N)), N = kh*kw*out_channels."""
    kh, kw, _, out = shape
    std = (2.0 / (kh * kw * out)) ** 0.5
    return std * jax.random.normal(key, shape, dtype)


def _l2_normalize(x, axis, eps=1e-12):
    """torch F.normalize: x / max(||x||, eps)."""
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)


# --------------------------------------------------------------------------- #
# Matrix decomposition cores — pure functions on (B', D, N) matrices.
# --------------------------------------------------------------------------- #


def _nmf_local_step(x, bases, coef):
    """ham.py:231-247 — multiplicative updates."""
    numerator = jnp.einsum("bdn,bdr->bnr", x, bases)
    denominator = coef @ jnp.einsum("bdr,bds->brs", bases, bases)
    coef = coef * numerator / (denominator + 1e-6)
    numerator = x @ coef
    denominator = bases @ jnp.einsum("bnr,bns->brs", coef, coef)
    bases = bases * numerator / (denominator + 1e-6)
    return bases, coef


def _nmf_compute_coef(x, bases, coef):
    numerator = jnp.einsum("bdn,bdr->bnr", x, bases)
    denominator = coef @ jnp.einsum("bdr,bds->brs", bases, bases)
    return coef * numerator / (denominator + 1e-6)


def _vq_local_step(inv_t, x, bases, coef):
    """ham.py:126-145 — cosine-similarity VQ."""
    std_x = _l2_normalize(x, axis=1)
    std_bases = _l2_normalize(bases, axis=1, eps=1e-6)
    coef = jnp.einsum("bdn,bdr->bnr", std_x, std_bases)
    coef = jax.nn.softmax(inv_t * coef, axis=-1)
    coef = coef / (1e-6 + coef.sum(axis=1, keepdims=True))
    bases = x @ coef
    return bases, coef


def _vq_compute_coef(inv_t, x, bases, coef):
    x_norm = jnp.linalg.norm(x, axis=1, keepdims=True)
    std_x = x / (1e-6 + jax.lax.stop_gradient(x_norm))
    std_bases = _l2_normalize(bases, axis=1, eps=1e-6)
    c = jnp.einsum("bdn,bdr->bnr", std_x, std_bases)
    return jax.nn.softmax(inv_t * c, axis=-1)


def _cd_local_step(inv_t, x, bases, coef):
    """ham.py:176-199."""
    std_x = _l2_normalize(x, axis=1)
    coef = jnp.einsum("bdn,bdr->bnr", std_x, bases)
    coef = jax.nn.softmax(inv_t * coef, axis=-1)
    coef = coef / (1e-6 + coef.sum(axis=1, keepdims=True))
    bases = x @ coef
    bases = _l2_normalize(bases, axis=1, eps=1e-6)
    return bases, coef


def _cd_compute_coef(beta, R, x, bases, coef):
    """Intended semantics of ham.py:201-211 (fixed: the reference NameErrors)."""
    gram = jnp.einsum("bdr,bds->brs", bases, bases)
    temp = jnp.linalg.inv(gram + beta * jnp.eye(R, dtype=x.dtype))
    return jnp.einsum("bdn,bdr,brs->bns", x, bases, temp)


class MatrixDecomposition2D(nn.Module):
    """_MatrixDecomposition2DBase (ham.py:14-112) on (B,H,W,C) NHWC inputs."""

    ham_type: str = "NMF"  # NMF | VQ | CD
    spatial: bool = True  # = not DEPTHWISE (ham.py:18)
    S: int = 1
    D: int = 512
    R: int = 64
    train_steps: int = 6
    eval_steps: int = 7
    inv_t: float = 100.0
    eta: float = 0.9
    beta: float = 0.1
    rand_init: bool = True
    dtype: Dtype = jnp.float32

    def _build_bases(self, key, n, D):
        if self.ham_type == "NMF":
            bases = jax.random.uniform(key, (n, D, self.R), jnp.float32)
        else:
            bases = jax.random.normal(key, (n, D, self.R), jnp.float32)
        return _l2_normalize(bases, axis=1)

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        if self.ham_type not in ("NMF", "VQ", "CD"):
            raise NotImplementedError(f"ham type {self.ham_type}")
        inv_t = 1.0 if self.ham_type == "NMF" else self.inv_t
        eta = 0.1 if self.ham_type == "NMF" else self.eta

        local_step = {
            "NMF": _nmf_local_step,
            "VQ": functools.partial(_vq_local_step, inv_t),
            "CD": functools.partial(_cd_local_step, inv_t),
        }[self.ham_type]
        compute_coef = {
            "NMF": _nmf_compute_coef,
            "VQ": functools.partial(_vq_compute_coef, inv_t),
            "CD": functools.partial(_cd_compute_coef, self.beta, self.R),
        }[self.ham_type]

        B, H, W, C = x.shape
        orig_dtype = x.dtype
        x = x.astype(jnp.float32)  # the ratio/normalize arithmetic wants fp32
        xc = x.reshape(B, H * W, C).transpose(0, 2, 1)  # (B, C, N=H*W)
        if self.spatial:
            D, N = C // self.S, H * W
            xm = xc.reshape(B * self.S, D, N)
        else:
            D, N = H * W, C // self.S
            xm = xc.reshape(B * self.S, N, D).transpose(0, 2, 1)

        if self.rand_init:
            key = (
                self.make_rng("mask")
                if self.has_rng("mask")
                else jax.random.PRNGKey(0)
            )
            bases = self._build_bases(key, B * self.S, D)
        else:
            bases_var = self.variable(
                "state",
                "bases",
                lambda: self._build_bases(jax.random.PRNGKey(0), self.S, D),
            )
            bases = jnp.tile(bases_var.value, (B, 1, 1))

        # --- no-grad multiplicative-update iterations (ham.py:47-57) ---
        steps = self.eval_steps if deterministic else self.train_steps
        xs = jax.lax.stop_gradient(xm)

        coef0 = jax.nn.softmax(
            inv_t * jnp.einsum("bdn,bdr->bnr", xs, bases), axis=-1
        )

        def body(_, carry):
            b, c = carry
            return local_step(xs, b, c)

        bases, coef = jax.lax.fori_loop(0, steps, body, (bases, coef0))
        bases = jax.lax.stop_gradient(bases)
        coef = jax.lax.stop_gradient(coef)

        # --- the ONE gradient-tracked step (ham.py:85-88) ---
        coef = compute_coef(xm, bases, coef)

        # reconstruct: (B', D, R) @ (B', N, R)^T -> (B', D, N)
        recon = jnp.einsum("bdr,bnr->bdn", bases, coef)

        if self.spatial:
            rc = recon.reshape(B, C, H * W)
        else:
            rc = recon.transpose(0, 2, 1).reshape(B, C, H * W)
        out = rc.transpose(0, 2, 1).reshape(B, H, W, C).astype(orig_dtype)

        # --- EMA base update (ham.py:102-112) ---
        if not self.rand_init and not deterministic and not self.is_initializing():
            b = bases.reshape(B, self.S, D, self.R).mean(axis=0)
            new = bases_var.value + eta * (b - bases_var.value)
            bases_var.value = _l2_normalize(new, axis=1)

        return out


# --------------------------------------------------------------------------- #
# Bread / burger assemblies
# --------------------------------------------------------------------------- #


class _HeConv1x1(nn.Module):
    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features, (1, 1), use_bias=self.use_bias, dtype=self.dtype,
            kernel_init=he_conv_init, name="conv",
        )(x)


class _BN(nn.Module):
    """bread.py norm_layer: SyncBN(momentum=3e-4) -> TorchBatchNorm(0.9997).

    The sync_bn package follows torch _BatchNorm running-stat semantics
    (unbiased running_var: sync_bn.py:128-132, `sumvar / (size - 1)`);
    TorchBatchNorm preserves that, and under pjit the batch stats are global
    by construction (GSPMD), which is the SyncBN behavior itself.
    """

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        return TorchBatchNorm(
            epsilon=1e-5, momentum=1.0 - 3e-4, dtype=self.dtype,
            use_running_average=deterministic,
        )(x)


class ConvBNReLU(nn.Module):
    """bread.py:17-50 (1x1 conv, no bias, BN, ReLU)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = _HeConv1x1(self.features, use_bias=False, dtype=self.dtype, name="c")(x)
        x = _BN(self.dtype, name="bn")(x, deterministic=deterministic)
        return nn.relu(x)


class HamburgerBurger(nn.Module):
    """V1/V2/V2+ assemblies (burger.py:17-206) on NHWC."""

    in_c: int
    version: str = "V1"
    ham_type: str = "NMF"
    MD_D: int = 512
    spatial: bool = True
    md_iter: int | None = None  # overrides train/eval steps when given
    rand_init: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        if self.version not in ("V1", "V2", "V2+"):
            raise NotImplementedError(
                f"--burger-mode {self.version!r}: the reference CLI offers 'Gated' "
                "but its dispatch KeyErrors (main.py:135 vs burger.py:209-217)"
            )
        steps = dict(
            train_steps=self.md_iter if self.md_iter is not None else 6,
            eval_steps=self.md_iter if self.md_iter is not None else 7,
        )
        md = functools.partial(
            MatrixDecomposition2D,
            ham_type=self.ham_type,
            D=self.MD_D,
            rand_init=self.rand_init,
            dtype=self.dtype,
            **steps,
        )

        shortcut = x
        if self.version in ("V1", "V2"):
            x = _HeConv1x1(self.MD_D, dtype=self.dtype, name="lower_bread")(x)
            if self.ham_type == "NMF":
                x = nn.relu(x)
            x = md(spatial=self.spatial, name="ham")(x, deterministic=deterministic)
            if self.version == "V1":
                x = _HeConv1x1(self.in_c, use_bias=False, dtype=self.dtype,
                               name="upper_bread")(x)
                x = _BN(self.dtype, name="upper_bn")(x, deterministic=deterministic)
            else:
                x = ConvBNReLU(self.MD_D, dtype=self.dtype, name="cheese")(
                    x, deterministic=deterministic
                )
                x = _HeConv1x1(self.in_c, use_bias=False, dtype=self.dtype,
                               name="upper_bread")(x)
            return nn.relu(x + shortcut)

        # V2+ (burger.py:122-206): dual hams with learned coefs.  The dual
        # construction ASSIGNS args.SPATIAL = True/False per ham
        # (burger.py:144-146) but the MD base only ever reads DEPTHWISE
        # (ham.py:18) — SPATIAL is dead, so both reference hams run
        # spatial = not depthwise.  Replicated as shipped.
        C = 2 * self.MD_D
        x = _HeConv1x1(C, dtype=self.dtype, name="lower_bread")(x)
        if self.ham_type == "NMF":
            x = nn.relu(x)
        x1, x2 = jnp.split(x, 2, axis=-1)
        x1 = md(spatial=self.spatial, name="ham_1")(x1, deterministic=deterministic)
        x2 = md(spatial=self.spatial, name="ham_2")(x2, deterministic=deterministic)
        x = jnp.concatenate([x1, x2], axis=-1)
        factor = 2  # CHEESE_FACTOR = S(=1), doubled for dual (burger.py:148-151)
        x = ConvBNReLU(C // factor, dtype=self.dtype, name="cheese")(
            x, deterministic=deterministic
        )
        x = _HeConv1x1(self.in_c, use_bias=False, dtype=self.dtype,
                       name="upper_bread")(x)
        coef_shortcut = self.param("coef_shortcut", lambda k: jnp.ones((1,)))
        coef_ham = self.param("coef_ham", lambda k: jnp.zeros((1,)))  # ZERO_HAM
        return nn.relu(coef_ham * x + coef_shortcut * shortcut)


class Hamburger(nn.Module):
    """Token-mixer wrapper (layers.py:243-260): burger over the token dim.

    The reference feeds (B,T,F) straight into Conv2d and crashes; the intended
    semantics — tokens as channels, in_c = seq_len — is implemented by viewing
    the sequence as an NHWC image (B, H=F, W=1, C=T).
    """

    seq_len: int
    features: int
    burger_mode: str = "V1"
    depthwise: bool = False
    md_iter: int | None = None
    rand_init: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        B, T, F = x.shape
        img = x.transpose(0, 2, 1)[:, :, None, :]  # (B, F, 1, T) NHWC
        out = HamburgerBurger(
            in_c=self.seq_len,
            version=self.burger_mode,
            spatial=not self.depthwise,
            md_iter=self.md_iter,
            rand_init=self.rand_init,
            dtype=self.dtype,
            name="burger",
        )(img, deterministic=deterministic)
        return out[:, :, 0, :].transpose(0, 2, 1)  # back to (B, T, F)


class HamburgerAttention(nn.Module):
    """layers.py:263-300: AFT-Simple with an NMF-denoised K."""

    seq_len: int
    features: int
    burger_mode: str = "V1"
    depthwise: bool = False
    md_iter: int | None = None
    rand_init: bool = True
    dropout: float = 0.0
    query: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        v = TorchLinear(self.features, dtype=self.dtype, name="Wv")(x)
        k = Hamburger(
            seq_len=self.seq_len,
            features=self.features,
            burger_mode=self.burger_mode,
            depthwise=self.depthwise,
            md_iter=self.md_iter,
            rand_init=self.rand_init,
            dtype=self.dtype,
            name="hamburger",
        )(x, deterministic=deterministic)
        attn = jax.nn.softmax(k.astype(jnp.float32), axis=1).astype(self.dtype)
        y = jnp.sum(attn * v, axis=1, keepdims=True)
        if self.query:
            q = TorchLinear(self.features, dtype=self.dtype, name="Wq")(x)
            y = nn.sigmoid(q) * y
        out = TorchLinear(self.features, dtype=self.dtype, name="out_project")(y)
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)
