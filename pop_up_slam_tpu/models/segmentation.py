"""Ground/wall segmentation: learned (SegNet-style CNN) and classical.

The reference pipeline runs a Caffe SegNet to label ground-vs-wall
pixels before the pop-up (paper arXiv:1703.07334 §III-A; SURVEY.md
§2.1 "CNN ground segmentation" — weights not shippable, so per
SURVEY.md §2.1 item 5 the TPU build provides:

1. :class:`SegNetLite` — a small flax encoder-decoder trained on
   synthetic renders (and finetunable on any labeled data).  bf16
   matmuls on the MXU; all shapes static.
2. :func:`classical_ground_mask` — a floor-color Gaussian model seeded
   from the bottom image rows plus a brightness/gradient heuristic.
   Adequate for TUM fr3 structure-notexture (dark floor, white walls).
3. Precomputed masks can always be supplied through the dataset loader
   (``io.tum`` ``seg/`` directory) — matching how the reference is
   usually run (offline CNN masks).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

try:
    import flax.linen as nn
    import optax

    _HAS_FLAX = True
except Exception:  # pragma: no cover - flax is baked into this image
    _HAS_FLAX = False


# ---------------------------------------------------------------------------
# Classical floor-model segmentation
# ---------------------------------------------------------------------------


def classical_ground_mask(
    rgb: jnp.ndarray,
    seed_frac: float = 0.12,
    mahalanobis_thresh: float = 9.0,
    min_col_run: int = 3,
) -> jnp.ndarray:
    """Floor-color segmentation without a CNN.

    rgb: (H, W, 3) float in [0, 1] (or uint8).  Fits a Gaussian color
    model to the bottom-*center* patch (bottom ``seed_frac`` of rows,
    central half of columns — in corridor views the lower image
    *corners* are wall, so a full-width seed is contaminated), refines
    it once on the inliers of the lower image half (EM-style robust
    refit), and labels pixels within a Mahalanobis radius.  A
    per-column cleanup keeps only the run of ground pixels connected
    (within the column) to the bottom of the image, which removes
    same-colored blobs on walls/ceiling.
    """
    if rgb.dtype == jnp.uint8:
        rgb = rgb.astype(jnp.float32) / 255.0
    H, W, _ = rgb.shape
    seed_rows = max(int(H * seed_frac), 4)
    seed = rgb[H - seed_rows:, W // 4: (3 * W) // 4, :].reshape(-1, 3)

    def fit(pix, w):
        wsum = jnp.maximum(w.sum(), 1.0)
        mu = (pix * w[:, None]).sum(axis=0) / wsum
        centered = (pix - mu) * jnp.sqrt(w)[:, None]
        cov = centered.T @ centered / wsum + 1e-4 * jnp.eye(3)
        return mu, jnp.linalg.inv(cov)

    def mdist(mu, prec):
        diff = rgb - mu
        return jnp.einsum("hwi,ij,hwj->hw", diff, prec, diff)

    mu, prec = fit(seed, jnp.ones((seed.shape[0],)))
    # One robust refit on lower-half inliers of the initial model.
    m2 = mdist(mu, prec)
    rows = jnp.arange(H)[:, None]
    inlier = (m2 < mahalanobis_thresh) & (rows >= H // 2)
    mu, prec = fit(
        rgb.reshape(-1, 3), inlier.reshape(-1).astype(jnp.float32)
    )
    raw = mdist(mu, prec) < mahalanobis_thresh

    # Degeneracy guard: when no floor is visible (e.g. facing a wall
    # up close) the bottom seed is wall-colored and the model would
    # label the whole frame ground.  Compare against a model of the
    # *top* rows (wall/ceiling by assumption): if the seed color is not
    # separable from it, report an empty mask instead.
    top = rgb[:seed_rows, :, :].reshape(-1, 3)
    mu_top, _ = fit(top, jnp.ones((top.shape[0],)))
    dmu = mu - mu_top
    separation = dmu @ prec @ dmu
    raw = raw & (separation > 4.0)

    # Column cleanup: ground must be bottom-connected.  Scan rows from
    # the bottom; a pixel stays ground only while the run from the
    # bottom is unbroken (allow min_col_run-1 gap pixels).
    flipped = raw[::-1, :]                              # bottom-up

    def scan_col(carry, row):
        gap = jnp.where(row, 0, carry + 1)
        keep = row & (carry < min_col_run)
        return gap, keep

    _, kept = jax.lax.scan(
        scan_col, jnp.zeros((W,), jnp.int32), flipped
    )
    return kept[::-1, :]


# ---------------------------------------------------------------------------
# SegNet-lite (flax)
# ---------------------------------------------------------------------------

if _HAS_FLAX:

    class SegNetLite(nn.Module):
        """Small encoder-decoder for binary ground segmentation.

        Channels are multiples of 8 and spatial dims stay powers-of-two
        friendly so XLA tiles convs onto the MXU; compute runs in
        bfloat16 with float32 params (the safe mixed-precision recipe).
        """

        features: tuple = (16, 32, 64)
        dtype: Any = jnp.bfloat16

        @nn.compact
        def __call__(self, x):  # x: (B, H, W, 3) float32 in [0,1]
            x = x.astype(self.dtype)
            skips = []
            for f in self.features:
                x = nn.Conv(f, (3, 3), dtype=self.dtype)(x)
                x = nn.relu(x)
                x = nn.Conv(f, (3, 3), dtype=self.dtype)(x)
                x = nn.relu(x)
                skips.append(x)
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            for f, skip in zip(reversed(self.features), reversed(skips)):
                B, h, w, c = x.shape
                x = jax.image.resize(x, (B, h * 2, w * 2, c), "nearest")
                x = jnp.concatenate([x, skip], axis=-1)
                x = nn.Conv(f, (3, 3), dtype=self.dtype)(x)
                x = nn.relu(x)
            logits = nn.Conv(1, (1, 1), dtype=jnp.float32)(x)
            return logits[..., 0]  # (B, H, W)

    def create_train_state(key, lr: float = 1e-3, image_hw=(120, 160)):
        model = SegNetLite()
        params = model.init(key, jnp.zeros((1, *image_hw, 3)))
        tx = optax.adam(lr)
        opt_state = tx.init(params)
        return model, params, tx, opt_state

    def train_step(model, params, tx, opt_state, rgb, labels):
        """One optimization step of sigmoid-BCE on ground labels.

        rgb: (B, H, W, 3) float32; labels: (B, H, W) bool (ground).
        """

        def loss_fn(p):
            logits = model.apply(p, rgb)
            y = labels.astype(jnp.float32)
            loss = optax.sigmoid_binary_cross_entropy(logits, y).mean()
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def predict_mask(model, params, rgb, thresh: float = 0.0):
        """rgb: (B, H, W, 3) -> (B, H, W) bool ground mask."""
        return model.apply(params, rgb) > thresh

    def load_pretrained_segnet(path: str | None = None):
        """Load the committed synthetic-trained SegNetLite checkpoint
        (scripts/train_segnet.py; models_data/segnet_lite.npz).

        The network is fully convolutional, so it runs at any
        resolution; the checkpoint was trained at 96x128 synthetic
        renders.  Returns (model, params, meta)."""
        import os

        import numpy as np

        from ..utils.checkpoint import load_state

        if path is None:
            path = os.path.join(
                os.path.dirname(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__)))),
                "models_data", "segnet_lite.npz",
            )
        model = SegNetLite()
        template = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 96, 128, 3))
        )
        params, meta = load_state(path, template)
        return model, params, meta

else:  # pragma: no cover
    SegNetLite = None

    def create_train_state(*a, **k):
        raise ImportError("flax/optax unavailable")

    def train_step(*a, **k):
        raise ImportError("flax/optax unavailable")

    def predict_mask(*a, **k):
        raise ImportError("flax/optax unavailable")

    def load_pretrained_segnet(*a, **k):
        raise ImportError("flax/optax unavailable")
