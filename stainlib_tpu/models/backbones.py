"""DANN model variants and backbones.

Parity with the reference's variant zoo:
* ``dann_mitosis_model_gap`` / no-dropout variants
  (``models_code/models_keras.py:182-278``): global-average-pooling feature
  head and a dropout-free stack;
* the MobileNet alpha=0.5 backbone used for TCGA 224x224 patches
  (``tcga_dann_4reps.py:74-80``) — a width-scaled depthwise-separable
  MobileNetV1 in flax, wired to the same two-headed gradient-reversal top.
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax.numpy as jnp

from stainlib_tpu.models.dann import gradient_reversal


class DannCNNGap(nn.Module):
    """GAP variant: conv trunk -> global average pool -> two heads."""

    n_domains: int = 8
    n_filters: int = 16
    dropout: float = 0.25  # set 0.0 for the no-dropout variant

    @nn.compact
    def __call__(self, x, hp_lambda=1.0, train: bool = True):
        conv = functools.partial(
            nn.Conv, features=self.n_filters, kernel_size=(4, 4),
            padding="VALID",
        )
        norm = functools.partial(
            nn.BatchNorm, use_running_average=not train, momentum=0.99
        )
        for _ in range(3):
            x = nn.relu(conv()(x))
            x = norm()(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            if self.dropout:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        feats = jnp.mean(x, axis=(1, 2))  # global average pooling

        xd = gradient_reversal(feats, jnp.asarray(hp_lambda, x.dtype))
        xd = nn.relu(nn.Dense(128, name="dom_pred_feats1")(xd))
        domain_logits = nn.Dense(self.n_domains, name="dom_regressor")(xd)

        xm = nn.relu(nn.Dense(128, name="mit_pred_feats1")(feats))
        if self.dropout:
            xm = nn.Dropout(self.dropout, deterministic=not train)(xm)
        mitosis_logits = nn.Dense(2, name="mit_pred")(xm)
        return mitosis_logits, domain_logits


class MobileNetBackbone(nn.Module):
    """Width-scaled MobileNetV1 trunk (depthwise-separable convs).

    ``alpha=0.5`` reproduces the capacity of the reference's
    ``MobileNet(alpha=0.5)`` TCGA backbone (``tcga_dann_4reps.py:74-80``).
    Returns GAP features.
    """

    alpha: float = 0.5
    bn_momentum: float = 0.99  # keras default; 0.9 for short demo runs

    @nn.compact
    def __call__(self, x, train: bool = True):
        def c(ch):
            return max(8, int(ch * self.alpha))

        norm = functools.partial(
            nn.BatchNorm, use_running_average=not train,
            momentum=self.bn_momentum,
        )

        def sep_block(x, ch, stride):
            # depthwise
            x = nn.Conv(x.shape[-1], (3, 3), strides=(stride, stride),
                        padding="SAME", feature_group_count=x.shape[-1],
                        use_bias=False)(x)
            x = nn.relu(norm()(x))
            # pointwise
            x = nn.Conv(ch, (1, 1), use_bias=False)(x)
            return nn.relu(norm()(x))

        x = nn.Conv(c(32), (3, 3), strides=(2, 2), padding="SAME",
                    use_bias=False)(x)
        x = nn.relu(norm()(x))
        # The full MobileNetV1 stack: 64s1, 128s2/s1, 256s2/s1, 512s2 then
        # five 512s1 blocks, 1024s2/s1 — matching keras MobileNet(alpha)
        # so the TCGA trunk capacity is apples-to-apples with the
        # reference's (``tcga_dann_4reps.py:74-80``).
        for ch, stride in [(64, 1), (128, 2), (128, 1), (256, 2), (256, 1),
                           (512, 2), (512, 1), (512, 1), (512, 1), (512, 1),
                           (512, 1), (1024, 2), (1024, 1)]:
            x = sep_block(x, c(ch), stride)
        return jnp.mean(x, axis=(1, 2))


class MobileNetDann(nn.Module):
    """MobileNet trunk + the two-headed gradient-reversal top — the TCGA
    configuration of ``tcga_dann_4reps.py:66-99``: each head is the
    reference's Dense(256) -> Dense(128) -> softmax stack (``feats1_gp``/
    ``feats2_gp``/``output`` and the domain mirror behind the reversal)."""

    n_domains: int = 8
    alpha: float = 0.5
    bn_momentum: float = 0.99

    @nn.compact
    def __call__(self, x, hp_lambda=1.0, train: bool = True):
        feats = MobileNetBackbone(
            alpha=self.alpha, bn_momentum=self.bn_momentum)(x, train=train)
        xd = gradient_reversal(feats, jnp.asarray(hp_lambda, x.dtype))
        xd = nn.relu(nn.Dense(256, name="feats1_dom")(xd))
        xd = nn.relu(nn.Dense(128, name="feats2_dom")(xd))
        domain_logits = nn.Dense(self.n_domains, name="dom_regressor")(xd)
        xm = nn.relu(nn.Dense(256, name="feats1_gp")(feats))
        xm = nn.relu(nn.Dense(128, name="feats2_gp")(xm))
        mitosis_logits = nn.Dense(2, name="mit_pred")(xm)
        return mitosis_logits, domain_logits
