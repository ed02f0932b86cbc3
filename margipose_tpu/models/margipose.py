"""MargiPose: multi-stage CNN predicting per-joint xy/zy/xz marginal heatmaps.

TPU-native re-design of the reference architecture
(reference: src/margipose/models/margipose_model.py:13-284). NHWC
activations; heatmaps are transposed to [B, J, H, W] only at the tiny
softmax/DSNT head. The forward pass is a pure function returning
``(coords, ModelOutput)``; losses are pure functions over ``ModelOutput``
(the reference stashes heatmaps on the module instead).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from margipose_tpu.models.layers import BatchNorm, TorchConv, TorchConvTranspose
from margipose_tpu.models.resnet import ResNetStem
from margipose_tpu.ops.convs import relu
from margipose_tpu.ops.dsnt import (
    average_loss,
    dsnt,
    euclidean_losses,
    js_reg_losses,
)

Default_MargiPose_Desc = {
    'type': 'margipose',
    'version': '6.0.1',
    'settings': {
        'n_stages': 4,
        'axis_permutation': True,
        'feature_extractor': 'inceptionv4',
        'pixelwise_loss': 'jsd',
    },
}


class ModelOutput(NamedTuple):
    """Per-stage heatmaps in [B, J, H, W] layout (post flat_softmax).

    ``stacked`` additionally carries the same heatmaps as per-stage
    [3, B, H, W, J] arrays (plane order xy/zy/xz, NHWC) when the model
    computes them natively in that layout (MargiPose does; Chatterbox does
    not). The loss functions prefer ``stacked``: it needs no per-plane
    transposes, and XLA dead-code-eliminates the compatibility [B, J, H, W]
    fields inside jitted train steps where only ``stacked`` is consumed.
    """

    xy_heatmaps: tuple
    zy_heatmaps: tuple
    xz_heatmaps: tuple
    stacked: tuple = ()


class ResMain(nn.Module):
    """Main branch of a residual block: conv_in, bn, relu, 3x3 conv, bn, relu.
    Child names 0/1/3/4 match the torch Sequential indices
    (reference: src/margipose/models/margipose_model.py:25-40)."""

    chans: int
    conv_in_kind: str  # 'regular' | 'down' | 'up'

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.conv_in_kind == 'regular':
            x = TorchConv(self.chans, 3, padding=1, use_bias=False, name='0')(x)
        elif self.conv_in_kind == 'down':
            x = TorchConv(self.chans, 3, padding=1, stride=2, use_bias=False, name='0')(x)
        elif self.conv_in_kind == 'up':
            x = TorchConvTranspose(self.chans, 3, stride=2, padding=1,
                                   output_padding=1, use_bias=False, name='0')(x)
        else:
            raise ValueError(self.conv_in_kind)
        x = BatchNorm(name='1')(x, train)
        x = relu(x)
        x = TorchConv(self.chans, 3, padding=1, use_bias=False, name='3')(x)
        x = BatchNorm(name='4')(x, train)
        return relu(x)


class ResShortcut(nn.Module):
    """Shortcut branch: 1x1 conv (maybe strided / transposed) + bn.
    Child names 0/1 match torch Sequential indices."""

    chans: int
    conv_in_kind: str

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.conv_in_kind == 'regular':
            x = TorchConv(self.chans, 1, use_bias=False, name='0')(x)
        elif self.conv_in_kind == 'down':
            x = TorchConv(self.chans, 1, stride=2, use_bias=False, name='0')(x)
        elif self.conv_in_kind == 'up':
            x = TorchConvTranspose(self.chans, 1, stride=2, output_padding=1,
                                   use_bias=False, name='0')(x)
        else:
            raise ValueError(self.conv_in_kind)
        return BatchNorm(name='1')(x, train)


class ResidualBlock(nn.Module):
    """main(x) + shortcut(x) (reference: src/margipose/models/margipose_model.py:25-40)."""

    chans: int
    conv_in_kind: str = 'regular'

    @nn.compact
    def __call__(self, x, train: bool = False):
        return (
            ResMain(self.chans, self.conv_in_kind, name='module')(x, train)
            + ResShortcut(self.chans, self.conv_in_kind, name='shortcut')(x, train)
        )


def permute_axis_nhwc(x: jax.Array, mode: str) -> jax.Array:
    """The marginal-heatmap axis-permutation trick in NHWC layout.

    Channels are split into groups of ``size`` (the spatial side length) and
    within each group the channel axis is swapped with width ('zy') or
    height ('xz'), so the up-convolutions operate in the zy / xz plane
    (reference: src/margipose/models/margipose_model.py:84-100).
    """
    if mode == 'xy':
        return x
    b, h, w, c = x.shape
    size = w
    # both permutations reshape back to (b, h, w, c); with h != w the
    # reshape would still succeed element-count-wise but scramble data
    assert h == w, 'axis permutation requires square feature maps'
    assert c % size == 0, 'channel count must divide spatial size'
    groups = c // size
    x5 = x.reshape(b, h, w, groups, size)
    if mode == 'zy':  # swap channel-in-group <-> width
        x5 = jnp.transpose(x5, (0, 1, 4, 3, 2))
    elif mode == 'xz':  # swap channel-in-group <-> height
        x5 = jnp.transpose(x5, (0, 4, 2, 3, 1))
    else:
        raise ValueError(mode)
    return x5.reshape(b, h, w, groups * size)


class ColumnDown(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ResidualBlock(128, 'regular', name='0')(x, train)
        x = ResidualBlock(128, 'regular', name='1')(x, train)
        x = ResidualBlock(192, 'down', name='2')(x, train)
        x = ResidualBlock(192, 'regular', name='3')(x, train)
        x = ResidualBlock(192, 'regular', name='4')(x, train)
        return x


class ColumnUp(nn.Module):
    n_joints: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ResidualBlock(192, 'regular', name='0')(x, train)
        x = ResidualBlock(192, 'regular', name='1')(x, train)
        x = ResidualBlock(128, 'up', name='2')(x, train)
        x = ResidualBlock(128, 'regular', name='3')(x, train)
        x = ResidualBlock(self.n_joints, 'regular', name='4')(x, train)
        return x


class HeatmapColumn(nn.Module):
    """Hourglass column 128->192(/2)->128 with the axis-permuting middle
    (reference: src/margipose/models/margipose_model.py:43-100)."""

    n_joints: int
    heatmap_space: str  # 'xy' | 'zy' | 'xz'

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = ColumnDown(name='down_layers')(x, train)
        mid = permute_axis_nhwc(mid, self.heatmap_space)
        return ColumnUp(self.n_joints, name='up_layers')(mid, train)


class HeatmapCombiner(nn.Module):
    """1x1 conv combining the three per-joint heatmap sets into 128 features
    (reference: src/margipose/models/margipose_model.py:142-150)."""

    @nn.compact
    def __call__(self, stacked):
        # stacked: [3, B, H, W, J] -> NHWC [B, H, W, 3J]; channel order
        # (xy joints, zy joints, xz joints) matches the reference's
        # torch.cat along the channel dim.
        s, b, h, w, j = stacked.shape
        cat = jnp.transpose(stacked, (1, 2, 3, 0, 4)).reshape(b, h, w, s * j)
        return TorchConv(128, 1, use_bias=False, name='conv')(cat)


class InceptionInCnn(nn.Module):
    """InceptionV4 blocks 0-6 + Conv1x1(384->128) + BN + ReLU. Children are
    named by the reference Sequential indices ('0'..'8')
    (reference: src/margipose/models/margipose_model.py:103-118)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        from margipose_tpu.models.inception import (
            InceptionA,
            Mixed3a,
            Mixed4a,
            Mixed5a,
        )
        from margipose_tpu.models.layers import BasicConv2d

        x = BasicConv2d(32, 3, stride=2, padding=1, name='0')(x, train)
        x = BasicConv2d(32, 3, stride=1, padding=1, name='1')(x, train)
        x = BasicConv2d(64, 3, stride=1, padding=1, name='2')(x, train)
        x = Mixed3a(name='3')(x, train)
        x = Mixed4a(name='4')(x, train)
        x = Mixed5a(name='5')(x, train)
        x = InceptionA(name='6')(x, train)
        x = TorchConv(128, 1, name='7')(x)
        x = BatchNorm(name='8')(x, train)
        return relu(x)


# The three per-stage columns (xy/zy/xz) are structurally identical; batch
# them into ONE set of vmapped ops with weights stacked on a leading axis of
# size 3. On TPU this cuts the column op count 3x and triples the work per
# convolution — the unbatched version is op-overhead-bound at 32x32 spatial.
_VmapColumnDown = nn.vmap(
    ColumnDown,
    in_axes=(None, None), out_axes=0,
    variable_axes={'params': 0, 'batch_stats': 0},
    split_rngs={'params': True},
    axis_size=3,
)
_VmapColumnUp = nn.vmap(
    ColumnUp,
    in_axes=(0, None), out_axes=0,
    variable_axes={'params': 0, 'batch_stats': 0},
    split_rngs={'params': True},
    axis_size=3,
)


def flat_softmax_stacked(hms: jax.Array) -> jax.Array:
    """Softmax jointly over (H, W) of [3, B, H, W, J] stacked heatmaps —
    the NHWC-native counterpart of ops.dsnt.flat_softmax (no transposes)."""
    s, b, h, w, j = hms.shape
    flat = hms.reshape(s, b, h * w, j)
    flat = jax.nn.softmax(flat, axis=2)
    return flat.reshape(s, b, h, w, j)


class MargiPoseModelInner(nn.Module):
    """(reference: src/margipose/models/margipose_model.py:153-200)"""

    n_joints: int
    n_stages: int
    axis_permutation: bool
    feature_extractor: str

    def setup(self):
        if self.feature_extractor == 'inceptionv4':
            self.in_cnn = InceptionInCnn(name='in_cnn')
        elif self.feature_extractor in ('resnet18', 'resnet34', 'resnet50'):
            self.in_cnn = ResNetStem(variant=self.feature_extractor, name='in_cnn')
        else:
            raise ValueError(
                'unsupported image feature extractor model name: ' + self.feature_extractor
            )

        self.hm_cnns_down = [
            _VmapColumnDown(name=f'hm_cnns_down_{t}')
            for t in range(self.n_stages)
        ]
        self.hm_cnns_up = [
            _VmapColumnUp(self.n_joints, name=f'hm_cnns_up_{t}')
            for t in range(self.n_stages)
        ]
        self.hm_combiners = [
            HeatmapCombiner(name=f'hm_combiners_{t}')
            for t in range(self.n_stages - 1)
        ]

    def __call__(self, x, train: bool = False) -> ModelOutput:
        features = self.in_cnn(x, train)

        if self.axis_permutation:
            modes = ('xy', 'zy', 'xz')
        else:
            modes = ('xy', 'xy', 'xy')

        stacked = []
        inp = features
        for t in range(self.n_stages):
            if t > 0:
                # ACCUMULATE into the running input (`inp = inp + ...`, NOT
                # `features + ...`): the reference adds each stage's combined
                # heatmap features on top of all previous ones, so stage t
                # sees features + comb_0 + ... + comb_{t-1}. The two
                # semantics only coincide for n_stages <= 2 (reference:
                # src/margipose/models/margipose_model.py:187-195; pinned by
                # tests/test_reference_models.py 4-stage parity).
                inp = inp + self.hm_combiners[t - 1](stacked[t - 1])
            mids = self.hm_cnns_down[t](inp, train)  # [3, B, h, w, C]
            mids = jnp.stack(
                [permute_axis_nhwc(mids[i], m) for i, m in enumerate(modes)])
            hms = self.hm_cnns_up[t](mids, train)  # [3, B, H, W, J]
            # softmax in f32 for numerical stability under bf16 compute
            stacked.append(flat_softmax_stacked(hms.astype(jnp.float32)))

        def unstack(i):
            return tuple(jnp.transpose(s[i], (0, 3, 1, 2)) for s in stacked)

        return ModelOutput(
            xy_heatmaps=unstack(0),
            zy_heatmaps=unstack(1),
            xz_heatmaps=unstack(2),
            stacked=tuple(stacked),
        )


def heatmaps_to_coords(xy_hm, zy_hm, xz_hm) -> jax.Array:
    """[B, J, H, W] heatmaps -> [B, J, 3] coords; z is the mean of the two
    z marginals (reference: src/margipose/models/margipose_model.py:254-261)."""
    xy = dsnt(xy_hm)
    zy = dsnt(zy_hm)
    xz = dsnt(xz_hm)
    z = 0.5 * (zy[..., 0:1] + xz[..., 1:2])
    return jnp.concatenate([xy, z], axis=-1)


def _stacked_expectations(stacked: jax.Array):
    """DSNT coordinate expectations for all three planes at once.

    ``stacked``: [3, B, H, W, J] normalized heatmaps. Returns (ew, eh), each
    [3, B, J] — the per-plane expectations along the width / height axes.
    """
    from margipose_tpu.ops.dsnt import normalized_linspace

    _, _, h, w, _ = stacked.shape
    cw = normalized_linspace(w, stacked.dtype)
    ch = normalized_linspace(h, stacked.dtype)
    ew = jnp.einsum('sbhwj,w->sbj', stacked, cw)
    eh = jnp.einsum('sbhwj,h->sbj', stacked, ch)
    return ew, eh


def stacked_heatmaps_to_coords(stacked: jax.Array) -> jax.Array:
    """[3, B, H, W, J] stacked heatmaps -> [B, J, 3] coords (same math as
    heatmaps_to_coords, two fused reductions instead of six)."""
    ew, eh = _stacked_expectations(stacked)
    z = 0.5 * (ew[1] + eh[2])
    return jnp.stack([ew[0], eh[0], z], axis=-1)


class MargiPoseModel(nn.Module):
    """(reference: src/margipose/models/margipose_model.py:203-267)"""

    n_joints: int = 17
    n_stages: int = 4
    axis_permutation: bool = True
    feature_extractor: str = 'inceptionv4'
    pixelwise_loss: str | None = 'jsd'

    def setup(self):
        self.inner = MargiPoseModelInner(
            self.n_joints, self.n_stages, self.axis_permutation,
            self.feature_extractor, name='inner',
        )

    def __call__(self, x, train: bool = False):
        out = self.inner(x, train)
        xyz = stacked_heatmaps_to_coords(out.stacked[-1])
        return xyz, out


def _pixelwise_loss(kind, hm, target_coords, sigma=1.0):
    if kind == 'jsd':
        return js_reg_losses(hm, target_coords, sigma)
    if kind is None:
        return 0.0
    raise ValueError(f'unrecognised pixelwise loss: {kind}')


def _resolve_fused(use_fused, pixelwise_loss) -> bool:
    """The fused Pallas DSNT+JSD path is the default on TPU; the pure-jnp
    composition elsewhere (numeric equivalence tested in tests/test_pallas.py)."""
    if use_fused is not None:
        return use_fused and pixelwise_loss == 'jsd'
    return pixelwise_loss == 'jsd' and jax.default_backend() == 'tpu'


def _stage_components(out: ModelOutput, target_xyz: jax.Array,
                      pixelwise_loss, use_fused):
    """Per-stage loss ingredients, each computed ONCE: per-plane pixelwise
    losses and the coordinate estimates. Shared between the 2D and 3D loss
    heads (the xy-plane terms are identical in both)."""
    target_xy = target_xyz[..., 0:2]
    target_zy = jnp.stack([target_xyz[..., 2], target_xyz[..., 1]], axis=-1)
    target_xz = jnp.stack([target_xyz[..., 0], target_xyz[..., 2]], axis=-1)
    fused = _resolve_fused(use_fused, pixelwise_loss)
    if fused:
        from margipose_tpu.ops.pallas_dsnt import dsnt_jsd_fused

    for xy_hm, zy_hm, xz_hm in zip(out.xy_heatmaps, out.zy_heatmaps,
                                   out.xz_heatmaps):
        if fused:
            cxy, px_xy = dsnt_jsd_fused(xy_hm, target_xy)
            czy, px_zy = dsnt_jsd_fused(zy_hm, target_zy)
            cxz, px_xz = dsnt_jsd_fused(xz_hm, target_xz)
        else:
            cxy, czy, cxz = dsnt(xy_hm), dsnt(zy_hm), dsnt(xz_hm)
            px_xy = _pixelwise_loss(pixelwise_loss, xy_hm, target_xy)
            px_zy = _pixelwise_loss(pixelwise_loss, zy_hm, target_zy)
            px_xz = _pixelwise_loss(pixelwise_loss, xz_hm, target_xz)
        z = 0.5 * (czy[..., 0:1] + cxz[..., 1:2])
        actual_xyz = jnp.concatenate([cxy, z], axis=-1)
        yield px_xy, px_zy, px_xz, cxy, actual_xyz




def _stacked_js(stacked: jax.Array, target_xyz: jax.Array, sigma) -> jax.Array:
    """JS divergence of [3, B, H, W, J] heatmaps against separable target
    Gaussians rendered inline per plane (xy/zy/xz). Returns [3, B, J].

    Same math as ops.dsnt.js_reg_losses/make_gauss but NHWC-native — no
    transposes, no per-plane dispatch, one fused reduction per term.
    """
    tx, ty, tz = target_xyz[..., 0], target_xyz[..., 1], target_xyz[..., 2]
    tw = jnp.stack([tx, tz, tx])  # [3, B, J] width-axis targets
    th = jnp.stack([ty, ty, tz])  # [3, B, J] height-axis targets
    return _js_vs_gauss(stacked, tw, th, sigma)


def _js_vs_gauss(p: jax.Array, tw: jax.Array, th: jax.Array, sigma) -> jax.Array:
    """JS divergence of [S, B, H, W, J] heatmaps against separable Gaussians
    centred at (tw, th) [S, B, J] per plane. Returns [S, B, J].

    Gaussian convention + eps shared with ops.dsnt (gauss_axis_coeff /
    DIVERGENCE_EPS); targets are constants like every divergence loss in
    the framework (see ops.dsnt._divergence_reg_losses)."""
    _, _, h, w, _ = p.shape
    from margipose_tpu.ops.dsnt import (
        DIVERGENCE_EPS as _EPS,
        gauss_axis_coeff,
        normalized_linspace,
    )

    tw = jax.lax.stop_gradient(tw)
    th = jax.lax.stop_gradient(th)
    cw = normalized_linspace(w, p.dtype)
    ch = normalized_linspace(h, p.dtype)
    gw = jnp.exp(gauss_axis_coeff(w, sigma)
                 * (cw[:, None] - tw[:, :, None, :]) ** 2)  # [S,B,W,J]
    gh = jnp.exp(gauss_axis_coeff(h, sigma)
                 * (ch[:, None] - th[:, :, None, :]) ** 2)  # [S,B,H,J]
    q = gh[:, :, :, None, :] * gw[:, :, None, :, :]  # [S,B,H,W,J]
    q = q / (jnp.sum(q, axis=(2, 3), keepdims=True) + _EPS)

    m = 0.5 * (p + q)
    log_m = jnp.log(m + _EPS)
    kl_pm = jnp.sum(p * (jnp.log(p + _EPS) - log_m), axis=(2, 3))
    kl_qm = jnp.sum(q * (jnp.log(q + _EPS) - log_m), axis=(2, 3))
    return 0.5 * kl_pm + 0.5 * kl_qm  # [S, B, J]


def _stacked_stage_terms(stacked, target_xyz, pixelwise_loss, sigma=1.0):
    """Loss ingredients for one stage of [3, B, H, W, J] heatmaps:
    (px [3, B, J], actual_xy [B, J, 2], actual_xyz [B, J, 3])."""
    ew, eh = _stacked_expectations(stacked)
    actual_xy = jnp.stack([ew[0], eh[0]], axis=-1)
    actual_xyz = jnp.stack([ew[0], eh[0], 0.5 * (ew[1] + eh[2])], axis=-1)
    if pixelwise_loss == 'jsd':
        px = _stacked_js(stacked, target_xyz, sigma)
    elif pixelwise_loss is None:
        px = jnp.zeros(
            (3,) + stacked.shape[1:2] + stacked.shape[-1:], stacked.dtype)
    else:
        raise ValueError(f'unrecognised pixelwise loss: {pixelwise_loss}')
    return px, actual_xy, actual_xyz


def margipose_2d_losses(out: ModelOutput, target: jax.Array,
                        pixelwise_loss: str | None = 'jsd',
                        use_fused: bool | None = None) -> jax.Array:
    """Per-joint 2D losses summed over stages [B, J]
    (reference: src/margipose/models/margipose_model.py:223-234)."""
    target_xy = target[..., :2]
    pad = jnp.zeros_like(target_xy[..., :1])
    losses = 0.0
    if out.stacked:
        # Only the xy plane contributes to the 2D loss (reference:
        # src/margipose/models/margipose_model.py:223-234), so render/reduce
        # the JSD for that single plane rather than all three.
        tw = target_xy[None, ..., 0]
        th = target_xy[None, ..., 1]
        for s in out.stacked:
            ew, eh = _stacked_expectations(s[0:1])
            cxy = jnp.stack([ew[0], eh[0]], axis=-1)
            if pixelwise_loss == 'jsd':
                losses += _js_vs_gauss(s[0:1], tw, th, 1.0)[0]
            elif pixelwise_loss is not None:
                raise ValueError(f'unrecognised pixelwise loss: {pixelwise_loss}')
            losses += euclidean_losses(cxy, target_xy)
        return losses
    for px_xy, _, _, cxy, _ in _stage_components(
            out, jnp.concatenate([target_xy, pad], axis=-1),
            pixelwise_loss, use_fused):
        losses += px_xy + euclidean_losses(cxy, target_xy)
    return losses


def margipose_3d_losses(out: ModelOutput, target: jax.Array,
                        pixelwise_loss: str | None = 'jsd',
                        use_fused: bool | None = None) -> jax.Array:
    """Per-joint 3D losses summed over stages [B, J]
    (reference: src/margipose/models/margipose_model.py:236-252)."""
    target_xyz = target[..., :3]
    losses = 0.0
    if out.stacked:
        for s in out.stacked:
            px, _, actual_xyz = _stacked_stage_terms(s, target_xyz, pixelwise_loss)
            losses += jnp.sum(px, axis=0) + euclidean_losses(actual_xyz, target_xyz)
        return losses
    for px_xy, px_zy, px_xz, _, actual_xyz in _stage_components(
            out, target_xyz, pixelwise_loss, use_fused):
        losses += px_xy + px_zy + px_xz + euclidean_losses(actual_xyz, target_xyz)
    return losses


def margipose_masked_loss(out: ModelOutput, target: jax.Array, joint_mask: jax.Array,
                          valid_depth: jax.Array,
                          pixelwise_loss: str | None = 'jsd',
                          use_fused: bool | None = None,
                          axis_name: str | None = None) -> jax.Array:
    """Vectorised per-example 3D/2D loss switch + masked mean — replaces the
    reference's Python-level per-example branch
    (reference: src/margipose/bin/train_3d.py:126-142).

    The per-plane DSNT/JSD components are computed once and assembled into
    both the 3D and 2D variants (the xy terms are shared), rather than
    running the two loss heads independently.
    """
    target_xyz = target[..., :3]
    target_xy = target_xyz[..., 0:2]
    losses_3d = 0.0
    losses_2d = 0.0
    if out.stacked:
        for s in out.stacked:
            px, cxy, actual_xyz = _stacked_stage_terms(s, target_xyz, pixelwise_loss)
            losses_3d += jnp.sum(px, axis=0) + euclidean_losses(actual_xyz, target_xyz)
            losses_2d += px[0] + euclidean_losses(cxy, target_xy)
    else:
        for px_xy, px_zy, px_xz, cxy, actual_xyz in _stage_components(
                out, target_xyz, pixelwise_loss, use_fused):
            losses_3d += px_xy + px_zy + px_xz + euclidean_losses(actual_xyz, target_xyz)
            losses_2d += px_xy + euclidean_losses(cxy, target_xy)
    losses = jnp.where(valid_depth[:, None] == 1, losses_3d, losses_2d)
    return average_loss(losses, joint_mask, axis_name=axis_name)
