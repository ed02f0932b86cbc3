#!/usr/bin/env python3
"""Perform 3D pose inference on a single image
(reference: src/margipose/bin/infer_single.py).

The image is assumed to be centred on a human subject. The skeleton is shown
in normalized form. Output goes to ``--out-file`` (PNG) when given or when no
display is available; otherwise a matplotlib window opens.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import PIL.Image

from margipose_tpu.cli import Subcommand
from margipose_tpu.data.specs import ImageSpecs
from margipose_tpu.geometry.coords import ensure_cartesian
from margipose_tpu.geometry.skeleton import CanonicalSkeletonDesc
from margipose_tpu.models import data_specs_for_desc, default_data_specs
from margipose_tpu.train.checkpoint import load_model
from margipose_tpu.utils import init_algorithms, plot_skeleton_on_axes3d, seed_all


def parse_args(argv):
    parser = argparse.ArgumentParser(
        prog='margipose-infer', description='3D human pose inference',
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument('--model', type=str, metavar='FILE', required=True,
                        help='path to model file (.pth or orbax dir)')
    parser.add_argument('--image', type=str, metavar='FILE', required=True,
                        help='image file to infer pose from')
    parser.add_argument('--out-file', type=str, metavar='FILE', default=None,
                        help='write the visualisation to this PNG instead of showing')
    parser.add_argument('--multicrop', action='store_true',
                        help='average predictions over 10 crops (2 flips x 5 '
                             'offsets). The reference declares this flag but '
                             'asserts it is unimplemented (reference: '
                             'src/margipose/bin/infer_single.py:56); here it '
                             'works, mirroring the eval multicrop scheme.')
    return parser.parse_args(argv[1:])


# The eval multicrop scheme (reference: src/margipose/data/mpi_inf_3dhp/
# __init__.py:332-360): 2 horizontal flips x 5 crop-centre offsets of 8 px.
_MULTICROP_FLIPS = (False, True)
_MULTICROP_OFFSETS = ((0, 0), (-8, 0), (0, -8), (8, 0), (0, 8))


def _multicrop_affines(base: np.ndarray, w: int) -> np.ndarray:
    """10 source->output affines: T(offset) then hflip about the output
    canvas, composed onto the base aspect-fit affine."""
    affines = []
    for flip in _MULTICROP_FLIPS:
        for dx, dy in _MULTICROP_OFFSETS:
            a = np.array([[1, 0, dx], [0, 1, dy], [0, 0, 1]],
                         np.float32) @ base
            if flip:
                a = np.array([[-1, 0, w], [0, 1, 0], [0, 0, 1]],
                             np.float32) @ a
            affines.append(a)
    return np.stack(affines).astype(np.float32)


def _merge_multicrop(preds: np.ndarray, w: int, h: int,
                     hflip_indices) -> np.ndarray:
    """Back-map each crop's normalized prediction into the base frame and
    average — the no-camera analogue of the eval path's untransform-then-mean
    over crops (margipose_tpu/bin/eval_3d.py). Undo the flip first (negate x,
    swap left/right joints: the corner-convention hflip is exactly x -> -x in
    normalized coords), then the offset (2*d/size in normalized units)."""
    merged = []
    i = 0
    for flip in _MULTICROP_FLIPS:
        for dx, dy in _MULTICROP_OFFSETS:
            p = np.array(preds[i], np.float64)
            i += 1
            if flip:
                p = p[list(hflip_indices)]
                p[:, 0] = -p[:, 0]
            p[:, 0] -= 2.0 * dx / w
            p[:, 1] -= 2.0 * dy / h
            merged.append(p)
    return np.mean(merged, axis=0)


def infer_image(model, variables, image: PIL.Image.Image, model_desc=None,
                multicrop: bool = False):
    """Resize + normalise (on device) + forward.
    Returns (input_array, coords [17,3]). With ``multicrop``, forwards all
    10 crops as one batch and returns the crop-averaged coords (the input
    array returned is the base, unshifted/unflipped crop)."""
    import jax
    import jax.numpy as jnp

    from margipose_tpu.ops.image import device_augment

    specs = data_specs_for_desc(model_desc) if model_desc else default_data_specs()
    input_specs: ImageSpecs = specs.input_specs
    w, h = input_specs.width, input_specs.height

    # Thumbnail scale factor (preserve aspect, fit within the model input,
    # content at the top-left like the reference's image.thumbnail + paste).
    image = image.convert('RGB')
    # The device warp is single-tap bilinear; for large photos (scale < 0.5)
    # that aliases badly vs the reference's antialiased thumbnail, so
    # area-average on the host first. The factor comes from the BINDING
    # aspect-fit ratio (the one the final scale uses), so the remaining
    # bilinear scale lands in (0.5, 1.0] — alias-free — for non-square
    # images too (e.g. 2048x768 -> reduce(8) -> residual scale 1.0).
    fit_scale = min(w / image.width, h / image.height, 1.0)
    reduce_factor = int(1.0 / fit_scale)
    if reduce_factor > 1:
        image = image.reduce(reduce_factor)
    src = np.asarray(image, np.float32) / 255.0
    scale = min(w / src.shape[1], h / src.shape[0], 1.0)
    base_affine = np.array(
        [[scale, 0.0, 0.0], [0.0, scale, 0.0], [0.0, 0.0, 1.0]],
        np.float32)
    affines = (_multicrop_affines(base_affine, w) if multicrop
               else base_affine[None])

    @jax.jit
    def forward(raw, affines):
        # resize + ImageNet-normalise fused into the same XLA program as
        # the model forward (margipose_tpu/ops/image.py)
        n = affines.shape[0]
        inp = device_augment(jnp.broadcast_to(raw[None], (n,) + raw.shape),
                             affines, h, w,
                             brightness=1.0, contrast=1.0, saturation=1.0,
                             hue=0.0, mean=input_specs.mean, std=input_specs.stddev)
        xyz, _ = model.apply(variables, inp, train=False)
        return inp[0], xyz

    inp, preds = forward(jnp.asarray(src), jnp.asarray(affines))
    if multicrop:
        from margipose_tpu.geometry.skeleton import CanonicalSkeletonDesc

        output = _merge_multicrop(np.asarray(preds), w, h,
                                  CanonicalSkeletonDesc.hflip_indices)
    else:
        output = np.asarray(preds[0], dtype=np.float64)
    return np.asarray(inp), output


def main(argv, common_opts):
    args = parse_args(argv)
    seed_all(12345)
    init_algorithms(deterministic=True)

    model, variables, model_desc = load_model(args.model)
    image = PIL.Image.open(args.image, 'r')
    inp, output = infer_image(model, variables, image, model_desc,
                              multicrop=args.multicrop)

    norm_skel3d = ensure_cartesian(output, d=3)
    print('Normalized skeleton coordinates:')
    for name, xyz in zip(CanonicalSkeletonDesc.joint_names, norm_skel3d):
        print(f'  {name:16s} {xyz[0]:+.4f} {xyz[1]:+.4f} {xyz[2]:+.4f}')

    out_file = args.out_file
    if out_file is None and not os.environ.get('DISPLAY'):
        out_file = 'inference.png'

    import matplotlib

    if out_file:
        matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(16, 8))
    ax1 = fig.add_subplot(1, 2, 1)
    ax2 = fig.add_subplot(1, 2, 2, projection='3d')
    ax1.imshow(data_specs_for_desc(model_desc).input_specs.unconvert(inp))
    plot_skeleton_on_axes3d(norm_skel3d, CanonicalSkeletonDesc, ax2, invert=True)
    if out_file:
        fig.savefig(out_file, dpi=100)
        print(f'wrote {out_file}')
    else:
        plt.show()


Infer_Subcommand = Subcommand(name='infer', func=main,
                              help='infer 3D pose for single image')

if __name__ == '__main__':
    Infer_Subcommand.run()
