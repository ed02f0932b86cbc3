#!/usr/bin/env python3
"""Export a trained model for sharing
(reference: src/margipose/bin/export_model.py).

Formats:
  * ``native``: an Orbax weights-only checkpoint (optimiser state stripped) —
    the analogue of the reference's re-saved .pth;
  * ``stablehlo``: serialized StableHLO of the jitted forward pass via
    jax.export — the analogue of the reference's ONNX export;
  * ``torch``: a reference-format ``.pth`` (torch pickle with
    ``{state_dict, model_desc, train_datasets, epoch}``) loadable by the
    original PyTorch implementation with ``strict=True`` — the inverse of
    the importer.

Inputs may be margipose_tpu checkpoints or reference .pth files.
"""

from __future__ import annotations

import argparse
import sys

from margipose_tpu.utils import init_algorithms, seed_all


def parse_args(argv):
    parser = argparse.ArgumentParser(description='3D pose estimation model exporter')
    parser.add_argument('-i', '--input', type=str, metavar='FILE', required=True,
                        help='path to input model (.pth or orbax dir)')
    parser.add_argument('-o', '--output', type=str, metavar='PATH', required=True,
                        help='desired output path')
    parser.add_argument('-f', '--format', type=str, default='native',
                        choices=['native', 'stablehlo', 'torch'],
                        help='format of output model')
    return parser.parse_args(argv[1:])


def export_stablehlo(model, variables, model_desc, output):
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    from margipose_tpu.models import data_specs_for_desc

    specs = data_specs_for_desc(model_desc).input_specs

    def forward(images):
        xyz, _ = model.apply(variables, images, train=False)
        return xyz

    dummy = jnp.zeros((1, specs.height, specs.width, 3), jnp.float32)
    exported = jax_export.export(jax.jit(forward))(dummy)
    with open(output, 'wb') as f:
        f.write(exported.serialize())
    print(f'wrote StableHLO export to {output} '
          f'({exported.in_avals} -> {exported.out_avals})')


def main(argv=None):
    args = parse_args(argv or sys.argv)
    seed_all(12345)
    init_algorithms(deterministic=True)

    from margipose_tpu.train.checkpoint import load_model, save_model

    model, variables, model_desc = load_model(args.input)

    if args.format == 'native':
        save_model(args.output, variables, model_desc)
        print(f'wrote weights-only checkpoint to {args.output}')
    elif args.format == 'stablehlo':
        export_stablehlo(model, variables, model_desc, args.output)
    elif args.format == 'torch':
        import torch

        from margipose_tpu.train.torch_import import export_state_dict

        sd = {k: torch.from_numpy(v.copy()) if v.ndim else torch.tensor(v)
              for k, v in export_state_dict(variables).items()}
        torch.save({'state_dict': sd, 'model_desc': model_desc,
                    'train_datasets': [], 'epoch': 0}, args.output)
        print(f'wrote reference-format torch checkpoint to {args.output}')


if __name__ == '__main__':
    main()
