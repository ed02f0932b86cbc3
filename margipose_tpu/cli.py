"""Root CLI plumbing (reference: src/margipose/cli.py:7-38).

The reference's global ``--device`` flag selects a CUDA device; here it
selects the JAX platform ('tpu' / 'cpu', default: best available).
"""

from __future__ import annotations

import argparse
import sys


def create_common_arg_parser():
    parser = argparse.ArgumentParser(
        prog='margipose', formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument(
        '--device', default='auto',
        help='computation platform: "auto", "tpu", or "cpu"')
    return parser


def apply_device_option(device: str):
    """Must run before any jax computation."""
    if device and device != 'auto':
        import jax

        platform = device.split(':')[0]
        if platform in ('cuda', 'gpu'):
            platform = 'cpu'  # no CUDA in a TPU deployment; fall back
        jax.config.update('jax_platforms', platform)


def common_args_to_opts(common_args):
    return dict(device=common_args.device)


class Subcommand:
    def __init__(self, name, func, help=None):
        self.name = name
        self.func = func
        self.help = help

    def run(self, argv=None, common_args=None):
        if argv is None:
            argv = sys.argv
        if common_args is None:
            common_args = create_common_arg_parser().parse_args([])
        opts = common_args_to_opts(common_args)
        apply_device_option(opts['device'])
        return self.func(argv, opts)
