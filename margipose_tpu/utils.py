"""Misc utilities: seeding, timers, skeleton drawing.

(reference: src/margipose/utils.py:12-234)
"""

from __future__ import annotations

import random

import numpy as np
import PIL.Image
import PIL.ImageDraw


def seed_all(seed: int):
    """Seed host-side RNGs (reference: src/margipose/utils.py:12-16). Device
    randomness in JAX is explicit (PRNG keys), so nothing global to seed there."""
    random.seed(seed)
    np.random.seed(seed)


def init_algorithms(deterministic: bool = False):
    """XLA compilation is deterministic by construction; kept for CLI parity
    (reference: src/margipose/utils.py:19-24)."""
    return None


def joint_colour(joint_names, hflip_indices, j):
    """Left/right/centre joint colouring
    (reference: src/margipose/utils.py:27-38)."""
    if hflip_indices[j] == j:
        return (255, 215, 0)  # centre: gold
    if 'left' in joint_names[j]:
        return (255, 60, 60)  # left: red
    return (60, 60, 255)  # right: blue


def draw_skeleton_2d(img: PIL.Image.Image, skel2d, skel_desc, width=2):
    """Draw a 2D skeleton over a PIL image in place
    (reference: src/margipose/utils.py:198-215)."""
    draw = PIL.ImageDraw.Draw(img)
    skel2d = np.asarray(skel2d)
    for j, parent in enumerate(skel_desc.joint_tree):
        if j == parent:
            continue
        colour = joint_colour(skel_desc.joint_names, skel_desc.hflip_indices, j)
        draw.line(
            [tuple(skel2d[j][:2]), tuple(skel2d[parent][:2])],
            fill=colour, width=width,
        )
    return img


def plot_skeleton_on_axes3d(skel, skel_desc, ax, invert=True, alpha=1.0):
    """3D matplotlib skeleton plot (reference: src/margipose/utils.py:124-170).

    ``alpha`` dims a skeleton so prediction (opaque) and ground truth
    (translucent) can share one axes, as the reference GUI's 3D pane does
    (reference: src/margipose/bin/run_gui.py:262-270)."""
    skel = np.asarray(skel)
    for j, parent in enumerate(skel_desc.joint_tree):
        if j == parent:
            continue
        colour = np.asarray(
            joint_colour(skel_desc.joint_names, skel_desc.hflip_indices, j)
        ) / 255.0
        xs = [skel[j, 0], skel[parent, 0]]
        ys = [skel[j, 1], skel[parent, 1]]
        zs = [skel[j, 2], skel[parent, 2]]
        # plot with z up-ish: use (x, z, -y) so the person stands upright
        ax.plot(xs, zs, [-y for y in ys], color=tuple(colour), alpha=alpha)
    ax.set_xlabel('x')
    ax.set_ylabel('z')
    ax.set_zlabel('-y')
    if invert:
        ax.invert_zaxis() if hasattr(ax, 'invert_zaxis') else None
    return ax
