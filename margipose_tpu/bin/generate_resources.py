#!/usr/bin/env python3
"""Generate procedural augmentation assets into ``resources/``.

The reference ships 16 background photos and 8 clothing-texture images used
by the MPI-INF-3DHP compositing augmentations
(reference: src/margipose/data/mpi_inf_3dhp/__init__.py:89-122 globbing
``resources/{backgrounds,textures}``). Those binary assets are not
redistributed here; this tool synthesises deterministic stand-ins with
similar statistics (textured colour fields for backgrounds, grayscale
patterns for clothing textures) plus a demo figure image for
``margipose infer``. Users with the original assets can simply place them
in ``resources/`` instead (or point MARGIPOSE_RESOURCES_DIR at them).
"""

from __future__ import annotations

import argparse
from os import makedirs, path

import numpy as np
import PIL.Image
import PIL.ImageDraw


def _perlin_like(rng: np.random.RandomState, size: int, octaves=(4, 8, 16, 32)):
    """Smooth multi-octave noise field in [0, 1]."""
    acc = np.zeros((size, size), np.float64)
    amp = 1.0
    total = 0.0
    for cells in octaves:
        coarse = rng.uniform(0, 1, (cells, cells))
        img = PIL.Image.fromarray((coarse * 255).astype(np.uint8), "L").resize(
            (size, size), PIL.Image.BILINEAR)
        acc += amp * (np.asarray(img, np.float64) / 255.0)
        total += amp
        amp *= 0.6
    return acc / total


def make_background(seed: int, size: int = 512) -> PIL.Image.Image:
    """A colourful smooth scene-like field (stands in for a room photo)."""
    rng = np.random.RandomState(1000 + seed)
    base = np.stack([_perlin_like(rng, size) for _ in range(3)], axis=-1)
    tint = rng.uniform(0.3, 1.0, (1, 1, 3))
    offset = rng.uniform(0.0, 0.4, (1, 1, 3))
    img = np.clip(base * tint + offset, 0, 1)
    # horizon gradient for a vaguely indoor look
    grad = np.linspace(rng.uniform(0.7, 1.0), rng.uniform(0.4, 0.7), size)
    img *= grad[:, None, None]
    return PIL.Image.fromarray((img * 255).astype(np.uint8), "RGB")


def make_texture(seed: int, size: int = 256) -> PIL.Image.Image:
    """Grayscale clothing-like texture (stripes / checks / noise weave)."""
    rng = np.random.RandomState(2000 + seed)
    kind = seed % 3
    y, x = np.mgrid[0:size, 0:size] / size
    if kind == 0:  # stripes
        freq = rng.randint(6, 24)
        angle = rng.uniform(0, np.pi)
        phase = np.cos(angle) * x + np.sin(angle) * y
        img = 0.5 + 0.35 * np.sin(2 * np.pi * freq * phase)
    elif kind == 1:  # checks
        fx, fy = rng.randint(4, 16, 2)
        img = 0.5 + 0.25 * np.sign(np.sin(2 * np.pi * fx * x) *
                                   np.sin(2 * np.pi * fy * y))
    else:  # noise weave
        img = _perlin_like(rng, size, octaves=(8, 32, 64))
    img = np.clip(img + rng.uniform(-0.05, 0.05, img.shape), 0, 1)
    return PIL.Image.fromarray((img * 255).astype(np.uint8), "L")


def make_demo_figure(size: int = 512) -> PIL.Image.Image:
    """A simple rendered 'person running' silhouette on a textured ground —
    demo input for ``margipose infer`` (stands in for man_running.jpg)."""
    img = make_background(999, size).convert("RGB")
    draw = PIL.ImageDraw.Draw(img)
    cx, cy = size // 2, size // 2
    s = size / 512.0
    skin = (196, 154, 120)
    shirt = (180, 40, 40)
    pants = (40, 60, 140)

    def seg(x0, y0, x1, y1, w, fill):
        draw.line([cx + x0 * s, cy + y0 * s, cx + x1 * s, cy + y1 * s],
                  fill=fill, width=int(w * s))

    draw.ellipse([cx - 22 * s, cy - 160 * s, cx + 22 * s, cy - 116 * s],
                 fill=skin)                       # head
    seg(0, -116, 0, -20, 34, shirt)               # torso
    seg(0, -100, -55, -60, 16, shirt)             # rear arm
    seg(-55, -60, -80, -100, 14, skin)
    seg(0, -100, 50, -70, 16, shirt)              # front arm
    seg(50, -70, 85, -40, 14, skin)
    seg(0, -20, -45, 50, 20, pants)               # rear leg
    seg(-45, 50, -60, 120, 16, pants)
    seg(0, -20, 50, 30, 20, pants)                # front leg
    seg(50, 30, 45, 110, 16, pants)
    return img


def generate(out_dir: str, n_backgrounds=16, n_textures=8, verbose=True):
    bg_dir = path.join(out_dir, "backgrounds")
    tex_dir = path.join(out_dir, "textures")
    makedirs(bg_dir, exist_ok=True)
    makedirs(tex_dir, exist_ok=True)
    for i in range(n_backgrounds):
        make_background(i).save(path.join(bg_dir, f"synthetic{i:02d}.jpg"),
                                quality=88)
    for i in range(n_textures):
        make_texture(i).save(path.join(tex_dir, f"synthetic{i:02d}.png"))
    make_demo_figure().save(path.join(out_dir, "man_running.jpg"), quality=90)
    if verbose:
        print(f"wrote {n_backgrounds} backgrounds, {n_textures} textures, "
              f"man_running.jpg to {out_dir}")


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out-dir", default="resources")
    args = parser.parse_args(argv)
    generate(args.out_dir)


if __name__ == "__main__":
    main()
