"""End-to-end CLI smoke tests on the synthetic dataset (CPU, tiny configs)."""

import json
import sys
from os import path
from time import perf_counter

import numpy as np
import pytest


@pytest.fixture(scope='module')
def trained_ckpt(tmp_path_factory):
    """Train 2 tiny epochs on synthetic data via the real training entry.

    Uses the input_size=96 smoke setting so CPU XLA compiles stay fast."""
    from margipose_tpu.bin.train_3d import ex, run_training

    out_dir = str(tmp_path_factory.mktemp('train_out'))
    cfg = ex.parse([
        'with', 'synthetic', 'sgd_simple',
        f'out_dir={out_dir}', 'epochs=2', 'batch_size=8',
        'train_examples=16', 'val_examples=8', 'lr=0.02',
        'num_workers=2', 'metrics_every=1', 'experiment_id=test',
        "model_desc={'type': 'margipose', 'version': '6.0.1', "
        "'settings': {'n_stages': 1, 'feature_extractor': 'resnet18', "
        "'input_size': 96}}",
        'train_datasets=["synthetic-16"]', 'val_datasets=["synthetic-8"]',
        'use_aug=False',
    ])
    result = run_training(cfg)
    assert result['train_pck'] is not None
    ckpt_dir = path.join(out_dir, 'test', 'model-latest')
    assert path.isdir(ckpt_dir)
    assert path.isfile(path.join(out_dir, 'test', 'config.json'))
    assert path.isfile(path.join(out_dir, 'test', 'metrics.jsonl'))
    # TensorBoard scalar events (the Showoff-dashboard replacement,
    # SURVEY.md §5.5)
    import glob

    assert glob.glob(path.join(out_dir, 'test', 'tb', 'events.out.tfevents*'))
    return ckpt_dir


@pytest.mark.slow  # 299s measured (r4 durations profile)
def test_chatterbox_train_eval_cli(tmp_path, capsys):
    """End-to-end train + eval through the product surface for the SECOND
    model family: `train with chatterbox_model` then `eval` on the saved
    checkpoint. Chatterbox requires 256px input (its down/up head geometry
    hardcodes 32x32 heatmaps — reference:
    src/margipose/models/chatterbox_model.py:86-220), so this uses a
    minimal 1-batch epoch to bound CPU compile+run time."""
    from margipose_tpu.bin.eval_3d import main as eval_main
    from margipose_tpu.bin.train_3d import ex, run_training

    out_dir = str(tmp_path / 'cb')
    cfg = ex.parse([
        'with', 'synthetic', 'sgd_simple', 'chatterbox_model',
        f'out_dir={out_dir}', 'epochs=1', 'batch_size=8',
        'train_examples=8', 'val_examples=0', 'lr=0.02',
        'num_workers=0', 'metrics_every=1', 'experiment_id=cb',
        'train_datasets=["synthetic-8"]', 'val_datasets=[]',
        'use_aug=False',
    ])
    result = run_training(cfg)
    assert np.isfinite(result['train_mpjpe'])
    ckpt = path.join(out_dir, 'cb', 'model-latest')

    eval_main(['eval', '--model', ckpt, '--dataset', 'synthetic-2',
               '--batch-size', '2'], {'device': 'auto'})
    out = capsys.readouterr().out
    assert 'Overall' in out and 'median inference time' in out


def test_train_and_checkpoint(trained_ckpt):
    from margipose_tpu.train.checkpoint import load_meta

    meta = load_meta(trained_ckpt)
    assert meta['epoch'] == 2
    assert meta['model_desc']['type'] == 'margipose'


def test_eval_cli(trained_ckpt, capsys):
    from margipose_tpu.bin.eval_3d import main as eval_main

    eval_main(['eval', '--model', trained_ckpt, '--dataset', 'synthetic-4'],
              {'device': 'auto'})
    out = capsys.readouterr().out
    assert 'Overall' in out
    assert 'mpjpe' in out


def test_eval_cli_multicrop(trained_ckpt, capsys):
    from margipose_tpu.bin.eval_3d import main as eval_main

    eval_main(['eval', '--model', trained_ckpt, '--dataset', 'synthetic-2',
               '--multicrop'], {'device': 'auto'})
    out = capsys.readouterr().out
    assert 'Overall' in out


def test_infer_cli(trained_ckpt, tmp_path):
    import PIL.Image

    from margipose_tpu.bin.infer_single import main as infer_main
    from margipose_tpu.data.synthetic import SyntheticPoseDataset

    # render a synthetic person image to infer on
    ds = SyntheticPoseDataset(length=1)
    img = ds.input_to_pil_image(ds[0]['input'])
    img_file = str(tmp_path / 'person.png')
    img.save(img_file)
    out_file = str(tmp_path / 'result.png')

    infer_main(['infer', '--model', trained_ckpt, '--image', img_file,
                '--out-file', out_file], {'device': 'auto'})
    assert path.isfile(out_file)


def test_gui_html_export(trained_ckpt, tmp_path):
    from margipose_tpu.bin.run_gui import main as gui_main

    out_file = str(tmp_path / 'report.html')
    gui_main(['gui', '--model', trained_ckpt, '--dataset', 'synthetic-2',
              '--export-html', out_file, '--examples', '2'], {'device': 'auto'})
    html = open(out_file).read()
    assert 'MPJPE' in html and 'base64' in html
    # Per-joint heatmap selector + Procrustes toggle (reference GUI parity;
    # reference: src/margipose/bin/run_gui.py:103-404): one strip per joint
    # behind a <select>, and both plain & aligned metric variants.
    from margipose_tpu.geometry.skeleton import CanonicalSkeletonDesc

    n_joints = len(CanonicalSkeletonDesc.joint_names)
    assert f'hm-{n_joints - 1}' in html
    assert '<select id="joint">' in html
    assert CanonicalSkeletonDesc.joint_names[3] in html
    assert 'id="aligned"' in html and 'class="aligned"' in html
    # 3D skeleton pane (reference: src/margipose/bin/run_gui.py:249-278):
    # pred-vs-GT wireframes, with a Procrustes-aligned variant behind the
    # toggle
    assert '3D: prediction opaque, ground truth translucent' in html
    assert html.count('class="aligned"') >= 2  # metrics + aligned 3D pane


def test_eval_uint8_shipping_is_lossless():
    """ImageSpecs.requantize must recover the exact source uint8 pixels from
    a normalised input, and device_renormalize (the single device-side
    inverse every uint8-shipping path uses) must reproduce the float32 input
    (4x transfer saving at zero numeric cost)."""
    import jax.numpy as jnp

    from margipose_tpu.data.specs import device_renormalize
    from margipose_tpu.data.synthetic import SyntheticPoseDataset

    ds = SyntheticPoseDataset(length=1, use_aug=False)
    s = ds[0]
    spec = ds.data_specs.input_specs
    u8 = spec.requantize(s['input'])
    assert u8.dtype == np.uint8
    renorm = np.asarray(device_renormalize(jnp.asarray(u8), spec))
    np.testing.assert_allclose(renorm, s['input'], atol=3e-6)


def test_config_parsing():
    from margipose_tpu.bin.train_3d import ex

    cfg = ex.parse(['with', 'margipose_model', 'quick', 'epochs=3',
                    'lr=0.5', 'tags=["a"]'])
    assert cfg['epochs'] == 3
    assert cfg['lr'] == 0.5
    assert cfg['quick'] is True
    assert cfg['model_desc']['type'] == 'margipose'
    with pytest.raises(SystemExit):
        ex.parse(['with', 'definitely_not_a_config'])


def test_config_dict_override_deep_merges():
    """The README's documented invocation — a dict-valued model_desc override
    after a named config — must deep-merge sacred-style, not replace
    (reference: src/margipose/bin/train_3d.py:229-264, README.md:84-91)."""
    from margipose_tpu.bin.train_3d import ex

    cfg = ex.parse(['with', 'margipose_model', 'mpi3d',
                    "model_desc={'settings': {'pixelwise_loss': None}}"])
    desc = cfg['model_desc']
    # the named config's identity fields survive the override...
    assert desc['type'] == 'margipose'
    assert desc['version']
    # ...sibling settings survive...
    assert desc['settings']['n_stages'] == 4
    assert desc['settings']['feature_extractor'] == 'inceptionv4'
    # ...and the overridden key lands
    assert desc['settings']['pixelwise_loss'] is None
    # dotted-path variant merges the same way
    cfg2 = ex.parse(['with', 'margipose_model',
                     "model_desc.settings={'n_stages': 2}"])
    assert cfg2['model_desc']['settings']['n_stages'] == 2
    assert cfg2['model_desc']['settings']['feature_extractor'] == 'inceptionv4'
    # non-dict overrides still replace wholesale
    cfg3 = ex.parse(['with', 'margipose_model', 'epochs=7'])
    assert cfg3['epochs'] == 7
    # a dotted path through a scalar fails loudly instead of silently
    # replacing the scalar with a dict
    with pytest.raises(TypeError, match='epochs'):
        ex.parse(['with', 'margipose_model', 'epochs.max=5'])


def test_export_cli(trained_ckpt, tmp_path):
    """Export smoke tests — the analogue of the reference's ONNX export test
    (reference: tests/test_onnx.py): native weights-only re-save and a
    StableHLO serialisation of the jitted forward, both reloadable."""
    from margipose_tpu.bin.export_model import main as export_main

    native_out = str(tmp_path / 'exported')
    export_main(['export', '-i', trained_ckpt, '-o', native_out, '-f', 'native'])
    from margipose_tpu.train.checkpoint import load_model

    model, variables, model_desc = load_model(native_out)
    assert model_desc['type'] == 'margipose'

    hlo_out = str(tmp_path / 'model.stablehlo')
    export_main(['export', '-i', trained_ckpt, '-o', hlo_out, '-f', 'stablehlo'])
    from jax import export as jax_export
    import jax.numpy as jnp

    with open(hlo_out, 'rb') as f:
        exported = jax_export.deserialize(bytearray(f.read()))
    out = exported.call(jnp.zeros((1, 96, 96, 3), jnp.float32))
    assert out.shape == (1, 17, 3)
    assert np.isfinite(np.asarray(out)).all()

    # reference-format torch .pth export round-trips through the importer
    pth_out = str(tmp_path / 'model.pth')
    export_main(['export', '-i', trained_ckpt, '-o', pth_out, '-f', 'torch'])
    import torch

    ckpt = torch.load(pth_out, map_location='cpu', weights_only=False)
    assert ckpt['model_desc']['type'] == 'margipose'
    assert 'inner.in_cnn.0.weight' in ckpt['state_dict']
    model2, vars2, desc2 = load_model(pth_out)
    native_vars = load_model(trained_ckpt)[1]
    a = np.asarray(vars2['params']['inner']['in_cnn']['0']['weight'])
    b = np.asarray(native_vars['params']['inner']['in_cnn']['0']['weight'])
    np.testing.assert_allclose(a, b, atol=0)


@pytest.mark.slow  # 153s measured (r4 durations profile)
def test_hyperparams_cli(tmp_path, capsys):
    """LR range search end-to-end on synthetic data: geometric lr sweep,
    EMA-smoothed losses, CSV + PNG artifacts
    (reference: src/margipose/bin/hyperparam_search.py:72-171)."""
    from margipose_tpu.bin.hyperparam_search import ex as hp_ex, run_lr_range_test

    out_dir = str(tmp_path / 'out')
    cfg = hp_ex.parse([
        'with', 'synthetic', f'out_dir={out_dir}', 'batch_size=4',
        'max_iters=6', 'num_workers=0', 'use_aug=False',
        'lr_min=1e-4', 'lr_max=0.1',
        "model_desc={'type': 'margipose', 'version': '6.0.1', "
        "'settings': {'n_stages': 1, 'feature_extractor': 'resnet18', "
        "'input_size': 96}}",
        'train_datasets=["synthetic-24"]',
    ])
    out = run_lr_range_test(cfg)
    assert 0 < len(out['lrs']) <= 6
    assert len(out['losses']) == len(out['lrs'])
    # geometric sweep from lr_min towards lr_max
    assert out['lrs'] == sorted(out['lrs'])
    assert abs(out['lrs'][0] - 1e-4) < 1e-8
    assert all(np.isfinite(v) for v in out['losses'])
    import glob

    assert glob.glob(path.join(out_dir, 'lrfind-*', 'lr_curve.csv'))
    assert glob.glob(path.join(out_dir, 'lrfind-*', 'lr_curve.png'))


def test_calc_dataloader_stats_cli(tmp_path, capsys):
    """Dataloader statistics tool end-to-end on synthetic data
    (reference: src/margipose/bin/calc_dataloader_stats.py:70-153)."""
    from margipose_tpu.bin.calc_dataloader_stats import main as stats_main

    out_file = str(tmp_path / 'stats.png')
    stats_main(['stats', '--dataset', 'synthetic-16', '--batch-size', '8',
                '--examples', '16', '--out-file', out_file])
    out = capsys.readouterr().out
    assert 'target_x' in out and 'pixels' in out
    # 16 examples x 17 joints per coordinate tracker
    assert 'n=272' in out
    assert path.isfile(out_file)

    # reference-style flag spellings are accepted (--examples-per-epoch /
    # --output / --with-image / --epochs) and --epochs multiplies the draws
    out_file2 = str(tmp_path / 'stats2.png')
    stats_main(['stats', '--dataset', 'synthetic-16', '--batch-size', '8',
                '--examples-per-epoch', '16', '--epochs', '2',
                '--with-image', '--output', out_file2])
    out = capsys.readouterr().out
    assert 'n=544' in out  # 2 epochs x 16 x 17
    assert path.isfile(out_file2)


def test_eval_cli_batched_matches_batch1(trained_ckpt, capsys):
    """--batch-size N amortises TPU dispatch without changing metrics: the
    batched eval (incl. a padded tail batch) must reproduce the batch-1
    per-example metrics."""
    import re

    from margipose_tpu.bin.eval_3d import main as eval_main

    def overall_mpjpe(args):
        eval_main(args, {'device': 'auto'})
        out = capsys.readouterr().out
        table = out.split('### Overall')[1]
        row = [ln for ln in table.splitlines() if ln.startswith('|  0')][0]
        # markdown rows end with '|' so split() has a trailing '' —
        # [-3] is the mpjpe column, [-2] would be pck
        return float(row.split('|')[-3])

    m1 = overall_mpjpe(['eval', '--model', trained_ckpt,
                        '--dataset', 'synthetic-6'])
    m4 = overall_mpjpe(['eval', '--model', trained_ckpt,
                        '--dataset', 'synthetic-6', '--batch-size', '4'])
    assert abs(m1 - m4) < 1e-3, (m1, m4)


@pytest.mark.slow  # 36s measured (r4 durations profile)
def test_eval_cli_data_parallel_matches_single_device(trained_ckpt, capsys):
    """--num-devices N shards eval batches over a pure-data mesh (weights
    replicated, GSPMD-partitioned forward) without changing metrics — run
    on the conftest-forced 8-device virtual CPU mesh."""
    import jax

    from margipose_tpu.bin.eval_3d import main as eval_main

    assert len(jax.devices()) >= 8

    def overall_mpjpe(args):
        eval_main(args, {'device': 'auto'})
        out = capsys.readouterr().out
        table = out.split('### Overall')[1]
        row = [ln for ln in table.splitlines() if ln.startswith('|  0')][0]
        return float(row.split('|')[-3])

    base = ['eval', '--model', trained_ckpt, '--dataset', 'synthetic-10',
            '--batch-size', '8']
    m1 = overall_mpjpe(base)
    m8 = overall_mpjpe(base + ['--num-devices', '8'])
    assert abs(m1 - m8) < 1e-3, (m1, m8)
    # the TRUE single-device branch (the default above sees all 8 virtual
    # devices): load_model returns host-numpy leaves and eval must commit
    # them on device once rather than re-uploading per batch
    m1dev = overall_mpjpe(base + ['--num-devices', '1'])
    assert abs(m1 - m1dev) < 1e-3, (m1, m1dev)


def test_eval_cli_ship_auto_is_parity_safe(trained_ckpt, capsys):
    """--ship auto (default) must resolve to float32 shipping under the
    float32 checkpoint-parity precision — the metrics table is IDENTICAL to
    an explicit --ship float32 run, to full printed precision (uint8
    shipping renormalises on device at last-ulp difference, so the same
    check against --ship uint8 would only agree approximately)."""
    from margipose_tpu.bin.eval_3d import main as eval_main

    def overall_row(args):
        eval_main(args, {'device': 'auto'})
        out = capsys.readouterr().out
        table = out.split('### Overall')[1]
        return [ln for ln in table.splitlines() if ln.startswith('|  0')][0]

    base = ['eval', '--model', trained_ckpt, '--dataset', 'synthetic-4',
            '--batch-size', '4']
    auto_row = overall_row(base)
    f32_row = overall_row(base + ['--ship', 'float32'])
    assert auto_row == f32_row


def test_train_cli_pretrained_stem(tmp_path, capsys):
    """`pretrained_stem=<path>` starts fresh training from an ImageNet
    backbone state_dict, like the reference's implicit pretrained download
    (reference: src/margipose/models/margipose_model.py:104-138)."""
    import jax
    import jax.numpy as jnp
    import torch

    from margipose_tpu.bin.train_3d import ex, run_training
    from margipose_tpu.models.margipose import MargiPoseModel
    from torch_twin import synth_resnet18_state_dict

    model = MargiPoseModel(n_joints=17, n_stages=1,
                           feature_extractor='resnet18')
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 96, 96, 3)))
    sd = synth_resnet18_state_dict(variables, seed=7)
    stem_pth = str(tmp_path / 'resnet18-imagenet.pth')
    torch.save(sd, stem_pth)

    out_dir = str(tmp_path / 'out')
    cfg = ex.parse([
        'with', 'synthetic', 'sgd_simple', f'out_dir={out_dir}', 'epochs=1',
        'batch_size=8', 'train_examples=8', 'val_examples=0', 'lr=0.0',
        'num_workers=0', 'metrics_every=1', 'experiment_id=t',
        f'pretrained_stem={stem_pth}',
        "model_desc={'type': 'margipose', 'version': '6.0.1', "
        "'settings': {'n_stages': 1, 'feature_extractor': 'resnet18', "
        "'input_size': 96}}",
        'train_datasets=["synthetic-8"]', 'val_datasets=[]', 'use_aug=False',
    ])
    run_training(cfg)
    assert 'initialised resnet18 stem from' in capsys.readouterr().out

    # lr=0: the saved checkpoint's stem conv still carries the ImageNet
    # weights (OIHW -> HWIO)
    from margipose_tpu.train.checkpoint import load_model

    _, trained_vars, _ = load_model(path.join(out_dir, 't', 'model-latest'))
    got = np.asarray(trained_vars['params']['inner']['in_cnn']['0']['weight'])
    want = sd['conv1.weight'].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_bench_loader_smoke(capsys):
    """Host-loader benchmark tool runs end-to-end on its own fake dataset."""
    from margipose_tpu.bin.bench_loader import main as bench_loader_main

    bench_loader_main(['--seconds', '1', '--batch-size', '4',
                       '--workers', '0'])
    out = capsys.readouterr().out
    assert 'images/sec' in out


def test_generate_resources(tmp_path):
    """Procedural augmentation-asset generator writes the reference layout
    (16 background JPGs, 8 texture PNGs, demo image;
    reference: resources/ consumed at src/margipose/data/mpi_inf_3dhp/__init__.py:90,114)."""
    import glob

    from margipose_tpu.bin.generate_resources import main as gen_main

    out = str(tmp_path / 'res')
    gen_main(['--out-dir', out])
    assert len(glob.glob(path.join(out, 'backgrounds', '*.jpg'))) == 16
    assert len(glob.glob(path.join(out, 'textures', '*.png'))) == 8
    assert path.isfile(path.join(out, 'man_running.jpg'))


def test_infer_cli_wide_image(trained_ckpt, tmp_path):
    """Non-square large photos go through the binding-ratio pre-reduce
    (anti-aliasing) path before the device warp."""
    import PIL.Image

    from margipose_tpu.bin.infer_single import main as infer_main
    from margipose_tpu.data.synthetic import SyntheticPoseDataset

    ds = SyntheticPoseDataset(length=1)
    img = ds.input_to_pil_image(ds[0]['input']).resize((1024, 384))
    img_file = str(tmp_path / 'wide.jpg')
    img.save(img_file, quality=92)
    out_file = str(tmp_path / 'result.png')

    infer_main(['infer', '--model', trained_ckpt, '--image', img_file,
                '--out-file', out_file], {'device': 'auto'})
    assert path.isfile(out_file)


def test_infer_multicrop_backmap_geometry():
    """The 10-crop infer path (reference declares --multicrop but asserts it
    unimplemented, src/margipose/bin/infer_single.py:56) back-maps every
    crop's prediction into the base frame before averaging. Verify the whole
    affine/flip/offset chain with a 'model' that soft-argmaxes the input
    blob: every crop sees the blob somewhere else, but the merged prediction
    must land on the base-frame blob location."""
    import PIL.Image

    from margipose_tpu.bin.infer_single import infer_image

    class BlobModel:
        def apply(self, variables, inp, train=False):
            import jax.numpy as jnp

            from margipose_tpu.ops.dsnt import dsnt, flat_softmax

            heat = flat_softmax((inp.mean(axis=-1) * 20.0)[:, None])
            xy = dsnt(heat)[:, 0]
            xyz = jnp.concatenate(
                [xy, jnp.full((xy.shape[0], 1), 0.3, xy.dtype)], axis=-1)
            return jnp.tile(xyz[:, None, :], (1, 17, 1)), None

    img = np.zeros((256, 256, 3), np.uint8)
    by, bx = 108, 158  # blob centre, off-centre in both axes
    img[by - 5:by + 6, bx - 5:bx + 6] = 255
    pil = PIL.Image.fromarray(img)

    model = BlobModel()
    _, single = infer_image(model, {}, pil, multicrop=False)
    _, merged = infer_image(model, {}, pil, multicrop=True)

    # base-frame blob location in normalized coords (half-pixel centres)
    expect_x = (bx + 0.5) * 2 / 256 - 1
    expect_y = (by + 0.5) * 2 / 256 - 1
    np.testing.assert_allclose(single[0, :2], [expect_x, expect_y], atol=0.02)
    # every crop back-maps to the same base point, so the 10-crop mean must
    # agree with the single-crop prediction (a flip-sign or offset-direction
    # bug would shift x by ~2*|x| or ~2*dx/w respectively)
    np.testing.assert_allclose(merged[:, :2], single[:, :2], atol=0.02)
    np.testing.assert_allclose(merged[:, 2], 0.3, atol=1e-5)


def test_infer_cli_multicrop(trained_ckpt, tmp_path):
    """infer --multicrop end-to-end: works here, unimplemented upstream."""
    import PIL.Image

    from margipose_tpu.bin.infer_single import main as infer_main
    from margipose_tpu.data.synthetic import SyntheticPoseDataset

    ds = SyntheticPoseDataset(length=1)
    img = ds.input_to_pil_image(ds[0]['input'])
    img_file = str(tmp_path / 'person.png')
    img.save(img_file)
    out_file = str(tmp_path / 'result.png')

    infer_main(['infer', '--model', trained_ckpt, '--image', img_file,
                '--out-file', out_file, '--multicrop'], {'device': 'auto'})
    assert path.isfile(out_file)


def test_serve_http(trained_ckpt):
    """The batched HTTP serving surface (no reference equivalent): health
    probe, two concurrent predictions through the microbatcher, and the
    bad-body error path — all against the real serving stack in-process."""
    import concurrent.futures
    import json as json_mod
    import threading
    import urllib.error
    import urllib.request

    import PIL.Image

    from margipose_tpu.bin.serve import create_server
    from margipose_tpu.data.synthetic import SyntheticPoseDataset

    server = create_server(trained_ckpt, port=0, batch_size=2,
                           max_wait_ms=300.0, precision='float32',
                           warmup=True)
    host, port = server.server_address[:2]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        with urllib.request.urlopen(
                f'http://{host}:{port}/healthz', timeout=30) as resp:
            assert json_mod.loads(resp.read())['status'] == 'ok'

        ds = SyntheticPoseDataset(length=2)
        bodies = []
        for i in range(2):
            import io as io_mod

            buf = io_mod.BytesIO()
            ds.input_to_pil_image(ds[i]['input']).save(buf, format='PNG')
            bodies.append(buf.getvalue())

        def post(body):
            req = urllib.request.Request(
                f'http://{host}:{port}/predict', data=body, method='POST')
            with urllib.request.urlopen(req, timeout=120) as resp:
                return json_mod.loads(resp.read())

        # two concurrent requests share one microbatch (batch_size=2 and a
        # generous wait window); at minimum both must return valid skeletons
        with concurrent.futures.ThreadPoolExecutor(2) as pool:
            results = list(pool.map(post, bodies))
        for r in results:
            assert r['skeleton'] == 'canonical-17'
            assert len(r['joints']) == 17
            assert all(len(v) == 3 and np.isfinite(v).all()
                       for v in r['joints'].values())
            assert 1 <= r['batched_with'] <= 2

        # bad bodies -> 4xx, server stays alive after each:
        # - garbage bytes fail PIL.Image.open (header parse)
        # - a TRUNCATED valid image passes open() but fails the actual
        #   decode inside letterbox (PIL decodes lazily) -> still 400
        for bad_body in (b'not an image', bodies[0][:len(bodies[0]) // 2]):
            req = urllib.request.Request(
                f'http://{host}:{port}/predict', data=bad_body,
                method='POST')
            try:
                urllib.request.urlopen(req, timeout=30)
                assert False, 'expected HTTP 400'
            except urllib.error.HTTPError as e:
                assert e.code == 400
            with urllib.request.urlopen(
                    f'http://{host}:{port}/healthz', timeout=30) as resp:
                assert json_mod.loads(resp.read())['status'] == 'ok'

        # an absurd declared Content-Length is rejected up front (413)
        # without waiting for (or allocating) the body
        import http.client

        conn = http.client.HTTPConnection(host, port, timeout=30)
        try:
            conn.putrequest('POST', '/predict')
            conn.putheader('Content-Length', str(1 << 30))
            conn.endheaders()
            resp = conn.getresponse()
            assert resp.status == 413
        finally:
            conn.close()
        # a NEGATIVE declared Content-Length must 400 immediately —
        # rfile.read(-1) would otherwise read until EOF/timeout, pinning a
        # handler thread for the full socket timeout per request
        conn = http.client.HTTPConnection(host, port, timeout=30)
        try:
            conn.putrequest('POST', '/predict')
            conn.putheader('Content-Length', '-1')
            conn.endheaders()
            t0 = perf_counter()
            resp = conn.getresponse()
            assert resp.status == 400
            assert perf_counter() - t0 < 10  # no read-until-timeout stall
        finally:
            conn.close()
        with urllib.request.urlopen(
                f'http://{host}:{port}/healthz', timeout=30) as resp:
            assert json_mod.loads(resp.read())['status'] == 'ok'

        # /info reports the model + server configuration
        with urllib.request.urlopen(
                f'http://{host}:{port}/info', timeout=30) as resp:
            info = json_mod.loads(resp.read())
        assert info['skeleton'] == 'canonical-17'
        assert len(info['joints']) == 17
        assert info['batch_size'] == 2
        assert info['precision'] == 'float32'
        assert info['input']['width'] > 0 and info['input']['height'] > 0
        assert info['model']['type'] in ('margipose', 'chatterbox')

        # /metrics counted the 2 successes, >=3 rejects, and >=1 batch
        with urllib.request.urlopen(
                f'http://{host}:{port}/metrics', timeout=30) as resp:
            metrics = json_mod.loads(resp.read())
        # requests_total counts EVERY /predict received: 2 ok + 2 bad
        # bodies + the oversize 413 + the negative-length 400
        assert metrics['requests_total'] == 6
        assert metrics['ok_total'] == 2
        assert metrics['rejected_total'] == 4  # 2 bad bodies + 413 + neg len
        assert metrics['errors_total'] == 0
        assert 1 <= metrics['batches_total'] <= 2
        assert metrics['batched_images_total'] == 2
        lat = metrics['latency_ms']
        assert 0 < lat['p50'] <= lat['p95'] <= lat['max']
        assert metrics['batch_occupancy_mean'] >= 1
    finally:
        server.shutdown()
        server.server_close()


@pytest.mark.slow  # 85s measured (r4 durations profile)
def test_train_cli_seeded_reproducibility(tmp_path):
    """Two identically-seeded training runs through the product surface
    (threaded loader, full augmentation, validation pass) produce
    bit-identical final parameters and identical loss trajectories; a
    different seed diverges. The reference only seeds RNGs and flips cuDNN
    determinism flags (reference: src/margipose/utils.py:12-24,
    src/margipose/bin/train_3d.py:271-272) without testing the contract;
    here it is pinned end-to-end."""
    import jax

    from margipose_tpu.bin.train_3d import ex, run_training
    from margipose_tpu.train.checkpoint import load_model

    def run(tag, seed):
        out_dir = str(tmp_path / tag)
        cfg = ex.parse([
            'with', 'synthetic', 'sgd_simple',
            f'out_dir={out_dir}', f'seed={seed}', 'epochs=1', 'batch_size=8',
            'train_examples=16', 'val_examples=8', 'lr=0.02',
            'num_workers=2', 'metrics_every=1', f'experiment_id={tag}',
            "model_desc={'type': 'margipose', 'version': '6.0.1', "
            "'settings': {'n_stages': 1, 'feature_extractor': 'resnet18', "
            "'input_size': 96}}",
            'train_datasets=["synthetic-16"]', 'val_datasets=["synthetic-8"]',
            'use_aug=True',
        ])
        run_training(cfg)
        exp_dir = path.join(out_dir, tag)
        losses = []
        with open(path.join(exp_dir, 'metrics.jsonl')) as f:
            for line in f:
                rec = json.loads(line)
                losses += [(k, v) for k, v in sorted(rec.items())
                           if k.endswith(('_loss', '_mpjpe', '_pck'))
                           and v is not None]
        _, variables, _ = load_model(path.join(exp_dir, 'model-latest'))
        return losses, variables

    losses_a, vars_a = run('rep_a', seed=77)
    losses_b, vars_b = run('rep_b', seed=77)
    losses_c, _ = run('rep_c', seed=78)

    assert losses_a and losses_a == losses_b
    leaves_a = jax.tree_util.tree_leaves_with_path(vars_a)
    leaves_b = dict(jax.tree_util.tree_leaves_with_path(vars_b))
    assert leaves_a and len(leaves_a) == len(leaves_b)
    for key, leaf in leaves_a:
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(leaves_b[key]),
            err_msg=jax.tree_util.keystr(key))
    # a different seed must actually change the trajectory (tripwire that
    # the seed config reaches the data order, augmentation, and init RNGs)
    assert losses_a != losses_c


def test_serve_microbatcher_failure_paths():
    """The dispatcher's failure contract, unit-level: an Exception in the
    runner surfaces to every waiting request but keeps the batcher alive; a
    BaseException (SystemExit etc.) kills it, fails queued waiters, flips
    ``alive()`` (the /healthz 503 signal) and makes ``submit`` fail fast;
    item waits are bounded (the /predict 504 path)."""
    import threading
    import time

    from margipose_tpu.bin.serve import Microbatcher

    # Exception path: batch fails, batcher survives
    calls = []

    def flaky(batch):
        calls.append(len(batch))
        if len(calls) == 1:
            raise ValueError('transient device error')
        return np.zeros((batch.shape[0], 17, 3))

    b = Microbatcher(flaky, batch_size=2, max_wait_s=0.01)
    img = np.zeros((4, 4, 3), np.uint8)
    it = b.submit(img)
    assert it.event.wait(timeout=10)
    assert isinstance(it.error, ValueError)
    assert b.alive()
    it2 = b.submit(img)
    assert it2.event.wait(timeout=10)
    assert it2.error is None and it2.result.shape == (17, 3)

    # BaseException path: batcher dies loudly, not silently
    gate = threading.Event()

    def fatal(batch):
        gate.wait(5)
        raise SystemExit('worker killed')

    b2 = Microbatcher(fatal, batch_size=2, max_wait_s=0.01)
    first = b2.submit(img)
    time.sleep(0.1)  # let the batch window close so 'queued' lands after it
    queued = b2.submit(img)
    gate.set()
    assert first.event.wait(timeout=10) and queued.event.wait(timeout=10)
    assert 'died' in str(first.error) and 'died' in str(queued.error)
    for _ in range(100):  # thread teardown races the flag by a hair
        if not b2.alive():
            break
        time.sleep(0.05)
    assert not b2.alive()
    with pytest.raises(RuntimeError, match='dead'):
        b2.submit(img)

    # bounded wait: a wedged runner never strands the waiter past timeout
    b3 = Microbatcher(lambda batch: time.sleep(30), batch_size=1,
                      max_wait_s=0.01)
    it3 = b3.submit(img)
    t0 = time.monotonic()
    assert not it3.event.wait(timeout=0.2)  # the /predict handler's wait
    assert time.monotonic() - t0 < 5

    # submit()'s post-put fatal re-check: an item whose put lands after the
    # batcher dies (and after its queue drain) is failed by the submitter
    # instead of stranding until the 504 timeout. The live race window is
    # sub-microsecond, so inject it: fatal flips between submit's alive()
    # check and the put landing.
    b4 = Microbatcher(lambda batch: np.zeros((batch.shape[0], 17, 3)),
                      batch_size=2, max_wait_s=0.01)
    orig_put = b4.queue.put

    def racing_put(item):
        b4.fatal = SystemExit('simulated death')  # batcher "dies" mid-submit
        orig_put(item)

    b4.queue.put = racing_put
    late = b4.submit(img)  # the REAL submit path, with the race forced
    assert late.event.is_set() and 'died' in str(late.error)
    b4.queue.put = orig_put
    with pytest.raises(RuntimeError, match='dead'):
        b4.submit(img)  # and the front door fails fast on the fatal flag


def test_serve_letterbox_matches_infer_pixels():
    """``/predict`` and ``infer`` must see the SAME pixels for the same
    image (review finding: serve's old letterbox used PIL's antialiased
    thumbnail kernel while infer area-prefilters then bilinear-warps, so
    the two surfaces disagreed). Compares serve's host letterbox against
    infer's exact pipeline (PIL.reduce prefilter + the device bilinear
    warp, margipose_tpu/bin/infer_single.py::infer_image) for both a
    shrink-to-fit and a smaller-than-canvas image; tolerance is the uint8
    quantisation inherent to the uint8-ship encoding."""
    import jax.numpy as jnp
    import PIL.Image

    from margipose_tpu.bin.serve import letterbox_uint8
    from margipose_tpu.ops.image import affine_warp

    rng = np.random.RandomState(0)
    w = h = 64
    for iw, ih in ((160, 96), (48, 40)):
        arr = rng.randint(0, 256, (ih, iw, 3), dtype=np.uint8)
        image = PIL.Image.fromarray(arr, 'RGB')
        got = letterbox_uint8(image, w, h)
        assert got.shape == (h, w, 3) and got.dtype == np.uint8

        ref_img = image.convert('RGB')
        fit_scale = min(w / ref_img.width, h / ref_img.height, 1.0)
        reduce_factor = int(1.0 / fit_scale)
        if reduce_factor > 1:
            ref_img = ref_img.reduce(reduce_factor)
        src = np.asarray(ref_img, np.float32) / 255.0
        scale = min(w / src.shape[1], h / src.shape[0], 1.0)
        affine = np.array([[scale, 0.0, 0.0], [0.0, scale, 0.0],
                           [0.0, 0.0, 1.0]], np.float32)
        ref = np.asarray(affine_warp(jnp.asarray(src[None]),
                                     jnp.asarray(affine[None]), h, w))[0]
        np.testing.assert_allclose(got.astype(np.float32) / 255.0, ref,
                                   atol=2.0 / 255.0)


@pytest.mark.slow  # 97s measured (r4 durations profile)
def test_train_cli_resume_equals_uninterrupted(tmp_path):
    """``resume=`` must CONTINUE training, not merely restart it: a run
    interrupted after epoch 1 and resumed for epoch 2 produces bit-identical
    final parameters and identical epoch-2 metrics to an uninterrupted
    2-epoch run. Rests on full-state checkpointing (params, optimiser,
    step — the asymmetry the reference never fixed: it saved but never
    reloaded these, reference: src/margipose/bin/train_3d.py:285-291,
    374-382) plus the epoch-pinned sampler order (base.RandomSampler
    .iter_epoch)."""
    import jax

    from margipose_tpu.bin.train_3d import ex, run_training
    from margipose_tpu.train.checkpoint import load_model

    base = [
        'with', 'synthetic', 'sgd_simple', 'seed=55', 'batch_size=8',
        'train_examples=16', 'val_examples=0', 'lr=0.02',
        'num_workers=2', 'metrics_every=1',
        "model_desc={'type': 'margipose', 'version': '6.0.1', "
        "'settings': {'n_stages': 1, 'feature_extractor': 'resnet18', "
        "'input_size': 96}}",
        'train_datasets=["synthetic-16"]', 'val_datasets=[]',
        'use_aug=False',
    ]

    def run(tag, epochs, extra=()):
        out_dir = str(tmp_path / tag)
        cfg = ex.parse(base + [f'out_dir={out_dir}', f'epochs={epochs}',
                               f'experiment_id={tag}', *extra])
        run_training(cfg)
        exp_dir = path.join(out_dir, tag)
        records = [json.loads(line)
                   for line in open(path.join(exp_dir, 'metrics.jsonl'))]
        return path.join(exp_dir, 'model-latest'), records

    straight_ckpt, straight_recs = run('straight', epochs=2)
    half_ckpt, _ = run('half', epochs=1)
    resumed_ckpt, resumed_recs = run('resumed', epochs=2,
                                     extra=[f'resume={half_ckpt}'])

    _, vars_a, _ = load_model(straight_ckpt)
    _, vars_b, _ = load_model(resumed_ckpt)
    leaves_a = jax.tree_util.tree_leaves_with_path(vars_a)
    leaves_b = dict(jax.tree_util.tree_leaves_with_path(vars_b))
    assert leaves_a and len(leaves_a) == len(leaves_b)
    for key, leaf in leaves_a:
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(leaves_b[key]),
            err_msg=jax.tree_util.keystr(key))

    # the resumed run's (single) epoch-2 record matches the uninterrupted
    # run's second record on every loss/metric field
    def metric_fields(rec):
        return {k: v for k, v in rec.items()
                if k.endswith(('_loss', '_mpjpe', '_pck'))}

    assert len(straight_recs) == 2 and len(resumed_recs) == 1
    assert metric_fields(straight_recs[1]) == metric_fields(resumed_recs[0])
    assert metric_fields(straight_recs[1])  # non-vacuous
