"""Full-model checkpoint parity against a complete torch MargiPose twin.

This is what stands behind the <=1mm-MPJPE parity claim until the real
published checkpoints are reachable: a torch twin with the reference's exact
architecture (InceptionV4 stem with padding surgery, combiners, 2 stages)
and state_dict key spellings is converted via ``convert_state_dict`` /
``import_torch_model`` and must agree end-to-end with the flax model.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
from numpy.testing import assert_allclose

from torch_twin import (
    TMargiPose,
    randomize_bn,
    t_inception_in_cnn,
)

from margipose_tpu.models.margipose import (
    InceptionInCnn,
    MargiPoseModel,
)
from margipose_tpu.train.torch_import import (
    convert_pretrained_stem,
    convert_state_dict,
)


@pytest.fixture(scope='module')
def twin_and_flax():
    torch.manual_seed(42)
    twin = TMargiPose(n_joints=17, n_stages=2).eval()
    randomize_bn(twin)
    model = MargiPoseModel(n_joints=17, n_stages=2,
                           feature_extractor='inceptionv4')
    template = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    variables = convert_state_dict(template, twin.state_dict())
    return twin, model, variables


def test_inception_stem_parity():
    """The riskiest conversion: the 'same'-padded InceptionV4 stem
    (reference: src/margipose/models/margipose_model.py:103-118) — includes
    the asymmetric (1,7)/(7,1) Mixed4a branches, pooling padding semantics,
    and BN(eps=1e-3) stats."""
    torch.manual_seed(1)
    tstem = t_inception_in_cnn().eval()
    randomize_bn(tstem, seed=3)

    jstem = InceptionInCnn()
    template = jax.eval_shape(
        jstem.init, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    variables = convert_state_dict(template, tstem.state_dict())

    x = np.random.RandomState(11).randn(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        expected = tstem(torch.from_numpy(x)).numpy()
    actual = jstem.apply(
        jax.tree.map(jnp.asarray, variables),
        jnp.asarray(x.transpose(0, 2, 3, 1)), False)
    assert_allclose(
        np.asarray(actual).transpose(0, 3, 1, 2), expected, atol=2e-4)


def test_full_model_output_parity(twin_and_flax):
    """End-to-end: stem + 2 stages + combiner feedback + softmax + DSNT.
    Coordinates and final-stage heatmaps must match the torch twin."""
    twin, model, variables = twin_and_flax

    x = np.random.RandomState(5).randn(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        exp_xyz, (exp_xy, exp_zy, exp_xz) = twin(torch.from_numpy(x))

    xyz, out = model.apply(
        jax.tree.map(jnp.asarray, variables),
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)

    for t in range(2):
        assert_allclose(np.asarray(out.xy_heatmaps[t]), exp_xy[t].numpy(),
                        atol=1e-5, err_msg=f'xy heatmaps stage {t}')
        assert_allclose(np.asarray(out.zy_heatmaps[t]), exp_zy[t].numpy(),
                        atol=1e-5, err_msg=f'zy heatmaps stage {t}')
        assert_allclose(np.asarray(out.xz_heatmaps[t]), exp_xz[t].numpy(),
                        atol=1e-5, err_msg=f'xz heatmaps stage {t}')
    assert_allclose(np.asarray(xyz), exp_xyz.numpy(), atol=1e-5)


def test_real_format_pth_roundtrip(twin_and_flax, tmp_path):
    """``import_torch_model`` must consume a real-format .pth — the torch
    pickle {state_dict, model_desc, train_datasets, optimizer, epoch} the
    reference writes (reference: src/margipose/bin/train_3d.py:374-382) —
    and produce the same outputs as the twin."""
    twin, _, _ = twin_and_flax
    pth = str(tmp_path / 'model-latest.pth')
    torch.save({
        'state_dict': twin.state_dict(),
        'model_desc': {
            'type': 'margipose', 'version': '6.1.0',
            'settings': {'n_stages': 2, 'axis_permutation': True,
                         'feature_extractor': 'inceptionv4',
                         'pixelwise_loss': 'jsd'},
        },
        'train_datasets': ['mpi3d-train', 'mpii-train'],
        'optimizer': {'state': {}, 'param_groups': []},
        'epoch': 150,
    }, pth)

    from margipose_tpu.train.torch_import import import_torch_model

    model, variables, model_desc = import_torch_model(pth)
    assert model_desc['settings']['n_stages'] == 2

    x = np.random.RandomState(9).randn(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        exp_xyz, _ = twin(torch.from_numpy(x))
    xyz, _ = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                         train=False)
    assert_allclose(np.asarray(xyz), exp_xyz.numpy(), atol=1e-5)


# ---- ImageNet-pretrained stem import --------------------------------------


def test_pretrained_inception_stem_import():
    """convert_pretrained_stem grafts a pretrainedmodels-format inceptionv4
    state_dict (features.0..6 + surplus deeper blocks) onto in_cnn, leaving
    the fresh 1x1 reduction (blocks 7/8) untouched
    (reference: src/margipose/models/margipose_model.py:104-118)."""
    torch.manual_seed(2)
    tstem = t_inception_in_cnn()
    randomize_bn(tstem, seed=5)
    # pretrainedmodels checkpoint format: features.{i}.* + classifier junk
    sd = {}
    for k, v in tstem.state_dict().items():
        i = int(k.split('.')[0])
        if i < 7:
            sd[f'features.{i}.' + k.split('.', 1)[1]] = v
    sd['features.7.conv.weight'] = torch.zeros(192, 384, 3, 3)
    sd['last_linear.weight'] = torch.zeros(1000, 1536)
    sd['last_linear.bias'] = torch.zeros(1000)

    model = MargiPoseModel(n_joints=17, n_stages=1,
                           feature_extractor='inceptionv4')
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    grafted = convert_pretrained_stem(dict(variables), sd, 'inceptionv4')

    in_cnn = grafted['params']['inner']['in_cnn']
    orig = variables['params']['inner']['in_cnn']
    # block 0 conv got the pretrained weights (transposed OIHW -> HWIO)
    assert_allclose(
        np.asarray(in_cnn['0']['conv']['weight']),
        sd['features.0.conv.weight'].numpy().transpose(2, 3, 1, 0))
    # BN stats came across too
    assert_allclose(
        np.asarray(grafted['batch_stats']['inner']['in_cnn']['4']
                   ['branch1']['2']['bn']['BatchNorm_0']['mean']),
        sd['features.4.branch1.2.bn.running_mean'].numpy())
    # fresh reduction layers (7/8) keep their random init
    assert_allclose(np.asarray(in_cnn['7']['weight']),
                    np.asarray(orig['7']['weight']))
    # nothing outside in_cnn changed
    a = jax.tree.leaves(grafted['params']['inner']['hm_cnns_down_0'])[0]
    b = jax.tree.leaves(variables['params']['inner']['hm_cnns_down_0'])[0]
    assert_allclose(np.asarray(a), np.asarray(b))

    # a truncated state_dict fails loudly
    bad = {k: v for k, v in sd.items() if k != 'features.0.conv.weight'}
    with pytest.raises(KeyError):
        convert_pretrained_stem(dict(variables), bad, 'inceptionv4')


def test_pretrained_resnet_stem_import():
    """torchvision resnet18 state_dict (conv1/bn1/layer1/layer2 + surplus
    layer3/4/fc) maps onto the ResNetStem Sequential indices
    (reference: src/margipose/models/margipose_model.py:119-138)."""
    model = MargiPoseModel(n_joints=17, n_stages=1,
                           feature_extractor='resnet18')
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    # synthesise a torchvision-format state_dict from the flax template
    from torch_twin import synth_resnet18_state_dict

    sd = synth_resnet18_state_dict(variables, seed=0)
    assert 'conv1.weight' in sd and 'layer2.1.bn2.running_var' in sd
    # surplus torchvision keys must be ignored
    sd['layer3.0.conv1.weight'] = torch.zeros(256, 128, 3, 3)
    sd['fc.weight'] = torch.zeros(1000, 512)

    grafted = convert_pretrained_stem(dict(variables), sd, 'resnet18')
    assert_allclose(
        np.asarray(grafted['params']['inner']['in_cnn']['0']['weight']),
        sd['conv1.weight'].numpy().transpose(2, 3, 1, 0))
    assert_allclose(
        np.asarray(grafted['batch_stats']['inner']['in_cnn']['4']['0']
                   ['bn1']['BatchNorm_0']['var']),
        sd['layer1.0.bn1.running_var'].numpy())


def test_load_pretrained_stem_from_file(tmp_path):
    """File-level entry point used by the trainer's pretrained_stem config."""
    torch.manual_seed(3)
    tstem = t_inception_in_cnn()
    sd = {}
    for k, v in tstem.state_dict().items():
        i = int(k.split('.')[0])
        if i < 7:
            sd[f'features.{i}.' + k.split('.', 1)[1]] = v
    pth = str(tmp_path / 'inceptionv4-imagenet.pth')
    torch.save(sd, pth)

    from margipose_tpu.train.torch_import import load_pretrained_stem

    model = MargiPoseModel(n_joints=17, n_stages=1,
                           feature_extractor='inceptionv4')
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    grafted = load_pretrained_stem(dict(variables), pth, 'inceptionv4')
    assert_allclose(
        np.asarray(grafted['params']['inner']['in_cnn']['1']['conv']['weight']),
        sd['features.1.conv.weight'].numpy().transpose(2, 3, 1, 0))


def test_export_state_dict_roundtrips_into_torch_twin(twin_and_flax):
    """export_state_dict is the true inverse of the importer: the exported
    state_dict strict-loads into the reference-architecture torch twin and
    reproduces the flax weights bit-for-bit when re-imported."""
    from margipose_tpu.train.torch_import import export_state_dict

    twin, model, variables = twin_and_flax
    sd_np = export_state_dict(variables)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd_np.items()}

    # strict load into a FRESH twin (all keys present, all shapes right)
    torch.manual_seed(0)
    twin2 = TMargiPose(n_joints=17, n_stages=2).eval()
    twin2.load_state_dict(sd, strict=True)

    # the reloaded twin equals the original twin the weights came from
    x = torch.randn(1, 3, 64, 64)
    with torch.no_grad():
        exp_xyz, _ = twin(x)
        got_xyz, _ = twin2(x)
    assert_allclose(got_xyz.numpy(), exp_xyz.numpy(), atol=1e-6)

    # and re-importing the exported dict reproduces the flax tree exactly
    template = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    reimported = convert_state_dict(template, sd)
    flat_a = {jax.tree_util.keystr(p): v for p, v in
              jax.tree_util.tree_flatten_with_path(variables)[0]}
    flat_b = {jax.tree_util.keystr(p): v for p, v in
              jax.tree_util.tree_flatten_with_path(reimported)[0]}
    assert flat_a.keys() == flat_b.keys()
    for k in flat_a:
        assert_allclose(np.asarray(flat_a[k]), np.asarray(flat_b[k]), atol=0)
