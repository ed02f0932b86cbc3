"""Parity against the reference's executed LR-finder bin.

Executes ``/root/reference/src/margipose/bin/hyperparam_search.py`` — the
Leslie-Smith LR range test (reference: src/margipose/bin/hyperparam_search.py)
— with dependency shims that contain NO logic under test (sacred config
registration, tele meters, plotly figure records, tqdm passthrough, no-op
seeding). The logic-bearing import, ``margipose.dsntnn.average_loss``, is the
reference's OWN executed dsntnn.py.

What this pins that the twin-free tests could not:

- the reference's config DEFAULTS (ema_beta=0.99, lr range 1e-1..1e2,
  weight_decay=0, momentum=0.9, ...) against
  ``margipose_tpu.bin.hyperparam_search``'s defaults — this caught two real
  divergences when first written (ema_beta 0.98 and lr_min 1e-5 in the
  rebuild);
- the reference's per-example 2D/3D ``forward_loss`` switch, EXECUTED (the
  existing pin in test_reference_models.py composes the switch by hand);
- the EMA-smoothing + divergence-stop trajectory of the reference's actual
  search loop (``sacred_main`` run end-to-end on a stub model) against
  ``LRCurveAccumulator`` — the exact iteration-ordering subtleties
  (bias correction by i+1, divergence checked against the PREVIOUS minimum,
  the diverging point excluded from curve and minimum).

If the reference checkout is absent the tests skip, mirroring the
dataset-absence skip pattern.
"""

import importlib.machinery
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = [pytest.mark.reference_exec]

REFERENCE_SRC = "/root/reference/src/margipose"
REF_BIN = os.path.join(REFERENCE_SRC, "bin", "hyperparam_search.py")


class _Rec:
    """Generic kwargs recorder standing in for plotly graph objects."""

    def __init__(self, *args, **kwargs):
        self.args = args
        self.kwargs = kwargs


class _Meter:
    def __init__(self, *a, **kw):
        self.value = None

    def set_value(self, v):
        self.value = v


class _Telemetry:
    def __init__(self, meters):
        self.meters = meters

    def __getitem__(self, key):
        return self.meters[key]

    def sink(self, *a, **kw):
        pass

    def step(self):
        pass


class _Experiment:
    """Records what the reference registers with sacred; runs nothing."""

    def __init__(self, *a, **kw):
        self.config = {}
        self.named_configs = {}
        self.main_fn = None

    def add_config(self, **kw):
        self.config.update(kw)

    def add_named_config(self, name, **kw):
        self.named_configs[name] = kw

    def main(self, fn):
        self.main_fn = fn
        return fn

    def capture(self, fn):
        return fn

    def run_commandline(self, argv):
        raise NotImplementedError


@pytest.fixture(scope="module")
def ref_lr_finder():
    """Execute the reference hyperparam_search bin; yields the module."""
    if not os.path.isfile(REF_BIN):
        pytest.skip(f"{REF_BIN} not found")

    keys = (
        "plotly", "plotly.graph_objs", "sacred", "sacred.host_info",
        "sacred.run", "tele", "tele.meter", "tqdm",
        "margipose", "margipose.cli", "margipose.dsntnn",
        "margipose.models", "margipose.models.margipose_model",
        "margipose.models.chatterbox_model", "margipose.train_helpers",
        "margipose.utils",
    )
    saved = {k: sys.modules.get(k) for k in keys}
    saved_showoff = os.environ.pop("SHOWOFF_URL", None)
    try:
        plotly = types.ModuleType("plotly")
        go = types.ModuleType("plotly.graph_objs")
        for name in ("Figure", "Scatter", "Layout", "Margin", "XAxis",
                     "YAxis"):
            setattr(go, name, type(name, (_Rec,), {}))
        plotly.graph_objs = go
        sys.modules["plotly"] = plotly
        sys.modules["plotly.graph_objs"] = go

        sacred = types.ModuleType("sacred")
        sacred.SETTINGS = {}
        sacred.Experiment = _Experiment
        host_info = types.ModuleType("sacred.host_info")
        host_info.get_host_info = lambda: {}
        run_mod = types.ModuleType("sacred.run")
        run_mod.Run = object
        sacred.host_info = host_info
        sacred.run = run_mod
        sys.modules["sacred"] = sacred
        sys.modules["sacred.host_info"] = host_info
        sys.modules["sacred.run"] = run_mod

        tele = types.ModuleType("tele")
        tele.Telemetry = _Telemetry
        meter = types.ModuleType("tele.meter")
        meter.ValueMeter = _Meter
        meter.MeanValueMeter = _Meter
        tele.meter = meter
        sys.modules["tele"] = tele
        sys.modules["tele.meter"] = meter

        tqdm_mod = types.ModuleType("tqdm")
        tqdm_mod.tqdm = lambda it, *a, **kw: it
        # a None __spec__ breaks importlib.util.find_spec("tqdm") calls
        # made by unrelated libraries while the shim is installed
        tqdm_mod.__spec__ = importlib.machinery.ModuleSpec("tqdm", None)
        sys.modules["tqdm"] = tqdm_mod

        pkg = types.ModuleType("margipose")
        pkg.__path__ = [REFERENCE_SRC]
        sys.modules["margipose"] = pkg

        cli = types.ModuleType("margipose.cli")

        class Subcommand:  # dispatch glue only
            def __init__(self, name=None, func=None, help=None):
                self.name, self.func, self.help = name, func, help

        cli.Subcommand = Subcommand
        sys.modules["margipose.cli"] = cli

        # the one logic-bearing import: the reference's OWN dsntnn.py
        dsntnn_path = os.path.join(REFERENCE_SRC, "dsntnn.py")
        spec = importlib.util.spec_from_file_location(
            "margipose.dsntnn", dsntnn_path)
        dsntnn = importlib.util.module_from_spec(spec)
        sys.modules["margipose.dsntnn"] = dsntnn
        spec.loader.exec_module(dsntnn)

        models = types.ModuleType("margipose.models")
        models.create_model = lambda desc: (_ for _ in ()).throw(
            NotImplementedError("patched per-test"))
        sys.modules["margipose.models"] = models
        mm = types.ModuleType("margipose.models.margipose_model")
        mm.Default_MargiPose_Desc = {"type": "margipose", "version": "6.0.1"}
        sys.modules["margipose.models.margipose_model"] = mm
        cm = types.ModuleType("margipose.models.chatterbox_model")
        cm.Default_Chatterbox_Desc = {"type": "chatterbox",
                                      "version": "1.3.0"}
        sys.modules["margipose.models.chatterbox_model"] = cm

        th = types.ModuleType("margipose.train_helpers")
        th.create_train_dataloader = lambda *a, **kw: (_ for _ in ()).throw(
            NotImplementedError("patched per-test"))
        th.create_showoff_notebook = lambda *a, **kw: None
        sys.modules["margipose.train_helpers"] = th

        utils = types.ModuleType("margipose.utils")
        utils.seed_all = lambda seed: None
        utils.init_algorithms = lambda deterministic=False: None
        sys.modules["margipose.utils"] = utils

        spec = importlib.util.spec_from_file_location(
            "reference_hyperparam_search", REF_BIN)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        yield mod
    finally:
        if saved_showoff is not None:
            os.environ["SHOWOFF_URL"] = saved_showoff
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def test_lr_finder_defaults_match_reference(ref_lr_finder):
    """The rebuild's LR-finder config defaults equal the reference's for
    every key both define (reference: src/margipose/bin/hyperparam_search.py:58-69).
    First run of this test caught ema_beta=0.98 and lr_min=1e-5 divergences
    in the rebuild."""
    from margipose_tpu.bin.hyperparam_search import ex as ours

    ref_cfg = ref_lr_finder.ex.config
    our_cfg = ours.parse([])
    shared = ["batch_size", "train_datasets", "lr_min", "lr_max",
              "max_iters", "ema_beta", "weight_decay", "momentum"]
    for key in shared:
        assert key in ref_cfg, f"reference lost config key {key}"
        assert our_cfg[key] == ref_cfg[key], (
            f"{key}: rebuild={our_cfg[key]!r} reference={ref_cfg[key]!r}")


class _StubModel(torch.nn.Module):
    """One-parameter model with scripted per-example 2D/3D losses.

    forward multiplies by the parameter so torch SGD drives a real
    trajectory; the 3d/2d loss heads are distinct quadratics so the
    valid_depth switch is observable."""

    data_specs = None  # read by sacred_main when building the dataloader

    def __init__(self):
        super().__init__()
        self.p = torch.nn.Parameter(torch.tensor(1.0))

    def forward(self, x):
        return x * self.p

    def forward_3d_losses(self, out_var, target_var):
        return (out_var.squeeze(-1) - 0.5) ** 2

    def forward_2d_losses(self, out_var, target_var):
        return (out_var.squeeze(-1) + 0.25) ** 2


def test_forward_loss_switch_matches_vectorised(ref_lr_finder):
    """The reference's EXECUTED forward_loss (per-example 2D/3D switch +
    masked average_loss; reference: src/margipose/bin/hyperparam_search.py:37-52
    — same function as bin/train_3d.py:126-142) equals the rebuild's
    vectorised composition where(valid_depth, l3, l2) -> average_loss for
    all three branches (all-3D, all-2D, mixed) and a zero-padded mask."""
    import jax.numpy as jnp

    from margipose_tpu.ops.dsnt import average_loss as our_average_loss

    model = _StubModel()
    rng = np.random.RandomState(7)
    B = 6
    x = torch.tensor(rng.uniform(0.2, 1.8, size=(B, 1)), dtype=torch.float32)
    out = model(x)
    target = torch.tensor(rng.randn(B, 1, 4), dtype=torch.float32)
    mask = torch.tensor([1.0, 1.0, 0.0, 1.0, 1.0, 1.0])

    l3 = model.forward_3d_losses(out, target).detach().numpy()
    l2 = model.forward_2d_losses(out, target).detach().numpy()

    for vd in ([1] * B, [0] * B, [1, 0, 1, 1, 0, 0]):
        valid_depth = torch.tensor(vd)
        ref = float(ref_lr_finder.forward_loss(
            model, out, target, mask, valid_depth).detach())
        ours = float(our_average_loss(
            jnp.where(jnp.asarray(vd) == 1, jnp.asarray(l3), jnp.asarray(l2)),
            jnp.asarray(mask.numpy())))
        np.testing.assert_allclose(ours, ref, rtol=1e-6)


def _run_reference_sweep(mod, lr_min, lr_max, max_iters, ema_beta,
                         batch_size=4, seed=3):
    """Drive the reference's ACTUAL sacred_main end-to-end on the stub
    model and a scripted dataloader; returns (raw_losses, curve) where
    curve is the live list the reference appends smoothed losses to
    (captured through the plotly Scatter record — y is passed by
    reference, so after the run it holds the final curve)."""
    model = _StubModel()
    rng = np.random.RandomState(seed)
    batches = [{
        "input": torch.tensor(rng.uniform(0.5, 1.5, size=(batch_size, 1)),
                              dtype=torch.float32),
        "target": torch.tensor(rng.randn(batch_size, 1, 4),
                               dtype=torch.float32),
        "joint_mask": torch.ones(batch_size),
        "valid_depth": torch.ones(batch_size, dtype=torch.long),
    } for _ in range(max_iters)]

    raw_losses = []
    orig_forward_loss = mod.forward_loss

    def recording_forward_loss(*args, **kwargs):
        loss = orig_forward_loss(*args, **kwargs)
        raw_losses.append(float(loss.detach()))
        return loss

    saved = (mod.forward_loss, mod.create_model,
             mod.create_train_dataloader, dict(mod.global_opts))
    try:
        mod.forward_loss = recording_forward_loss
        mod.create_model = lambda desc: model
        mod.create_train_dataloader = lambda *a, **kw: batches
        mod.global_opts["device"] = "cpu"

        class _Run:
            config = {}

        mod.sacred_main(
            _run=_Run(), seed=0, showoff=False, batch_size=batch_size,
            model_desc={"type": "margipose", "version": "6.0.1"},
            deterministic=False, train_datasets=["stub"],
            lr_min=lr_min, lr_max=lr_max, max_iters=max_iters,
            ema_beta=ema_beta, weight_decay=0, momentum=0.9)
    finally:
        (mod.forward_loss, mod.create_model,
         mod.create_train_dataloader) = saved[:3]
        mod.global_opts.clear()
        mod.global_opts.update(saved[3])

    return raw_losses


@pytest.mark.parametrize("lr_max,expect_stop", [(100.0, True), (0.2, False)])
def test_lr_curve_accumulator_matches_reference_loop(ref_lr_finder, lr_max,
                                                     expect_stop):
    """Feed the RAW per-iteration losses of the reference's executed search
    loop into the rebuild's LRCurveAccumulator: the smoothed curve, stop
    decision, and stop index must match the reference's recorded curve
    exactly (bit-identical arithmetic)."""
    from margipose_tpu.bin.hyperparam_search import LRCurveAccumulator

    max_iters = 120
    captured = {}

    # capture the reference's live `losses` list via the plotly record:
    # Scatter(y=losses) passes the list object by reference
    go = sys.modules["plotly.graph_objs"]
    orig_scatter = go.Scatter

    class CapturingScatter(orig_scatter):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            captured["curve"] = kw.get("y")

    go.Scatter = CapturingScatter
    try:
        raw = _run_reference_sweep(ref_lr_finder, lr_min=0.1, lr_max=lr_max,
                                   max_iters=max_iters, ema_beta=0.99)
    finally:
        go.Scatter = orig_scatter

    ref_curve = captured["curve"]
    assert ref_curve is not None, "reference never recorded the loss curve"

    acc = LRCurveAccumulator(0.99)
    stopped_at = None
    for i, loss in enumerate(raw):
        if acc.add(i, loss):
            stopped_at = i
            break

    assert acc.stopped == expect_stop
    if expect_stop:
        # the diverging iteration is the reference's LAST executed one: its
        # loss is raw[-1] and it is excluded from the recorded curve
        assert stopped_at == len(raw) - 1
        assert len(ref_curve) == len(raw) - 1
    else:
        assert stopped_at is None
        assert len(ref_curve) == max_iters == len(raw)
    np.testing.assert_array_equal(np.asarray(acc.smoothed),
                                  np.asarray(ref_curve))


def test_lr_finder_weight_decay_matches_torch_sgd():
    """The rebuild's weight-decay wiring (add_decayed_weights BEFORE the
    momentum trace) follows torch.optim.SGD's update order (the reference's
    optimiser; reference: src/margipose/bin/hyperparam_search.py:105):
    d_p = grad + wd*p folded into the momentum buffer. Pin a 25-step
    trajectory on a quadratic."""
    import jax.numpy as jnp
    import optax

    wd, mom, lr = 0.05, 0.9, 0.03

    p_t = torch.nn.Parameter(torch.tensor(1.0))
    opt_t = torch.optim.SGD([p_t], lr=lr, momentum=mom, weight_decay=wd)
    torch_traj = []
    for _ in range(25):
        opt_t.zero_grad()
        loss = (p_t - 0.3) ** 2
        loss.backward()
        opt_t.step()
        torch_traj.append(float(p_t.detach()))

    opt_j = optax.chain(optax.add_decayed_weights(wd),
                        optax.sgd(lr, momentum=mom))
    p_j = jnp.asarray(1.0)
    state = opt_j.init(p_j)
    jax_traj = []
    for _ in range(25):
        grad = 2 * (p_j - 0.3)
        updates, state = opt_j.update(grad, state, p_j)
        p_j = optax.apply_updates(p_j, updates)
        jax_traj.append(float(p_j))

    # f32 round-off only: the two frameworks order the multiply-adds
    # differently, which inflates RELATIVE error near the trajectory's
    # zero-crossings
    np.testing.assert_allclose(jax_traj, torch_traj, rtol=1e-5, atol=1e-6)
