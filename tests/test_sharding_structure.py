"""Pin the GSPMD partitioning STRUCTURE of the sharded train step.

The sharded-vs-single-device tests assert numeric parity, which is blind to
HOW XLA partitioned the graph: a regression that leaves parameters per-step
all-gathered (the class of bug fixed in 4b0dfba, where orbax-restored
states collided with the mesh sharding) passes every CPU-mesh numeric test
and only surfaces as invisible slowness on real multi-chip hardware this
environment can never provide. So compile the 8-device data-parallel train
step — the exact lowering the driver's dryrun child executes, shared via
the persistent cache — and assert on the compiled artifact:

  * batch inputs are sharded over 'data'; parameters, BN stats and
    optimizer state are fully replicated, on the way IN and OUT;
  * the only collectives in the optimized HLO are all-reduces (the grad +
    BN-stat psums of SURVEY.md §5.8's psum-only expectation): no
    all-gathers, no reduce-scatters, no all-to-alls, no collective-permutes;
  * at least one all-reduce exists (the gradient sync wasn't optimized
    away), and the all-reduce-combiner did its job (a bounded count, not
    one collective per parameter leaf).
"""

import collections
import re
import sys
from pathlib import Path

import jax

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_COLLECTIVE_RE = re.compile(
    r"\b(all-reduce|all-gather|all-to-all|collective-permute|reduce-scatter)"
    r"(?:-start)?\(")


def collective_census(hlo_text: str) -> collections.Counter:
    """Count collective instructions in optimized HLO text (async -start
    forms counted under their base op; -done forms ignored)."""
    counts = collections.Counter()
    for m in _COLLECTIVE_RE.finditer(hlo_text):
        counts[m.group(1)] += 1
    return counts


def assert_data_parallel_structure(compiled, *, state, batch):
    """Shared partitioning-structure assertions for a compiled train step
    over the ('data', 'model'=1) mesh. Used here and by test_flagship_gspmd.

    History: this check CAUGHT a real scaling bug when first written — under
    pjit/GSPMD the vmapped stacked columns lower to grouped convolutions
    (feature_group_count=3), for which XLA's SPMD partitioner has no
    batch-partitioning rule: it replicated them (84 batch all-gathers in the
    optimized HLO, every device computing the FULL global batch). The train
    step now runs pure-DP meshes under jax.shard_map (train.steps.
    shard_map_axis), whose HLO this pins: all-reduces only (per-leaf grad
    psums — which overlap with the remaining backward — plus BN-stat pmeans
    and the loss mean), never a batch all-gather."""
    census = collective_census(compiled.as_text())
    assert census.get("all-reduce", 0) >= 1, (
        f"gradient/BN psums missing from compiled HLO: {dict(census)}")
    for bad in ("all-gather", "reduce-scatter", "all-to-all",
                "collective-permute"):
        assert census.get(bad, 0) == 0, (
            f"unexpected {bad} in pure-DP train step (batch replication / "
            f"parameter sharding regression?): {dict(census)}")

    in_state, in_batch = compiled.input_shardings[0][:2]
    out_state = compiled.output_shardings[0]

    def leaves_with_paths(tree):
        return jax.tree_util.tree_flatten_with_path(tree)[0]

    for label, tree in (("in", in_state), ("out", out_state)):
        for path, sh in leaves_with_paths(
                {"params": tree.params, "batch_stats": tree.batch_stats,
                 "opt_state": tree.opt_state}):
            assert sh.is_fully_replicated, (
                f"{label} state leaf {jax.tree_util.keystr(path)} not "
                f"replicated: {sh}")

    n_data = 8
    for key in ("input", "target", "joint_mask", "valid_depth"):
        sh = in_batch[key]
        global_shape = batch[key].shape
        shard_rows = sh.shard_shape(global_shape)[0]
        assert shard_rows * n_data == global_shape[0], (
            f"batch[{key!r}] not sharded over the full data axis: "
            f"{sh} shard shape {sh.shard_shape(global_shape)}")


def test_reduced_train_step_partitioning_structure():
    import __graft_entry__ as ge
    from margipose_tpu.models import create_model
    from margipose_tpu.train.steps import make_train_step

    desc = {
        "type": "margipose",
        "version": "6.0.1",
        "settings": {"n_stages": 2, "axis_permutation": True,
                     "feature_extractor": "resnet18", "pixelwise_loss": "jsd"},
    }
    model, opt, mesh, state, device_batch, _ = ge._make_sharded_state_and_batch(
        8, desc, input_hw=(32, 32), batch_per_device=2)
    step = make_train_step(model, opt, pixelwise_loss="jsd", donate=False,
                           mesh=mesh)
    # Same lowering + compiler_options as the driver's dryrun child — the
    # persistent cache makes this a load, not a compile, on warm runs.
    compiled = step.lower(state, device_batch).compile(
        compiler_options=ge._COLLECTIVE_TIMEOUT_OPTIONS)
    assert_data_parallel_structure(compiled, state=state, batch=device_batch)
