#!/usr/bin/env python3
"""Calculate evaluation metrics for a trained model
(reference: src/margipose/bin/eval_3d.py)."""

from __future__ import annotations

import argparse
from time import perf_counter

import numpy as np
import pandas as pd

from margipose_tpu.cli import Subcommand
from margipose_tpu.data.get_dataset import get_dataset
from margipose_tpu.data.loader import (
    device_prefetch,
    make_dataloader,
    make_unbatched_dataloader,
)
from margipose_tpu.data.specs import device_renormalize
from margipose_tpu.eval import gather_3d_metrics, prepare_for_3d_evaluation
from margipose_tpu.geometry.coords import ensure_homogeneous
from margipose_tpu.geometry.skeleton import CanonicalSkeletonDesc, VNect_Common_Skeleton
from margipose_tpu.models import data_specs_for_desc
from margipose_tpu.models.margipose import margipose_masked_loss
from margipose_tpu.train.checkpoint import load_model
from margipose_tpu.train.meters import MeanValueMeter, MedianValueMeter
from margipose_tpu.utils import init_algorithms, seed_all


def parse_args(argv):
    parser = argparse.ArgumentParser(
        prog='margipose-eval', description='3D human pose model evaluator',
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument('--model', type=str, metavar='FILE', required=True,
                        help='path to model file (.pth or orbax dir)')
    parser.add_argument('--dataset', type=str, metavar='DS', default='mpi3d-test',
                        help='dataset to evaluate on')
    parser.add_argument('--multicrop', action='store_true',
                        help='enable the use of multiple crops')
    parser.add_argument('--batch-size', type=int, metavar='N', default=1,
                        help='examples per forward pass (ignored with '
                             '--multicrop); the reference evaluates at batch '
                             '1, larger batches amortise TPU dispatch cost')
    parser.add_argument('--precision', type=str, default='float32',
                        choices=['float32', 'bfloat16'],
                        help='compute dtype (float32 for checkpoint-parity '
                             'metrics — with --ship auto this also keeps '
                             'host-side input normalisation so the graph '
                             'input is bit-identical; bfloat16 for TPU '
                             'throughput)')
    parser.add_argument('--num-workers', type=int, metavar='N', default=0,
                        help='loader threads prefetching upcoming examples '
                             '(multicrop items / batches) while the device '
                             'runs inference. Default 0 (synchronous): on a '
                             'single-core host with a remote-relay TPU the '
                             'prefetch threads contend with the host->device '
                             'transfer pump and INCREASE wall time (measured '
                             '~1.8x, BASELINE.md); set 2-4 on multi-core '
                             'TPU-VM hosts')
    parser.add_argument('--ship', type=str, default='auto',
                        choices=['auto', 'uint8', 'float32'],
                        help='input transfer encoding: uint8 re-quantises '
                             'the normalised input back to its exact source '
                             'pixels (lossless, 4x fewer bytes) and '
                             're-normalises on device — the reconstruction '
                             'is exact but the on-device normalisation '
                             'arithmetic differs from the host\'s at the '
                             'last ulp; float32 ships the host-normalised '
                             'tensor as-is (bit-identical graph input). '
                             'auto picks float32 when --precision float32 '
                             '(the checkpoint-parity mode) and uint8 when '
                             '--precision bfloat16 (the throughput mode)')
    parser.add_argument('--num-devices', type=int, metavar='N', default=1,
                        help='data-parallel evaluation: shard each batch '
                             'over N local devices (0 = all) on a pure-data '
                             'jax.sharding.Mesh; weights are replicated and '
                             'GSPMD partitions the forward. batch-size must '
                             'be divisible by N. Incompatible with '
                             '--multicrop (10-crop items are one example)')
    return parser.parse_args(argv[1:])


def _padded_device_batches(loader, multicrop, batch_size, input_specs=None,
                           sharding=None):
    """Pad tail batches host-side, then pipeline the host->device transfers.

    Padding to one static shape keeps a single compiled executable; routing
    through ``device_prefetch`` keeps ``depth`` transfers in flight so the
    (relay-expensive) input upload of batch k+1 overlaps batch k's forward
    instead of serialising with it. With ``input_specs`` given, inputs ship
    as uint8 (lossless — ``ImageSpecs.requantize``) and are re-normalised on
    device (``specs.device_renormalize``)."""

    def padded():
        for batch in loader:
            n_real = int(np.asarray(batch['valid_depth']).shape[0])
            pad = 0 if multicrop else max(batch_size - n_real, 0)

            def _pad(arr):
                arr = np.asarray(arr)
                if pad == 0:
                    return arr
                return np.concatenate(
                    [arr, np.repeat(arr[-1:], pad, axis=0)], axis=0)

            out = dict(batch)
            out['n_real'] = n_real
            out['input'] = _pad(batch['input'])
            out['target'] = np.ascontiguousarray(
                _pad(batch['target'][..., :3]), np.float32)
            out['valid_depth'] = _pad(np.asarray(batch['valid_depth'], np.int32))
            mask_np = np.array(_pad(batch['joint_mask']), np.float32)
            if pad:
                # padding rows must not contribute to the masked mean loss
                mask_np[n_real:] = 0
            out['joint_mask'] = mask_np
            yield out

    return device_prefetch(
        padded(), sharding=sharding, requantize=input_specs,
        fields=('input', 'target', 'joint_mask', 'valid_depth'))


def obtain_predictions(forward, loader, known_depth=False,
                       print_progress=False, multicrop=False, batch_size=1,
                       ship_specs=None, sharding=None, drain_window=4):
    """(reference: src/margipose/bin/eval_3d.py:48-94)

    With ``multicrop`` each loader item is one example's 10-crop batch and
    yields ONE crop-averaged prediction (the reference's only batched mode);
    otherwise yields one prediction per example, so ``batch_size`` > 1
    amortises the per-dispatch cost on TPU. Short tail batches are padded to
    ``batch_size`` to keep a single compiled shape.

    Device results are drained in a sliding window of ``drain_window``
    in-flight batches (the same *discipline* as the training/validation
    passes — each keeps its own drain loop because the payloads differ:
    timing-meter windows there, a prediction generator here; BASELINE.md
    "Validation-pass drain"): batch k's ``(xyz, loss)`` is read
    back — in ONE ``jax.device_get`` round-trip, not two — only after
    batches k+1..k+W have been enqueued on the device FIFO, so the ~29 ms
    remote-relay readback and the host-side float64 geometry overlap the
    device computing subsequent batches instead of serialising with it."""
    import jax
    iterable = _padded_device_batches(loader, multicrop, batch_size,
                                      input_specs=ship_specs,
                                      sharding=sharding)
    if print_progress:
        try:
            from tqdm import tqdm

            iterable = tqdm(iterable, total=len(loader), leave=True, ascii=True)
        except ImportError:
            pass

    def _drain(entry):
        # ONE device->host round-trip for both result buffers
        xyz, loss = jax.device_get((entry['xyz'], entry['loss']))
        loss = float(loss)
        n_real = entry['n_real']
        inference_time = entry['inference_time']

        norm_preds = ensure_homogeneous(
            np.asarray(xyz, np.float64)[:n_real], d=3)

        def _frame_ref(i):
            fr = entry['frame_ref']
            if fr is None:
                return None
            return fr[i] if isinstance(fr, list) else {
                k: np.asarray(v)[i] for k, v in fr.items()}

        if multicrop:
            # one example's crops: average predictions over crops
            actuals = []
            expected = None
            for i, norm_pred in enumerate(norm_preds):
                expected, actual_i = prepare_for_3d_evaluation(
                    entry['original_skel'][i], norm_pred, loader.dataset,
                    entry['camera_intrinsic'][i], entry['transform_opts'][i],
                    known_depth=known_depth)
                actuals.append(actual_i)
            actual = np.stack(actuals, 0).mean(0)
            yield dict(expected=expected, actual=actual, frame_ref=_frame_ref(0),
                       inference_time=inference_time, loss=loss, loss_n=1)
        else:
            if inference_time is not None:
                # per-REAL-example time so the reported median is comparable
                # across --batch-size settings (the reference's batch-1
                # surface is per-example by construction); padded rows do
                # cost device time but yield no results
                inference_time /= n_real
            for i, norm_pred in enumerate(norm_preds):
                expected, actual = prepare_for_3d_evaluation(
                    entry['original_skel'][i], norm_pred, loader.dataset,
                    entry['camera_intrinsic'][i], entry['transform_opts'][i],
                    known_depth=known_depth)
                yield dict(expected=expected, actual=actual,
                           frame_ref=_frame_ref(i),
                           inference_time=inference_time if i == 0 else None,
                           loss=loss if i == 0 else None, loss_n=n_real)

    timed_batches = 0
    timing_attempts = 0
    pending = []
    for batch in iterable:
        n_real = batch['n_real']
        in_var = batch['input']
        target = batch['target']
        valid_depth = batch['valid_depth']
        mask = batch['joint_mask']

        inference_time = None
        if timed_batches < 3 and timing_attempts < 8:
            # Remote TPU runtimes signal buffer readiness before execution
            # finishes, so a single timed call is unreliable. Enqueue K
            # forwards on the device FIFO queue and end with one real
            # device->host read, then subtract that read's measured
            # round-trip latency (same method as bench.py).
            K = 8
            xyz, loss = forward(in_var, target, mask, valid_depth)
            # warm the SAME add computation the timed reads use — its
            # one-time compile must not inflate the subtracted latency
            # (see BASELINE.md "Timing-bias correction")
            float(loss + 1.0)
            t0 = perf_counter()
            for _ in range(3):
                float((loss + 1.0))
            read_latency = (perf_counter() - t0) / 3
            t0 = perf_counter()
            for _ in range(K):
                xyz, loss = forward(in_var, target, mask, valid_depth)
            float(loss)
            inference_time = (perf_counter() - t0 - read_latency) / K
            timing_attempts += 1
            if inference_time <= 0:
                # a contended host can measure a read latency larger than
                # the timed window; discard rather than report a bogus 0
                inference_time = None
            else:
                timed_batches += 1

        xyz, loss = forward(in_var, target, mask, valid_depth)
        # keep ONLY the (tiny) result buffers + host metadata in flight; the
        # device input buffers free as `batch` leaves scope (HBM headroom)
        pending.append(dict(
            xyz=xyz, loss=loss, n_real=n_real,
            inference_time=inference_time,
            original_skel=batch['original_skel'],
            camera_intrinsic=batch['camera_intrinsic'],
            transform_opts=batch['transform_opts'],
            frame_ref=batch.get('frame_ref')))
        if len(pending) > drain_window:
            yield from _drain(pending.pop(0))

    for entry in pending:
        yield from _drain(entry)


def run_evaluation_3d(forward, loader, included_joints,
                      known_depth=False, print_progress=False,
                      multicrop=False, batch_size=1, ship_specs=None,
                      sharding=None):
    """(reference: src/margipose/bin/eval_3d.py:97-118)"""
    loss_meter = MeanValueMeter()
    time_meter = MedianValueMeter()
    d = dict(seq_id=[], activity_id=[], aligned_auc=[], aligned_mpjpe=[],
             aligned_pck=[], auc=[], mpjpe=[], pck=[])

    for pred in obtain_predictions(forward, loader, known_depth,
                                   print_progress, multicrop=multicrop,
                                   batch_size=batch_size,
                                   ship_specs=ship_specs, sharding=sharding):
        if pred['inference_time'] is not None:
            time_meter.add(pred['inference_time'])
        if pred['loss'] is not None:
            loss_meter.add(pred['loss'], pred.get('loss_n', 1))
        metrics = gather_3d_metrics(pred['expected'], pred['actual'], included_joints)
        if pred['frame_ref']:
            d['seq_id'].append(
                f"TS{pred['frame_ref']['subject_id']}/Seq{pred['frame_ref']['sequence_id']}")
            d['activity_id'].append(pred['frame_ref']['activity_id'])
        else:
            d['seq_id'].append('-')
            d['activity_id'].append('-')
        for name, value in metrics.items():
            d[name].append(value)

    df = pd.DataFrame(d)
    return df, dict(median_inference_time=time_meter.value(),
                    mean_loss=loss_meter.value())


def _print_table(df):
    try:
        print(df.to_markdown())
    except ImportError:
        print(df.to_string())


def main(argv, common_opts):
    import jax
    import jax.numpy as jnp

    args = parse_args(argv)
    seed_all(12345)
    init_algorithms(deterministic=True)

    model, variables, model_desc = load_model(args.model)
    dataset = get_dataset(args.dataset, data_specs_for_desc(model_desc), use_aug=False)

    if args.multicrop:
        dataset.multicrop = True
        loader = make_unbatched_dataloader(dataset, num_workers=args.num_workers)
    else:
        loader = make_dataloader(dataset, batch_size=args.batch_size,
                                 num_workers=args.num_workers)

    if args.dataset.startswith('h36m-'):
        known_depth = True
        included_joints = list(range(CanonicalSkeletonDesc.n_joints))
    else:
        known_depth = False
        included_joints = [
            CanonicalSkeletonDesc.joint_names.index(n) for n in VNect_Common_Skeleton]
    print(f'Use ground truth root joint depth? {known_depth}')
    print(f'Number of joints in evaluation: {len(included_joints)}')

    from margipose_tpu.parallel.precision import compute_dtype_scope, resolve_dtype

    compute_dtype = resolve_dtype(args.precision)

    # Data-parallel evaluation (SURVEY §2.3 scaling layer — the reference is
    # single-GPU): batches shard over a pure-data mesh, weights replicate,
    # and GSPMD partitions the jitted forward. Per-chip throughput is the
    # single-device number; wall time divides by N.
    eval_sharding = None
    eval_mesh = None
    n_dev = args.num_devices if args.num_devices > 0 else len(jax.devices())
    if n_dev > 1:
        from margipose_tpu.parallel import make_mesh
        from margipose_tpu.parallel.mesh import batch_sharding, replicated_sharding

        # real argument errors, not asserts: `python -O` strips asserts and
        # the failure modes downstream are cryptic GSPMD sharding errors
        if args.multicrop:
            raise SystemExit(
                'eval: --num-devices > 1 requires batched mode; --multicrop '
                'items are one example and cannot shard over devices')
        if n_dev > len(jax.devices()):
            raise SystemExit(
                f'eval: --num-devices {n_dev} exceeds the {len(jax.devices())} '
                f'available device(s)')
        if args.batch_size % n_dev != 0:
            raise SystemExit(
                f'eval: --batch-size {args.batch_size} must be divisible by '
                f'--num-devices {n_dev}')
        eval_mesh = make_mesh(jax.devices()[:n_dev], shape=(n_dev, 1))
        eval_sharding = batch_sharding(eval_mesh)
        variables = jax.device_put(variables, replicated_sharding(eval_mesh))
        print(f'Data-parallel eval over {n_dev} devices')
    else:
        # load_model returns host-numpy leaves (multi-host-safe restore);
        # commit them on device ONCE — passed as jit arguments below, numpy
        # leaves would re-upload the full model every batch (seconds/batch
        # over the ~25 MB/s relay link)
        variables = jax.device_put(variables)

    pixelwise_loss = model_desc['settings'].get('pixelwise_loss', 'jsd')

    # uint8 shipping is a lossless pixel reconstruction (ImageSpecs.
    # requantize) with 4x fewer host->device bytes, but its on-device
    # re-normalisation differs from host numpy at the last ulp — so 'auto'
    # reserves it for the bfloat16 throughput mode and keeps the float32
    # checkpoint-parity mode's graph input bit-identical to host norms
    ship = args.ship
    if ship == 'auto':
        ship = 'uint8' if args.precision == 'bfloat16' else 'float32'
    ship_specs = (dataset.data_specs.input_specs
                  if ship == 'uint8' else None)

    from margipose_tpu.train.steps import shard_map_axis

    eval_axis = shard_map_axis(eval_mesh)

    def fwd_body(variables, images, target, mask, valid_depth):
        if images.dtype == jnp.uint8:
            images = device_renormalize(images, ship_specs)
        with compute_dtype_scope(compute_dtype):
            xyz, out = model.apply(
                variables, images.astype(compute_dtype or images.dtype),
                train=False)
        # loss computed inside the jit — eagerly it would dispatch dozens of
        # tiny ops per batch through the device runtime
        loss = margipose_masked_loss(out, target, mask, valid_depth,
                                     pixelwise_loss, axis_name=eval_axis)
        return xyz.astype(jnp.float32), loss

    if eval_axis is not None:
        # shard_map, not GSPMD: the partitioner replicates the stacked
        # columns' grouped convolutions instead of batch-sharding them
        # (see train.steps.shard_map_axis / tests/test_sharding_structure.py)
        P = jax.sharding.PartitionSpec
        fwd_body = jax.shard_map(
            fwd_body, mesh=eval_mesh,
            in_specs=(P(), P(eval_axis), P(eval_axis), P(eval_axis), P(eval_axis)),
            out_specs=(P(eval_axis), P()))
    jitted = jax.jit(fwd_body)

    def forward(images, target, mask, valid_depth):
        return jitted(variables, images, target, mask, valid_depth)

    df, stats = run_evaluation_3d(forward, loader, included_joints,
                                  known_depth=known_depth, print_progress=True,
                                  multicrop=args.multicrop,
                                  batch_size=args.batch_size,
                                  ship_specs=ship_specs,
                                  sharding=eval_sharding)

    print('### By sequence\n')
    _print_table(df.drop(columns=['activity_id']).groupby('seq_id').mean())
    print('\n### By activity\n')
    _print_table(df.drop(columns=['seq_id']).groupby('activity_id').mean())
    print('\n### Overall\n')
    _print_table(df.drop(columns=['activity_id', 'seq_id']).mean().to_frame().T)
    t_med = stats['median_inference_time']
    print('\nmedian inference time: ' +
          (f'{t_med:.6f}s' if t_med is not None
           else 'n/a (host too contended to time reliably)'))


Eval_Subcommand = Subcommand(name='eval', func=main,
                             help='evaluate the accuracy of predictions')

if __name__ == '__main__':
    Eval_Subcommand.run()
