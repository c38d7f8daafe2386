"""``inference-lm.py`` CLI — LM beam search over ensemble candidates
(flag-compatible with reference ``inference-lm.py:18-35``)."""

from __future__ import annotations

import argparse
import os
from datetime import datetime

from ..data import VideoDataset
from ..infer.beam import run_beam_inference
from ..infer.loader import load_models
from ..utils.csvout import write_submission


def parse_arguments(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--pretrained_model', dest='pretrained_model', nargs='+',
                        required=True,
                        help='pretrained_model filename, standard '
                             '${model}_${accuracy}_dev')
    parser.add_argument('--part', dest='part', default='test',
                        choices=['dev', 'test'], help='infer the dev or test')
    parser.add_argument('--lm_path', dest='lm_path', default=None,
                        help='Path to the language model for beam search decoding')
    parser.add_argument('--beam_size', dest='beam_size', type=int, default=5,
                        help='beam_size')
    parser.add_argument('--threshold', dest='threshold', type=float,
                        default=0.2, help='frame appearance threshold')
    parser.add_argument('--split', dest='split', type=int, default=0,
                        help='split')
    parser.add_argument('--remove_zero', type=bool, nargs='?', const=True,
                        default=False,
                        help='Force zero removal from prediction')
    # TPU-native extras
    parser.add_argument('--attn_head', type=int, default=4)
    parser.add_argument('--data_dir', default='./data')
    parser.add_argument('--annot_path', default='.')
    parser.add_argument('--models_dir', default='models')
    parser.add_argument('--results_dir', default='results')
    parser.add_argument('--bucket_multiple', type=int, default=128)
    parser.add_argument('--batch_size', type=int, default=8)
    parser.add_argument('--dtype', default='float32',
                        choices=['float32', 'bfloat16'],
                        help='forward-pass precision; bfloat16 is a TPU '
                             'performance extension (+55%% measured ms_tcn '
                             'eval) — predictions can differ from float32 '
                             'on near-tied frames')
    parser.add_argument('--data_parallel', type=int, default=0,
                        help='Shard prediction batches over this many devices '
                             '(0 = off); identical outputs, tested')
    parser.add_argument('--device_beam', type=bool, nargs='?', const=True,
                        default=False,
                        help='Run the beam search as one batched TPU program '
                             '(densified trigram LM); identical results to '
                             'the host loop')
    return parser.parse_args(argv)


def _make_sharding(args):
    """DataParallel mesh for the prediction forwards when requested."""
    if getattr(args, 'data_parallel', 0) and args.data_parallel > 1:
        from ..parallel import DataParallel

        return DataParallel(args.data_parallel)
    return None

def main(argv=None):
    args = parse_arguments(argv)
    os.makedirs(args.results_dir, exist_ok=True)
    if args.part == 'dev':
        split, mode = args.split, 'active'
    else:
        split, mode = 1, None
    dataset = VideoDataset(
        data_dir=args.data_dir, annot_path=args.annot_path,
        part=args.part, load_all=True, split=split, mode=mode,
    )
    n_class = dataset.n_class
    models = load_models(
        args.pretrained_model, n_class,
        models_dir=args.models_dir, attn_head=args.attn_head,
    )
    if len(models) == 0:
        print('No model is loaded...')
        return 0
    print('Start predicting...')
    out = run_beam_inference(
        dataset, models, args.lm_path, part=args.part,
        beam_size=args.beam_size, threshold=args.threshold,
        remove_zero=args.remove_zero,
        bucket_multiple=args.bucket_multiple, batch_size=args.batch_size,
        device_beam=args.device_beam,
        sharding=_make_sharding(args), dtype=args.dtype,
    )
    if args.part == 'dev':
        return out
    stamp = datetime.now().strftime('%Y_%m_%d_%H_%M_%S')
    result_path = os.path.join(
        args.results_dir,
        'result_{}_{}'.format('_'.join(args.pretrained_model), stamp),
    )
    print(f'Writing results to {result_path}...')
    write_submission(result_path, out)
    print("Finished! Let's hope it gets better result!")
    return result_path
