"""``lm_generation.py`` CLI — LM training-corpus generation (+ optional
in-repo ARPA training, closing the reference's external-kenlm gap).

Reference ``lm_generation.py:52-67``: run-length-collapse each training
video's frame labels into a segment-label sequence and write space-joined
class-id lines to ``groundTruth/segment_labels.txt``.  With ``--arpa_out``
we additionally train an interpolated Kneser-Ney ARPA model on the corpus
(the reference requires external kenlm ``lmplz`` for this step).
"""

from __future__ import annotations

import argparse
import os

from ..data.bundles import (
    load_class_mapping,
    read_lines,
    strip_bundle_prefix,
)
from ..utils.runlength import segment_label_sequence


def parse_arguments(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--annot_path', default='.')
    parser.add_argument('--out', default=None,
                        help='corpus output path (default: '
                             '<annot_path>/groundTruth/segment_labels.txt)')
    parser.add_argument('--arpa_out', default=None,
                        help='also train an ARPA n-gram LM to this path')
    parser.add_argument('--order', type=int, default=3, help='LM order')
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_arguments(argv)
    annot_path = args.annot_path
    # the FULL Kaggle training bundle (reference lm_generation.py:54), not a
    # CV fold from new_splits — the LM corpus covers all training videos
    kaggle_bundle = os.path.join(
        annot_path, 'splits', 'splits', 'train.split1.bundle'
    )
    filenames = [
        strip_bundle_prefix(line)
        for line in read_lines(kaggle_bundle, offset_start=1)
    ]
    mapping = load_class_mapping(annot_path)
    gt_dir = os.path.join(annot_path, 'groundTruth', 'groundTruth')

    sentences = []
    for filename in filenames:
        names = read_lines(os.path.join(gt_dir, filename))
        ids = [str(mapping.class_ids[n]) for n in names]
        sentences.append(segment_label_sequence(ids))

    out = args.out or os.path.join(annot_path, 'groundTruth', 'segment_labels.txt')
    if os.path.dirname(out):
        os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, 'w') as f:
        for sent in sentences:
            f.write(' '.join(sent) + '\n')
    print(f'Wrote LM corpus: {out} ({len(sentences)} sentences)')

    if args.arpa_out:
        from ..lm.train_arpa import train_arpa

        train_arpa(sentences, args.arpa_out, order=args.order)
        print(f'Trained ARPA LM: {args.arpa_out}')
    return out
