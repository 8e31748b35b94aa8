"""Recall@K from a results dataframe.

Parity surface: ``src/prediction_helper.py:30-89`` -- score matrix via
pivot_table, double-argsort ranking, i2t and t2i recalls at K in
{1, 3, 5, 10}, with missing pairs scored -1 / gt 0, and the same
string-formatted output dict (``'i2t @  1' -> '0.1234'``).
"""

from __future__ import annotations

import collections
from typing import Dict

import numpy as np
import pandas as pd


def get_recall_at_k_from_dataframe(df: pd.DataFrame, topks=(1, 3, 5, 10)) -> Dict[str, str]:
    score_matrix = df.pivot_table(
        values="output", index="image_index", columns="text_index"
    ).values
    score_matrix = np.nan_to_num(score_matrix, nan=-1)

    df = df.copy()
    df["positive"] = (df["image_index"] == df["gt_image_index"]).astype(int)
    gt_matrix = df.pivot_table(
        values="positive", index="image_index", columns="text_index"
    ).values
    gt_matrix = np.nan_to_num(gt_matrix, nan=0)

    def rank(x, axis=-1):
        return np.argsort(np.argsort(x, axis=axis), axis=axis)

    m, n = score_matrix.shape
    i2t_rank = (rank(score_matrix, axis=1) - n) * -1
    t2i_rank = (rank(score_matrix, axis=0) - m) * -1

    recall_dict = collections.OrderedDict()
    for k in topks:
        rank_at_gt = i2t_rank * gt_matrix
        match = ((rank_at_gt <= k) & (rank_at_gt > 0)).astype(int)
        match = np.clip(np.sum(match, axis=1).astype(float), 0, 1)
        num_valid_gt = np.clip(np.sum(gt_matrix, axis=1), 0, 1)
        recall = np.divide(np.sum(match), np.sum(num_valid_gt), out=np.zeros(1))
        recall_dict[f"i2t @ {k:>2}"] = f"{np.mean(recall):.4f}"

    for k in topks:
        rank_at_gt = t2i_rank * gt_matrix
        match = (rank_at_gt <= k) & (rank_at_gt > 0)
        match = np.clip(np.sum(match, axis=0).astype(float), 0, 1)
        num_valid_gt = np.clip(np.sum(gt_matrix, axis=0), 0, 1)
        recall = np.divide(np.sum(match), np.sum(num_valid_gt), out=np.zeros(1))
        recall_dict[f"t2i @ {k:>2}"] = f"{np.mean(recall):.4f}"

    return recall_dict
