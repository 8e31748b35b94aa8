"""Batched retrieval prediction -> results.csv + recall.json.

Parity surface: ``src/tasks/classification.py:256-334`` (module-level
``predict``) and ``src/prediction_helper.py:92-118`` (``_write_results``):
jit-compiled batched scoring with the reference's logit conversion,
RawResult rows (image_index, text_index, gt_image_index, output), scores
clipped to [0, 1], csv with ``%.8f`` floats, recall.json with the
pretty-keyed recall dict.

TPU-native design: one fixed-shape jitted step; the final partial batch
is padded and filtered on host by the loader's ``valid`` mask (instead
of TF's ragged final batch).
"""

from __future__ import annotations

import collections
import json
import logging
import os
from typing import Iterable, Iterator, List

import numpy as np
import pandas as pd

from mmt_tpu.eval.recall import get_recall_at_k_from_dataframe

logger = logging.getLogger("mmt_tpu")

RawResult = collections.namedtuple(
    "RawResult", ["image_index", "text_index", "gt_image_index", "output"]
)


def predict(inference_step, params, batches: Iterable[dict]) -> Iterator[RawResult]:
    """Yields RawResult rows for every valid example in every batch."""
    count = 0
    for step, batch in enumerate(batches, start=1):
        scores = np.asarray(inference_step(params, batch))
        valid = np.asarray(batch.get("valid", np.ones_like(scores, np.int32)))
        img = np.asarray(batch["image_index"])
        txt = np.asarray(batch["text_index"])
        gt = np.asarray(batch["gt_image_index"])
        for i in range(len(scores)):
            if not valid[i]:
                continue
            count += 1
            yield RawResult(
                image_index=int(img[i]),
                text_index=int(txt[i]),
                gt_image_index=int(gt[i]),
                output=float(scores[i]),
            )
        if step % 5 == 0:
            logger.info("Made predictions for %d examples.", count)
    logger.info("Finished predictions for %d examples.", count)


def write_results(results: Iterable[RawResult], output_dir: str) -> dict:
    """Writes results.csv (+ recall.json) byte-layout-compatible with the
    reference; returns the recall dict."""
    os.makedirs(output_dir, exist_ok=True)
    rows: List[dict] = [r._asdict() for r in results]
    df = pd.DataFrame(rows)
    df["output"] = df["output"].clip(upper=1.0, lower=0.0)
    df.to_csv(os.path.join(output_dir, "results.csv"), index=False,
              float_format="%.8f")

    recall_dict = get_recall_at_k_from_dataframe(df)
    with open(os.path.join(output_dir, "recall.json"), "w") as f:
        json.dump(recall_dict, f, indent=4)
    logger.info("Results: %s", recall_dict)
    return recall_dict
